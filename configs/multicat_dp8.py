"""BASELINE config 5: multi-category PartNet, data-parallel across a v5e-8
mesh with sharded eval."""
from pcfm.config import Config

config = Config(
    dataset_type="partnet_h5",
    data_dir="data/partnet/Multi",
    batch_size=32,
    tr_max_sample_points=8192,
    te_max_sample_points=8192,
    pf_backbone="hybrid",
    latent_dim=128,
    use_rgb_in_latent=True,
    pointflow_rgb=True,
    epochs=3000,
    save_every=100,
    dp=8,
    sp=1,
    out_dir="runs/multicat_dp8",
)
