"""BASELINE config 3: RGB generation — 10k pts, use_rgb_in_latent +
pointflow_rgb, uniform color prior, lambda_color=1.0, CD+EMD eval."""
from pcfm.config import Config

config = Config(
    dataset_type="partnet_h5",
    data_dir="data/partnet/Scissors",
    batch_size=8,
    tr_max_sample_points=10000,
    te_max_sample_points=10000,
    pf_backbone="mlp",
    latent_dim=128,
    use_rgb_in_latent=True,
    pointflow_rgb=True,
    color_prior="uniform",
    lambda_color=1.0,
    epochs=3000,
    save_every=100,
    geom_warmup_epochs=200,
    out_dir="runs/rgb_10k",
)
