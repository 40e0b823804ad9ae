"""BASELINE config 2: PartNet Scissors conditional — 2048 pts,
latent_dim=128, hybrid PVCNN backbone, RK4 sampling, CD eval."""
from pcfm.config import Config

config = Config(
    dataset_type="partnet_h5",
    data_dir="data/partnet/Scissors",
    batch_size=8,
    tr_max_sample_points=2048,
    te_max_sample_points=2048,
    pf_backbone="hybrid",
    latent_dim=128,
    ctx_dim=64,
    ctx_stage_channels=[128, 256, 256],
    ctx_stage_blocks=[2, 2, 2],
    ctx_stage_res=[32, 16, 8],
    use_rgb_in_latent=False,
    pointflow_rgb=False,
    epochs=3000,
    save_every=100,
    sampler="rk4",
    sample_steps=25,
    out_dir="runs/scissors_2048",
)
