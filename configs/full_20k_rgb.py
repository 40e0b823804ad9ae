"""BASELINE config 4: full reference workload — 20k-pt RGB Scissors,
batch 8, VICReg-style lambda penalties, high-order sampling."""
from pcfm.config import Config

config = Config(
    dataset_type="partnet_h5",
    data_dir="data/partnet/Scissors",
    batch_size=8,
    tr_max_sample_points=20000,
    te_max_sample_points=20000,
    pf_backbone="mlp",
    latent_dim=128,
    use_rgb_in_latent=True,
    pointflow_rgb=True,
    color_prior="uniform",
    lambda_color=1.0,
    lambda_pair=0.1,
    lambda_var=1.0,
    lambda_cov=0.01,
    lambda_zreg=1e-4,
    epochs=3000,
    save_every=100,
    sampler="rk4",
    sample_steps=25,
    out_dir="runs/full_20k_rgb",
)
