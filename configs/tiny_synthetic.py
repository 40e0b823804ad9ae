"""BASELINE config 1: tiny unconditional XYZ flow matching — 1024-pt
synthetic shapes, MLP vector field, 20-step Euler sampler, CPU-runnable."""
from pcfm.config import Config

config = Config(
    dataset_type="synthetic",
    batch_size=8,
    tr_max_sample_points=1024,
    te_max_sample_points=1024,
    pf_backbone="mlp",
    latent_dim=64,
    enc_width=64,
    pf_width=128,
    pf_depth=4,
    pf_emb_dim=64,
    lf_width=128,
    lf_depth=4,
    lf_emb_dim=64,
    use_rgb_in_latent=False,
    pointflow_rgb=False,
    epochs=50,
    warmup_steps=100,
    geom_warmup_epochs=0,
    sample_steps=20,
    sampler="euler",
    amp=False,
    out_dir="runs/tiny_synthetic",
)
