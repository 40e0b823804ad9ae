"""Interop: migrate reference (PyTorch) artifacts into pcfm."""
from pcfm.interop.torch_ckpt import (config_from_reference_args,
                                     hybrid_from_sd,
                                     import_reference_checkpoint,
                                     latent_net_from_sd,
                                     shape_encoder_from_sd,
                                     state_from_reference_ckpt,
                                     velocity_net_from_sd)

__all__ = [
    "config_from_reference_args", "hybrid_from_sd",
    "import_reference_checkpoint", "latent_net_from_sd",
    "shape_encoder_from_sd", "state_from_reference_ckpt",
    "velocity_net_from_sd",
]
