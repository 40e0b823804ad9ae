"""Model zoo — mirrors the reference models.py (SURVEY.md §2.2)."""
from pcfm.models.embeddings import timestep_embedding
from pcfm.models.velocity import MLP, VelocityNet, VelocityNetWithContext
from pcfm.models.encoder import ShapeEncoder
from pcfm.models.latent import ConditionalLatentVelocityNet
from pcfm.models.context import ContextNet, PVBlock, PVStage
from pcfm.models.hybrid import HybridMLP
from pcfm.models.adversary import CondAdversary, grad_reverse

__all__ = [
    "timestep_embedding", "MLP", "VelocityNet", "VelocityNetWithContext",
    "ShapeEncoder", "ConditionalLatentVelocityNet", "ContextNet", "PVBlock",
    "PVStage", "HybridMLP", "CondAdversary", "grad_reverse",
]
