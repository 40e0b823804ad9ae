"""Training: state, jitted step, loop, checkpointing, CLI."""
from pcfm.train.state import (ModelBundle, TrainState, cosine_lr, ema_update,
                              init_state, make_optimizer, count_parameters)
from pcfm.train.step import make_train_step, train_step
from pcfm.train.loop import train, epoch_scalars
from pcfm.train import checkpoint

__all__ = [
    "ModelBundle", "TrainState", "cosine_lr", "ema_update", "init_state",
    "make_optimizer", "count_parameters", "make_train_step", "train_step",
    "train", "epoch_scalars", "checkpoint",
]
