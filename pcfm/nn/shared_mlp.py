"""SharedMLP — port of `third_party/pvcnn/modules/shared_mlp.py`.

The reference is Conv1d/2d(1x1) + BatchNorm + ReLU stacks over (B, C, N) or
(B, C, M, U).  A 1x1 conv over points is just a Dense applied per point, so
here it is Dense + BatchNorm + ReLU over channel-last tensors of any rank
(B, ..., C) — one big MXU matmul over the flattened point axes.

The Dense carries NO bias: the reference's Conv1d bias (bias=True default)
is mathematically dead through the following BatchNorm — train-mode BN
subtracts the batch mean, which absorbs any per-channel constant exactly,
and BN's own beta supplies the shift.  On TPU each dead bias costs a full
activation-sized cotangent read in backward (measured ~0.3 ms per layer at
(8, 20000, 256) on v5e), so it is dropped; eval-mode parity with torch
weights folds the torch bias into the BN running mean (torch_mirror_hybrid
shared_mlp_stats).
"""
from __future__ import annotations

from typing import Sequence, Union

import jax.numpy as jnp
from flax import linen as nn


class SharedMLP(nn.Module):
    out_channels: Union[int, Sequence[int]]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        ocs = self.out_channels
        if isinstance(ocs, int):
            ocs = [ocs]
        for i, oc in enumerate(ocs):
            x = nn.Dense(oc, dtype=self.dtype, use_bias=False,
                         kernel_init=nn.initializers.lecun_normal(),
                         name=f"dense_{i}")(x)
            # torch BatchNorm defaults: eps 1e-5, momentum 0.1
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, axis=-1, dtype=jnp.float32,
                             name=f"bn_{i}")(x)
            x = nn.relu(x)
        return x
