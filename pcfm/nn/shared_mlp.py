"""SharedMLP — port of `third_party/pvcnn/modules/shared_mlp.py`.

The reference is Conv1d/2d(1x1) + BatchNorm + ReLU stacks over (B, C, N) or
(B, C, M, U).  A 1x1 conv over points is just a Dense applied per point, so
here it is Dense + BatchNorm + ReLU over channel-last tensors of any rank
(B, ..., C) — one big MXU matmul over the flattened point axes.
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
            x = nn.Dense(oc, dtype=self.dtype,
                         kernel_init=nn.initializers.lecun_normal(),
                         name=f"dense_{i}")(x)
            # torch BatchNorm defaults: eps 1e-5, momentum 0.1
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, axis=-1, dtype=jnp.float32,
                             name=f"bn_{i}")(x)
            x = nn.relu(x)
        return x
