"""SE3d — squeeze-and-excitation over a voxel grid.

Port of `third_party/pvcnn/modules/se.py`: global-mean over the 3 spatial
axes -> bottleneck MLP (no biases) -> sigmoid gate per channel.
Channel-last: grid is (B, R, R, R, C).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class SE3d(nn.Module):
    channel: int
    reduction: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, grid):
        g = jnp.mean(grid, axis=(1, 2, 3))                          # (B, C)
        g = nn.Dense(self.channel // self.reduction, use_bias=False,
                     dtype=self.dtype, name="fc1")(g)
        g = nn.relu(g)
        g = nn.Dense(self.channel, use_bias=False, dtype=self.dtype,
                     name="fc2")(g)
        g = nn.sigmoid(g)
        return grid * g[:, None, None, None, :]
