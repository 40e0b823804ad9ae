#!/usr/bin/env python
"""Smoke checks mirroring the reference README's copy-paste snippets
(README.md:50-72 backend build check, :89-101 EMD self-test, :117-134
Chamfer identity check) — one command, exit code 0 on success."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    # 1) "backend build" check: every op imports and runs
    from pcfm import ops
    key = jax.random.PRNGKey(0)
    pts = jax.random.normal(key, (2, 256, 3))
    feats = jax.random.normal(key, (2, 256, 8))
    normc, voxc = ops.normalize_coords(pts, 8)
    grid = ops.avg_voxelize(feats, voxc, 8)
    back = ops.trilinear_devoxelize(grid, normc, 8)
    idx = ops.ball_query(pts[:, :16], pts, radius=0.5, num_neighbors=8)
    grp = ops.grouping(feats, idx)
    ctr = ops.furthest_point_sample(pts, 32)
    interp = ops.nearest_neighbor_interpolate(pts, ctr, feats[:, :32])
    assert back.shape == (2, 256, 8) and grp.shape == (2, 16, 8, 8) \
        and interp.shape == (2, 256, 8)
    print("[1/3] ops backend check OK "
          f"(device: {jax.devices()[0].platform})")

    # 2) EMD self-test on random clouds (cost > 0, symmetric-ish, /N scale)
    p1 = jax.random.normal(key, (3, 128, 3))
    p2 = jax.random.normal(jax.random.fold_in(key, 1), (3, 128, 3))
    d = ops.earth_mover_distance(p1, p2)
    d_self = ops.earth_mover_distance(p1, p1)
    assert float(jnp.min(d)) > 0 and float(jnp.max(d_self)) < 1e-4
    print(f"[2/3] EMD self-test OK (cross {np.asarray(d).round(3)}, "
          f"self ~0)")

    # 3) Chamfer identity: CD(x, x) == 0
    d1, d2, i1, i2 = ops.chamfer_distance(p1, p1)
    assert float(jnp.max(d1)) < 1e-6 and float(jnp.max(d2)) < 1e-6
    print("[3/3] Chamfer identity check OK (CD(x,x) = 0)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
