"""Pallas kernel tests (interpret mode on CPU; compiled on TPU in bench)."""
import numpy as np
import jax.numpy as jnp

from tests import oracles


def test_chamfer_pallas_v3_matches_oracle():
    from pcfm.ops.pallas import chamfer_distance_pallas_v3
    rng = np.random.RandomState(0)
    a = rng.randn(2, 700, 3).astype(np.float32)
    b = rng.randn(2, 500, 3).astype(np.float32)
    d1, d2, i1, i2 = chamfer_distance_pallas_v3(jnp.asarray(a),
                                                jnp.asarray(b),
                                                interpret=True)
    w1, w2, j1, j2 = oracles.chamfer_np(a, b)
    np.testing.assert_allclose(np.asarray(d1), w1, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1), j1)


def test_chamfer_pallas_v3_identity():
    from pcfm.ops.pallas import chamfer_distance_pallas_v3
    rng = np.random.RandomState(1)
    x = rng.randn(1, 600, 3).astype(np.float32)
    d1, d2, i1, i2 = chamfer_distance_pallas_v3(jnp.asarray(x),
                                                jnp.asarray(x),
                                                interpret=True)
    assert float(jnp.max(d1)) == 0.0
    np.testing.assert_array_equal(np.asarray(i1)[0], np.arange(600))
