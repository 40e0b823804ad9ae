"""Parity tests: pcfm.ops vs. pure-numpy oracles (reference unit_test.py
discipline, SURVEY.md §4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pcfm import ops
from tests import oracles


@pytest.fixture
def rng():
    return np.random.RandomState(0)


# ---------------- voxelize / devoxelize (N1 / N2) ----------------

def test_avg_voxelize_matches_oracle(rng):
    b, n, c, r = 2, 200, 5, 8
    feats = rng.randn(b, n, c).astype(np.float32)
    coords = rng.randint(0, r, size=(b, n, 3)).astype(np.int32)
    got = np.asarray(ops.avg_voxelize(jnp.asarray(feats), jnp.asarray(coords), r))
    want = oracles.avg_voxelize_np(feats, coords, r)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_normalize_coords_range(rng):
    pts = rng.randn(3, 100, 3).astype(np.float32) * 2.0
    norm, vox = ops.normalize_coords(jnp.asarray(pts), 16)
    norm, vox = np.asarray(norm), np.asarray(vox)
    assert norm.min() >= 0.0 and norm.max() <= 15.0
    assert vox.min() >= 0 and vox.max() <= 15
    # centered+max-norm scaling puts all points within the unit cube half
    np.testing.assert_allclose(vox, np.round(norm), atol=0)


def test_trilinear_devoxelize_matches_oracle(rng):
    b, n, c, r = 2, 64, 4, 8
    grid = rng.randn(b, r, r, r, c).astype(np.float32)
    coords = rng.uniform(0, r - 1, size=(b, n, 3)).astype(np.float32)
    # exercise the frac==0 boundary path on a few points
    coords[:, :5] = np.floor(coords[:, :5])
    coords[:, 5] = r - 1.0
    got = np.asarray(ops.trilinear_devoxelize(jnp.asarray(grid),
                                              jnp.asarray(coords), r))
    want = oracles.trilinear_devoxelize_np(grid, coords, r)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_voxelize_devoxelize_grad_flows(rng):
    b, n, c, r = 1, 32, 3, 4
    feats = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    pts = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))

    def f(feats):
        normc, voxc = ops.normalize_coords(pts, r)
        grid = ops.avg_voxelize(feats, voxc, r)
        out = ops.trilinear_devoxelize(grid, normc, r)
        return jnp.sum(out ** 2)

    g = jax.grad(f)(feats)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


# ---------------- chamfer (N7/N9/N10) ----------------

def test_chamfer_matches_double_oracle(rng):
    a = rng.randn(4, 130, 3).astype(np.float32)
    b = rng.randn(4, 90, 3).astype(np.float32)
    d1, d2, i1, i2 = ops.chamfer_distance(jnp.asarray(a), jnp.asarray(b),
                                          chunk=64)
    w1, w2, j1, j2 = oracles.chamfer_np(a, b)
    np.testing.assert_allclose(np.asarray(d1), w1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), w2, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), j1)
    np.testing.assert_array_equal(np.asarray(i2), j2)


@pytest.mark.parametrize("dim", [2, 3, 5, 6])
def test_chamfer_any_dim_identity(rng, dim):
    x = rng.randn(2, 50, dim).astype(np.float32)
    d1, d2, i1, i2 = ops.chamfer_distance(jnp.asarray(x), jnp.asarray(x))
    assert float(jnp.max(d1)) < 1e-6 and float(jnp.max(d2)) < 1e-6
    np.testing.assert_array_equal(np.asarray(i1), np.arange(50)[None].repeat(2, 0))


def test_chamfer_backward(rng):
    a = rng.randn(2, 40, 3).astype(np.float32)
    b = rng.randn(2, 30, 3).astype(np.float32)

    def loss(a_, b_):
        d1, d2, _, _ = ops.chamfer_distance(a_, b_)
        return jnp.sum(d1) + jnp.sum(d2)

    ga = jax.grad(loss, argnums=0)(jnp.asarray(a), jnp.asarray(b))
    # numeric check on a single coordinate
    eps = 1e-3
    ap = a.copy(); ap[0, 0, 0] += eps
    am = a.copy(); am[0, 0, 0] -= eps
    num = (loss(jnp.asarray(ap), jnp.asarray(b))
           - loss(jnp.asarray(am), jnp.asarray(b))) / (2 * eps)
    np.testing.assert_allclose(float(ga[0, 0, 0]), float(num), rtol=2e-2,
                               atol=2e-3)


def test_chamfer_l2_matches_reference_formula(rng):
    a = rng.randn(3, 64, 3).astype(np.float32)
    b = rng.randn(3, 64, 3).astype(np.float32)
    got = np.asarray(ops.chamfer_l2(jnp.asarray(a), jnp.asarray(b)))
    w1, w2, _, _ = oracles.chamfer_np(a, b)
    np.testing.assert_allclose(got, w1.mean(1) + w2.mean(1), rtol=1e-4,
                               atol=1e-5)


def test_fscore(rng):
    d1 = jnp.asarray(rng.rand(2, 100).astype(np.float32) * 0.002)
    d2 = jnp.asarray(rng.rand(2, 100).astype(np.float32) * 0.002)
    f, p1, p2 = ops.fscore(d1, d2, threshold=0.001)
    p1n = np.mean(np.asarray(d1) < 0.001, axis=1)
    p2n = np.mean(np.asarray(d2) < 0.001, axis=1)
    np.testing.assert_allclose(np.asarray(p1), p1n, atol=1e-6)
    np.testing.assert_allclose(np.asarray(f),
                               2 * p1n * p2n / (p1n + p2n), atol=1e-5)


# ---------------- EMD (N11) ----------------

def test_emd_matches_loop_oracle(rng):
    a = rng.randn(2, 60, 3).astype(np.float32)
    b = rng.randn(2, 60, 3).astype(np.float32)
    got = np.asarray(ops.earth_mover_distance(jnp.asarray(a), jnp.asarray(b)))
    want = oracles.emd_np(a, b)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_emd_two_point_ground_truth():
    # mirror of reference PyTorchEMD/test_emd_loss.py:16-43
    p1 = np.array([[[1.7, -0.1, 0.1], [0.1, 1.2, 0.3]]], np.float32)
    p2 = np.array([[[0.3, 1.8, 0.2], [1.2, -0.2, 0.3]]], np.float32)
    gt = (np.sum((p1[0, 0] - p2[0, 1]) ** 2)
          + np.sum((p1[0, 1] - p2[0, 0]) ** 2)) / 2.0
    d = float(ops.earth_mover_distance(jnp.asarray(p1), jnp.asarray(p2))[0])
    assert abs(d - gt) < 1e-3 * max(1.0, gt)


def test_emd_gradients_match_numeric():
    p1 = jnp.asarray(np.array([[[1.7, -0.1, 0.1], [0.1, 1.2, 0.3]]],
                              np.float32))
    p2 = jnp.asarray(np.array([[[0.3, 1.8, 0.2], [1.2, -0.2, 0.3]]],
                              np.float32))
    # analytic grads treat the match as constant; for a well-separated
    # 2-point assignment the match is one-hot so grads equal the true ones
    g1 = jax.grad(lambda a: jnp.sum(ops.earth_mover_distance(a, p2)))(p1)
    expect = (p1[0, 0] - p2[0, 1]) * 2 / 2.0
    np.testing.assert_allclose(np.asarray(g1)[0, 0], np.asarray(expect),
                               rtol=1e-3, atol=1e-3)


def test_emd_unequal_sizes(rng):
    a = rng.randn(1, 64, 3).astype(np.float32)
    b = rng.randn(1, 32, 3).astype(np.float32)
    got = np.asarray(ops.earth_mover_distance(jnp.asarray(a), jnp.asarray(b)))
    want = oracles.emd_np(a, b)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


# ---------------- FPS / gather (N5) ----------------

def test_fps_matches_oracle(rng):
    pts = rng.randn(3, 100, 3).astype(np.float32)
    got = np.asarray(ops.furthest_point_sample_indices(jnp.asarray(pts), 16))
    want = oracles.fps_np(pts, 16)
    np.testing.assert_array_equal(got, want)


def test_gather_backward(rng):
    feats = jnp.asarray(rng.randn(2, 20, 4).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 20, size=(2, 7)).astype(np.int32))
    g = jax.grad(lambda f: jnp.sum(ops.gather(f, idx) ** 2))(feats)
    assert np.isfinite(np.asarray(g)).all()


# ---------------- ball query / grouping (N3/N4) ----------------

def test_ball_query_matches_oracle(rng):
    centers = rng.randn(2, 10, 3).astype(np.float32) * 0.5
    points = rng.randn(2, 50, 3).astype(np.float32) * 0.5
    got = np.asarray(ops.ball_query(jnp.asarray(centers), jnp.asarray(points),
                                    radius=0.7, num_neighbors=8))
    want = oracles.ball_query_np(centers, points, 0.7, 8)
    np.testing.assert_array_equal(got, want)


def test_grouping_shapes(rng):
    feats = jnp.asarray(rng.randn(2, 50, 6).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 50, size=(2, 10, 8)).astype(np.int32))
    out = ops.grouping(feats, idx)
    assert out.shape == (2, 10, 8, 6)
    np.testing.assert_allclose(np.asarray(out)[0, 3, 2],
                               np.asarray(feats)[0, int(idx[0, 3, 2])])


# ---------------- 3-NN interpolate (N6) ----------------

def test_three_nn_interpolate_matches_oracle(rng):
    points = rng.randn(2, 40, 3).astype(np.float32)
    centers = rng.randn(2, 12, 3).astype(np.float32)
    feats = rng.randn(2, 12, 5).astype(np.float32)
    got = np.asarray(ops.nearest_neighbor_interpolate(
        jnp.asarray(points), jnp.asarray(centers), jnp.asarray(feats)))
    want = oracles.three_nn_interp_np(points, centers, feats)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# ---------------- losses ----------------

def test_huber_loss():
    err = jnp.asarray(np.array([0.5, -2.0], np.float32))
    got = float(ops.huber_loss(err, 1.0))
    want = np.mean([0.5 * 0.25, 0.5 + 1.0])
    assert abs(got - want) < 1e-6


def test_kl_loss_zero_when_equal(rng):
    x = jnp.asarray(rng.randn(4, 10).astype(np.float32))
    assert abs(float(ops.kl_loss(x, x))) < 1e-6


def test_emd_streamed_matches_dense(rng):
    from pcfm.ops.emd import earth_mover_distance_streamed
    a = rng.randn(2, 128, 3).astype(np.float32)
    b = rng.randn(2, 64, 3).astype(np.float32)
    dense = np.asarray(ops.earth_mover_distance(jnp.asarray(a),
                                                jnp.asarray(b)))
    stream = np.asarray(earth_mover_distance_streamed(jnp.asarray(a),
                                                      jnp.asarray(b),
                                                      chunk=32))
    np.testing.assert_allclose(stream, dense, rtol=1e-4, atol=1e-5)


# ---------------- hand-checked goldens (SURVEY §4 (b)) ----------------

def test_avg_voxelize_golden():
    # two points into the same voxel, one into another -> mean vs copy
    feats = jnp.asarray([[[1.0, 2.0], [3.0, 4.0], [10.0, 20.0]]])
    coords = jnp.asarray([[[0, 0, 0], [0, 0, 0], [1, 1, 1]]], dtype=jnp.int32)
    grid = np.asarray(ops.avg_voxelize(feats, coords, 2))
    np.testing.assert_allclose(grid[0, 0, 0, 0], [2.0, 3.0])
    np.testing.assert_allclose(grid[0, 1, 1, 1], [10.0, 20.0])
    np.testing.assert_allclose(grid[0, 0, 1, 0], [0.0, 0.0])


def test_trilinear_devoxelize_golden():
    # 1D-style interpolation along x between two known voxels
    grid = np.zeros((1, 2, 2, 2, 1), np.float32)
    grid[0, 0, 0, 0, 0] = 1.0
    grid[0, 1, 0, 0, 0] = 3.0
    coords = jnp.asarray([[[0.25, 0.0, 0.0]]])
    out = float(np.asarray(ops.trilinear_devoxelize(jnp.asarray(grid),
                                                    coords, 2))[0, 0, 0])
    assert abs(out - 1.5) < 1e-6


def test_ball_query_golden_backfill():
    # center at origin; hits at indices 1 and 3; slot 2.. back-filled with 1
    centers = jnp.asarray([[[0.0, 0.0, 0.0]]])
    points = jnp.asarray([[[5, 0, 0], [0.1, 0, 0], [6, 0, 0],
                           [0, 0.1, 0], [7, 0, 0]]], dtype=jnp.float32)
    idx = np.asarray(ops.ball_query(centers, points, radius=1.0,
                                    num_neighbors=4))
    np.testing.assert_array_equal(idx[0, 0], [1, 3, 1, 1])


def test_fps_golden_line():
    # colinear points 0,1,2,3 -> picks 0, then 3, then 1 (d=1.0 vs 2@d=1)
    pts = jnp.asarray([[[0.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0],
                        [3.0, 0, 0]]])
    idx = np.asarray(ops.furthest_point_sample_indices(pts, 3))
    np.testing.assert_array_equal(idx[0], [0, 3, 1])


def test_three_nn_golden():
    # point at origin; centers at distances 1, 2, 3, 4 -> weights from
    # inverse-squared distances of the 3 nearest
    points = jnp.asarray([[[0.0, 0, 0]]])
    centers = jnp.asarray([[[1.0, 0, 0], [2.0, 0, 0], [3.0, 0, 0],
                            [4.0, 0, 0]]])
    d2, idx = ops.three_nn(points, centers)
    np.testing.assert_array_equal(np.asarray(idx)[0, 0], [0, 1, 2])
    d0, d1_, d2_ = 1.0, 4.0, 9.0
    s = d0 * d1_ + d0 * d2_ + d1_ * d2_
    w = np.asarray(ops.three_nn_weights(d2))[0, 0]
    np.testing.assert_allclose(w, [d1_ * d2_ / s, d0 * d2_ / s,
                                   d0 * d1_ / s], rtol=1e-5)


# ---------------- edge cases / degenerate inputs ----------------

def test_chamfer_odd_sizes_and_single_point(rng):
    # sizes far from chunk multiples, including N=1
    a = rng.randn(1, 1, 3).astype(np.float32)
    b = rng.randn(1, 7, 3).astype(np.float32)
    d1, d2, i1, i2 = ops.chamfer_distance(jnp.asarray(a), jnp.asarray(b),
                                          chunk=4)
    w1, w2, j1, j2 = oracles.chamfer_np(a, b)
    np.testing.assert_allclose(np.asarray(d1), w1, rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i2), j2)


def test_chamfer_identical_points_degenerate():
    # all points identical: distances 0, idx 0 (first minimum)
    x = jnp.ones((1, 16, 3))
    d1, d2, i1, i2 = ops.chamfer_distance(x, x)
    assert float(jnp.max(d1)) == 0.0
    np.testing.assert_array_equal(np.asarray(i1), 0)


def test_voxelize_all_points_one_voxel():
    feats = jnp.ones((1, 50, 4))
    coords = jnp.zeros((1, 50, 3), jnp.int32)
    grid = ops.avg_voxelize(feats, coords, 4)
    np.testing.assert_allclose(np.asarray(grid)[0, 0, 0, 0], 1.0)
    assert float(jnp.sum(jnp.abs(grid))) == 4.0  # only one occupied voxel


def test_normalize_coords_degenerate_cloud():
    # identical points: centered = 0, denom = eps -> all coords mid-grid
    pts = jnp.ones((1, 10, 3))
    normc, voxc = ops.normalize_coords(pts, 8, eps=1e-6)
    assert np.isfinite(np.asarray(normc)).all()
    np.testing.assert_array_equal(np.asarray(voxc), 4)  # round(0.5*8)


def test_ball_query_no_hits():
    centers = jnp.zeros((1, 2, 3))
    points = jnp.ones((1, 5, 3)) * 100.0
    idx = ops.ball_query(centers, points, radius=0.1, num_neighbors=3)
    np.testing.assert_array_equal(np.asarray(idx), 0)


def test_fps_more_samples_than_points(rng):
    pts = jnp.asarray(rng.randn(1, 4, 3).astype(np.float32))
    idx = ops.furthest_point_sample_indices(pts, 4)
    assert sorted(np.asarray(idx)[0].tolist()) == [0, 1, 2, 3]


def test_emd_single_point():
    a = jnp.asarray([[[1.0, 0, 0]]])
    b = jnp.asarray([[[0.0, 0, 0]]])
    d = float(ops.earth_mover_distance(a, b)[0])
    assert abs(d - 1.0) < 1e-3  # d^2 = 1, match = 1, /N = 1


def test_emd_streamed_gradients_match_dense(rng):
    from pcfm.ops.emd import earth_mover_distance_streamed
    a = jnp.asarray(rng.randn(2, 96, 3).astype(np.float32))
    b = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
    gd = jax.grad(lambda x: jnp.sum(ops.earth_mover_distance(x, b)))(a)
    gs = jax.grad(lambda x: jnp.sum(
        earth_mover_distance_streamed(x, b, chunk=32)))(a)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gd), atol=1e-5)
    gd2 = jax.grad(lambda y: jnp.sum(ops.earth_mover_distance(a, y)))(b)
    gs2 = jax.grad(lambda y: jnp.sum(
        earth_mover_distance_streamed(a, y, chunk=32)))(b)
    np.testing.assert_allclose(np.asarray(gs2), np.asarray(gd2), atol=1e-5)


def test_logits_mask(rng):
    coords = jnp.asarray(rng.randn(2, 40, 3).astype(np.float32))
    logits = jnp.asarray(rng.randn(2, 40, 2).astype(np.float32))
    sel, mean, mask = ops.logits_mask(coords, logits, 16,
                                      jax.random.PRNGKey(0))
    assert sel.shape == (2, 16, 3) and mean.shape == (2, 3)
    mask_np = np.asarray(mask)
    # mean matches the positive-point average
    for b in range(2):
        pos = np.asarray(coords)[b][mask_np[b]]
        np.testing.assert_allclose(np.asarray(mean)[b], pos.mean(0),
                                   rtol=1e-4, atol=1e-5)
    # selected points are centered positives: adding the mean back must land
    # on actual positive coords
    restored = np.asarray(sel) + np.asarray(mean)[:, None, :]
    for b in range(2):
        pos = {tuple(np.round(p, 4)) for p in
               np.asarray(coords)[b][mask_np[b]]}
        for p in restored[b]:
            assert tuple(np.round(p, 4)) in pos


def test_logits_mask_no_positives():
    coords = jnp.ones((1, 10, 3))
    logits = jnp.stack([jnp.ones((1, 10)), jnp.zeros((1, 10))], axis=-1)
    sel, mean, mask = ops.logits_mask(coords, logits, 4,
                                      jax.random.PRNGKey(0))
    assert not bool(jnp.any(mask))
    np.testing.assert_allclose(np.asarray(mean), 0.0)
    np.testing.assert_allclose(np.asarray(sel), 0.0)  # zeroed coords, idx 0
