"""Sorted-window voxel op parity vs the reference-semantics XLA ops
(interpret mode on CPU; compiled path measured on TPU in bench)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pcfm.ops.voxel_sorted as vos
from pcfm.ops.voxel import (avg_voxelize, flatten_voxel_ids,
                            normalize_coords, trilinear_devoxelize)
from pcfm.ops.voxel_sorted import (avg_voxelize_sorted, counts_sorted,
                                   permute_points, sort_perm_by_voxel,
                                   trilinear_devoxelize_sorted,
                                   unpermute_points)


@pytest.fixture(autouse=True)
def _exact_tiles(monkeypatch):
    """Pin f32 window tiles (HIGHEST) for the exactness assertions below;
    the model path runs DEFAULT (bf16 tiles) — covered by the loose test
    at the bottom."""
    monkeypatch.setattr(vos, "DOT_PRECISION", jax.lax.Precision.HIGHEST)


def _setup(b=2, n=500, c=64, r=8, seed=0, sort=True):
    key = jax.random.PRNGKey(seed)
    pts = jax.random.normal(key, (b, n, 3))
    nc, vc = normalize_coords(pts, r)
    ids = flatten_voxel_ids(vc, r)
    if sort:
        perm = jnp.argsort(ids, axis=1)
        nc = jnp.take_along_axis(nc, perm[..., None], axis=1)
        vc = jnp.take_along_axis(vc, perm[..., None], axis=1)
        ids = jnp.take_along_axis(ids, perm, axis=1)
    feats = jax.random.normal(jax.random.PRNGKey(seed + 1), (b, n, c))
    return pts, nc, vc, ids, feats


def test_counts_sorted_matches_bincount():
    _, _, _, ids, _ = _setup()
    cnt = np.asarray(counts_sorted(ids, 512))
    for b in range(ids.shape[0]):
        want = np.bincount(np.asarray(ids)[b], minlength=512)
        np.testing.assert_array_equal(cnt[b], want)


def test_avg_voxelize_sorted_matches_reference():
    _, _, vc, ids, feats = _setup()
    want = np.asarray(avg_voxelize(feats, vc, 8)).reshape(2, 512, 64)
    got = np.asarray(avg_voxelize_sorted(feats, ids, 8, True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_avg_voxelize_sorted_grad_matches():
    _, _, vc, ids, feats = _setup(n=260)

    def f_ref(f):
        return jnp.sum(avg_voxelize(f, vc, 8) ** 2)

    def f_new(f):
        return jnp.sum(avg_voxelize_sorted(f, ids, 8, True) ** 2)

    g_ref = np.asarray(jax.grad(f_ref)(feats))
    g_new = np.asarray(jax.grad(f_new)(feats))
    np.testing.assert_allclose(g_new, g_ref, rtol=1e-4, atol=1e-5)


def test_devoxelize_sorted_matches_reference():
    _, nc, _, _, _ = _setup()
    grid = jax.random.normal(jax.random.PRNGKey(7), (2, 8, 8, 8, 64))
    want = np.asarray(trilinear_devoxelize(grid, nc, 8))
    got = np.asarray(trilinear_devoxelize_sorted(
        grid.reshape(2, 512, 64), nc, 8, True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_devoxelize_sorted_grad_matches():
    _, nc, _, _, _ = _setup(n=260)
    grid = jax.random.normal(jax.random.PRNGKey(7), (2, 8, 8, 8, 64))

    def f_ref(g):
        return jnp.sum(trilinear_devoxelize(g, nc, 8) ** 3)

    def f_new(g):
        return jnp.sum(trilinear_devoxelize_sorted(
            g.reshape(2, 512, 64), nc, 8, True) ** 3)

    g_ref = np.asarray(jax.grad(f_ref)(grid)).reshape(2, 512, 64)
    g_new = np.asarray(jax.grad(f_new)(grid)).reshape(2, 512, 64)
    np.testing.assert_allclose(g_new, g_ref, rtol=1e-4, atol=1e-5)


def test_unsorted_points_still_correct():
    """The window KERNELS derive coverage from per-tile min/max, so
    arbitrary point order stays correct (just slower: more window passes).
    Only the counts path (searchsorted) requires sorted ids — that is
    `avg_voxelize_sorted`'s documented contract."""
    from pcfm.ops.pallas.voxel_sorted import scatter_windows
    _, nc, vc, ids, feats = _setup(sort=False)
    # raw scatter sums, arbitrary order
    sums = np.asarray(scatter_windows(
        feats, ids[:, None, :], jnp.ones((2, 1, 500), jnp.float32), ids,
        8, 256, interpret=True))
    want = np.zeros((2, 512, 64), np.float32)
    for b in range(2):
        np.add.at(want[b], np.asarray(ids)[b], np.asarray(feats)[b])
    np.testing.assert_allclose(sums, want, rtol=1e-4, atol=1e-4)
    # devoxelize, arbitrary order
    grid = jax.random.normal(jax.random.PRNGKey(7), (2, 8, 8, 8, 64))
    want2 = np.asarray(trilinear_devoxelize(grid, nc, 8))
    got2 = np.asarray(trilinear_devoxelize_sorted(
        grid.reshape(2, 512, 64), nc, 8, True))
    np.testing.assert_allclose(got2, want2, rtol=1e-5, atol=1e-5)


def test_avg_voxelize_noncontiguous_counts():
    """contiguous=False: equal ids need not form runs (a coarser stage
    under the stage-0 sort) — windowed scatter-ones counts."""
    _, _, vc, ids, feats = _setup(sort=False)
    want = np.asarray(avg_voxelize(feats, vc, 8)).reshape(2, 512, 64)
    got = np.asarray(avg_voxelize_sorted(feats, ids, 8, True, False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def f_new(f):
        return jnp.sum(avg_voxelize_sorted(f, ids, 8, True, False) ** 2)

    def f_ref(f):
        return jnp.sum(avg_voxelize(f, vc, 8) ** 2)

    np.testing.assert_allclose(np.asarray(jax.grad(f_new)(feats)),
                               np.asarray(jax.grad(f_ref)(feats)),
                               rtol=1e-4, atol=1e-4)


def test_edge_coords_boundary_collapse():
    """Points exactly on voxel centers / the R-1 boundary exercise the
    frac==0 corner collapse."""
    r = 4
    nc = jnp.asarray([[[0.0, 0.0, 0.0], [3.0, 3.0, 3.0], [1.5, 2.0, 3.0],
                       [2.0, 2.0, 2.0]]])
    grid = jax.random.normal(jax.random.PRNGKey(0), (1, r, r, r, 64))
    want = np.asarray(trilinear_devoxelize(grid, nc, r))
    got = np.asarray(trilinear_devoxelize_sorted(
        grid.reshape(1, r ** 3, 64), nc, r, True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_permute_roundtrip_and_grad():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 40, 5))
    pts = jax.random.normal(jax.random.PRNGKey(1), (2, 40, 3))
    perm, inv = sort_perm_by_voxel(pts, 8)
    y = permute_points(x, perm, inv)
    back = unpermute_points(y, perm, inv)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=0)

    def f(x):
        return jnp.sum(permute_points(x, perm, inv) ** 2)

    g = np.asarray(jax.grad(f)(x))
    np.testing.assert_allclose(g, 2 * np.asarray(x), atol=1e-6)


def test_contextnet_sorted_backend_matches_xla(monkeypatch):
    """Full ContextNet with voxel_backend='sorted' (entry sort + sorted
    PVConv kernels in interpret mode + exit unsort) must match the XLA
    backend — forward and input-gradient."""
    import pcfm.nn.pvconv as pvc
    monkeypatch.setattr(pvc, "SORTED_N_MIN", 0)   # test uses n=300
    from pcfm.models.context import ContextNet

    kw = dict(in_point_dim=3, cond_dim=2, emb_dim=16, ctx_dim=8,
              stage_channels=(8,), stage_blocks=(1,), stage_res=(16,),
              with_se=False, norm_type="group", gn_groups=4,
              with_global=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 300, 3))
    t = jnp.asarray([0.3, 0.7])
    cond = jax.random.normal(jax.random.PRNGKey(1), (2, 2))

    net_x = ContextNet(voxel_backend="xla", **kw)
    net_s = ContextNet(voxel_backend="sorted", **kw)
    params = net_x.init(jax.random.PRNGKey(2), x, t, cond, train=False)

    out_x = net_x.apply(params, x, t, cond, train=False)
    out_s = net_s.apply(params, x, t, cond, train=False)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_x),
                               rtol=1e-4, atol=1e-5)

    def loss(net):
        def f(xx):
            return jnp.sum(net.apply(params, xx, t, cond, train=False) ** 2)
        return f

    g_x = np.asarray(jax.grad(loss(net_x))(x))
    g_s = np.asarray(jax.grad(loss(net_s))(x))
    np.testing.assert_allclose(g_s, g_x, rtol=1e-3, atol=1e-4)


def test_odd_channel_padding():
    """C not a multiple of 64 goes through the channel-pad path."""
    _, _, vc, ids, _ = _setup(c=64)
    feats = jax.random.normal(jax.random.PRNGKey(3), (2, 500, 17))
    want = np.asarray(avg_voxelize(feats, vc, 8)).reshape(2, 512, 17)
    got = np.asarray(avg_voxelize_sorted(feats, ids, 8, True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_default_precision_bf16_tiles(monkeypatch):
    """Model-path precision (DEFAULT -> bf16 window tiles): same windows/
    semantics, ~2^-8 relative rounding."""
    monkeypatch.setattr(vos, "DOT_PRECISION", jax.lax.Precision.DEFAULT)
    _, nc, vc, ids, feats = _setup(n=300)
    want = np.asarray(avg_voxelize(feats, vc, 8)).reshape(2, 512, 64)
    got = np.asarray(vos.avg_voxelize_sorted(feats, ids, 8, True))
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)
    grid = jnp.asarray(want)
    want_d = np.asarray(trilinear_devoxelize(
        grid.reshape(2, 8, 8, 8, 64), nc, 8))
    got_d = np.asarray(vos.trilinear_devoxelize_sorted(grid, nc, 8, True))
    np.testing.assert_allclose(got_d, want_d, rtol=3e-2, atol=3e-2)


def test_window_end_within_padding():
    """Regression (r2 review): the last pass of the highest group must
    stay inside the padded grid block for ADVERSARIAL tiles whose ids span
    to the grid end — (tmax - start) an exact multiple of w_rows used to
    overrun by `reach` rows (OOB VMEM read in gather, read-modify-write in
    scatter bwd)."""
    import pcfm.ops.pallas.voxel_sorted as pvsk

    r, n = 16, 20000
    r3 = r ** 3
    reach = r + 1
    w = pvsk.pick_window(r, n, reach)
    groups = (0, r * r)
    # tile base ids spanning e.g. [3856, 4095] makes (tmax - start) hit an
    # exact w multiple; scan ALL (start_min, base_max) combos to be sure
    for base_max in range(r3 - 64, r3):
        for span in range(0, 512, 8):
            tmin = max(0, base_max - span)
            base = np.full((1, pvsk.TILE), tmin, np.int32)
            base[0, -1] = base_max
            starts, n_pass = pvsk._tile_meta(jnp.asarray(base), w, reach)
            s = int(starts[0, 0]) * pvsk.ALIGN
            end = s + max(groups) + int(n_pass[0, 0]) * w
            r3p = r3 + max(groups) + w + (-(-reach // pvsk.ALIGN)
                                          ) * pvsk.ALIGN
            assert end <= r3p, (base_max, span, end, r3p)


def test_wide_channel_block():
    """c in (128, 256]: a single 256-wide channel block (r2: wider blocks
    halve the multi-hot/DMA duplication; exercise the padded c=200 case
    through both kernels)."""
    _, nc, vc, ids, _ = _setup(n=300)
    feats = jax.random.normal(jax.random.PRNGKey(5), (2, 300, 200))
    want = np.asarray(avg_voxelize(feats, vc, 8)).reshape(2, 512, 200)
    got = np.asarray(avg_voxelize_sorted(feats, ids, 8, True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    grid = jnp.asarray(want)
    want_d = np.asarray(trilinear_devoxelize(
        grid.reshape(2, 8, 8, 8, 200), nc, 8))
    got_d = np.asarray(trilinear_devoxelize_sorted(grid, nc, 8, True))
    np.testing.assert_allclose(got_d, want_d, rtol=1e-4, atol=1e-4)


def test_fused_tr_kernels_exact(monkeypatch):
    """FUSE_TR (r3): one (W, TILE) multi-hot + single dot per pass-group
    must match the per-row kernels bit-for-bit at HIGHEST precision —
    fwd and grad, both ops."""
    import pcfm.ops.pallas.voxel_sorted as pvsk
    _, nc, vc, ids, feats = _setup(n=500)
    monkeypatch.setattr(pvsk, "FUSE_TR", False)    # per-row baseline
    base_g = np.asarray(avg_voxelize_sorted(feats, ids, 8, True))
    grid = jnp.asarray(base_g)

    def grads(fn, *args):
        return np.asarray(jax.grad(lambda a: jnp.sum(fn(a) ** 2))(*args))

    base_d = np.asarray(trilinear_devoxelize_sorted(grid, nc, 8, True))
    g_base = grads(lambda f: avg_voxelize_sorted(f, ids, 8, True), feats)
    d_base = grads(lambda g: trilinear_devoxelize_sorted(g, nc, 8, True),
                   grid)
    monkeypatch.setattr(pvsk, "FUSE_TR", True)
    got_g = np.asarray(avg_voxelize_sorted(feats, ids, 8, True))
    got_d = np.asarray(trilinear_devoxelize_sorted(grid, nc, 8, True))
    g_fuse = grads(lambda f: avg_voxelize_sorted(f, ids, 8, True), feats)
    d_fuse = grads(lambda g: trilinear_devoxelize_sorted(g, nc, 8, True),
                   grid)
    # the fused scatter sums all TILE contributions in ONE dot where the
    # per-row kernel adds two partial dots — same values up to the f32
    # summation tree (measured max diff 6e-8); the gather is bit-exact
    np.testing.assert_allclose(got_g, base_g, rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(got_d, base_d)
    np.testing.assert_allclose(g_fuse, g_base, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(d_fuse, d_base, rtol=1e-6, atol=1e-6)


def test_gather_out_bf16(monkeypatch):
    """GATHER_OUT_BF16 (r3): bf16 gather outputs only round the final
    write (~2^-8 relative) and never engage on HIGHEST-precision paths
    (counts stay exact)."""
    import pcfm.ops.pallas.voxel_sorted as pvsk
    monkeypatch.setattr(vos, "DOT_PRECISION", jax.lax.Precision.DEFAULT)
    monkeypatch.setattr(pvsk, "GATHER_OUT_BF16", True)
    _, nc, vc, ids, feats = _setup(n=300)
    want = np.asarray(avg_voxelize(feats, vc, 8)).reshape(2, 512, 64)
    grid = jnp.asarray(want)
    want_d = np.asarray(trilinear_devoxelize(
        grid.reshape(2, 8, 8, 8, 64), nc, 8))
    got_d = np.asarray(vos.trilinear_devoxelize_sorted(grid, nc, 8, True))
    np.testing.assert_allclose(got_d, want_d, rtol=3e-2, atol=3e-2)
    # counts path (HIGHEST) stays exact integers
    inv = np.asarray(vos.inv_counts_windowed(ids, 8, 256, True))
    cnt = np.round(1.0 / inv)
    np.testing.assert_allclose(1.0 / inv, cnt, atol=0)
