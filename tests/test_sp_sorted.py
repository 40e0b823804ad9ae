"""Sorted-window voxel kernels under sequence parallelism
(pcfm/parallel/sp_sorted.py): shard-local sort + psum grids must match
the unsharded reference-semantics ops, and the backend choice must be
pinned per mesh shape (VERDICT r2: no silent 2x fallback)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

import pcfm.ops.voxel_sorted as vos
from pcfm.ops.voxel import (avg_voxelize, flatten_voxel_ids,
                            normalize_coords, trilinear_devoxelize)
from pcfm.parallel.mesh import batch_sharding, make_mesh, shard_batch
from pcfm.parallel.sp_context import set_sp_mesh
from pcfm.parallel.sp_sorted import (shmap_avg_voxelize_sorted,
                                     shmap_devox_sorted, shmap_permute,
                                     shmap_sort_perm, shmap_stage_cache)


@pytest.fixture(autouse=True)
def _exact_tiles(monkeypatch):
    monkeypatch.setattr(vos, "DOT_PRECISION", jax.lax.Precision.HIGHEST)


@pytest.fixture
def mesh():
    m = make_mesh(2, 4)
    yield m


def _sorted_local_inputs(mesh, b=2, n=512, c=16, r=8, seed=0):
    """Random cloud, shard-locally sorted by voxel id at r (what the
    ContextNet entry sort produces under sp)."""
    key = jax.random.PRNGKey(seed)
    pts = jax.random.normal(key, (b, n, 3))
    feats = jax.random.normal(jax.random.PRNGKey(seed + 1), (b, n, c))
    sh = batch_sharding(mesh)
    pts_s = jax.device_put(pts, sh)
    feats_s = jax.device_put(feats, sh)
    perm, inv = shmap_sort_perm(mesh, pts_s, r)
    pts_sorted = shmap_permute(mesh, pts_s, perm, inv)
    feats_sorted = shmap_permute(mesh, feats_s, perm, inv)
    return pts_sorted, feats_sorted, perm, inv


def test_shmap_permute_roundtrip(mesh):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 5))
    pts = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 3))
    sh = batch_sharding(mesh)
    xs, ps = jax.device_put(x, sh), jax.device_put(pts, sh)
    perm, inv = shmap_sort_perm(mesh, ps, 8)
    y = shmap_permute(mesh, xs, perm, inv)
    back = shmap_permute(mesh, y, inv, perm)
    np.testing.assert_allclose(np.asarray(back), x, atol=0)
    # each shard's slice is a permutation of the same slice of x
    n_sh = 64 // 4
    for s in range(4):
        a = np.sort(np.asarray(y)[:, s * n_sh:(s + 1) * n_sh], axis=1)
        bref = np.sort(x[:, s * n_sh:(s + 1) * n_sh], axis=1)
        np.testing.assert_allclose(a, bref, atol=0)


def test_sp_sorted_avg_voxelize_matches_reference(mesh):
    r = 8
    pts_s, feats_s, _, _ = _sorted_local_inputs(mesh, r=r)
    cache = shmap_stage_cache(mesh, pts_s, r, interpret=True)
    grid = shmap_avg_voxelize_sorted(mesh, feats_s, cache["vox_ids"],
                                     cache["inv_pt"], r, True)
    # oracle: unsharded segment-sum scatter-mean on the SAME point order
    _, vc = normalize_coords(np.asarray(pts_s), r)
    ref = avg_voxelize(jnp.asarray(np.asarray(feats_s)), vc, r)
    b, _, c = feats_s.shape
    np.testing.assert_allclose(np.asarray(grid).reshape(b, r, r, r, c),
                               np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_sp_sorted_devox_matches_reference(mesh):
    r = 8
    pts_s, _, _, _ = _sorted_local_inputs(mesh, r=r)
    cache = shmap_stage_cache(mesh, pts_s, r, interpret=True)
    b, n = pts_s.shape[:2]
    c = 16
    grid = jax.random.normal(jax.random.PRNGKey(7), (b, r ** 3, c))
    out = shmap_devox_sorted(mesh, grid, cache["corners"], r, True)
    ref = trilinear_devoxelize(grid.reshape(b, r, r, r, c),
                               cache["norm_coords"], r)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_sp_sorted_grads_match_reference(mesh):
    """d/dfeatures of the scatter-mean and d/dgrid of the devox through
    the shard_map path must match autodiff of the XLA oracle."""
    r = 8
    pts_s, feats_s, _, _ = _sorted_local_inputs(mesh, r=r, c=8)
    cache = shmap_stage_cache(mesh, pts_s, r, interpret=True)

    def f_sp(f):
        g = shmap_avg_voxelize_sorted(mesh, f, cache["vox_ids"],
                                      cache["inv_pt"], r, True)
        return jnp.sum(g ** 2)

    _, vc = normalize_coords(np.asarray(pts_s), r)

    def f_ref(f):
        return jnp.sum(avg_voxelize(f, vc, r) ** 2)

    # grads jitted: the sp path always runs inside a jitted train step
    # (eager shard_map + AD trips an XLA sharding-override assert)
    g_sp = np.asarray(jax.jit(jax.grad(f_sp))(feats_s))
    g_ref = np.asarray(jax.grad(f_ref)(jnp.asarray(np.asarray(feats_s))))
    np.testing.assert_allclose(g_sp, g_ref, rtol=1e-4, atol=1e-5)

    b, n = pts_s.shape[:2]
    c = 8
    grid = jax.random.normal(jax.random.PRNGKey(9), (b, r ** 3, c))

    def d_sp(g):
        return jnp.sum(shmap_devox_sorted(mesh, g, cache["corners"], r,
                                          True) ** 3)

    def d_ref(g):
        return jnp.sum(trilinear_devoxelize(g.reshape(b, r, r, r, c),
                                            cache["norm_coords"], r) ** 3)

    gg_sp = np.asarray(jax.jit(jax.grad(d_sp))(grid))
    gg_ref = np.asarray(jax.grad(d_ref)(grid))
    np.testing.assert_allclose(gg_sp, gg_ref, rtol=1e-4, atol=1e-5)


def test_backend_choice_pinned_per_mesh(mesh, monkeypatch):
    """VERDICT r2 weak #4: the sorted backend must be SELECTED (not
    silently dropped) on a points-sharded mesh when the shard-local point
    count clears the threshold — and correctly refused below it."""
    import pcfm.nn.pvconv as pvc
    set_sp_mesh(mesh)
    try:
        # local n = 8192/4 = 2048 < 4096 -> refused
        monkeypatch.setattr(pvc, "SORTED_N_MIN", 4096)
        assert not pvc._use_sorted("sorted", 32, 8, 8192)
        # local n = 16384/4 = 4096 -> selected
        assert pvc._use_sorted("sorted", 32, 8, 16384)
        # xla backend / small grids stay off
        assert not pvc._use_sorted("xla", 32, 8, 16384)
        assert not pvc._use_sorted("sorted", 8, 8, 16384)
    finally:
        set_sp_mesh(None)
    # no mesh: global n governs
    monkeypatch.setattr(pvc, "SORTED_N_MIN", 4096)
    assert pvc._use_sorted("sorted", 32, 8, 8192)


def test_sp_sorted_no_point_allgather(mesh):
    """The whole point of the sp sorted path: the compiled voxelize must
    reduce partial grids (all-reduce) and NEVER all-gather the point axis
    (cf. test_shmap_voxelize_no_point_allgather for the XLA path)."""
    r = 8
    pts_s, feats_s, _, _ = _sorted_local_inputs(mesh, r=r)
    cache = shmap_stage_cache(mesh, pts_s, r, interpret=True)

    fn = jax.jit(lambda f: shmap_avg_voxelize_sorted(
        mesh, f, cache["vox_ids"], cache["inv_pt"], r, True))
    txt = fn.lower(feats_s).compile().as_text()
    assert "all-reduce" in txt
    assert "all-gather" not in txt


def test_contextnet_sorted_sp_matches_single_device(mesh, monkeypatch):
    """Full ContextNet, sorted backend, points sharded 4-way: forward and
    input-grad must match the unsharded sorted path (which itself matches
    XLA — test_voxel_sorted.py)."""
    import pcfm.nn.pvconv as pvc
    monkeypatch.setattr(pvc, "SORTED_N_MIN", 0)
    from pcfm.models.context import ContextNet

    kw = dict(in_point_dim=3, cond_dim=2, emb_dim=16, ctx_dim=8,
              stage_channels=(8,), stage_blocks=(1,), stage_res=(16,),
              with_se=False, norm_type="group", gn_groups=4,
              with_global=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 320, 3))
    t = jnp.asarray([0.3, 0.7])
    cond = jax.random.normal(jax.random.PRNGKey(1), (2, 2))

    net = ContextNet(voxel_backend="sorted", **kw)
    params = net.init(jax.random.PRNGKey(2), x, t, cond, train=False)
    out_1dev = net.apply(params, x, t, cond, train=False)

    def loss(xx):
        return jnp.sum(net.apply(params, xx, t, cond, train=False) ** 2)

    g_1dev = np.asarray(jax.grad(loss)(x))

    sh = batch_sharding(mesh)
    set_sp_mesh(mesh)
    try:
        xs = jax.device_put(x, sh)
        # jitted, as in the real train/eval steps (eager shard_map + AD
        # trips an XLA sharding-override assert)
        out_sp = jax.jit(
            lambda xx: net.apply(params, xx, t, cond, train=False))(xs)
        g_sp = np.asarray(jax.jit(jax.grad(loss))(xs))
    finally:
        set_sp_mesh(None)
    np.testing.assert_allclose(np.asarray(out_sp), np.asarray(out_1dev),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(g_sp, g_1dev, rtol=1e-3, atol=1e-4)
