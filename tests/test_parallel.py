"""Multi-device tests on the 8-device virtual CPU mesh: dp x sp sharded
train step parity with single-device, and sharded sampling."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pcfm.config import Config
from pcfm.parallel import make_mesh, replicate_state, shard_batch
from pcfm.parallel.mesh import batch_sharding
from pcfm.train.state import init_state
from pcfm.train.step import make_train_step


def tiny_cfg(**kw):
    base = dict(pf_backbone="mlp", latent_dim=16, enc_width=16, enc_depth=4,
                pf_width=32, pf_depth=3, pf_emb_dim=16, lf_width=32,
                lf_depth=3, lf_emb_dim=16, warmup_steps=0, amp=False,
                has_rgb=True, cond_dim=2, pointflow_rgb=True,
                use_rgb_in_latent=True)
    base.update(kw)
    return Config(**base)


def _batch(key, b=8, n=32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {"pts": jax.random.normal(k1, (b, n, 3)),
            "rgb": jax.random.uniform(k2, (b, n, 3)),
            "cond": jax.random.normal(k3, (b, 2))}


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("dp,sp", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_sharded_step_matches_single_device(dp, sp):
    cfg = tiny_cfg(dp=dp, sp=sp)
    bundle, state0, tx = init_state(cfg, jax.random.PRNGKey(0), 100)
    step = make_train_step(bundle, tx, donate=False)
    batch = _batch(jax.random.PRNGKey(1))
    rng = jax.random.PRNGKey(2)
    c1, d1 = jnp.float32(1.0), jnp.float32(0.0)

    # single device
    s_ref, m_ref = step(state0, batch, rng, c1, d1)

    # sharded
    mesh = make_mesh(dp, sp)
    assert mesh is not None
    state_sh = replicate_state(state0, mesh)
    batch_sh = shard_batch(batch, mesh)
    s_mesh, m_mesh = step(state_sh, batch_sh, rng, c1, d1)

    np.testing.assert_allclose(float(m_ref["loss"]), float(m_mesh["loss"]),
                               rtol=2e-4, atol=2e-5)
    # params after one step agree
    la = jax.tree_util.tree_leaves(s_ref.params)
    lb = jax.tree_util.tree_leaves(s_mesh.params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3,
                                   atol=5e-5)


def test_sharded_hybrid_step_runs():
    """The voxel scatter + global pools must partition under (data, points)
    sharding of the hybrid backbone."""
    cfg = tiny_cfg(pf_backbone="hybrid", ctx_dim=8, ctx_emb_dim=16,
                   ctx_stage_channels=[8], ctx_stage_blocks=[1],
                   ctx_stage_res=[4], dp=2, sp=4)
    bundle, state, tx = init_state(cfg, jax.random.PRNGKey(0), 100)
    step = make_train_step(bundle, tx, donate=False)
    mesh = make_mesh(2, 4)
    state = replicate_state(state, mesh)
    batch = shard_batch(_batch(jax.random.PRNGKey(1), b=4, n=32), mesh)
    state, m = step(state, batch, jax.random.PRNGKey(2), jnp.float32(1.0),
                    jnp.float32(0.0))
    assert np.isfinite(float(m["loss"]))


def test_sharded_sampling():
    from pcfm.train.evaluate import make_sample_fn
    cfg = tiny_cfg(dp=4, sp=2, sample_steps=2)
    bundle, state, tx = init_state(cfg, jax.random.PRNGKey(0), 100)
    mesh = make_mesh(4, 2)
    state = replicate_state(state, mesh)
    sample_fn = make_sample_fn(bundle)
    cond = jax.random.normal(jax.random.PRNGKey(1), (8, 2))
    x = sample_fn(state, cond, jax.random.PRNGKey(2), 8, 64)
    assert x.shape == (8, 64, 6)
    assert np.isfinite(np.asarray(x)).all()


def test_graft_entry_dryrun():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_graft_entry_forward():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (2, 64, 6)
    assert np.isfinite(np.asarray(out)).all()


def test_sp_voxelize_matches_global():
    from pcfm.ops.voxel import avg_voxelize, normalize_coords
    from pcfm.parallel.sp_ops import make_sp_voxelize
    mesh = make_mesh(2, 4)
    key = jax.random.PRNGKey(0)
    feats = jax.random.normal(key, (4, 64, 6))
    pts = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 3))
    _, voxc = normalize_coords(pts, 4)
    want = np.asarray(avg_voxelize(feats, voxc, 4))
    fn = make_sp_voxelize(mesh, 4)
    got = np.asarray(fn(jax.device_put(feats, batch_sharding(mesh)),
                        jax.device_put(voxc, batch_sharding(mesh))))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_sp_global_max_matches_global():
    from pcfm.parallel.sp_ops import make_sp_global_max
    mesh = make_mesh(2, 4)
    key = jax.random.PRNGKey(0)
    h = jax.random.normal(key, (4, 64, 16))
    fn = make_sp_global_max(mesh)
    got = np.asarray(fn(jax.device_put(h, batch_sharding(mesh))))
    np.testing.assert_allclose(got, np.asarray(jnp.max(h, axis=1)),
                               atol=1e-6)


def test_sp_context_hybrid_step_parity():
    """With the sp mesh context set, PVConv routes vox/devox through
    shard_map (local scatter + psum); the step must match the GSPMD path."""
    from pcfm.parallel.sp_context import set_sp_mesh
    cfg = tiny_cfg(pf_backbone="hybrid", ctx_dim=8, ctx_emb_dim=16,
                   ctx_stage_channels=[8], ctx_stage_blocks=[1],
                   ctx_stage_res=[4], dp=2, sp=4)
    bundle, state0, tx = init_state(cfg, jax.random.PRNGKey(0), 100)
    batch = _batch(jax.random.PRNGKey(1), b=4, n=32)
    rng = jax.random.PRNGKey(2)
    c1, d1 = jnp.float32(1.0), jnp.float32(0.0)
    mesh = make_mesh(2, 4)
    batch_sh = shard_batch(batch, mesh)

    step_ref = make_train_step(bundle, tx, donate=False)
    s_ref, m_ref = step_ref(replicate_state(state0, mesh), batch_sh, rng,
                            c1, d1)

    set_sp_mesh(mesh)
    try:
        step_sp = make_train_step(bundle, tx, donate=False)
        s_sp, m_sp = step_sp(replicate_state(state0, mesh), batch_sh, rng,
                             c1, d1)
    finally:
        set_sp_mesh(None)
    # GSPMD path uses the dense bf16 one-hot at R=4, the sp path the f32
    # segment-sum — identical semantics, small dtype wiggle allowed
    np.testing.assert_allclose(float(m_ref["loss"]), float(m_sp["loss"]),
                               rtol=5e-3)
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.params),
                    jax.tree_util.tree_leaves(s_sp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2,
                                   atol=2e-3)


def test_shmap_voxelize_no_point_allgather():
    """The explicit shard_map scatter must compile to psum (all-reduce)
    with NO all-gather of the point axis (the GSPMD scatter's failure
    mode this path exists to avoid)."""
    from pcfm.ops.voxel import normalize_coords
    from pcfm.parallel.sp_ops import shmap_avg_voxelize
    mesh = make_mesh(2, 4)
    feats = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 6))
    pts = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 3))
    _, voxc = normalize_coords(pts, 4)
    sh = batch_sharding(mesh)

    fn = jax.jit(lambda f, v: shmap_avg_voxelize(mesh, f, v, 4),
                 in_shardings=(sh, sh))
    txt = fn.lower(feats, voxc).compile().as_text()
    assert "all-reduce" in txt
    assert "all-gather" not in txt


def test_sharded_hybrid_matches_single_device():
    cfg = tiny_cfg(pf_backbone="hybrid", ctx_dim=8, ctx_emb_dim=16,
                   ctx_stage_channels=[8], ctx_stage_blocks=[1],
                   ctx_stage_res=[4], dp=2, sp=4)
    bundle, state0, tx = init_state(cfg, jax.random.PRNGKey(0), 100)
    step = make_train_step(bundle, tx, donate=False)
    batch = _batch(jax.random.PRNGKey(1), b=4, n=32)
    rng = jax.random.PRNGKey(2)
    c1, d1 = jnp.float32(1.0), jnp.float32(0.0)
    s_ref, m_ref = step(state0, batch, rng, c1, d1)
    mesh = make_mesh(2, 4)
    s_mesh, m_mesh = step(replicate_state(state0, mesh),
                          shard_batch(batch, mesh), rng, c1, d1)
    np.testing.assert_allclose(float(m_ref["loss"]), float(m_mesh["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.params),
                    jax.tree_util.tree_leaves(s_mesh.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3,
                                   atol=1e-4)


class _FakeDev:
    """Minimal device stand-in for layout-only mesh math."""

    def __init__(self, pi):
        self.process_index = pi

    def __repr__(self):
        return f"dev(p{self.process_index})"


def test_data_axis_groups_layouts():
    """data_axis_shard's grouping: data-across-procs, sp-across-procs
    (transposed), and block layouts (loader sharding must follow the MESH,
    not process_index — different per-rank data on a replicated data axis
    silently corrupts the global batch)."""
    import numpy as np

    from pcfm.parallel.mesh import _data_axis_groups

    def groups(devarr):
        by_proc, keys = _data_axis_groups(np.asarray(devarr), ("data",
                                                               "points"))
        return by_proc, keys

    # 2 procs x 2 devs, data across procs: each proc its own shard
    d = [[_FakeDev(0), _FakeDev(0)], [_FakeDev(1), _FakeDev(1)]]
    by_proc, keys = groups(d)
    assert len(keys) == 2
    assert keys.index(frozenset(by_proc[0])) == 0
    assert keys.index(frozenset(by_proc[1])) == 1

    # transposed sp-across-procs: every proc sees every data position ->
    # ONE shard (all ranks replicas; loader rank 0/world 1)
    d = [[_FakeDev(0), _FakeDev(1)], [_FakeDev(0), _FakeDev(1)]]
    by_proc, keys = groups(d)
    assert len(keys) == 1
    assert frozenset(by_proc[0]) == frozenset(by_proc[1]) == keys[0]

    # 4-position data axis over 2 procs in contiguous blocks: 2 shards
    d = [[_FakeDev(0)], [_FakeDev(0)], [_FakeDev(1)], [_FakeDev(1)]]
    _, keys = groups(d)
    assert len(keys) == 2 and sorted(keys[0]) == [0, 1] \
        and sorted(keys[1]) == [2, 3]

    # overlapping-but-unequal position sets: ill-defined, must raise
    d = [[_FakeDev(0), _FakeDev(0)], [_FakeDev(0), _FakeDev(1)]]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        groups(d)


def test_data_axis_shard_single_process():
    """In-process meshes (tests, single host): one shard, rank 0 — the
    loader yields the full global batch and shard_batch splits it."""
    from pcfm.parallel.mesh import data_axis_shard, make_mesh
    mesh = make_mesh(4, 2)
    assert data_axis_shard(mesh) == (0, 1)
    assert data_axis_shard(None) == (0, 1)


def test_grid_bn_config_plumbs_to_equal_forward():
    """cfg.grid_bn selects the voxel-grid BN impl through the whole
    HybridMLP stack; flax/flat produce identical fp32 forwards (the
    param/stat trees are equal by construction)."""
    import jax
    import jax.numpy as jnp

    from pcfm.config import Config
    from pcfm.train.state import init_state

    outs = {}
    for impl in ("flax", "flat"):
        cfg = Config(pf_backbone="hybrid", grid_bn=impl, latent_dim=8,
                     pf_width=16, pf_depth=2, pf_emb_dim=8, ctx_dim=8,
                     ctx_emb_dim=8, ctx_stage_res=[4], ctx_stage_channels=[8],
                     ctx_stage_blocks=[1], cond_dim=0, has_rgb=False,
                     amp=False, use_bf16=False, tr_max_sample_points=32,
                     batch_size=2, ctx_dtype="fp32")
        bundle, state, _ = init_state(cfg, jax.random.PRNGKey(0),
                                      total_steps=10)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 3))
        t = jnp.full((2,), 0.5)
        v = bundle.pf.apply({"params": state.params["pf"],
                             "batch_stats": state.batch_stats["pf"]},
                            x, t, None, train=False)
        outs[impl] = v
    assert jnp.allclose(outs["flax"], outs["flat"], atol=1e-6)
