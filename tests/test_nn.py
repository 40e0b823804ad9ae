"""Building-block tests: SharedMLP, SE3d, PVConv, Voxelization module,
FiLM, norms, PointNet modules."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pcfm import nn as pnn
from pcfm.nn.common import choose_gn_groups


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


def test_choose_gn_groups_matches_reference():
    # models.py:303-310 behavior
    assert choose_gn_groups(64, 32) == 32
    assert choose_gn_groups(48, 32) == 16
    assert choose_gn_groups(17, 32) == 17  # prefer clamps to C, gcd = C
    assert choose_gn_groups(34, 32) == 2
    assert choose_gn_groups(8, 32) == 8


def test_shared_mlp_stack(key):
    m = pnn.SharedMLP([16, 32])
    x = jax.random.normal(key, (2, 10, 8))
    v = m.init(key, x, train=False)
    y, upd = m.apply(v, x, train=True, mutable=["batch_stats"])
    assert y.shape == (2, 10, 32)
    assert (np.asarray(y) >= 0).all()  # ReLU output
    # works on rank-4 (grouped) inputs like the reference dim=2 variant
    x4 = jax.random.normal(key, (2, 5, 4, 8))
    assert m.apply(v, x4, train=False).shape == (2, 5, 4, 32)


def test_se3d_gating(key):
    se = pnn.SE3d(channel=16)
    g = jax.random.normal(key, (2, 4, 4, 4, 16))
    v = se.init(key, g)
    out = se.apply(v, g)
    assert out.shape == g.shape
    # sigmoid gate: |out| <= |g|
    assert float(jnp.max(jnp.abs(out) - jnp.abs(g))) <= 1e-6


def test_voxelization_module(key):
    vox = pnn.Voxelization(resolution=8, normalize=True, eps=0.0)
    feats = jax.random.normal(key, (2, 100, 6))
    coords = jax.random.normal(key, (2, 100, 3)) * 2
    grid, normc = vox(feats, coords)
    assert grid.shape == (2, 8, 8, 8, 6)
    assert float(jnp.min(normc)) >= 0 and float(jnp.max(normc)) <= 7.0
    # scatter-mean preserves the total feature mass per occupied voxel count
    assert np.isfinite(np.asarray(grid)).all()


def test_pvconv_forward(key):
    pv = pnn.PVConv(out_channels=16, kernel_size=3, resolution=4,
                    with_se=True)
    feats = jax.random.normal(key, (2, 64, 8))
    coords = jax.random.normal(key, (2, 64, 3))
    v = pv.init(key, feats, coords, train=False)
    (out, c2), upd = pv.apply(v, feats, coords, train=True,
                              mutable=["batch_stats"])
    assert out.shape == (2, 64, 16)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(coords))
    # voxel BN(eps 1e-4) params exist
    flat = jax.tree_util.tree_flatten_with_path(v["params"])[0]
    names = ["/".join(str(p) for p in path) for path, _ in flat]
    assert any("conv3d_0" in n for n in names)
    assert any("se" in n for n in names)


def test_film_blocks(key):
    f = pnn.FiLMBlock(width=16)
    h = jax.random.normal(key, (2, 10, 16))
    emb = jax.random.normal(key, (2, 8))
    v = f.init(key, h, emb)
    assert f.apply(v, h, emb).shape == (2, 10, 16)

    f1 = pnn.FiLM1d(channels=16, norm_type="group")
    v1 = f1.init(key, h, emb)
    out = f1.apply(v1, h, emb)
    # zero-init affine -> output == groupnorm(h) exactly (identity start)
    gn = pnn.make_norm("group", 16)
    vg = gn.init(key, h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(gn.apply(vg, h)),
                               atol=1e-6)


def test_pointnet_sa_fp_modules(key):
    feats = jax.random.normal(key, (2, 128, 8))
    coords = jax.random.normal(key, (2, 128, 3))
    sa = pnn.PointNetSAModule(num_centers=32, radius=0.5, num_neighbors=16,
                              out_channels=[16, 16])
    v = sa.init(key, feats, coords, train=False)
    (f2, c2), _ = sa.apply(v, feats, coords, train=True,
                           mutable=["batch_stats"])
    assert f2.shape == (2, 32, 16) and c2.shape == (2, 32, 3)

    fp = pnn.PointNetFPModule(out_channels=[8])
    vfp = fp.init(key, coords, c2, f2, feats, train=False)
    (f3, c3), _ = fp.apply(vfp, coords, c2, f2, feats, train=True,
                           mutable=["batch_stats"])
    assert f3.shape == (2, 128, 8)
    np.testing.assert_allclose(np.asarray(c3), np.asarray(coords))


def test_pointnet_a_module(key):
    feats = jax.random.normal(key, (2, 64, 8))
    coords = jax.random.normal(key, (2, 64, 3))
    a = pnn.PointNetAModule(out_channels=[16])
    v = a.init(key, feats, coords, train=False)
    (g, c), _ = a.apply(v, feats, coords, train=True,
                        mutable=["batch_stats"])
    assert g.shape == (2, 1, 16)
    assert c.shape == (2, 1, 3) and float(jnp.sum(jnp.abs(c))) == 0.0


def test_ball_query_module(key):
    bq = pnn.BallQuery(radius=0.8, num_neighbors=8)
    pts = jax.random.normal(key, (2, 64, 3)) * 0.3
    centers = pts[:, :16]
    feats = jax.random.normal(key, (2, 64, 4))
    out = bq(pts, centers, feats)
    assert out.shape == (2, 16, 8, 7)  # 3 centered coords + 4 features
    out2 = bq(pts, centers, None)
    assert out2.shape == (2, 16, 8, 3)


def test_flat_batchnorm_equals_flax(key):
    """FlatBatchNorm (the layout-friendly grid BN, ROADMAP #18) must be a
    drop-in for nn.BatchNorm(axis=-1): identical param/stat trees and
    fp32-identical outputs, running-stat updates and input grads."""
    from flax import linen as nn

    from pcfm.nn.common import FlatBatchNorm

    x = jax.random.normal(key, (2, 4, 4, 4, 8), jnp.float32) * 1.7 + 0.3
    flat = FlatBatchNorm(use_running_average=False, momentum=0.9,
                         epsilon=1e-4)
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9,
                       epsilon=1e-4, axis=-1, dtype=jnp.float32)
    v_f = flat.init(key, x)
    v_r = ref.init(key, x)
    # same tree structure (checkpoint/interop compatibility)
    assert jax.tree_util.tree_structure(v_f) == \
        jax.tree_util.tree_structure(v_r)
    # non-trivial params so scale/bias paths are exercised
    v = {"params": {"scale": jnp.linspace(0.5, 1.5, 8),
                    "bias": jnp.linspace(-0.2, 0.2, 8)},
         "batch_stats": {"mean": jnp.linspace(-1, 1, 8),
                         "var": jnp.linspace(0.5, 2.0, 8)}}
    y_f, m_f = flat.apply(v, x, mutable=["batch_stats"])
    y_r, m_r = ref.apply(v, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_r),
                               rtol=1e-5, atol=1e-6)
    for k2 in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(m_f["batch_stats"][k2]),
                                   np.asarray(m_r["batch_stats"][k2]),
                                   rtol=1e-6)

    def loss_flat(xx):
        y, _ = flat.apply(v, xx, mutable=["batch_stats"])
        return jnp.sum(y * y)

    def loss_ref(xx):
        y, _ = ref.apply(v, xx, mutable=["batch_stats"])
        return jnp.sum(y * y)

    g_f = jax.grad(loss_flat)(x)
    g_r = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_r),
                               rtol=1e-5, atol=1e-5)

    # eval mode uses running stats identically
    flat_e = FlatBatchNorm(use_running_average=True, epsilon=1e-4)
    ref_e = nn.BatchNorm(use_running_average=True, epsilon=1e-4, axis=-1,
                         dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(flat_e.apply(v, x)),
                               np.asarray(ref_e.apply(v, x)),
                               rtol=1e-6, atol=1e-7)


def test_pvconv_bn_impl_switch_equal(key):
    """PVConv with BN_IMPL 'flat' vs 'flax' computes the same forward
    (fp32) so the default switch cannot change training semantics."""
    import pcfm.nn.pvconv as pvc

    feats = jax.random.normal(key, (2, 48, 8))
    coords = jax.random.normal(key, (2, 48, 3))
    old = pvc.BN_IMPL
    try:
        outs = {}
        for impl in ("flat", "flax"):
            pvc.BN_IMPL = impl
            m = pvc.PVConv(out_channels=8, resolution=4, with_se=True)
            v = m.init(key, feats, coords, train=False)
            (y, _), mut = m.apply(v, feats, coords, train=True,
                                  mutable=["batch_stats"])
            outs[impl] = (np.asarray(y),
                          jax.tree_util.tree_map(np.asarray,
                                                 mut["batch_stats"]))
    finally:
        pvc.BN_IMPL = old
    np.testing.assert_allclose(outs["flat"][0], outs["flax"][0],
                               rtol=5e-4, atol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5,
                                                atol=1e-6),
        outs["flat"][1], outs["flax"][1])
