"""Forward parity of the hybrid stack vs the torch mirror (eval mode,
transplanted weights): voxel ops, PVConv, ContextNet."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from pcfm import models  # noqa: E402
from pcfm.nn.pvconv import PVConv  # noqa: E402
from pcfm.ops.voxel import (avg_voxelize, normalize_coords,  # noqa: E402
                            trilinear_devoxelize)
from tests import torch_mirror_hybrid as tmh  # noqa: E402

# fp32 tolerance: conv reduction-order variance plus knife-edge voxel
# rounding (norm_coords within ~1e-7 of x.5 can round to different voxels
# across fp32 implementations; trilinear output stays continuous)
ATOL = 5e-4


def test_voxel_ops_parity_torch():
    rng = np.random.RandomState(0)
    pts = rng.randn(2, 200, 3).astype(np.float32)
    feats = rng.randn(2, 200, 7).astype(np.float32)
    r = 8
    nc_t, vc_t = tmh.normalize_coords_t(torch.from_numpy(pts), r)
    nc_j, vc_j = normalize_coords(jnp.asarray(pts), r, eps=1e-6)
    np.testing.assert_allclose(np.asarray(nc_j), nc_t.numpy(), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(vc_j), vc_t.numpy())
    grid_t = tmh.avg_voxelize_t(torch.from_numpy(feats), vc_t, r)
    grid_j = avg_voxelize(jnp.asarray(feats), jnp.asarray(vc_t.numpy()), r)
    np.testing.assert_allclose(np.asarray(grid_j), grid_t.numpy(), atol=1e-5)
    out_t = tmh.trilinear_devox_t(grid_t, nc_t, r)
    out_j = trilinear_devoxelize(jnp.asarray(grid_t.numpy()), nc_j, r)
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=1e-5)


def test_pvconv_forward_parity():
    torch.manual_seed(0)
    in_c, out_c, r = 8, 16, 4
    net_t = tmh.PVConvT(in_c, out_c, r, with_se=True).eval()
    params, stats = tmh.pvconv_params(net_t)
    net_j = PVConv(out_channels=out_c, kernel_size=3, resolution=r,
                   with_se=True, eps=1e-6)
    rng = np.random.RandomState(0)
    feats = rng.randn(2, 50, in_c).astype(np.float32)
    coords = rng.randn(2, 50, 3).astype(np.float32)
    with torch.no_grad():
        want, _ = net_t(torch.from_numpy(feats), torch.from_numpy(coords))
    got, _ = net_j.apply({"params": params, "batch_stats": stats},
                         jnp.asarray(feats), jnp.asarray(coords),
                         train=False)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=ATOL)


def test_context_net_forward_parity():
    torch.manual_seed(1)
    kw = dict(in_point_dim=6, cond_dim=5, emb_dim=16, ctx_dim=8,
              stage_channels=(16, 16), stage_blocks=(1, 1), stage_res=(4, 4),
              with_se=True, gn_groups=4, with_global=True)
    net_t = tmh.ContextNetT(t_gate_k=10.0, t_gate_tau=0.4, **kw).eval()
    params, stats = tmh.context_net_params(net_t)
    net_j = models.ContextNet(norm_type="group", voxel_normalize=True,
                              use_t_gate=True, t_gate_k=10.0,
                              t_gate_tau=0.4, **kw)
    rng = np.random.RandomState(1)
    x = rng.randn(2, 40, 6).astype(np.float32)
    t = rng.rand(2).astype(np.float32)
    cond = rng.randn(2, 5).astype(np.float32)
    with torch.no_grad():
        want = net_t(torch.from_numpy(x), torch.from_numpy(t),
                     torch.from_numpy(cond)).numpy()
    got = np.asarray(net_j.apply({"params": params, "batch_stats": stats},
                                 jnp.asarray(x), jnp.asarray(t),
                                 jnp.asarray(cond), train=False))
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_hybrid_mlp_full_forward_parity():
    torch.manual_seed(2)
    cond_dim, pd, depth = 5, 6, 3
    ctx_kw = dict(emb_dim=16, ctx_dim=8, stage_channels=(16,),
                  stage_blocks=(1,), stage_res=(4,), with_se=True,
                  gn_groups=4, with_global=True, t_gate_k=10.0,
                  t_gate_tau=0.8)
    head_kw = dict(ctx_dim=8, width=32, depth=depth, emb_dim=16)
    net_t = tmh.HybridMLPT(cond_dim, pd, ctx_kw, head_kw).eval()
    params, stats = tmh.hybrid_params(net_t, depth)
    net_j = models.HybridMLP(
        cond_dim=cond_dim, point_dim=pd, ctx_dim=8, ctx_emb_dim=16,
        stage_channels=(16,), stage_blocks=(1,), stage_res=(4,),
        with_se=True, norm_type="group", gn_groups=4, with_global=True,
        voxel_normalize=True, use_t_gate=True, t_gate_k=10.0,
        t_gate_tau=0.8, pf_width=32, pf_depth=depth, pf_emb_dim=16)
    rng = np.random.RandomState(4)
    x = rng.randn(2, 30, pd).astype(np.float32)
    t = rng.rand(2).astype(np.float32)
    cond = rng.randn(2, cond_dim).astype(np.float32)
    with torch.no_grad():
        want = net_t(torch.from_numpy(x), torch.from_numpy(t),
                     torch.from_numpy(cond)).numpy()
    got = np.asarray(net_j.apply({"params": params, "batch_stats": stats},
                                 jnp.asarray(x), jnp.asarray(t),
                                 jnp.asarray(cond), train=False))
    np.testing.assert_allclose(got, want, atol=ATOL)
    # CFG drop-mask parity through the full hybrid
    mask = np.array([[1.0], [0.0]], np.float32)
    with torch.no_grad():
        want_m = net_t(torch.from_numpy(x), torch.from_numpy(t),
                       torch.from_numpy(cond),
                       cond_drop_mask=torch.from_numpy(mask)).numpy()
    got_m = np.asarray(net_j.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x),
        jnp.asarray(t), jnp.asarray(cond),
        cond_drop_mask=jnp.asarray(mask), train=False))
    np.testing.assert_allclose(got_m, want_m, atol=ATOL)
