"""Sorted-window Pallas kernels for the voxel scatter/gather hot path.

The hybrid backbone's wall is the R=32 PVConv stage: XLA's row
gather/scatter runs at ~28-50 ns/row on v5e (devox fwd 14.5 ms, fwd+bwd
38 ms at B=8 N=20k C=128 — scripts/probe_gather.py), far from HBM speed.
These kernels reformulate both ops as MXU matmuls against *narrow windows*
of the voxel grid:

  * Points are sorted once per step by their stage-0 voxel id (x-major).
    The model family is permutation-equivariant (per-point MLPs, voxel
    scatter/gather, global pools — no kNN/ball-query in this path), so the
    sort is applied ONCE at ContextNet entry and inverted once at exit.
  * A tile of T consecutive sorted points touches a contiguous id window:
    for the scatter the tile's own ids (span ~T*R^3/N), for the 8-corner
    trilinear gather the window widens by the corner reach R^2+R+1.
  * Within a window of W rows, gather/scatter is an (exact, f32-HIGHEST)
    one-hot matmul on the MXU:
        gather:  out(128, C) += oh(W, 128) -W-contraction- win(W, C)
        scatter: win(W, C)  += oh(W, 128) @ upd(128, C)
    The per-corner interpolation weight rides inside the one-hot (the
    nonzero entry is w instead of 1), so trilinear devoxelize comes out
    fused, and zero-weight padding entries are inert.
  * Data-dependent window counts use an in-kernel fori_loop; per-tile
    window starts/pass counts are scalar-prefetched.

Matches the reference CUDA semantics (vox.cu:18-110 scatter-mean,
trilinear_devox.cu:21-162 with the frac==0 corner collapse, which the
weighted one-hot reproduces exactly: collapsed corners carry weight 0 and
their shifted id simply never matches).  Numerics are exact f32: the
Mosaic HIGHEST-precision dot reproduces row selection bit-for-bit
(scripts/probe_kernel2.py `dot_highest_exact: True`).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HIGHEST = jax.lax.Precision.HIGHEST

# v5e has 128 MB of physical VMEM; the compiler's default scoped budget is
# ~16 MB, which the R=32 grid block (17.8 MB f32) exceeds — raise it.
_VMEM_LIMIT = 100 * 2 ** 20

# tile = TR sub-rows of 128 points (MXU-native minor dim)
TR = 2
TILE = TR * 128

# window starts are aligned to ALIGN rows and passed to the kernel DIVIDED
# by ALIGN: the in-kernel `start * ALIGN` makes the dynamic dim-1 index
# statically provably aligned (Mosaic requires this for packed-dtype (bf16)
# vector loads; a scalar-prefetched value alone is opaque to the prover)
ALIGN = 16


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# window sizing: W >= WINDOW_FACTOR * expected-id-span + reach.  The
# kernel work (multi-hot VPU build + window dot) is n_pass * W >= span,
# CEIL-quantized per tile: a smaller W wastes less on the quantization
# (most tiles take 1 pass of a tighter window) at the cost of an extra
# pass on dense tiles (scripts/probe_voxwin.py measures the sweet spot).
WINDOW_FACTOR = 2.0

# TR-fused kernels (r3, ROADMAP #13): build ONE (W, TILE) multi-hot
# spanning all TR sub-rows and run ONE MXU dot per (group, pass) instead
# of TR separate (W, 128) builds + dots — same FLOPs, fewer/wider MXU
# invocations and a single VPU select chain.  Measured on v5e 20k hybrid
# (scripts/probe_r3kernel.py): 103.2 -> 101.4 ms alone, 99.8 combined
# with GATHER_OUT_BF16.
FUSE_TR = True

# write gather outputs (point features) in bf16: they feed bf16 compute
# anyway and the write is per-tile exclusive (no read-modify-write, so no
# accumulation rounding).  Scatter outputs stay f32 — window rows are
# accumulated across overlapping tiles.  Never engages at HIGHEST
# precision (counts/parity paths).  Measured: 103.2 -> 101.9 ms alone.
GATHER_OUT_BF16 = True


def pick_window(r: int, n: int, reach: int = 0) -> int:
    """Window rows W: WINDOW_FACTOR x the expected id span of a TILE-point
    run of sorted ids (TILE * R^3/N) plus the corner `reach` beyond the
    base id (R+1 for an x-offset corner group, R^2+R+1 for all 8
    corners) — rounded up to a power of two >= 256."""
    span = int(TILE * (r ** 3) / max(1, n) * WINDOW_FACTOR) + reach + 1
    w = 256
    while w < span:
        w *= 2
    return min(w, r ** 3)


def _dot_oh_win(oh, win, precision):
    """(W, 128) x (W, C) -> (128, C), contraction over W."""
    return jax.lax.dot_general(oh, win, (((0,), (0,)), ((), ())),
                               precision=precision,
                               preferred_element_type=jnp.float32)


def _dot_oh_upd(oh, upd, precision):
    """(W, 128) x (128, C) -> (W, C)."""
    return jax.lax.dot_general(oh, upd, (((1,), (0,)), ((), ())),
                               precision=precision,
                               preferred_element_type=jnp.float32)


def _gather_kernel(starts_ref, npass_ref, grid_ref, ids_ref, w_ref, out_ref,
                   *, k: int, w_rows: int, cb: int, precision,
                   groups: tuple):
    b = pl.program_id(0)
    t = pl.program_id(2)
    s = starts_ref[b, t] * ALIGN          # provably ALIGN-aligned
    n_pass = npass_ref[b, t]
    kg = k // len(groups)

    for r in range(TR):
        rel = [ids_ref[0, kk, 0, r, :][None, :] for kk in range(k)]
        wk = [w_ref[0, kk, 0, r, :][None, :] for kk in range(k)]

        def pass_body(p, acc, rel=rel, wk=wk):
            for gi, goff in enumerate(groups):
                base = s + goff + p * w_rows
                win = grid_ref[0, pl.ds(base, w_rows), :]        # (W, C)
                iota = jax.lax.broadcasted_iota(
                    jnp.int32, (w_rows, 128), 0) + base
                # sum the corner one-hots BEFORE the dot: sum_k oh_k @ win
                # == (sum_k oh_k) @ win — one MXU pass per group instead
                # of kg (colliding corners just add their weights)
                # build the multi-hot in f32 (bf16 select hits a Mosaic
                # relayout bug at large W), cast once for the bf16 dot
                oh = jnp.zeros((w_rows, 128), jnp.float32)
                for kk in range(gi * kg, (gi + 1) * kg):
                    oh = jnp.where(iota == rel[kk],
                                   oh + wk[kk].astype(jnp.float32), oh)
                acc = acc + _dot_oh_win(oh.astype(win.dtype), win,
                                        precision)
            return acc

        acc = jax.lax.fori_loop(0, n_pass, pass_body,
                                jnp.zeros((128, cb), jnp.float32))
        out_ref[0, r * 128:(r + 1) * 128, :] = acc.astype(out_ref.dtype)


def _gather_kernel_fused(starts_ref, npass_ref, grid_ref, ids_ref, w_ref,
                         out_ref, *, k: int, w_rows: int, cb: int,
                         precision, groups: tuple):
    """TR-fused gather: one (W, TILE) multi-hot + one dot per
    (group, pass) — see FUSE_TR."""
    b = pl.program_id(0)
    t = pl.program_id(2)
    s = starts_ref[b, t] * ALIGN
    n_pass = npass_ref[b, t]
    kg = k // len(groups)

    rel = [ids_ref[0, kk, 0, :, :].reshape(1, TILE) for kk in range(k)]
    wk = [w_ref[0, kk, 0, :, :].reshape(1, TILE) for kk in range(k)]

    def pass_body(p, acc):
        for gi, goff in enumerate(groups):
            base = s + goff + p * w_rows
            win = grid_ref[0, pl.ds(base, w_rows), :]            # (W, C)
            iota = jax.lax.broadcasted_iota(
                jnp.int32, (w_rows, TILE), 0) + base
            oh = jnp.zeros((w_rows, TILE), jnp.float32)
            for kk in range(gi * kg, (gi + 1) * kg):
                oh = jnp.where(iota == rel[kk],
                               oh + wk[kk].astype(jnp.float32), oh)
            acc = acc + _dot_oh_win(oh.astype(win.dtype), win, precision)
        return acc

    acc = jax.lax.fori_loop(0, n_pass, pass_body,
                            jnp.zeros((TILE, cb), jnp.float32))
    out_ref[0, :, :] = acc.astype(out_ref.dtype)


def _scatter_kernel_fused(starts_ref, npass_ref, ids_ref, w_ref, upd_ref,
                          out_ref, *, k: int, w_rows: int, cb: int,
                          precision, groups: tuple):
    """TR-fused scatter: one (W, TILE) multi-hot + one dot per
    (group, pass) — see FUSE_TR."""
    b = pl.program_id(0)
    t = pl.program_id(2)
    kg = k // len(groups)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    s = starts_ref[b, t] * ALIGN
    n_pass = npass_ref[b, t]
    rel = [ids_ref[0, kk, 0, :, :].reshape(1, TILE) for kk in range(k)]
    wk = [w_ref[0, kk, 0, :, :].reshape(1, TILE) for kk in range(k)]
    upd = upd_ref[0, :, :]                                      # (TILE, C)

    def pass_body(p, carry):
        for gi, goff in enumerate(groups):
            base = s + goff + p * w_rows
            iota = jax.lax.broadcasted_iota(
                jnp.int32, (w_rows, TILE), 0) + base
            oh = jnp.zeros((w_rows, TILE), jnp.float32)
            for kk in range(gi * kg, (gi + 1) * kg):
                oh = jnp.where(iota == rel[kk],
                               oh + wk[kk].astype(jnp.float32), oh)
            part = _dot_oh_upd(oh.astype(upd.dtype), upd, precision)
            cur = out_ref[0, pl.ds(base, w_rows), :]
            out_ref[0, pl.ds(base, w_rows), :] = cur + part
        return carry

    jax.lax.fori_loop(0, n_pass, pass_body, 0)


def _scatter_kernel(starts_ref, npass_ref, ids_ref, w_ref, upd_ref, out_ref,
                    *, k: int, w_rows: int, cb: int, precision,
                    groups: tuple):
    b = pl.program_id(0)
    t = pl.program_id(2)
    kg = k // len(groups)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    s = starts_ref[b, t] * ALIGN          # provably ALIGN-aligned
    n_pass = npass_ref[b, t]

    def pass_body(p, carry):
        for gi, goff in enumerate(groups):
            base = s + goff + p * w_rows
            iota = jax.lax.broadcasted_iota(
                jnp.int32, (w_rows, 128), 0) + base
            part = jnp.zeros((w_rows, cb), jnp.float32)
            for r in range(TR):
                upd_r = upd_ref[0, r * 128:(r + 1) * 128, :]     # (128, C)
                # multi-hot: one MXU pass per (group, row-block), not kg
                oh = jnp.zeros((w_rows, 128), jnp.float32)
                for kk in range(gi * kg, (gi + 1) * kg):
                    rel = ids_ref[0, kk, 0, r, :][None, :]
                    wk = w_ref[0, kk, 0, r, :][None, :]
                    oh = jnp.where(iota == rel,
                                   oh + wk.astype(jnp.float32), oh)
                part = part + _dot_oh_upd(oh.astype(upd_r.dtype), upd_r,
                                          precision)
            cur = out_ref[0, pl.ds(base, w_rows), :]
            out_ref[0, pl.ds(base, w_rows), :] = cur + part
        return carry

    jax.lax.fori_loop(0, n_pass, pass_body, 0)


def tile_dtype(precision) -> jnp.dtype:
    """VMEM/DMA dtype for window data: bf16 under DEFAULT precision (the
    dot multiplies in bf16 anyway — halving HBM traffic and the one-hot
    build adds no further rounding class), f32 under HIGHEST (exactness
    paths: counts, parity tests)."""
    return (jnp.float32 if precision == jax.lax.Precision.HIGHEST
            else jnp.bfloat16)


def _pad_axis1(x, n_pad, value=0):
    pad = n_pad - x.shape[1]
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2),
                   constant_values=value)


def _tile_meta(base_pad: jax.Array, w_rows: int,
               reach: int) -> Tuple[jax.Array, jax.Array]:
    """Per-tile window starts (ALIGN-aligned, returned DIVIDED by ALIGN —
    see the ALIGN note) and pass counts from the padded base ids
    (B, N_pad); windows cover [min, max + reach]."""
    b, n_pad = base_pad.shape
    tiles = base_pad.reshape(b, n_pad // TILE, TILE)
    tmin = jnp.min(tiles, axis=-1)
    tmax = jnp.max(tiles, axis=-1) + reach
    start = (tmin // ALIGN) * ALIGN
    n_pass = (tmax - start) // w_rows + 1
    return (start // ALIGN).astype(jnp.int32), n_pass.astype(jnp.int32)


def _block_c(c: int, r3_pad: int) -> int:
    """Channel block: c itself up to 256, else 256.  Wider blocks halve
    the per-channel-block duplication of the multi-hot build + window DMA
    (C=256 stages run ONE grid pass instead of two): hybrid 20k step
    105.5 -> 103.0 ms.  c=256 used to HTTP-500 the remote Mosaic compiler
    pre-ALIGN/bf16 rework; it compiles and matches the oracle now
    (probe 2026-08-17).  512-wide untested — keep 256 until measured."""
    return c if c <= 256 else 256


def _prep(ids, weights, base_ids, n_pad, k, bsz, dt=jnp.float32):
    n_tiles = n_pad // TILE
    ids_p = _pad_axis1(ids.transpose(0, 2, 1), n_pad).transpose(0, 2, 1)
    w_p = _pad_axis1(weights.astype(dt).transpose(0, 2, 1),
                     n_pad).transpose(0, 2, 1)
    # padding entries carry weight 0 (inert); base ids are EDGE-padded
    # (repeat the last real id) so the final tile's min/max window stays
    # tight.  NOTE: per-tile min/max must come from the raw values — the
    # ids are only ROUGHLY sorted (e.g. floor-based corner ids under a
    # round-based sort key), so monotone tricks like cummax are invalid.
    pad = n_pad - base_ids.shape[1]
    base_p = jnp.pad(base_ids, ((0, 0), (0, pad)), mode="edge") \
        if pad else base_ids
    ids5 = ids_p.reshape(bsz, k, n_tiles, TR, 128)
    w5 = w_p.reshape(bsz, k, n_tiles, TR, 128)
    return ids5, w5, base_p, n_tiles


def gather_windows(grid_flat: jax.Array, ids: jax.Array, weights: jax.Array,
                   base_ids: jax.Array, r: int, w_rows: int,
                   reach: int = 0, precision=_HIGHEST,
                   groups: tuple = (0,),
                   interpret: bool = False) -> jax.Array:
    """out[b, n, c] = sum_k weights[b,k,n] * grid_flat[b, ids[b,k,n], c].

    Args:
      grid_flat: (B, R^3, C) float.
      ids: (B, K, N) int32 — row ids, group-major: corner kk (group
        gi = kk // (K/len(groups))) must lie, wherever its weight is
        nonzero, in [base_ids[b,n]+groups[gi],
        base_ids[b,n]+groups[gi]+reach]; base_ids roughly nondecreasing.
      weights: (B, K, N) float (zeros mask dead corners/padding).
      base_ids: (B, N) int32 window anchors.
    Returns: (B, N, C) f32.
    """
    bsz, r3, c = grid_flat.shape
    _, k, n = ids.shape
    assert w_rows % ALIGN == 0 and all(g % ALIGN == 0 for g in groups), \
        (w_rows, groups)                  # window-start provable alignment
    n_pad = _cdiv(n, TILE) * TILE
    # worst-case window end: start <= base_max <= r3-1, n_pass covers up to
    # tmax = base_max + reach, so the last pass reaches
    # base_max + reach + w_rows, plus the group offset
    row_pad = max(groups) + w_rows + _cdiv(reach, ALIGN) * ALIGN
    dt = tile_dtype(precision)
    grid_p = jnp.pad(grid_flat.astype(dt),
                     ((0, 0), (0, row_pad), (0, 0)))
    r3p = r3 + row_pad
    cb = _block_c(c, r3p)
    ids5, w5, base_p, n_tiles = _prep(ids, weights, base_ids, n_pad, k, bsz,
                                      dt)
    starts, n_pass = _tile_meta(base_p, w_rows, reach)

    out_dt = (jnp.bfloat16 if GATHER_OUT_BF16
              and precision != jax.lax.Precision.HIGHEST else jnp.float32)
    kern = functools.partial(
        _gather_kernel_fused if FUSE_TR else _gather_kernel,
        k=k, w_rows=w_rows, cb=cb,
        precision=precision, groups=tuple(groups))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bsz, c // cb, n_tiles),
        in_specs=[
            pl.BlockSpec((1, r3p, cb),
                         lambda b, cc, t, s_, np_: (b, 0, cc)),
            pl.BlockSpec((1, k, 1, TR, 128),
                         lambda b, cc, t, s_, np_: (b, 0, t, 0, 0)),
            pl.BlockSpec((1, k, 1, TR, 128),
                         lambda b, cc, t, s_, np_: (b, 0, t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TILE, cb),
                               lambda b, cc, t, s_, np_: (b, t, cc)),
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((bsz, n_pad, c), out_dt),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(starts, n_pass, grid_p, ids5, w5)
    return out[:, :n].astype(jnp.float32)


def scatter_windows(updates: jax.Array, ids: jax.Array, weights: jax.Array,
                    base_ids: jax.Array, r: int, w_rows: int,
                    reach: int = 0, precision=_HIGHEST,
                    groups: tuple = (0,),
                    interpret: bool = False) -> jax.Array:
    """out[b, v, c] = sum_{n,k: ids[b,k,n]=v} weights[b,k,n]*updates[b,n,c]

    Transpose of gather_windows; same id/window contract.  Returns
    (B, R^3, C) f32.
    """
    bsz, n, c = updates.shape
    _, k, _ = ids.shape
    assert w_rows % ALIGN == 0 and all(g % ALIGN == 0 for g in groups), \
        (w_rows, groups)                  # window-start provable alignment
    r3 = r ** 3
    n_pad = _cdiv(n, TILE) * TILE
    # see gather_windows row_pad for the bound
    r3p = r3 + max(groups) + w_rows + _cdiv(reach, ALIGN) * ALIGN
    cb = _block_c(c, r3p)
    dt = tile_dtype(precision)
    upd_p = _pad_axis1(updates.astype(dt), n_pad)
    ids5, w5, base_p, n_tiles = _prep(ids, weights, base_ids, n_pad, k, bsz,
                                      dt)
    starts, n_pass = _tile_meta(base_p, w_rows, reach)

    kern = functools.partial(
        _scatter_kernel_fused if FUSE_TR else _scatter_kernel,
        k=k, w_rows=w_rows, cb=cb,
        precision=precision, groups=tuple(groups))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bsz, c // cb, n_tiles),
        in_specs=[
            pl.BlockSpec((1, k, 1, TR, 128),
                         lambda b, cc, t, s_, np_: (b, 0, t, 0, 0)),
            pl.BlockSpec((1, k, 1, TR, 128),
                         lambda b, cc, t, s_, np_: (b, 0, t, 0, 0)),
            pl.BlockSpec((1, TILE, cb),
                         lambda b, cc, t, s_, np_: (b, t, cc)),
        ],
        out_specs=pl.BlockSpec((1, r3p, cb),
                               lambda b, cc, t, s_, np_: (b, 0, cc)),
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((bsz, r3p, c), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(starts, n_pass, ids5, w5, upd_p)
    return out[:, :r3]
