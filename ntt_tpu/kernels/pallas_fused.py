"""Pallas fused-transform kernels: the whole NTT resident in VMEM.

This is the TPU analog of the reference's cache-blocking fusion ideas
(radix-4x4 two-layers-per-pass, src/ntt_radix4x4.c:64-75; HEXL depth-first
recursion, third_party/hexl/fwd-ntt-avx512.c:310-328; r4r2/r2_16 fused
in-register tails, src/ntt_r4r2_avx512_ifma.c:9-99): one Pallas grid step
loads a (tile_b, N1, N2) batch tile into VMEM, runs ALL log2(N) stages --
six-step phase 1, an in-VMEM transpose, phase 2 -- and stores once.  HBM
traffic drops to the speed-of-light 2 x data-size (+ the one-time twiddle
fetch).

Round-2 structure (see docs/PERF.md for the measured cost decomposition):

  * I/O arrives pre-reshaped (batch, N1, N2) -- in-kernel lane-crossing
    reshapes of the flat (batch, N) form are rejected by current Mosaic;
  * the N2 = 128 split keeps every vector op at full lane width;
  * stages run in rounds of TWO butterfly layers per (m, 4, t)-view
    (the radix-4x4 layers-per-residency pattern): level A pairs slices
    (c0,c2),(c1,c3) with w[m+g], level B pairs (c0,c1),(c2,c3) with
    w[2m+2g+c]; DIT stages are in-place so one jnp.stack interleave
    covers both layers;
  * no scratch-ref stage barriers -- measured slower than the pure value
    chain (VMEM round trips cost more than Mosaic's relayout folding).

Mosaic cannot reshape across the lane dimension (small 1D->2D twiddle
casts are unsupported), so twiddles arrive PRE-BROADCAST: host-side plan
builders emit, per phase, a stacked (n_stages, N_axis/2, lanes) matrix
whose stage-s slab is already in the exact (groups*span, lanes) shape the
stage butterfly consumes -- the same idea as the reference's per-SIMD
expanded twiddle layouts (pre_compute.h:154-324), VMEM tiles instead of
512-bit vectors.

Butterfly math is the element-backend code shared with every other kernel
(kernels/elems.py), so these variants are bit-exact with the jnp six-step
/ radix-2 kernels by construction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ntt_tpu.kernels.elems import tmap


# ---------------------------------------------------------------------------
# host-side twiddle stacks (NumPy, cached by the caller / plan)
# ---------------------------------------------------------------------------


def col_stack(w_u64: np.ndarray, n1: int, n2: int) -> np.ndarray:
    """(log2 n1, n1//2, n2) uint64: stage s slab holds, at (g*t + j, lane),
    the stage twiddle w[m + g] (m = 2^s groups, t = n1 >> (s+1))."""
    logn1 = n1.bit_length() - 1
    out = np.zeros((logn1, n1 // 2, n2), dtype=np.uint64)
    for s in range(logn1):
        m, t = 1 << s, n1 >> (s + 1)
        vals = np.repeat(w_u64[m : 2 * m], t)  # (n1//2,)
        out[s] = vals[:, None]
    return out


def row_stack(w_u64: np.ndarray, n1: int, n2: int) -> np.ndarray:
    """(log2 n2, n2//2, n1) uint64 for the row phase: stage s slab holds,
    at (g*t2 + j, col), the twiddle from the global-table slice
    w[m2*n1 : 2*m2*n1] viewed (n1, m2) and transposed -- i.e. value
    w[m2*n1 + col*m2 + g] (see sixstep._row_tw)."""
    logn2 = n2.bit_length() - 1
    out = np.zeros((logn2, n2 // 2, n1), dtype=np.uint64)
    for s in range(logn2):
        m2, t2 = 1 << s, n2 >> (s + 1)
        tw = w_u64[m2 * n1 : 2 * m2 * n1].reshape(n1, m2).T  # (m2, n1)
        out[s] = np.repeat(tw, t2, axis=0)  # (n2//2, n1)
    return out


def _vmem_bytes(tile_b: int, n: int, nlimb: int) -> int:
    # Empirically calibrated against Mosaic's scoped-stack allocation on
    # v5e (the unrolled stage chain's temporaries are NOT reused): ~14
    # live u32 words per element for the single-limb chain, ~114 for the
    # limb-pair chain (mul64_full intermediates).  Observed: u64 tile 16
    # @ N=2^14 -> modeled 116.75MiB exceeds the 110MB scoped-vmem limit;
    # tile 8 (modeled 59.75MiB) compiles and runs.  The model's points are
    # pinned by test_pallas_vmem_model_calibration_points and re-validated
    # against real Mosaic compiles by tools/mosaic_check.py --vmem-probe.
    logn = n.bit_length() - 1
    words_per_elem = 14 if nlimb == 1 else 114
    tables = 4 * nlimb * 2 * logn * (n // 2)
    return 4 * words_per_elem * tile_b * n + tables + (1 << 20)


def default_tile_b(n: int, nlimb: int, batch: int) -> int:
    """Power-of-two batch tile: at least 8 (Mosaic sublane alignment; the
    caller pads the batch), growing while the modeled working set stays
    under the scoped-vmem budget."""
    tile = 8
    while tile * 2 <= batch and _vmem_bytes(tile * 2, n, nlimb) < 80 * (1 << 20):
        tile *= 2
    return tile


def pick_split(n: int) -> int:
    """n1_log for the fused kernel: N2 = 128 keeps the lane dimension full
    (measured: the inherited XLA-path N2=64 split ran at half VPU width
    and no longer compiles under current Mosaic)."""
    logn = n.bit_length() - 1
    return max(1, min(logn - 7, logn - 1))


def make_rounds(log_n: int, group: int = 2) -> tuple[int, ...]:
    """Stage grouping for one phase: `group`=2 fuses two layers per
    interleave with a single tail stage when log_n is odd."""
    if group == 1:
        return (1,) * log_n
    out = [2] * (log_n // 2)
    if log_n % 2:
        out.append(1)
    return tuple(out)


# ---------------------------------------------------------------------------
# in-kernel stage rounds (2D-safe: lane dim never reshaped)
# ---------------------------------------------------------------------------


def _round_r2(v, tws, twcs, s, m, t, lanes, tile_b, n_axis, bfly):
    view = tmap(lambda l: l.reshape(tile_b, m, 2, t, lanes), v)
    x = tmap(lambda l: l[:, :, 0], view)
    y = tmap(lambda l: l[:, :, 1], view)
    wo = tuple(r[s].reshape(m, t, lanes) for r in tws)
    wc = tuple(r[s].reshape(m, t, lanes) for r in twcs)
    nx, ny = bfly(x, y, wo, wc)
    return tmap(
        lambda a, b: jnp.stack([a, b], axis=2).reshape(tile_b, n_axis, lanes),
        nx, ny,
    )


def _round_r4(v, tws, twcs, s, m, t2, lanes, tile_b, n_axis, bfly):
    """Two radix-2 layers per VMEM residency (src/ntt_radix4x4.c:64-75):
    view (m, 4, t2); level A pairs (c0,c2),(c1,c3) with w[m+g]; level B
    pairs (c0,c1) w[2m+2g] and (c2,c3) w[2m+2g+1].  Output rows land where
    they started (DIT is in-place), so one interleave covers both."""
    view = tmap(lambda l: l.reshape(tile_b, m, 4, t2, lanes), v)
    x0 = tmap(lambda l: l[:, :, 0], view)
    x1 = tmap(lambda l: l[:, :, 1], view)
    x2 = tmap(lambda l: l[:, :, 2], view)
    x3 = tmap(lambda l: l[:, :, 3], view)
    wa_o = tuple(r[s].reshape(m, 2 * t2, lanes)[:, :t2] for r in tws)
    wa_c = tuple(r[s].reshape(m, 2 * t2, lanes)[:, :t2] for r in twcs)
    u0, u2 = bfly(x0, x2, wa_o, wa_c)
    u1, u3 = bfly(x1, x3, wa_o, wa_c)
    wb_o = tuple(r[s + 1].reshape(m, 2, t2, lanes) for r in tws)
    wb_c = tuple(r[s + 1].reshape(m, 2, t2, lanes) for r in twcs)
    z0, z1 = bfly(u0, u1, tuple(w[:, 0] for w in wb_o), tuple(w[:, 0] for w in wb_c))
    z2, z3 = bfly(u2, u3, tuple(w[:, 1] for w in wb_o), tuple(w[:, 1] for w in wb_c))
    return tmap(
        lambda a, b, c, d: jnp.stack([a, b, c, d], axis=2).reshape(
            tile_b, n_axis, lanes
        ),
        z0, z1, z2, z3,
    )


def _round_r4_rev(v, tws, twcs, s, m, t2, lanes, tile_b, n_axis, bfly):
    """Inverse of _round_r4: level B (stage s+1) first, then level A."""
    view = tmap(lambda l: l.reshape(tile_b, m, 4, t2, lanes), v)
    x0 = tmap(lambda l: l[:, :, 0], view)
    x1 = tmap(lambda l: l[:, :, 1], view)
    x2 = tmap(lambda l: l[:, :, 2], view)
    x3 = tmap(lambda l: l[:, :, 3], view)
    wb_o = tuple(r[s + 1].reshape(m, 2, t2, lanes) for r in tws)
    wb_c = tuple(r[s + 1].reshape(m, 2, t2, lanes) for r in twcs)
    u0, u1 = bfly(x0, x1, tuple(w[:, 0] for w in wb_o), tuple(w[:, 0] for w in wb_c))
    u2, u3 = bfly(x2, x3, tuple(w[:, 1] for w in wb_o), tuple(w[:, 1] for w in wb_c))
    wa_o = tuple(r[s].reshape(m, 2 * t2, lanes)[:, :t2] for r in tws)
    wa_c = tuple(r[s].reshape(m, 2 * t2, lanes)[:, :t2] for r in twcs)
    z0, z2 = bfly(u0, u2, wa_o, wa_c)
    z1, z3 = bfly(u1, u3, wa_o, wa_c)
    return tmap(
        lambda a, b, c, d: jnp.stack([a, b, c, d], axis=2).reshape(
            tile_b, n_axis, lanes
        ),
        z0, z1, z2, z3,
    )


def _rounds_fwd(v, tws, twcs, n_axis, lanes, tile_b, bfly, s0=0):
    logn = n_axis.bit_length() - 1
    s = s0
    for g in make_rounds(logn - s0):
        if g == 1:
            v = _round_r2(v, tws, twcs, s, 1 << s, n_axis >> (s + 1), lanes,
                          tile_b, n_axis, bfly)
        else:
            v = _round_r4(v, tws, twcs, s, 1 << s, n_axis >> (s + 2), lanes,
                          tile_b, n_axis, bfly)
        s += g
    return v


def _rounds_rev(v, tws, twcs, n_axis, lanes, tile_b, bfly, s0=0):
    """Stages logn-1 .. s0 in descending order (inverse NTT)."""
    logn = n_axis.bit_length() - 1
    plan = []
    s = s0
    for g in make_rounds(logn - s0):
        plan.append((s, g))
        s += g
    for s, g in reversed(plan):
        if g == 1:
            v = _round_r2(v, tws, twcs, s, 1 << s, n_axis >> (s + 1), lanes,
                          tile_b, n_axis, bfly)
        else:
            v = _round_r4_rev(v, tws, twcs, s, 1 << s, n_axis >> (s + 2),
                              lanes, tile_b, n_axis, bfly)
    return v


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(ops, q, n1, n2, strict, keep_transposed, nlimb, refs):
    a_refs = refs[:nlimb]
    ctw = refs[nlimb : 2 * nlimb]
    ctwc = refs[2 * nlimb : 3 * nlimb]
    rtw = refs[3 * nlimb : 4 * nlimb]
    rtwc = refs[4 * nlimb : 5 * nlimb]
    o_refs = refs[5 * nlimb :]
    tile_b = a_refs[0].shape[0]

    ctw_v = tuple(r[...] for r in ctw)
    ctwc_v = tuple(r[...] for r in ctwc)
    rtw_v = tuple(r[...] for r in rtw)
    rtwc_v = tuple(r[...] for r in rtwc)

    bfly = lambda x, y, wo, wc: ops.fwd_bfly(x, y, wo, wc, q)
    v = tuple(r[...] for r in a_refs)  # (tile_b, n1, n2)
    v = _rounds_fwd(v, ctw_v, ctwc_v, n1, n2, tile_b, bfly)
    v = tmap(lambda l: jnp.swapaxes(l, -1, -2), v)  # (tile_b, n2, n1)
    v = _rounds_fwd(v, rtw_v, rtwc_v, n2, n1, tile_b, bfly)
    if strict:
        v = ops.reduce_4q_to_q(v, q)
    if not keep_transposed:
        v = tmap(lambda l: jnp.swapaxes(l, -1, -2), v)
    for o, l in zip(o_refs, v):
        o[...] = l


def _inv_kernel(ops, q, n1, n2, n_inv_op, n_inv_con, f_tmp, f_con, nlimb, refs):
    a_refs = refs[:nlimb]
    ctw = refs[nlimb : 2 * nlimb]
    ctwc = refs[2 * nlimb : 3 * nlimb]
    rtw = refs[3 * nlimb : 4 * nlimb]
    rtwc = refs[4 * nlimb : 5 * nlimb]
    o_refs = refs[5 * nlimb :]
    tile_b = a_refs[0].shape[0]

    ctw_v = tuple(r[...] for r in ctw)
    ctwc_v = tuple(r[...] for r in ctwc)
    rtw_v = tuple(r[...] for r in rtw)
    rtwc_v = tuple(r[...] for r in rtwc)

    bfly = lambda x, y, wo, wc: ops.bkw_bfly(x, y, wo, wc, q)
    v = tuple(r[...] for r in a_refs)  # (tile_b, n1, n2), natural layout
    v = tmap(lambda l: jnp.swapaxes(l, -1, -2), v)  # (tile_b, n2, n1)
    v = _rounds_rev(v, rtw_v, rtwc_v, n2, n1, tile_b, bfly)
    v = tmap(lambda l: jnp.swapaxes(l, -1, -2), v)  # (tile_b, n1, n2)
    v = _rounds_rev(v, ctw_v, ctwc_v, n1, n2, tile_b, bfly, s0=1)
    # final fused stage: split-half along rows, x n_inv (src/ntt_reference.c:55-65)
    x = tmap(lambda l: l[:, : n1 // 2, :], v)
    y = tmap(lambda l: l[:, n1 // 2 :, :], v)
    nx, ny = ops.bkw_final(x, y, n_inv_op, n_inv_con, f_tmp, f_con, q)
    v = tmap(lambda xl, yl: jnp.concatenate([xl, yl], axis=1), nx, ny)
    for o, l in zip(o_refs, v):
        o[...] = l


def _inv_rows_kernel(ops, q, n1, n2, nlimb, refs):
    """Phase-split inverse, kernel 1/2: natural (tile_b, n1, n2) input ->
    transpose -> reversed row rounds -> (tile_b, n2, n1) output.  Splitting
    the inverse into two pallas_calls halves the per-kernel chain depth --
    the single-kernel u64 inverse structurally hangs the Mosaic compiler
    (round-2 artifact TPU_MOSAIC_CHECK_r02; VERDICT r3 item #4)."""
    a_refs = refs[:nlimb]
    rtw = refs[nlimb : 2 * nlimb]
    rtwc = refs[2 * nlimb : 3 * nlimb]
    o_refs = refs[3 * nlimb :]
    tile_b = a_refs[0].shape[0]
    rtw_v = tuple(r[...] for r in rtw)
    rtwc_v = tuple(r[...] for r in rtwc)
    bfly = lambda x, y, wo, wc: ops.bkw_bfly(x, y, wo, wc, q)
    v = tuple(r[...] for r in a_refs)
    v = tmap(lambda l: jnp.swapaxes(l, -1, -2), v)  # (tile_b, n2, n1)
    v = _rounds_rev(v, rtw_v, rtwc_v, n2, n1, tile_b, bfly)
    for o, l in zip(o_refs, v):
        o[...] = l


def _inv_cols_kernel(ops, q, n1, n2, n_inv_op, n_inv_con, f_tmp, f_con, nlimb,
                     refs):
    """Phase-split inverse, kernel 2/2: (tile_b, n2, n1) -> transpose ->
    reversed column rounds + fused n_inv final -> natural (tile_b, n1, n2)."""
    a_refs = refs[:nlimb]
    ctw = refs[nlimb : 2 * nlimb]
    ctwc = refs[2 * nlimb : 3 * nlimb]
    o_refs = refs[3 * nlimb :]
    tile_b = a_refs[0].shape[0]
    ctw_v = tuple(r[...] for r in ctw)
    ctwc_v = tuple(r[...] for r in ctwc)
    bfly = lambda x, y, wo, wc: ops.bkw_bfly(x, y, wo, wc, q)
    v = tuple(r[...] for r in a_refs)  # (tile_b, n2, n1)
    v = tmap(lambda l: jnp.swapaxes(l, -1, -2), v)  # (tile_b, n1, n2)
    v = _rounds_rev(v, ctw_v, ctwc_v, n1, n2, tile_b, bfly, s0=1)
    x = tmap(lambda l: l[:, : n1 // 2, :], v)
    y = tmap(lambda l: l[:, n1 // 2 :, :], v)
    nx, ny = ops.bkw_final(x, y, n_inv_op, n_inv_con, f_tmp, f_con, q)
    v = tmap(lambda xl, yl: jnp.concatenate([xl, yl], axis=1), nx, ny)
    for o, l in zip(o_refs, v):
        o[...] = l


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------


def _call(kernel_fn, a_rep, tables, n: int, n1: int, n2: int, tile_b: int,
          out_transposed: bool, interpret: bool):
    """Grid over batch tiles; twiddle stacks broadcast to every grid step
    (same block each step -> fetched once, VMEM-resident).  I/O blocks are
    rank-3 (tile_b, n1, n2) -- the (batch, N) -> (batch, N1, N2) reshape
    happens OUTSIDE the kernel (free in XLA, unsupported in Mosaic)."""
    nlimb = len(a_rep)
    if not interpret and _vmem_bytes(tile_b, n, nlimb) > 110 * (1 << 20):
        raise ValueError(
            f"pallas-fused working set for N={n} ({nlimb} limb(s), "
            f"tile_b={tile_b}) exceeds VMEM; use the 'sixstep'/'radix2' "
            "variants for this size"
        )
    lead = a_rep[0].shape[:-1]
    batch = int(np.prod(lead)) if lead else 1
    a3 = tuple(l.reshape(batch, n1, n2) for l in a_rep)
    pad = (-batch) % tile_b
    if pad:
        a3 = tuple(jnp.pad(l, ((0, pad), (0, 0), (0, 0))) for l in a3)
    padded = batch + pad

    grid = (padded // tile_b,)
    in_spec = pl.BlockSpec((tile_b, n1, n2), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    out3 = (tile_b, n2, n1) if out_transposed else (tile_b, n1, n2)
    out_spec = pl.BlockSpec(out3, lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    tab_specs = [
        pl.BlockSpec(
            t.shape,
            functools.partial(lambda r, i: (0,) * r, len(t.shape)),
            memory_space=pltpu.VMEM,
        )
        for t in tables
    ]
    out = pl.pallas_call(
        kernel_fn,
        grid=grid,
        in_specs=[in_spec] * nlimb + tab_specs,
        out_specs=tuple([out_spec] * nlimb),
        out_shape=tuple(
            jax.ShapeDtypeStruct((padded,) + out3[1:], jnp.uint32)
            for _ in range(nlimb)
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * (1 << 20),
        ),
    )(*a3, *tables)
    if pad:
        out = tuple(l[:batch] for l in out)
    return tuple(l.reshape(lead + (n,)) for l in out)


def _call3(kernel_fn, a3, tables, in3, out3, tile_b, padded, interpret):
    """pallas_call over already-3-D padded inputs (phase-split plumbing)."""
    nlimb = len(a3)
    grid = (padded // tile_b,)
    in_spec = pl.BlockSpec((tile_b,) + in3, lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile_b,) + out3, lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    tab_specs = [
        pl.BlockSpec(
            t.shape,
            functools.partial(lambda r, i: (0,) * r, len(t.shape)),
            memory_space=pltpu.VMEM,
        )
        for t in tables
    ]
    return pl.pallas_call(
        kernel_fn,
        grid=grid,
        in_specs=[in_spec] * nlimb + tab_specs,
        out_specs=tuple([out_spec] * nlimb),
        out_shape=tuple(
            jax.ShapeDtypeStruct((padded,) + out3, jnp.uint32)
            for _ in range(nlimb)
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * (1 << 20),
        ),
    )(*a3, *tables)


def _split_limbs(tab_u64: np.ndarray, nlimb: int):
    """uint64 stack -> per-limb uint32 stacks (1 limb: truncate; 2: lo, hi)."""
    if nlimb == 1:
        return (jnp.asarray(tab_u64.astype(np.uint32)),)
    lo = (tab_u64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (tab_u64 >> np.uint64(32)).astype(np.uint32)
    return jnp.asarray(lo), jnp.asarray(hi)


def build_tables(w_u64: np.ndarray, wc_u64: np.ndarray, n1: int, n2: int, nlimb: int):
    """All four stacked tables (col w, col wc, row w, row wc), limb-split,
    in the argument order the kernels expect."""
    ctw = _split_limbs(col_stack(w_u64, n1, n2), nlimb)
    ctwc = _split_limbs(col_stack(wc_u64, n1, n2), nlimb)
    rtw = _split_limbs(row_stack(w_u64, n1, n2), nlimb)
    rtwc = _split_limbs(row_stack(wc_u64, n1, n2), nlimb)
    return ctw + ctwc + rtw + rtwc


# ---------------------------------------------------------------------------
# public entry points
# ---------------------------------------------------------------------------


def fwd_fused(
    a_rep,
    ops,
    tables,
    q: int,
    n1_log: int,
    strict: bool = True,
    keep_transposed: bool = False,
    tile_b: int | None = None,
    interpret: bool = False,
):
    """Forward NTT, whole transform fused in one Pallas kernel.

    a_rep: rep of shape (..., N); tables: output of build_tables for the
    same (n1_log, nlimb).  Bit-exact with kernels.sixstep.fwd_sixstep."""
    n = a_rep[0].shape[-1]
    logn = n.bit_length() - 1
    n1, n2 = 1 << n1_log, 1 << (logn - n1_log)
    lead = a_rep[0].shape[:-1]
    batch = int(np.prod(lead)) if lead else 1
    if tile_b is None:
        tile_b = default_tile_b(n, len(a_rep), max(batch, 1))
    kernel = functools.partial(
        _fwd_kernel, ops, q, n1, n2, strict, keep_transposed, len(a_rep)
    )
    return _call(lambda *refs: kernel(refs), a_rep, tables, n, n1, n2, tile_b,
                 keep_transposed, interpret)


def inv_fused(
    a_rep,
    ops,
    tables,
    n_inv_op: int,
    n_inv_con: int,
    final_tmp: int,
    final_con: int,
    q: int,
    n1_log: int,
    tile_b: int | None = None,
    interpret: bool = False,
    split_phases: bool | None = None,
):
    """Inverse NTT (strict output), fused in Pallas.  tables: build_tables
    over the INVERSE root tables.

    split_phases runs the transform as TWO pallas_calls (row phase, then
    column phase + fused final) instead of one -- the workaround for the
    Mosaic compile hang on the single-kernel u64 reversed chain (default:
    on for the 2-limb path, off for u32 where the single kernel compiles)."""
    n = a_rep[0].shape[-1]
    logn = n.bit_length() - 1
    n1, n2 = 1 << n1_log, 1 << (logn - n1_log)
    lead = a_rep[0].shape[:-1]
    batch = int(np.prod(lead)) if lead else 1
    nlimb = len(a_rep)
    if tile_b is None:
        tile_b = default_tile_b(n, nlimb, max(batch, 1))
    if split_phases is None:
        split_phases = nlimb == 2
    if not split_phases:
        kernel = functools.partial(
            _inv_kernel, ops, q, n1, n2, n_inv_op, n_inv_con, final_tmp,
            final_con, nlimb,
        )
        return _call(lambda *refs: kernel(refs), a_rep, tables, n, n1, n2,
                     tile_b, False, interpret)

    if not interpret and _vmem_bytes(tile_b, n, nlimb) > 110 * (1 << 20):
        raise ValueError(
            f"pallas-fused working set for N={n} ({nlimb} limb(s), "
            f"tile_b={tile_b}) exceeds VMEM; use the 'sixstep'/'radix2' "
            "variants for this size"
        )
    ctw_all = tables[: 2 * nlimb]          # col w + col wc stacks
    rtw_all = tables[2 * nlimb :]          # row w + row wc stacks
    a3 = tuple(l.reshape(batch, n1, n2) for l in a_rep)
    pad = (-batch) % tile_b
    if pad:
        a3 = tuple(jnp.pad(l, ((0, pad), (0, 0), (0, 0))) for l in a3)
    padded = batch + pad
    k1 = functools.partial(_inv_rows_kernel, ops, q, n1, n2, nlimb)
    mid = _call3(lambda *refs: k1(refs), a3, rtw_all, (n1, n2), (n2, n1),
                 tile_b, padded, interpret)
    k2 = functools.partial(_inv_cols_kernel, ops, q, n1, n2, n_inv_op,
                           n_inv_con, final_tmp, final_con, nlimb)
    out = _call3(lambda *refs: k2(refs), mid, ctw_all, (n2, n1), (n1, n2),
                 tile_b, padded, interpret)
    if pad:
        out = tuple(l[:batch] for l in out)
    return tuple(l.reshape(lead + (n,)) for l in out)
