"""Pallas fused-transform kernels: the whole NTT resident in VMEM.

This is the TPU analog of the reference's cache-blocking fusion ideas
(radix-4x4 two-layers-per-pass, src/ntt_radix4x4.c:64-75; HEXL depth-first
recursion, third_party/hexl/fwd-ntt-avx512.c:310-328; r4r2/r2_16 fused
in-register tails, src/ntt_r4r2_avx512_ifma.c:9-99): instead of one HBM
round trip per butterfly stage (what the per-stage jnp kernels cost after
XLA fusion), one Pallas grid step loads a (tile_b, N) batch tile into
VMEM, runs ALL log2(N) stages -- six-step phase 1, an in-VMEM transpose,
phase 2 -- and stores once.  HBM traffic drops to the speed-of-light
2 x data-size (+ the one-time twiddle fetch).

Mosaic cannot reshape across the lane dimension (small 1D->2D twiddle
casts are unsupported), so twiddles arrive PRE-BROADCAST: host-side plan
builders (fwd_tables/inv_tables) emit, per phase, a stacked
(n_stages, N/2, lanes) matrix whose stage-s slab is already in the exact
(groups*span, lanes) shape the stage butterfly consumes.  This mirrors
how the reference gives each SIMD kernel its own expanded twiddle layout
(expand_w_r4_avx512_ifma etc., pre_compute.h:154-324) -- same idea, VMEM
tiles instead of 512-bit vectors.

Butterfly math is the element-backend code shared with every other
kernel (kernels/elems.py), so these variants are bit-exact with the jnp
six-step / radix-2 kernels by construction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ntt_tpu.kernels import sixstep as ss
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
    at (g*t2 + j, col), the twiddle w[(m2 + g)*?] from the global-table
    slice w[m2*n1 : 2*m2*n1] viewed (n1, m2) and transposed -- i.e.
    value w[m2*n1 + col*m2 + g] (see sixstep._row_tw)."""
    logn2 = n2.bit_length() - 1
    out = np.zeros((logn2, n2 // 2, n1), dtype=np.uint64)
    for s in range(logn2):
        m2, t2 = 1 << s, n2 >> (s + 1)
        tw = w_u64[m2 * n1 : 2 * m2 * n1].reshape(n1, m2).T  # (m2, n1)
        out[s] = np.repeat(tw, t2, axis=0)  # (n2//2, n1)
    return out


def _vmem_bytes(tile_b: int, n: int, nlimb: int) -> int:
    # Empirically calibrated against Mosaic's scoped-stack allocation on
    # v5e (the unrolled stage chain's temporaries are NOT reused): the
    # compiler reports ~14 live u32 words per element for the single-limb
    # chain and ~114 for the limb-pair chain (mul64_full intermediates).
    # Observed: u32 tile 64 @ N=2^14 -> ~59MB compiles; u64 tile 16 ->
    # 119.04MB exceeds the 100MB scoped-vmem limit.
    logn = n.bit_length() - 1
    words_per_elem = 14 if nlimb == 1 else 114
    tables = 4 * nlimb * 2 * logn * (n // 2)
    return 4 * words_per_elem * tile_b * n + tables + (1 << 20)


def default_tile_b(n: int, nlimb: int, batch: int) -> int:
    """Power-of-two batch tile: at least 8 (Mosaic needs the sublane dim of
    a partial block divisible by 8; _call pads the batch), growing while
    the working set stays under ~28MB (v5e has 128MB VMEM; a measured
    tile sweep put the sweet spot at 64 rows for N=2^14 u32)."""
    tile = 8
    while tile * 2 <= batch and _vmem_bytes(tile * 2, n, nlimb) < 80 * (1 << 20):
        tile *= 2
    return tile


# ---------------------------------------------------------------------------
# in-kernel stage sweeps (2D-safe: lane dim never reshaped)
# ---------------------------------------------------------------------------


def _stage(a, tw_refs, twc_refs, s: int, m: int, t: int, lanes: int, bfly):
    """One butterfly stage on a rep of (tile_b, rows, lanes) arrays, pairing
    along the rows axis; stage twiddles read from slab s of the stacks."""
    tile_b = a[0].shape[0]

    def view(l):
        return l.reshape(tile_b, m, 2, t, lanes)

    v = tmap(view, a)
    x = tmap(lambda l: l[:, :, 0], v)
    y = tmap(lambda l: l[:, :, 1], v)
    wo = tuple(r[s].reshape(m, t, lanes) for r in tw_refs)
    wc = tuple(r[s].reshape(m, t, lanes) for r in twc_refs)
    nx, ny = bfly(x, y, wo, wc)
    return tmap(
        lambda xl, yl: jnp.stack([xl, yl], axis=2).reshape(tile_b, 2 * m * t, lanes),
        nx,
        ny,
    )


def _fwd_kernel(ops, q, n1, n2, strict, keep_transposed, nlimb, refs):
    a_refs = refs[:nlimb]
    ctw = refs[nlimb : 2 * nlimb]
    ctwc = refs[2 * nlimb : 3 * nlimb]
    rtw = refs[3 * nlimb : 4 * nlimb]
    rtwc = refs[4 * nlimb : 5 * nlimb]
    o_refs = refs[5 * nlimb :]
    tile_b = a_refs[0].shape[0]
    n = n1 * n2
    logn1, logn2 = n1.bit_length() - 1, n2.bit_length() - 1

    a = tuple(r[...].reshape(tile_b, n1, n2) for r in a_refs)
    ctw_v = tuple(r[...] for r in ctw)
    ctwc_v = tuple(r[...] for r in ctwc)
    rtw_v = tuple(r[...] for r in rtw)
    rtwc_v = tuple(r[...] for r in rtwc)

    bfly = lambda x, y, wo, wc: ops.fwd_bfly(x, y, wo, wc, q)
    for s in range(logn1):
        a = _stage(a, ctw_v, ctwc_v, s, 1 << s, n1 >> (s + 1), n2, bfly)
    a = tmap(lambda l: jnp.swapaxes(l, -1, -2), a)
    for s in range(logn2):
        a = _stage(a, rtw_v, rtwc_v, s, 1 << s, n2 >> (s + 1), n1, bfly)
    if strict:
        a = ops.reduce_4q_to_q(a, q)
    if not keep_transposed:
        a = tmap(lambda l: jnp.swapaxes(l, -1, -2), a)
    for o, l in zip(o_refs, a):
        o[...] = l.reshape(tile_b, n)


def _inv_kernel(ops, q, n1, n2, n_inv_op, n_inv_con, f_tmp, f_con, nlimb, refs):
    a_refs = refs[:nlimb]
    ctw = refs[nlimb : 2 * nlimb]
    ctwc = refs[2 * nlimb : 3 * nlimb]
    rtw = refs[3 * nlimb : 4 * nlimb]
    rtwc = refs[4 * nlimb : 5 * nlimb]
    o_refs = refs[5 * nlimb :]
    tile_b = a_refs[0].shape[0]
    n = n1 * n2
    logn1, logn2 = n1.bit_length() - 1, n2.bit_length() - 1

    a = tuple(r[...].reshape(tile_b, n1, n2) for r in a_refs)
    ctw_v = tuple(r[...] for r in ctw)
    ctwc_v = tuple(r[...] for r in ctwc)
    rtw_v = tuple(r[...] for r in rtw)
    rtwc_v = tuple(r[...] for r in rtwc)

    bfly = lambda x, y, wo, wc: ops.bkw_bfly(x, y, wo, wc, q)
    a = tmap(lambda l: jnp.swapaxes(l, -1, -2), a)
    for s in reversed(range(logn2)):
        a = _stage(a, rtw_v, rtwc_v, s, 1 << s, n2 >> (s + 1), n1, bfly)
    a = tmap(lambda l: jnp.swapaxes(l, -1, -2), a)
    for s in reversed(range(1, logn1)):
        a = _stage(a, ctw_v, ctwc_v, s, 1 << s, n1 >> (s + 1), n2, bfly)
    # final fused stage: split-half along rows, x n_inv (src/ntt_reference.c:55-65)
    x = tmap(lambda l: l[:, : n1 // 2, :], a)
    y = tmap(lambda l: l[:, n1 // 2 :, :], a)
    nx, ny = ops.bkw_final(x, y, n_inv_op, n_inv_con, f_tmp, f_con, q)
    a = tmap(lambda xl, yl: jnp.concatenate([xl, yl], axis=1), nx, ny)
    for o, l in zip(o_refs, a):
        o[...] = l.reshape(tile_b, n)


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------


def _call(kernel_fn, a_rep, tables, n: int, tile_b: int, interpret: bool):
    """Grid over batch tiles; twiddle stacks broadcast to every grid step
    (same block each step -> fetched once, VMEM-resident)."""
    nlimb = len(a_rep)
    if not interpret and _vmem_bytes(tile_b, n, nlimb) > 80 * (1 << 20):
        raise ValueError(
            f"pallas-fused working set for N={n} ({nlimb} limb(s), "
            f"tile_b={tile_b}) exceeds VMEM; use the 'sixstep'/'radix2' "
            "variants for this size"
        )
    lead = a_rep[0].shape[:-1]
    batch = int(np.prod(lead)) if lead else 1
    a2 = tuple(l.reshape(batch, n) for l in a_rep)
    pad = (-batch) % tile_b
    if pad:
        a2 = tuple(jnp.pad(l, ((0, pad), (0, 0))) for l in a2)
    padded = batch + pad

    grid = (padded // tile_b,)
    tile_spec = pl.BlockSpec((tile_b, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
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
        in_specs=[tile_spec] * nlimb + tab_specs,
        out_specs=tuple([tile_spec] * nlimb),
        out_shape=tuple(
            jax.ShapeDtypeStruct((padded, n), jnp.uint32) for _ in range(nlimb)
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * (1 << 20),
        ),
    )(*a2, *tables)
    if pad:
        out = tuple(l[:batch] for l in out)
    return tuple(l.reshape(lead + (n,)) for l in out)


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
    return _call(lambda *refs: kernel(refs), a_rep, tables, n, tile_b, interpret)


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
):
    """Inverse NTT (strict output), fused in one Pallas kernel.  tables:
    build_tables over the INVERSE root tables."""
    n = a_rep[0].shape[-1]
    logn = n.bit_length() - 1
    n1, n2 = 1 << n1_log, 1 << (logn - n1_log)
    lead = a_rep[0].shape[:-1]
    batch = int(np.prod(lead)) if lead else 1
    if tile_b is None:
        tile_b = default_tile_b(n, len(a_rep), max(batch, 1))
    kernel = functools.partial(
        _inv_kernel, ops, q, n1, n2, n_inv_op, n_inv_con, final_tmp, final_con,
        len(a_rep),
    )
    return _call(lambda *refs: kernel(refs), a_rep, tables, n, tile_b, interpret)


def pick_split(n: int) -> int:
    return ss.default_split(n)
