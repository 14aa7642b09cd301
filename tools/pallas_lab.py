"""Pallas fused-kernel lab: candidate kernel structures timed on the chip.

Round-1 finding: the whole-transform Pallas kernel was 2.7-4x SLOWER than
the unfused XLA six-step path.  Two suspected causes, isolated here:

  (a) lane waste -- the kernel inherited the XLA path's N2=64 split, so
      every vector op ran at half the 128-lane VPU width;
  (b) live-range explosion -- the unrolled 14-stage value chain kept
      ~n_stages live words per element (Mosaic's scoped stack does not
      reuse stage buffers), forcing tiny tiles and spills.

Candidates:
  v1-64   round-1 kernel, original N2=64 split       (baseline, ~2.9 us u32)
  v1-128  round-1 kernel, N2=128 split               (isolates lane waste)
  v2-r2   new kernel: scratch-ref ping-pong between radix-2 stage rounds
          (each round reads one VMEM buffer, writes the other -> live set
          is 2 buffers + one round's temporaries)
  v2-r4   new kernel: two radix-2 layers fused per round (the radix-4 /
          radix4x4 two-layers-per-residency dataflow, src/ntt_radix4x4.c:64-75)
          -> half the scratch round trips

Usage (real TPU):
    python tools/pallas_lab.py --cases u32 --batch 512
    python tools/pallas_lab.py --cases u64 --batch 512 --tile-b 16
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ntt_tpu import modmath as mm
from ntt_tpu.kernels import pallas_fused as pf
from ntt_tpu.kernels import sixstep as ss
from ntt_tpu.kernels.elems import U32Ops, U64Ops, tmap
from ntt_tpu.params import NttParams, bench_params
from ntt_tpu.plan import get_plan


# ---------------------------------------------------------------------------
# kernel v2: scratch ping-pong + optional 2-stage (radix-4-style) rounds
# ---------------------------------------------------------------------------


def _round_r2(v, tws, twcs, s, m, t, lanes, tile_b, n_axis, bfly):
    view = tmap(lambda l: l.reshape(tile_b, m, 2, t, lanes), v)
    x = tmap(lambda l: l[:, :, 0], view)
    y = tmap(lambda l: l[:, :, 1], view)
    wo = tuple(r[s].reshape(m, t, lanes) for r in tws)
    wc = tuple(r[s].reshape(m, t, lanes) for r in twcs)
    nx, ny = bfly(x, y, wo, wc)
    return tmap(
        lambda a, b: jnp.stack([a, b], axis=2).reshape(tile_b, n_axis, lanes), nx, ny
    )


def _round_r4(v, tws, twcs, s, m, t2, lanes, tile_b, n_axis, bfly):
    """Two radix-2 layers per VMEM residency: view (m, 4, t2); stage s pairs
    (c0,c2),(c1,c3) with w[m+g]; stage s+1 pairs (c0,c1) w[2m+2g] and
    (c2,c3) w[2m+2g+1].  Output rows land exactly where they started (DIT
    is in-place), so no intermediate interleave exists at all."""
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


def make_rounds(log_n: int, group: int) -> tuple[int, ...]:
    """Stage grouping per phase: group=1 -> all single stages; group=2 ->
    two layers per round with a single tail stage when log_n is odd."""
    if group == 1:
        return (1,) * log_n
    out = [2] * (log_n // 2)
    if log_n % 2:
        out.append(1)
    return tuple(out)


def _run_phase(v, tws, twcs, rounds, lanes, tile_b, n_axis, bfly, pp):
    """Run one phase's rounds, writing each round's output through the
    ping-pong scratch pair `pp` (except the last round, which stays in
    values for the caller's transpose/store)."""
    s = 0
    pi = 0
    for i, g in enumerate(rounds):
        m = 1 << s
        if g == 1:
            v = _round_r2(v, tws, twcs, s, m, n_axis >> (s + 1), lanes, tile_b,
                          n_axis, bfly)
        else:
            v = _round_r4(v, tws, twcs, s, m, n_axis >> (s + 2), lanes, tile_b,
                          n_axis, bfly)
        s += g
        if i < len(rounds) - 1 and pp is not None:
            for r, l in zip(pp[pi], v):
                r[...] = l
            v = tuple(r[...] for r in pp[pi])
            pi ^= 1
    return v


def _fwd_kernel_v2(ops, q, n1, n2, rounds1, rounds2, strict, keep_t, nlimb,
                   use_scratch, refs):
    a_refs = refs[:nlimb]
    ctw = refs[nlimb : 2 * nlimb]
    ctwc = refs[2 * nlimb : 3 * nlimb]
    rtw = refs[3 * nlimb : 4 * nlimb]
    rtwc = refs[4 * nlimb : 5 * nlimb]
    o_refs = refs[5 * nlimb : 6 * nlimb]
    scr = refs[6 * nlimb :]
    tile_b = a_refs[0].shape[0]

    if use_scratch:
        pp1 = (scr[:nlimb], scr[nlimb : 2 * nlimb])
        pp2 = (scr[2 * nlimb : 3 * nlimb], scr[3 * nlimb :])
    else:
        pp1 = pp2 = None

    bfly = lambda x, y, wo, wc: ops.fwd_bfly(x, y, wo, wc, q)
    ctw_v = tuple(r[...] for r in ctw)
    ctwc_v = tuple(r[...] for r in ctwc)
    rtw_v = tuple(r[...] for r in rtw)
    rtwc_v = tuple(r[...] for r in rtwc)

    v = tuple(r[...] for r in a_refs)  # (tile_b, n1, n2)
    v = _run_phase(v, ctw_v, ctwc_v, rounds1, n2, tile_b, n1, bfly, pp1)
    v = tmap(lambda l: jnp.swapaxes(l, -1, -2), v)  # (tile_b, n2, n1)
    if pp2 is not None:
        for r, l in zip(pp2[1], v):
            r[...] = l
        v = tuple(r[...] for r in pp2[1])
    v = _run_phase(v, rtw_v, rtwc_v, rounds2, n1, tile_b, n2, bfly, pp2)
    if strict:
        v = ops.reduce_4q_to_q(v, q)
    if not keep_t:
        v = tmap(lambda l: jnp.swapaxes(l, -1, -2), v)  # (tile_b, n1, n2)
    for o, l in zip(o_refs, v):
        o[...] = l


def fwd_fused_v2(a_rep, ops, tables, q, n1_log, group=2, tile_b=None,
                 strict=True, keep_transposed=False, use_scratch=True,
                 interpret=False):
    """a_rep: rep of (..., N).  tables: pf.build_tables(w, wc, n1, n2, nlimb)."""
    n = a_rep[0].shape[-1]
    logn = n.bit_length() - 1
    n1, n2 = 1 << n1_log, 1 << (logn - n1_log)
    nlimb = len(a_rep)
    lead = a_rep[0].shape[:-1]
    batch = int(np.prod(lead)) if lead else 1
    if tile_b is None:
        tile_b = 64 if nlimb == 1 else 16
    tile_b = min(tile_b, max(8, batch))
    a3 = tuple(l.reshape(batch, n1, n2) for l in a_rep)
    pad = (-batch) % tile_b
    if pad:
        a3 = tuple(jnp.pad(l, ((0, pad), (0, 0), (0, 0))) for l in a3)
    padded = batch + pad
    rounds1 = make_rounds(n1_log, group)
    rounds2 = make_rounds(logn - n1_log, group)

    grid = (padded // tile_b,)
    in_spec = pl.BlockSpec((tile_b, n1, n2), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    out_shape3 = (tile_b, n2, n1) if keep_transposed else (tile_b, n1, n2)
    out_spec = pl.BlockSpec(out_shape3, lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    tab_specs = [
        pl.BlockSpec(t.shape, functools.partial(lambda r, i: (0,) * r, len(t.shape)),
                     memory_space=pltpu.VMEM)
        for t in tables
    ]
    scratch = (
        [pltpu.VMEM((tile_b, n1, n2), jnp.uint32)] * (2 * nlimb)
        + [pltpu.VMEM((tile_b, n2, n1), jnp.uint32)] * (2 * nlimb)
    ) if use_scratch else []

    kernel = functools.partial(
        _fwd_kernel_v2, ops, q, n1, n2, rounds1, rounds2, strict,
        keep_transposed, nlimb, use_scratch,
    )
    full_out = (padded,) + out_shape3[1:]
    out = pl.pallas_call(
        lambda *refs: kernel(refs),
        grid=grid,
        in_specs=[in_spec] * nlimb + tab_specs,
        out_specs=tuple([out_spec] * nlimb),
        out_shape=tuple(jax.ShapeDtypeStruct(full_out, jnp.uint32)
                        for _ in range(nlimb)),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * (1 << 20)),
    )(*a3, *tables)
    if pad:
        out = tuple(l[:batch] for l in out)
    return tuple(l.reshape(lead + (n,)) for l in out)


# ---------------------------------------------------------------------------
# mult-lean element backends (host-presplit Shoup constants)
# ---------------------------------------------------------------------------
#
# The diag decomposition showed the fused kernel is multiply-throughput
# bound (~1 u32 mult/lane/cycle).  These backends shave the non-mult ops:
# the Shoup constant's 16-bit halves are precomputed host-side (they are
# table values), so mulhi32 skips the two wc splits per butterfly.

MASK16 = np.uint32(0xFFFF)


def mulhi32_presplit(c0, c1, t):
    """hi32(c * t) with c pre-split as (c0, c1) = (c & 0xffff, c >> 16)."""
    t0 = t & MASK16
    t1 = t >> 16
    p00 = c0 * t0
    p01 = c0 * t1
    p10 = c1 * t0
    mid = (p00 >> 16) + (p01 & MASK16) + (p10 & MASK16)
    return c1 * t1 + (p01 >> 16) + (p10 >> 16) + (mid >> 16)


class U32FastOps:
    """Single-limb ops, twiddle rep = (w, wc_lo16, wc_hi16)."""

    nlimb = 1
    tw_parts = 3

    @staticmethod
    def fwd_bfly(x, y, wo, wc3, q):
        x1 = jnp.where(x[0] < np.uint32(2 * q), x[0], x[0] - np.uint32(2 * q))
        big_q = mulhi32_presplit(wc3[0], wc3[1], y[0])
        t = wo[0] * y[0] - big_q * np.uint32(q)
        return (x1 + t,), (x1 + np.uint32(2 * q) - t,)

    reduce_4q_to_q = U32Ops.reduce_4q_to_q


# ---------------------------------------------------------------------------
# kernel v3: Stockham constant geometry
# ---------------------------------------------------------------------------
#
# Every stage pairs the contiguous top/bottom halves of the row axis
# (aligned full-vreg slices), butterflies at full width, then does ONE
# stride-1 row interleave (stack axis=2).  Derivation: with work->logical
# row map logical = ror(w, s) after s stages, the (w, w + n1/2) pairing
# always hits logical rows differing in bit (logn1-1-s), and the twiddle
# for pair i at stage s is w[2^s + (i mod 2^s)] -- a periodic slab.  After
# logn1 stages ror composes to identity: output is ALREADY in standard
# order.  No strided views, no sub-8-sublane slices anywhere.


def stockham_col_stack(w_u64: np.ndarray, n1: int, n2: int) -> np.ndarray:
    """(logn1, n1//2, n2): slab s row i holds w[2^s + (i mod 2^s)]."""
    logn1 = n1.bit_length() - 1
    out = np.zeros((logn1, n1 // 2, n2), dtype=np.uint64)
    for s in range(logn1):
        m = 1 << s
        vals = np.tile(w_u64[m : 2 * m], (n1 // 2) // m)
        out[s] = vals[:, None]
    return out


def stockham_row_stack(w_u64: np.ndarray, n1: int, n2: int) -> np.ndarray:
    """(logn2, n2//2, n1): slab s at (i, c) holds
    w[2^s*n1 + c*2^s + (i mod 2^s)] (the global-table row twiddles in
    constant-geometry order)."""
    logn2 = n2.bit_length() - 1
    out = np.zeros((logn2, n2 // 2, n1), dtype=np.uint64)
    for s in range(logn2):
        m = 1 << s
        tw = w_u64[m * n1 : 2 * m * n1].reshape(n1, m).T  # (m, n1)
        out[s] = np.tile(tw, ((n2 // 2) // m, 1))
    return out


def build_tables_v3(w_u64, wc_u64, n1: int, n2: int, nlimb: int):
    ctw = pf._split_limbs(stockham_col_stack(w_u64, n1, n2), nlimb)
    ctwc = pf._split_limbs(stockham_col_stack(wc_u64, n1, n2), nlimb)
    rtw = pf._split_limbs(stockham_row_stack(w_u64, n1, n2), nlimb)
    rtwc = pf._split_limbs(stockham_row_stack(wc_u64, n1, n2), nlimb)
    return ctw + ctwc + rtw + rtwc


def _v3_phase(v, tws, twcs, n_axis, lanes, tile_b, bfly):
    logn = n_axis.bit_length() - 1
    half = n_axis // 2
    for s in range(logn):
        x = tmap(lambda l: l[:, :half], v)
        y = tmap(lambda l: l[:, half:], v)
        wo = tuple(r[s] for r in tws)
        wc = tuple(r[s] for r in twcs)
        nx, ny = bfly(x, y, wo, wc)
        v = tmap(
            lambda a, b: jnp.stack([a, b], axis=2).reshape(tile_b, n_axis,
                                                           lanes),
            nx, ny,
        )
    return v


def _fwd_kernel_v3(ops, q, n1, n2, strict, keep_t, nlimb, refs):
    a_refs = refs[:nlimb]
    ctw = refs[nlimb : 2 * nlimb]
    ctwc = refs[2 * nlimb : 3 * nlimb]
    rtw = refs[3 * nlimb : 4 * nlimb]
    rtwc = refs[4 * nlimb : 5 * nlimb]
    o_refs = refs[5 * nlimb :]
    tile_b = a_refs[0].shape[0]
    bfly = lambda x, y, wo, wc: ops.fwd_bfly(x, y, wo, wc, q)

    ctw_v = tuple(r[...] for r in ctw)
    ctwc_v = tuple(r[...] for r in ctwc)
    rtw_v = tuple(r[...] for r in rtw)
    rtwc_v = tuple(r[...] for r in rtwc)

    v = tuple(r[...] for r in a_refs)
    v = _v3_phase(v, ctw_v, ctwc_v, n1, n2, tile_b, bfly)
    v = tmap(lambda l: jnp.swapaxes(l, -1, -2), v)
    v = _v3_phase(v, rtw_v, rtwc_v, n2, n1, tile_b, bfly)
    if strict:
        v = ops.reduce_4q_to_q(v, q)
    if not keep_t:
        v = tmap(lambda l: jnp.swapaxes(l, -1, -2), v)
    for o, l in zip(o_refs, v):
        o[...] = l


def fwd_fused_v3(a_rep, ops, tables, q, n1_log, tile_b=None, strict=True,
                 keep_transposed=False, interpret=False):
    n = a_rep[0].shape[-1]
    logn = n.bit_length() - 1
    n1, n2 = 1 << n1_log, 1 << (logn - n1_log)
    nlimb = len(a_rep)
    lead = a_rep[0].shape[:-1]
    batch = int(np.prod(lead)) if lead else 1
    if tile_b is None:
        tile_b = 64 if nlimb == 1 else 16
    tile_b = min(tile_b, max(8, batch))
    a3 = tuple(l.reshape(batch, n1, n2) for l in a_rep)
    pad = (-batch) % tile_b
    if pad:
        a3 = tuple(jnp.pad(l, ((0, pad), (0, 0), (0, 0))) for l in a3)
    padded = batch + pad

    in_spec = pl.BlockSpec((tile_b, n1, n2), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    out3 = (tile_b, n2, n1) if keep_transposed else (tile_b, n1, n2)
    out_spec = pl.BlockSpec(out3, lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    tab_specs = [
        pl.BlockSpec(t.shape, functools.partial(lambda r, i: (0,) * r,
                                                len(t.shape)),
                     memory_space=pltpu.VMEM)
        for t in tables
    ]
    kernel = functools.partial(_fwd_kernel_v3, ops, q, n1, n2, strict,
                               keep_transposed, nlimb)
    out = pl.pallas_call(
        lambda *refs: kernel(refs),
        grid=(padded // tile_b,),
        in_specs=[in_spec] * nlimb + tab_specs,
        out_specs=tuple([out_spec] * nlimb),
        out_shape=tuple(jax.ShapeDtypeStruct((padded,) + out3[1:], jnp.uint32)
                        for _ in range(nlimb)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * (1 << 20)),
    )(*a3, *tables)
    if pad:
        out = tuple(l[:batch] for l in out)
    return tuple(l.reshape(lead + (n,)) for l in out)


# ---------------------------------------------------------------------------
# diagnostic kernels: decompose the fused transform's cost
# ---------------------------------------------------------------------------


def diag_mul(a_rep, tables, n_mults, n1, n2, tile_b):
    """Pure u32 multiply throughput: n_mults chained multiplies per element."""
    nlimb = len(a_rep)

    def kernel(*refs):
        a_refs = refs[:nlimb]
        o_refs = refs[-nlimb:]
        v = tuple(r[...] for r in a_refs)
        c = np.uint32(0x9E3779B1)
        for _ in range(n_mults):
            v = tmap(lambda l: l * c + np.uint32(1), v)
        for o, l in zip(o_refs, v):
            o[...] = l

    return _diag_call(kernel, a_rep, tables, n1, n2, tile_b)


def _diag_call(kernel, a_rep, tables, n1, n2, tile_b, extra_rounds=0):
    nlimb = len(a_rep)
    lead = a_rep[0].shape[:-1]
    batch = int(np.prod(lead)) if lead else 1
    a3 = tuple(l.reshape(batch, n1, n2) for l in a_rep)
    spec = pl.BlockSpec((tile_b, n1, n2), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    tab_specs = [
        pl.BlockSpec(t.shape, functools.partial(lambda r, i: (0,) * r,
                                                len(t.shape)),
                     memory_space=pltpu.VMEM)
        for t in tables
    ]
    out = pl.pallas_call(
        kernel,
        grid=(batch // tile_b,),
        in_specs=[spec] * nlimb + tab_specs,
        out_specs=tuple([spec] * nlimb),
        out_shape=tuple(jax.ShapeDtypeStruct((batch, n1, n2), jnp.uint32)
                        for _ in range(nlimb)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * (1 << 20)),
    )(*a3, *tables)
    return tuple(l.reshape(lead + (n1 * n2,)) for l in out)


def diag_copy(a_rep, tables, n1, n2, tile_b):
    """HBM floor: read the tile, write it back."""
    nlimb = len(a_rep)

    def kernel(*refs):
        for o, i in zip(refs[-nlimb:], refs[:nlimb]):
            o[...] = i[...]

    return _diag_call(kernel, a_rep, tables, n1, n2, tile_b)


def diag_math(a_rep, ops, tables, q, n_rounds, n1, n2, tile_b):
    """Pure VPU math: n_rounds butterfly applications on contiguous halves
    (zero strided movement, same op count as the real transform)."""
    nlimb = len(a_rep)

    def kernel(*refs):
        a_refs = refs[:nlimb]
        ctw = refs[nlimb : 2 * nlimb]
        ctwc = refs[2 * nlimb : 3 * nlimb]
        o_refs = refs[-nlimb:]
        v = tuple(r[...] for r in a_refs)
        wo = tuple(r[0].reshape(1, n1 // 2, n2) for r in ctw)
        wc = tuple(r[0].reshape(1, n1 // 2, n2) for r in ctwc)
        for _ in range(n_rounds):
            x = tmap(lambda l: l[:, : n1 // 2], v)
            y = tmap(lambda l: l[:, n1 // 2 :], v)
            nx, ny = ops.fwd_bfly(x, y, wo, wc, q)
            v = tmap(lambda a, b: jnp.concatenate([a, b], axis=1), nx, ny)
        for o, l in zip(o_refs, v):
            o[...] = l

    return _diag_call(kernel, a_rep, tables, n1, n2, tile_b)


def diag_moves(a_rep, tables, n_list, n1, n2, tile_b):
    """Pure data movement: the real per-stage views/interleaves (plus the
    transpose), butterflies replaced by (y, x) swap."""
    nlimb = len(a_rep)
    logn1, logn2 = n1.bit_length() - 1, n2.bit_length() - 1

    def kernel(*refs):
        a_refs = refs[:nlimb]
        o_refs = refs[-nlimb:]
        tile = a_refs[0].shape[0]
        v = tuple(r[...] for r in a_refs)

        def stage(v, m, t, lanes, n_axis):
            view = tmap(lambda l: l.reshape(tile, m, 2, t, lanes), v)
            x = tmap(lambda l: l[:, :, 0], view)
            y = tmap(lambda l: l[:, :, 1], view)
            return tmap(
                lambda a, b: jnp.stack([b, a], axis=2).reshape(tile, n_axis,
                                                               lanes), x, y,
            )

        for s in range(logn1):
            v = stage(v, 1 << s, n1 >> (s + 1), n2, n1)
        v = tmap(lambda l: jnp.swapaxes(l, -1, -2), v)
        for s in range(logn2):
            v = stage(v, 1 << s, n2 >> (s + 1), n1, n2)
        v = tmap(lambda l: jnp.swapaxes(l, -1, -2), v)
        for o, l in zip(o_refs, v):
            o[...] = l

    return _diag_call(kernel, a_rep, tables, n1, n2, tile_b)


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------


def _check(name, body, a_rep, want, ops):
    got = ops.to_host(body(a_rep))
    if not np.array_equal(got, want):
        bad = np.argwhere(got != want)
        raise AssertionError(f"{name}: MISMATCH at {bad[:4]}")
    print(f"  {name}: bit-exact on chip")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default="u32", choices=["u32", "u64", "both"])
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--m", type=int, default=14)
    ap.add_argument("--tile-b", type=int, default=None)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--inner", type=int, default=50)
    ap.add_argument("--only", default=None, help="comma list of candidate names")
    ap.add_argument("--no-time", action="store_true")
    args = ap.parse_args()

    import faulthandler

    faulthandler.dump_traceback_later(600, repeat=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_ntt_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from bench import _measure_loop

    widths = {"u32": [1], "u64": [2], "both": [1, 2]}[args.cases]
    for nlimb in widths:
        if nlimb == 1:
            p = NttParams.generate(27, args.m)
            ops = U32Ops
        else:
            p = bench_params(m=args.m, q_bits=62)
            ops = U64Ops
        plan = get_plan(p)
        q = p.q
        logn = p.m
        print(f"[setup] params q={q:#x}", flush=True)
        rng = np.random.default_rng(0)
        a = rng.integers(0, q, size=(args.batch, p.n), dtype=np.uint64)
        a_rep = ops.from_host(a)
        print("[setup] input on device", flush=True)
        # oracle: jnp six-step on chip (itself oracle-tested vs refmodel)
        if nlimb == 1:
            w, wc, _, _ = plan.dev_r2_u32
            w_rep, wc_rep = (w,), (wc,)
        else:
            w_rep, wc_rep = plan.dev_r2_u64[0], plan.dev_r2_u64[1]
        import time as _time

        t0 = _time.time()
        want = ops.to_host(
            jax.jit(lambda x: ss.fwd_sixstep(x, ops, w_rep, wc_rep, q, strict=True))(
                a_rep
            )
        )
        print(f"[setup] oracle done in {_time.time() - t0:.0f}s", flush=True)

        n1log_old = pf.pick_split(p.n)
        n1log_new = logn - 7  # N2 = 128 lanes
        tabs_old = plan.pallas_tables(False, n1log_old, nlimb)
        tabs_new = plan.pallas_tables(False, n1log_new, nlimb)
        tb = args.tile_b

        n1d, n2d = 1 << n1log_new, p.n >> n1log_new
        tbd = tb or (64 if nlimb == 1 else 16)
        cands = {
            "v1-64": lambda x: pf.fwd_fused(x, ops, tabs_old, q, n1log_old,
                                            strict=True),
            "v1-128": lambda x: pf.fwd_fused(x, ops, tabs_new, q, n1log_new,
                                             strict=True),
            "v2-r2": lambda x: fwd_fused_v2(x, ops, tabs_new, q, n1log_new,
                                            group=1, tile_b=tb, strict=True),
            "v2-r4": lambda x: fwd_fused_v2(x, ops, tabs_new, q, n1log_new,
                                            group=2, tile_b=tb, strict=True),
            "v2-r4-noscr": lambda x: fwd_fused_v2(
                x, ops, tabs_new, q, n1log_new, group=2, tile_b=tb, strict=True,
                use_scratch=False),
            "v2-r2-noscr": lambda x: fwd_fused_v2(
                x, ops, tabs_new, q, n1log_new, group=1, tile_b=tb, strict=True,
                use_scratch=False),
            "diag-copy": lambda x: diag_copy(x, tabs_new, n1d, n2d, tbd),
            "diag-math": lambda x: diag_math(x, ops, tabs_new, q, logn, n1d,
                                             n2d, tbd),
            "diag-moves": lambda x: diag_moves(x, tabs_new, None, n1d, n2d,
                                               tbd),
            "diag-mul": lambda x: diag_mul(x, tabs_new, 42, n1d, n2d, tbd),
        }
        tabs_v3 = None
        if nlimb == 1:
            wsrc, wcsrc = plan.w, plan.w_con32
        else:
            wsrc, wcsrc = plan.w, plan.w_con
        tabs_v3 = build_tables_v3(wsrc, wcsrc, n1d, n2d, nlimb)
        cands["v3"] = lambda x: fwd_fused_v3(x, ops, tabs_v3, q, n1log_new,
                                             tile_b=tb, strict=True)
        if args.only:
            keep = args.only.split(",")
            cands = {k: v for k, v in cands.items() if k in keep}

        label = "u32" if nlimb == 1 else "u64"
        print(f"[{label}] q={q:#x} N=2^{logn} batch={args.batch}")
        for name, body in cands.items():
            try:
                if name.startswith("diag-"):
                    body(a_rep)  # compile + run only; not a real transform
                else:
                    _check(name, body, a_rep, want, ops)
            except Exception as e:
                print(f"  {name}: FAILED ({type(e).__name__}: {e})")
                continue
            if args.no_time:
                continue
            sec = _measure_loop(body, a_rep, reps=args.reps, k1=2,
                                k2=2 + args.inner)
            print(f"  {name}: {sec / args.batch * 1e6:8.3f} us/transform "
                  f"({args.batch / sec:12,.0f} tps)", flush=True)


if __name__ == "__main__":
    main()
