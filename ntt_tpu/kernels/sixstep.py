"""Six-step (Bailey / four-step) negacyclic NTT -- the TPU-native fast path.

Key structural fact (derived from the reference's bit-reversed twiddle
convention, pre_compute.h:28-51 + src/ntt_reference.c:19-30): splitting
N = N1*N2 and viewing the coefficient vector as an (N1, N2) matrix,

  * the first log2(N1) Harvey stages touch only the N1 axis and use the
    global table's prefix w[1:N1] -- i.e. they ARE independent column NTTs
    vectorized across all N2 lanes;
  * each remaining stage s' uses exactly the contiguous global-table slice
    w[2^s' * N1 : 2^(s'+1) * N1], reshaped (N1, 2^s'), as per-row twiddles
    -- i.e. row NTTs with row-dependent tables and NO separate twiddle-
    scaling step (it is already folded into the global table).

Hence the six-step decomposition here is *bit-exact* with the flat radix-2
kernel (same butterflies, same twiddle values, same lazy bounds) while
keeping the innermost vectorized axis wide and contiguous for the VPU:
phase 1 vectorizes over N2 lanes, then one transpose, and phase 2
vectorizes over N1 lanes.  This is the same role HEXL's depth-first
recursion plays for CPU caches (third_party/hexl/fwd-ntt-avx512.c:310-328)
-- re-derived for TPU memory layout instead of translated.

The phase functions below are shared verbatim by the single-chip fused
variant (this file) and the multi-chip distributed variant
(dist/sixstep.py: phase 1 local, all_to_all transpose, phase 2 local with
per-device twiddle column slices).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ntt_tpu.kernels.elems import tmap


def default_split(n: int, min_lanes: int = 128, nlimb: int = 1) -> int:
    """Pick n1 (log2 N1), from v5e measurements (see README performance):

    * N in [2^12, 2^17]: N2 = 64 is consistently fastest (2^12: 0.21 vs
      0.23 us/t; 2^14: 1.09 vs 1.17; 2^16: 4.77 vs 5.49) -- the batch dim
      provides the vectorization width, so small N2 just means cheaper
      per-stage interleaves and wide phase-2 rows.  The band boundary is
      real: at 2^18 balanced wins 25.0 vs 132.6 us/t and at 2^22 it wins
      159.8 vs 3079.8 -- N2=64 collapses once N1 rows no longer fit the
      compiler's working set.
    * EXCEPTION (u64, N=2^16): the limb-pair working set hits the
      compiler cliff two octaves early -- the round-4 3-round interleaved
      study (artifacts/M16_STABILITY_r04.json, control band 0.4%) has the
      balanced N2=256 split at 24.7-25.3 us/t for batch<=64 vs 41.3-46.8
      for N2=64, and neutral-to-better at batch 128 (29.9-31.4 vs
      30.0-32.0).  The u32 single-limb path keeps N2=64 (measured faster
      there, round 2).  Callers that know their limb width pass nlimb.
    * N >= 2^23 HISTORY: rounds 2-4 capped n1 at 2^8 (balanced read 37.8
      ms/t at 2^24 vs 10.75 capped -- the "XLA pathology").  Round 5
      identified that pathology as the tables-as-jit-arguments codegen
      cliff (PHASE_CONST_AB_r05) and fixed it with pre-broadcast stage
      tabs; under tabs the balance flips back (m24 u32: balanced 4.4-5.1
      ms/t vs capped 7.0-8.5; u64: 19.8-20.9 vs 23.2-23.7,
      REC_LAB_TABS_r05), so the cap is REMOVED.  (The even faster path
      at these sizes is the recursive six-step, which `auto` picks.)
    * otherwise: balanced, biased so N2 >= min_lanes."""
    logn = n.bit_length() - 1
    if logn == 16 and nlimb == 2:
        return 8  # N2 = 256
    if 12 <= logn <= 17:
        return logn - 6  # N2 = 64
    n1 = logn // 2
    while n1 > 1 and (1 << (logn - n1)) < min_lanes:
        n1 -= 1
    return max(1, min(n1, logn - 1))


def default_group(nlimb: int) -> int:
    """Measured stage-grouping default (v5e, tools/group_sweep, N=2^14
    batch 512): the u64 path is HBM-per-stage bound and gains 17% from two
    butterfly layers per interleave (6.42 vs 7.73 us/t); the u32 path is
    multiply-issue bound and prefers single stages (1.09 vs 1.11).
    Larger groups lose on both (XLA codegen degrades: u64 g=3 20.8)."""
    return 2 if nlimb == 2 else 1


def _stage_axis1(a_rep, m: int, t: int, lanes: int, bfly, post=None):
    """One butterfly stage along the second-to-last axis of (..., M, L).
    `post` (e.g. the strict 4q->q reduction) is applied to the outputs
    BEFORE the interleave so it fuses into the same materialization."""
    lead = a_rep[0].shape[:-2]
    shape = lead + (m, 2, t, lanes)
    v = tmap(lambda l: l.reshape(shape), a_rep)
    x = tmap(lambda l: l[..., 0, :, :], v)
    y = tmap(lambda l: l[..., 1, :, :], v)
    nx, ny = bfly(x, y)
    if post is not None:
        nx, ny = post(nx), post(ny)
    return tmap(
        lambda xl, yl: jnp.stack([xl, yl], axis=-3).reshape(lead + (2 * m * t, lanes)),
        nx,
        ny,
    )


def _stage_group_axis1(a_rep, g: int, m: int, tg: int, lanes: int, bfly_at,
                       reverse: bool = False, post=None):
    """g consecutive butterfly stages with ONE interleave (the XLA analog of
    the reference's layers-per-residency fusion, src/ntt_radix4x4.c:64-75).

    Key fact: a DIT/DIF stage writes its outputs to the rows it read (the
    per-stage stack+reshape in _stage_axis1 is an identity relayout), so g
    stages compose with no intermediate data movement.  View each group as
    (m, 2^g, tg): level L pairs slice c with c | 2^(g-1-L); slice c's
    group index at that level is h = g_idx * 2^L + (c >> (g-L)).  One
    jnp.stack at the end -> one XLA materialization per g stages instead
    of per stage.

    bfly_at(L, c_high, x, y) applies the level-L butterfly with the
    twiddles of groups h = g_idx * 2^L + c_high.  reverse runs the levels
    in descending order with inverse butterflies (for the inverse NTT)."""
    lead = a_rep[0].shape[:-2]
    shape = lead + (m, 1 << g, tg, lanes)
    v = tmap(lambda l: l.reshape(shape), a_rep)
    xs = [tmap(lambda l, c=c: l[..., c, :, :], v) for c in range(1 << g)]
    levels = range(g - 1, -1, -1) if reverse else range(g)
    for L in levels:
        pb = g - 1 - L  # pairing bit of the slice index
        for c in range(1 << g):
            if c & (1 << pb):
                continue
            c2 = c | (1 << pb)
            xs[c], xs[c2] = bfly_at(L, c >> (pb + 1), xs[c], xs[c2])
    if post is not None:
        xs = [post(x) for x in xs]
    per_limb = list(zip(*xs))  # [limb][slice]
    return tuple(
        jnp.stack(ls, axis=-3).reshape(lead + (m * (1 << g) * tg, lanes))
        for ls in per_limb
    )


def _col_tw(w_rep, m: int):
    """Column-phase twiddles for the stage with m groups: w[m:2m]."""
    return tmap(lambda l: l[m : 2 * m].reshape(m, 1, 1), w_rep)


def col_tw_stacks(w_u64, n1: int, to_rep):
    """Host-side per-stage column twiddle stacks: stage s -> rep of shape
    (2^s, 1, 1) = w[2^s : 2^{s+1}] (exactly _col_tw's view).

    Motivation (round-5 finding, artifacts/PHASE_CONST_AB_r05.json): with
    the O(N) twiddle table passed as a jit ARGUMENT -- the production
    calling convention; closures break the remote-compile size cap at
    N >= 2^23 -- the phase programs run up to 14-24x slower than with the
    table closed over (m20 D=8 p1: 458 vs 31.9 us), because XLA can no
    longer fold the per-stage slice/reshape of the big runtime operand
    into the butterfly fusion.  Pre-slicing host-side hands every stage a
    SMALL dedicated operand instead, which (like row_tw_stacks for the
    row phase: 299 vs 1022-1215 us) restores closure-grade codegen while
    keeping tables out of the serialized module."""
    import numpy as np

    logn1 = n1.bit_length() - 1
    return tuple(
        to_rep(np.ascontiguousarray(
            w_u64[1 << s : 2 << s]).reshape(1 << s, 1, 1))
        for s in range(logn1)
    )


def _ctab_tw_at(tabs, s: int, L: int, c_high: int, m: int):
    """Level-L column twiddles from a pre-broadcast stack: tabs[s+L] is
    the stage-(m*2^L) stack of shape (m*2^L, 1, 1); take the c_high
    slice (groups h = g_idx * 2^L + c_high)."""
    return tmap(
        lambda l: l.reshape(m, 1 << L, 1, 1)[:, c_high], tabs[s + L]
    )


def row_tw_stacks(w_u64, n1: int, n2: int, to_rep):
    """Host-side pre-transposed per-stage row twiddle tables: stage s ->
    rep of shape (2^s, 1, n1) holding the (n1, 2^s)-viewed, transposed
    slice of the global table (exactly what _row_tw derives IN-program).

    Motivation (round-3 finding, docs/PERF.md): fwd_phase2 lowers to 17%
    more flops than its mirror inv_phaseA with identical butterfly jaxprs;
    the one structural difference from the Pallas path -- which does NOT
    show the asymmetry -- is that the XLA path re-derives
    ``reshape(n1, m2).T`` + slice inside every traced stage, and XLA
    duplicates that relayout across fusion boundaries.  Building the
    stacks host-side (the Pallas path's col_stack/row_stack idea,
    kernels/pallas_fused.py:56-79) removes the in-program derivation.

    ``to_rep`` converts a uint64 NumPy array to the kernel rep (e.g.
    mm.from_u64, or uint32 cast for the single-limb path)."""
    import numpy as np

    logn2 = n2.bit_length() - 1
    out = []
    for s in range(logn2):
        m2 = 1 << s
        tab = np.ascontiguousarray(
            w_u64[m2 * n1 : 2 * m2 * n1].reshape(n1, m2).T
        ).reshape(m2, 1, n1)
        out.append(to_rep(tab))
    return tuple(out)


def _row_tw(w_rep, m2: int, n1_size: int, col0, ncols: int):
    """Row-phase twiddles for stage s' (m2 = 2^s' groups within each row):
    global slice w[m2*N1 : 2*m2*N1] viewed (N1, m2), transposed to
    (m2, ncols) for rows [col0, col0+ncols).  col0 may be a traced value
    (per-device offset in the distributed variant)."""

    def slice_one(l):
        tw = l[m2 * n1_size : 2 * m2 * n1_size].reshape(n1_size, m2).T
        if isinstance(col0, int):
            # static slice: required inside Pallas kernel bodies (Mosaic has
            # no dynamic_slice) and cheaper everywhere else
            tw = tw[:, col0 : col0 + ncols]
        else:
            tw = jax.lax.dynamic_slice_in_dim(tw, col0, ncols, axis=1)
        return tw.reshape(m2, 1, ncols)

    return tmap(slice_one, w_rep)


# ---------------------------------------------------------------------------
# phase functions (shared with dist/sixstep.py)
# ---------------------------------------------------------------------------


def _col_tw_at(w_rep, m: int, L: int, c_high: int):
    """Level-L column twiddles for a grouped stage starting at m groups:
    the slice of groups h = g_idx * 2^L + c_high."""
    m2 = m << L
    return tmap(
        lambda l: l[m2 : 2 * m2].reshape(m, 1 << L)[:, c_high].reshape(m, 1, 1),
        w_rep,
    )


def _row_tw_at(w_rep, m: int, L: int, c_high: int, n1_size: int, col0,
               ncols: int):
    """Level-L row twiddles for a grouped stage: the c_high slice of the
    stage-(m * 2^L) per-column twiddle matrix."""
    full = _row_tw(w_rep, m << L, n1_size, col0, ncols)  # (m*2^L, 1, ncols)
    return tmap(
        lambda l: l.reshape(m, 1 << L, 1, ncols)[:, c_high], full
    )


def _tab_tw_at(tabs, s: int, L: int, c_high: int, m: int, ncols: int):
    """Level-L row twiddles from a pre-broadcast stack: tabs[s+L] is the
    stage-(m * 2^L) table of shape (m*2^L, 1, ncols); take the c_high
    slice (a static contiguous-slab view, no transpose)."""
    return tmap(
        lambda l: l.reshape(m, 1 << L, 1, ncols)[:, c_high], tabs[s + L]
    )


def fwd_phase1(a, ops, w, wc, q: int, n1_size: int, lanes: int,
               group: int = 1, col_tabs=None):
    """Forward column stages on (..., N1, L) -- all stages with m < N1.
    group > 1 fuses that many stages per interleave (see
    _stage_group_axis1).  col_tabs: optional (tw_tabs, twc_tabs)
    pre-sliced per-stage stacks (col_tw_stacks) replacing the in-program
    slice of the O(N) table -- the production fix for the
    tables-as-arguments codegen cliff (see col_tw_stacks)."""
    logn1 = n1_size.bit_length() - 1
    s = 0
    while s < logn1:
        g = min(group, logn1 - s)
        m, tg = 1 << s, n1_size >> (s + g)
        if g == 1:
            if col_tabs is not None:
                wo, wco = col_tabs[0][s], col_tabs[1][s]
            else:
                wo, wco = _col_tw(w, m), _col_tw(wc, m)
            a = _stage_axis1(a, m, tg, lanes,
                             lambda x, y: ops.fwd_bfly(x, y, wo, wco, q))
        else:
            def bfly_at(L, c_high, x, y, m=m, s=s):
                if col_tabs is not None:
                    wo = _ctab_tw_at(col_tabs[0], s, L, c_high, m)
                    wco = _ctab_tw_at(col_tabs[1], s, L, c_high, m)
                else:
                    wo = _col_tw_at(w, m, L, c_high)
                    wco = _col_tw_at(wc, m, L, c_high)
                return ops.fwd_bfly(x, y, wo, wco, q)

            a = _stage_group_axis1(a, g, m, tg, lanes, bfly_at)
        s += g
    return a


def fwd_phase2(a, ops, w, wc, q: int, n1_size: int, n2_size: int,
               col0, ncols: int, group: int = 1, strict: bool = False,
               row_tabs=None):
    """Forward row stages on the transposed view (..., N2, ncols), where
    ncols is the local slice of the N1 axis starting at global column col0.
    With strict, the final 4q->q reduction is folded into the last stage
    (no extra materialization pass).

    row_tabs: optional (tw_tabs, twc_tabs) pre-broadcast per-stage stacks
    (see row_tw_stacks) replacing the in-program _row_tw derivation; only
    valid for the full-width case (col0 == 0, ncols == n1_size)."""
    logn2 = n2_size.bit_length() - 1
    if logn2 == 0:
        return ops.reduce_4q_to_q(a, q) if strict else a
    s = 0
    while s < logn2:
        g = min(group, logn2 - s)
        m2, tg = 1 << s, n2_size >> (s + g)
        last = s + g >= logn2
        post = (lambda rep: ops.reduce_4q_to_q(rep, q)) if (strict and last) \
            else None
        if g == 1:
            if row_tabs is not None:
                wo, wco = row_tabs[0][s], row_tabs[1][s]
            else:
                wo = _row_tw(w, m2, n1_size, col0, ncols)
                wco = _row_tw(wc, m2, n1_size, col0, ncols)
            a = _stage_axis1(a, m2, tg, ncols,
                             lambda x, y: ops.fwd_bfly(x, y, wo, wco, q),
                             post=post)
        else:
            def bfly_at(L, c_high, x, y, m2=m2, s=s):
                if row_tabs is not None:
                    wo = _tab_tw_at(row_tabs[0], s, L, c_high, m2, ncols)
                    wco = _tab_tw_at(row_tabs[1], s, L, c_high, m2, ncols)
                else:
                    wo = _row_tw_at(w, m2, L, c_high, n1_size, col0, ncols)
                    wco = _row_tw_at(wc, m2, L, c_high, n1_size, col0, ncols)
                return ops.fwd_bfly(x, y, wo, wco, q)

            a = _stage_group_axis1(a, g, m2, tg, ncols, bfly_at, post=post)
        s += g
    return a


def inv_phaseA(a, ops, w, wc, q: int, n1_size: int, n2_size: int,
               col0, ncols: int, group: int = 1, row_tabs=None):
    """Inverse row stages (global m = N/2 .. N1) on (..., N2, ncols).
    row_tabs: optional pre-broadcast stacks over the INVERSE table (see
    fwd_phase2)."""
    logn2 = n2_size.bit_length() - 1
    s_top = logn2
    while s_top > 0:
        g = min(group, s_top)
        s = s_top - g
        m2, tg = 1 << s, n2_size >> (s + g)
        if g == 1:
            if row_tabs is not None:
                wo, wco = row_tabs[0][s], row_tabs[1][s]
            else:
                wo = _row_tw(w, m2, n1_size, col0, ncols)
                wco = _row_tw(wc, m2, n1_size, col0, ncols)
            a = _stage_axis1(a, m2, tg, ncols,
                             lambda x, y: ops.bkw_bfly(x, y, wo, wco, q))
        else:
            def bfly_at(L, c_high, x, y, m2=m2, s=s):
                if row_tabs is not None:
                    wo = _tab_tw_at(row_tabs[0], s, L, c_high, m2, ncols)
                    wco = _tab_tw_at(row_tabs[1], s, L, c_high, m2, ncols)
                else:
                    wo = _row_tw_at(w, m2, L, c_high, n1_size, col0, ncols)
                    wco = _row_tw_at(wc, m2, L, c_high, n1_size, col0, ncols)
                return ops.bkw_bfly(x, y, wo, wco, q)

            a = _stage_group_axis1(a, g, m2, tg, ncols, bfly_at, reverse=True)
        s_top = s
    return a


def inv_phaseB(a, ops, w, wc, n_inv_op, n_inv_con, final_tmp, final_con,
               q: int, n1_size: int, lanes: int, group: int = 1,
               col_tabs=None):
    """Inverse column stages (global m = N1/2 .. 2) plus the fused final
    n_inv stage, on (..., N1, L).  col_tabs: optional pre-sliced stacks
    over the INVERSE table (see fwd_phase1)."""
    logn1 = n1_size.bit_length() - 1
    s_top = logn1
    while s_top > 1:
        g = min(group, s_top - 1)
        s = s_top - g
        m, tg = 1 << s, n1_size >> (s + g)
        if g == 1:
            if col_tabs is not None:
                wo, wco = col_tabs[0][s], col_tabs[1][s]
            else:
                wo, wco = _col_tw(w, m), _col_tw(wc, m)
            a = _stage_axis1(a, m, tg, lanes,
                             lambda x, y: ops.bkw_bfly(x, y, wo, wco, q))
        else:
            def bfly_at(L, c_high, x, y, m=m, s=s):
                if col_tabs is not None:
                    wo = _ctab_tw_at(col_tabs[0], s, L, c_high, m)
                    wco = _ctab_tw_at(col_tabs[1], s, L, c_high, m)
                else:
                    wo = _col_tw_at(w, m, L, c_high)
                    wco = _col_tw_at(wc, m, L, c_high)
                return ops.bkw_bfly(x, y, wo, wco, q)

            a = _stage_group_axis1(a, g, m, tg, lanes, bfly_at, reverse=True)
        s_top = s
    x = tmap(lambda l: l[..., : n1_size // 2, :], a)
    y = tmap(lambda l: l[..., n1_size // 2 :, :], a)
    nx, ny = ops.bkw_final(x, y, n_inv_op, n_inv_con, final_tmp, final_con, q)
    return tmap(lambda xl, yl: jnp.concatenate([xl, yl], axis=-2), nx, ny)


# ---------------------------------------------------------------------------
# single-chip fused transforms
# ---------------------------------------------------------------------------


def fwd_sixstep(a_rep, ops, w_rep, w_con_rep, q: int, n1_log: int | None = None,
                strict: bool = True, keep_transposed: bool = False,
                group: int | None = None, row_tabs=None, col_tabs=None):
    """Forward NTT via six-step.  a_rep: rep of shape (..., N).  Returns rep
    of shape (..., N) in standard bit-reversed output order, or -- with
    keep_transposed -- in the (N2, N1)-flattened layout (the analog of the
    reference's unordered-output contract,
    src/ntt_radix4_avx512_ifma_unordered.c; undo with
    fix_transposed_order).  row_tabs/col_tabs: pre-broadcast per-stage
    twiddle stacks (row_tw_stacks/col_tw_stacks) -- at big N with tables
    passed as jit arguments they are worth 14-24x (PHASE_CONST_AB_r05)."""
    n = a_rep[0].shape[-1]
    logn = n.bit_length() - 1
    if n1_log is None:
        n1_log = default_split(n, nlimb=ops.nlimb)
    if group is None:
        group = default_group(ops.nlimb)
    n1, n2 = 1 << n1_log, 1 << (logn - n1_log)
    lead = a_rep[0].shape[:-1]

    a = tmap(lambda l: l.reshape(lead + (n1, n2)), a_rep)
    a = fwd_phase1(a, ops, w_rep, w_con_rep, q, n1, n2, group=group,
                   col_tabs=col_tabs)
    a = tmap(lambda l: jnp.swapaxes(l, -1, -2), a)
    a = fwd_phase2(a, ops, w_rep, w_con_rep, q, n1, n2, 0, n1, group=group,
                   strict=strict, row_tabs=row_tabs)
    if not keep_transposed:
        a = tmap(lambda l: jnp.swapaxes(l, -1, -2), a)
    return tmap(lambda l: l.reshape(lead + (n,)), a)


# ---------------------------------------------------------------------------
# two-level (recursive) six-step -- the huge-N single-chip path
# ---------------------------------------------------------------------------
#
# N = N1*N2 with BOTH level transforms full negacyclic NTTs of the global
# table's prefix roots (w[1:Ni] is the size-Ni table, docs/DESIGN.md item
# 2), glued by the factored twist of twiddles.twist_tables_rec: every
# materialized working set stays in the measured fast regime (N <= 2^12
# per level transform at N = 2^24) instead of the flat six-step's
# pathological (2^8, 2^16) phase shapes.  This is the TPU form of HEXL's
# depth-first recursion (third_party/hexl/fwd-ntt-avx512.c:310-328).


def rec_split(logn: int) -> int:
    """Outer split for the two-level path: balanced, so each level
    transform is a size-2^(logn/2) six-step in its measured regime."""
    return logn // 2


def _twist_mul(a, ops, tw, q: int, n1: int, lead):
    """Elementwise multiply by the factored twist: a is (..., N1, N2) and
    tw = (A, Ac, B, Bc) reps shaped (N1, HI, 1) / (N1, 1, LO).  Inputs
    < 4q, output < 2q (two chained Shoup constant-multiplies)."""
    tw_a, tw_ac, tw_b, tw_bc = tw
    hi = tw_a[0].shape[-2]
    lo = tw_b[0].shape[-1]
    v = tmap(lambda l: l.reshape(lead + (n1, hi, lo)), a)
    v = ops.shoup_mul(tw_a, tw_ac, v, q)
    v = ops.shoup_mul(tw_b, tw_bc, v, q)
    return tmap(lambda l: l.reshape(lead + (n1, hi * lo)), v)


def fwd_rec(a_rep, ops, w1, w1c, w2, w2c, tw, q: int, l1_log: int,
            strict: bool = True, group: int | None = None):
    """Forward NTT via the two-level six-step.  w1/w1c: size-N1 tables
    (root psi^N2 = the global prefix), w2/w2c: size-N2 tables (root
    psi^N1), tw: factored forward twist reps.  Bit-exact with the flat
    kernel (strict) -- the level transforms run lazy (< 4q) and the twist
    keeps < 2q, so no extra reductions are spent between levels."""
    n = a_rep[0].shape[-1]
    n1 = 1 << l1_log
    n2 = n >> l1_log
    lead = a_rep[0].shape[:-1]
    # columns: size-N1 NTTs along the N1 axis, vectorized over N2 lanes
    a = tmap(
        lambda l: jnp.swapaxes(l.reshape(lead + (n1, n2)), -1, -2), a_rep
    )
    a = fwd_sixstep(a, ops, w1, w1c, q, strict=False, group=group)
    a = tmap(lambda l: jnp.swapaxes(l, -1, -2), a)  # (..., N1, N2) [k1, n2]
    a = _twist_mul(a, ops, tw, q, n1, lead)
    # rows: plain size-N2 NTTs of the twisted rows
    a = fwd_sixstep(a, ops, w2, w2c, q, strict=strict, group=group)
    return tmap(lambda l: l.reshape(lead + (n,)), a)


def inv_rec(a_rep, ops, wi1, wi1c, wi2, wi2c, tw_inv,
            ninv1: tuple, ninv2: tuple, q: int, l1_log: int,
            group: int | None = None):
    """Inverse of fwd_rec (strict output).  ninv1/ninv2 are the per-level
    (n_inv_op, n_inv_con, final_tmp, final_con) fused-final constants --
    the two levels' 1/N1 and 1/N2 scalings compose to the full 1/N.  The
    un-twist tables tw_inv come from the INVERSE root (gamma_c^{-n2})."""
    n = a_rep[0].shape[-1]
    n1 = 1 << l1_log
    n2 = n >> l1_log
    lead = a_rep[0].shape[:-1]
    a = tmap(lambda l: l.reshape(lead + (n1, n2)), a_rep)  # [k1, k2]
    a = inv_sixstep(a, ops, wi2, wi2c, *ninv2, q, group=group)  # [k1, n2]
    a = _twist_mul(a, ops, tw_inv, q, n1, lead)
    a = tmap(lambda l: jnp.swapaxes(l, -1, -2), a)  # (..., N2, N1)
    a = inv_sixstep(a, ops, wi1, wi1c, *ninv1, q, group=group)  # [n2, n1]
    return tmap(
        lambda l: jnp.swapaxes(l, -1, -2).reshape(lead + (n,)), a
    )


def fix_transposed_order(a, n1_log: int):
    """Undo the keep_transposed layout: the analog of fix_a_order
    (tests/test_correctness.c:179-209) for this framework's documented
    layout descriptor."""
    n = a.shape[-1]
    logn = n.bit_length() - 1
    n1, n2 = 1 << n1_log, 1 << (logn - n1_log)
    lead = a.shape[:-1]
    return a.reshape(lead + (n2, n1)).swapaxes(-1, -2).reshape(lead + (n,))


def inv_sixstep(a_rep, ops, w_rep, w_con_rep, n_inv_op: int, n_inv_con: int,
                final_tmp: int, final_con: int, q: int,
                n1_log: int | None = None, input_transposed: bool = False,
                group: int | None = None, row_tabs=None, col_tabs=None):
    """Inverse NTT via six-step (strict output).  final_tmp/final_con are
    the host-precomputed fused constants for the last stage (see
    kernels/radix2._final_mulop).  With input_transposed, the input is in
    the keep_transposed layout of fwd_sixstep -- the first transpose is
    skipped, so an unordered fwd -> pointwise -> inv chain never
    materializes standard order (the payoff of the unordered contract)."""
    n = a_rep[0].shape[-1]
    logn = n.bit_length() - 1
    if n1_log is None:
        n1_log = default_split(n, nlimb=ops.nlimb)
    if group is None:
        group = default_group(ops.nlimb)
    n1, n2 = 1 << n1_log, 1 << (logn - n1_log)
    lead = a_rep[0].shape[:-1]

    if input_transposed:
        a = tmap(lambda l: l.reshape(lead + (n2, n1)), a_rep)
    else:
        a = tmap(lambda l: l.reshape(lead + (n1, n2)), a_rep)
        a = tmap(lambda l: jnp.swapaxes(l, -1, -2), a)
    a = inv_phaseA(a, ops, w_rep, w_con_rep, q, n1, n2, 0, n1, group=group,
                   row_tabs=row_tabs)
    a = tmap(lambda l: jnp.swapaxes(l, -1, -2), a)
    a = inv_phaseB(
        a, ops, w_rep, w_con_rep, n_inv_op, n_inv_con, final_tmp, final_con,
        q, n1, n2, group=group, col_tabs=col_tabs,
    )
    return tmap(lambda l: l.reshape(lead + (n,)), a)
