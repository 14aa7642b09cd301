"""jnp radix-4 NTT kernels (forward + inverse), u64-pair and u32 paths.

TPU-native re-design of the reference's scalar radix-4 kernels
(src/ntt_radix4.c:27-114): each radix-4 stage processes the whole array as
an (..., m, 4, t) view with the 5-twiddle butterfly
(fast_mul_operators.h:108-149) vectorized across all groups; twiddle
quintuples are gathered from the expanded 2N table (twiddles.expand_w)
with trace-time-constant index vectors, so XLA lowers them to static
gathers fused into the stage.

Halving the stage count halves HBM round-trips versus radix-2 -- the same
reason the reference prefers radix-4 on CPUs.  Odd log2(N) is handled by
a final (forward) / leading (inverse) radix-2 sweep, exactly like
src/ntt_radix4.c:52-61 and :83-94.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ntt_tpu import modmath as mm

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _quint_indices(m: int) -> np.ndarray:
    """(5, m) trace-time-constant indices of the twiddle quintuples for a
    radix-4 stage with m groups (analog of collect_roots,
    src/ntt_radix4.c:7-25)."""
    j = np.arange(m)
    m1 = 2 * (m + j)
    return np.stack([m1, 2 * m1, 2 * m1 + 1, 2 * m1 + 2, 2 * m1 + 3])


def _gather_pair(tab: mm.U64Pair, idx: np.ndarray, shape):
    return tab[0][idx].reshape(shape), tab[1][idx].reshape(shape)


def _split4(arr, m: int, t: int):
    lead = arr.shape[:-1]
    v = arr.reshape(lead + (m, 4, t))
    return tuple(v[..., k, :] for k in range(4))


def _join4(parts, lead, n):
    return jnp.stack(parts, axis=-2).reshape(lead + (n,))


# ---------------------------------------------------------------------------
# u64 limb-pair butterflies (bit-exact with fast_mul_operators.h:108-149)
# ---------------------------------------------------------------------------


def _r4_fwd_bfly_u64(x, y, z, t, w5, q: int,
                     mul=mm.shoup_mul_q2, dbl=mm.shoup_dbl_mul_q2):
    q2 = mm.const_u64(2 * q)
    q4 = mm.const_u64(4 * q)
    (w0, c0), (w1, c1), (w2, c2), (w3, c3), (w4, c4) = w5
    y1 = dbl(w1, c1, w2, c2, y, t, q)
    y2 = dbl(w3, c3, w4, c4, y, t, q)
    t1 = mm.reduce_8q_to_4q(x, q)
    t2 = mul(w0, c0, z, q)
    s = mm.add64(t1, t2)  # T1 + T2
    d = mm.sub64(t1, t2)  # T1 - T2 (wrapping; rebalanced below)
    nx = mm.add64(s, y1)
    ny = mm.sub64(mm.add64(s, q2), y1)
    nz = mm.add64(mm.add64(d, q2), y2)
    nt = mm.sub64(mm.add64(d, q4), y2)
    return nx, ny, nz, nt


def _r4_inv_bfly_u64(x, y, z, t, w5, q: int,
                     mul=mm.shoup_mul_q2, dbl=mm.shoup_dbl_mul_q2):
    q4 = mm.const_u64(4 * q)
    (w0, c0), (w1, c1), (w2, c2), (w3, c3), (w4, c4) = w5
    t0 = mm.add64(z, t)
    t1 = mm.add64(x, y)
    t2 = mm.sub64(mm.add64(x, q4), y)
    t3 = mm.sub64(mm.add64(z, q4), t)
    nx = mm.reduce_8q_to_2q(mm.add64(t1, t0), q)
    nz = mm.reduce_2q_to_q(mul(w0, c0, mm.sub64(mm.add64(t1, q4), t0), q), q)
    ny = dbl(w1, c1, w3, c3, t2, t3, q)
    nt = dbl(w2, c2, w4, c4, t2, t3, q)
    return nx, ny, nz, nt


# ---------------------------------------------------------------------------
# u64 kernels
# ---------------------------------------------------------------------------


def fwd_lazy_u64(a: mm.U64Pair, w: mm.U64Pair, w_con: mm.U64Pair, q: int,
                 mul=mm.shoup_mul_q2, dbl=mm.shoup_dbl_mul_q2):
    """Radix-4 forward lazy; w/w_con are expanded 2N tables.  Output < 8q
    (even log2 N) or < 4q (odd, final radix-2 sweep).  mul/dbl select the
    Shoup word size (64-bit default; 56-bit for the VMSL-analog path)."""
    alo, ahi = a
    n = alo.shape[-1]
    lead = alo.shape[:-1]
    logn = n.bit_length() - 1
    even = logn % 2 == 0
    bound = n if even else n >> 1
    m, t = 1, n >> 2
    while m < bound:
        xs = _split4(alo, m, t)
        hs = _split4(ahi, m, t)
        idx = _quint_indices(m)
        w5 = [
            (
                _gather_pair(w, idx[k], (m, 1)),
                _gather_pair(w_con, idx[k], (m, 1)),
            )
            for k in range(5)
        ]
        outs = _r4_fwd_bfly_u64(
            (xs[0], hs[0]), (xs[1], hs[1]), (xs[2], hs[2]), (xs[3], hs[3]),
            w5, q, mul=mul, dbl=dbl,
        )
        alo = _join4([o[0] for o in outs], lead, n)
        ahi = _join4([o[1] for o in outs], lead, n)
        m <<= 2
        t >>= 2
    if not even:
        # final radix-2 sweep with 8q->4q pre-reduction on X
        # (src/ntt_radix4.c:52-61)
        v_lo = alo.reshape(lead + (n >> 1, 2))
        v_hi = ahi.reshape(lead + (n >> 1, 2))
        i = np.arange(0, n, 2)
        wo = _gather_pair(w, n + i, (n >> 1,))
        wc = _gather_pair(w_con, n + i, (n >> 1,))
        x = mm.reduce_8q_to_4q((v_lo[..., 0], v_hi[..., 0]), q)
        y = (v_lo[..., 1], v_hi[..., 1])
        x1 = mm.reduce_4q_to_2q(x, q)
        tt = mul(wo, wc, y, q)
        q2 = mm.const_u64(2 * q)
        nx = mm.add64(x1, tt)
        ny = mm.sub64(mm.add64(x1, q2), tt)
        alo = jnp.stack([nx[0], ny[0]], axis=-1).reshape(lead + (n,))
        ahi = jnp.stack([nx[1], ny[1]], axis=-1).reshape(lead + (n,))
    return alo, ahi


def fwd_u64(a, w, w_con, q: int):
    """Strict wrapper: reduce 8q -> q (include/ntt_radix4.h:16-28)."""
    return mm.reduce_8q_to_q(fwd_lazy_u64(a, w, w_con, q), q)


def fwd_lazy_w56(a, w, w_con56, q: int):
    """Radix-4 forward at Shoup word size 56 -- the TPU analog of the
    s390x VMSL intrinsic kernel (src/ntt_radix4_s390x_vef.c:127-175): the
    same five-twiddle dataflow over the 2N expanded table, but every
    quotient comes from 56-bit preconditioned constants
    (twiddles.calc_w_con(word_size=56)) shifted out of the 112-bit
    accumulator, exactly as VMSL's HIGH_VMSL_WORD.  Needs q < 2^52
    (mm.W56_PATH_MAX_Q_BITS): lazy 8q inputs keep t1 + t2 <= 2^56."""
    return fwd_lazy_u64(a, w, w_con56, q,
                        mul=mm.shoup_mul56_q2, dbl=mm.shoup_dbl_mul56_q2)


def fwd_w56(a, w, w_con56, q: int):
    return mm.reduce_8q_to_q(fwd_lazy_w56(a, w, w_con56, q), q)


def inv_w56(a, w, w_con56, n_inv_op: int, n_inv_con56: int, q: int):
    """Inverse of fwd_w56 (src/ntt_radix4_s390x_vef.c:178-246); the final
    n_inv scaling uses the word-size-56 constant (test_cases.h:254)."""
    return inv_u64(a, w, w_con56, n_inv_op, n_inv_con56, q,
                   mul=mm.shoup_mul56_q2, dbl=mm.shoup_dbl_mul56_q2)


def inv_u64(a: mm.U64Pair, w: mm.U64Pair, w_con: mm.U64Pair,
            n_inv_op: int, n_inv_con: int, q: int,
            mul=mm.shoup_mul_q2, dbl=mm.shoup_dbl_mul_q2):
    """Radix-4 inverse (src/ntt_radix4.c:64-114); strict output."""
    alo, ahi = a
    n = alo.shape[-1]
    lead = alo.shape[:-1]
    logn = n.bit_length() - 1
    m, t = n, 1
    if logn % 2 == 0:
        pair = mm.reduce_8q_to_2q((alo, ahi), q)
        alo, ahi = pair
    else:
        v_lo = alo.reshape(lead + (n >> 1, 2))
        v_hi = ahi.reshape(lead + (n >> 1, 2))
        i = np.arange(0, n, 2)
        wo = _gather_pair(w, n + i, (n >> 1,))
        wc = _gather_pair(w_con, n + i, (n >> 1,))
        x = mm.reduce_8q_to_4q((v_lo[..., 0], v_hi[..., 0]), q)
        y = (v_lo[..., 1], v_hi[..., 1])
        x1 = mm.reduce_4q_to_2q(mm.add64(x, y), q)
        q2 = mm.const_u64(2 * q)
        tt = mm.sub64(mm.add64(x, q2), y)
        ny = mul(wo, wc, tt, q)
        alo = jnp.stack([x1[0], ny[0]], axis=-1).reshape(lead + (n,))
        ahi = jnp.stack([x1[1], ny[1]], axis=-1).reshape(lead + (n,))
        m >>= 1
        t <<= 1
    m >>= 2
    while m > 0:
        xs = _split4(alo, m, t)
        hs = _split4(ahi, m, t)
        idx = _quint_indices(m)
        w5 = [
            (
                _gather_pair(w, idx[k], (m, 1)),
                _gather_pair(w_con, idx[k], (m, 1)),
            )
            for k in range(5)
        ]
        outs = _r4_inv_bfly_u64(
            (xs[0], hs[0]), (xs[1], hs[1]), (xs[2], hs[2]), (xs[3], hs[3]),
            w5, q, mul=mul, dbl=dbl,
        )
        alo = _join4([o[0] for o in outs], lead, n)
        ahi = _join4([o[1] for o in outs], lead, n)
        m >>= 2
        t <<= 2
    ninv = mm.const_u64(n_inv_op)
    ninv_c = mm.const_u64(n_inv_con)
    return mm.reduce_2q_to_q(mul(ninv, ninv_c, (alo, ahi), q), q)


# ---------------------------------------------------------------------------
# Vector-layout radix-4 kernel: consumes the 5N expand_w_r4 table
# (src/ntt_radix4_avx512_ifma.c:132-193 + pre_compute.h:154-251)
# ---------------------------------------------------------------------------
#
# The IFMA kernel's stage plan: a LEADING radix-2 stage when log2 N is odd
# (:146-162), then radix-4 stages whose quintuples are walked off the 5N
# expanded table in emission order -- FWD8 flat quintuple runs (t >= 8),
# the FWD4 10-entry two-pair groups (t == 4), and the FWD1 5x8-lane blocks
# (t == 1), optionally lane-permuted for the unordered variant whose
# outputs stay in the permuted group order (fix_a_order's job,
# tests/test_correctness.c:179-209 -> layouts.radix4_vec_unordered).


def _r4_vec_offsets(n: int) -> dict:
    """Per-stage (region kind, table offset) map of expand_w_r4's emission
    (mirrors twiddles.expand_w_r4; requires n >= 256)."""
    logn = n.bit_length() - 1
    even = logn % 2 == 0
    out = {}
    if even:
        idx, m, w_idx = 1, 1, 1
    else:
        idx, m, w_idx = 2, 2, 2  # out[1] = leading radix-2 twiddle
    while w_idx < (n >> 5):
        out[m] = ("fwd8", idx)
        idx += 5 * m
        w_idx = 4 * m
        m <<= 2
    out[m] = ("fwd4", idx)
    idx += 5 * m
    idx = ((idx >> 3) << 3) + 8
    m <<= 2
    out[m] = ("fwd1", idx)
    return out


def _r4_vec_w5(tab, tab_con, kind: str, idx0: int, m: int):
    """The five (m, 1) twiddle columns of one stage, read from the 5N
    table's region in its native layout."""

    def cols(arr):
        if kind == "fwd8":
            v = arr[idx0 : idx0 + 5 * m].reshape(m, 5)
            return [v[:, k].reshape(m, 1) for k in range(5)]
        if kind == "fwd4":
            v = arr[idx0 : idx0 + 5 * m].reshape(m // 2, 5, 2)
            return [v[:, k, :].reshape(m, 1) for k in range(5)]
        v = arr[idx0 : idx0 + 5 * m].reshape(m // 8, 5, 8)
        return [v[:, k, :].reshape(m, 1) for k in range(5)]

    wo = [cols(tab[0]), cols(tab[1])]
    wc = [cols(tab_con[0]), cols(tab_con[1])]
    return [
        (
            ((wo[0][k], wo[1][k])),
            ((wc[0][k], wc[1][k])),
        )
        for k in range(5)
    ]


from ntt_tpu.twiddles import LANE_PERM as _VEC_LANE_PERM  # noqa: E402

_VEC_LANE_UNPERM = np.argsort(_VEC_LANE_PERM)  # slot_of: position of group g


def fwd_vec_lazy_u64(a: mm.U64Pair, tab: mm.U64Pair, tab_con: mm.U64Pair,
                     q: int, unordered: bool = False):
    """Forward lazy radix-4 over the 5N vec table; output < 8q.  With
    unordered, the t == 1 stage processes its groups in the table's
    permuted lane order and stores linearly (the unordered contract)."""
    alo, ahi = a
    n = alo.shape[-1]
    lead = alo.shape[:-1]
    logn = n.bit_length() - 1
    assert n >= 256, "radix4-vec needs n >= 256 (FWD8/FWD4/FWD1 regions)"
    even = logn % 2 == 0
    if not even:
        # leading radix-2 stage (m = 1): pairs (i, i + n/2), twiddle tab[1]
        h = n >> 1
        x = (alo[..., :h], ahi[..., :h])
        y = (alo[..., h:], ahi[..., h:])
        wo = (tab[0][1:2], tab[1][1:2])
        wc = (tab_con[0][1:2], tab_con[1][1:2])
        x1 = mm.reduce_4q_to_2q(x, q)
        tt = mm.shoup_mul_q2(wo, wc, y, q)
        q2 = mm.const_u64(2 * q)
        nx = mm.add64(x1, tt)
        ny = mm.sub64(mm.add64(x1, q2), tt)
        alo = jnp.concatenate([nx[0], ny[0]], axis=-1)
        ahi = jnp.concatenate([nx[1], ny[1]], axis=-1)
        m, t = 2, n >> 3
    else:
        m, t = 1, n >> 2
    offsets = _r4_vec_offsets(n)
    while m <= n >> 2:
        kind, idx0 = offsets[m]
        w5 = _r4_vec_w5(tab, tab_con, kind, idx0, m)
        if kind == "fwd1" and unordered:
            # process groups in the table's permuted order; outputs land
            # linearly -> the documented unordered layout
            def permute_groups(arr):
                v = arr.reshape(lead + (m // 8, 8, 4))
                return v[..., _VEC_LANE_PERM, :].reshape(lead + (n,))

            alo = permute_groups(alo)
            ahi = permute_groups(ahi)
        xs = _split4(alo, m, t)
        hs = _split4(ahi, m, t)
        outs = _r4_fwd_bfly_u64(
            (xs[0], hs[0]), (xs[1], hs[1]), (xs[2], hs[2]), (xs[3], hs[3]),
            w5, q,
        )
        alo = _join4([o[0] for o in outs], lead, n)
        ahi = _join4([o[1] for o in outs], lead, n)
        m <<= 2
        t >>= 2
    return alo, ahi


def fwd_vec_u64(a, tab, tab_con, q: int, unordered: bool = False):
    """Strict wrapper (final_reduce_q8, include/ntt_avx512_ifma.h:21-38)."""
    return mm.reduce_8q_to_q(fwd_vec_lazy_u64(a, tab, tab_con, q, unordered), q)


def inv_vec_u64(a: mm.U64Pair, tab: mm.U64Pair, tab_con: mm.U64Pair,
                n_inv_op: int, n_inv_con: int, q: int,
                unordered: bool = False):
    """Inverse radix-4 consuming the 5N vec table's regions in REVERSE
    emission order -- the layout-native inverse the reference never shipped
    (its IFMA variants are forward-only; blueprint: the scalar inverse
    src/ntt_radix4.c:64-114 + the region map _r4_vec_offsets).

    ``tab``/``tab_con`` are expand_w_r4 of the INVERSE root
    (plan.dev_r4_vec_inv_u64): the FWD1 region feeds the FIRST inverse
    stage, then FWD4, then the FWD8 runs walked backwards; for odd log2 N
    the forward's LEADING radix-2 stage is undone by a TRAILING
    Gentleman-Sande sweep with twiddle tab[1].  Accepts inputs < 8q (a
    lazy forward output); strict output with the trailing n_inv scale.

    With ``unordered``, the input is in the fwd_vec unordered layout
    (layouts.radix4_vec_unordered: per 8-group block, position j holds
    group LANE_PERM[j]) and ``tab`` must be the unordered expand of the
    inverse root (plan.dev_r4_vec_inv_unord_u64, FWD1 region
    lane-permuted identically): the first stage butterflies the groups
    where they sit -- position j's twiddle lane IS group LANE_PERM[j]'s
    quintuple -- then one block-local un-permute restores standard order
    for the remaining stages.  The chain fwd(unordered) -> pointwise ->
    this inverse never materializes standard order (the unordered
    contract's payoff; the reference fixes order externally instead,
    fix_a_order, tests/test_correctness.c:179-209)."""
    alo, ahi = a
    n = alo.shape[-1]
    lead = alo.shape[:-1]
    logn = n.bit_length() - 1
    even = logn % 2 == 0
    offsets = _r4_vec_offsets(n)
    alo, ahi = mm.reduce_8q_to_2q((alo, ahi), q)
    for m in sorted(offsets, reverse=True):
        kind, idx0 = offsets[m]
        t = n // (4 * m)
        w5 = _r4_vec_w5(tab, tab_con, kind, idx0, m)
        xs = _split4(alo, m, t)
        hs = _split4(ahi, m, t)
        outs = _r4_inv_bfly_u64(
            (xs[0], hs[0]), (xs[1], hs[1]), (xs[2], hs[2]), (xs[3], hs[3]),
            w5, q,
        )
        alo = _join4([o[0] for o in outs], lead, n)
        ahi = _join4([o[1] for o in outs], lead, n)
        if kind == "fwd1" and unordered:
            # un-permute the block-local group order: standard group g's
            # outputs sit at block position slot_of[g] (argsort LANE_PERM)
            def unpermute(arr):
                v = arr.reshape(lead + (m // 8, 8, 4))
                return v[..., _VEC_LANE_UNPERM, :].reshape(lead + (n,))

            alo, ahi = unpermute(alo), unpermute(ahi)
    if not even:
        # trailing radix-2: undo the forward's leading (i, i + n/2) stage
        h = n >> 1
        x = (alo[..., :h], ahi[..., :h])
        y = (alo[..., h:], ahi[..., h:])
        wo = (tab[0][1:2], tab[1][1:2])
        wc = (tab_con[0][1:2], tab_con[1][1:2])
        q2 = mm.const_u64(2 * q)
        nx = mm.reduce_4q_to_2q(mm.add64(x, y), q)
        ny = mm.shoup_mul_q2(wo, wc, mm.sub64(mm.add64(x, q2), y), q)
        alo = jnp.concatenate([nx[0], ny[0]], axis=-1)
        ahi = jnp.concatenate([nx[1], ny[1]], axis=-1)
    ninv = mm.const_u64(n_inv_op)
    ninv_c = mm.const_u64(n_inv_con)
    return mm.shoup_mul_q(ninv, ninv_c, (alo, ahi), q)


# ---------------------------------------------------------------------------
# u32 path (q < 2^28: dual-Shoup needs t1+t2 < 16q <= 2^32; word_size=32)
# ---------------------------------------------------------------------------


def _shoup_dbl32_q2(w1, c1, w2, c2, t1, t2, q: int):
    """Fused dual Shoup multiply on u32 lanes; Q's 2^32 wrap is harmless
    (only Q mod 2^32 reaches Q*q mod 2^32)."""
    l1, h1 = mm.mul32_full(c1, t1)
    l2, h2 = mm.mul32_full(c2, t2)
    lo = l1 + l2
    carry = (lo < l1).astype(jnp.uint32)
    big_q = h1 + h2 + carry
    return w1 * t1 + w2 * t2 - big_q * np.uint32(q)


def _r4_fwd_bfly_u32(x, y, z, t, w5, q: int):
    q2 = np.uint32(2 * q)
    q4 = np.uint32(4 * q)
    (w0, c0), (w1, c1), (w2, c2), (w3, c3), (w4, c4) = w5
    y1 = _shoup_dbl32_q2(w1, c1, w2, c2, y, t, q)
    y2 = _shoup_dbl32_q2(w3, c3, w4, c4, y, t, q)
    t1 = mm.cond_sub32(x, 4 * q)
    t2 = mm.shoup_mul32_q2(w0, c0, z, q)
    return (
        t1 + t2 + y1,
        t1 + t2 + q2 - y1,
        t1 - t2 + y2 + q2,
        t1 - t2 + q4 - y2,
    )


def _r4_inv_bfly_u32(x, y, z, t, w5, q: int):
    q4 = np.uint32(4 * q)
    (w0, c0), (w1, c1), (w2, c2), (w3, c3), (w4, c4) = w5
    t0 = z + t
    t1 = x + y
    t2 = q4 + x - y
    t3 = q4 + z - t
    nx = mm.cond_sub32(mm.cond_sub32(t1 + t0, 4 * q), 2 * q)
    nz = mm.cond_sub32(mm.shoup_mul32_q2(w0, c0, q4 + t1 - t0, q), q)
    ny = _shoup_dbl32_q2(w1, c1, w3, c3, t2, t3, q)
    nt = _shoup_dbl32_q2(w2, c2, w4, c4, t2, t3, q)
    return nx, ny, nz, nt


def fwd_lazy_u32(a, w, w_con, q: int):
    n = a.shape[-1]
    lead = a.shape[:-1]
    logn = n.bit_length() - 1
    even = logn % 2 == 0
    bound = n if even else n >> 1
    m, t = 1, n >> 2
    while m < bound:
        xs = _split4(a, m, t)
        idx = _quint_indices(m)
        w5 = [(w[idx[k]].reshape(m, 1), w_con[idx[k]].reshape(m, 1)) for k in range(5)]
        outs = _r4_fwd_bfly_u32(*xs, w5, q)
        a = _join4(list(outs), lead, n)
        m <<= 2
        t >>= 2
    if not even:
        v = a.reshape(lead + (n >> 1, 2))
        i = np.arange(0, n, 2)
        wo = w[n + i]
        wc = w_con[n + i]
        x = mm.cond_sub32(v[..., 0], 4 * q)
        x1 = mm.cond_sub32(x, 2 * q)
        tt = mm.shoup_mul32_q2(wo, wc, v[..., 1], q)
        q2 = np.uint32(2 * q)
        a = jnp.stack([x1 + tt, x1 + q2 - tt], axis=-1).reshape(lead + (n,))
    return a


def fwd_u32(a, w, w_con, q: int):
    return mm.reduce32(fwd_lazy_u32(a, w, w_con, q), q, 8)


def inv_u32(a, w, w_con, n_inv_op: int, n_inv_con: int, q: int):
    n = a.shape[-1]
    lead = a.shape[:-1]
    logn = n.bit_length() - 1
    m, t = n, 1
    if logn % 2 == 0:
        # reduce_8q_to_2q before the radix-4 sweeps (src/ntt_radix4.c:78-81)
        a = mm.cond_sub32(mm.cond_sub32(a, 4 * q), 2 * q)
    else:
        v = a.reshape(lead + (n >> 1, 2))
        i = np.arange(0, n, 2)
        wo = w[n + i]
        wc = w_con[n + i]
        x = mm.cond_sub32(v[..., 0], 4 * q)
        y = v[..., 1]
        x1 = mm.cond_sub32(x + y, 2 * q)
        tt = x + np.uint32(2 * q) - y
        ny = mm.shoup_mul32_q2(wo, wc, tt, q)
        a = jnp.stack([x1, ny], axis=-1).reshape(lead + (n,))
        m >>= 1
        t <<= 1
    m >>= 2
    while m > 0:
        xs = _split4(a, m, t)
        idx = _quint_indices(m)
        w5 = [(w[idx[k]].reshape(m, 1), w_con[idx[k]].reshape(m, 1)) for k in range(5)]
        outs = _r4_inv_bfly_u32(*xs, w5, q)
        a = _join4(list(outs), lead, n)
        m >>= 2
        t <<= 2
    return mm.cond_sub32(
        mm.shoup_mul32_q2(np.uint32(n_inv_op), np.uint32(n_inv_con), a, q), q
    )
