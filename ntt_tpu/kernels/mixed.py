"""Mixed-radix NTT kernels: radix-4 bulk stages + radix-2 tail (r4r2).

TPU-native counterpart of the reference's best x86 shape
(src/ntt_r4r2_avx512_ifma.c:141-172): radix-4 five-twiddle sweeps while
the butterfly span is large, then the last four (even log2 N) or three
(odd) stages as radix-2 Harvey sweeps -- the part the reference fuses
in-register (fwd16_r2/_fwd8_r2, :9-99) and XLA fuses per stage here (the
full-fusion analog is kernels/pallas_fused.py).  Output bound 4q, strict
via a 4q->q sweep (final_reduce_q4, include/ntt_avx512_ifma.h:40-54).

The reference ships r4r2 forward-only; the inverse here is new scope
(BASELINE.md requires fwd+inv for every variant), built by reversing the
stage plan: radix-2 backward sweeps for the tail stages, then radix-4
inverse sweeps, then the n_inv normalize (blueprint: src/ntt_radix4.c:64-114).

Twiddle access is TPU-native: the radix-4 sweeps read quintuples from the
expand_w 2N table via trace-time-constant gathers and the radix-2 tail
reads contiguous w[m:2m] slices of the plain bit-reversed table -- the
duplicated/interleaved expand_w_r4r2 memory layout (pre_compute.h:253-324)
exists for 512-bit vector loads and is kept only for plan parity.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ntt_tpu import modmath as mm
from ntt_tpu.kernels import radix4 as r4
from ntt_tpu.kernels.radix2 import _join, _split


def _stage_plan(logn: int) -> tuple[int, int]:
    """(k, r): k radix-4 sweeps then r radix-2 tail stages (r in {3, 4},
    matching the reference's fwd16_r2 / fwd8_r2 split; all-radix-2 when N
    is too small for any radix-4 sweep)."""
    r = 4 if logn % 2 == 0 else 3
    k = (logn - r) // 2
    if k < 0:
        return 0, logn
    return k, r


# ---------------------------------------------------------------------------
# u64 limb-pair path
# ---------------------------------------------------------------------------


def _r2_fwd_stage_u64(a, w, w_con, m: int, t: int, q: int):
    wo = (w[0][m : 2 * m].reshape(m, 1), w[1][m : 2 * m].reshape(m, 1))
    wc = (w_con[0][m : 2 * m].reshape(m, 1), w_con[1][m : 2 * m].reshape(m, 1))
    return _fwd_stage_tw_u64(a, wo, wc, m, t, q)


def _r4_fwd_sweep_u64(a, w4, w4_con, m: int, t: int, q: int):
    alo, ahi = a
    lead = alo.shape[:-1]
    n = alo.shape[-1]
    xs = r4._split4(alo, m, t)
    hs = r4._split4(ahi, m, t)
    idx = r4._quint_indices(m)
    w5 = [
        (r4._gather_pair(w4, idx[k], (m, 1)), r4._gather_pair(w4_con, idx[k], (m, 1)))
        for k in range(5)
    ]
    outs = r4._r4_fwd_bfly_u64(
        (xs[0], hs[0]), (xs[1], hs[1]), (xs[2], hs[2]), (xs[3], hs[3]), w5, q
    )
    return (
        r4._join4([o[0] for o in outs], lead, n),
        r4._join4([o[1] for o in outs], lead, n),
    )


def fwd_lazy_u64(a, w, w_con, w4, w4_con, q: int):
    """r4r2 forward, lazy output < 4q.  w/w_con: plain bit-reversed table;
    w4/w4_con: expand_w 2N table."""
    n = a[0].shape[-1]
    logn = n.bit_length() - 1
    k, r = _stage_plan(logn)
    m, t = 1, n >> 2
    for _ in range(k):
        a = _r4_fwd_sweep_u64(a, w4, w4_con, m, t, q)
        m <<= 2
        t >>= 2
    if k:
        a = mm.reduce_8q_to_4q(a, q)
    m, t = 1 << (2 * k), n >> (2 * k + 1)
    for _ in range(r):
        a = _r2_fwd_stage_u64(a, w, w_con, m, t, q)
        m <<= 1
        t >>= 1
    return a


def fwd_u64(a, w, w_con, w4, w4_con, q: int):
    return mm.reduce_4q_to_q(fwd_lazy_u64(a, w, w_con, w4, w4_con, q), q)


# ---------------------------------------------------------------------------
# 5N-table consumer: the expand_w_r4r2 layout (pre_compute.h:253-324)
# ---------------------------------------------------------------------------
#
# The reference's r4r2 kernel walks ONE expanded table: flat quintuple runs
# for the radix-4 sweeps, then duplicated/interleaved segments for the
# fused radix-2 tail.  This forward consumes that exact layout: quintuples
# as contiguous (m, 5) views, the tail's x4-duplicated segment as the
# pre-broadcast (m, 4) stage view, and the FwdT2/FwdT1 segments through
# the documented inverses of their lane interleaves (as in
# kernels/radix2._r2_16_tw_view).

from ntt_tpu.kernels.radix2 import _R2_16_T1_INV as _T1_INV  # noqa: E402
from ntt_tpu.kernels.radix2 import _R2_16_T2_INV as _T2_INV  # noqa: E402
from ntt_tpu.kernels.radix2 import _fwd_stage_tw_u64  # noqa: E402


def _r4r2_offsets(n: int) -> dict:
    """Region offsets of expand_w_r4r2's emission (requires n >= 128)."""
    logn = n.bit_length() - 1
    even = logn % 2 == 0
    out = {}
    idx, m, w_idx = 1, 1, 1
    t_lim = n >> 4
    while w_idx < t_lim:
        out[("r4", m)] = idx
        idx += 5 * m
        w_idx = 4 * m
        m <<= 2
    idx = ((idx >> 3) << 3) + 8
    if even:
        out[("r2", n >> 4)] = idx  # verbatim, t == 8 tail head
        idx += n >> 4
    out[("r2x4", n >> 3)] = idx  # x4-duplicated, t == 4
    idx += 4 * (n >> 3)
    out[("r2t2", n >> 2)] = idx  # FwdT2 pattern, t == 2
    idx += n >> 1
    out[("r2t1", n >> 1)] = idx  # FwdT1 interleave, t == 1
    return out


def _r4r2_tail_view(arr, kind: str, idx0: int, m: int):
    if kind == "r2":
        return arr[idx0 : idx0 + m].reshape(m, 1)
    if kind == "r2x4":
        return arr[idx0 : idx0 + 4 * m].reshape(m, 4)
    if kind == "r2t2":
        return arr[idx0 : idx0 + 2 * m].reshape(m // 4, 4, 2)[:, _T2_INV].reshape(m, 2)
    return arr[idx0 : idx0 + m].reshape(m // 8, 8)[:, _T1_INV].reshape(m, 1)


def fwd_tab_lazy_u64(a, tab, tab_con, q: int):
    """r4r2 forward over the 5N expand_w_r4r2 table; lazy output < 4q."""
    n = a[0].shape[-1]
    logn = n.bit_length() - 1
    assert n >= 128, "r4r2 table layout needs n >= 128"
    k, r = _stage_plan(logn)
    offs = _r4r2_offsets(n)
    lead = a[0].shape[:-1]
    m, t = 1, n >> 2
    for _ in range(k):
        idx0 = offs[("r4", m)]
        q5 = r4._r4_vec_w5(tab, tab_con, "fwd8", idx0, m)
        alo, ahi = a
        xs = r4._split4(alo, m, t)
        hs = r4._split4(ahi, m, t)
        outs = r4._r4_fwd_bfly_u64(
            (xs[0], hs[0]), (xs[1], hs[1]), (xs[2], hs[2]), (xs[3], hs[3]),
            q5, q,
        )
        a = (
            r4._join4([o[0] for o in outs], lead, n),
            r4._join4([o[1] for o in outs], lead, n),
        )
        m <<= 2
        t >>= 2
    if k:
        a = mm.reduce_8q_to_4q(a, q)
    m, t = 1 << (2 * k), n >> (2 * k + 1)
    kinds = (["r2"] if r == 4 else []) + ["r2x4", "r2t2", "r2t1"]
    for kind in kinds:
        idx0 = offs[(kind, m)]
        wo = (
            _r4r2_tail_view(tab[0], kind, idx0, m),
            _r4r2_tail_view(tab[1], kind, idx0, m),
        )
        wc = (
            _r4r2_tail_view(tab_con[0], kind, idx0, m),
            _r4r2_tail_view(tab_con[1], kind, idx0, m),
        )
        a = _fwd_stage_tw_u64(a, wo, wc, m, t, q)
        m <<= 1
        t >>= 1
    return a


def fwd_tab_u64(a, tab, tab_con, q: int):
    return mm.reduce_4q_to_q(fwd_tab_lazy_u64(a, tab, tab_con, q), q)


def _r2_bkw_stage_u64(a, w, w_con, m: int, t: int, q: int):
    alo, ahi = a
    xlo, ylo = _split(alo, m, t)
    xhi, yhi = _split(ahi, m, t)
    wo = (w[0][m : 2 * m].reshape(m, 1), w[1][m : 2 * m].reshape(m, 1))
    wc = (w_con[0][m : 2 * m].reshape(m, 1), w_con[1][m : 2 * m].reshape(m, 1))
    x = (xlo, xhi)
    y = (ylo, yhi)
    x1 = mm.reduce_4q_to_2q(mm.add64(x, y), q)
    q2 = mm.const_u64(2 * q)
    tt = mm.sub64(mm.add64(x, q2), y)
    ny = mm.shoup_mul_q2(wo, wc, tt, q)
    return _join(x1[0], ny[0]), _join(x1[1], ny[1])


def inv_u64(a, w, w_con, w4, w4_con, n_inv_op: int, n_inv_con: int, q: int):
    """r4r2 inverse (strict): radix-2 backward tail stages, radix-4 inverse
    sweeps, then the n_inv normalize."""
    n = a[0].shape[-1]
    lead = a[0].shape[:-1]
    logn = n.bit_length() - 1
    k, r = _stage_plan(logn)
    m, t = n >> 1, 1
    for _ in range(r):
        a = _r2_bkw_stage_u64(a, w, w_con, m, t, q)
        m >>= 1
        t <<= 1
    m = 1 << (2 * (k - 1)) if k else 0
    t = n >> (2 * k)
    while m > 0:
        alo, ahi = a
        xs = r4._split4(alo, m, t)
        hs = r4._split4(ahi, m, t)
        idx = r4._quint_indices(m)
        w5 = [
            (
                r4._gather_pair(w4, idx[kk], (m, 1)),
                r4._gather_pair(w4_con, idx[kk], (m, 1)),
            )
            for kk in range(5)
        ]
        outs = r4._r4_inv_bfly_u64(
            (xs[0], hs[0]), (xs[1], hs[1]), (xs[2], hs[2]), (xs[3], hs[3]), w5, q
        )
        a = (
            r4._join4([o[0] for o in outs], lead, n),
            r4._join4([o[1] for o in outs], lead, n),
        )
        m >>= 2
        t <<= 2
    ninv = mm.const_u64(n_inv_op)
    ninv_c = mm.const_u64(n_inv_con)
    return mm.shoup_mul_q(ninv, ninv_c, a, q)


# ---------------------------------------------------------------------------
# u32 single-lane path (q < 2^28, as for radix4-u32)
# ---------------------------------------------------------------------------


def _r2_fwd_stage_u32(a, w, w_con, m: int, t: int, q: int):
    x, y = _split(a, m, t)
    wo = w[m : 2 * m].reshape(m, 1)
    wc = w_con[m : 2 * m].reshape(m, 1)
    x1 = mm.cond_sub32(x, 2 * q)
    tt = mm.shoup_mul32_q2(wo, wc, y, q)
    return _join(x1 + tt, x1 + np.uint32(2 * q) - tt)


def fwd_lazy_u32(a, w, w_con, w4, w4_con, q: int):
    n = a.shape[-1]
    lead = a.shape[:-1]
    logn = n.bit_length() - 1
    k, r = _stage_plan(logn)
    m, t = 1, n >> 2
    for _ in range(k):
        xs = r4._split4(a, m, t)
        idx = r4._quint_indices(m)
        w5 = [(w4[idx[j]].reshape(m, 1), w4_con[idx[j]].reshape(m, 1)) for j in range(5)]
        outs = r4._r4_fwd_bfly_u32(*xs, w5, q)
        a = r4._join4(list(outs), lead, n)
        m <<= 2
        t >>= 2
    if k:
        a = mm.cond_sub32(a, 4 * q)
    m, t = 1 << (2 * k), n >> (2 * k + 1)
    for _ in range(r):
        a = _r2_fwd_stage_u32(a, w, w_con, m, t, q)
        m <<= 1
        t >>= 1
    return a


def fwd_u32(a, w, w_con, w4, w4_con, q: int):
    return mm.reduce32(fwd_lazy_u32(a, w, w_con, w4, w4_con, q), q, 4)


def inv_u32(a, w, w_con, w4, w4_con, n_inv_op: int, n_inv_con: int, q: int):
    n = a.shape[-1]
    lead = a.shape[:-1]
    logn = n.bit_length() - 1
    k, r = _stage_plan(logn)
    m, t = n >> 1, 1
    for _ in range(r):
        x, y = _split(a, m, t)
        wo = w[m : 2 * m].reshape(m, 1)
        wc = w_con[m : 2 * m].reshape(m, 1)
        x1 = mm.cond_sub32(x + y, 2 * q)
        tt = x + np.uint32(2 * q) - y
        a = _join(x1, mm.shoup_mul32_q2(wo, wc, tt, q))
        m >>= 1
        t <<= 1
    m = 1 << (2 * (k - 1)) if k else 0
    t = n >> (2 * k)
    while m > 0:
        xs = r4._split4(a, m, t)
        idx = r4._quint_indices(m)
        w5 = [(w4[idx[j]].reshape(m, 1), w4_con[idx[j]].reshape(m, 1)) for j in range(5)]
        outs = r4._r4_inv_bfly_u32(*xs, w5, q)
        a = r4._join4(list(outs), lead, n)
        m >>= 2
        t <<= 2
    return mm.cond_sub32(
        mm.shoup_mul32_q2(np.uint32(n_inv_op), np.uint32(n_inv_con), a, q), q
    )
