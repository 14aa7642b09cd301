"""Golden jnp radix-2 Harvey NTT kernels (forward + inverse).

TPU-native re-design of the reference's scalar radix-2 kernels
(src/ntt_reference.c:11-91): instead of a scalar loop nest, every stage
is ONE whole-array vectorized butterfly pass on an (..., m, 2, t) view --
the stage loop is unrolled at trace time (log2 N static stages), so XLA
sees static shapes and fuses each stage's elementwise chain into a single
VPU pass.  The leading batch dimensions generalize the reference's `_dbl`
dual-poly interleave (src/ntt_reference.c:71-91) to arbitrary batch.

Two data paths:
  * u64: coefficients as (lo, hi) uint32 limb pairs, word_size=64 Shoup
    constants -- bit-exact with the reference scalar kernels including
    lazy intermediate values.
  * u32: single uint32 lanes with word_size=32 Shoup constants, valid for
    q < 2^30 -- the TPU analog of the reference's 52-bit IFMA word-size
    reduction (defs.h:44-62); strict outputs are bit-exact, lazy
    representatives may differ by multiples of q (same contract as the
    reference's cross-word-size variants).

All functions are pure and jit/vmap/shard_map-compatible; q and shapes
are trace-time constants.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ntt_tpu import modmath as mm

# ---------------------------------------------------------------------------
# helpers: stage views
# ---------------------------------------------------------------------------


def _split(arr, m: int, t: int):
    lead = arr.shape[:-1]
    v = arr.reshape(lead + (m, 2, t))
    return v[..., 0, :], v[..., 1, :]


def _join(x, y):
    lead = x.shape[:-2]
    m, t = x.shape[-2], x.shape[-1]
    return jnp.stack([x, y], axis=-2).reshape(lead + (2 * m * t,))


def _final_mulop(n_inv_op: int, n_inv_con: int, w1: int, q: int, word_size: int):
    """Host-side scalar for the fused final inverse stage
    (src/ntt_reference.c:55-61): tmp = n_inv * w[1] (lazy, < 2q) and its
    Shoup constant, which may exceed the word size by one bit."""
    beta = 1 << word_size
    big_q = (n_inv_con * w1) >> word_size
    tmp = (n_inv_op * w1 - big_q * q) % beta
    con = (tmp << word_size) // q
    return tmp, con  # con < 2*beta


# ---------------------------------------------------------------------------
# u64 limb-pair path (bit-exact with reference scalar kernels)
# ---------------------------------------------------------------------------


def fwd_lazy_u64(a: mm.U64Pair, w: mm.U64Pair, w_con: mm.U64Pair, q: int):
    """Forward lazy NTT: natural in, bit-reversed out, output < 4q."""
    alo, ahi = a
    n = alo.shape[-1]
    logn = n.bit_length() - 1
    q2 = mm.const_u64(2 * q)
    m, t = 1, n >> 1
    for _ in range(logn):
        xlo, ylo = _split(alo, m, t)
        xhi, yhi = _split(ahi, m, t)
        x = (xlo, xhi)
        y = (ylo, yhi)
        wo = (w[0][m : 2 * m].reshape(m, 1), w[1][m : 2 * m].reshape(m, 1))
        wc = (
            w_con[0][m : 2 * m].reshape(m, 1),
            w_con[1][m : 2 * m].reshape(m, 1),
        )
        x1 = mm.reduce_4q_to_2q(x, q)
        tt = mm.shoup_mul_q2(wo, wc, y, q)
        nx = mm.add64(x1, tt)
        ny = mm.sub64(mm.add64(x1, q2), tt)
        alo = _join(nx[0], ny[0])
        ahi = _join(nx[1], ny[1])
        m <<= 1
        t >>= 1
    return alo, ahi


def fwd_u64(a, w, w_con, q: int):
    """Strict forward: output in [0, q) (include/ntt_reference.h:19-31)."""
    lazy = fwd_lazy_u64(a, w, w_con, q)
    return mm.reduce_4q_to_q(lazy, q)


def inv_u64(
    a: mm.U64Pair,
    w: mm.U64Pair,
    w_con: mm.U64Pair,
    n_inv_op: int,
    n_inv_con: int,
    w1_scalar: int,
    q: int,
):
    """Inverse NTT with n_inv fused into the final stage
    (src/ntt_reference.c:33-66).  w/w_con are the *inverse* root tables;
    w1_scalar is the host int value of w_inv_table[1]."""
    alo, ahi = a
    n = alo.shape[-1]
    logn = n.bit_length() - 1
    m, t = n >> 1, 1
    for _ in range(logn - 1):
        xlo, ylo = _split(alo, m, t)
        xhi, yhi = _split(ahi, m, t)
        x = (xlo, xhi)
        y = (ylo, yhi)
        wo = (w[0][m : 2 * m].reshape(m, 1), w[1][m : 2 * m].reshape(m, 1))
        wc = (
            w_con[0][m : 2 * m].reshape(m, 1),
            w_con[1][m : 2 * m].reshape(m, 1),
        )
        x1 = mm.reduce_4q_to_2q(mm.add64(x, y), q)
        q2 = mm.const_u64(2 * q)
        tt = mm.sub64(mm.add64(x, q2), y)
        ny = mm.shoup_mul_q2(wo, wc, tt, q)
        alo = _join(x1[0], ny[0])
        ahi = _join(x1[1], ny[1])
        m >>= 1
        t <<= 1
    # final fused stage: t = n/2
    tmp, con = _final_mulop(n_inv_op, n_inv_con, w1_scalar, q, 64)
    c_lo = mm.const_u64(con & ((1 << 64) - 1))
    c_hi = np.uint32(con >> 64)  # 0 or 1
    x = (alo[..., :t], ahi[..., :t])
    y = (alo[..., t:], ahi[..., t:])
    x1 = mm.add64(x, y)
    q2 = mm.const_u64(2 * q)
    tt = mm.sub64(mm.add64(x, q2), y)
    ninv = mm.const_u64(n_inv_op)
    ninv_c = mm.const_u64(n_inv_con)
    nx = mm.shoup_mul_q(ninv, ninv_c, x1, q)
    # Q = hi64(con * tt) with con possibly >= 2^64: Q = hi64(c_lo*tt) + c_hi*tt
    big_q = mm.mulhi64(c_lo, tt)
    if c_hi:
        big_q = mm.add64(big_q, tt)
    res = mm.sub64(mm.mul64_lo_const(tt, tmp), mm.mul64_lo_const(big_q, q))
    ny = mm.reduce_2q_to_q(res, q)
    alo = jnp.concatenate([nx[0], ny[0]], axis=-1)
    ahi = jnp.concatenate([nx[1], ny[1]], axis=-1)
    return alo, ahi


# ---------------------------------------------------------------------------
# SEAL dwthandler scheduling (third_party/seal/ntt_seal.c:47-244)
# ---------------------------------------------------------------------------
#
# SEAL's forward butterfly chain is value-identical to the Harvey chain
# above (guard == reduce_4q_to_2q, mul_root == shoup_mul_q2), but its loop
# structure special-cases the last stage (ntt_seal.c:116-124) and its
# INVERSE differs in dataflow: the final stage guards x before the sum,
# multiplies the sum by n_inv WITHOUT the lazy reduction, uses the fused
# scaled_r = mul_root(w[1], n_inv) constant, and finishes with a full
# 2q->q sweep (ntt_seal.c:200-243).  These mirrors keep SEAL's exact
# operation placement so its lazy intermediate bounds match the original.


def _fwd_stage_tw_u64(a, wo, wc, m: int, t: int, q: int):
    """One lazy Harvey forward stage with caller-provided twiddle views
    (the shared stage core for the seal / layout-consumer / r4r2-tail
    kernels; keeps the 4q->2q guard and +2q-before-subtract invariants in
    ONE place)."""
    alo, ahi = a
    xlo, ylo = _split(alo, m, t)
    xhi, yhi = _split(ahi, m, t)
    x1 = mm.reduce_4q_to_2q((xlo, xhi), q)
    tt = mm.shoup_mul_q2(wo, wc, (ylo, yhi), q)
    q2 = mm.const_u64(2 * q)
    nx = mm.add64(x1, tt)
    ny = mm.sub64(mm.add64(x1, q2), tt)
    return _join(nx[0], ny[0]), _join(nx[1], ny[1])


def _stage_fwd_u64(a, w, w_con, m: int, t: int, q: int):
    wo = (w[0][m : 2 * m].reshape(m, 1), w[1][m : 2 * m].reshape(m, 1))
    wc = (w_con[0][m : 2 * m].reshape(m, 1), w_con[1][m : 2 * m].reshape(m, 1))
    return _fwd_stage_tw_u64(a, wo, wc, m, t, q)


def fwd_seal_lazy_u64(a, w, w_con, q: int):
    """SEAL forward (lazy, < 4q): main stages m = 1 .. N/4, then the
    special-cased m = N/2 last stage (ntt_seal.c:66-124).  Bit-identical
    values to fwd_lazy_u64 by construction -- the guard/mul_root ops are
    the same lazy Harvey arithmetic."""
    n = a[0].shape[-1]
    m, t = 1, n >> 1
    while m < (n >> 1):
        a = _stage_fwd_u64(a, w, w_con, m, t, q)
        m <<= 1
        t >>= 1
    return _stage_fwd_u64(a, w, w_con, n >> 1, 1, q)


def fwd_seal_u64(a, w, w_con, q: int):
    return mm.reduce_4q_to_q(fwd_seal_lazy_u64(a, w, w_con, q), q)


def inv_seal_u64(a, w, w_con, n_inv_op: int, n_inv_con: int, w1_scalar: int,
                 q: int):
    """SEAL inverse (strict): dwthandler dataflow (ntt_seal.c:130-243).
    Final stage: u = guard(x); x' = n_inv * guard(u + y); y' = scaled_r *
    (u + 2q - y); then one full 2q->q sweep."""
    alo, ahi = a
    n = alo.shape[-1]
    logn = n.bit_length() - 1
    q2 = mm.const_u64(2 * q)
    m, t = n >> 1, 1
    for _ in range(logn - 1):
        xlo, ylo = _split(alo, m, t)
        xhi, yhi = _split(ahi, m, t)
        x = (xlo, xhi)
        y = (ylo, yhi)
        wo = (w[0][m : 2 * m].reshape(m, 1), w[1][m : 2 * m].reshape(m, 1))
        wc = (w_con[0][m : 2 * m].reshape(m, 1),
              w_con[1][m : 2 * m].reshape(m, 1))
        x1 = mm.cond_sub64(mm.add64(x, y), q2)  # guard(add(u, v))
        ny = mm.shoup_mul_q2(wo, wc, mm.sub64(mm.add64(x, q2), y), q)
        alo = _join(x1[0], ny[0])
        ahi = _join(x1[1], ny[1])
        m >>= 1
        t <<= 1
    # final stage with scaled_r = mul_root(w[1], n_inv) (ntt_seal.c:230-232)
    scaled_r, scaled_r_con = _final_mulop(n_inv_op, n_inv_con, w1_scalar, q, 64)
    x = (alo[..., :t], ahi[..., :t])
    y = (alo[..., t:], ahi[..., t:])
    u = mm.cond_sub64(x, q2)  # guard(*x)
    s = mm.cond_sub64(mm.add64(u, y), q2)  # guard(add(u, v))
    ninv = mm.const_u64(n_inv_op)
    ninv_c = mm.const_u64(n_inv_con)
    nx = mm.shoup_mul_q2(ninv, ninv_c, s, q)  # mul_scalar, < 2q
    d = mm.sub64(mm.add64(u, q2), y)
    r_lo = mm.const_u64(scaled_r_con & ((1 << 64) - 1))
    big_q = mm.mulhi64(r_lo, d)
    if scaled_r_con >> 64:
        big_q = mm.add64(big_q, d)
    ny = mm.sub64(mm.mul64_lo_const(d, scaled_r),
                  mm.mul64_lo_const(big_q, q))  # mul_root, < 2q
    alo = jnp.concatenate([nx[0], ny[0]], axis=-1)
    ahi = jnp.concatenate([nx[1], ny[1]], axis=-1)
    # trailing full sweep (ntt_seal.c:240-243)
    return mm.reduce_2q_to_q((alo, ahi), q)


# ---------------------------------------------------------------------------
# Layout-consuming radix-2 kernels: HEXL 13N/8 and r2_16 3N tables
# ---------------------------------------------------------------------------
#
# The reference's SIMD kernels each pair a butterfly dataflow with a
# bespoke twiddle memory layout (pre_compute.h:109-137, :326-367).  These
# kernels consume those layouts directly: the duplicated tail segments ARE
# the pre-broadcast (m, t) twiddle views the whole-stage vectorized
# butterfly wants (the duplication factor 4/2 equals the stage's t), so
# the broadcast is a memory read instead of an on-the-fly expand -- the
# same memory-for-compute trade the AVX512 kernels make with their
# LoadFwdInterleaved tables.


def _hexl_tw_view(tab, m: int, n: int):
    """Stage-m twiddle view of the 13N/8 HEXL table (expand_w_hexl):
    segments [0,N/8) verbatim | x4-dup | x2-dup | [N/2,N) verbatim map to
    stages t>=8 / t==4 / t==2 / t==1 (third_party/hexl/fwd-ntt-avx512.c:172-199)."""
    if 2 * m <= n // 8:
        return tab[m : 2 * m].reshape(m, 1)
    if m == n // 8:
        return tab[n // 8 : n // 8 + n // 2].reshape(m, 4)
    if m == n // 4:
        return tab[n // 8 + n // 2 : n // 8 + n].reshape(m, 2)
    return tab[9 * n // 8 : 9 * n // 8 + n // 2].reshape(m, 1)


# Inverses of the r2_16 table's lane interleaves, derived from the
# canonical emission orders in twiddles.py (pre_compute.h:326-367).
from ntt_tpu import twiddles as _tw  # noqa: E402 (canonical layout orders)

_R2_16_T2_INV = np.argsort(_tw.T2_GROUP_ORDER)
_R2_16_T1_INV = np.argsort(_tw.LANE_PERM)


def _r2_16_tw_view(tab, m: int, n: int):
    """Stage-m twiddle view of the 3N r2_16 table (expand_w_r2_16): the
    fused-tail segments are consumed through the documented inverse of
    their lane-interleave (the analog of collect_roots walking the
    expanded table, src/ntt_r2_16_avx512_ifma.c:8-54)."""
    if 2 * m <= n // 8:
        return tab[m : 2 * m].reshape(m, 1)
    if m == n // 8:
        return tab[n // 8 : 5 * n // 8].reshape(m, 4)
    if m == n // 4:
        reg = tab[5 * n // 8 : 9 * n // 8].reshape(m // 4, 4, 2)
        return reg[:, _R2_16_T2_INV].reshape(m, 2)
    reg = tab[9 * n // 8 : 13 * n // 8].reshape(m // 8, 8)
    return reg[:, _R2_16_T1_INV].reshape(m, 1)


def _fwd_lazy_u64_layout(a, tab, tab_con, q: int, tw_view):
    """Forward lazy radix-2 chain with per-stage twiddles read through a
    layout view function (HEXL / r2_16 table consumers)."""
    n = a[0].shape[-1]
    logn = n.bit_length() - 1
    m, t = 1, n >> 1
    for _ in range(logn):
        wo = (tw_view(tab[0], m, n), tw_view(tab[1], m, n))
        wc = (tw_view(tab_con[0], m, n), tw_view(tab_con[1], m, n))
        a = _fwd_stage_tw_u64(a, wo, wc, m, t, q)
        m <<= 1
        t >>= 1
    return a


def fwd_hexl_lazy_u64(a, tab, tab_con, q: int):
    return _fwd_lazy_u64_layout(a, tab, tab_con, q, _hexl_tw_view)


def fwd_hexl_u64(a, tab, tab_con, q: int):
    return mm.reduce_4q_to_q(fwd_hexl_lazy_u64(a, tab, tab_con, q), q)


def fwd_r2_16_lazy_u64(a, tab, tab_con, q: int):
    return _fwd_lazy_u64_layout(a, tab, tab_con, q, _r2_16_tw_view)


def fwd_r2_16_u64(a, tab, tab_con, q: int):
    return mm.reduce_4q_to_q(fwd_r2_16_lazy_u64(a, tab, tab_con, q), q)


# ---------------------------------------------------------------------------
# u32 single-lane path (q < 2^30, word_size=32)
# ---------------------------------------------------------------------------


def fwd_lazy_u32(a, w, w_con, q: int):
    """Forward lazy NTT on uint32 lanes; output < 4q (requires q < 2^30)."""
    n = a.shape[-1]
    logn = n.bit_length() - 1
    q2 = np.uint32(2 * q)
    m, t = 1, n >> 1
    for _ in range(logn):
        x, y = _split(a, m, t)
        wo = w[m : 2 * m].reshape(m, 1)
        wc = w_con[m : 2 * m].reshape(m, 1)
        x1 = mm.cond_sub32(x, 2 * q)
        tt = mm.shoup_mul32_q2(wo, wc, y, q)
        a = _join(x1 + tt, x1 + q2 - tt)
        m <<= 1
        t >>= 1
    return a


def fwd_u32(a, w, w_con, q: int):
    return mm.reduce32(fwd_lazy_u32(a, w, w_con, q), q, 4)


def inv_u32(a, w, w_con, n_inv_op: int, n_inv_con: int, w1_scalar: int, q: int):
    """Inverse on uint32 lanes (strict output)."""
    n = a.shape[-1]
    logn = n.bit_length() - 1
    q2 = np.uint32(2 * q)
    m, t = n >> 1, 1
    for _ in range(logn - 1):
        x, y = _split(a, m, t)
        wo = w[m : 2 * m].reshape(m, 1)
        wc = w_con[m : 2 * m].reshape(m, 1)
        x1 = mm.cond_sub32(x + y, 2 * q)
        tt = x + q2 - y
        ny = mm.shoup_mul32_q2(wo, wc, tt, q)
        a = _join(x1, ny)
        m >>= 1
        t <<= 1
    tmp, con = _final_mulop(n_inv_op, n_inv_con, w1_scalar, q, 32)
    c_lo = np.uint32(con & 0xFFFFFFFF)
    c_hi = con >> 32  # 0 or 1
    x = a[..., :t]
    y = a[..., t:]
    x1 = x + y
    tt = x + q2 - y
    nx = mm.cond_sub32(
        mm.shoup_mul32_q2(np.uint32(n_inv_op), np.uint32(n_inv_con), x1, q), q
    )
    big_q = mm.mulhi32(c_lo, tt)
    if c_hi:
        big_q = big_q + tt
    ny = mm.cond_sub32(np.uint32(tmp) * tt - big_q * np.uint32(q), q)
    return jnp.concatenate([nx, ny], axis=-1)
