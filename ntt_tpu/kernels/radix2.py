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
    res = mm.sub64(mm.mul64_lo(mm.const_u64(tmp), tt), mm.mul64_lo(big_q, mm.const_u64(q)))
    ny = mm.reduce_2q_to_q(res, q)
    alo = jnp.concatenate([nx[0], ny[0]], axis=-1)
    ahi = jnp.concatenate([nx[1], ny[1]], axis=-1)
    return alo, ahi


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
