"""Host-side NumPy reference model of the negacyclic NTT.

This is the *semantic oracle* for the whole framework: a stage-vectorized
uint64 NumPy implementation of the reference's scalar kernels with
bit-exact lazy-reduction behavior:

  * Harvey radix-2 forward/inverse  (semantics of
    /root/reference/src/ntt_reference.c:11-66 and
    /root/reference/include/internal/fast_mul_operators.h:72-106)
  * radix-4 forward/inverse         (/root/reference/src/ntt_radix4.c:27-114,
    fast_mul_operators.h:108-149)

Design note: this is NOT a translation of the C loop nest.  Each butterfly
stage is executed as one whole-array vectorized operation on an
(..., m, r, t) view -- the same dataflow our jnp/Pallas kernels use -- so
this file doubles as the executable spec for the device kernels.  All
arithmetic wraps mod 2^64 exactly like C uint64_t (NumPy uint64 wraps).

Every function takes/returns NumPy uint64 arrays with a leading batch
dimension allowed (generalizing the reference's `_dbl` two-poly variants,
src/ntt_reference.c:71-91, to arbitrary batch).
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64
_MASK32 = U64(0xFFFFFFFF)
_32 = U64(32)

# numpy>=2 raises on Python-int overflow when mixing with uint64; keep all
# constants as explicit uint64 scalars.


def u64(x) -> np.ndarray:
    return np.asarray(x, dtype=np.uint64)


# ---------------------------------------------------------------------------
# Lazy modular reduction ladder (fast_mul_operators.h:15-43)
# ---------------------------------------------------------------------------


def reduce_2q_to_q(v: np.ndarray, q: int) -> np.ndarray:
    q = U64(q)
    return np.where(v < q, v, v - q)


def reduce_4q_to_2q(v: np.ndarray, q: int) -> np.ndarray:
    q2 = U64(2 * q)
    return np.where(v < q2, v, v - q2)


def reduce_4q_to_q(v: np.ndarray, q: int) -> np.ndarray:
    return reduce_2q_to_q(reduce_4q_to_2q(v, q), q)


def reduce_8q_to_4q(v: np.ndarray, q: int) -> np.ndarray:
    q4 = U64(4 * q)
    return np.where(v < q4, v, v - q4)


def reduce_8q_to_2q(v: np.ndarray, q: int) -> np.ndarray:
    return reduce_4q_to_2q(reduce_8q_to_4q(v, q), q)


def reduce_8q_to_q(v: np.ndarray, q: int) -> np.ndarray:
    return reduce_2q_to_q(reduce_8q_to_2q(v, q), q)


# ---------------------------------------------------------------------------
# 64x64 -> high-64 multiply and Shoup modular multiply
# (fast_mul_operators.h:49-70; __uint128_t replaced by 32-bit limb algebra)
# ---------------------------------------------------------------------------


def mulhi64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """High 64 bits of the 128-bit product a*b (vectorized)."""
    a = u64(a)
    b = u64(b)
    a0 = a & _MASK32
    a1 = a >> _32
    b0 = b & _MASK32
    b1 = b >> _32
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = (p00 >> _32) + (p01 & _MASK32) + (p10 & _MASK32)
    return p11 + (p01 >> _32) + (p10 >> _32) + (mid >> _32)


def shoup_mul_q2(w_op, w_con, t, q: int) -> np.ndarray:
    """fast_mul_mod_q2: (w*t - hi64(w_con*t)*q) mod 2^64, result in [0, 2q).

    Requires t < 2^64/q * q-ish bound (Harvey: t <= beta); see
    fast_mul_operators.h:49-54.
    """
    w_op = u64(w_op)
    w_con = u64(w_con)
    t = u64(t)
    qq = U64(q)
    big_q = mulhi64(w_con, t)
    return w_op * t - big_q * qq


def shoup_mul_q(w_op, w_con, t, q: int) -> np.ndarray:
    return reduce_2q_to_q(shoup_mul_q2(w_op, w_con, t, q), q)


def shoup_dbl_mul_q2(w1_op, w1_con, w2_op, w2_con, t1, t2, q: int) -> np.ndarray:
    """fast_dbl_mul_mod_q2 (fast_mul_operators.h:62-70): one Barrett-style
    correction for the fused sum t1*w1 + t2*w2.

    NOTE: the reference computes Q = HIGH_WORD(w1.con*t1 + w2.con*t2) with
    the sum formed in 128 bits; we emulate the 128-bit sum with a carry on
    the low halves.
    """
    t1 = u64(t1)
    t2 = u64(t2)
    w1_op, w1_con, w2_op, w2_con = map(u64, (w1_op, w1_con, w2_op, w2_con))
    qq = U64(q)
    lo = w1_con * t1 + w2_con * t2  # wraps mod 2^64
    carry = np.where(lo < w1_con * t1, U64(1), U64(0))
    hi = mulhi64(w1_con, t1) + mulhi64(w2_con, t2) + carry
    return w1_op * t1 + w2_op * t2 - hi * qq


# ---------------------------------------------------------------------------
# Butterflies (whole-stage vectorized)
# ---------------------------------------------------------------------------


def harvey_fwd_butterfly(x, y, w_op, w_con, q: int):
    """(fast_mul_operators.h:72-81): inputs < 4q, outputs < 4q."""
    q2 = U64(2 * q)
    x1 = reduce_4q_to_2q(x, q)
    t = shoup_mul_q2(w_op, w_con, y, q)
    return x1 + t, x1 + q2 - t


def harvey_bkw_butterfly(x, y, w_op, w_con, q: int):
    """(fast_mul_operators.h:83-92)."""
    q2 = U64(2 * q)
    x1 = reduce_4q_to_2q(x + y, q)
    t = x + q2 - y
    return x1, shoup_mul_q2(w_op, w_con, t, q)


def radix4_fwd_butterfly(x, y, z, t, w5, q: int):
    """5-twiddle radix-4 forward butterfly (fast_mul_operators.h:108-128).

    w5 is a sequence of 5 (op, con) pairs (arrays broadcastable to x).
    Inputs < 8q, outputs < 8q.
    """
    q2 = U64(2 * q)
    q4 = U64(4 * q)
    (w0o, w0c), (w1o, w1c), (w2o, w2c), (w3o, w3c), (w4o, w4c) = w5
    y1 = shoup_dbl_mul_q2(w1o, w1c, w2o, w2c, y, t, q)
    y2 = shoup_dbl_mul_q2(w3o, w3c, w4o, w4c, y, t, q)
    t1 = reduce_8q_to_4q(x, q)
    t2 = shoup_mul_q2(w0o, w0c, z, q)
    return (
        t1 + t2 + y1,
        t1 + t2 - y1 + q2,
        t1 - t2 + y2 + q2,
        t1 - t2 - y2 + q4,
    )


def radix4_inv_butterfly(x, y, z, t, w5, q: int):
    """(fast_mul_operators.h:130-149)."""
    q4 = U64(4 * q)
    (w0o, w0c), (w1o, w1c), (w2o, w2c), (w3o, w3c), (w4o, w4c) = w5
    t0 = z + t
    t1 = x + y
    t2 = q4 + x - y
    t3 = q4 + z - t
    nx = reduce_8q_to_2q(t1 + t0, q)
    nz = shoup_mul_q(w0o, w0c, q4 + t1 - t0, q)
    ny = shoup_dbl_mul_q2(w1o, w1c, w3o, w3c, t2, t3, q)
    nt = shoup_dbl_mul_q2(w2o, w2c, w4o, w4c, t2, t3, q)
    return nx, ny, nz, nt


# ---------------------------------------------------------------------------
# Radix-2 Harvey NTT, forward and inverse (src/ntt_reference.c:11-66)
# ---------------------------------------------------------------------------


def fwd_ntt_harvey_lazy(
    a: np.ndarray, q: int, w: np.ndarray, w_con: np.ndarray
) -> np.ndarray:
    """Forward negacyclic NTT, natural order in, bit-reversed out; output in
    [0, 4q).  a has shape (..., N).  Stage s views the array as
    (..., m, 2, t) and runs all N/2 butterflies at once."""
    a = u64(a).copy()
    n = a.shape[-1]
    lead = a.shape[:-1]
    logn = n.bit_length() - 1
    w = u64(w)
    w_con = u64(w_con)
    t = n >> 1
    m = 1
    for _ in range(logn):
        v = a.reshape(lead + (m, 2, t))
        wo = w[m : 2 * m].reshape((m, 1))
        wc = w_con[m : 2 * m].reshape((m, 1))
        x, y = harvey_fwd_butterfly(v[..., 0, :], v[..., 1, :], wo, wc, q)
        v[..., 0, :] = x
        v[..., 1, :] = y
        m <<= 1
        t >>= 1
    return a


def fwd_ntt_harvey(a, q, w, w_con) -> np.ndarray:
    """Strict wrapper (include/ntt_reference.h:19-31): output in [0, q)."""
    return reduce_4q_to_q(fwd_ntt_harvey_lazy(a, q, w, w_con), q)


def inv_ntt_harvey(
    a: np.ndarray,
    q: int,
    n_inv_op: int,
    n_inv_con: int,
    w: np.ndarray,
    w_con: np.ndarray,
    word_size: int = 64,
) -> np.ndarray:
    """Inverse NTT with the n_inv-fused final stage
    (src/ntt_reference.c:33-66).  Bit-reversed in, natural order out,
    output in [0, q)."""
    a = u64(a).copy()
    n = a.shape[-1]
    lead = a.shape[:-1]
    logn = n.bit_length() - 1
    w = u64(w)
    w_con = u64(w_con)
    t = 1
    m = n >> 1
    for _ in range(logn - 1):
        v = a.reshape(lead + (m, 2, t))
        wo = w[m : 2 * m].reshape((m, 1))
        wc = w_con[m : 2 * m].reshape((m, 1))
        x, y = harvey_bkw_butterfly(v[..., 0, :], v[..., 1, :], wo, wc, q)
        v[..., 0, :] = x
        v[..., 1, :] = y
        m >>= 1
        t <<= 1
    # Final stage fuses multiplication by n_inv (src/ntt_reference.c:55-65).
    # tmp = n_inv * w[1] mod' in [0,2q); its Shoup constant can exceed 2^64,
    # carried exactly as (c_hi, c_lo) with the 2^128 wrap analysis showing
    # the u64-truncated result is still exact.
    assert word_size == 64, "model implements the scalar 64-bit path"
    tmp = int(shoup_mul_q2(U64(n_inv_op), U64(n_inv_con), U64(int(w[1])), q))
    con = (tmp << 64) // q
    c_lo = U64(con & 0xFFFFFFFFFFFFFFFF)
    c_hi = U64(con >> 64)
    q2 = U64(2 * q)
    x = a[..., :t]
    y = a[..., t:]
    x1 = x + y
    tt = x + q2 - y
    nx = shoup_mul_q(U64(n_inv_op), U64(n_inv_con), x1, q)
    big_q = mulhi64(c_lo, tt) + c_hi * tt
    ny = reduce_2q_to_q(U64(tmp) * tt - big_q * U64(q), q)
    a[..., :t] = nx
    a[..., t:] = ny
    return a


# ---------------------------------------------------------------------------
# Radix-4 NTT, forward and inverse (src/ntt_radix4.c)
# ---------------------------------------------------------------------------


def _collect_roots(w: np.ndarray, w_con: np.ndarray, m: int):
    """Vectorized analog of collect_roots (src/ntt_radix4.c:7-25): for all
    groups j in [0, m) at once, pull the 5-twiddle quintuple stored in the
    expanded radix-4 table at m1 = 2*(m+j)."""
    j = np.arange(m)
    m1 = 2 * (m + j)
    idx = np.stack([m1, 2 * m1, 2 * m1 + 1, 2 * m1 + 2, 2 * m1 + 3])
    return [(w[idx[k]].reshape(m, 1), w_con[idx[k]].reshape(m, 1)) for k in range(5)]


def fwd_ntt_radix4_lazy(
    a: np.ndarray, q: int, w: np.ndarray, w_con: np.ndarray
) -> np.ndarray:
    """Radix-4 DIT forward (src/ntt_radix4.c:27-62); w/w_con are the
    *expanded* 2N tables from twiddles.expand_w.  Output in [0, 8q) when m
    is even, [0, 4q) when odd (final radix-2 sweep)."""
    a = u64(a).copy()
    n = a.shape[-1]
    lead = a.shape[:-1]
    logn = n.bit_length() - 1
    w = u64(w)
    w_con = u64(w_con)
    even = logn % 2 == 0
    bound = n if even else (n >> 1)
    t = n >> 2
    m = 1
    while m < bound:
        v = a.reshape(lead + (m, 4, t))
        w5 = _collect_roots(w, w_con, m)
        x, y, z, tt = radix4_fwd_butterfly(
            v[..., 0, :], v[..., 1, :], v[..., 2, :], v[..., 3, :], w5, q
        )
        v[..., 0, :] = x
        v[..., 1, :] = y
        v[..., 2, :] = z
        v[..., 3, :] = tt
        m <<= 2
        t >>= 2
    if not even:
        # final radix-2 sweep with X-reduction first (src/ntt_radix4.c:52-61)
        v = a.reshape(lead + (n >> 1, 2))
        i = np.arange(0, n, 2)
        wo = w[n + i].reshape((n >> 1,))
        wc = w_con[n + i].reshape((n >> 1,))
        x = reduce_8q_to_4q(v[..., 0], q)
        x, y = harvey_fwd_butterfly(x, v[..., 1], wo, wc, q)
        v[..., 0] = x
        v[..., 1] = y
    return a


def fwd_ntt_radix4(a, q, w, w_con) -> np.ndarray:
    """Strict wrapper (include/ntt_radix4.h:16-28): reduce 8q -> q."""
    return reduce_8q_to_q(fwd_ntt_radix4_lazy(a, q, w, w_con), q)


def inv_ntt_radix4(
    a: np.ndarray,
    q: int,
    n_inv_op: int,
    n_inv_con: int,
    w: np.ndarray,
    w_con: np.ndarray,
) -> np.ndarray:
    """Radix-4 inverse (src/ntt_radix4.c:64-114); w/w_con are the expanded
    2N tables built from the *inverse* root powers."""
    a = u64(a).copy()
    n = a.shape[-1]
    lead = a.shape[:-1]
    logn = n.bit_length() - 1
    w = u64(w)
    w_con = u64(w_con)
    t = 1
    m = n
    if logn % 2 == 0:
        a = reduce_8q_to_2q(a, q)
    else:
        v = a.reshape(lead + (n >> 1, 2))
        i = np.arange(0, n, 2)
        wo = w[n + i].reshape((n >> 1,))
        wc = w_con[n + i].reshape((n >> 1,))
        x = reduce_8q_to_4q(v[..., 0], q)
        x, y = harvey_bkw_butterfly(x, v[..., 1], wo, wc, q)
        v[..., 0] = x
        v[..., 1] = y
        m >>= 1
        t <<= 1
    m >>= 2
    while m > 0:
        v = a.reshape(lead + (m, 4, t))
        w5 = _collect_roots(w, w_con, m)
        x, y, z, tt = radix4_inv_butterfly(
            v[..., 0, :], v[..., 1, :], v[..., 2, :], v[..., 3, :], w5, q
        )
        v[..., 0, :] = x
        v[..., 1, :] = y
        v[..., 2, :] = z
        v[..., 3, :] = tt
        m >>= 2
        t <<= 2
    return shoup_mul_q(U64(n_inv_op), U64(n_inv_con), a, q)


# ---------------------------------------------------------------------------
# Direct (schoolbook) negacyclic NTT -- an independent O(N^2) oracle used in
# tests to pin down the exact output convention (index j holds the
# evaluation at psi^(2*bitrev(j)+1)).
# ---------------------------------------------------------------------------


def direct_negacyclic_ntt(a: np.ndarray, q: int, w: int) -> np.ndarray:
    """Exact big-int evaluation: out[j] = sum_i a[i] * w^(i*(2*br(j)+1)) mod q,
    where br is the log2(N)-bit reversal.  O(N^2 log) -- tests only, 1-D."""
    assert a.ndim == 1, "direct oracle is 1-D only"
    n = a.shape[-1]
    logn = n.bit_length() - 1
    br = np.zeros(n, dtype=np.int64)
    for j in range(n):
        r = 0
        x = j
        for _ in range(logn):
            r = (r << 1) | (x & 1)
            x >>= 1
        br[j] = r
    a_int = [int(v) for v in a]
    res = []
    for j in range(n):
        e = 2 * int(br[j]) + 1
        base = pow(w, e, q)
        acc = 0
        cur = 1
        for i in range(n):
            acc = (acc + a_int[i] * cur) % q
            cur = cur * base % q
        res.append(acc)
    return np.array(res, dtype=np.uint64)
