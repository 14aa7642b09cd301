"""Device-side modular arithmetic on 32-bit lanes.

TPU vector lanes have no 64-bit integer multiply (and Mosaic/Pallas has no
64-bit types at all), so this module rebuilds the reference's uint64 /
__uint128_t Shoup arithmetic (fast_mul_operators.h:49-70) from uint32 limb
operations:

  * a u64 value is a pair (lo, hi) of uint32 arrays;
  * 32x32->64 products are formed from 16-bit half-products (the TPU
    analog of AVX512-IFMA's 52-bit madd52lo/hi split,
    include/internal/avx512.h:48-55);
  * the u128 intermediates of fast_dbl_mul_mod_q2 are 4-limb values.

Every function here is pure jnp on uint32 and therefore works identically
under jit, vmap, shard_map, and inside Pallas TPU kernel bodies.  The
functions mirror the NumPy oracle in refmodel.py bit for bit.

A faster single-lane path (`shoup_mul32`) covers q < 2^30 with word_size=32
Shoup preconditioning -- the analog of the reference's reduced-word-size
IFMA path (52-bit words for q < 2^49, defs.h:44-62).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
MASK16 = np.uint32(0xFFFF)

# A u64 on device is a tuple (lo, hi) of equal-shaped uint32 arrays.
U64Pair = tuple


# ---------------------------------------------------------------------------
# Host <-> device representation
# ---------------------------------------------------------------------------


def from_u64(x: np.ndarray) -> U64Pair:
    """Split a host uint64 array into a (lo, hi) uint32 pair."""
    x = np.asarray(x, dtype=np.uint64)
    lo = (x & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (x >> np.uint64(32)).astype(np.uint32)
    return jnp.asarray(lo), jnp.asarray(hi)


def to_u64(a: U64Pair) -> np.ndarray:
    """Join a (lo, hi) pair back into a host uint64 array."""
    lo = np.asarray(a[0], dtype=np.uint64)
    hi = np.asarray(a[1], dtype=np.uint64)
    return lo | (hi << np.uint64(32))


def const_u64(x: int, dtype=U32) -> tuple[np.uint32, np.uint32]:
    """A scalar u64 constant as two uint32 scalars (trace-time constants)."""
    return np.uint32(x & 0xFFFFFFFF), np.uint32((x >> 32) & 0xFFFFFFFF)


# ---------------------------------------------------------------------------
# u32 primitive: full 32x32 -> 64 product from 16-bit halves
# ---------------------------------------------------------------------------


def mul32_full(a, b):
    """(lo32, hi32) of the 64-bit product of two uint32 arrays."""
    a = a.astype(U32)
    b = b.astype(U32)
    a0 = a & MASK16
    a1 = a >> 16
    b0 = b & MASK16
    b1 = b >> 16
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = (p00 >> 16) + (p01 & MASK16) + (p10 & MASK16)
    lo = (mid << 16) | (p00 & MASK16)
    hi = p11 + (p01 >> 16) + (p10 >> 16) + (mid >> 16)
    return lo, hi


def mulhi32(a, b):
    """High 32 bits of a 32x32 product (skips assembling the low word)."""
    a = a.astype(U32)
    b = b.astype(U32)
    a0 = a & MASK16
    a1 = a >> 16
    b0 = b & MASK16
    b1 = b >> 16
    p01 = a0 * b1
    p10 = a1 * b0
    mid = ((a0 * b0) >> 16) + (p01 & MASK16) + (p10 & MASK16)
    return a1 * b1 + (p01 >> 16) + (p10 >> 16) + (mid >> 16)


# ---------------------------------------------------------------------------
# u64 (limb-pair) arithmetic
# ---------------------------------------------------------------------------


def add64(a: U64Pair, b: U64Pair) -> U64Pair:
    lo = a[0] + b[0]
    carry = (lo < a[0]).astype(U32)
    return lo, a[1] + b[1] + carry


def sub64(a: U64Pair, b: U64Pair) -> U64Pair:
    """a - b mod 2^64 (wrapping, like C uint64_t)."""
    lo = a[0] - b[0]
    borrow = (a[0] < b[0]).astype(U32)
    return lo, a[1] - b[1] - borrow


def lt64(a: U64Pair, b: U64Pair):
    return (a[1] < b[1]) | ((a[1] == b[1]) & (a[0] < b[0]))


def select64(pred, a: U64Pair, b: U64Pair) -> U64Pair:
    return jnp.where(pred, a[0], b[0]), jnp.where(pred, a[1], b[1])


def mul64_lo(a: U64Pair, b: U64Pair) -> U64Pair:
    """Low 64 bits of a 64x64 product (C uint64_t multiply)."""
    lo, hi = mul32_full(a[0], b[0])
    hi = hi + a[0] * b[1] + a[1] * b[0]
    return lo, hi


def shl64(x: U64Pair, k: int) -> U64Pair:
    """x << k mod 2^64 on a limb pair, trace-time-constant k in [0, 64)."""
    if k == 0:
        return x
    lo, hi = x
    if k >= 32:
        new_hi = lo if k == 32 else lo << (k - 32)
        return jnp.zeros_like(lo), new_hi
    return lo << k, (hi << k) | (lo >> (32 - k))


def _naf_digits(c: int) -> list[tuple[int, int]]:
    """Non-adjacent-form of c as [(sign, shift)]: c = sum sign * 2^shift.
    Minimal-weight signed-binary decomposition (host-side, trace time)."""
    digs = []
    k = 0
    while c:
        if c & 1:
            d = 2 - (c & 3)  # +-1
            digs.append((d, k))
            c -= d
        c >>= 1
        k += 1
    return digs


def mul64_lo_const(x: U64Pair, c: int) -> U64Pair:
    """x * c mod 2^64 for a trace-time constant c.  When c is sparse in
    signed-binary form -- e.g. Solinas/Goldilocks-style NTT primes like
    2^62 - 2^16 + 1 -- the product becomes a chain of limb shifts and
    adds, removing all 6 multiplies of the generic path.  This is the
    multiply the Shoup correction term Q*q spends per butterfly
    (fast_mul_operators.h:49-54's `Q * q`), so for Solinas moduli every
    Shoup multiply drops from 22+ to 16-ish native u32 multiplies.

    Falls back to mul64_lo above NTT_NAF_MAX_DIGITS (default 3) NAF
    digits: measured on the v5e, the weight-3 headline modulus wins
    (5.0 -> 4.8 us/t at N=2^14) but a weight-4 chain LOSES 34% at the
    N=2^16 bench prime 2^62-2^20-2^19+1 -- each extra term is a 64-bit
    limb shift+carry+add64, so the chain passes the plain 6-multiply
    product's cost at 4 digits (docs/PERF.md).  Bit-exact mod 2^64
    either way."""
    digs = _naf_digits(c & ((1 << 64) - 1))
    if len(digs) > int(os.environ.get("NTT_NAF_MAX_DIGITS", "3")):
        return mul64_lo(x, const_u64(c))
    acc = None
    for sign, k in digs:
        if k >= 64:
            continue
        term = shl64(x, k)
        if acc is None:
            acc = term if sign > 0 else sub64((jnp.zeros_like(x[0]),) * 2, term)
        elif sign > 0:
            acc = add64(acc, term)
        else:
            acc = sub64(acc, term)
    if acc is None:
        return jnp.zeros_like(x[0]), jnp.zeros_like(x[1])
    return acc


def mul64_full(a: U64Pair, b: U64Pair):
    """All 128 bits of a 64x64 product, as 4 uint32 limbs (p0..p3, LSB first)."""
    ll_lo, ll_hi = mul32_full(a[0], b[0])
    lh_lo, lh_hi = mul32_full(a[0], b[1])
    hl_lo, hl_hi = mul32_full(a[1], b[0])
    hh_lo, hh_hi = mul32_full(a[1], b[1])
    # limb 1 = ll_hi + lh_lo + hl_lo  (carries into limb 2)
    s1 = ll_hi + lh_lo
    c1 = (s1 < ll_hi).astype(U32)
    p1 = s1 + hl_lo
    c2 = (p1 < s1).astype(U32)
    # limb 2 = lh_hi + hl_hi + hh_lo + carries  (carries into limb 3)
    s2 = lh_hi + hl_hi
    c3 = (s2 < lh_hi).astype(U32)
    s3 = s2 + hh_lo
    c4 = (s3 < s2).astype(U32)
    p2 = s3 + c1 + c2
    c5 = (p2 < s3).astype(U32)
    p3 = hh_hi + c3 + c4 + c5
    return ll_lo, p1, p2, p3


def mulhi64(a: U64Pair, b: U64Pair) -> U64Pair:
    """High 64 bits of a 64x64 product (HIGH_WORD of the u128 product,
    defs.h:54)."""
    _, _, p2, p3 = mul64_full(a, b)
    return p2, p3


def _carry32(x, y, s):
    """Carry-out bit of the uint32 sum s = x + y, as uint32 0/1 -- computed
    purely bitwise (no compare, no select).  The original comparison-based
    carries ((s < x) bool chains folded through jnp.where) were miscompiled
    by an XLA:TPU fusion inside the full six-step program
    (artifacts/KARA_TPU_MISCOMPILE_r02.log); the bitwise form avoids the
    bool/select pattern entirely."""
    return ((x & y) | ((x | y) & ~s)) >> 31


def _borrow32(x, y, d):
    """Borrow-out bit of the uint32 difference d = x - y, as uint32 0/1
    (bitwise; see _carry32)."""
    return ((~x & y) | ((~x | y) & d)) >> 31


def mulhi64_kara(a: U64Pair, b: U64Pair) -> U64Pair:
    """mulhi64 via Karatsuba on the 32-bit limbs: 3 full 32x32 products
    (12 native multiplies) instead of schoolbook's 4 (16), at the price of
    a longer add/borrow chain.

    product = ll + (lh + hl)*2^32 + hh*2^64 with
    lh + hl = (a0+a1)(b0+b1) - ll - hh; then
    hi64 = hh + ((m + ll_hi) >> 32).  Bit-exact with mulhi64 (property
    tested on CPU and TPU).

    All carries/borrows are extracted with pure bitwise formulas
    (_carry32/_borrow32) and the conditional 2^32-weight terms are applied
    with and-masks -- round 2's comparison+where formulation hit a
    reproduced XLA:TPU fusion miscompile in exactly those chains
    (artifacts/KARA_TPU_MISCOMPILE_r02.log, docs/PERF.md)."""
    a0, a1 = a
    b0, b1 = b
    ll_lo, ll_hi = mul32_full(a0, b0)
    hh_lo, hh_hi = mul32_full(a1, b1)
    sa = a0 + a1
    ca = _carry32(a0, a1, sa)
    sb = b0 + b1
    cb = _carry32(b0, b1, sb)
    sp_lo, sp_hi = mul32_full(sa, sb)
    # P = (a0+a1)(b0+b1) as 3 limbs (sp_lo, p1, p2);
    # ca ? sb : 0 == sb & (0 - ca)  (mask, no select)
    add_a = sb & (U32(0) - ca)
    add_b = sa & (U32(0) - cb)
    t1 = sp_hi + add_a
    c1 = _carry32(sp_hi, add_a, t1)
    p1 = t1 + add_b
    c2 = _carry32(t1, add_b, p1)
    p2 = (ca & cb) + c1 + c2
    # S = ll + hh as 3 limbs
    s0 = ll_lo + hh_lo
    cs0 = _carry32(ll_lo, hh_lo, s0)
    s1a = ll_hi + hh_hi
    cs1a = _carry32(ll_hi, hh_hi, s1a)
    s1 = s1a + cs0
    cs1b = _carry32(s1a, cs0, s1)
    s2 = cs1a + cs1b
    # m = P - S  (= lh + hl, fits 65 bits; borrows cannot double-fire)
    m0 = sp_lo - s0
    bw0 = _borrow32(sp_lo, s0, m0)
    d1 = p1 - s1
    b1a = _borrow32(p1, s1, d1)
    m1 = d1 - bw0
    b1b = _borrow32(d1, bw0, m1)
    m2 = p2 - s2 - (b1a | b1b)
    # hi64 = hh + ((m + ll_hi) >> 32)
    t0 = m0 + ll_hi
    c0 = _carry32(m0, ll_hi, t0)
    r_lo = m1 + c0
    cr = _carry32(m1, c0, r_lo)
    r_hi = m2 + cr
    o_lo = hh_lo + r_lo
    oc = _carry32(hh_lo, r_lo, o_lo)
    return o_lo, hh_hi + r_hi + oc


def add128(a4, b4):
    """Sum of two 128-bit 4-limb values, wrapping mod 2^128."""
    r0 = a4[0] + b4[0]
    c0 = (r0 < a4[0]).astype(U32)
    s1 = a4[1] + b4[1]
    c1a = (s1 < a4[1]).astype(U32)
    r1 = s1 + c0
    c1b = (r1 < s1).astype(U32)
    s2 = a4[2] + b4[2]
    c2a = (s2 < a4[2]).astype(U32)
    r2 = s2 + c1a + c1b
    c2b = (r2 < s2).astype(U32)
    r3 = a4[3] + b4[3] + c2a + c2b
    return r0, r1, r2, r3


# ---------------------------------------------------------------------------
# Lazy reduction ladder on limb pairs (fast_mul_operators.h:15-43)
# ---------------------------------------------------------------------------


def cond_sub64(v: U64Pair, kq: tuple) -> U64Pair:
    """v if v < kq else v - kq; kq is a (lo, hi) uint32 scalar pair."""
    d = sub64(v, kq)
    return select64(lt64(v, kq), v, d)


def reduce_2q_to_q(v, q: int):
    return cond_sub64(v, const_u64(q))


def reduce_4q_to_2q(v, q: int):
    return cond_sub64(v, const_u64(2 * q))


def reduce_4q_to_q(v, q: int):
    return reduce_2q_to_q(reduce_4q_to_2q(v, q), q)


def reduce_8q_to_4q(v, q: int):
    return cond_sub64(v, const_u64(4 * q))


def reduce_8q_to_2q(v, q: int):
    return reduce_4q_to_2q(reduce_8q_to_4q(v, q), q)


def reduce_8q_to_q(v, q: int):
    return reduce_2q_to_q(reduce_8q_to_2q(v, q), q)


# ---------------------------------------------------------------------------
# Shoup modular multiplication (fast_mul_operators.h:49-70)
# ---------------------------------------------------------------------------


# Which mulhi64 the Shoup multiply uses.  "kara" selects the 12-multiply
# Karatsuba form (vs schoolbook's 16); "approx" the 12-multiply truncated
# schoolbook (quotient error <= 1, repaired by one cond_sub64 inside
# shoup_mul_q2).  Resolved at TRACE time, so flip it (env NTT_MULHI64=
# kara|approx, or set USE_KARA/USE_APPROX before building jitted
# programs) before any jit cache fills.
USE_KARA = os.environ.get("NTT_MULHI64", "") == "kara"
USE_APPROX = os.environ.get("NTT_MULHI64", "") == "approx"


def mulhi64_approx(a: U64Pair, b: U64Pair) -> U64Pair:
    """floor((a*b - a0*b0) / 2^64) = mulhi64(a, b) - e with e in {0, 1}:
    schoolbook with the low*low 32x32 product dropped entirely (a0*b0 <
    2^64, so the 2^64-quotient loses at most 1).  Costs 3 full 32x32
    products (12 native u16-half multiplies) like Karatsuba, but with the
    schoolbook's SHORT carry chain -- the truncated-quotient Shoup trick
    (the quotient slack Harvey's algorithm tolerates, arXiv:1205.2926;
    callers re-establish the [0, 2q) contract with one conditional
    subtract, see shoup_mul_q2)."""
    lh_lo, lh_hi = mul32_full(a[0], b[1])
    hl_lo, hl_hi = mul32_full(a[1], b[0])
    hh_lo, hh_hi = mul32_full(a[1], b[1])
    # limb 1 of (ab - a0*b0) = lh_lo + hl_lo; only its carry survives
    s1 = lh_lo + hl_lo
    c1 = _carry32(lh_lo, hl_lo, s1)
    # limb 2 = lh_hi + hl_hi + hh_lo + c1  (carries into limb 3)
    s2 = lh_hi + hl_hi
    c2 = _carry32(lh_hi, hl_hi, s2)
    s3 = s2 + hh_lo
    c3 = _carry32(s2, hh_lo, s3)
    p2 = s3 + c1
    c4 = _carry32(s3, c1, p2)
    return p2, hh_hi + c2 + c3 + c4


def mulhi64_shoup(a: U64Pair, b: U64Pair) -> U64Pair:
    return mulhi64_kara(a, b) if USE_KARA else mulhi64(a, b)


# Direct Solinas reduction in place of the Shoup multiply, for moduli of
# the form q = 2^e - 2^k + 1 (the headline 0x3fffffffffff0001 = 2^62 -
# 2^16 + 1, fixture 12's 2^51 - 2^17 + 1, ...).  Trace-time switch like
# NTT_MULHI64: env NTT_MULMOD=solinas, or set USE_SOLINAS before jitting.
USE_SOLINAS = os.environ.get("NTT_MULMOD", "") == "solinas"


def solinas_form(q: int):
    """(e, k) if q == 2^e - 2^k + 1 with 0 < k, 2k + 3 <= e and
    32 < e < 63 -- the family where mul_mod_q2_solinas' two-fold
    reduction provably lands in [0, 2q) with no conditional subtract for
    every legal lazy input (t < 8q for the radix-4 family's e <= 61
    moduli; t < 4q for radix-2's e = 62) -- else None."""
    e = q.bit_length()
    c = (1 << e) - q  # = 2^k - 1 for the Solinas family
    k = (c + 1).bit_length() - 1
    if c != (1 << k) - 1 or k == 0 or 2 * k + 3 > e or not 32 < e < 63:
        return None
    return e, k


def mul_mod_q2_solinas(w: U64Pair, t: U64Pair, q: int, e: int, k: int) -> U64Pair:
    """(w*t) mod-q representative in [0, 2q), for q = 2^e - 2^k + 1
    (w < q, t < 8q): full 128-bit product, then two folds of
    2^e === 2^k - 1 (mod q).

    Cost: one mul64_full = 16 native u16-half multiplies, vs the Shoup
    path's 22 (mul64_lo 10 + truncated mulhi 12) -- and no
    preconditioned w_con operand at all, halving twiddle-table traffic.
    Bound chain (worst case t < 8q, legal only for e <= 61; e = 62 is
    radix-2-gated to t < 4q): p < 2^(2e+3); A = p>>e < 2^(e+3) (fits the
    limb pair); fold1 r = A*(2^k - 1) + (p mod 2^e) < 2^(e+k+3) + 2^e
    (3 limbs); A2 = r>>e < 2^(k+3) (one u32); fold2 =
    A2*(2^k - 1) + (r mod 2^e) < 2^(2k+3) + 2^e < 2q whenever
    2k + 3 <= e.  No quotient estimate, no repair subtract."""
    p0, p1, p2, p3 = mul64_full(w, t)
    s = e - 32  # bit e sits at position s of limb 1; 0 < s < 32
    sh = np.uint32(s)
    shc = np.uint32(32 - s)
    mask = np.uint32((1 << s) - 1)
    # A = p >> e (fits 2 limbs: A < 2^(e+1) <= 2^63), B = p mod 2^e
    a_lo = (p1 >> sh) | (p2 << shc)
    a_hi = (p2 >> sh) | (p3 << shc)
    b_lo, b_hi = p0, p1 & mask
    # fold 1 over 3 limbs: r = (A << k) - A + B
    kk = np.uint32(k)
    kc = np.uint32(32 - k)
    t0 = a_lo << kk
    t1 = (a_hi << kk) | (a_lo >> kc)
    t2 = a_hi >> kc
    d0 = t0 - a_lo
    bw0 = (t0 < a_lo).astype(U32)
    d1s = t1 - a_hi
    bw1a = (t1 < a_hi).astype(U32)
    d1 = d1s - bw0
    bw1b = (d1s < bw0).astype(U32)
    d2 = t2 - bw1a - bw1b
    r0 = d0 + b_lo
    c0 = (r0 < d0).astype(U32)
    r1s = d1 + b_hi
    c1a = (r1s < d1).astype(U32)
    r1 = r1s + c0
    c1b = (r1 < r1s).astype(U32)
    r2 = d2 + c1a + c1b
    # fold 2: A2 = r >> e fits one u32 (< 2^(k+1)); result needs no
    # conditional subtract
    a2 = (r1 >> sh) | (r2 << shc)
    f_lo, f_hi = r0, r1 & mask
    m_lo = a2 << kk
    m_hi = a2 >> kc
    # (A2 << k) - A2, 64-bit
    s_lo = m_lo - a2
    sb = (m_lo < a2).astype(U32)
    s_hi = m_hi - sb
    # + B2
    o_lo = f_lo + s_lo
    oc = (o_lo < f_lo).astype(U32)
    return o_lo, f_hi + s_hi + oc


def shoup_mul_q2(w: U64Pair, w_con: U64Pair, t: U64Pair, q: int) -> U64Pair:
    """(w*t - hi64(w_con*t)*q) mod 2^64, in [0, 2q).  The Q*q correction
    uses the constant-multiply specialization (shift/add chain for
    Solinas-form q).

    With NTT_MULHI64=approx, Q comes from mulhi64_approx (underestimated
    by <= 1), the raw result lands in [0, 3q) -- 3q < 2^64 for every
    radix-2-legal q < 2^62 -- and one cond_sub64 restores [0, 2q).  The
    representative can differ from the exact-quotient path by q, so lazy
    outputs are mod-q-equal (strict outputs bit-equal) rather than
    representative-equal.

    With NTT_MULMOD=solinas and a Solinas-form q (solinas_form), the
    Shoup machinery is bypassed entirely by mul_mod_q2_solinas (w_con is
    traced but unused; XLA drops the dead table reads)."""
    if USE_SOLINAS:
        form = solinas_form(q)
        if form is not None:
            return mul_mod_q2_solinas(w, t, q, *form)
    if USE_APPROX:
        big_q = mulhi64_approx(w_con, t)
        r = sub64(mul64_lo(w, t), mul64_lo_const(big_q, q))
        return cond_sub64(r, const_u64(2 * q))
    big_q = mulhi64_shoup(w_con, t)
    return sub64(mul64_lo(w, t), mul64_lo_const(big_q, q))


def shoup_mul_q(w, w_con, t, q: int) -> U64Pair:
    return reduce_2q_to_q(shoup_mul_q2(w, w_con, t, q), q)


def shoup_dbl_mul_q2(w1, w1c, w2, w2c, t1, t2, q: int) -> U64Pair:
    """Fused (t1*w1 + t2*w2) with one correction (fast_mul_operators.h:62-70).
    The u128 sum w1c*t1 + w2c*t2 is formed in 4 limbs; Q = its high 64."""
    p = add128(mul64_full(w1c, t1), mul64_full(w2c, t2))
    big_q = (p[2], p[3])
    acc = add64(mul64_lo(w1, t1), mul64_lo(w2, t2))
    return sub64(acc, mul64_lo_const(big_q, q))


# ---------------------------------------------------------------------------
# word_size=56 Shoup multiplies: the s390x VMSL analog.  The VMSL unit
# multiplies 56x56-bit words into a 112-bit accumulator, so the reference's
# intrinsic radix-4 kernel preconditions with w_con = floor(w << 56 / q) and
# extracts quotients as HIGH_VMSL_WORD = product >> 56
# (include/internal/defs.h:45-59, src/ntt_radix4_s390x_vef.c:43-53).  On TPU
# the same word size maps onto the u32 limb machinery: the quotient is the
# 128-bit limb product shifted right 56.  LOW_VMSL_WORD's 56-bit store mask
# is a no-op here because every result below is provably < 2q < 2^56.
# ---------------------------------------------------------------------------

# Shoup's quotient bound at word size 56 needs t <= 2^56 for the single
# multiply and t1 + t2 <= 2^56 for the fused pair; radix-4 lazy inputs reach
# 8q, so 16q <= 2^56, i.e. q < 2^52.
W56_PATH_MAX_Q_BITS = 52


def _shr128_56(p4) -> U64Pair:
    """Low 64 bits of (p >> 56) for a 128-bit 4-limb value (bit 56 of p is
    bit 24 of limb 1)."""
    lo = (p4[1] >> 24) | (p4[2] << 8)
    hi = (p4[2] >> 24) | (p4[3] << 8)
    return lo, hi


def shoup_mul56_q2(w: U64Pair, w_con: U64Pair, t: U64Pair, q: int) -> U64Pair:
    """(w*t - (w_con*t >> 56)*q) mod 2^64, in [0, 2q) for t <= 2^56 and
    w_con = floor(w << 56 / q) (fast_mul_operators.h fast_mul_mod_q2 with
    L_HIGH_WORD = HIGH_VMSL_WORD, src/ntt_radix4_s390x_vef.c:6)."""
    big_q = _shr128_56(mul64_full(w_con, t))
    return sub64(mul64_lo(w, t), mul64_lo_const(big_q, q))


def shoup_dbl_mul56_q2(w1, w1c, w2, w2c, t1, t2, q: int) -> U64Pair:
    """Fused (t1*w1 + t2*w2) at word size 56: one quotient from the 112-bit
    accumulated constant products, exactly the VMSL extended_shoup_multiply
    (src/ntt_radix4_s390x_vef.c:43-53: vec_msum_u128 dot product, shift by
    56, one neg_q correction).  Result in [0, 2q) for t1 + t2 <= 2^56."""
    p = add128(mul64_full(w1c, t1), mul64_full(w2c, t2))
    big_q = _shr128_56(p)
    acc = add64(mul64_lo(w1, t1), mul64_lo(w2, t2))
    return sub64(acc, mul64_lo_const(big_q, q))


# ---------------------------------------------------------------------------
# Single-lane uint32 fast path: q < 2^30, word_size=32 Shoup constants.
# Valid because Shoup's bound needs t <= 2^32 and our lazy inputs stay
# < 4q < 2^32 (radix-4's dual-Shoup needs t1+t2 < 16q <= 2^32, i.e. q < 2^28).
# ---------------------------------------------------------------------------

U32_PATH_MAX_Q_BITS_R2 = 30  # Shoup needs t < 4q <= 2^32
U32_PATH_MAX_Q_BITS_R4 = 28  # dual-Shoup needs t1+t2 < 16q <= 2^32 for Y1 < 2q


def solinas_form32(q: int):
    """(e, k) if q == 2^e - 2^k + 1 with 0 < k, 2k + 3 <= e <= 29 -- the
    single-lane analog of solinas_form (e <= 29 keeps A = p>>e < 2^(e+3)
    inside one u32 for lazy inputs up to 8q) -- else None."""
    e = q.bit_length()
    c = (1 << e) - q
    k = (c + 1).bit_length() - 1
    if c != (1 << k) - 1 or k == 0 or 2 * k + 3 > e or e > 29:
        return None
    return e, k


def mul_mod32_q2_solinas(w, t, q: int, e: int, k: int):
    """(w*t) mod-q representative in [0, 2q) for single-lane Solinas
    moduli q = 2^e - 2^k + 1 (w < q, t < 8q): full 32x32 product (4
    native u16-half multiplies, vs the Shoup path's 10) + two
    2^e === 2^k - 1 folds.  Same bound chain as mul_mod_q2_solinas with
    one-limb A (e <= 29) and a limb-pair fold-1 intermediate."""
    p_lo, p_hi = mul32_full(w, t)
    sh = np.uint32(e)
    shc = np.uint32(32 - e)
    mask = np.uint32((1 << e) - 1)
    a = (p_lo >> sh) | (p_hi << shc)  # A = p >> e < 2^(e+3) <= 2^32
    b = p_lo & mask
    # fold 1 (pair): r = (A << k) - A + B < 2^(e+k+3) + 2^e
    kk = np.uint32(k)
    kc = np.uint32(32 - k)
    t_lo = a << kk
    t_hi = a >> kc
    d_lo = t_lo - a
    bw = (t_lo < a).astype(U32)
    d_hi = t_hi - bw
    r_lo = d_lo + b
    c0 = (r_lo < d_lo).astype(U32)
    r_hi = d_hi + c0
    # fold 2: A2 = r >> e < 2^(k+3); result < 2^(2k+3) + 2^e < 2q
    a2 = (r_lo >> sh) | (r_hi << shc)
    return (r_lo & mask) + ((a2 << kk) - a2)


def shoup_mul32_q2(w, w_con, t, q: int):
    """Single-lane Shoup multiply with 32-bit preconditioning; result < 2q.
    With NTT_MULMOD=solinas and a Solinas-form q, replaced at trace time
    by the direct two-fold reduction (w_con unused; see shoup_mul_q2)."""
    if USE_SOLINAS:
        form = solinas_form32(q)
        if form is not None:
            return mul_mod32_q2_solinas(w, t, q, *form)
    big_q = mulhi32(w_con, t)
    return w * t - big_q * np.uint32(q)


def cond_sub32(v, kq: int):
    """v if v < kq else v - kq.  (The reference's unsigned-min trick,
    reduce_if_greater avx512.h:43, is NOT used: Mosaic cannot legalize
    vector arith.minui, and XLA lowers this select just as well.)"""
    kqc = np.uint32(kq)
    return jnp.where(v < kqc, v, v - kqc)


def barrett_reduce32(v, q: int):
    """Full reduction of any uint32 value to [0, q), q < 2^31: Barrett with
    mu = floor(2^32 / q) gives r = v - q*floor(v*mu/2^32) in [0, 3q), then
    two conditional subtracts."""
    mu = np.uint32((1 << 32) // q)
    r = v - mulhi32(mu, v) * np.uint32(q)
    return cond_sub32(cond_sub32(r, 2 * q), q)


def reduce32(v, q: int, from_factor: int):
    """Reduce v < from_factor*q down to [0, q) by conditional subtracts."""
    f = from_factor
    while f > 1:
        f >>= 1
        v = cond_sub32(v, f * q)
    return v


# ---------------------------------------------------------------------------
# Variable x variable modular multiply (for pointwise products in the NTT
# domain -- Shoup needs a precomputed constant per multiplicand, so the
# butterfly machinery doesn't apply; these use power-of-2^32 residue
# splitting with Shoup-by-constant folds instead).
# ---------------------------------------------------------------------------


def mul_mod_q32(a, b, q: int):
    """(a * b) mod q for uint32 arrays a, b < q < 2^30, strict output.

    Split the 64-bit product hi*2^32 + lo; fold hi with the precomputed
    constant 2^32 mod q (Shoup), reduce lo with Barrett."""
    lo, hi = mul32_full(a, b)
    c32 = (1 << 32) % q
    c32_con = (c32 << 32) // q
    t = shoup_mul32_q2(np.uint32(c32), np.uint32(c32_con), hi, q)  # < 2q
    r = t + barrett_reduce32(lo, q)  # < 3q < 2^32
    return cond_sub32(cond_sub32(r, 2 * q), q)


def mul_mod_q(a: U64Pair, b: U64Pair, q: int) -> U64Pair:
    """(a * b) mod q for u64 limb pairs a, b < q, any q in [2, 2^62),
    strict output.

    The 128-bit product p3:p2:p1:p0 is folded as
    p3*(2^96 mod q) + p2*(2^64 mod q) + p1*(2^32 mod q) + p0 using
    Shoup-by-constant multiplies (each < 2q) with interleaved lazy
    reductions.  The low limb p0 < 2^32 is reduced below q FIRST (it may
    be many multiples of q when q is small), so the accumulator is
    always < 3q < 2^64 and two conditional subtracts finish the job."""
    p0, p1, p2, p3 = mul64_full(a, b)
    folds = []
    for k, limb in ((3, p3), (2, p2), (1, p1)):
        c = (1 << (32 * k)) % q
        c_con = (c << 64) // q
        folds.append(
            shoup_mul_q2(const_u64(c), const_u64(c_con), (limb, jnp.zeros_like(limb)), q)
        )
    acc = reduce_4q_to_2q(add64(folds[0], folds[1]), q)  # < 2q
    acc = reduce_4q_to_2q(add64(acc, folds[2]), q)  # < 2q
    if q < (1 << 31):
        p0r = barrett_reduce32(p0, q)  # < q
    elif q < (1 << 32):
        p0r = cond_sub32(p0, q)  # p0 < 2^32 < 2q -> < q
    else:
        p0r = p0  # p0 < 2^32 <= q already
    acc = add64(acc, (p0r, jnp.zeros_like(p0r)))  # < 3q < 2^64
    acc = cond_sub64(acc, const_u64(2 * q))
    return reduce_2q_to_q(acc, q)
