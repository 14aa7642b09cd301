"""Twiddle-plan builders (host-side, exact big-int arithmetic).

Semantic parity with /root/reference/include/internal/pre_compute.h: the
reference caches, per (q, m), a family of twiddle tables -- bit-reversed
root powers, Shoup preconditioned constants at a given word size, and
several kernel-specific expanded memory layouts.  In this framework each
SIMD-era layout becomes a pure function producing NumPy arrays whose
layout matches the consuming TPU kernel's access pattern.

All builders use Python big-int arithmetic (exact, no 128-bit tricks) and
return np.uint64 arrays.  They are cached per (q, m) by plan.py.
"""

from __future__ import annotations

import numpy as np


def bit_rev_idx(idx: int, width: int) -> int:
    """Reverse the low `width` bits of idx (pre_compute.h:16-26)."""
    r = 0
    for _ in range(width):
        r = (r << 1) | (idx & 1)
        idx >>= 1
    return r


def bit_rev_perm(n: int) -> np.ndarray:
    """Permutation p with p[i] = bitrev(i) over log2(n) bits."""
    width = n.bit_length() - 1
    p = np.zeros(n, dtype=np.int64)
    for i in range(n):
        p[i] = bit_rev_idx(i, width)
    return p


def calc_w(w: int, n: int, q: int) -> np.ndarray:
    """Bit-reversed table of w^i mod q, i in [0, N) (pre_compute.h:38-51)."""
    powers = [0] * n
    cur = 1
    for i in range(n):
        powers[i] = cur
        cur = cur * w % q
    out = np.zeros(n, dtype=np.uint64)
    width = n.bit_length() - 1
    for i in range(n):
        out[bit_rev_idx(i, width)] = powers[i]
    return out


def calc_w_inv(w_inv: int, n: int, q: int) -> np.ndarray:
    """Same for the inverse root (pre_compute.h:53-66)."""
    return calc_w(w_inv, n, q)


def calc_w_con(w_tab: np.ndarray, q: int, word_size: int = 64) -> np.ndarray:
    """Shoup constants floor(w_i << word_size / q) (pre_compute.h:68-77).

    word_size parameterizes the preconditioning exactly like the reference
    (64 scalar / 56 VMSL / 52 IFMA); this framework additionally uses 32
    for the single-lane uint32 fast path (q < 2^30).
    """
    out = np.zeros(w_tab.shape, dtype=np.uint64)
    flat = out.reshape(-1)
    src = w_tab.reshape(-1)
    for i in range(src.shape[0]):
        flat[i] = (int(src[i]) << word_size) // q
    return out


def calc_ninv_con(n_inv: int, q: int, word_size: int = 64) -> int:
    """(pre_compute.h:79-83)."""
    return (n_inv << word_size) // q


def expand_w(w_tab: np.ndarray, q: int) -> np.ndarray:
    """Radix-4 expanded table, 2N entries (pre_compute.h:85-105).

    Interleaves w[i] with the fused products the 5-twiddle radix-4
    butterfly needs: even slots hold w[i/2]; odd slots alternate between
    (w[i/2-of-pair] * w[i/2]) mod q and its negation q - (...).
    """
    n = w_tab.shape[0]
    w = [int(x) for x in w_tab]
    out = np.zeros(2 * n, dtype=np.uint64)
    out[0] = w[0]
    out[1] = 0
    out[2] = w[1]
    out[3] = 0
    ei = [int(x) for x in out]  # big-int mirror for exact products
    for i in range(4, 2 * n, 2):
        ei[i] = w[i // 2]
        if i % 4 == 0:
            t = ei[i // 2]
            ei[i + 1] = (t * w[i // 2]) % q
        else:
            t = ei[(i - 2) // 2]
            ei[i + 1] = q - ((t * w[i // 2]) % q)
    return np.array(ei, dtype=np.uint64)


def expand_w_hexl(w_tab: np.ndarray) -> np.ndarray:
    """HEXL-layout table, 2N entries (tail zero-padded); pre_compute.h:109-137.

    Layout: [0, N/8) verbatim; [N/8, N/4) each entry x4; [N/4, N/2) each
    entry x2; [N/2, N) verbatim.  Total used = 13N/8.
    """
    n = w_tab.shape[0]
    out = np.zeros(2 * n, dtype=np.uint64)
    idx = 0
    out[idx : idx + n // 8] = w_tab[: n // 8]
    idx += n // 8
    out[idx : idx + n // 2] = np.repeat(w_tab[n // 8 : n // 4], 4)
    idx += n // 2
    out[idx : idx + n // 2] = np.repeat(w_tab[n // 4 : n // 2], 2)
    idx += n // 2
    out[idx : idx + n // 2] = w_tab[n // 2 :]
    return out


# Canonical emission orders of the SIMD layouts (single source of truth;
# kernels and layout descriptors derive their inverses from these):
# permute_w's 8-lane shuffle (pre_compute.h:139-152) ...
LANE_PERM = np.array([0, 4, 1, 5, 2, 6, 3, 7])
# ... and the FwdT2 per-4-group emission order (the (0,0,2,2,1,1,3,3)
# pattern is T2_GROUP_ORDER with each entry duplicated).
T2_GROUP_ORDER = np.array([0, 2, 1, 3])
_LANE_PERM = LANE_PERM  # internal alias used by the builders below


def _quintuple(w, w_idx: int, q: int) -> list[int]:
    """The 5-twiddle group {w1, w2, w1*w2, w3, -(w1*w3)} for head index
    w_idx (shared by all r4 expansions, pre_compute.h:169-177)."""
    w1 = int(w[w_idx])
    w2 = int(w[2 * w_idx])
    w3 = int(w[2 * w_idx + 1])
    return [w1, w2, (w1 * w2) % q, w3, q - ((w1 * w3) % q)]


def expand_w_r4(w_tab: np.ndarray, q: int, unordered: bool = False) -> np.ndarray:
    """Vector-friendly radix-4 table, 5N entries (pre_compute.h:154-251).

    Three regions mirroring the consuming kernel's stage regimes:
      FWD8: one quintuple per butterfly group while t >= 8;
      FWD4: two-pair broadcast groups of 10 for the t == 4 stage;
      FWD1: 8-lane-vectorized quintuples (5 x 8 per group, 8-aligned) for
            the t == 1 stage, optionally lane-permuted for the unordered
            variant.
    """
    n = w_tab.shape[0]
    w = [int(x) for x in w_tab]
    out = np.zeros(5 * n, dtype=np.uint64)
    new_idx = 1
    even = (n.bit_length() - 1) % 2 == 0

    # FWD8 region
    if even:
        w_idx = 1
        m = 1
    else:
        out[1] = w[1]  # leading radix-2 stage twiddle
        new_idx = 2
        w_idx = 2
        m = 2
    while w_idx < (n >> 5):
        for _ in range(m):
            out[new_idx : new_idx + 5] = np.array(
                _quintuple(w, w_idx, q), dtype=np.uint64
            )
            new_idx += 5
            w_idx += 1
        w_idx = 4 * m
        m <<= 2

    # FWD4 region: pairs (w_idx, w_idx+1) with interleaved products
    for w_idx in range(n >> 4, n >> 3, 2):
        k = 2 * w_idx
        vals = [
            w[w_idx],
            w[w_idx + 1],
            w[k],
            w[k + 2],
            (w[w_idx] * w[k]) % q,
            (w[w_idx + 1] * w[k + 2]) % q,
            w[k + 1],
            w[k + 3],
            q - ((w[w_idx] * w[k + 1]) % q),
            q - ((w[w_idx + 1] * w[k + 3]) % q),
        ]
        out[new_idx : new_idx + 10] = np.array(vals, dtype=np.uint64)
        new_idx += 10

    # Align to the next 8-entry boundary
    new_idx = ((new_idx >> 3) << 3) + 8

    # FWD1 region: per 8-group, five 8-lane vectors W1..W5
    for w_idx in range(n >> 2, n >> 1, 8):
        block = np.zeros((5, 8), dtype=np.uint64)
        for i in range(8):
            qt = _quintuple(w, w_idx + i, q)
            block[:, i] = qt
        if unordered:
            block = block[:, _LANE_PERM]
        out[new_idx : new_idx + 40] = block.reshape(-1)
        new_idx += 40
    return out


def twist_tables_rec(psi: int, q: int, n: int, l1_log: int):
    """Factored twist tables for the two-level (recursive) six-step.

    Derivation (extends docs/DESIGN.md section 2): with N = N1*N2 and the
    coefficient vector viewed (N1, N2), the flat kernel's row stages for
    N1-axis position c are a size-N2 negacyclic NTT (global table prefix
    w[1:N2], root psi^N1) applied to the input TWISTED by
    gamma_c^{n2}, where

        gamma_c = psi^{2*rev(c) + 1 - N1}   (exponent mod 2N).

    Proof sketch: the folded stage-s' twiddle w[2^s'*N1 + c*2^s' + g]
    factors (by the bit-reversed index map) into the plain size-N2 stage
    twiddle times gamma_c^{N2 / 2^{s'+1}}, and pulling an input twist
    gamma^{n2} through a DIT network multiplies stage-s' twiddles by
    exactly gamma^{N2/2^{s'+1}}.  Verified bit-exactly against the flat
    kernel in tests (this is the TPU form of HEXL's depth-first recursion,
    third_party/hexl/fwd-ntt-avx512.c:310-328: no materialized working set
    exceeds the fast regime).

    Returns (A, B) uint64 arrays of shapes (N1, HI) and (N1, LO) with
    HI*LO = N2 and T[c, h*LO + l] = A[c, h] * B[c, l] mod q -- the
    factored form keeps device tables O(N1*sqrt(N2)) instead of O(N)
    (8 MB instead of 128 MB at N = 2^24).  Pass psi = w for the forward
    twist, psi = w_inv for the inverse un-twist (gamma_c^{-n2})."""
    logn = n.bit_length() - 1
    n1 = 1 << l1_log
    l2 = logn - l1_log
    lo_log = (l2 + 1) // 2
    lo, hi = 1 << lo_log, 1 << (l2 - lo_log)
    two_n = 2 * n
    a_tab = np.zeros((n1, hi), dtype=np.uint64)
    b_tab = np.zeros((n1, lo), dtype=np.uint64)
    for c in range(n1):
        g = pow(psi, (2 * bit_rev_idx(c, l1_log) + 1 - n1) % two_n, q)
        cur = 1
        for j in range(lo):
            b_tab[c, j] = cur
            cur = cur * g % q
        gh = pow(g, lo, q)
        cur = 1
        for j in range(hi):
            a_tab[c, j] = cur
            cur = cur * gh % q
    return a_tab, b_tab


def expand_w_r4r2(w_tab: np.ndarray, q: int) -> np.ndarray:
    """Mixed radix-4 heads + fused radix-2 tail table, 5N entries
    (pre_compute.h:253-324): radix-4 quintuples while t > N/16, then
    HEXL-style duplicated tables for the last four radix-2 stages."""
    n = w_tab.shape[0]
    w = [int(x) for x in w_tab]
    out = np.zeros(5 * n, dtype=np.uint64)
    new_idx = 1
    w_idx = 1
    t = n >> 4
    m = 1
    while w_idx < t:
        for _ in range(m):
            out[new_idx : new_idx + 5] = np.array(
                _quintuple(w, w_idx, q), dtype=np.uint64
            )
            new_idx += 5
            w_idx += 1
        w_idx = 4 * m
        m <<= 2

    new_idx = ((new_idx >> 3) << 3) + 8

    even = (n.bit_length() - 1) % 2 == 0
    if even:
        out[new_idx : new_idx + t] = w_tab[w_idx : w_idx + t]
        new_idx += t

    t <<= 1
    out[new_idx : new_idx + 4 * t] = np.repeat(w_tab[t : 2 * t], 4)
    new_idx += 4 * t
    t <<= 1
    # FwdT2: pairs in shuffled order (0,0,2,2,1,1,3,3)
    for i in range(0, t, 4):
        grp = [w[t + i + 0]] * 2 + [w[t + i + 2]] * 2 + [w[t + i + 1]] * 2 + [
            w[t + i + 3]
        ] * 2
        out[new_idx : new_idx + 8] = np.array(grp, dtype=np.uint64)
        new_idx += 8
    t <<= 1
    # FwdT1: 8-lane interleave (0,4,1,5,2,6,3,7)
    for i in range(0, t, 8):
        grp = np.array([w[t + i + k] for k in range(8)], dtype=np.uint64)
        out[new_idx : new_idx + 8] = grp[_LANE_PERM]
        new_idx += 8
    return out


def expand_w_r2_16(w_tab: np.ndarray) -> np.ndarray:
    """Radix-2 table with x4/x2-duplicated and lane-interleaved last-4-stage
    entries, 3N entries (pre_compute.h:326-367)."""
    n = w_tab.shape[0]
    w = [int(x) for x in w_tab]
    out = np.zeros(3 * n, dtype=np.uint64)
    t = n >> 3
    out[:t] = w_tab[:t]
    new_idx = t
    out[new_idx : new_idx + 4 * t] = np.repeat(w_tab[t : 2 * t], 4)
    new_idx += 4 * t
    t <<= 1
    for i in range(0, t, 4):
        grp = [w[t + i + 0]] * 2 + [w[t + i + 2]] * 2 + [w[t + i + 1]] * 2 + [
            w[t + i + 3]
        ] * 2
        out[new_idx : new_idx + 8] = np.array(grp, dtype=np.uint64)
        new_idx += 8
    t <<= 1
    for i in range(0, t, 8):
        grp = np.array([w[t + i + k] for k in range(8)], dtype=np.uint64)
        out[new_idx : new_idx + 8] = grp[_LANE_PERM]
        new_idx += 8
    return out
