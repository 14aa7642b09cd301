"""Parameters for negacyclic NTT over R_q[X]/(X^N + 1), N = 2^m.

This module holds:
  * ``NttParams`` -- the (q, m, w, w_inv, n_inv) tuple that fully defines a
    transform instance (parity with the reference's ``test_case_t``,
    /root/reference/tests/test_cases.h:62-111).
  * ``FIXTURES`` -- the 19 fixed test cases from the reference
    (/root/reference/tests/test_cases.h:145-208).  These are mathematical
    facts (prime moduli and primitive 2N-th roots of unity) used as the
    parity oracle for every kernel in this framework.
  * deterministic prime / root generators so that arbitrary (q_bits, m)
    instances (e.g. the 62-bit benchmark modulus, or N=2^20..2^24
    distributed cases) can be created without external tooling.

Everything here is host-side Python (exact big-int arithmetic); nothing in
this file runs on device.
"""

from __future__ import annotations

import dataclasses
import functools

WORD_SIZE = 64  # reference scalar word size (include/internal/defs.h:44)


def is_probable_prime(n: int) -> bool:
    """Deterministic Miller-Rabin for n < 3.3e24 (covers all 64-bit ints)."""
    if n < 2:
        return False
    small_primes = (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37)
    for p in small_primes:
        if n % p == 0:
            return n == p
    d = n - 1
    r = 0
    while d % 2 == 0:
        d //= 2
        r += 1
    # This witness set is deterministic for n < 3,317,044,064,679,887,385,961,981
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def find_ntt_prime(bits: int, m: int, skip: int = 0) -> int:
    """Largest prime q < 2^bits with 2^(m+1) | q - 1 (so a 2N-th root
    exists); with skip > 0, the (skip+1)-th largest such prime -- used by
    the RNS layer to build towers of distinct moduli deterministically."""
    two_n = 1 << (m + 1)
    # q = k * 2N + 1
    k = ((1 << bits) - 1) // two_n
    while k > 0:
        q = k * two_n + 1
        if q < (1 << bits) and is_probable_prime(q):
            if skip == 0:
                return q
            skip -= 1
        k -= 1
    raise ValueError(f"no NTT prime with bits={bits}, m={m}")


def find_solinas_ntt_prime(bits: int, m: int) -> int:
    """Largest prime q = 2^bits - 2^k + 1 (NAF weight 3) with
    2^(m+1) | q - 1, i.e. k >= m + 1.

    Moduli of this shape keep every Shoup correction multiply Q*q on the
    shift/add NAF chain (modmath.mul64_lo_const) instead of the generic
    6-multiply product the weight-capped fallback uses.  The chain's win
    is measured at N=2^14 (5.0 -> 4.82 us/t on the weight-3 headline
    modulus); at N=2^16 an interleaved A/B found NO measurable difference
    (session variance 29.6-39.5 us/t swamps it,
    artifacts/SOLINAS_Q_M16_AB_r03.log).  HE deployments choose their
    moduli, so prefer this to find_ntt_prime when the exact bit pattern
    is free -- it costs nothing and enables the chain where it pays:
    e.g. 2^62 - 2^46 + 1 is prime and serves every N up to 2^45.
    Raises if no such prime exists for (bits, m)."""
    for k in range(m + 1, bits - 1):
        q = (1 << bits) - (1 << k) + 1
        if is_probable_prime(q):
            return q
    raise ValueError(f"no Solinas NTT prime 2^{bits} - 2^k + 1 with k >= {m + 1}")


def find_ntt_primes(bits: int, m: int, count: int) -> list[int]:
    """The `count` largest primes q < 2^bits with 2^(m+1) | q - 1, in one
    descending scan (the multi-prime form of find_ntt_prime; used by the
    RNS layer to build towers without re-scanning per channel)."""
    two_n = 1 << (m + 1)
    k = ((1 << bits) - 1) // two_n
    out: list[int] = []
    while k > 0 and len(out) < count:
        q = k * two_n + 1
        if q < (1 << bits) and is_probable_prime(q):
            out.append(q)
        k -= 1
    if len(out) < count:
        raise ValueError(f"only {len(out)} NTT primes with bits={bits}, m={m}")
    return out


def primitive_2n_root(q: int, m: int) -> int:
    """Minimum primitive 2N-th root of unity mod q, N = 2^m.

    Mirrors the sagemath recipe documented in the reference
    (/root/reference/tests/test_cases.h:113-142): take a generator g of
    Z_q^*, set w = g^((q-1)/2N), then minimize over the odd powers
    w^(2i+1) (all of which are primitive 2N-th roots).
    """
    n = 1 << m
    two_n = 2 * n
    assert (q - 1) % two_n == 0, "q-1 must be divisible by 2N"
    # factor q-1 enough to test generators: we only need an element of exact
    # order 2N; candidate c = g^((q-1)/2N) has order dividing 2N, and order
    # exactly 2N iff c^N != 1.
    exp = (q - 1) // two_n
    g = 2
    while True:
        c = pow(g, exp, q)
        if c != 1 and pow(c, n, q) == q - 1:
            break
        g += 1
        if g > 1000:
            raise ValueError("no generator found (q not prime?)")
    # minimize over all primitive roots c^(2i+1)
    w_min = c
    cur = c
    c2 = c * c % q
    for _ in range(n):
        cur = cur * c2 % q
        if cur < w_min:
            w_min = cur
    return w_min


@dataclasses.dataclass(frozen=True)
class NttParams:
    """A single negacyclic-NTT instance (parity: test_case_t fields m,q,w,
    w_inv, n_inv.op at /root/reference/tests/test_cases.h:62-68)."""

    m: int  # N = 2^m
    q: int  # prime modulus
    w: int  # primitive 2N-th root of unity mod q
    w_inv: int  # w^-1 mod q
    n_inv: int  # N^-1 mod q

    @property
    def n(self) -> int:
        return 1 << self.m

    def validate(self) -> None:
        n, q, w = self.n, self.q, self.w
        assert is_probable_prime(q), f"q={q:#x} not prime"
        assert pow(w, n, q) == q - 1, "w is not a primitive 2N-th root"
        assert self.w_inv == pow(w, -1, q)
        assert self.n_inv == pow(n, -1, q)

    @classmethod
    def make(cls, q: int, m: int, w: int | None = None) -> "NttParams":
        if m < 1:
            raise ValueError(f"m must be >= 1 (N = 2^m >= 2), got {m}")
        if w is None:
            w = primitive_2n_root(q, m)
        return cls(m=m, q=q, w=w, w_inv=pow(w, -1, q), n_inv=pow(1 << m, -1, q))

    @classmethod
    def generate(cls, q_bits: int, m: int, skip: int = 0) -> "NttParams":
        """Deterministically generate an instance with a q_bits-bit modulus
        (skip > 0 selects successive distinct primes, see find_ntt_prime)."""
        return cls.make(find_ntt_prime(q_bits, m, skip), m)


def _fx(m: int, q: int, w: int, w_inv: int, n_inv: int) -> NttParams:
    return NttParams(m=m, q=q, w=w, w_inv=w_inv, n_inv=n_inv)


# The 19 reference fixtures (/root/reference/tests/test_cases.h:145-208).
# q spans 13..51 bits, N = 2^8..2^17; odd and even m exercise the radix-4
# remainder paths; m mod 4 in {0,1,2,3} exercises the radix-4x4 switch.
FIXTURES: tuple[NttParams, ...] = (
    _fx(8, 0x1E01, 62, 1115, 7651),
    _fx(9, 0x10001, 431, 55045, 65409),
    _fx(10, 0x10001, 33, 1986, 65473),
    _fx(11, 0x10001, 21, 49933, 65505),
    _fx(12, 0x10001, 13, 15124, 65521),
    _fx(13, 0x10001, 15, 30584, 65529),
    _fx(14, 0x10001, 9, 7282, 65533),
    _fx(14, 0xC0001, 9, 174763, 786385),
    _fx(14, 0xFFF0001, 10360, 28987060, 268353541),
    _fx(14, 0x1FFC8001, 101907, 42191135, 536608783),
    _fx(14, 0x7FFE0001, 320878, 74168714, 2147221513),
    _fx(14, 0xFFF88001, 263641, 243522111, 4294213663),
    _fx(14, 0x7FFFFFFFE0001, 83051296654, 374947202223591, 2251662374600713),
    _fx(14, 0x80000001C0001, 72703961923, 153477749218715, 2251662376566673),
    _fx(15, 0x10001, 3, 21846, 65535),
    _fx(15, 0x80000001C0001, 82138512871, 535648572761016, 2251731096043465),
    _fx(16, 0x7FFE0001, 1859, 1579037640, 2147319811),
    _fx(16, 0x7FFFFFFFE0001, 29454831443, 520731633805630, 2251765453815811),
    _fx(17, 0x100180001, 79247, 4203069932, 4296507381),
)


@functools.lru_cache(maxsize=None)
def bench_params(m: int = 14, q_bits: int = 62, solinas: bool = False) -> NttParams:
    """The benchmark instance from BASELINE.md: N=2^14 with a 62-bit q.

    solinas=True picks the largest NAF-weight-3 prime instead of the
    largest prime (find_solinas_ntt_prime) -- identical at the m=14
    headline (the largest 62-bit NTT prime IS 2^62 - 2^16 + 1), but at
    e.g. m=16 it swaps the weight-4 largest prime for 2^62 - 2^46 + 1."""
    if solinas:
        p = NttParams.make(find_solinas_ntt_prime(q_bits, m), m)
    else:
        p = NttParams.generate(q_bits, m)
    p.validate()
    return p


@functools.lru_cache(maxsize=None)
def dist_params(m: int, q_bits: int = 30) -> NttParams:
    """Parameters for distributed six-step cases (N = 2^20 .. 2^24)."""
    p = NttParams.generate(q_bits, m)
    p.validate()
    return p
