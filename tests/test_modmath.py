"""Property tests for the u32-limb arithmetic against exact Python ints.

This is the TPU analog of running the reference under UBSAN: the
hand-rolled carry chains in modmath.py are exactly where silent overflow
bugs would live (SURVEY.md section 5, "race detection" row)."""

import numpy as np
import pytest

from ntt_tpu import modmath as mm
from ntt_tpu.params import FIXTURES

M64 = (1 << 64) - 1


def _rand_u64(rng, n, edge=True):
    x = rng.integers(0, 1 << 63, size=n, dtype=np.uint64) | (
        rng.integers(0, 2, size=n, dtype=np.uint64) << np.uint64(63)
    )
    if edge:
        x[:8] = [0, 1, 2, M64, M64 - 1, 1 << 32, (1 << 32) - 1, (1 << 63)]
    return x


@pytest.fixture(scope="module")
def pairs():
    rng = np.random.default_rng(7)
    a = _rand_u64(rng, 4096)
    b = _rand_u64(rng, 4096)
    np.random.default_rng(8).shuffle(b)
    return a, b


def test_roundtrip_representation(pairs):
    a, _ = pairs
    np.testing.assert_array_equal(mm.to_u64(mm.from_u64(a)), a)


def test_mul32_full(pairs):
    rng = np.random.default_rng(9)
    a = rng.integers(0, 1 << 32, size=2048, dtype=np.uint64).astype(np.uint32)
    b = rng.integers(0, 1 << 32, size=2048, dtype=np.uint64).astype(np.uint32)
    import jax.numpy as jnp

    lo, hi = mm.mul32_full(jnp.asarray(a), jnp.asarray(b))
    prod = a.astype(np.uint64) * b.astype(np.uint64)
    np.testing.assert_array_equal(np.asarray(lo), (prod & 0xFFFFFFFF).astype(np.uint32))
    np.testing.assert_array_equal(np.asarray(hi), (prod >> 32).astype(np.uint32))


def test_add_sub_mul64(pairs):
    a, b = pairs
    pa, pb = mm.from_u64(a), mm.from_u64(b)
    ia = a.astype(object)
    ib = b.astype(object)
    np.testing.assert_array_equal(
        mm.to_u64(mm.add64(pa, pb)).astype(object), (ia + ib) & M64
    )
    np.testing.assert_array_equal(
        mm.to_u64(mm.sub64(pa, pb)).astype(object), (ia - ib) & M64
    )
    np.testing.assert_array_equal(
        mm.to_u64(mm.mul64_lo(pa, pb)).astype(object), (ia * ib) & M64
    )
    np.testing.assert_array_equal(
        mm.to_u64(mm.mulhi64(pa, pb)).astype(object), (ia * ib) >> 64
    )


def test_mulhi64_kara(pairs):
    """Karatsuba mulhi64 (12 multiplies) == schoolbook mulhi64 == big-int."""
    a, b = pairs
    pa, pb = mm.from_u64(a), mm.from_u64(b)
    np.testing.assert_array_equal(
        mm.to_u64(mm.mulhi64_kara(pa, pb)).astype(object),
        (a.astype(object) * b.astype(object)) >> 64,
    )


def test_mulhi64_approx(pairs):
    """Truncated-schoolbook mulhi64 (12 multiplies): exact quotient of
    (a*b - a0*b0) / 2^64, i.e. mulhi64 minus an error in {0, 1}."""
    a, b = pairs
    pa, pb = mm.from_u64(a), mm.from_u64(b)
    got = mm.to_u64(mm.mulhi64_approx(pa, pb)).astype(object)
    exact = (a.astype(object) * b.astype(object)) >> 64
    err = exact - got
    assert ((err == 0) | (err == 1)).all()
    # the dropped term is precisely a0*b0: (ab - a0b0) >> 64 must match
    a0 = a.astype(object) & 0xFFFFFFFF
    b0 = b.astype(object) & 0xFFFFFFFF
    want = (a.astype(object) * b.astype(object) - a0 * b0) >> 64
    np.testing.assert_array_equal(got, want)


def test_shoup_mul_q2_approx(pairs):
    """The NTT_MULHI64=approx Shoup path: mod-q exact and within [0, 2q)
    for every radix-2-legal q width (the repair cond_sub needs 3q < 2^64,
    true for q < 2^62)."""
    _, b = pairs
    for q in (0x1FFC8001, 0x7FFFFFFFE0001, (1 << 62) - (1 << 16) + 1):
        rng = np.random.default_rng(q & 0xFFFF)
        w = rng.integers(0, q, size=b.shape[0], dtype=np.uint64)
        wc = np.array([(int(x) << 64) // q for x in w], dtype=np.uint64)
        t = rng.integers(0, 4 * q, size=b.shape[0], dtype=np.uint64)
        old = mm.USE_APPROX
        mm.USE_APPROX = True
        try:
            r = mm.to_u64(
                mm.shoup_mul_q2(mm.from_u64(w), mm.from_u64(wc),
                                mm.from_u64(t), q)
            )
        finally:
            mm.USE_APPROX = old
        want = (w.astype(object) * t.astype(object)) % q
        np.testing.assert_array_equal(r.astype(object) % q, want)
        assert (r < np.uint64(2 * q)).all()


def test_solinas_form():
    assert mm.solinas_form((1 << 62) - (1 << 16) + 1) == (62, 16)
    assert mm.solinas_form((1 << 51) - (1 << 17) + 1) == (51, 17)
    assert mm.solinas_form(0x80000001C0001) is None  # dense fixture 13
    assert mm.solinas_form(0x10001) is None  # e <= 32
    assert mm.solinas_form((1 << 62) - (1 << 30) + 1) is None  # 2k+3 > e


def test_mul_mod_q2_solinas(pairs):
    """Direct Solinas reduction: mod-q exact and < 2q over the full legal
    lazy input range (t < 8q; t < 4q for the radix-2-only e=62)."""
    n = pairs[0].shape[0]
    for q, tf in (((1 << 62) - (1 << 16) + 1, 4),
                  ((1 << 51) - (1 << 17) + 1, 8)):
        e, k = mm.solinas_form(q)
        rng = np.random.default_rng(e)
        w = rng.integers(0, q, size=n, dtype=np.uint64)
        t = rng.integers(0, tf * q, size=n, dtype=np.uint64)
        t[:4] = np.arange(4, dtype=np.uint64)
        t[4:8] = np.uint64(tf * q - 1) - np.arange(4, dtype=np.uint64)
        r = mm.to_u64(
            mm.mul_mod_q2_solinas(mm.from_u64(w), mm.from_u64(t), q, e, k)
        )
        want = (w.astype(object) * t.astype(object)) % q
        np.testing.assert_array_equal(r.astype(object) % q, want)
        assert (r < np.uint64(2 * q)).all()


def test_mul_mod32_q2_solinas():
    """Single-lane Solinas reduction (4 native multiplies vs Shoup's 10):
    mod-q exact and < 2q up to the 8q lazy input bound."""
    q = 0x7FFF801  # 2^27 - 2^11 + 1, the small-N u32 bench prime family
    assert mm.solinas_form32(q) == (27, 11)
    assert mm.solinas_form32(0x1FFC8001) is None  # 2^29-2^18+1: 2k+3 > e
    assert mm.solinas_form32(0x10001) is None
    e, k = 27, 11
    rng = np.random.default_rng(27)
    w = rng.integers(0, q, size=4096).astype(np.uint32)
    t = rng.integers(0, 8 * q, size=4096).astype(np.uint32)
    t[:4] = np.uint32(8 * q - 1) - np.arange(4, dtype=np.uint32)
    r = np.asarray(mm.mul_mod32_q2_solinas(w, t, q, e, k))
    want = (w.astype(np.uint64) * t.astype(np.uint64)) % q
    np.testing.assert_array_equal(r.astype(np.uint64) % q, want)
    assert (r < np.uint32(2 * q)).all()


def test_mul64_full(pairs):
    a, b = pairs
    pa, pb = mm.from_u64(a), mm.from_u64(b)
    p0, p1, p2, p3 = mm.mul64_full(pa, pb)
    got = (
        np.asarray(p0).astype(object)
        + (np.asarray(p1).astype(object) << 32)
        + (np.asarray(p2).astype(object) << 64)
        + (np.asarray(p3).astype(object) << 96)
    )
    want = a.astype(object) * b.astype(object)
    np.testing.assert_array_equal(got, want)


def test_lt_and_reduce(pairs):
    a, b = pairs
    pa, pb = mm.from_u64(a), mm.from_u64(b)
    np.testing.assert_array_equal(np.asarray(mm.lt64(pa, pb)), a < b)
    q = FIXTURES[13].q  # 51-bit
    rng = np.random.default_rng(10)
    v = rng.integers(0, 8 * q, size=4096, dtype=np.uint64)
    got = mm.to_u64(mm.reduce_8q_to_q(mm.from_u64(v), q))
    np.testing.assert_array_equal(got, v % np.uint64(q))


@pytest.mark.parametrize("p", [FIXTURES[0], FIXTURES[12], FIXTURES[13]])
def test_shoup_mul_matches_exact(p, pairs):
    q = p.q
    rng = np.random.default_rng(11)
    w = rng.integers(0, q, size=4096, dtype=np.uint64)
    t = rng.integers(0, 4 * q if 4 * q < (1 << 64) else (1 << 63), size=4096,
                     dtype=np.uint64)
    w_con = np.array([(int(x) << 64) // q for x in w], dtype=np.uint64)
    got = mm.to_u64(
        mm.shoup_mul_q2(mm.from_u64(w), mm.from_u64(w_con), mm.from_u64(t), q)
    )
    want = (w.astype(object) * t.astype(object)) % q
    # lazy result is in [0, 2q) and congruent mod q
    assert (got < 2 * q).all()
    np.testing.assert_array_equal(got.astype(object) % q, want)
    strict = mm.to_u64(
        mm.shoup_mul_q(mm.from_u64(w), mm.from_u64(w_con), mm.from_u64(t), q)
    )
    np.testing.assert_array_equal(strict.astype(object), want)


def test_shoup_dbl_mul(pairs):
    q = FIXTURES[13].q
    rng = np.random.default_rng(12)
    n = 2048
    w1 = rng.integers(0, q, size=n, dtype=np.uint64)
    w2 = rng.integers(0, q, size=n, dtype=np.uint64)
    t1 = rng.integers(0, 8 * q, size=n, dtype=np.uint64)
    t2 = rng.integers(0, 8 * q, size=n, dtype=np.uint64)
    c1 = np.array([(int(x) << 64) // q for x in w1], dtype=np.uint64)
    c2 = np.array([(int(x) << 64) // q for x in w2], dtype=np.uint64)
    got = mm.to_u64(
        mm.shoup_dbl_mul_q2(
            mm.from_u64(w1), mm.from_u64(c1), mm.from_u64(w2), mm.from_u64(c2),
            mm.from_u64(t1), mm.from_u64(t2), q,
        )
    )
    want = (
        w1.astype(object) * t1.astype(object) + w2.astype(object) * t2.astype(object)
    ) % q
    assert (got < 4 * q).all()
    np.testing.assert_array_equal(got.astype(object) % q, want)


def test_refmodel_mulhi_matches_limb():
    """The NumPy oracle's mulhi64 and the device limb mulhi64 agree."""
    from ntt_tpu import refmodel as rm

    rng = np.random.default_rng(13)
    a = _rand_u64(rng, 1024)
    b = _rand_u64(rng, 1024)
    np.testing.assert_array_equal(
        rm.mulhi64(a, b), mm.to_u64(mm.mulhi64(mm.from_u64(a), mm.from_u64(b)))
    )


def test_shoup_mul32():
    import jax.numpy as jnp

    q = FIXTURES[9].q  # 0x1ffc8001, 29-bit
    assert q < 1 << mm.U32_PATH_MAX_Q_BITS_R2
    rng = np.random.default_rng(14)
    w = rng.integers(0, q, size=4096, dtype=np.uint64)
    t = rng.integers(0, 4 * q, size=4096, dtype=np.uint64)
    w_con = ((w.astype(object) << 32) // q).astype(np.uint64)
    got = np.asarray(
        mm.shoup_mul32_q2(
            jnp.asarray(w.astype(np.uint32)),
            jnp.asarray(w_con.astype(np.uint32)),
            jnp.asarray(t.astype(np.uint32)),
            q,
        )
    ).astype(np.uint64)
    want = (w * t % np.uint64(q)).astype(np.uint64)
    assert (got < 2 * q).all()
    np.testing.assert_array_equal(got % np.uint64(q), want)


def test_shl64():
    rng = np.random.default_rng(15)
    x = _rand_u64(rng, 512)
    for k in (0, 1, 15, 16, 31, 32, 33, 47, 62, 63):
        got = mm.to_u64(mm.shl64(mm.from_u64(x), k))
        want = x << np.uint64(k) if k < 64 else np.zeros_like(x)
        np.testing.assert_array_equal(got, want, err_msg=f"k={k}")


def test_mul64_lo_const_solinas_and_dense():
    rng = np.random.default_rng(16)
    x = _rand_u64(rng, 2048)
    consts = [
        (1 << 62) - (1 << 16) + 1,   # the headline Solinas prime (3 digits)
        (1 << 64) - (1 << 32) + 1,   # Goldilocks
        0x80000001C0001,             # fixture 13 q (dense -> generic path)
        3, 1, (1 << 63),
    ]
    for c in consts:
        got = mm.to_u64(mm.mul64_lo_const(mm.from_u64(x), c))
        want = (x.astype(object) * c % (1 << 64)).astype(np.uint64)
        np.testing.assert_array_equal(got, want, err_msg=f"c={c:#x}")


def test_shoup_mul_q2_solinas_q():
    """The Shoup multiply with the constant-multiply Q*q specialization is
    bit-exact at a Solinas q (the NAF shift/add path)."""
    q = (1 << 62) - (1 << 16) + 1
    rng = np.random.default_rng(17)
    w = rng.integers(0, q, size=2048, dtype=np.uint64)
    t = rng.integers(0, 4 * q, size=2048, dtype=np.uint64)
    w_con = np.array([(int(wi) << 64) // q for wi in w], dtype=np.uint64)
    got = mm.to_u64(
        mm.shoup_mul_q2(mm.from_u64(w), mm.from_u64(w_con), mm.from_u64(t), q)
    )
    assert (got < 2 * q).all()
    want = (w.astype(object) * t.astype(object) % q).astype(np.uint64)
    np.testing.assert_array_equal(got % np.uint64(q), want)


def test_shoup_mul56():
    """Word-size-56 Shoup (the VMSL analog, defs.h:45-59): single and
    fused-pair multiplies land in [0, 2q) and are mod-q exact for lazy
    inputs up to 8q at the widest legal q (16q <= 2^56)."""
    q = 0x80000001C0001  # fixture 13's 52-bit q (widest legal: q < 2^52)
    rng = np.random.default_rng(18)
    w1 = rng.integers(0, q, size=2048, dtype=np.uint64)
    w2 = rng.integers(0, q, size=2048, dtype=np.uint64)
    t1 = rng.integers(0, 8 * q, size=2048, dtype=np.uint64)
    t2 = rng.integers(0, 8 * q, size=2048, dtype=np.uint64)
    c1 = np.array([(int(x) << 56) // q for x in w1], dtype=np.uint64)
    c2 = np.array([(int(x) << 56) // q for x in w2], dtype=np.uint64)

    got = mm.to_u64(
        mm.shoup_mul56_q2(mm.from_u64(w1), mm.from_u64(c1), mm.from_u64(t1), q)
    )
    assert (got < 2 * q).all()
    want = (w1.astype(object) * t1.astype(object) % q).astype(np.uint64)
    np.testing.assert_array_equal(got % np.uint64(q), want)

    got2 = mm.to_u64(
        mm.shoup_dbl_mul56_q2(
            mm.from_u64(w1), mm.from_u64(c1), mm.from_u64(w2), mm.from_u64(c2),
            mm.from_u64(t1), mm.from_u64(t2), q,
        )
    )
    assert (got2 < 2 * q).all()
    want2 = (
        (w1.astype(object) * t1.astype(object)
         + w2.astype(object) * t2.astype(object)) % q
    ).astype(np.uint64)
    np.testing.assert_array_equal(got2 % np.uint64(q), want2)
