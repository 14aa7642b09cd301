"""Oracle tests for the NumPy reference model.

Test strategy mirrors the reference's (tests/test_correctness.c:256-285):
random input mod q, forward oracle, every variant must match bit-exactly,
every inverse must round-trip exactly -- but with reproducible PRNG keys.
The additional schoolbook O(N^2) oracle pins the output convention itself.
"""

import numpy as np
import pytest

from ntt_tpu import refmodel as rm
from ntt_tpu import twiddles as tw
from ntt_tpu.params import FIXTURES

from conftest import FIXTURES_ALL, FIXTURES_FAST, fixture_id, make_input


def _plan_r2(p):
    w = tw.calc_w(p.w, p.n, p.q)
    w_con = tw.calc_w_con(w, p.q, 64)
    wi = tw.calc_w_inv(p.w_inv, p.n, p.q)
    wi_con = tw.calc_w_con(wi, p.q, 64)
    ninv_con = tw.calc_ninv_con(p.n_inv, p.q, 64)
    return w, w_con, wi, wi_con, ninv_con


def _plan_r4(p):
    w, w_con, wi, wi_con, ninv_con = _plan_r2(p)
    w4 = tw.expand_w(w, p.q)
    w4_con = tw.calc_w_con(w4, p.q, 64)
    wi4 = tw.expand_w(wi, p.q)
    wi4_con = tw.calc_w_con(wi4, p.q, 64)
    return w4, w4_con, wi4, wi4_con, ninv_con


def test_direct_oracle_matches_harvey():
    """The Harvey kernel computes out[j] = A(w^(2 br(j)+1)) -- the negacyclic
    NTT in bit-reversed order."""
    p = FIXTURES[0]  # N=256 keeps the O(N^2) oracle cheap
    rng = np.random.default_rng(1)
    a = make_input(rng, p.n, p.q)
    w, w_con, *_ = _plan_r2(p)
    got = rm.fwd_ntt_harvey(a, p.q, w, w_con)
    want = rm.direct_negacyclic_ntt(a, p.q, p.w)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("p", FIXTURES_ALL, ids=fixture_id)
def test_harvey_roundtrip(p, rng):
    a = make_input(rng, p.n, p.q)
    w, w_con, wi, wi_con, ninv_con = _plan_r2(p)
    f = rm.fwd_ntt_harvey(a, p.q, w, w_con)
    assert f.max() < p.q
    back = rm.inv_ntt_harvey(f, p.q, p.n_inv, ninv_con, wi, wi_con)
    np.testing.assert_array_equal(back, a)


@pytest.mark.parametrize("p", FIXTURES_FAST, ids=fixture_id)
def test_harvey_lazy_bound(p, rng):
    a = make_input(rng, p.n, p.q)
    w, w_con, *_ = _plan_r2(p)
    lazy = rm.fwd_ntt_harvey_lazy(a, p.q, w, w_con)
    assert lazy.max() < 4 * p.q


@pytest.mark.parametrize("p", FIXTURES_FAST, ids=fixture_id)
def test_harvey_batch_matches_single(p, rng):
    """Batch dim generalizes the reference _dbl variants
    (src/ntt_reference.c:71-91)."""
    a = make_input(rng, p.n, p.q, batch=4)
    w, w_con, *_ = _plan_r2(p)
    got = rm.fwd_ntt_harvey(a, p.q, w, w_con)
    for i in range(4):
        np.testing.assert_array_equal(got[i], rm.fwd_ntt_harvey(a[i], p.q, w, w_con))


@pytest.mark.parametrize("p", FIXTURES_ALL, ids=fixture_id)
def test_radix4_fwd_matches_harvey(p, rng):
    a = make_input(rng, p.n, p.q)
    w, w_con, *_ = _plan_r2(p)
    want = rm.fwd_ntt_harvey(a, p.q, w, w_con)
    w4, w4_con, *_ = _plan_r4(p)
    got = rm.fwd_ntt_radix4(a, p.q, w4, w4_con)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("p", FIXTURES_ALL, ids=fixture_id)
def test_radix4_roundtrip(p, rng):
    a = make_input(rng, p.n, p.q)
    w4, w4_con, wi4, wi4_con, ninv_con = _plan_r4(p)
    f = rm.fwd_ntt_radix4(a, p.q, w4, w4_con)
    back = rm.inv_ntt_radix4(f, p.q, p.n_inv, ninv_con, wi4, wi4_con)
    np.testing.assert_array_equal(back, a)


@pytest.mark.parametrize("p", FIXTURES_FAST, ids=fixture_id)
def test_cross_inverse(p, rng):
    """radix-4 forward -> radix-2 inverse and vice versa (strict domain)."""
    a = make_input(rng, p.n, p.q)
    w, w_con, wi, wi_con, ninv_con = _plan_r2(p)
    w4, w4_con, wi4, wi4_con, _ = _plan_r4(p)
    f = rm.fwd_ntt_radix4(a, p.q, w4, w4_con)
    back = rm.inv_ntt_harvey(f, p.q, p.n_inv, ninv_con, wi, wi_con)
    np.testing.assert_array_equal(back, a)
    f2 = rm.fwd_ntt_harvey(a, p.q, w, w_con)
    back2 = rm.inv_ntt_radix4(f2, p.q, p.n_inv, ninv_con, wi4, wi4_con)
    np.testing.assert_array_equal(back2, a)


def test_fixture_validity():
    for p in FIXTURES:
        p.validate()


def test_make_rejects_degenerate_m():
    """m=0 (N=1) used to pass generate() and crash deep inside the kernel
    with 'negative shift count'; the constructor must reject it cleanly."""
    import pytest

    from ntt_tpu.params import NttParams

    with pytest.raises(ValueError, match="m must be >= 1"):
        NttParams.generate(30, 0)
    with pytest.raises(ValueError, match="m must be >= 1"):
        NttParams.make(0x1E01, -3)


def test_find_solinas_ntt_prime():
    """The NAF-weight-3 modulus finder: primality, root condition, weight,
    and the documented identities (m=14 headline q; 2^62-2^46+1 at m=16,
    where the largest prime has NAF weight 4)."""
    from ntt_tpu.modmath import _naf_digits
    from ntt_tpu.params import NttParams, find_solinas_ntt_prime

    assert find_solinas_ntt_prime(62, 14) == (1 << 62) - (1 << 16) + 1
    assert find_solinas_ntt_prime(62, 16) == (1 << 62) - (1 << 46) + 1
    for bits, m in [(62, 14), (62, 16), (62, 20), (52, 14), (30, 12)]:
        q = find_solinas_ntt_prime(bits, m)
        assert q.bit_length() == bits
        assert (q - 1) % (1 << (m + 1)) == 0
        assert len(_naf_digits(q)) <= 3
        NttParams.make(q, m).validate()
