"""Structural tests for the twiddle-plan builders (pre_compute.h parity)."""

import numpy as np
import pytest

from ntt_tpu import twiddles as tw
from ntt_tpu.params import FIXTURES


def test_bit_rev():
    assert tw.bit_rev_idx(0b001, 3) == 0b100
    assert tw.bit_rev_idx(0b110, 3) == 0b011
    p = tw.bit_rev_perm(16)
    assert sorted(p.tolist()) == list(range(16))
    np.testing.assert_array_equal(p[p], np.arange(16))  # involution


@pytest.mark.parametrize("p", [FIXTURES[0], FIXTURES[13]])
def test_calc_w(p):
    w_tab = tw.calc_w(p.w, p.n, p.q)
    perm = tw.bit_rev_perm(p.n)
    # w_tab[bitrev(i)] == w^i
    for i in [0, 1, 2, 3, p.n // 2, p.n - 1]:
        assert int(w_tab[perm[i]]) == pow(p.w, i, p.q)
    # consistency with the inverse table
    wi_tab = tw.calc_w_inv(p.w_inv, p.n, p.q)
    for i in [1, 5, p.n - 3]:
        assert int(w_tab[perm[i]]) * int(wi_tab[perm[i]]) % p.q == 1


def test_calc_w_con_word_sizes():
    p = FIXTURES[9]
    w_tab = tw.calc_w(p.w, p.n, p.q)
    for ws in (32, 52, 56, 64):
        con = tw.calc_w_con(w_tab, p.q, ws)
        for i in [0, 1, p.n - 1]:
            assert int(con[i]) == (int(w_tab[i]) << ws) // p.q


@pytest.mark.parametrize("p", [FIXTURES[0], FIXTURES[1]])
def test_expand_w_structure(p):
    """Even slots hold w[i/2]; odd slots hold the documented fused products
    (pre_compute.h:85-105)."""
    w_tab = tw.calc_w(p.w, p.n, p.q)
    e = tw.expand_w(w_tab, p.q)
    assert e.shape == (2 * p.n,)
    assert int(e[0]) == int(w_tab[0]) and int(e[2]) == int(w_tab[1])
    assert int(e[1]) == 0 and int(e[3]) == 0
    for i in range(4, 2 * p.n, 2):
        assert int(e[i]) == int(w_tab[i // 2])
        if i % 4 == 0:
            assert int(e[i + 1]) == int(e[i // 2]) * int(w_tab[i // 2]) % p.q
        else:
            assert int(e[i + 1]) == p.q - int(e[(i - 2) // 2]) * int(
                w_tab[i // 2]
            ) % p.q


def test_expand_w_hexl_layout():
    p = FIXTURES[0]
    w_tab = tw.calc_w(p.w, p.n, p.q)
    n = p.n
    e = tw.expand_w_hexl(w_tab)
    np.testing.assert_array_equal(e[: n // 8], w_tab[: n // 8])
    # x4 duplication region
    blk = e[n // 8 : n // 8 + n // 2].reshape(-1, 4)
    np.testing.assert_array_equal(blk[:, 0], w_tab[n // 8 : n // 4])
    assert (blk == blk[:, :1]).all()
    # verbatim top half at 13N/8 - N/2
    base = n // 8 + n // 2 + n // 2
    np.testing.assert_array_equal(e[base : base + n // 2], w_tab[n // 2 :])


@pytest.mark.parametrize("p", [FIXTURES[0], FIXTURES[1]])  # even + odd m
def test_expand_w_r4_fwd8_quintuples(p):
    w_tab = tw.calc_w(p.w, p.n, p.q)
    e = tw.expand_w_r4(w_tab, p.q, unordered=False)
    assert e.shape == (5 * p.n,)
    w = [int(x) for x in w_tab]
    q = p.q
    # first quintuple sits at index 1 (even m) / after the radix-2 scalar (odd)
    if p.m % 2 == 0:
        base, widx = 1, 1
    else:
        assert int(e[1]) == w[1]
        base, widx = 2, 2
    expected = [
        w[widx], w[2 * widx], w[widx] * w[2 * widx] % q,
        w[2 * widx + 1], q - w[widx] * w[2 * widx + 1] % q,
    ]
    assert [int(x) for x in e[base : base + 5]] == expected


def test_expand_w_r4_unordered_lane_permute():
    p = FIXTURES[0]
    w_tab = tw.calc_w(p.w, p.n, p.q)
    e_o = tw.expand_w_r4(w_tab, p.q, unordered=False)
    e_u = tw.expand_w_r4(w_tab, p.q, unordered=True)
    # identical except within FWD1 8-lane blocks, which are lane-permuted
    diff = np.nonzero(e_o != e_u)[0]
    assert diff.size > 0
    # all diffs in the FWD1 region (last region of the table)
    assert diff.min() >= 8  # beyond the head
    # every differing 8-block of ordered maps to unordered by the lane perm
    for start in {int(d) // 8 * 8 for d in diff}:
        np.testing.assert_array_equal(
            e_o[start : start + 8][tw._LANE_PERM], e_u[start : start + 8]
        )


@pytest.mark.parametrize("p", [FIXTURES[0], FIXTURES[1]])
def test_expand_w_r4r2_and_r2_16_shapes(p):
    w_tab = tw.calc_w(p.w, p.n, p.q)
    e1 = tw.expand_w_r4r2(w_tab, p.q)
    e2 = tw.expand_w_r2_16(w_tab)
    assert e1.shape == (5 * p.n,)
    assert e2.shape == (3 * p.n,)
    n = p.n
    # r2_16: head is verbatim w[0:N/8]
    np.testing.assert_array_equal(e2[: n // 8], w_tab[: n // 8])
    # FwdT4 region is x4-duplicated
    blk = e2[n // 8 : n // 8 + n // 2].reshape(-1, 4)
    assert (blk == blk[:, :1]).all()
