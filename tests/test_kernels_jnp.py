"""Parity tests: jnp kernels vs the NumPy oracle (all on CPU backend).

Strategy per reference tests/test_correctness.c: forward variants must be
bit-exact against the oracle; inverses must round-trip exactly.  The u64
limb-pair path must additionally match the oracle's *lazy* intermediate
representatives (word_size=64 end-to-end); the u32 path only promises
strict parity (different word size -- same contract as the reference's
VMSL/IFMA reduced-word variants)."""

import jax
import numpy as np
import pytest

from ntt_tpu import api
from ntt_tpu import modmath as mm
from ntt_tpu import refmodel as rm
from ntt_tpu.plan import get_plan

from conftest import FIXTURES_ALL, FIXTURES_FAST, fixture_id, make_input


@pytest.mark.full
@pytest.mark.parametrize("p", FIXTURES_ALL, ids=fixture_id)
def test_radix2_u64_lazy_bitexact_full(p, rng):
    test_radix2_u64_lazy_bitexact(p, rng)


@pytest.mark.parametrize("p", FIXTURES_FAST, ids=fixture_id)
def test_radix2_u64_lazy_bitexact(p, rng):
    plan = get_plan(p)
    a = make_input(rng, p.n, p.q)
    want = rm.fwd_ntt_harvey_lazy(a, p.q, plan.w, plan.w_con)
    got = api.fwd_ntt(a, p, variant="radix2", lazy=True)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("p", FIXTURES_FAST, ids=fixture_id)
def test_radix2_u64_roundtrip(p, rng):
    a = make_input(rng, p.n, p.q)
    f = api.fwd_ntt(a, p, variant="radix2")
    assert f.max() < p.q
    back = api.inv_ntt(f, p, variant="radix2")
    np.testing.assert_array_equal(back, a)


@pytest.mark.full
@pytest.mark.parametrize("p", FIXTURES_ALL, ids=fixture_id)
def test_radix4_u64_lazy_bitexact_full(p, rng):
    test_radix4_u64_lazy_bitexact(p, rng)


@pytest.mark.parametrize("p", FIXTURES_FAST, ids=fixture_id)
def test_radix4_u64_lazy_bitexact(p, rng):
    plan = get_plan(p)
    a = make_input(rng, p.n, p.q)
    want = rm.fwd_ntt_radix4_lazy(a, p.q, plan.w_r4, plan.w_r4_con)
    got = api.fwd_ntt(a, p, variant="radix4", lazy=True)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("p", FIXTURES_FAST, ids=fixture_id)
def test_radix4_u64_roundtrip(p, rng):
    a = make_input(rng, p.n, p.q)
    f = api.fwd_ntt(a, p, variant="radix4")
    back = api.inv_ntt(f, p, variant="radix4")
    np.testing.assert_array_equal(back, a)


@pytest.mark.parametrize(
    "p",
    [p for p in FIXTURES_ALL if p.q < (1 << mm.U32_PATH_MAX_Q_BITS_R2)],
    ids=fixture_id,
)
def test_radix2_u32_strict_parity(p, rng):
    plan = get_plan(p)
    a = make_input(rng, p.n, p.q)
    want = rm.fwd_ntt_harvey(a, p.q, plan.w, plan.w_con)
    got = api.fwd_ntt(a, p, variant="radix2-u32")
    np.testing.assert_array_equal(got, want)
    back = api.inv_ntt(got, p, variant="radix2-u32")
    np.testing.assert_array_equal(back, a)


@pytest.mark.parametrize(
    "p",
    [p for p in FIXTURES_ALL if p.q < (1 << mm.U32_PATH_MAX_Q_BITS_R4)],
    ids=fixture_id,
)
def test_radix4_u32_strict_parity(p, rng):
    plan = get_plan(p)
    a = make_input(rng, p.n, p.q)
    want = rm.fwd_ntt_harvey(a, p.q, plan.w, plan.w_con)
    got = api.fwd_ntt(a, p, variant="radix4-u32")
    np.testing.assert_array_equal(got, want)
    back = api.inv_ntt(got, p, variant="radix4-u32")
    np.testing.assert_array_equal(back, a)


def test_u32_lazy_bound_documented(rng):
    """u32-path lazy outputs stay within the documented 4q bound even
    though representatives may differ from the 64-bit word path."""
    p = [p for p in FIXTURES_ALL if p.q < (1 << 28)][-1]
    a = make_input(rng, p.n, p.q)
    lazy = api.fwd_ntt(a, p, variant="radix2-u32", lazy=True)
    assert lazy.max() < 4 * p.q
    strict = api.fwd_ntt(a, p, variant="radix2-u32")
    np.testing.assert_array_equal(lazy % np.uint64(p.q), strict)


@pytest.mark.parametrize("variant", ["radix2", "radix4", "radix2-u32"])
def test_batch(variant, rng):
    p = FIXTURES_ALL[0]
    a = make_input(rng, p.n, p.q, batch=8)
    got = api.fwd_ntt(a, p, variant=variant)
    single = np.stack([api.fwd_ntt(a[i], p, variant=variant) for i in range(8)])
    np.testing.assert_array_equal(got, single)


def test_auto_dispatch_and_guards(rng):
    small = FIXTURES_ALL[0]  # 13-bit q, m=8 -> u32 small-N tail (radix4)
    big = FIXTURES_ALL[13]  # 51-bit q -> u64 path
    a = make_input(rng, small.n, small.q)
    assert api._auto_variant(get_plan(small)) == "radix4-u32"
    assert api._auto_variant(get_plan(big)) == "sixstep"
    np.testing.assert_array_equal(
        api.fwd_ntt(a, small, variant="auto"),
        api.fwd_ntt(a, small, variant="radix2"),
    )
    with pytest.raises(ValueError, match="supports q"):
        api.fwd_ntt(make_input(rng, big.n, big.q), big, variant="radix2-u32")
    with pytest.raises(KeyError):
        api.fwd_ntt(a, small, variant="nope")


@pytest.mark.parametrize("p", FIXTURES_FAST, ids=fixture_id)
def test_sixstep_fwd_bitexact(p, rng):
    plan = get_plan(p)
    a = make_input(rng, p.n, p.q, batch=2)
    got = api.fwd_ntt(a, p, variant="sixstep")
    want = rm.fwd_ntt_harvey(a, p.q, plan.w, plan.w_con)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("p", FIXTURES_FAST, ids=fixture_id)
def test_sixstep_roundtrip(p, rng):
    a = make_input(rng, p.n, p.q)
    f = api.fwd_ntt(a, p, variant="sixstep")
    back = api.inv_ntt(f, p, variant="sixstep")
    np.testing.assert_array_equal(back, a)


@pytest.mark.parametrize("group", [2, 3, 4])
@pytest.mark.parametrize("qb_m", [(27, 10), (50, 10)], ids=str)
def test_sixstep_grouped_stages(group, qb_m, rng):
    """Grouped stages (g butterfly layers per interleave) are bit-exact
    fwd+inv at every supported g, both limb widths."""
    from ntt_tpu.kernels import radix2, sixstep as ss
    from ntt_tpu.kernels.elems import U32Ops, U64Ops, tmap

    from ntt_tpu.params import NttParams

    p = NttParams.generate(*qb_m)
    plan = get_plan(p)
    q = p.q
    ops = U32Ops if plan.supports_u32_radix2 else U64Ops
    a = make_input(rng, p.n, p.q, batch=2)
    a_rep = ops.from_host(a)
    if ops is U32Ops:
        w, wc, wi, wic = plan.dev_r2_u32
        w_rep, wc_rep, wi_rep, wic_rep = (w,), (wc,), (wi,), (wic,)
        ninv_con, word = plan.n_inv_con32, 32
    else:
        w_rep, wc_rep, wi_rep, wic_rep = plan.dev_r2_u64
        ninv_con, word = plan.n_inv_con, 64
    f_tmp, f_con = radix2._final_mulop(
        p.n_inv, ninv_con, int(plan.w_inv[1]), q, word
    )
    want = rm.fwd_ntt_harvey(a, p.q, plan.w, plan.w_con)
    got_rep = jax.jit(
        lambda x: ss.fwd_sixstep(x, ops, w_rep, wc_rep, q, strict=True,
                                 group=group)
    )(a_rep)
    np.testing.assert_array_equal(ops.to_host(got_rep), want)
    back = jax.jit(
        lambda x: ss.inv_sixstep(x, ops, wi_rep, wic_rep, p.n_inv, ninv_con,
                                 f_tmp, f_con, q, group=group)
    )(got_rep)
    np.testing.assert_array_equal(ops.to_host(back), a)


def test_sixstep_u64_lazy_bitexact(rng):
    p = [x for x in FIXTURES_ALL if x.q.bit_length() > 30][0]
    plan = get_plan(p)
    a = make_input(rng, p.n, p.q)
    got = api.fwd_ntt(a, p, variant="sixstep", lazy=True)
    want = rm.fwd_ntt_harvey_lazy(a, p.q, plan.w, plan.w_con)
    np.testing.assert_array_equal(got, want)


def test_sixstep_keep_transposed_layout(rng):
    """The unordered-output contract: transform in transposed layout +
    documented fix_order permutation == ordered output (the analog of
    fix_a_order, tests/test_correctness.c:179-209)."""
    from ntt_tpu.kernels import sixstep as ss
    from ntt_tpu.kernels.elems import U32Ops

    p = FIXTURES_ALL[6]
    plan = get_plan(p)
    a = make_input(rng, p.n, p.q)
    w, wc, _, _ = plan.dev_r2_u32
    n1_log = ss.default_split(p.n)
    out_t = U32Ops.to_host(
        ss.fwd_sixstep(
            U32Ops.from_host(a), U32Ops, (w,), (wc,), p.q, n1_log,
            keep_transposed=True,
        )
    )
    fixed = ss.fix_transposed_order(out_t, n1_log)
    want = api.fwd_ntt(a, p, variant="radix2")
    np.testing.assert_array_equal(fixed, want)


@pytest.mark.parametrize(
    "p",
    [p for p in FIXTURES_FAST if p.q < (1 << 28)],
    ids=fixture_id,
)
def test_mxu_fwd_bitexact(p, rng):
    plan = get_plan(p)
    a = make_input(rng, p.n, p.q, batch=3)
    got = api.fwd_ntt(a, p, variant="mxu")
    want = rm.fwd_ntt_harvey(a, p.q, plan.w, plan.w_con)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize(
    "p",
    [p for p in FIXTURES_FAST if p.q < (1 << 28)],
    ids=fixture_id,
)
def test_mxu_roundtrip(p, rng):
    a = make_input(rng, p.n, p.q, batch=2)
    f = api.fwd_ntt(a, p, variant="mxu")
    back = api.inv_ntt(f, p, variant="mxu")
    np.testing.assert_array_equal(back, a)


def test_mxu_guards(rng):
    big = [p for p in FIXTURES_ALL if p.q.bit_length() > 28][0]
    with pytest.raises(ValueError, match="supports q"):
        api.fwd_ntt(make_input(rng, big.n, big.q), big, variant="mxu")


def test_cross_variant_strict_equality(rng):
    """All registered forward variants agree on strict outputs (the
    reference's single-oracle memcmp pattern).  Layout-permuted variants
    are repaired with their documented output_layout first (the fix_a_order
    pattern, tests/test_correctness.c:179-209)."""
    p = FIXTURES_ALL[8]  # q=0xfff0001, 28-bit: every path supports it
    a = make_input(rng, p.n, p.q)
    outs = {}
    for name, v in api.variants().items():
        if p.q.bit_length() <= v.max_q_bits:
            out = api.fwd_ntt(a, p, variant=name)
            outs[name] = api.output_layout(name, p).fix(out)
    ref = outs.pop("radix2")
    for name, o in outs.items():
        np.testing.assert_array_equal(o, ref, err_msg=name)
