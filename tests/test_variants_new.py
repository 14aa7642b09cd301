"""Parity tests for the r4r2 / pallas-fused / alias / unordered variants.

Same oracle strategy as test_kernels_jnp.py (reference pattern:
tests/test_correctness.c): strict forward outputs must be bit-exact
against the radix-2 Harvey oracle, inverses must round-trip exactly,
layout-permuted outputs must match after the documented fix-up.
"""

import numpy as np
import pytest

from ntt_tpu import api
from ntt_tpu import modmath as mm
from ntt_tpu import refmodel as rm
from ntt_tpu.plan import get_plan

from conftest import FIXTURES_ALL, FIXTURES_FAST, fixture_id, make_input

# small fixtures only for interpreter-mode Pallas (CPU backend is slow)
FIXTURES_SMALL = [p for p in FIXTURES_FAST if p.m <= 11]


@pytest.mark.parametrize("p", FIXTURES_FAST, ids=fixture_id)
def test_r4r2_fwd_bitexact(p, rng):
    plan = get_plan(p)
    a = make_input(rng, p.n, p.q)
    want = rm.fwd_ntt_harvey(a, p.q, plan.w, plan.w_con)
    got = api.fwd_ntt(a, p, variant="r4r2")
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("p", FIXTURES_FAST, ids=fixture_id)
def test_r4r2_roundtrip(p, rng):
    a = make_input(rng, p.n, p.q)
    f = api.fwd_ntt(a, p, variant="r4r2")
    back = api.inv_ntt(f, p, variant="r4r2")
    np.testing.assert_array_equal(back, a)


def test_r4r2_lazy_bound(rng):
    p = FIXTURES_ALL[0]
    a = make_input(rng, p.n, p.q)
    lazy = api.fwd_ntt(a, p, variant="r4r2", lazy=True)
    assert lazy.max() < 4 * p.q
    np.testing.assert_array_equal(
        lazy % np.uint64(p.q), api.fwd_ntt(a, p, variant="r4r2")
    )


@pytest.mark.parametrize("p", FIXTURES_SMALL, ids=fixture_id)
def test_pallas_fused_fwd_bitexact(p, rng):
    plan = get_plan(p)
    a = make_input(rng, p.n, p.q, batch=2)
    want = rm.fwd_ntt_harvey(a, p.q, plan.w, plan.w_con)
    got = api.fwd_ntt(a, p, variant="pallas-fused")
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("p", FIXTURES_SMALL, ids=fixture_id)
def test_pallas_fused_roundtrip(p, rng):
    a = make_input(rng, p.n, p.q, batch=2)
    f = api.fwd_ntt(a, p, variant="pallas-fused")
    back = api.inv_ntt(f, p, variant="pallas-fused")
    np.testing.assert_array_equal(back, a)


@pytest.mark.full
def test_pallas_fused_u64_path_bitexact(rng):
    """Two-limb path through the Pallas kernel (q > 2^30)."""
    p = [x for x in FIXTURES_ALL if x.q.bit_length() > 30][0]
    plan = get_plan(p)
    a = make_input(rng, p.n, p.q)
    want = rm.fwd_ntt_harvey(a, p.q, plan.w, plan.w_con)
    got = api.fwd_ntt(a, p, variant="pallas-fused")
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(api.inv_ntt(got, p, variant="pallas-fused"), a)


@pytest.mark.parametrize("variant", ["seal", "radix4x4", "hexl", "r2-16"])
@pytest.mark.parametrize("p", [FIXTURES_ALL[0], FIXTURES_ALL[13]],
                         ids=fixture_id)
def test_family_variants_bitexact(variant, p, rng):
    """The reference variant-family kernels (SEAL schedule, radix4x4
    grouped fusion, HEXL / r2_16 layout consumers) are strict-oracle-exact
    and round-trip exactly."""
    plan = get_plan(p)
    a = make_input(rng, p.n, p.q)
    want = rm.fwd_ntt_harvey(a, p.q, plan.w, plan.w_con)
    got = api.fwd_ntt(a, p, variant=variant)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(api.inv_ntt(got, p, variant=variant), a)


@pytest.mark.parametrize("p", FIXTURES_FAST, ids=fixture_id)
def test_radix4_w56_bitexact(p, rng):
    """radix4-w56 (the s390x VMSL analog, word_size=56 Shoup) is strict
    oracle-exact, honors its lazy bound, and round-trips exactly
    (ref: src/ntt_radix4_s390x_vef.c + test_cases.h:254-264)."""
    plan = get_plan(p)
    a = make_input(rng, p.n, p.q)
    want = rm.fwd_ntt_harvey(a, p.q, plan.w, plan.w_con)
    got = api.fwd_ntt(a, p, variant="radix4-w56")
    np.testing.assert_array_equal(got, want)
    lazy = api.fwd_ntt(a, p, variant="radix4-w56", lazy=True)
    bound = (8 if p.m % 2 == 0 else 4) * p.q
    assert int(lazy.max()) < bound
    np.testing.assert_array_equal(lazy % np.uint64(p.q), want)
    np.testing.assert_array_equal(api.inv_ntt(got, p, variant="radix4-w56"), a)


def test_radix4_w56_q_gate():
    """q >= 2^52 must be rejected: the 56-bit dual Shoup needs 16q <= 2^56."""
    from ntt_tpu.params import NttParams

    p = NttParams.generate(62, 8)
    with pytest.raises(ValueError, match="radix4-w56"):
        api.fwd_ntt(np.zeros(p.n, np.uint64), p, variant="radix4-w56")


@pytest.mark.parametrize("p", [FIXTURES_ALL[0], FIXTURES_ALL[1],
                               FIXTURES_ALL[13]], ids=fixture_id)
def test_radix4_vec_bitexact(p, rng):
    """radix4-vec (5N vector-layout consumer) oracle-exact, both log2 N
    parities, plus the lazy 8q bound and the inverse round-trip."""
    plan = get_plan(p)
    a = make_input(rng, p.n, p.q)
    want = rm.fwd_ntt_harvey(a, p.q, plan.w, plan.w_con)
    got = api.fwd_ntt(a, p, variant="radix4-vec")
    np.testing.assert_array_equal(got, want)
    lazy = api.fwd_ntt(a, p, variant="radix4-vec", lazy=True)
    assert int(lazy.max()) < 8 * p.q
    np.testing.assert_array_equal(lazy % np.uint64(p.q), want)
    np.testing.assert_array_equal(api.inv_ntt(got, p, variant="radix4-vec"), a)


@pytest.mark.parametrize("p", [FIXTURES_ALL[0], FIXTURES_ALL[13],
                               FIXTURES_ALL[15]], ids=fixture_id)
def test_radix4_vec_layout_native_inverse(p, rng):
    """The radix4-vec inverse consumes the INVERSE root's 5N vec table
    (plan.dev_r4_vec_inv_u64) in reverse emission order -- it is a distinct
    dataflow from the plain radix4 inverse, and round-trips from both the
    strict and the lazy (8q-bound) forward."""
    if p.q.bit_length() > 61:
        pytest.skip("radix-4 family bound")
    v = api.get_variant("radix4-vec")
    assert v.inv is not api.get_variant("radix4").inv
    a = make_input(rng, p.n, p.q)
    f = api.fwd_ntt(a, p, variant="radix4-vec")
    np.testing.assert_array_equal(api.inv_ntt(f, p, variant="radix4-vec"), a)
    fl = api.fwd_ntt(a, p, variant="radix4-vec", lazy=True)
    np.testing.assert_array_equal(api.inv_ntt(fl, p, variant="radix4-vec"), a)


def test_radix4_vec_unordered_layout(rng):
    """The unordered variant's output equals the oracle after the
    documented layout fix-up (fix_a_order analog)."""
    p = FIXTURES_ALL[13]
    plan = get_plan(p)
    a = make_input(rng, p.n, p.q)
    want = rm.fwd_ntt_harvey(a, p.q, plan.w, plan.w_con)
    raw = api.fwd_ntt(a, p, variant="radix4-vec-unordered")
    assert not np.array_equal(raw, want)  # genuinely permuted
    fixed = api.output_layout("radix4-vec-unordered", p).fix(raw)
    np.testing.assert_array_equal(fixed, want)


@pytest.mark.parametrize("p", FIXTURES_FAST, ids=fixture_id)
def test_sixstep_rec_matches_radix2(rng, p):
    """Two-level recursive six-step (r4 verdict #2): bit-exact with the
    flat kernel at both widths (strict and lazy), and the per-level 1/Ni
    scalings of the inverse compose to the full 1/N round trip."""
    a = make_input(rng, p.n, p.q, batch=2)
    want = api.fwd_ntt(a, p, variant="radix2")
    got = api.fwd_ntt(a, p, variant="sixstep-rec")
    np.testing.assert_array_equal(got, want)
    lz = api.fwd_ntt(a, p, variant="sixstep-rec", lazy=True)
    assert lz.max() < 4 * p.q
    np.testing.assert_array_equal(lz % np.uint64(p.q), want)
    np.testing.assert_array_equal(api.inv_ntt(got, p, variant="sixstep-rec"), a)


def test_radix4_vec_unordered_inverse(rng):
    """(r4 verdict #5) the layout-consuming inverse: accepts the
    lane-permuted radix4_vec_unordered order directly (unordered
    inverse-root table + one block-local un-permute), so the registry hole
    (inv=None) is closed without an external fix_a_order pass."""
    p = FIXTURES_ALL[13]  # m=14, q 51-bit
    plan = get_plan(p)
    a = make_input(rng, p.n, p.q)
    raw = api.fwd_ntt(a, p, variant="radix4-vec-unordered")
    # round-trip: strict and lazy forwards
    np.testing.assert_array_equal(
        api.inv_ntt(raw, p, variant="radix4-vec-unordered"), a)
    rawl = api.fwd_ntt(a, p, variant="radix4-vec-unordered", lazy=True)
    np.testing.assert_array_equal(
        api.inv_ntt(rawl, p, variant="radix4-vec-unordered"), a)
    # parity: the ORACLE forward, unfixed into the documented layout, is a
    # valid input (the inverse consumes the layout, not this kernel's quirks)
    want = rm.fwd_ntt_harvey(a, p.q, plan.w, plan.w_con)
    lay = api.output_layout("radix4-vec-unordered", p)
    np.testing.assert_array_equal(
        api.inv_ntt(lay.unfix(want), p, variant="radix4-vec-unordered"), a)
    # fwd -> pointwise -> inv never materializes standard order
    b = make_input(rng, p.n, p.q)
    fb = api.fwd_ntt(b, p, variant="radix4-vec-unordered")
    got = api.inv_ntt(api.pointwise_mul(raw, fb, p), p,
                      variant="radix4-vec-unordered")
    np.testing.assert_array_equal(got, api.negacyclic_mul(a, b, p))


def test_pallas_backend_pin():
    """(r4 verdict #7) the Pallas interpret switch is an explicit
    allowlist, not a raw string compare: tpu -> native Mosaic, cpu ->
    silent interpreter (the test mesh), anything unrecognized ->
    interpreter WITH a warning."""
    import warnings

    assert api._pallas_interpret("tpu") is False
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # cpu fallback must stay silent
        assert api._pallas_interpret("cpu") is True
    with pytest.warns(RuntimeWarning, match="unrecognized backend"):
        assert api._pallas_interpret("some_plugin") is True


def test_seal_lazy_matches_harvey(rng):
    """SEAL's forward guard/mul_root chain is value-identical to the lazy
    Harvey chain (same ops, SEAL's loop schedule)."""
    p = FIXTURES_ALL[13]
    a = make_input(rng, p.n, p.q)
    np.testing.assert_array_equal(
        api.fwd_ntt(a, p, variant="seal", lazy=True),
        api.fwd_ntt(a, p, variant="radix2", lazy=True),
    )


def test_no_pointer_equal_variants():
    """Every registry entry owns its forward dataflow: no two variants
    share the same fwd callable (review finding: aliases inflated parity)."""
    fwds = {name: v.fwd for name, v in api.variants().items()}
    seen = {}
    for name, fn in fwds.items():
        assert fn not in seen.values(), (
            f"{name} shares fwd with another variant"
        )
        seen[name] = fn


def test_hexl_mod_factor_contract(rng):
    """HEXL contract (include/ntt_hexl.h:30-39): inputs up to 4q accepted;
    output_mod_factor 4 (lazy) stays < 4q and reduces to the strict value."""
    p = FIXTURES_ALL[0]
    a = make_input(rng, p.n, p.q)
    strict_out = api.fwd_ntt(a, p, variant="hexl")
    # input_mod_factor=4: add q and 2q multiples, same residues
    a4 = a + np.uint64(p.q) * (1 + (a % np.uint64(3)))
    assert a4.max() < 4 * p.q
    np.testing.assert_array_equal(
        api.fwd_ntt(a4, p, variant="hexl") , strict_out
    )
    lazy = api.fwd_ntt(a, p, variant="hexl", lazy=True)
    assert lazy.max() < 4 * p.q
    np.testing.assert_array_equal(lazy % np.uint64(p.q), strict_out)
    # inverse is new scope (reference HEXL port is forward-only)
    np.testing.assert_array_equal(api.inv_ntt(strict_out, p, variant="hexl"), a)


def test_unordered_layout_contract(rng):
    p = FIXTURES_ALL[6]
    a = make_input(rng, p.n, p.q)
    raw = api.fwd_ntt(a, p, variant="sixstep-unordered")
    lay = api.output_layout("sixstep-unordered", p)
    want = api.fwd_ntt(a, p, variant="radix2")
    assert not (raw == want).all()  # genuinely permuted
    np.testing.assert_array_equal(lay.fix(raw), want)
    np.testing.assert_array_equal(lay.unfix(lay.fix(raw)), raw)
    assert api.output_layout("radix2", p).name == "standard"
    # the inverse consumes the transposed layout directly: the full chain
    # round-trips without ever materializing standard order
    np.testing.assert_array_equal(
        api.inv_ntt(raw, p, variant="sixstep-unordered"), a
    )


def test_unordered_pointwise_chain(rng):
    """unordered fwd -> pointwise -> unordered inv == negacyclic product
    (the layout never repaired: permutations commute with elementwise
    multiply)."""
    from ntt_tpu.params import NttParams

    small = NttParams.generate(40, 6)
    a = make_input(rng, small.n, small.q)
    b = make_input(rng, small.n, small.q)
    fa = api.fwd_ntt(a, small, variant="sixstep-unordered")
    fb = api.fwd_ntt(b, small, variant="sixstep-unordered")
    got = api.inv_ntt(
        api.pointwise_mul(fa, fb, small), small, variant="sixstep-unordered"
    )
    np.testing.assert_array_equal(got, api.negacyclic_mul(a, b, small))


def test_fwd_ntt_dbl(rng):
    p = FIXTURES_ALL[0]
    a = make_input(rng, p.n, p.q)
    b = make_input(rng, p.n, p.q)
    fa, fb = api.fwd_ntt_dbl(a, b, p)
    np.testing.assert_array_equal(fa, api.fwd_ntt(a, p))
    np.testing.assert_array_equal(fb, api.fwd_ntt(b, p))


def test_radix4_family_61bit_bound(rng):
    """The radix-4 lazy representation reaches 8q, so 62-bit q overflows
    uint64: the radix-4 family must refuse q >= 2^61 (radix-2's 4q bound
    is where the 62-bit framework ceiling comes from), and work at 61."""
    from ntt_tpu.params import NttParams

    p61 = NttParams.generate(61, 8)
    a = make_input(rng, p61.n, p61.q)
    for v in ("radix4", "r4r2"):
        f = api.fwd_ntt(a, p61, variant=v)
        np.testing.assert_array_equal(f, api.fwd_ntt(a, p61, variant="radix2"))
    p62 = NttParams.generate(62, 8)
    a62 = make_input(rng, p62.n, p62.q)
    for v in ("radix4", "r4r2"):
        with pytest.raises(ValueError, match="supports q"):
            api.fwd_ntt(a62, p62, variant=v)
    # radix4x4 fuses four radix-2 layers per materialization (no 8q-lazy
    # arithmetic), so it keeps the full 62-bit ceiling -- new scope vs the
    # reference's radix-4-based original
    np.testing.assert_array_equal(
        api.fwd_ntt(a62, p62, variant="radix4x4"),
        api.fwd_ntt(a62, p62, variant="radix2"),
    )


def test_pallas_vmem_model_calibration_points():
    """Pins _vmem_bytes / default_tile_b at the on-chip calibration points
    (VERDICT r3 #5): u64 N=2^14 tile 16 -> 116.75MiB > the 110MB scoped-vmem
    limit (observed Mosaic failure), tile 8 -> 59.75MiB (observed compile+run
    OK, re-validated by `tools/mosaic_check.py --vmem-probe` each round).
    Any edit to the model's constants now fails HERE instead of silently
    flipping the guard from protective to wrong; if the probe shows the
    Mosaic boundary itself moved, update the model AND these pins together."""
    from ntt_tpu.kernels import pallas_fused as pf

    n = 1 << 14
    mb = 1 << 20
    # u64 (limb-pair chain): the calibrated boundary sits between 8 and 16
    assert pf._vmem_bytes(16, n, 2) == 122421248  # 116.75 MiB > 110 guard
    assert pf._vmem_bytes(8, n, 2) == 62652416    # 59.75 MiB: compiles+runs
    assert pf.default_tile_b(n, 2, batch=1024) == 8
    # u32 (single-limb chain): 14 live words/elem -> 64-row tiles
    assert pf._vmem_bytes(128, n, 1) > 80 * mb  # stops the doubling
    assert pf.default_tile_b(n, 1, batch=1024) == 64
    # tiny batches never tile above the batch itself
    assert pf.default_tile_b(n, 2, batch=8) == 8
    # the guard threshold the ValueError fires at (kept in sync with the
    # vmem_limit_bytes compiler param)
    assert pf._vmem_bytes(16, n, 2) > 110 * mb


def test_pallas_vmem_guard():
    """Configurations whose working set cannot fit VMEM raise a clear
    error (not a Mosaic crash) when compiled for real; interpret mode
    (used on CPU) is unaffected."""
    from ntt_tpu.kernels import pallas_fused as pf
    from ntt_tpu.kernels.elems import U64Ops

    p = [x for x in FIXTURES_ALL if x.m == 17][0]  # N=2^17, 51-bit q
    plan = get_plan(p)
    n1_log = pf.pick_split(p.n)
    tabs = plan.pallas_tables(False, n1_log, 2)
    a_rep = U64Ops.from_host(np.zeros((8, p.n), dtype=np.uint64))
    with pytest.raises(ValueError, match="exceeds VMEM"):
        pf.fwd_fused(a_rep, U64Ops, tabs, p.q, n1_log, interpret=False)


def test_layouts_module():
    from ntt_tpu.kernels import layouts

    lay = layouts.transposed(16, 2)  # n1=4, n2=4
    a = np.arange(16)
    fixed = lay.fix(a)
    # standard index c1*n2+c2 lives at raw position c2*n1+c1: fixing the
    # identity array yields the transpose permutation itself
    np.testing.assert_array_equal(
        fixed, np.arange(16).reshape(4, 4).T.reshape(-1)
    )
    np.testing.assert_array_equal(lay.unfix(fixed), a)
    std = layouts.standard(16)
    np.testing.assert_array_equal(std.fix(a), a)


@pytest.mark.parametrize("p", [FIXTURES_ALL[0], FIXTURES_ALL[13]],
                         ids=fixture_id)
@pytest.mark.parametrize("group", [1, 2, 4])
def test_sixstep_row_tabs_bitexact(p, group, rng):
    """The pre-broadcast row-twiddle-stack path (plan.dev_row_tabs ->
    sixstep row_tabs) is bit-identical to the in-program _row_tw
    derivation, at every stage grouping and both widths.  On-chip the two
    lowerings are flop-identical and timing-neutral (round 4,
    artifacts/ROWTAB_AB_r04.log), so the default stays in-program; this
    test keeps the opt-in path correct."""
    from ntt_tpu.kernels import sixstep as ss
    from ntt_tpu.kernels.elems import U32Ops, U64Ops

    plan = get_plan(p)
    nlimb = 1 if plan.supports_u32_radix2 else 2
    ops = U32Ops if nlimb == 1 else U64Ops
    n1_log = ss.default_split(p.n)
    if nlimb == 1:
        w, wc, _, _ = plan.dev_r2_u32
        w_rep, wc_rep = (w,), (wc,)
    else:
        w_rep, wc_rep, _, _ = plan.dev_r2_u64
    tabs = plan.dev_row_tabs(n1_log, nlimb, False)
    a = make_input(rng, p.n, p.q, batch=3)
    a_rep = ops.from_host(a)
    plain = ss.fwd_sixstep(a_rep, ops, w_rep, wc_rep, p.q, n1_log,
                           strict=True, group=group)
    tabbed = ss.fwd_sixstep(a_rep, ops, w_rep, wc_rep, p.q, n1_log,
                            strict=True, group=group, row_tabs=tabs)
    for x, y in zip(plain, tabbed):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
