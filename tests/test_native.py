"""Cross-implementation parity: Python/JAX vs the native C++ core.

Agreement between three independently written implementations (NumPy
oracle, jnp kernels, C++ core) is the framework's strongest correctness
evidence -- the same role the upstream fwd_ntt_ref_harvey oracle plays in
tests/test_correctness.c:268."""

import numpy as np
import pytest

from ntt_tpu import api, native
from ntt_tpu import refmodel as rm
from ntt_tpu.plan import get_plan

from conftest import FIXTURES_FAST, fixture_id, make_input

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native core unavailable (no g++/make)"
)


@pytest.mark.parametrize("p", FIXTURES_FAST, ids=fixture_id)
def test_twiddle_tables_match(p):
    plan = get_plan(p)
    np.testing.assert_array_equal(native.power_table(p.w, p.n, p.q), plan.w)
    np.testing.assert_array_equal(native.shoup_table(plan.w, p.q, 64), plan.w_con)
    np.testing.assert_array_equal(native.expand_radix4(plan.w, p.q), plan.w_r4)
    np.testing.assert_array_equal(
        native.shoup_table(plan.w, p.q, 32), plan.w_con32
    )


@pytest.mark.parametrize("p", FIXTURES_FAST, ids=fixture_id)
def test_simd_layout_tables_match(p):
    """Every SIMD layout builder (upstream pre_compute.h:109-367) verified
    element-wise against the independently written C++ generator."""
    plan = get_plan(p)
    np.testing.assert_array_equal(native.expand_hexl(plan.w), plan.w_hexl)
    np.testing.assert_array_equal(native.expand_r2_16(plan.w), plan.w_r2_16)
    np.testing.assert_array_equal(native.expand_r4r2(plan.w, p.q), plan.w_r4r2)
    np.testing.assert_array_equal(
        native.expand_r4_vec(plan.w, p.q, False), plan.w_r4_vec(False)
    )
    np.testing.assert_array_equal(
        native.expand_r4_vec(plan.w, p.q, True), plan.w_r4_vec(True)
    )


@pytest.mark.parametrize("p", FIXTURES_FAST, ids=fixture_id)
def test_fwd_parity_three_ways(p, rng):
    plan = get_plan(p)
    a = make_input(rng, p.n, p.q)
    cpp_simple = native.fwd_simple(a, p.q, plan.w)
    cpp_lazy = native.fwd_lazy64(a, p.q, plan.w, plan.w_con, strict=True)
    py = rm.fwd_ntt_harvey(a, p.q, plan.w, plan.w_con)
    jx = api.fwd_ntt(a, p, variant="radix2")
    np.testing.assert_array_equal(cpp_simple, py)
    np.testing.assert_array_equal(cpp_lazy, py)
    np.testing.assert_array_equal(jx, py)


@pytest.mark.parametrize("p", FIXTURES_FAST, ids=fixture_id)
def test_inv_parity(p, rng):
    plan = get_plan(p)
    a = make_input(rng, p.n, p.q)
    f = native.fwd_simple(a, p.q, plan.w)
    back_cpp = native.inv_simple(f, p.q, p.n_inv, plan.w_inv)
    np.testing.assert_array_equal(back_cpp, a)
    back_jx = api.inv_ntt(f, p, variant="radix2")
    np.testing.assert_array_equal(back_jx, a)


def test_powmod():
    assert native._load().nttcore_powmod(3, 20, 1000003) == pow(3, 20, 1000003)


def test_bench_protocol_runs():
    ns = native.bench_fwd_lazy64_ns(8, 0x1E01, 62, inner=10, reps=3)
    assert 0 < ns < 1e9
