"""Distributed six-step NTT on a virtual 8-device CPU mesh.

Validates that the sharded transform (shard_map + all_to_all) is bit-exact
with the golden single-device kernel, at several mesh sizes and splits,
plus the batch-parallel HE mode and scaling sanity."""

import numpy as np
import pytest

from ntt_tpu import api
from ntt_tpu.dist import sixstep as dist
from ntt_tpu.params import FIXTURES, NttParams
from ntt_tpu.plan import get_plan

from conftest import fixture_id, make_input

import jax

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


CASES = [FIXTURES[2], FIXTURES[6], FIXTURES[13]]  # u32 small, u32 2^14, u64 51-bit


@pytest.mark.parametrize("p", CASES, ids=fixture_id)
@pytest.mark.parametrize("ndev", [2, 8])
def test_dist_fwd_bitexact(p, ndev, rng):
    plan = get_plan(p)
    mesh = dist.default_mesh(ndev)
    a = make_input(rng, p.n, p.q, batch=2)
    got = dist.dist_fwd_ntt(a, plan, mesh=mesh)
    want = api.fwd_ntt(a, p, variant="radix2")
    np.testing.assert_array_equal(got, want)


def test_dist_accepts_params_directly(rng):
    """Every dist entry point resolves NttParams like api.fwd_ntt does
    (_as_plan) -- callers shouldn't need to know about the plan cache."""
    p = CASES[0]
    mesh = dist.default_mesh(8)
    a = make_input(rng, p.n, p.q, batch=2)
    got = dist.dist_fwd_ntt(a, p, mesh=mesh)
    np.testing.assert_array_equal(got, api.fwd_ntt(a, p, variant="radix2"))
    np.testing.assert_array_equal(dist.dist_inv_ntt(got, p, mesh=mesh), a)


@pytest.mark.parametrize("p", CASES, ids=fixture_id)
def test_dist_roundtrip(p, rng):
    plan = get_plan(p)
    mesh = dist.default_mesh(8)
    a = make_input(rng, p.n, p.q, batch=2)
    f = dist.dist_fwd_ntt(a, plan, mesh=mesh)
    back = dist.dist_inv_ntt(f, plan, mesh=mesh)
    np.testing.assert_array_equal(back, a)


def test_dist_lazy(rng):
    p = FIXTURES[13]
    plan = get_plan(p)
    mesh = dist.default_mesh(8)
    a = make_input(rng, p.n, p.q, batch=1)
    got = dist.dist_fwd_ntt(a, plan, mesh=mesh, lazy=True)
    want = api.fwd_ntt(a, p, variant="radix2", lazy=True)
    np.testing.assert_array_equal(got, want)


def test_dist_large_n(rng):
    """N = 2^20 distributed (BASELINE.json configs[4] small end)."""
    p = NttParams.generate(29, 20)
    plan = get_plan(p)
    mesh = dist.default_mesh(8)
    a = make_input(rng, p.n, p.q)
    f = dist.dist_fwd_ntt(a, plan, mesh=mesh)
    back = dist.dist_inv_ntt(f, plan, mesh=mesh)
    np.testing.assert_array_equal(back, a)
    # spot-check a few outputs against the NumPy oracle
    from ntt_tpu import refmodel as rm

    want = rm.fwd_ntt_harvey(a, p.q, plan.w, plan.w_con)
    np.testing.assert_array_equal(f, want)


def test_batch_parallel(rng):
    p = FIXTURES[6]
    plan = get_plan(p)
    mesh = dist.default_mesh(8)
    a = make_input(rng, p.n, p.q, batch=16)
    got = dist.batch_parallel_fwd(a, plan, mesh=mesh)
    want = api.fwd_ntt(a, p, variant="radix2")
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("shape", [(2, 4), (4, 2)])
def test_dist_2d_mesh_dp_x_sp(shape, rng):
    """2-D mesh: batch data-parallel over 'dp' AND each transform sharded
    over 'x' simultaneously -- the composed dp x sp mode."""
    p = FIXTURES[6]
    plan = get_plan(p)
    mesh = dist.mesh_2d(*shape)
    a = make_input(rng, p.n, p.q, batch=4)
    got = dist.dist_fwd_ntt(a, plan, mesh=mesh, batch_axis="dp")
    want = api.fwd_ntt(a, p, variant="radix2")
    np.testing.assert_array_equal(got, want)
    back = dist.dist_inv_ntt(got, plan, mesh=mesh, batch_axis="dp")
    np.testing.assert_array_equal(back, a)


def test_dist_2d_mesh_u64(rng):
    p = FIXTURES[13]  # 51-bit q: u64 limb path
    plan = get_plan(p)
    mesh = dist.mesh_2d(2, 4)
    a = make_input(rng, p.n, p.q, batch=2)
    got = dist.dist_fwd_ntt(a, plan, mesh=mesh, batch_axis="dp")
    np.testing.assert_array_equal(got, api.fwd_ntt(a, p, variant="radix2"))


@pytest.mark.parametrize("n_chunks", [2, 4])
def test_dist_fwd_chunked_overlap(n_chunks, rng):
    """Column-chunked all_to_all (comm/compute overlap) is bit-exact with
    the monolithic collective."""
    p = FIXTURES[6]
    plan = get_plan(p)
    mesh = dist.default_mesh(8)
    a = make_input(rng, p.n, p.q, batch=2)
    got = dist.dist_fwd_ntt(a, plan, mesh=mesh, n_chunks=n_chunks)
    want = api.fwd_ntt(a, p, variant="radix2")
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n_chunks", [2, 4])
def test_dist_inv_chunked_overlap(n_chunks, rng):
    """Output-lane-chunked inverse collective is bit-exact with the
    monolithic one (mirror of the forward chunking)."""
    p = FIXTURES[6]
    plan = get_plan(p)
    mesh = dist.default_mesh(8)
    a = make_input(rng, p.n, p.q, batch=2)
    f = dist.dist_fwd_ntt(a, plan, mesh=mesh, n_chunks=n_chunks)
    back = dist.dist_inv_ntt(f, plan, mesh=mesh, n_chunks=n_chunks)
    np.testing.assert_array_equal(back, a)


def test_dist_polymul_chunked(rng):
    """Chunked overlap through the whole fused polymul pipeline."""
    p = FIXTURES[6]
    plan = get_plan(p)
    mesh = dist.default_mesh(8)
    a = make_input(rng, p.n, p.q, batch=2)
    b = make_input(rng, p.n, p.q, batch=2)
    got = dist.dist_negacyclic_mul(a, b, plan, mesh=mesh, n_chunks=2)
    np.testing.assert_array_equal(got, api.negacyclic_mul(a, b, p))


@pytest.mark.parametrize("p", [FIXTURES[2], FIXTURES[13]], ids=fixture_id)
def test_dist_negacyclic_mul(p, rng):
    """Fully-sharded polymul pipeline == host negacyclic_mul (which is
    itself pinned to the schoolbook oracle in test_polymul.py)."""
    plan = get_plan(p)
    mesh = dist.default_mesh(8)
    a = make_input(rng, p.n, p.q, batch=2)
    b = make_input(rng, p.n, p.q, batch=2)
    got = dist.dist_negacyclic_mul(a, b, plan, mesh=mesh)
    want = api.negacyclic_mul(a, b, p)
    np.testing.assert_array_equal(got, want)


def test_dist_negacyclic_mul_2d(rng):
    p = FIXTURES[6]
    plan = get_plan(p)
    mesh = dist.mesh_2d(2, 4)
    a = make_input(rng, p.n, p.q, batch=4)
    b = make_input(rng, p.n, p.q, batch=4)
    got = dist.dist_negacyclic_mul(a, b, plan, mesh=mesh, batch_axis="dp")
    np.testing.assert_array_equal(got, api.negacyclic_mul(a, b, p))


def test_custom_split(rng):
    p = FIXTURES[6]  # N=2^14
    plan = get_plan(p)
    mesh = dist.default_mesh(4)
    a = make_input(rng, p.n, p.q, batch=1)
    for n1_log in (5, 7, 9):
        got = dist.dist_fwd_ntt(a, plan, mesh=mesh, n1_log=n1_log)
        want = api.fwd_ntt(a, p, variant="radix2")
        np.testing.assert_array_equal(got, want, err_msg=f"n1_log={n1_log}")


@pytest.mark.full
def test_dist_large_n_2_22(rng):
    """N = 2^22 distributed, u32 path (BASELINE.json configs[4] mid-range:
    2^20..2^24).  Full tier: the CPU-mesh compile at this size is slow."""
    p = NttParams.generate(29, 22)
    plan = get_plan(p)
    mesh = dist.default_mesh(8)
    a = make_input(rng, p.n, p.q)
    f = dist.dist_fwd_ntt(a, plan, mesh=mesh)
    back = dist.dist_inv_ntt(f, plan, mesh=mesh)
    np.testing.assert_array_equal(back, a)
    from ntt_tpu import refmodel as rm

    want = rm.fwd_ntt_harvey(a, p.q, plan.w, plan.w_con)
    np.testing.assert_array_equal(f, want)


@pytest.mark.parametrize("p", CASES, ids=fixture_id)
@pytest.mark.parametrize("ndev", [2, 8])
def test_dist_rec_fwd_bitexact(p, ndev, rng):
    """Recursive-structured dist transform (r5): local level transforms +
    one all_to_all + row-sharded twist == the golden radix-2 kernel."""
    plan = get_plan(p)
    mesh = dist.default_mesh(ndev)
    a = make_input(rng, p.n, p.q, batch=2)
    got = dist.dist_rec_fwd_ntt(a, plan, mesh=mesh)
    want = api.fwd_ntt(a, p, variant="radix2")
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("p", CASES, ids=fixture_id)
def test_dist_rec_roundtrip(p, rng):
    plan = get_plan(p)
    mesh = dist.default_mesh(8)
    a = make_input(rng, p.n, p.q, batch=2)
    f = dist.dist_rec_fwd_ntt(a, plan, mesh=mesh)
    np.testing.assert_array_equal(dist.dist_rec_inv_ntt(f, plan, mesh=mesh), a)


def test_dist_rec_lazy_and_2d(rng):
    p = FIXTURES[13]
    plan = get_plan(p)
    a = make_input(rng, p.n, p.q, batch=4)
    lz = dist.dist_rec_fwd_ntt(a, plan, mesh=dist.default_mesh(8), lazy=True)
    np.testing.assert_array_equal(
        lz % np.uint64(p.q), api.fwd_ntt(a, p, variant="radix2"))
    assert lz.max() < 4 * p.q
    mesh = dist.mesh_2d(2, 4)
    got = dist.dist_rec_fwd_ntt(a, plan, mesh=mesh, batch_axis="dp")
    np.testing.assert_array_equal(got, api.fwd_ntt(a, p, variant="radix2"))
    np.testing.assert_array_equal(
        dist.dist_rec_inv_ntt(got, plan, mesh=mesh, batch_axis="dp"), a)


@pytest.mark.full
def test_dist_large_n_2_24(rng):
    """N = 2^24 distributed, u32 path -- the literal end-point of
    BASELINE.json configs[4] (2^20..2^24 sharded; r4 verdict #1a).
    Full tier: ~4x the 2^22 test's CPU-mesh compile+run cost."""
    p = NttParams.generate(29, 24)
    plan = get_plan(p)
    mesh = dist.default_mesh(8)
    a = make_input(rng, p.n, p.q)
    f = dist.dist_fwd_ntt(a, plan, mesh=mesh)
    back = dist.dist_inv_ntt(f, plan, mesh=mesh)
    np.testing.assert_array_equal(back, a)
    from ntt_tpu import refmodel as rm

    want = rm.fwd_ntt_harvey(a, p.q, plan.w, plan.w_con)
    np.testing.assert_array_equal(f, want)


def test_scaling_model_predict():
    """The analytic multi-chip efficiency model (tools/scaling_model.py)
    is pure arithmetic over measured per-phase rows; pin it with a
    hand-computed case.  All terms are us per TRANSFORM: the one
    all_to_all moves N*8 bytes per transform (batch amortizes dispatch,
    not bytes), T_a2a = N*8/(8*W_l);
    efficiency(D) = t1 / (D * (p1 + p2 + a2a))."""
    import sys as _sys
    _sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent / "tools"))
    from scaling_model import predict

    rows = {
        "m": 20, "batch": 4, "t1_us": 800.0,
        "phases": {"4": {"p1_us": 110.0, "p2_us": 80.0},
                   "8": {"p1_us": 55.0, "p2_us": 40.0}},
    }
    # per transform: 2^20 * 8 = 8.389 MB; W_l = 100 GB/s -> a2a = 10.49 us
    table = predict(rows, 100.0)
    a2a_us = (1 << 20) * 8 / (8 * 100e9) * 1e6
    assert abs(table[0]["a2a_us"] - round(a2a_us, 3)) < 1e-9
    t4 = 110.0 + 80.0 + a2a_us
    assert abs(table[0]["efficiency_pct"] - round(800.0 / (4 * t4) * 100, 1)) < 1e-9
    t8 = 55.0 + 40.0 + a2a_us
    assert table[1]["D"] == 8
    assert abs(table[1]["speedup"] - round(800.0 / t8, 2)) < 1e-9
