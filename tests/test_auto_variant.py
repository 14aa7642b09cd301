"""Pin api._auto_variant's decision table to the recorded device sweep.

The reference publishes per-variant bench tables so users pick the
fastest kernel per case (README.md:61-67); our `auto` dispatch encodes
that choice.  tools/auto_sweep.py measures the candidate families on the
real chip and records artifacts/AUTO_SWEEP_r03.json; this test asserts
the table in api._AUTO_TABLE agrees with the recorded winners, so the
table can never silently drift from the measurements backing it.
"""

import json
import os

import numpy as np
import pytest

from ntt_tpu import api
from ntt_tpu.params import bench_params
from ntt_tpu.plan import get_plan

_ART_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "artifacts")
# newest recorded sweep wins; r04 adds _inv and batch-cliff rows
_ART = next(
    (p for p in (os.path.join(_ART_DIR, f"AUTO_SWEEP_r{n:02d}.json")
                 for n in range(9, 2, -1)) if os.path.exists(p)),
    os.path.join(_ART_DIR, "AUTO_SWEEP_r03.json"),
)


def test_auto_variant_always_legal():
    """auto must return a registered variant whose q-cap admits the plan,
    at every size from the tiny tail through serving sizes."""
    for qb in (27, 62):
        for m in (3, 5, 8, 10, 12, 14, 16):
            try:
                p = bench_params(m=m, q_bits=qb)
            except Exception:
                continue  # no bench prime at this (m, qb)
            plan = get_plan(p)
            name = api._auto_variant(plan)
            v = api.get_variant(name)
            assert p.q.bit_length() <= v.max_q_bits, (qb, m, name)


def test_auto_variant_roundtrips_small_n():
    """The dispatched kernel is correct at the small sizes the table
    special-cases (the N<256 tail where radix4-vec asserts)."""
    rng = np.random.default_rng(0)
    for qb in (27, 62):
        for m in (4, 6, 8):
            try:
                p = bench_params(m=m, q_bits=qb)
            except Exception:
                continue
            a = rng.integers(0, p.q, size=(2, p.n), dtype=np.uint64)
            fwd = api.fwd_ntt(a, p)  # variant="auto"
            inv = api.inv_ntt(fwd, p)
            np.testing.assert_array_equal(inv, a)


@pytest.mark.skipif(not os.path.exists(_ART),
                    reason="device sweep artifact not recorded yet")
def test_auto_table_matches_recorded_sweep():
    with open(_ART) as f:
        sweep = json.load(f)
    mismatches = []
    for key, row in sweep.items():
        parts = key.split("_")
        qb, m = int(parts[0][1:]), int(parts[1][1:])
        inverse = len(parts) > 2 and parts[2] == "inv"
        if len(parts) > 2 and parts[2].startswith("b"):
            # batch-cliff rows pin the serving-tile policy instead
            batch = int(parts[2][1:])
            plan = get_plan(bench_params(m=m, q_bits=qb))
            tile = api._auto_batch_tile(plan, batch)
            if tile is None:
                pick = "direct"
            elif batch // tile <= api._UNROLL_MAX_TILES:
                pick = "tiled-unroll"
            else:
                pick = "tiled-map"
            winner = row["winner"]
            if (pick != winner and pick in row
                    and row[pick] > row[winner] * 1.03):
                mismatches.append((key, pick, winner, row))
            continue
        p = bench_params(m=m, q_bits=qb)
        plan = get_plan(p)
        # the sweep keys bodies by width-generic family ("radix4"); the
        # dispatcher returns the registry name for the plan's limb width
        got = api._auto_variant(plan, inverse=inverse).replace("-u32", "")
        winner = row["winner"]
        # within-noise margin: accept the table's pick when it measured
        # within 3% of the sweep winner (loop-differencing run-to-run
        # spread; bench.py variance protocol)
        if got != winner and row.get(got) is not None:
            if row[got] <= row[winner] * 1.03:
                continue
        if got != winner:
            mismatches.append((key, got, winner, row))
    assert not mismatches, mismatches


def test_auto_batch_routing_bitexact():
    """variant='auto' past the u64 serving-batch cliff routes through the
    plan's tiled DeviceNtt handle (BATCH_LAB_r04 policy) and stays
    bit-identical to the direct sixstep program, fwd and inv."""
    from ntt_tpu.params import NttParams

    # m=9: above the small-N tail where auto picks the flat radix-2, so
    # the dispatched name is "sixstep" and the tiled route actually
    # engages (m=7 silently took the direct radix-2 path -- r5 fix)
    p = NttParams.generate(62, 9)
    plan = get_plan(p)
    rng = np.random.default_rng(7)
    a = rng.integers(0, p.q, size=(640, p.n), dtype=np.uint64)  # 5 tiles
    assert api._auto_batch_tile(plan, 640) == 128  # the policy engages
    assert api._auto_variant(plan) == "sixstep"
    want = api.fwd_ntt(a, p, variant="sixstep")
    got = api.fwd_ntt(a, p, variant="auto")
    assert api._plan_device_handle(plan)._tiled_cache, \
        "tiled path did not engage"
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(
        api.inv_ntt(got, p, variant="auto"),
        api.inv_ntt(want, p, variant="sixstep"),
    )
    # below-cliff calls keep the direct path
    small = rng.integers(0, p.q, size=(64, p.n), dtype=np.uint64)
    np.testing.assert_array_equal(
        api.fwd_ntt(small, p, variant="auto"),
        api.fwd_ntt(small, p, variant="sixstep"),
    )


def test_u32_serving_tile_policy():
    """(r5) the u32 path tiles past the b512 cliff too: the round-3
    'tiling loses 49%' held at b256, but at b1024 the 256-row chain wins
    1.5-1.9x (artifacts/U32_SERVING_r05.json)."""
    from ntt_tpu.params import NttParams

    p = NttParams.generate(29, 10)
    plan = get_plan(p)
    assert plan.supports_u32_radix2
    assert api._auto_batch_tile(plan, 256) is None   # headline stays direct
    assert api._auto_batch_tile(plan, 512) is None
    assert api._auto_batch_tile(plan, 1024) == 256
    # bit-exactness of the tiled route through the public API
    rng = np.random.default_rng(12)
    a = rng.integers(0, p.q, size=(1024, p.n), dtype=np.uint64)
    np.testing.assert_array_equal(
        api.fwd_ntt(a, p, variant="auto"),
        api.fwd_ntt(a, p, variant="sixstep"),
    )


def test_auto_routes_large_n_to_rec():
    """(r5) large N routes to the two-level recursive six-step -- the
    measured winner at every batch/width for m >= 18 (REC_LAB_*_r05
    artifacts) -- and mid sizes route by batch-starvation."""
    from ntt_tpu.params import NttParams

    p23 = NttParams.generate(29, 23)
    plan23 = get_plan(p23)
    assert api._auto_variant(plan23) == "sixstep-rec"
    assert api._auto_variant(plan23, inverse=True) == "sixstep-rec"
    assert api._auto_variant(plan23, rows=1024) == "sixstep-rec"
    # m 16..22: rec only up to the measured-win row caps (batch is the
    # driver -- the flat kernel gets its vector width from the batch dim;
    # the tabs-enabled flat retakes every b8 cell except m16 u32)
    p18 = NttParams.generate(29, 18)
    plan18 = get_plan(p18)
    assert api._auto_variant(plan18, rows=1) == "sixstep-rec"   # b1 win
    assert api._auto_variant(plan18, rows=8) != "sixstep-rec"   # b8 flat
    p16 = NttParams.generate(29, 16)
    plan16 = get_plan(p16)
    assert api._auto_variant(plan16, rows=2) == "sixstep-rec"
    assert api._auto_variant(plan16, rows=8) == "sixstep-rec"   # b8 win
    assert api._auto_variant(plan16, rows=64) != "sixstep-rec"
    assert api._auto_variant(plan16) != "sixstep-rec"  # unknown batch
    # execution: the routed path is bit-exact with the explicit variant
    rng = np.random.default_rng(11)
    a = rng.integers(0, p16.q, size=(2, p16.n), dtype=np.uint64)
    got = api.fwd_ntt(a, p16)  # auto, rows=2 -> rec
    np.testing.assert_array_equal(got, api.fwd_ntt(a, p16, variant="sixstep"))
    np.testing.assert_array_equal(api.inv_ntt(got, p16), a)


def test_auto_batch_routing_stacked_and_lazy():
    """(r4 verdict #6) leading dims are flattened before the policy check:
    a (2, 320, N) stacked batch is 640 serving rows and engages the tiled
    path; lazy=True routes through a lazy-configured handle instead of
    silently falling off the policy."""
    from ntt_tpu.params import NttParams

    p = NttParams.generate(62, 9)
    plan = get_plan(p)
    rng = np.random.default_rng(8)
    a = rng.integers(0, p.q, size=(2, 320, p.n), dtype=np.uint64)
    assert api._auto_tile_rows(plan, a) == 640
    want = api.fwd_ntt(a, p, variant="sixstep")
    got = api.fwd_ntt(a, p, variant="auto")
    assert got.shape == a.shape
    np.testing.assert_array_equal(got, want)
    assert api._plan_device_handle(plan)._tiled_cache, \
        "tiled path did not engage for a stacked batch"
    np.testing.assert_array_equal(
        api.inv_ntt(got, p, variant="auto"),
        api.inv_ntt(want, p, variant="sixstep"),
    )
    # lazy: tiled via the lazy handle, bit-exact with the direct lazy
    # program (tiling slices rows; the transform is per-row)
    lz = api.fwd_ntt(a, p, variant="auto", lazy=True)
    np.testing.assert_array_equal(
        lz, api.fwd_ntt(a, p, variant="sixstep", lazy=True))
    assert api._plan_device_handle(plan, lazy=True)._tiled_cache
