"""N=2^16 u64 envelope stabilization study (VERDICT r3 #8).

The published N=2^16 u64 row carries a +/-14% session band (29.6-39.5
us/t across interleaved repeats, README + SOLINAS_Q_M16_AB_r03.log).
Hypothesis: the b128 working set (64MB input, ~190MB of live stage
intermediates) is HBM-thrash territory where device state dominates;
smaller batches should trade a little amortization for a stable
VMEM-resident schedule.

Protocol: every round measures the N=2^14 direct@128 control FIRST (the
known-stable device-state anchor), then every (batch, n1_log) config, so
config deltas can be separated from session drift.  Three rounds by
default; the published row should be the config whose cross-round band
is tightest (target <=10%).

Usage (real TPU): python tools/m16_stability.py [--rounds 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from ntt_tpu.kernels import sixstep as ss
from ntt_tpu.kernels.elems import U64Ops
from ntt_tpu.params import bench_params
from ntt_tpu.plan import get_plan


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--m", type=int, default=16,
                    help="transform size to study (u64)")
    ap.add_argument("--batches", default="32,64,128")
    ap.add_argument("--n1-logs", default="8,10")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.out is None:
        args.out = f"artifacts/M{args.m}_STABILITY_r04.json"
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_ntt_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from bench import _measure_loop

    print(f"m{args.m} stability: device={jax.devices()[0].device_kind}",
          flush=True)

    # control: the rock-stable N=2^14 direct@128 program
    p14 = bench_params(m=14, q_bits=62)
    plan14 = get_plan(p14)
    w14, wc14 = plan14.dev_r2_u64[0], plan14.dev_r2_u64[1]
    rng = np.random.default_rng(0)
    a14 = U64Ops.from_host(
        rng.integers(0, p14.q, size=(128, p14.n), dtype=np.uint64))

    def control(x):
        return ss.fwd_sixstep(x, U64Ops, w14, wc14, p14.q, strict=True)

    p16 = bench_params(m=args.m, q_bits=62)
    plan16 = get_plan(p16)
    q = p16.q
    w16, wc16 = plan16.dev_r2_u64[0], plan16.dev_r2_u64[1]

    batches = [int(b) for b in args.batches.split(",")]
    n1_logs = [int(s) for s in args.n1_logs.split(",")]
    configs = [(b, s) for b in batches for s in n1_logs]
    inputs = {
        b: U64Ops.from_host(
            rng.integers(0, q, size=(b, p16.n), dtype=np.uint64))
        for b in batches
    }

    def body_for(n1_log):
        def body(x):
            return ss.fwd_sixstep(x, U64Ops, w16, wc16, q, strict=True,
                                  n1_log=n1_log)
        return body

    results = {"control": [], "rows": {f"b{b}_n1log{s}": []
                                       for b, s in configs}}
    for r in range(args.rounds):
        print(f"--- round {r + 1}/{args.rounds} ---", flush=True)
        sec = _measure_loop(control, a14, reps=5, k1=2, k2=18)
        ct = sec / 128 * 1e6
        results["control"].append(round(ct, 3))
        print(f"  control m14 direct@128    {ct:8.3f} us/t", flush=True)
        for b, s in configs:
            sec = _measure_loop(body_for(s), inputs[b], reps=5, k1=2, k2=6)
            ut = sec / b * 1e6
            results["rows"][f"b{b}_n1log{s}"].append(round(ut, 3))
            print(f"  m{args.m} b{b:3d} n1_log={s:2d}        {ut:8.3f} us/t "
                  f"({b / sec:10,.0f} tps)", flush=True)

    print("\nsummary (min..max us/t, band % of min):")
    summary = {}
    for k, vals in results["rows"].items():
        lo, hi = min(vals), max(vals)
        band = (hi - lo) / lo * 100
        summary[k] = {"min": lo, "max": hi, "band_pct": round(band, 1)}
        print(f"  {k:14s} {lo:8.3f}..{hi:8.3f}  band {band:5.1f}%",
              flush=True)
    lo, hi = min(results["control"]), max(results["control"])
    print(f"  control        {lo:8.3f}..{hi:8.3f}  band "
          f"{(hi - lo) / lo * 100:5.1f}%", flush=True)
    results["summary"] = summary
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
