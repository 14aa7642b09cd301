"""On-chip RNS ciphertext-multiply bench (VERDICT r4 #3).

Measures the end-to-end device cost of one HE-style ciphertext multiply
through DeviceRnsTower.negacyclic: k channels x (2 forward NTTs +
pointwise + inverse NTT), all device-resident, at the BASELINE configs[2]
serving batch (1024) -- with interleaved SINGLE-CHANNEL controls at the
same batch so the per-channel overhead of the composed tower is a
measured number, not an assumption (tower should cost ~k x the
single-channel ct-mul; anything above that is composition overhead).

Default rows (N = 2^14, batch 1024, 2 rounds):
  ctrl_1x62   single 62-bit channel  (the round-4 measured 16.9-17.0
              us/ct-mul config, the drift anchor)
  tower_3x30  3 x 30-bit tower (u32 channels; CKKS-style limb widths)
  tower_2x62  2 x 62-bit tower (u64 channels)
  ctrl_1x30   single 30-bit channel

Usage (real TPU): python tools/rns_bench.py [--m 14] [--batch 1024]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=14)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default="artifacts/RNS_BENCH_r05.json")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_ntt_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from bench import _measure_loop
    from ntt_tpu.rns import DeviceRnsTower

    B = args.batch
    print(f"rns bench: device={jax.devices()[0].device_kind} N=2^{args.m} "
          f"batch={B}", flush=True)
    rng = np.random.default_rng(0)

    towers = {
        "ctrl_1x62": DeviceRnsTower(args.m, q_bits=(62,)),
        "tower_3x30": DeviceRnsTower(args.m, q_bits=(30, 30, 30)),
        "tower_2x62": DeviceRnsTower(args.m, q_bits=(62, 62)),
        "ctrl_1x30": DeviceRnsTower(args.m, q_bits=(30,)),
    }
    inputs = {}
    for name, tw in towers.items():
        ch = np.stack([rng.integers(0, p.q, size=(B, tw.n), dtype=np.uint64)
                       for p in tw.params])
        ch2 = np.stack([rng.integers(0, p.q, size=(B, tw.n), dtype=np.uint64)
                        for p in tw.params])
        inputs[name] = (tw.from_host(ch), tw.from_host(ch2))

    def body_for(tw):
        def body(ab):
            # both operands loop-varying (b_{k+1} = a_k): squaring or a
            # fixed second operand lets XLA CSE/hoist one of the two
            # forwards out of the measured loop (CLAUDE.md LICM note);
            # this pair chain pays the full 2 fwd + pw + inv per channel
            a, b = ab
            return tw.negacyclic(a, b), a
        return body

    results = {"m": args.m, "batch": B, "rows": {n: [] for n in towers}}
    for r in range(args.rounds):
        print(f"--- round {r + 1}/{args.rounds} ---", flush=True)
        for name, tw in towers.items():
            sec = _measure_loop(body_for(tw), inputs[name], reps=3, k1=2,
                                k2=8)
            us = sec / B * 1e6
            results["rows"][name].append(round(us, 3))
            k = len(tw.params)
            print(f"  {name:10s} {us:8.3f} us/ct-mul  "
                  f"(per-channel {us / k:6.3f}; {B / sec:10,.1f} ct/s)",
                  flush=True)

    # composition overhead: tower vs k x the matching single-channel row
    mins = {n: min(v) for n, v in results["rows"].items()}
    results["summary"] = {
        n: {"min": mins[n], "max": max(v),
            "band_pct": round((max(v) - mins[n]) / mins[n] * 100, 1)}
        for n, v in results["rows"].items()
    }
    for tower_name, ctrl, k in (("tower_3x30", "ctrl_1x30", 3),
                                ("tower_2x62", "ctrl_1x62", 2)):
        ovh = (mins[tower_name] / (k * mins[ctrl]) - 1) * 100
        results["summary"][tower_name]["overhead_vs_kx_single_pct"] = \
            round(ovh, 1)
        print(f"{tower_name}: {mins[tower_name]:.2f} us vs {k}x "
              f"{ctrl} {k * mins[ctrl]:.2f} us -> overhead {ovh:+.1f}%",
              flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
