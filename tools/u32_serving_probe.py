"""u32 serving-batch tiling probe (round 5).

The round-3/4 finding 'u32 tiling is 49% slower' was measured at the
headline batch (256).  The round-5 RNS bench read the UNTILED u32 b1024
ct-mul at 16.4-30.9 us -- no faster than the tiled u64 path despite u32
transforms being ~4.5x cheaper -- suggesting the u32 direct program hits
the same VMEM-residency cliff at b1024 that u64 hit past 512.  This
probe interleaves direct vs tiled u32 fwd and ct-mul at b1024.

Usage (real TPU): python tools/u32_serving_probe.py
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
    ap.add_argument("--tiles", default="256,512")
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--out", default="artifacts/U32_SERVING_r05.json")
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_ntt_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from bench import _measure_loop
    from ntt_tpu import api
    from ntt_tpu.params import bench_params

    B = args.batch
    p = bench_params(m=args.m, q_bits=29)
    print(f"u32 serving probe: device={jax.devices()[0].device_kind} "
          f"N=2^{args.m} q29 batch={B}", flush=True)
    rng = np.random.default_rng(0)
    a = rng.integers(0, p.q, size=(B, p.n), dtype=np.uint64)
    b = rng.integers(0, p.q, size=(B, p.n), dtype=np.uint64)

    ctxs = {"direct": api.DeviceNtt(p, batch_tile=None)}
    for t in (int(x) for x in args.tiles.split(",")):
        ctxs[f"tile{t}"] = api.DeviceNtt(p, batch_tile=t)

    rows = {}
    for name, ctx in ctxs.items():
        ra, rb = ctx.from_host(a), ctx.from_host(b)
        rows[f"{name}_fwd"] = (lambda x, ctx=ctx: ctx.fwd(x)), ra
        rows[f"{name}_ctmul"] = (
            lambda ab, ctx=ctx: (ctx.negacyclic(ab[0], ab[1]), ab[0]),
            (ra, rb),
        )

    results = {"m": args.m, "batch": B, "rows": {k: [] for k in rows}}
    for r in range(args.rounds):
        print(f"--- round {r + 1}/{args.rounds} ---", flush=True)
        for name, (body, x0) in rows.items():
            sec = _measure_loop(body, x0, reps=3, k1=2, k2=10)
            us = sec / B * 1e6
            results["rows"][name].append(round(us, 3))
            print(f"  {name:14s} {us:8.3f} us/row", flush=True)
    results["summary"] = {
        k: {"min": min(v), "max": max(v)} for k, v in results["rows"].items()
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
