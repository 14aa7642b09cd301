"""Round-4 HE-batch lab (VERDICT r3 #3): u64 N=2^14 at serving batch 1024.

Measured state entering round 4: b128 direct 4.8 us/t, b1024 direct 8.5,
b1024 lax.map-tiled 6.2 (DeviceNtt batch_tile).  Target <=5.5 us/t at
b1024 under the interleaved-control protocol, or a PERF.md-quality
refutation.  Levers, per VERDICT:

  unroll  -- statically unrolled tile chain instead of lax.map (round 3
             measured unroll16@2048 5.13-5.43 vs lax.map 5.05-7.08: the
             unrolled chain avoids the loop-carried dynamic-update-slice
             and is run-to-run stable);
  tile    -- tile-size sweep (128 vs 256) in both modes;
  split   -- n1_log at large batch (N2=128/N2=32 vs the b128-optimal
             N2=64) for the direct program.

The Pallas batch-tile path is NOT re-measured here: the fused u64 forward
is VMEM-capped at tile_b=8 and measured 17.37 us/t (BENCH_SUITE_q62_r03),
>2x the existing lax.map number at any batch -- the per-tile rate is
batch-independent, so it cannot win the b1024 regime either (recorded as
the task-3 Pallas refutation; see docs/PERF.md).

Usage (real TPU): python tools/batch_lab.py [--rounds 2] [--batch 1024]
"""

from __future__ import annotations

import argparse
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
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--m", type=int, default=14)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_ntt_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from bench import _measure_loop

    p = bench_params(m=args.m, q_bits=62)
    plan = get_plan(p)
    q = p.q
    w_rep, wc_rep = plan.dev_r2_u64[0], plan.dev_r2_u64[1]
    rng = np.random.default_rng(0)
    B = args.batch
    print(f"batch lab: device={jax.devices()[0].device_kind} q=62bit "
          f"N=2^{p.m} batch={B}", flush=True)

    def direct(n1_log=None):
        def body(x):
            return ss.fwd_sixstep(x, U64Ops, w_rep, wc_rep, q, n1_log,
                                  strict=True)
        return body

    def one(x):
        return ss.fwd_sixstep(x, U64Ops, w_rep, wc_rep, q, strict=True)

    def laxmap(tile):
        nt = B // tile

        def body(x):
            shaped = tuple(l.reshape((nt, tile) + l.shape[1:]) for l in x)
            out = jax.lax.map(one, shaped)
            return tuple(l.reshape((B,) + l.shape[2:]) for l in out)
        return body

    def unroll(tile):
        nt = B // tile

        def body(x):
            import jax.numpy as jnp
            outs = [one(tuple(l[i * tile:(i + 1) * tile] for l in x))
                    for i in range(nt)]
            return tuple(jnp.concatenate(ls, axis=0) for ls in zip(*outs))
        return body

    a128 = U64Ops.from_host(rng.integers(0, q, size=(128, p.n), dtype=np.uint64))
    aB = U64Ops.from_host(rng.integers(0, q, size=(B, p.n), dtype=np.uint64))

    candidates = [
        ("direct@%d" % B, direct(), aB, B),
        ("laxmap 128x%d" % (B // 128), laxmap(128), aB, B),
        ("unroll 128x%d" % (B // 128), unroll(128), aB, B),
        ("unroll 256x%d" % (B // 256), unroll(256), aB, B),
        ("direct@%d n1_log7 (N2=128)" % B, direct(7), aB, B),
        ("direct@%d n1_log9 (N2=32)" % B, direct(9), aB, B),
    ]

    for r in range(args.rounds):
        print(f"--- round {r + 1}/{args.rounds} ---", flush=True)
        sec = _measure_loop(direct(), a128, reps=5, k1=2, k2=18)
        print(f"  control direct@128        {sec / 128 * 1e6:8.3f} us/t "
              f"({128 / sec:12,.0f} tps)", flush=True)
        for label, body, x0, b in candidates:
            sec = _measure_loop(body, x0, reps=5, k1=2, k2=18)
            print(f"  {label:26s} {sec / b * 1e6:8.3f} us/t "
                  f"({b / sec:12,.0f} tps)", flush=True)


if __name__ == "__main__":
    main()
