"""Batch-lab follow-up: where does the unrolled tiling's residual go?

batch_lab round 1 (artifacts/BATCH_LAB_r04.log): at b1024, unroll 128x8
reads 5.59-5.80 us/t vs direct@128's 4.83-4.96 -- a ~15% overhead over
perfect tiling.  Candidates for the residual: the output concatenate
(a full extra HBM write), or the tiles' shared-program scheduling.

  noconcat -- unrolled tiles whose outputs are returned as a TUPLE
              (no final concatenate).  For fori_loop chaining the body
              re-consumes the tuple, so the measured loop is the pure
              8-tile compute chain.  If this reads ~4.9, the concat IS
              the residual and a tiled-output serving contract captures
              the win; if it still reads ~5.6, the residual is
              scheduling, and 5.5 is refuted.
  unroll64 -- 16 smaller tiles (more VMEM headroom per tile).
  stacked  -- tile axis as a leading reshape + one vmapped program
              (XLA sees (8, 128, N): does it schedule tiles better than
              lax.map or the unrolled chain?)

Usage (real TPU): python tools/batch_lab2.py [--rounds 2]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ntt_tpu.kernels import sixstep as ss
from ntt_tpu.kernels.elems import U64Ops
from ntt_tpu.params import bench_params
from ntt_tpu.plan import get_plan


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--batch", type=int, default=1024)
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_ntt_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from bench import _measure_loop

    p = bench_params(m=14, q_bits=62)
    plan = get_plan(p)
    q = p.q
    w_rep, wc_rep = plan.dev_r2_u64[0], plan.dev_r2_u64[1]
    rng = np.random.default_rng(0)
    B = args.batch
    print(f"batch lab 2: device={jax.devices()[0].device_kind} q=62bit "
          f"N=2^14 batch={B}", flush=True)

    def one(x):
        return ss.fwd_sixstep(x, U64Ops, w_rep, wc_rep, q, strict=True)

    def direct128(x):
        return one(x)

    def unroll(tile):
        nt = B // tile

        def body(x):
            outs = [one(tuple(l[i * tile:(i + 1) * tile] for l in x))
                    for i in range(nt)]
            return tuple(jnp.concatenate(ls, axis=0) for ls in zip(*outs))
        return body

    def unroll_noconcat(tile):
        nt = B // tile

        def body(tiles):  # tiles: tuple over nt of reps
            return tuple(one(t) for t in tiles)
        return body, nt

    a128 = U64Ops.from_host(rng.integers(0, q, size=(128, p.n), dtype=np.uint64))
    aB = U64Ops.from_host(rng.integers(0, q, size=(B, p.n), dtype=np.uint64))
    nc_body, nt = unroll_noconcat(128)
    a_tiles = tuple(
        tuple(l[i * 128:(i + 1) * 128] for l in aB) for i in range(nt)
    )

    def stacked(x):
        shaped = tuple(l.reshape((B // 128, 128) + l.shape[1:]) for l in x)
        out = jax.vmap(one)(shaped)
        return tuple(l.reshape((B,) + l.shape[2:]) for l in out)

    rows = [
        ("unroll 128x%d (concat)" % nt, unroll(128), aB, B),
        ("unroll 128x%d NOCONCAT" % nt, nc_body, a_tiles, B),
        ("unroll 64x%d (concat)" % (B // 64), unroll(64), aB, B),
        ("vmap-stacked 128x%d" % nt, stacked, aB, B),
    ]
    for r in range(args.rounds):
        print(f"--- round {r + 1}/{args.rounds} ---", flush=True)
        sec = _measure_loop(direct128, a128, reps=5, k1=2, k2=18)
        print(f"  control direct@128        {sec / 128 * 1e6:8.3f} us/t "
              f"({128 / sec:12,.0f} tps)", flush=True)
        for label, body, x0, b in rows:
            sec = _measure_loop(body, x0, reps=5, k1=2, k2=18)
            print(f"  {label:26s} {sec / b * 1e6:8.3f} us/t "
                  f"({b / sec:12,.0f} tps)", flush=True)


if __name__ == "__main__":
    main()
