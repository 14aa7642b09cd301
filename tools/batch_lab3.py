"""Batch-lab 3: does per-tile chaining close the b1024 serving gap?

batch_lab2 (artifacts/BATCH_LAB2_r04.log) localized the unrolled tiling
residual to the full-batch output concatenate: fwd-only at b1024 reads
4.99-5.03 us/t without the concat vs 5.36-5.74 with it (control 4.57-4.83).
A serving ct-multiply chains fwd+fwd+pointwise+inv, so per-tile chaining
(DeviceNtt.negacyclic) pays that concat ONCE per product instead of three
times -- predicted per-transform cost ~= noconcat + concat/3.

Rows (u64, N=2^14; negacyclic cost reported per TRANSFORM = total/(3B)
so it is directly comparable to fwd-only us/t):

  control        fwd direct@128 (the session device-state anchor)
  fwd auto@1024  DeviceNtt fwd, auto policy (unrolled 128-tiles + concat)
  nega chain@1024    per-tile chain, tile_mode=unroll (the new default)
  nega chain-map@1024 per-tile chain, tile_mode=map
  nega stagewise@1024 each stage tiled separately (3 concats) -- the
                      pre-round-4 behavior, for the delta
  nega direct@1024    untiled (the cliff)
  nega direct@128     the small-batch floor

Usage (real TPU): python tools/batch_lab3.py [--rounds 2]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from ntt_tpu import api
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
    print(f"batch lab 3: device={jax.devices()[0].device_kind} q=62bit "
          f"N=2^14 batch={B}", flush=True)

    def fwd_one(x):
        return ss.fwd_sixstep(x, U64Ops, w_rep, wc_rep, q, strict=True)

    a128 = U64Ops.from_host(
        rng.integers(0, q, size=(128, p.n), dtype=np.uint64))
    aB = U64Ops.from_host(rng.integers(0, q, size=(B, p.n), dtype=np.uint64))
    bB = U64Ops.from_host(rng.integers(0, q, size=(B, p.n), dtype=np.uint64))
    b128 = tuple(l[:128] for l in bB)

    ctx_auto = api.DeviceNtt(p)  # auto policy, unroll chain
    ctx_map = api.DeviceNtt(p, tile_mode="map")
    ctx_direct = api.DeviceNtt(p, batch_tile=None)

    def nega_body(ctx, b_rep):
        # NOTE (round-1 finding): with a loop-INVARIANT second operand,
        # XLA's while-loop LICM hoists fwd(b) out of the measurement loop,
        # so this body times fwd+pw+inv (one forward), not a full 2-fwd
        # product.  Kept for the tile-strategy comparison (every row
        # shares the artifact); the honest ct-mul number comes from the
        # pair rows below.
        def body(x):
            return ctx.negacyclic(x, b_rep)
        return body

    def nega_pair_body(ctx):
        # both operands loop-varying (b_{k+1} = a_k): nothing hoistable,
        # each iteration pays 2 fwd + pointwise + inv + concat
        def body(ab):
            a, b = ab
            return ctx.negacyclic(a, b), a
        return body

    def stagewise(x):
        # pre-round-4 behavior: each stage dispatched tiled, 3 concats
        return ctx_auto.inv(
            ctx_auto.pointwise(ctx_auto.fwd(x), ctx_auto.fwd(bB)))

    a128_rep = tuple(l[:128] for l in aB)
    rows = [
        # label, body, x0, batch, transforms-per-iteration
        ("fwd auto@1024 (concat)", ctx_auto.fwd, aB, B, 1.0),
        ("nega chain@1024 (LICM)", nega_body(ctx_auto, bB), aB, B, 3.0),
        ("nega chain-map@1024 (LICM)", nega_body(ctx_map, bB), aB, B, 3.0),
        ("nega stagewise@1024 (LICM)", stagewise, aB, B, 3.0),
        ("nega direct@1024 (LICM)", nega_body(ctx_direct, bB), aB, B, 3.0),
        ("nega PAIR chain@1024", nega_pair_body(ctx_auto), (aB, bB), B, 3.0),
        ("nega PAIR direct@1024", nega_pair_body(ctx_direct), (aB, bB),
         B, 3.0),
        ("nega PAIR direct@128", nega_pair_body(ctx_direct),
         (a128_rep, b128), 128, 3.0),
    ]
    for r in range(args.rounds):
        print(f"--- round {r + 1}/{args.rounds} ---", flush=True)
        sec = _measure_loop(fwd_one, a128, reps=5, k1=2, k2=18)
        print(f"  control fwd direct@128     {sec / 128 * 1e6:8.3f} us/t "
              f"({128 / sec:12,.0f} tps)", flush=True)
        for label, body, x0, b, ntrans in rows:
            sec = _measure_loop(body, x0, reps=5, k1=2, k2=18)
            ut = sec / (b * ntrans) * 1e6
            extra = (f"  ({sec / b * 1e6:8.3f} us/ct-mul)"
                     if ntrans > 1 else "")
            print(f"  {label:28s} {ut:8.3f} us/t{extra}", flush=True)


if __name__ == "__main__":
    main()
