"""Lane-tiled six-step phases for huge N (round 4).

The m=24 scaling measurements (SCALING_MODEL_M24_r04.log, both splits)
exposed a per-phase cliff: phase1 at (2, 256, 16384) moves the same
67 MB as the m=22 phase at (4, 2048, 1024) but runs ~13-18x slower
(~16 GB/s effective vs ~290) -- per-stage intermediates blow past the
XLA fusion window, every stage round-trips HBM, and the cost becomes
nearly independent of how much real work there is.  The serving-batch
study hit the same physics at b>512 and the fix was tiling
(docs/PERF.md round-4 serving section): run the SAME exact stage
programs on slices small enough to stay VMEM-resident.

Here the batch is tiny (2) so we tile the LANE axis instead:

  phase1 (B, N1, L):  lax.map over L/T tiles of (B, N1, T)
  phase2 (B, n2, C):  lax.map over C/T column tiles of (B, n2, T)
                      (plus the pre/post relayout transposes per tile)

Each tile's stage chain is bit-identical to the direct program's on
those lanes/columns (the stages never mix lanes; phase2 never mixes
columns), so this is a pure schedule change -- asserted below against
the direct program at a small size.

Usage (real TPU): python tools/phase_tile_lab.py --m 24 --d 4 [--batch 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=24)
    ap.add_argument("--d", type=int, default=4, help="model mesh size D")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--n1-log", type=int, default=None)
    ap.add_argument("--tiles", default="512,1024,2048",
                    help="lane-tile widths to try")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.out is None:
        args.out = f"artifacts/PHASE_TILE_LAB_m{args.m}_r04.json"

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_ntt_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from bench import _measure_loop
    from ntt_tpu.kernels import sixstep as ss
    from ntt_tpu.kernels.elems import U64Ops, tmap
    from ntt_tpu.params import bench_params
    from ntt_tpu.plan import get_plan

    p = bench_params(m=args.m, q_bits=62)
    plan = get_plan(p)
    q = p.q
    w, wc = plan.dev_r2_u64[0], plan.dev_r2_u64[1]
    n = p.n
    group = ss.default_group(2)
    n1_log = args.n1_log if args.n1_log is not None else ss.default_split(n)
    n1, n2 = 1 << n1_log, n >> n1_log
    d, batch = args.d, args.batch
    print(f"phase tile lab: m={args.m} n1=2^{n1_log} D={d} batch={batch} "
          f"device={jax.devices()[0].device_kind}", flush=True)

    rng = np.random.default_rng(0)
    results = {"m": args.m, "n1_log": n1_log, "d": d, "batch": batch,
               "rows": {}}

    def row(name, sec, per):
        us = round(sec / per * 1e6, 3)
        results["rows"][name] = us
        print(f"  {name:24s} {us:12.3f} us/t", flush=True)

    def assert_same(f, g, x):
        """One run of each; device-side equality, scalar fetch."""
        ya = jax.jit(lambda x, w, wc: f(x, w, wc))(x, w, wc)
        yb = jax.jit(lambda x, w, wc: g(x, w, wc))(x, w, wc)
        same = jnp.asarray(True)
        for la, lb in zip(ya, yb):
            same = jnp.logical_and(same, (la == lb).all())
        assert bool(same), "tiled phase != direct phase"

    # ---- phase 1 at the sharded shape (B, N1, L), L = N2/D ----
    L = n2 // d
    a1 = U64Ops.from_host(
        rng.integers(0, q, size=(batch, n1, L), dtype=np.uint64))

    def p1_direct(x, w, wc):
        return ss.fwd_phase1(x, U64Ops, w, wc, q, n1, L, group=group)

    row("p1-direct", _measure_loop(p1_direct, a1, reps=args.reps, k1=2,
                                   k2=6, consts=(w, wc)), batch)

    for t in (int(x) for x in args.tiles.split(",")):
        if L % t or L == t:
            continue
        nt = L // t

        def p1_tiled(x, w, wc, t=t, nt=nt):
            # lanes are independent: regroup L -> (nt, t) and map the
            # exact same stage chain per tile
            shaped = tmap(
                lambda l: jnp.moveaxis(
                    l.reshape(l.shape[:-1] + (nt, t)), -2, 0), x)
            out = jax.lax.map(
                lambda tile: ss.fwd_phase1(tile, U64Ops, w, wc, q, n1, t,
                                           group=group), shaped)
            return tmap(
                lambda l: jnp.moveaxis(l, 0, -2).reshape(
                    l.shape[1:-1] + (nt * l.shape[-1],)), out)

        assert_same(p1_direct, p1_tiled, a1)
        row(f"p1-tiled@{t}", _measure_loop(p1_tiled, a1, reps=args.reps,
                                           k1=2, k2=6, consts=(w, wc)), batch)

    # ---- phase 2 at the sharded shape: input (B, C, n2), C = N1/D ----
    C = n1 // d
    a2 = U64Ops.from_host(
        rng.integers(0, q, size=(batch, C, n2), dtype=np.uint64))

    def p2_direct(x, w, wc):
        x = tmap(lambda l: jnp.swapaxes(l, -1, -2), x)
        x = ss.fwd_phase2(x, U64Ops, w, wc, q, n1, n2, 0, C,
                          group=group, strict=True)
        return tmap(lambda l: jnp.swapaxes(l, -1, -2), x)

    row("p2-direct", _measure_loop(p2_direct, a2, reps=args.reps, k1=2,
                                   k2=6, consts=(w, wc)), batch)

    for t in (1, 2, 4, 8, 16, 32):
        if C % t or C == t:
            continue
        nt = C // t

        def p2_tiled(x, w, wc, t=t, nt=nt):
            # columns are independent in the row stages; col0 offsets only
            # shift which twiddle row a column consumes, and every column
            # here uses its own global index anyway via col0=base of tile
            shaped = tmap(
                lambda l: jnp.moveaxis(
                    l.reshape(l.shape[:-2] + (nt, t, l.shape[-1])), -3, 0), x)

            def one(args_):
                i, tile = args_
                tile = tmap(lambda l: jnp.swapaxes(l, -1, -2), tile)
                out = ss.fwd_phase2(tile, U64Ops, w, wc, q, n1, n2,
                                    i * t, t, group=group, strict=True)
                return tmap(lambda l: jnp.swapaxes(l, -1, -2), out)

            idx = jnp.arange(nt)
            out = jax.lax.map(one, (idx, shaped))
            return tmap(
                lambda l: jnp.moveaxis(l, 0, -3).reshape(
                    l.shape[1:-2] + (nt * l.shape[-2], l.shape[-1])), out)

        assert_same(p2_direct, p2_tiled, a2)
        row(f"p2-tiled@{t}", _measure_loop(p2_tiled, a2, reps=args.reps,
                                           k1=2, k2=6, consts=(w, wc)), batch)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
