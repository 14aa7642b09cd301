"""Closure-vs-argument twiddle tables for the big-N phase programs.

Round-5 finding under investigation: SCALING_MODEL_r04's per-device
phase terms (m20 D=8: p1 31.9 / p2 30.9 us) were measured with tables
CLOSED OVER by the jitted loop body (pre-87a41b8), while the round-5
re-measurement with tables as jit ARGUMENTS (the production dist
calling convention, dist/sixstep.py: fn(*rep, *w, *wc)) reads 461/737 --
7-15x slower at identical shapes.  This tool interleaves the two
conventions (plus the pre-broadcast row_tabs form for phase 2) in ONE
session to separate methodology from device state.

Usage (real TPU): python tools/phase_const_ab.py [--m 20] [--d 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=20)
    ap.add_argument("--d", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--out", default="artifacts/PHASE_CONST_AB_r05.json")
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_ntt_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from bench import _measure_loop
    from ntt_tpu.kernels import sixstep as ss
    from ntt_tpu.kernels.elems import U64Ops, tmap
    from ntt_tpu.params import bench_params
    from ntt_tpu.plan import get_plan

    m, d, batch = args.m, args.d, args.batch
    p = bench_params(m=m, q_bits=62)
    plan = get_plan(p)
    q = p.q
    w, wc, _, _ = plan.dev_r2_u64
    n = p.n
    group = ss.default_group(2)
    n1_log = max(ss.default_split(n), (d - 1).bit_length())
    n1, n2 = 1 << n1_log, n >> n1_log
    rng = np.random.default_rng(0)
    print(f"phase const A/B: device={jax.devices()[0].device_kind} m={m} "
          f"D={d} n1_log={n1_log} batch={batch}", flush=True)

    a1 = U64Ops.from_host(
        rng.integers(0, q, size=(batch, n1, n2 // d), dtype=np.uint64))
    a2 = U64Ops.from_host(
        rng.integers(0, q, size=(batch, n1 // d, n2), dtype=np.uint64))
    rt = plan.dev_row_tabs(n1_log, 2, False)

    ct = plan.dev_col_tabs(n1_log, 2, False)
    # per-device row-tab slice: columns [0, n1/d) of each stage stack
    rt_slice = tuple(
        tuple(tuple(l[:, :, : n1 // d] for l in rep) for rep in stacks)
        for stacks in rt
    )

    def p1_args(x, w, wc):
        return ss.fwd_phase1(x, U64Ops, w, wc, q, n1, n2 // d, group=group)

    def p1_tabs(x, ct):
        return ss.fwd_phase1(x, U64Ops, None, None, q, n1, n2 // d,
                             group=group, col_tabs=ct)

    def p1_clos(x):
        return ss.fwd_phase1(x, U64Ops, w, wc, q, n1, n2 // d, group=group)

    def p2_core(x, w, wc, row_tabs=None):
        x = tmap(lambda l: jnp.swapaxes(l, -1, -2), x)
        x = ss.fwd_phase2(x, U64Ops, w, wc, q, n1, n2, 0, n1 // d,
                          group=group, strict=True, row_tabs=row_tabs)
        return tmap(lambda l: jnp.swapaxes(l, -1, -2), x)

    def p2_args(x, w, wc):
        return p2_core(x, w, wc)

    def p2_tabs(x, rts):
        return p2_core(x, None, None, row_tabs=rts)

    def p2_clos(x):
        return p2_core(x, w, wc)

    # row_tabs only valid full-width (col0=0, ncols=n1): measure the
    # D=1-shaped phase2 for the tabs comparison instead
    a2_full = U64Ops.from_host(
        rng.integers(0, q, size=(batch, n1, n2), dtype=np.uint64))

    def p2full_args(x, w, wc):
        x = tmap(lambda l: jnp.swapaxes(l, -1, -2), x)
        x = ss.fwd_phase2(x, U64Ops, w, wc, q, n1, n2, 0, n1,
                          group=group, strict=True)
        return tmap(lambda l: jnp.swapaxes(l, -1, -2), x)

    def p2full_tabs(x, w, wc, rt):
        x = tmap(lambda l: jnp.swapaxes(l, -1, -2), x)
        x = ss.fwd_phase2(x, U64Ops, w, wc, q, n1, n2, 0, n1,
                          group=group, strict=True, row_tabs=rt)
        return tmap(lambda l: jnp.swapaxes(l, -1, -2), x)

    def p2full_clos(x):
        x = tmap(lambda l: jnp.swapaxes(l, -1, -2), x)
        x = ss.fwd_phase2(x, U64Ops, w, wc, q, n1, n2, 0, n1,
                          group=group, strict=True)
        return tmap(lambda l: jnp.swapaxes(l, -1, -2), x)

    rows = [
        ("p1_args", p1_args, a1, (w, wc)),
        ("p1_tabs", p1_tabs, a1, (ct,)),
        ("p1_clos", p1_clos, a1, None),
        ("p2_args", p2_args, a2, (w, wc)),
        ("p2_tabs", p2_tabs, a2, (rt_slice,)),
        ("p2_clos", p2_clos, a2, None),
        ("p2full_args", p2full_args, a2_full, (w, wc)),
        ("p2full_tabs", p2full_tabs, a2_full, (w, wc, rt)),
        ("p2full_clos", p2full_clos, a2_full, None),
    ]
    results = {"m": m, "d": d, "batch": batch,
               "rows": {label: [] for label, *_ in rows}}
    for r in range(args.rounds):
        print(f"--- round {r + 1}/{args.rounds} ---", flush=True)
        for label, body, x0, consts in rows:
            sec = _measure_loop(body, x0, reps=3, k1=2, k2=6, consts=consts)
            us = sec / batch * 1e6
            results["rows"][label].append(round(us, 2))
            print(f"  {label:13s} {us:10.2f} us/t", flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
