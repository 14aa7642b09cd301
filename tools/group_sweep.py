"""Measure the jnp six-step path with grouped stages (g radix-2 layers per
interleave) on the chip.

The per-stage jnp.stack is XLA's materialization boundary: group=g keeps g
stages' butterflies inside one fusion, cutting HBM passes ~g-fold in the
bandwidth-bound u64 path (the XLA-level analog of the reference's
radix4x4/HEXL layers-per-residency fusion).

Usage: python tools/group_sweep.py [--groups 1,2,3,4] [--cases u64]
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
from ntt_tpu.kernels.elems import U32Ops, U64Ops, tmap
from ntt_tpu.params import NttParams, bench_params
from ntt_tpu.plan import get_plan


def fwd_grouped(a_rep, ops, w_rep, wc_rep, q, n, n1_log, group, batch):
    n1, n2 = 1 << n1_log, n >> n1_log
    a = tmap(lambda l: l.reshape((batch, n1, n2)), a_rep)
    a = ss.fwd_phase1(a, ops, w_rep, wc_rep, q, n1, n2, group=group)
    a = tmap(lambda l: jnp.swapaxes(l, -1, -2), a)
    a = ss.fwd_phase2(a, ops, w_rep, wc_rep, q, n1, n2, 0, n1, group=group,
                      strict=True)
    a = tmap(lambda l: jnp.swapaxes(l, -1, -2), a)
    return tmap(lambda l: l.reshape((batch, n)), a)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default="u64", choices=["u32", "u64", "both"])
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--m", type=int, default=14)
    ap.add_argument("--groups", default="1,2,3,4")
    ap.add_argument("--n1-log", type=int, default=None)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--kara", action="store_true",
                    help="also measure the Karatsuba mulhi64 (u64 only)")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_ntt_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from bench import _measure_loop

    widths = {"u32": [1], "u64": [2], "both": [1, 2]}[args.cases]
    for nlimb in widths:
        if nlimb == 1:
            p = NttParams.generate(27, args.m)
            ops = U32Ops
        else:
            p = bench_params(m=args.m, q_bits=62)
            ops = U64Ops
        plan = get_plan(p)
        q = p.q
        rng = np.random.default_rng(0)
        a = rng.integers(0, q, size=(args.batch, p.n), dtype=np.uint64)
        a_rep = ops.from_host(a)
        if nlimb == 1:
            w, wc, _, _ = plan.dev_r2_u32
            w_rep, wc_rep = (w,), (wc,)
        else:
            w_rep, wc_rep = plan.dev_r2_u64[0], plan.dev_r2_u64[1]
        n1_log = args.n1_log or ss.default_split(p.n)
        label = "u32" if nlimb == 1 else "u64"
        print(f"[{label}] q={q:#x} N=2^{p.m} n1_log={n1_log} batch={args.batch}",
              flush=True)
        want = ops.to_host(
            jax.jit(lambda x: ss.fwd_sixstep(x, ops, w_rep, wc_rep, q,
                                             strict=True))(a_rep)
        )
        import ntt_tpu.modmath as mm_mod

        schoolbook = mm_mod.mulhi64
        muls = [("", schoolbook)]
        if nlimb == 2 and args.kara:
            muls.append(("+kara", mm_mod.mulhi64_kara))
        for g in [int(x) for x in args.groups.split(",")]:
            for tag, impl in muls:
                mm_mod.mulhi64 = impl
                try:
                    def body(x, g=g):
                        return fwd_grouped(x, ops, w_rep, wc_rep, q, p.n,
                                           n1_log, g, args.batch)

                    got = ops.to_host(jax.jit(body)(a_rep))
                    ok = np.array_equal(got, want)
                    sec = _measure_loop(body, a_rep, reps=args.reps, k1=2,
                                        k2=52)
                    print(f"  group={g}{tag}: {'exact' if ok else 'MISMATCH'} "
                          f"{sec / args.batch * 1e6:8.3f} us/t "
                          f"({args.batch / sec:12,.0f} tps)", flush=True)
                finally:
                    mm_mod.mulhi64 = schoolbook


if __name__ == "__main__":
    main()
