"""Round-4 A/B: pre-broadcast row-twiddle stacks for the XLA six-step.

Round 3 localized the forward/inverse asymmetry (4.80 vs 4.43 us/t at
identical butterfly jaxprs) to fwd_phase2 lowering 17% more flops than
inv_phaseA (docs/PERF.md).  VERDICT r3 item #1 names the one untried
lever: sixstep._row_tw re-derives ``reshape(n1, m2).T`` + slice inside
every traced stage, while the Pallas path builds the equivalent stacks
host-side and shows no asymmetry.  This lab feeds fwd_phase2/inv_phaseA
the pre-broadcast per-stage stacks (plan.dev_row_tabs) and checks:

  flops -- lowered-HLO flop counts per direction, tabs vs in-program
           (any backend; cost_analysis of the compiled program);
  exact -- bit-identical outputs tabs vs in-program;
  time  -- interleaved-control on-chip A/B (>=2 rounds, direct@128
           control rows per the round-3 protocol, CLAUDE.md).

Usage:
  CPU flops+exact:  python tools/rowtab_ab.py --platform cpu --skip-time
  real TPU timing:  python tools/rowtab_ab.py
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from ntt_tpu.kernels import radix2, sixstep as ss
from ntt_tpu.kernels.elems import U32Ops, U64Ops
from ntt_tpu.params import bench_params
from ntt_tpu.plan import get_plan


def _flops(fn, *args) -> float:
    c = jax.jit(fn).lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    return float(ca.get("flops", float("nan")))


def _build(plan, nlimb: int, inverse: bool):
    q = plan.q
    n1_log = ss.default_split(plan.n)
    if nlimb == 1:
        w, wc, wi, wic = plan.dev_r2_u32
        ops = U32Ops
        w_rep, wc_rep = ((wi,), (wic,)) if inverse else ((w,), (wc,))
        ninv_con = plan.n_inv_con32
        word = 32
    else:
        w, wc, wi, wic = plan.dev_r2_u64
        ops = U64Ops
        w_rep, wc_rep = (wi, wic) if inverse else (w, wc)
        ninv_con = plan.n_inv_con
        word = 64
    tabs = plan.dev_row_tabs(n1_log, nlimb, inverse)
    if inverse:
        f_tmp, f_con = radix2._final_mulop(
            plan.params.n_inv, ninv_con, int(plan.w_inv[1]), q, word
        )

        def mk(row_tabs):
            def body(x):
                return ss.inv_sixstep(
                    x, ops, w_rep, wc_rep, plan.params.n_inv, ninv_con,
                    f_tmp, f_con, q, n1_log, row_tabs=row_tabs,
                )
            return body
    else:
        def mk(row_tabs):
            def body(x):
                return ss.fwd_sixstep(x, ops, w_rep, wc_rep, q, n1_log,
                                      strict=True, row_tabs=row_tabs)
            return body
    return ops, mk(None), mk(tabs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--skip-time", action="store_true")
    ap.add_argument("--m", type=int, default=14)
    ap.add_argument("--q-bits", type=int, default=62)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_ntt_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    p = bench_params(m=args.m, q_bits=args.q_bits)
    plan = get_plan(p)
    nlimb = 1 if plan.supports_u32_radix2 else 2
    rng = np.random.default_rng(0)
    print(f"rowtab A/B: device={jax.devices()[0].device_kind} "
          f"q={p.q.bit_length()}bit N=2^{p.m} batch={args.batch} "
          f"nlimb={nlimb}", flush=True)

    bodies = {}
    for inverse in (False, True):
        ops, plain, tabbed = _build(plan, nlimb, inverse)
        name = "inv" if inverse else "fwd"
        a = rng.integers(0, p.q, size=(args.batch, p.n), dtype=np.uint64)
        a_rep = ops.from_host(a)
        # exactness: bit-identical outputs
        got_p = jax.jit(plain)(a_rep)
        got_t = jax.jit(tabbed)(a_rep)
        same = all(bool((np.asarray(x) == np.asarray(y)).all())
                   for x, y in zip(got_p, got_t))
        print(f"  {name}: tabs bit-identical to in-program: "
              f"{'OK' if same else 'FAIL'}", flush=True)
        if not same:
            sys.exit(1)
        fp = _flops(plain, a_rep)
        ft = _flops(tabbed, a_rep)
        print(f"  {name}: lowered flops in-program {fp:.4g} "
              f"-> tabs {ft:.4g} ({(ft - fp) / fp * 100:+.1f}%)", flush=True)
        bodies[name] = (plain, tabbed, a_rep)

    if args.skip_time:
        return
    from bench import _measure_loop

    # interleaved-control protocol: each round measures control (plain fwd)
    # first, then the candidates; >=2 rounds before believing anything.
    for r in range(args.rounds):
        print(f"  --- round {r + 1}/{args.rounds} ---", flush=True)
        for name in ("fwd", "inv"):
            plain, tabbed, a_rep = bodies[name]
            for label, body in (("plain", plain), ("tabs", tabbed)):
                sec = _measure_loop(body, a_rep, reps=5, k1=2, k2=18)
                print(f"  {name}-{label:6s} {sec / args.batch * 1e6:8.3f} us/t "
                      f"({args.batch / sec:12,.0f} tps)", flush=True)


if __name__ == "__main__":
    main()
