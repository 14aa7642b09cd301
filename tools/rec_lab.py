"""Huge-N lab (VERDICT r4 #1c/#2): flat capped six-step vs the two-level
recursive six-step at N=2^22..2^24, interleaved with the m=14 direct@128
control (the session-drift anchor; CLAUDE.md measurement protocol).

Every table is passed to _measure_loop via consts (jit arguments -- the
round-4 fix that unblocked m=24 over the axon tunnel's remote-compile
request-size limit).  The flat rows refresh the round-2 envelope numbers
under the hardened protocol; the rec rows answer whether recursion
escapes the n1<=2^8 workaround's 2.7x per-point cliff
(kernels/sixstep.py:54-56).

Usage (real TPU): python tools/rec_lab.py [--rounds 2] [--ms 22,24]
                  [--widths u32,u64]
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
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--ms", default="22,24")
    ap.add_argument("--widths", default="u32")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--inv", action="store_true",
                    help="also measure the inverse rows")
    ap.add_argument("--batch", type=int, default=1,
                    help="rows' batch (flat amortizes dispatch with batch; "
                    "the dispatch decision needs the published envelope "
                    "batches, not just b=1)")
    ap.add_argument("--out", default="artifacts/REC_LAB_r05.json")
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_ntt_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import _measure_loop
    from ntt_tpu import api
    from ntt_tpu.kernels import sixstep as ss
    from ntt_tpu.kernels.elems import U32Ops, U64Ops
    from ntt_tpu.params import bench_params
    from ntt_tpu.plan import get_plan

    print(f"rec lab: device={jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)

    # control: the rock-stable N=2^14 u64 direct@128 program
    p14 = bench_params(m=14, q_bits=62)
    plan14 = get_plan(p14)
    w14, wc14, _, _ = plan14.dev_r2_u64
    a14 = U64Ops.from_host(
        rng.integers(0, p14.q, size=(128, p14.n), dtype=np.uint64))

    def control(x, w, wc):
        return ss.fwd_sixstep(x, U64Ops, w, wc, p14.q, strict=True)

    rows = []  # (label, body, x0, consts, n)
    for m in (int(x) for x in args.ms.split(",")):
        for width in args.widths.split(","):
            # u32: 29-bit q (the largest width with 2^(m+1) | q-1 primes
            # at huge m that still admits the single-limb path)
            qb = 29 if width == "u32" else 62
            p = bench_params(m=m, q_bits=qb)
            plan = get_plan(p)
            u32 = plan.supports_u32_radix2
            assert u32 == (width == "u32")
            ops = U32Ops if u32 else U64Ops
            q = p.q
            x0 = ops.from_host(
                rng.integers(0, q, size=(args.batch, p.n), dtype=np.uint64))
            if u32:
                w, wc, _, _ = plan.dev_r2_u32
                w, wc = (w,), (wc,)
            else:
                w, wc, _, _ = plan.dev_r2_u64

            def flat(x, w, wc, ops=ops, q=q):
                return ss.fwd_sixstep(x, ops, w, wc, q, strict=True)

            rows.append((f"m{m}_{width}_flat", flat, x0, (w, wc), p.n))

            # production config since r5: pre-broadcast stage tabs
            # (PHASE_CONST_AB_r05 -- the args-vs-closure fix)
            nl = ss.default_split(p.n, nlimb=ops.nlimb)
            tabs = (plan.dev_row_tabs(nl, ops.nlimb, False),
                    plan.dev_col_tabs(nl, ops.nlimb, False))

            def flat_tabs(x, w, wc, tabs, ops=ops, q=q, nl=nl):
                return ss.fwd_sixstep(x, ops, w, wc, q, n1_log=nl,
                                      strict=True, row_tabs=tabs[0],
                                      col_tabs=tabs[1])

            rows.append((f"m{m}_{width}_flattabs", flat_tabs, x0,
                         (w, wc, tabs), p.n))

            if m >= 23:
                # the n1<=2^8 cap was calibrated for the args-tables
                # regime; probe the balanced split under tabs
                nlb = m // 2
                tabs_b = (plan.dev_row_tabs(nlb, ops.nlimb, False),
                          plan.dev_col_tabs(nlb, ops.nlimb, False))

                def flat_tabs_bal(x, w, wc, tabs, ops=ops, q=q, nlb=nlb):
                    return ss.fwd_sixstep(x, ops, w, wc, q, n1_log=nlb,
                                          strict=True, row_tabs=tabs[0],
                                          col_tabs=tabs[1])

                rows.append((f"m{m}_{width}_flattabs_bal", flat_tabs_bal,
                             x0, (w, wc, tabs_b), p.n))

            l1 = ss.rec_split(m)
            pl1, pl2 = api._rec_level_plans(plan, l1)
            w1, w1c = api._rec_word_tabs(pl1, u32, False)
            w2, w2c = api._rec_word_tabs(pl2, u32, False)
            tw = api._rec_twist_reps(plan, l1, False, ops)

            def rec(x, w1, w1c, w2, w2c, tw, ops=ops, q=q, l1=l1):
                return ss.fwd_rec(x, ops, w1, w1c, w2, w2c, tw, q, l1,
                                  strict=True)

            rows.append((f"m{m}_{width}_rec", rec, x0,
                         (w1, w1c, w2, w2c, tw), p.n))

            if args.inv:
                from ntt_tpu.kernels import radix2

                word = 32 if u32 else 64
                ninv_con = plan.n_inv_con32 if u32 else plan.n_inv_con
                f_tmp, f_con = radix2._final_mulop(
                    p.n_inv, ninv_con, int(plan.w_inv[1]), q, word)
                if u32:
                    _, _, wi, wic = plan.dev_r2_u32
                    wi, wic = (wi,), (wic,)
                else:
                    _, _, wi, wic = plan.dev_r2_u64

                def flat_inv(x, wi, wic, ops=ops, q=q, ni=p.n_inv,
                             nc=ninv_con, ft=f_tmp, fc=f_con):
                    return ss.inv_sixstep(x, ops, wi, wic, ni, nc, ft, fc, q)

                rows.append((f"m{m}_{width}_flat_inv", flat_inv, x0,
                             (wi, wic), p.n))

                itabs = (plan.dev_row_tabs(nl, ops.nlimb, True),
                         plan.dev_col_tabs(nl, ops.nlimb, True))

                def flat_inv_tabs(x, wi, wic, itabs, ops=ops, q=q,
                                  ni=p.n_inv, nc=ninv_con, ft=f_tmp,
                                  fc=f_con, nl=nl):
                    return ss.inv_sixstep(x, ops, wi, wic, ni, nc, ft, fc,
                                          q, n1_log=nl, row_tabs=itabs[0],
                                          col_tabs=itabs[1])

                rows.append((f"m{m}_{width}_flatitabs", flat_inv_tabs, x0,
                             (wi, wic, itabs), p.n))

                wi1, wi1c = api._rec_word_tabs(pl1, u32, True)
                wi2, wi2c = api._rec_word_tabs(pl2, u32, True)
                twi = api._rec_twist_reps(plan, l1, True, ops)
                ninv1 = api._rec_ninv(pl1, word)
                ninv2 = api._rec_ninv(pl2, word)

                def rec_inv(x, wi1, wi1c, wi2, wi2c, twi, ops=ops, q=q,
                            l1=l1, n1=ninv1, n2=ninv2):
                    return ss.inv_rec(x, ops, wi1, wi1c, wi2, wi2c, twi,
                                      n1, n2, q, l1)

                rows.append((f"m{m}_{width}_rec_inv", rec_inv, x0,
                             (wi1, wi1c, wi2, wi2c, twi), p.n))

    results = {"control": [], "rows": {label: [] for label, *_ in rows}}
    for r in range(args.rounds):
        print(f"--- round {r + 1}/{args.rounds} ---", flush=True)
        sec = _measure_loop(control, a14, reps=5, k1=2, k2=18,
                            consts=(w14, wc14))
        ct = sec / 128 * 1e6
        results["control"].append(round(ct, 3))
        print(f"  control m14 direct@128 {ct:9.3f} us/t", flush=True)
        for label, body, x0, consts, n in rows:
            sec = _measure_loop(body, x0, reps=args.reps, k1=2, k2=4,
                                consts=consts)
            ut = sec / args.batch * 1e6
            results["rows"][label].append(round(ut, 1))
            print(f"  {label:16s} {ut:12.1f} us/t  "
                  f"({ut / n * 1e3:6.3f} ns/point)", flush=True)

    print("\nsummary (min..max us/t):")
    summary = {}
    for k, vals in results["rows"].items():
        lo, hi = min(vals), max(vals)
        summary[k] = {"min": lo, "max": hi,
                      "band_pct": round((hi - lo) / lo * 100, 1)}
        print(f"  {k:16s} {lo:12.1f}..{hi:12.1f}", flush=True)
    results["summary"] = summary
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
