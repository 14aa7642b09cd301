"""Analytic distributed-scaling model for the six-step NTT (VERDICT r3 #2).

This box has ONE real TPU chip, so multi-chip efficiency cannot be
measured directly.  What CAN be grounded in measurement is the compute
side: the distributed transform's per-device programs are exactly
fwd_phase1 at local shape (B, N1, N2/D) and fwd_phase2 (+ the two
relayout transposes) at (B, N2, N1/D) (dist/sixstep.py:245-253) -- both
run fine on one chip at the sharded shapes.  This tool measures those,
then adds an explicit, stated-assumption communication term for the one
collective (the all_to_all transpose), and emits predicted efficiency
for D in {4, 8, 16} at N = 2^20..2^24 (BASELINE configs[4]).

Communication model (1-D bidirectional ICI ring, the deployment shape
named in dist/sixstep.py's docstring):

  The all_to_all moves the full (B, N1, N2) array X = B*N*8 bytes (u64
  rep: 2 x uint32 limbs).  Block (i -> j) is X/D^2 bytes and travels
  min(|i-j|, D-|i-j|) hops; summing over pairs gives total link traffic
  X*D/4, spread over 2D directed links of per-direction bandwidth W_l:

      T_a2a ~= X / (8 * W_l)          (D >= 4; independent of D)

  (the standard ring result that all-to-all costs ~1/4 of an all-gather
  of the same array).  Default W_l = 90 GB/s per direction per link --
  the published TPU v5p figure of 4,800 Gbit/s/chip total ICI across 6
  links (3-D torus) gives 100 GB/s/link/direction; 90 leaves 10%
  protocol margin.  Override with --ici-gbs.  This term is an
  ASSUMPTION, not a measurement -- the compute terms are measurements.

The model is deliberately conservative in one more way: it charges the
full T_a2a serially (no comm/compute overlap), matching the round-3
finding that overlap could not be demonstrated on any reachable backend
(docs/PERF.md "Chunked comm/compute overlap").

Usage:
  real-chip measurement + model:  python tools/scaling_model.py --m 20,22
  model-only from a saved JSON:   python tools/scaling_model.py --from-json artifacts/SCALING_MODEL_r04.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def predict(rows: dict, wl_gbs: float) -> list[dict]:
    """rows: {"m": .., "batch": .., "t1_us": <D=1 whole-transform us>,
    "phases": {D: {"p1_us": .., "p2_us": ..}}} -> per-D efficiency table.
    Pure arithmetic (unit-tested in tests/test_dist.py)."""
    out = []
    n = 1 << rows["m"]
    # per-TRANSFORM bytes moved by the one all_to_all (u64 rep: 2 x
    # uint32 = 8 B/coeff); every other term in the table is us per
    # transform, so the comm term must be too (the batch amortizes
    # dispatch, not bytes -- each transform's coefficients all cross)
    x_bytes = n * 8
    t_a2a_us = x_bytes / (8.0 * wl_gbs * 1e9) * 1e6
    t1 = rows["t1_us"]
    for d_str, ph in sorted(rows["phases"].items(), key=lambda kv: int(kv[0])):
        d = int(d_str)
        if d == 1:
            continue
        flat_sum = ph["p1_us"] + ph["p2_us"]
        rec_sum = (ph["p1_rec_us"] + ph["p2_rec_us"]
                   if "p1_rec_us" in ph else None)
        # per-device structure: the dist layer ships BOTH the flat-phase
        # and the recursive-structured transform (dist_rec_*); the model
        # charges whichever measured faster at this (m, D)
        if rec_sum is not None and rec_sum < flat_sum:
            structure, p1, p2 = "rec", ph["p1_rec_us"], ph["p2_rec_us"]
        else:
            structure, p1, p2 = "flat", ph["p1_us"], ph["p2_us"]
        t_dev = p1 + p2 + t_a2a_us
        eff = t1 / (d * t_dev)
        out.append({
            "D": d,
            "structure": structure,
            "p1_us": p1,
            "p2_us": p2,
            "a2a_us": round(t_a2a_us, 3),
            "t_dev_us": round(t_dev, 3),
            "speedup": round(t1 / t_dev, 2),
            "efficiency_pct": round(eff * 100, 1),
        })
    return out


def measure(m: int, batch: int, devices: list[int],
            n1_log_override: int | None = None) -> dict:
    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_ntt_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from bench import _measure_loop
    from ntt_tpu.kernels import sixstep as ss
    from ntt_tpu.kernels.elems import U64Ops, tmap
    from ntt_tpu.params import bench_params
    from ntt_tpu.plan import get_plan
    import jax.numpy as jnp

    p = bench_params(m=m, q_bits=62)
    plan = get_plan(p)
    q = p.q
    w, wc = plan.dev_r2_u64[0], plan.dev_r2_u64[1]
    n = p.n
    rng = np.random.default_rng(0)
    group = ss.default_group(2)

    rows = {"m": m, "batch": batch, "q_bits": 62, "phases": {}}

    # D=1 whole-transform reference (the same program the size envelope
    # uses).  The O(N) twiddle tables ride as jit arguments (consts=):
    # inlined-constant modules exceed the remote-compile size cap at
    # N=2^24 (HTTP 413).
    n1_log_1 = (n1_log_override if n1_log_override is not None
                else ss.default_split(n))
    a = U64Ops.from_host(rng.integers(0, q, size=(batch, n), dtype=np.uint64))
    tabs1 = (plan.dev_row_tabs(n1_log_1, 2, False),
             plan.dev_col_tabs(n1_log_1, 2, False))
    sec = _measure_loop(
        lambda x, w, wc, tabs: ss.fwd_sixstep(
            x, U64Ops, w, wc, q, n1_log=n1_log_1, strict=True,
            row_tabs=tabs[0], col_tabs=tabs[1]),
        a, reps=5, k1=2, k2=10, consts=(w, wc, tabs1))
    rows["t1_flat_us"] = round(sec / batch * 1e6, 3)
    print(f"  m={m} D=1 whole fwd_sixstep+tabs (n1_log={n1_log_1}): "
          f"{rows['t1_flat_us']} us/t", flush=True)

    # round 5: at the sizes where auto dispatches the two-level recursive
    # six-step (REC_LAB_*_r05), the honest single-chip reference for the
    # efficiency ratio is the rec program -- using the slower flat t1
    # would inflate every efficiency cell.  t1 = min(flat, rec).
    from ntt_tpu import api

    l1 = ss.rec_split(m)
    pl1, pl2 = api._rec_level_plans(plan, l1)
    w1, w1c = api._rec_word_tabs(pl1, False, False)
    w2, w2c = api._rec_word_tabs(pl2, False, False)
    twr = api._rec_twist_reps(plan, l1, False, U64Ops)
    sec_rec = _measure_loop(
        lambda x, w1, w1c, w2, w2c, twr: ss.fwd_rec(
            x, U64Ops, w1, w1c, w2, w2c, twr, q, l1, strict=True),
        a, reps=5, k1=2, k2=10, consts=(w1, w1c, w2, w2c, twr))
    rows["t1_rec_us"] = round(sec_rec / batch * 1e6, 3)
    rows["t1_us"] = min(rows["t1_flat_us"], rows["t1_rec_us"])
    print(f"  m={m} D=1 whole fwd_rec (l1={l1}): {rows['t1_rec_us']} us/t "
          f"-> t1 = {rows['t1_us']}", flush=True)

    for d in devices:
        # the n1_log the dist entry would pick for this (n, D)
        n1_log = max(n1_log_1, (d - 1).bit_length())
        n1, n2 = 1 << n1_log, n >> n1_log
        assert n1 % d == 0 and n2 % d == 0, (n1, n2, d)

        a1 = U64Ops.from_host(
            rng.integers(0, q, size=(batch, n1, n2 // d), dtype=np.uint64))
        # per-device stage tabs: exactly what _dist_tabs hands shard_map
        # (row stacks column-sliced to this device; col stacks replicated)
        rt, ct = (plan.dev_row_tabs(n1_log, 2, False),
                  plan.dev_col_tabs(n1_log, 2, False))
        rt_dev = tuple(
            tuple(tuple(l[:, :, : n1 // d] for l in rep) for rep in stacks)
            for stacks in rt
        )

        def p1_body(x, w, wc, ct, n1=n1, n2=n2, dd=d):
            return ss.fwd_phase1(x, U64Ops, w, wc, q, n1, n2 // dd,
                                 group=group, col_tabs=ct)

        sec1 = _measure_loop(p1_body, a1, reps=5, k1=2, k2=10,
                             consts=(w, wc, ct))

        a2 = U64Ops.from_host(
            rng.integers(0, q, size=(batch, n1 // d, n2), dtype=np.uint64))

        def p2_body(x, w, wc, rt, n1=n1, n2=n2, dd=d):
            # post-collective relayout + row stages + output relayout,
            # exactly dist/sixstep.py with col0=0 (the twiddle slice
            # offset changes values, not cost)
            x = tmap(lambda l: jnp.swapaxes(l, -1, -2), x)
            x = ss.fwd_phase2(x, U64Ops, w, wc, q, n1, n2, 0, n1 // dd,
                              group=group, strict=True, row_tabs=rt)
            return tmap(lambda l: jnp.swapaxes(l, -1, -2), x)

        sec2 = _measure_loop(p2_body, a2, reps=5, k1=2, k2=10,
                             consts=(w, wc, rt_dev))

        # recursive-structured per-device phases (dist_rec_*): level-1 on
        # the lane shard; twist + level-2 on the row shard
        from ntt_tpu.dist import sixstep as dsix
        from ntt_tpu.kernels.elems import U64Ops as _U64

        l1r = max(ss.rec_split(m), (d - 1).bit_length())
        n1r, n2r = 1 << l1r, n >> l1r
        w1, w1c, w2, w2c, twr, tabs, _ = dsix._rec_dist_args(
            plan, l1r, False, _U64)
        tw_loc = tuple(
            tuple(l[: n1r // d] for l in rep) for rep in twr
        )
        a1r = U64Ops.from_host(rng.integers(
            0, q, size=(batch, n1r, n2r // d), dtype=np.uint64))
        a2r = U64Ops.from_host(rng.integers(
            0, q, size=(batch, n1r // d, n2r), dtype=np.uint64))

        def p1r_body(x, w1, w1c, t1):
            x = tmap(lambda l: jnp.swapaxes(l, -1, -2), x)
            x = ss.fwd_sixstep(x, _U64, w1, w1c, q, strict=False,
                               row_tabs=t1[0], col_tabs=t1[1])
            return tmap(lambda l: jnp.swapaxes(l, -1, -2), x)

        def p2r_body(x, w2, w2c, twl, t2):
            x = dsix._twist_local(x, _U64, twl, q, n2r)
            return ss.fwd_sixstep(x, _U64, w2, w2c, q, strict=True,
                                  row_tabs=t2[0], col_tabs=t2[1])

        sec1r = _measure_loop(p1r_body, a1r, reps=5, k1=2, k2=10,
                              consts=(w1, w1c, tabs[0]))
        sec2r = _measure_loop(p2r_body, a2r, reps=5, k1=2, k2=10,
                              consts=(w2, w2c, tw_loc, tabs[1]))
        rows["phases"][str(d)] = {
            "n1_log": n1_log,
            "l1_rec": l1r,
            "p1_us": round(sec1 / batch * 1e6, 3),
            "p2_us": round(sec2 / batch * 1e6, 3),
            "p1_rec_us": round(sec1r / batch * 1e6, 3),
            "p2_rec_us": round(sec2r / batch * 1e6, 3),
        }
        r = rows["phases"][str(d)]
        print(f"  m={m} D={d} (n1_log={n1_log}): p1 {r['p1_us']} "
              f"p2 {r['p2_us']} | rec(l1={l1r}) p1 {r['p1_rec_us']} "
              f"p2 {r['p2_rec_us']} us/t", flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", default="20,22")
    ap.add_argument("--devices", default="1,4,8,16")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--ici-gbs", type=float, default=90.0,
                    help="per-link per-direction ICI GB/s (assumption)")
    ap.add_argument("--n1-log", type=int, default=None,
                    help="override the split (default: sixstep.default_split)")
    ap.add_argument("--from-json", default=None)
    ap.add_argument("--out", default="artifacts/SCALING_MODEL_r04.json")
    args = ap.parse_args()

    if args.from_json:
        with open(args.from_json) as f:
            all_rows = json.load(f)["measured"]
    else:
        import jax
        print(f"scaling model: device={jax.devices()[0].device_kind} "
              f"batch={args.batch}", flush=True)
        all_rows = [
            measure(int(m), args.batch,
                    [d for d in map(int, args.devices.split(",")) if d > 1],
                    n1_log_override=args.n1_log)
            for m in args.m.split(",")
        ]

    result = {"ici_gbs_per_link_dir_assumed": args.ici_gbs,
              "measured": all_rows, "predicted": {}}
    for rows in all_rows:
        table = predict(rows, args.ici_gbs)
        result["predicted"][f"m{rows['m']}"] = table
        print(f"\nN=2^{rows['m']} batch={rows['batch']} "
              f"(D=1 measured {rows['t1_us']} us/t, "
              f"W_l={args.ici_gbs} GB/s assumed):")
        for r in table:
            print(f"  D={r['D']:2d}: p1 {r['p1_us']:8.2f} + p2 {r['p2_us']:8.2f} "
                  f"+ a2a {r['a2a_us']:7.2f} us -> speedup {r['speedup']:5.2f}x, "
                  f"efficiency {r['efficiency_pct']:5.1f}%")
    if not args.from_json:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
