"""Variant sweep backing api._auto_variant's decision table.

Measures the strict forward of the candidate families (flat radix-2,
six-step, radix-4 where legal) across sizes at both modulus widths, with
the bench loop-differencing protocol.  The fastest family per (width, N)
becomes _auto_variant's table; tests/test_auto_variant.py pins the table
against the recorded sweep artifact.

Round-4 extensions (VERDICT r3 #7):
  --inverse      also sweeps the inverse families (radix2/sixstep/
                 radix4x4, radix4 where legal) -> "q*_m*_inv" rows;
  --batch-cliff  sweeps the u64 serving-batch column at N=2^14
                 (direct vs unroll-tiled vs lax.map-tiled at 128-row
                 tiles) -> "q62_m14_b{B}" rows backing the
                 DeviceNtt(batch_tile='auto') policy.

Usage (real TPU):  python tools/auto_sweep.py --inverse --batch-cliff \
                       --out artifacts/AUTO_SWEEP_r04.json
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--ms", default="8,9,10,11,12,14")
    ap.add_argument("--q-bits", default="27,62")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--target-s", type=float, default=1.5)
    ap.add_argument("--inverse", action="store_true")
    ap.add_argument("--batch-cliff", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_ntt_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np
    import jax.numpy as jnp

    from bench import _measure_loop
    from ntt_tpu import modmath as mm
    from ntt_tpu.kernels import radix2, radix4, sixstep as ss
    from ntt_tpu.kernels.elems import U32Ops, U64Ops
    from ntt_tpu.params import bench_params
    from ntt_tpu.plan import get_plan

    results = {}
    for qb in (int(x) for x in args.q_bits.split(",")):
        for m in (int(x) for x in args.ms.split(",")):
            p = bench_params(m=m, q_bits=qb)
            plan = get_plan(p)
            q = plan.q
            batch = args.batch or (256 if qb < 30 else 128)
            rng = np.random.default_rng(0)
            a = rng.integers(0, q, size=(batch, p.n), dtype=np.uint64)
            bodies = {}
            if plan.supports_u32_radix2:
                w, wc, _, _ = plan.dev_r2_u32
                x0 = jnp.asarray(a.astype(np.uint32))
                bodies["radix2"] = lambda x: radix2.fwd_u32(x, w, wc, q)
                bodies["sixstep"] = lambda x: ss.fwd_sixstep(
                    (x,), U32Ops, (w,), (wc,), q, strict=True)[0]
                if plan.supports_u32_radix4:
                    w4, w4c, _, _ = plan.dev_r4_u32
                    bodies["radix4"] = lambda x: radix4.fwd_u32(x, w4, w4c, q)
            else:
                wp, wcp, _, _ = plan.dev_r2_u64
                x0 = mm.from_u64(a)
                bodies["radix2"] = lambda x: radix2.fwd_u64(x, wp, wcp, q)
                bodies["sixstep"] = lambda x: ss.fwd_sixstep(
                    x, U64Ops, wp, wcp, q, strict=True)
                if q.bit_length() <= 61:
                    w4p, w4cp, _, _ = plan.dev_r4_u64
                    bodies["radix4"] = lambda x: radix4.fwd_u64(
                        x, (w4p[0], w4p[1]), (w4cp[0], w4cp[1]), q)
            row = {}
            for name, body in bodies.items():
                sec = _measure_loop(body, x0, reps=args.reps, k1=2, k2=22,
                                    target_s=args.target_s)
                row[name] = round(sec / batch * 1e6, 4)
                print(f"q{qb} m={m:2d} {name:8s} {row[name]:10.3f} us/t",
                      file=sys.stderr, flush=True)
            row["winner"] = min((v, k) for k, v in row.items())[1]
            results[f"q{qb}_m{m}"] = {"batch": batch, **row}

            if args.inverse:
                ninv = p.n_inv
                inv_bodies = {}
                if plan.supports_u32_radix2:
                    _, _, wi, wic = plan.dev_r2_u32
                    nc32 = plan.n_inv_con32
                    w1s = int(plan.w_inv[1])
                    f32 = radix2._final_mulop(ninv, nc32, w1s, q, 32)
                    inv_bodies["radix2"] = lambda x: radix2.inv_u32(
                        x, wi, wic, ninv, nc32, w1s, q)
                    inv_bodies["sixstep"] = lambda x: ss.inv_sixstep(
                        (x,), U32Ops, (wi,), (wic,), ninv, nc32, f32[0],
                        f32[1], q)[0]
                    inv_bodies["radix4x4"] = lambda x: ss.inv_sixstep(
                        (x,), U32Ops, (wi,), (wic,), ninv, nc32, f32[0],
                        f32[1], q, group=4)[0]
                    if plan.supports_u32_radix4:
                        _, _, w4i, w4ic = plan.dev_r4_u32
                        inv_bodies["radix4"] = lambda x: radix4.inv_u32(
                            x, w4i, w4ic, ninv, nc32, q)
                else:
                    _, _, wip, wicp = plan.dev_r2_u64
                    nc64 = plan.n_inv_con
                    w1s = int(plan.w_inv[1])
                    f64 = radix2._final_mulop(ninv, nc64, w1s, q, 64)
                    inv_bodies["radix2"] = lambda x: radix2.inv_u64(
                        x, wip, wicp, ninv, nc64, w1s, q)
                    inv_bodies["sixstep"] = lambda x: ss.inv_sixstep(
                        x, U64Ops, wip, wicp, ninv, nc64, f64[0], f64[1], q)
                    inv_bodies["radix4x4"] = lambda x: ss.inv_sixstep(
                        x, U64Ops, wip, wicp, ninv, nc64, f64[0], f64[1], q,
                        group=4)
                    if q.bit_length() <= 61:
                        _, _, w4ip, w4icp = plan.dev_r4_u64
                        inv_bodies["radix4"] = lambda x: radix4.inv_u64(
                            x, (w4ip[0], w4ip[1]), (w4icp[0], w4icp[1]),
                            ninv, nc64, q)
                irow = {}
                for name, body in inv_bodies.items():
                    sec = _measure_loop(body, x0, reps=args.reps, k1=2,
                                        k2=22, target_s=args.target_s)
                    irow[name] = round(sec / batch * 1e6, 4)
                    print(f"q{qb} m={m:2d} inv-{name:8s} {irow[name]:10.3f} "
                          "us/t", file=sys.stderr, flush=True)
                irow["winner"] = min((v, k) for k, v in irow.items())[1]
                results[f"q{qb}_m{m}_inv"] = {"batch": batch, **irow}

    if args.batch_cliff:
        # u64 serving-batch column at N=2^14: direct vs 128-row tiles
        # (unrolled chain / lax.map) -- backs DeviceNtt(batch_tile="auto")
        p = bench_params(m=14, q_bits=62)
        plan = get_plan(p)
        q = plan.q
        wp, wcp, _, _ = plan.dev_r2_u64
        rng = np.random.default_rng(0)

        def one(x):
            return ss.fwd_sixstep(x, U64Ops, wp, wcp, q, strict=True)

        for B in (128, 512, 1024, 2048):
            a = rng.integers(0, q, size=(B, p.n), dtype=np.uint64)
            x0 = mm.from_u64(a)
            nt = B // 128
            cand = {"direct": one}
            if nt > 1:
                def unroll_body(x, nt=nt):
                    outs = [one(tuple(l[i * 128:(i + 1) * 128] for l in x))
                            for i in range(nt)]
                    return tuple(jnp.concatenate(ls, axis=0)
                                 for ls in zip(*outs))

                def map_body(x, nt=nt, B=B):
                    shaped = tuple(l.reshape((nt, 128) + l.shape[1:])
                                   for l in x)
                    out = jax.lax.map(one, shaped)
                    return tuple(l.reshape((B,) + l.shape[2:]) for l in out)

                cand["tiled-unroll"] = unroll_body
                cand["tiled-map"] = map_body
            row = {}
            for name, body in cand.items():
                sec = _measure_loop(body, x0, reps=args.reps, k1=2, k2=14,
                                    target_s=args.target_s)
                row[name] = round(sec / B * 1e6, 4)
                print(f"q62 m=14 b{B:4d} {name:12s} {row[name]:10.3f} us/t",
                      file=sys.stderr, flush=True)
            row["winner"] = min((v, k) for k, v in row.items())[1]
            results[f"q62_m14_b{B}"] = {"batch": B, **row}

    out = json.dumps(results, indent=1)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
