"""Ad-hoc TPU timing probe for kernel variants (chain-difference method).

Usage: python tools/tpu_probe.py [--batch 256] [--m 14] [--q-bits 62]
                                 [--variants radix2,radix4,sixstep]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--m", type=int, default=14)
    ap.add_argument("--q-bits", type=int, default=62)
    ap.add_argument("--variants", default="radix2,radix4,sixstep")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--k", type=int, default=60)
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import numpy as np

    from ntt_tpu import api, modmath as mm
    from ntt_tpu.params import bench_params
    from ntt_tpu.plan import get_plan

    p = bench_params(m=args.m, q_bits=args.q_bits)
    plan = get_plan(p)
    print(f"q={p.q:#x} ({p.q.bit_length()}b) N=2^{p.m} batch={args.batch} "
          f"dev={jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)
    a = rng.integers(0, p.q, size=(args.batch, p.n), dtype=np.uint64)

    for name in args.variants.split(","):
        name = name.strip()
        v = api.get_variant(name)
        if p.q.bit_length() > v.max_q_bits:
            print(f"  {name:12s} skipped (q too wide)")
            continue
        # build the jitted core + device args by going through the host
        # wrapper once, then time pure device chains
        if name == "radix2":
            from ntt_tpu.api import _jit_fwd_r2_u64 as jf
            w, wc, _, _ = plan.dev_r2_u64
            fn = jf(p.q, False)
            tabs = (*w, *wc)
        elif name == "radix4":
            from ntt_tpu.api import _jit_fwd_r4_u64 as jf
            w, wc, _, _ = plan.dev_r4_u64
            fn = jf(p.q, False)
            tabs = (*w, *wc)
        elif name == "sixstep":
            from ntt_tpu.api import _jit_fwd_sixstep as jf
            w, wc, _, _ = plan.dev_r2_u64
            fn = jf(p.q, False, None, 2)
            tabs = (*w, *wc)
        elif name == "mxu":
            from ntt_tpu.api import _jit_fwd_mxu
            import jax.numpy as jnp

            fn0 = _jit_fwd_mxu(p.q, p.w, p.n)
            a32 = jnp.asarray(a.astype(np.uint32))

            def chain_mxu(k):
                x = a32
                for _ in range(k):
                    x = fn0(x)
                np.asarray(x).ravel()[:1]

            t0 = time.time()
            chain_mxu(1)
            print(f"  {name:12s} compile+first {time.time()-t0:6.1f}s", flush=True)
            chain_mxu(4)
            lo, hi = [], []
            for _ in range(4):
                t0 = time.time(); chain_mxu(2); lo.append(time.time() - t0)
                t0 = time.time(); chain_mxu(2 + args.k); hi.append(time.time() - t0)
            best = (min(hi) - min(lo)) / args.k
            print(
                f"  {name:12s} {best*1e3:8.2f} ms/call  "
                f"{args.batch/best:12,.0f} tf/s  "
                f"{best/args.batch*1e6:8.2f} us/transform",
                flush=True,
            )
            continue
        else:
            print(f"  {name:12s} (no probe wiring)")
            continue
        rep = mm.from_u64(a)

        def chain(k):
            x = rep
            for _ in range(k):
                out = fn(*x, *tabs)
                x = (out[0], out[1])
            np.asarray(out[0]).ravel()[:1]

        t0 = time.time()
        chain(1)
        print(f"  {name:12s} compile+first {time.time()-t0:6.1f}s", flush=True)
        chain(4)  # settle
        lo, hi = [], []
        for _ in range(4):
            t0 = time.time(); chain(2); lo.append(time.time() - t0)
            t0 = time.time(); chain(2 + args.k); hi.append(time.time() - t0)
        best = (min(hi) - min(lo)) / args.k
        print(
            f"  {name:12s} {best*1e3:8.2f} ms/call  "
            f"{args.batch/best:12,.0f} tf/s  "
            f"{best/args.batch*1e6:8.2f} us/transform",
            flush=True,
        )


if __name__ == "__main__":
    main()
