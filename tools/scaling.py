"""Distributed six-step scaling harness (BASELINE.md distributed target).

Measures one-transform-spanning-the-mesh throughput at N = 2^20..2^24
across mesh sizes, and reports scaling efficiency relative to the
smallest mesh.  On a real TPU slice this produces the >=80%-scaling
evidence; on CPU (JAX_PLATFORMS=cpu with virtual devices) it validates
the plumbing and gives relative numbers only.

The timed body is a forward+inverse round trip: the composed program maps
the natural sharding back to itself, so it chains under fori_loop (the
framework's reliable on-device timing protocol, bench._measure_loop).

Usage:
    python tools/scaling.py [--m 20] [--q-bits 29] [--batch 1]
                            [--mesh-sizes 1,2,4,8]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=20)
    ap.add_argument("--q-bits", type=int, default=29)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--mesh-sizes", default="1,2,4,8")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        import os

        # env var alone is not enough on this image (sitecustomize pins the
        # axon TPU plugin); jax.config.update before backend init is.
        os.environ["JAX_PLATFORMS"] = args.platform
        if args.platform == "cpu":
            flags = os.environ.get("XLA_FLAGS", "")
            if "host_platform_device_count" not in flags:
                os.environ["XLA_FLAGS"] = (
                    flags + " --xla_force_host_platform_device_count="
                    + args.mesh_sizes.split(",")[-1]
                ).strip()
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import numpy as np

    from bench import _measure_loop
    from ntt_tpu.dist import sixstep as dist
    from ntt_tpu.kernels import radix2, sixstep
    from ntt_tpu.params import NttParams
    from ntt_tpu.plan import get_plan

    p = NttParams.generate(args.q_bits, args.m)
    plan = get_plan(p)
    rng = np.random.default_rng(0)
    a = rng.integers(0, p.q, size=(args.batch, p.n), dtype=np.uint64)

    sizes = [int(s) for s in args.mesh_sizes.split(",")]
    base_tps = None
    print(
        f"distributed fwd+inv round trip, q={p.q:#x} ({p.q.bit_length()}-bit) "
        f"N=2^{p.m} batch={args.batch} on {jax.devices()[0].platform}:"
    )
    for ndev in sizes:
        if len(jax.devices()) < ndev:
            print(f"  D={ndev}: skipped (only {len(jax.devices())} devices)")
            continue
        mesh = dist.default_mesh(ndev)
        n1_log = max(sixstep.default_split(p.n), (ndev - 1).bit_length())
        n1, n2 = 1 << n1_log, p.n >> n1_log

        ops, w, wc = dist._tables(plan, inverse=False)
        _, wi, wic = dist._tables(plan, inverse=True)
        word = 32 if ops.nlimb == 1 else 64
        ninv_con = plan.n_inv_con32 if word == 32 else plan.n_inv_con
        f_tmp, f_con = radix2._final_mulop(
            plan.params.n_inv, ninv_con, int(plan.w_inv[1]), plan.q, word
        )
        fwd = dist._jit_dist_fwd(
            plan.q, p.n, n1_log, ops.nlimb, ndev, "x", True, mesh
        )
        inv = dist._jit_dist_inv(
            plan.q, p.n, n1_log, ops.nlimb, ndev, "x",
            plan.params.n_inv, ninv_con, f_tmp, f_con, mesh,
        )
        ntab = ops.nlimb

        def body(rep, fwd=fwd, inv=inv, w=w, wc=wc, wi=wi, wic=wic, ntab=ntab):
            f = fwd(*rep, *w, *wc)
            f = f if isinstance(f, tuple) else (f,)
            b = inv(*f, *wi, *wic)
            return b if isinstance(b, tuple) else (b,)

        rep0 = ops.from_host(a.reshape(-1, n1, n2))
        rep0 = rep0 if isinstance(rep0, tuple) else (rep0,)
        sec = _measure_loop(body, rep0, reps=args.reps, k1=2, k2=12)
        tps = 2 * args.batch / sec  # fwd + inv = 2 transforms
        eff = ""
        if base_tps is None:
            base_tps, base_ndev = tps, ndev  # first MEASURED size is the base
        else:
            ideal = base_tps * ndev / base_ndev
            eff = f", scaling efficiency {100 * tps / ideal:.0f}%"
        print(f"  D={ndev}: {sec / (2 * args.batch) * 1e6:,.1f} us/transform, "
              f"{tps:,.0f} tps{eff}", flush=True)


if __name__ == "__main__":
    main()
