"""Benchmark harness: one JSON line for the driver, tables for humans.

Protocol mirrors the upstream methodology (README.md:61-67,
tests/measurements.h:38-75): warmups, repeated timed batches, minimum of
per-rep means -- adapted to accelerators with jax.block_until_ready.

Headline metric (BASELINE.md): forward NTT transforms/sec at N=2^14 with a
62-bit modulus, batched through the fused six-step kernel on one chip.
``vs_baseline`` compares against the native single-core host CPU baseline
(csrc Shoup-lazy radix-2, same measurement protocol) -- the closest stand-in
for the reference's own CPU performance on this machine.

Usage:
    python bench.py                  # TPU (or default backend) headline run
    python bench.py --platform cpu --batch 8 --reps 3   # quick local check
    python bench.py --suite         # per-variant table (stderr) + JSON line
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _measure_loop(body, x0, reps: int, k1: int, k2: int) -> float:
    """Per-iteration device time via on-device loop differencing:
    jit(fori_loop(k, body)) timed at k=k1 and k=k2 (same executable,
    dynamic trip count); returns (T(k2)-T(k1))/(k2-k1) using min-of-reps.

    This is the only reliable protocol on the axon TPU tunnel, where RPC
    latency is ~250ms with high variance and block_until_ready does not
    actually block: all iteration happens on device in ONE dispatch, and a
    tiny output fetch forces completion.  The accelerator analog of the
    upstream min-of-means protocol (tests/measurements.h:38-75)."""
    import jax
    import numpy as np
    from jax import lax

    @jax.jit
    def run(x, k):
        return lax.fori_loop(0, k, lambda i, v: body(v), x)

    def timed(k):
        t0 = time.perf_counter()
        out = run(x0, k)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        return time.perf_counter() - t0

    timed(k1)  # compile + warm
    timed(k2)
    lo = min(timed(k1) for _ in range(reps))
    hi = min(timed(k2) for _ in range(reps))
    return (hi - lo) / (k2 - k1)


def headline(batch: int, reps: int, inner: int, m: int = 14, q_bits: int = 62):
    import numpy as np

    from ntt_tpu import modmath as mm
    from ntt_tpu.params import bench_params
    from ntt_tpu.plan import get_plan

    p = bench_params(m=m, q_bits=q_bits)
    plan = get_plan(p)
    rng = np.random.default_rng(0)
    a = rng.integers(0, p.q, size=(batch, p.n), dtype=np.uint64)
    a_rep = mm.from_u64(a)
    w, wc, _, _ = plan.dev_r2_u64
    from ntt_tpu.kernels import sixstep as ss
    from ntt_tpu.kernels.elems import U64Ops as Ops

    def body(x_rep):
        # strict output is a valid next input
        return ss.fwd_sixstep(x_rep, Ops, w, wc, p.q, strict=True)

    sec = _measure_loop(body, a_rep, reps=reps, k1=2, k2=2 + inner)
    tps = batch / sec
    butterflies = (p.n // 2) * m
    ns_per_butterfly = sec / batch / butterflies * 1e9
    return p, tps, ns_per_butterfly


def host_baseline_tps(p, quick: bool) -> float | None:
    """Native single-core CPU baseline (transforms/sec) at the same (q, m)."""
    try:
        from ntt_tpu import native

        if not native.available():
            return None
        ns = native.bench_fwd_lazy64_ns(
            p.m, p.q, p.w, inner=20 if quick else 100, reps=3 if quick else 10
        )
        return 1e9 / ns
    except Exception:
        return None


def suite(args) -> None:
    """Per-variant latency table (stderr)."""
    import numpy as np

    from ntt_tpu import api
    from ntt_tpu.params import FIXTURES
    from ntt_tpu.plan import get_plan

    p = FIXTURES[6]  # q=0x10001, N=2^14
    get_plan(p)
    rng = np.random.default_rng(0)
    a = rng.integers(0, p.q, size=(args.batch, p.n), dtype=np.uint64)
    print(f"variant timings at q={p.q:#x}, N=2^{p.m}, batch={args.batch}:",
          file=sys.stderr)
    for name, v in sorted(api.variants().items()):
        if p.q.bit_length() > v.max_q_bits:
            continue
        t0 = time.perf_counter()
        api.fwd_ntt(a, p, variant=name)  # compile + h2d
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.inner):
            api.fwd_ntt(a, p, variant=name)
        per = (time.perf_counter() - t0) / args.inner
        print(
            f"  {name:14s} {per/args.batch*1e6:10.1f} us/transform "
            f"(incl. host<->dev; compile {compile_s:.1f}s)",
            file=sys.stderr,
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, help="force jax platform (e.g. cpu)")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--inner", type=int, default=50)
    ap.add_argument("--m", type=int, default=14)
    ap.add_argument("--q-bits", type=int, default=62)
    ap.add_argument("--suite", action="store_true")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    if args.suite:
        suite(args)

    p, tps, ns_bf = headline(args.batch, args.reps, args.inner, args.m, args.q_bits)
    base = host_baseline_tps(p, quick=args.platform == "cpu")
    vs = tps / base if base else 1.0

    import jax

    print(
        f"device={jax.devices()[0].device_kind} q={p.q:#x} N=2^{p.m} "
        f"batch={args.batch}: {tps:,.0f} transforms/s, "
        f"{ns_bf:.3f} ns/butterfly; host-CPU baseline "
        f"{base:,.0f}/s -> {vs:.1f}x" if base else "",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"fwd_ntt_transforms_per_sec_N2^{p.m}_q{p.q.bit_length()}bit",
                "value": round(tps, 1),
                "unit": "transforms/s",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
