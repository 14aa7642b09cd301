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


def _measure_chain(step, x0, reps: int, k1: int, k2: int) -> float:
    """Per-call device time via the pipelined-difference method:
    (T(k2 chained calls) - T(k1)) / (k2 - k1), min over reps.

    Chaining output->input forces sequential device execution and a single
    tiny fetch forces completion.  This is robust on backends where
    block_until_ready does not actually block (the axon TPU tunnel has
    ~250ms RPC latency and async dispatch), and subtracts both the fixed
    RPC latency and the dispatch overhead -- the accelerator analog of the
    upstream min-of-means protocol (tests/measurements.h:38-75)."""
    import numpy as np

    def chain(k):
        x = x0
        for _ in range(k):
            x = step(x)
        np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]
        return None

    import jax

    chain(2)  # warmup / compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        chain(k1)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        chain(k2)
        t2 = time.perf_counter() - t0
        best = min(best, (t2 - t1) / (k2 - k1))
    return best


def headline(batch: int, reps: int, inner: int, m: int = 14, q_bits: int = 62):
    import numpy as np

    from ntt_tpu import modmath as mm
    from ntt_tpu.api import _jit_fwd_sixstep
    from ntt_tpu.kernels.elems import U64Ops
    from ntt_tpu.params import bench_params
    from ntt_tpu.plan import get_plan

    p = bench_params(m=m, q_bits=q_bits)
    plan = get_plan(p)
    rng = np.random.default_rng(0)
    a = rng.integers(0, p.q, size=(batch, p.n), dtype=np.uint64)
    a_rep = mm.from_u64(a)
    w, wc, _, _ = plan.dev_r2_u64
    fn = _jit_fwd_sixstep(p.q, False, None, U64Ops.nlimb)

    def step(x_rep):
        return fn(*x_rep, *w, *wc)  # strict output is a valid next input

    sec = _measure_chain(step, a_rep, reps=reps, k1=2, k2=2 + inner)
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
    ap.add_argument("--inner", type=int, default=10)
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
