"""CLI: the framework's analog of the reference's two binaries.

The reference builds `ntt-variants` (correctness sweep over all variants x
19 fixtures, tests/main.c:38-46) and `ntt-variants-bench` (per-variant
cycle tables, tests/bench.c) from the same sources, plus a single-function
bench mode selected by an argv index (tests/main.c:12-17).  Here:

    python -m ntt_tpu list                  # variant registry + capabilities
    python -m ntt_tpu correctness           # oracle sweep (fast fixtures)
    python -m ntt_tpu correctness --full    # all 19 reference fixtures
    python -m ntt_tpu bench [--variant V]   # delegates to bench.py protocol
"""

from __future__ import annotations

import argparse
import sys
import time


def cmd_list(_args) -> int:
    from ntt_tpu import api

    print(f"{'variant':18s} {'fwd':3s} {'inv':3s} {'max q':6s} description")
    for name, v in sorted(api.variants().items()):
        print(
            f"{name:18s} {'yes':3s} {'yes' if v.inv else '-':3s} "
            f"2^{v.max_q_bits:<4d} {v.description}"
        )
    return 0


def cmd_correctness(args) -> int:
    """Oracle sweep: every capable variant strict-forward vs the golden
    radix-2 oracle (+ layout fix-up) and inverse round-trip, per fixture --
    the reference's test_correctness pattern."""
    import numpy as np

    from ntt_tpu import api
    from ntt_tpu import refmodel as rm
    from ntt_tpu.params import FIXTURES
    from ntt_tpu.plan import get_plan

    if args.fixtures:
        fixtures = [FIXTURES[int(i)] for i in args.fixtures.split(",")]
    else:
        fixtures = FIXTURES if args.full else [
            FIXTURES[i] for i in (0, 1, 2, 3, 9, 13)
        ]
    if args.skip is None:
        # pallas-fused is excluded from DEFAULT sweeps on every backend:
        # off-TPU the interpreter is too slow, and on TPU each new (q, m)
        # costs a ~700s Mosaic u64-inverse compile that, if killed, wedges
        # the device path for ~25-30 min (round-3 postmortem, docs/PERF.md
        # "Compile-hang hazard").  Check it deliberately, one fixture at a
        # time, with `timeout N python tools/mosaic_check.py --fixtures i`
        # (which carries its own compile-stall watchdog), or opt in here
        # with --skip ''.
        args.skip = "pallas-fused"
    skip = set(args.skip.split(",")) if args.skip else set()
    rng = np.random.default_rng(args.seed)
    failures = 0
    for p in fixtures:
        plan = get_plan(p)
        a = rng.integers(0, p.q, size=(p.n,), dtype=np.uint64)
        want = rm.fwd_ntt_harvey(a, p.q, plan.w, plan.w_con)
        for name, v in sorted(api.variants().items()):
            if name in skip or p.q.bit_length() > v.max_q_bits:
                continue
            t0 = time.perf_counter()
            raw = api.fwd_ntt(a, p, variant=name)
            ok = bool((api.output_layout(name, p).fix(raw) == want).all())
            rt = True
            if ok and v.inv is not None:
                # inverses consume the variant's NATIVE output layout
                rt = bool((api.inv_ntt(raw, p, variant=name) == a).all())
            status = "OK" if (ok and rt) else ("FWD-MISMATCH" if not ok else "ROUNDTRIP-FAIL")
            failures += status != "OK"
            print(
                f"q={p.q:#018x} m={p.m:2d} {name:18s} {status}"
                f"  ({time.perf_counter() - t0:.1f}s)",
                flush=True,
            )
    print("FAILURES:", failures)
    return 1 if failures else 0


def cmd_bench(args) -> int:
    import bench as bench_mod  # repo-root bench.py

    rest = args.rest[1:] if args.rest[:1] == ["--"] else args.rest
    sys.argv = ["bench.py"] + rest
    bench_mod.main()
    return 0


def main() -> int:
    ap = argparse.ArgumentParser(prog="python -m ntt_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list")
    c = sub.add_parser("correctness")
    c.add_argument("--full", action="store_true", help="all 19 reference fixtures")
    c.add_argument("--fixtures", default=None,
                   help="comma list of fixture indices (0..18) to sweep")
    c.add_argument("--seed", type=int, default=0)
    c.add_argument(
        "--skip", default=None,
        help="comma-separated variants to skip (default: 'pallas-fused' -- "
        "too slow interpreted off-TPU, and a documented Mosaic "
        "compile-hang hazard in on-TPU sweeps; check it per-fixture with "
        "tools/mosaic_check.py instead, or pass --skip '' to include it)",
    )
    b = sub.add_parser("bench")
    b.add_argument("rest", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    return {"list": cmd_list, "correctness": cmd_correctness, "bench": cmd_bench}[
        args.cmd
    ](args)


if __name__ == "__main__":
    sys.exit(main())
