"""On-chip Mosaic correctness check for the pallas-fused variant.

The reference correctness-tests every shipped kernel and inverse
(/root/reference/tests/test_correctness.c:271-282); this is the on-chip
analog for the real Mosaic (Pallas TPU) kernels, which the default CPU
test suite only exercises in interpret mode.  Each requested fixture runs
the fused forward (oracle-exact vs the NumPy refmodel) and the fused
inverse (round-trip-exact), printing one OK/FAIL row per direction.

The u64 INVERSE single-kernel Mosaic compile is the documented hang
hazard (docs/PERF.md); round 3's split-phase inverse (two pallas_calls,
pallas_fused.inv_fused(split_phases=...)) is the workaround under test
here.  Run this LAST in a TPU session and under `timeout` -- a wedged
Mosaic compile cannot be cancelled and queues all later compiles behind
it.

Usage (real TPU):
    timeout 900 python tools/mosaic_check.py --fixtures 1 --dirs inv
    python tools/mosaic_check.py --fixtures 0,9,13 --dirs fwd,inv
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixtures", default="0,9,13",
                    help="comma list of params.FIXTURES indices")
    ap.add_argument("--dirs", default="fwd,inv")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--vmem-probe", action="store_true",
                    help="validate the _vmem_bytes model against real "
                    "Mosaic compiles at the headline shape (u64 N=2^14): "
                    "the modeled-max tile (8) must compile+run, and tile "
                    "16 -- modeled OVER the 110MB scoped-vmem limit, guard "
                    "bypassed -- must be REJECTED by Mosaic (a clean "
                    "compile there means the model went stale-protective)")
    ap.add_argument("--compile-timeout", type=float, default=1500.0,
                    help="per-fixture stall watchdog (seconds): if a "
                    "fixture makes no progress for this long, print the "
                    "wedge diagnosis + recovery protocol and exit(3) "
                    "instead of silently eating the whole session")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_ntt_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from ntt_tpu import api, refmodel as rm
    from ntt_tpu.params import FIXTURES
    from ntt_tpu.plan import get_plan

    dirs = args.dirs.split(",")
    failures = 0

    # stall watchdog (VERDICT r3 #4): Mosaic compiles cannot be cancelled
    # client-side, and a timeout-KILLED compile wedges the device path for
    # ~25-30 min (docs/PERF.md "Compile-hang hazard") -- so instead of the
    # caller's blind `timeout`, this watchdog bounds PER-FIXTURE progress
    # and exits with an explicit diagnosis while later fixtures are still
    # unqueued (a hung server compile blocks every compile behind it).
    import threading

    progress = {"t": time.monotonic(), "label": "startup"}

    def _watch():
        while True:
            time.sleep(10)
            stalled = time.monotonic() - progress["t"]
            if stalled > args.compile_timeout:
                print(
                    f"WEDGE: no progress for {stalled:.0f}s inside "
                    f"{progress['label']} -- a Mosaic compile is likely "
                    "hung server-side.  Do NOT start more TPU clients; "
                    "poll with a tiny jitted exec until EXEC-OK "
                    "(~25-30 min; see CLAUDE.md recovery protocol).",
                    flush=True,
                )
                _os._exit(3)

    threading.Thread(target=_watch, daemon=True).start()

    if args.vmem_probe:
        from ntt_tpu.kernels import pallas_fused as pf
        from ntt_tpu.kernels.elems import U64Ops
        from ntt_tpu.params import bench_params

        p = bench_params(m=14, q_bits=62)
        plan = get_plan(p)
        n1_log = pf.pick_split(p.n)
        tabs = plan.pallas_tables(False, n1_log, 2)
        rng = np.random.default_rng(0)
        a = rng.integers(0, p.q, size=(8, p.n), dtype=np.uint64)
        a_rep = U64Ops.from_host(a)

        # below the boundary: modeled-max tile must compile + verify
        progress["t"], progress["label"] = time.monotonic(), "vmem-probe t8"
        t0 = time.perf_counter()
        got = U64Ops.to_host(
            pf.fwd_fused(a_rep, U64Ops, tabs, p.q, n1_log, tile_b=8))
        want = rm.fwd_ntt_harvey(a[0], p.q, plan.w, plan.w_con)
        ok = bool((got[0] == want).all())
        failures += not ok
        print(f"vmem-probe tile 8 (modeled {pf._vmem_bytes(8, p.n, 2) >> 20}"
              f"MiB): {'OK' if ok else 'FAIL'}  "
              f"({time.perf_counter() - t0:.1f}s)", flush=True)

        # above the boundary: bypass the python guard, expect Mosaic's own
        # scoped-vmem rejection (the vmem_limit_bytes compiler param turns
        # the overflow into a compile error, not a hang)
        progress["t"], progress["label"] = time.monotonic(), "vmem-probe t16"
        t0 = time.perf_counter()
        real_model = pf._vmem_bytes
        pf._vmem_bytes = lambda *a_, **k_: 0  # guard off for the probe
        try:
            U64Ops.to_host(
                pf.fwd_fused(a_rep, U64Ops, tabs, p.q, n1_log, tile_b=16))
            rejected = False
        except Exception as e:
            rejected = True
            reason = f"{type(e).__name__}: {str(e)[:140]}"
        finally:
            pf._vmem_bytes = real_model
        failures += not rejected
        print(f"vmem-probe tile 16 (modeled "
              f"{real_model(16, p.n, 2) >> 20}MiB, guard bypassed): "
              f"{'REJECTED as modeled -- OK' if rejected else 'COMPILED -- model stale-protective, FAIL'}"
              f"  ({time.perf_counter() - t0:.1f}s)", flush=True)
        if rejected:
            print(f"  {reason}", flush=True)

    for idx in (int(x) for x in args.fixtures.split(",") if x):
        p = FIXTURES[idx]
        plan = get_plan(p)
        nlimb = 1 if plan.supports_u32_radix2 else 2
        rng = np.random.default_rng(idx)
        a = rng.integers(0, p.q, size=(args.batch, p.n), dtype=np.uint64)
        if "fwd" in dirs:
            progress["t"], progress["label"] = time.monotonic(), (
                f"fixture {idx} fwd")
            t0 = time.perf_counter()
            got = api.fwd_ntt(a, p, variant="pallas-fused")
            dt = time.perf_counter() - t0
            want = rm.fwd_ntt_harvey(a[0], p.q, plan.w, plan.w_con)
            ok = bool((got[0] == want).all()) and bool(
                (got[1] == rm.fwd_ntt_harvey(a[1], p.q, plan.w, plan.w_con)).all()
            )
            failures += not ok
            print(f"q={p.q:#018x} m={p.m:2d} u{64 if nlimb == 2 else 32} "
                  f"pallas fwd {'OK' if ok else 'FAIL'}  ({dt:.1f}s)",
                  flush=True)
        if "inv" in dirs:
            progress["t"], progress["label"] = time.monotonic(), (
                f"fixture {idx} inv")
            t0 = time.perf_counter()
            f = api.fwd_ntt(a, p, variant="pallas-fused")
            back = api.inv_ntt(f, p, variant="pallas-fused")
            dt = time.perf_counter() - t0
            ok = bool((back == a).all())
            failures += not ok
            print(f"q={p.q:#018x} m={p.m:2d} u{64 if nlimb == 2 else 32} "
                  f"pallas inv (round-trip) {'OK' if ok else 'FAIL'}  "
                  f"({dt:.1f}s)", flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
