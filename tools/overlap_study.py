"""Chunked comm/compute-overlap study for the distributed six-step NTT.

VERDICT r2 weak item #3: dist/sixstep.py claims n_chunks > 1 lets XLA's
latency-hiding scheduler overlap chunk c+1's all_to_all with chunk c's row
stages -- but nothing verified it.  This tool produces the evidence:

1. **Scheduled-HLO proof**: dump the optimized HLO of the distributed
   forward and check the schedule interleaves `all-to-all-start(c+1)` ...
   compute ... `all-to-all-done(c+1)` (XLA's async collectives are exactly
   the mechanism the chunking is supposed to engage).  Reported as the
   number of fusion/compute ops scheduled between each start/done pair.
2. **Measured times**: loop-differencing timing of the whole forward for
   n_chunks in {1, 2, 4} on the given mesh (CPU 8-dev virtual mesh by
   default; also meaningful on one real chip with D=1 where the collective
   still lowers).
3. **Phase attribution** for the CPU-mesh scaling artifact: time phase 1
   alone vs the full transform to show where the 13-34% efficiency goes.

Usage:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/overlap_study.py --platform cpu --m 20 --q-bits 27
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import glob
import os
import re
import sys
import tempfile
import time


def measure(body, x0, reps=3, k1=1, k2=9, target_s=1.5):
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

    timed(k1)
    base = min(timed(k1) for _ in range(2))
    for _ in range(6):
        diff = min(timed(k2) for _ in range(2)) - base
        if diff >= target_s or k2 >= 50_000:
            break
        k2 = min(50_000, max(k2 * 2, int(k2 * target_s / max(diff, 1e-3)) + k1))
    lo = min(timed(k1) for _ in range(reps))
    hi = min(timed(k2) for _ in range(reps))
    return (hi - lo) / (k2 - k1)


def hlo_overlap_report(fn, args_example, label: str) -> str:
    """Compile with an HLO dump dir; report how much compute the scheduler
    placed between each async collective start/done pair."""
    import jax

    with tempfile.TemporaryDirectory() as d:
        lowered = fn.lower(*args_example)
        compiled = lowered.compile()
        try:
            hlo = compiled.as_text()
        except Exception:
            hlo = ""
        if "all-to-all-start" not in hlo and "all-to-all" not in hlo:
            # fall back to a dump dir (some backends elide schedules in
            # as_text)
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "") + f" --xla_dump_to={d}"
            )
            jax.clear_caches()
            fn.lower(*args_example).compile()
            cands = sorted(glob.glob(os.path.join(d, "*after_optimiz*")))
            hlo = open(cands[-1]).read() if cands else ""
    lines = hlo.splitlines()
    starts = [i for i, l in enumerate(lines) if re.search(
        r"(all-to-all|collective-permute|all_to_all).*-start", l)]
    dones = [i for i, l in enumerate(lines) if re.search(
        r"(all-to-all|collective-permute|all_to_all).*-done", l)]
    plain = [i for i, l in enumerate(lines)
             if "all-to-all" in l and "-start" not in l and "-done" not in l]
    out = [f"[{label}] HLO: {len(starts)} async-collective starts, "
           f"{len(dones)} dones, {len(plain)} sync all-to-alls"]
    for s in starts:
        d_after = min((dd for dd in dones if dd > s), default=None)
        if d_after is None:
            continue
        between = [l for l in lines[s + 1 : d_after]
                   if re.search(r"fusion|convert|multiply|add|subtract", l)]
        out.append(f"  start@{s} -> done@{d_after}: "
                   f"{len(between)} compute ops scheduled between")
    return "\n".join(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--m", type=int, default=20)
    ap.add_argument("--q-bits", type=int, default=27)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--chunks", default="1,2,4")
    ap.add_argument("--ndev", type=int, default=None)
    ap.add_argument("--out", default=None, help="append report to this file")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_ntt_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from ntt_tpu.dist import sixstep as dist
    from ntt_tpu.kernels import sixstep
    from ntt_tpu.params import bench_params
    from ntt_tpu.plan import get_plan

    p = bench_params(m=args.m, q_bits=args.q_bits)
    plan = get_plan(p)
    mesh = dist.default_mesh(args.ndev)
    ndev = mesh.shape["x"]
    n1_log = max(sixstep.default_split(p.n), (ndev - 1).bit_length() + 2)
    n1, n2 = 1 << n1_log, p.n >> n1_log
    ops, w, wc = dist._tables(plan, inverse=False, mesh=mesh)
    rng = np.random.default_rng(0)
    a = rng.integers(0, p.q, size=(args.batch, n1, n2), dtype=np.uint64)
    rep = dist._global_rep(dist._host_limbs(a, ops), mesh,
                           dist.P(None, None, "x"))

    lines = [f"overlap study: device={jax.devices()[0].device_kind} D={ndev} "
             f"N=2^{args.m} q={p.q.bit_length()}bit batch={args.batch} "
             f"n1_log={n1_log}"]
    results = {}
    for c in (int(x) for x in args.chunks.split(",")):
        fn = dist._jit_dist_fwd(plan.q, p.n, n1_log, ops.nlimb, ndev, "x",
                                True, mesh, None, c)
        lines.append(hlo_overlap_report(fn, (*rep, *w, *wc), f"chunks={c}"))

        def body(x, fn=fn):
            out = fn(*x, *w, *wc)
            # natural-shard output -> valid next input (strict values)
            return out

        sec = measure(body, rep)
        results[c] = sec
        lines.append(f"[chunks={c}] {sec * 1e3:.3f} ms/transform")
    base = results.get(1)
    if base:
        for c, s in results.items():
            lines.append(f"chunks={c}: {base / s:.3f}x vs chunks=1")

    # phase attribution: phase 1 alone (no collective, no row stages)
    @jax.jit
    def phase1_only(*flat):
        nl = ops.nlimb
        ar = flat[:nl]
        w_ = flat[nl : 2 * nl]
        wc_ = flat[2 * nl :]
        return sixstep.fwd_phase1(ar, ops, w_, wc_, plan.q, n1, n2,
                                  group=sixstep.default_group(ops.nlimb))

    local_rep = tuple(np.asarray(l) for l in dist._host_limbs(a, ops))
    import jax.numpy as jnp
    local_dev = tuple(jnp.asarray(l) for l in local_rep)
    w_local = tuple(jnp.asarray(np.asarray(x)) for x in w)
    wc_local = tuple(jnp.asarray(np.asarray(x)) for x in wc)
    sec_p1 = measure(lambda x: phase1_only(*x, *w_local, *wc_local), local_dev)
    lines.append(f"[single-device phase1-only] {sec_p1 * 1e3:.3f} ms "
                 f"(column stages, zero comm -- the embarrassingly "
                 f"parallel fraction)")

    report = "\n".join(lines)
    print(report)
    if args.out:
        with open(args.out, "a") as f:
            f.write(report + "\n")


if __name__ == "__main__":
    main()
