"""Round-3 schedule/layout experiments for the u64 path.

docs/PERF.md's round-3 A/B (AB_MULMOD_*_r03) refuted the multiply-count
hypothesis: at 4.8 us/t the u64 six-step is bound by relayout/schedule
traffic, not multiply issue.  This lab measures the three candidate
levers that attack THAT bound:

  flatT     -- flat radix-2 chain over a TRANSPOSED (N, batch) layout:
               butterfly pairing runs along sublanes, batch fills the
               128-lane dim, so no stage ever crosses lanes (the six-step
               split exists to tame lane-crossing in the (batch, N)
               layout; in (N, batch) the motivation disappears).
  unordered -- sixstep keep_transposed=True: how much of the forward's
               4.80 us/t is the final order-fixing transpose the
               unordered contract (src/ntt_radix4_avx512_ifma_unordered.c
               analog) lets callers skip?
  batches   -- fine batch sweep around the 128 optimum (96..192).

Usage (real TPU): python tools/layout_lab.py --exp flatT,unordered,batches
CPU exactness only: python tools/layout_lab.py --exp flatT --platform cpu --skip-time
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ntt_tpu import modmath as mm
from ntt_tpu.kernels import radix2, sixstep as ss
from ntt_tpu.kernels.elems import U64Ops, tmap
from ntt_tpu.params import bench_params
from ntt_tpu.plan import get_plan


# ---------------------------------------------------------------------------
# transposed-layout flat radix-2 (data shape (N, batch), lanes = batch)
# ---------------------------------------------------------------------------


def _splitT(arr, m: int, t: int):
    b = arr.shape[-1]
    v = arr.reshape((m, 2, t, b))
    return v[:, 0], v[:, 1]


def _joinT(x, y):
    m, t, b = x.shape
    return jnp.stack([x, y], axis=1).reshape((2 * m * t, b))


def fwd_lazy_u64_T(a: mm.U64Pair, w: mm.U64Pair, w_con: mm.U64Pair, q: int):
    """radix2.fwd_lazy_u64 with the stage views over the LEADING axis:
    a is (lo, hi) of shape (N, B).  Same butterfly algebra, same lazy
    bounds; pairing and twiddle broadcast run along sublanes only."""
    alo, ahi = a
    n = alo.shape[0]
    logn = n.bit_length() - 1
    q2 = mm.const_u64(2 * q)
    m, t = 1, n >> 1
    for _ in range(logn):
        xlo, ylo = _splitT(alo, m, t)
        xhi, yhi = _splitT(ahi, m, t)
        x = (xlo, xhi)
        y = (ylo, yhi)
        wo = (w[0][m:2 * m].reshape(m, 1, 1), w[1][m:2 * m].reshape(m, 1, 1))
        wc = (w_con[0][m:2 * m].reshape(m, 1, 1),
              w_con[1][m:2 * m].reshape(m, 1, 1))
        x1 = mm.reduce_4q_to_2q(x, q)
        tt = mm.shoup_mul_q2(wo, wc, y, q)
        nx = mm.add64(x1, tt)
        ny = mm.sub64(mm.add64(x1, q2), tt)
        alo = _joinT(nx[0], ny[0])
        ahi = _joinT(nx[1], ny[1])
        m <<= 1
        t >>= 1
    return alo, ahi


def fwd_u64_T(a, w, w_con, q: int):
    return mm.reduce_4q_to_q(fwd_lazy_u64_T(a, w, w_con, q), q)


# ---------------------------------------------------------------------------


def _measure(body, a_rep, label):
    from bench import _measure_loop

    sec = _measure_loop(body, a_rep, reps=5, k1=2, k2=18)
    batch = 128
    print(f"  {label:28s} {sec / batch * 1e6:8.3f} us/t "
          f"({batch / sec:12,.0f} tps)", flush=True)
    return sec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", default="flatT,unordered,batches")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--skip-time", action="store_true")
    ap.add_argument("--m", type=int, default=14)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_ntt_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    p = bench_params(m=args.m, q_bits=62)
    plan = get_plan(p)
    q = p.q
    w_rep, wc_rep = plan.dev_r2_u64[0], plan.dev_r2_u64[1]
    rng = np.random.default_rng(0)
    exps = set(args.exp.split(","))
    print(f"layout lab: device={jax.devices()[0].device_kind} "
          f"q=62bit N=2^{p.m}", flush=True)

    if "flatT" in exps:
        # exactness: transposed kernel vs the golden kernel
        a = rng.integers(0, q, size=(4, p.n), dtype=np.uint64)
        a_rep = U64Ops.from_host(a)
        aT_rep = tmap(lambda l: l.T, a_rep)
        want = jax.jit(lambda x: radix2.fwd_u64(x, w_rep, wc_rep, q))(a_rep)
        got = jax.jit(lambda x: fwd_u64_T(x, w_rep, wc_rep, q))(aT_rep)
        ok = all(bool((np.asarray(g).T == np.asarray(wv)).all())
                 for g, wv in zip(got, want))
        print(f"  flatT exactness vs radix2.fwd_u64: {'OK' if ok else 'FAIL'}",
              flush=True)
        if not ok:
            sys.exit(1)
        if not args.skip_time:
            aT = rng.integers(0, q, size=(p.n, 128), dtype=np.uint64)
            aT_rep = U64Ops.from_host(aT)
            _measure(lambda x: fwd_u64_T(x, w_rep, wc_rep, q), aT_rep,
                     "flatT radix2-u64 (N,B)")

    if "unordered" in exps and not args.skip_time:
        a = rng.integers(0, q, size=(128, p.n), dtype=np.uint64)
        a_rep = U64Ops.from_host(a)
        _measure(lambda x: ss.fwd_sixstep(x, U64Ops, w_rep, wc_rep, q,
                                          strict=True), a_rep,
                 "sixstep-u64 (ordered)")
        _measure(lambda x: ss.fwd_sixstep(x, U64Ops, w_rep, wc_rep, q,
                                          strict=True, keep_transposed=True),
                 a_rep, "sixstep-u64 keep_transposed")

    if "batches" in exps and not args.skip_time:
        from bench import _measure_loop

        for b in (96, 112, 128, 160, 192):
            a = rng.integers(0, q, size=(b, p.n), dtype=np.uint64)
            a_rep = U64Ops.from_host(a)
            sec = _measure_loop(
                lambda x: ss.fwd_sixstep(x, U64Ops, w_rep, wc_rep, q,
                                         strict=True), a_rep, reps=5, k1=2,
                k2=18)
            print(f"  batch {b:4d}: {sec / b * 1e6:8.3f} us/t "
                  f"({b / sec:12,.0f} tps)", flush=True)


if __name__ == "__main__":
    main()
