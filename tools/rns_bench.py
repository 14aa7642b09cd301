"""On-chip RNS ciphertext-multiply bench (VERDICT r3 #6 'Done' row).

Measures the end-to-end device cost of one HE-style ciphertext multiply
through DeviceRnsTower.negacyclic: k channels x (2 forward NTTs +
pointwise + inverse NTT), all device-resident (one host hop total,
excluded from the measured loop).  Default config is the VERDICT-named
row: 3 x 30-bit tower, N=2^14, batch 64.

Usage (real TPU): python tools/rns_bench.py [--m 14] [--widths 30,30,30]
                  [--batch 64]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=14)
    ap.add_argument("--widths", default="30,30,30")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_ntt_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from bench import _measure_loop
    from ntt_tpu.rns import DeviceRnsTower

    widths = tuple(int(w) for w in args.widths.split(","))
    tower = DeviceRnsTower(args.m, q_bits=widths)
    B = args.batch
    print(f"rns bench: device={jax.devices()[0].device_kind} N=2^{args.m} "
          f"widths={widths} batch={B}", flush=True)
    rng = np.random.default_rng(0)
    ch = np.stack([
        rng.integers(0, p.q, size=(B, tower.n), dtype=np.uint64)
        for p in tower.params
    ])
    ch2 = np.stack([
        rng.integers(0, p.q, size=(B, tower.n), dtype=np.uint64)
        for p in tower.params
    ])
    reps = (tower.from_host(ch), tower.from_host(ch2))

    def body(ab):
        # both operands loop-varying (b_{k+1} = a_k): squaring or a fixed
        # second operand lets XLA CSE/hoist one of the two forwards out of
        # the measured loop (see CLAUDE.md LICM note); this pair chain
        # pays the full 2 fwd + pointwise + inv per channel per iteration
        a, b = ab
        return tower.negacyclic(a, b), a

    sec = _measure_loop(body, reps, reps=5, k1=2, k2=14)
    print(f"  ct-mul ({len(widths)} ch): {sec / B * 1e6:8.3f} us/ct-mul "
          f"({B / sec:10,.1f} ct-mul/s; per-channel "
          f"{sec / B / len(widths) * 1e6:.3f} us)", flush=True)


if __name__ == "__main__":
    main()
