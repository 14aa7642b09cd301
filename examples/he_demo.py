"""End-to-end HE-style workload demo: RNS ciphertext-multiply core.

The production workload the reference's kernels exist to serve is
homomorphic-encryption polynomial arithmetic: big-integer coefficient
rings represented as RNS residue towers, with every channel transformed
by a negacyclic NTT (README.md:3-4 of the reference).  This demo runs the
full pipeline on device:

  1. build an RNS tower of NTT-friendly primes sharing one ring degree;
  2. encode two big-int polynomials into residue channels;
  3. per channel, run the fused device pipeline
     (NTT -> pointwise -> inverse NTT in ONE jit, transposed-layout
     intermediates) via api.negacyclic_mul;
  4. CRT-reconstruct the exact big-int product and verify it against a
     schoolbook negacyclic multiply.

Run: python examples/he_demo.py [--m 10] [--widths 30,30,30] [--batch 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ntt_tpu.rns import DeviceRnsTower


def schoolbook_negacyclic(a, b, n):
    """Exact big-int negacyclic product (X^n = -1)."""
    acc = [0] * n
    for i in range(n):
        ai = int(a[i])
        if ai == 0:
            continue
        for j in range(n):
            k = i + j
            if k < n:
                acc[k] += ai * int(b[j])
            else:
                acc[k - n] -= ai * int(b[j])
    return acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=10)
    ap.add_argument("--widths", default="30,30,30")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--check", action="store_true",
                    help="verify against the O(N^2) schoolbook product")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu; env JAX_PLATFORMS "
                    "alone is overridden by force-registered plugins)")
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    widths = tuple(int(w) for w in args.widths.split(","))
    t0 = time.time()
    # device-resident tower: per-channel DeviceNtt handles, so the channel
    # products run NTT -> pointwise -> inverse with ONE host hop total
    tower = DeviceRnsTower(args.m, q_bits=widths)
    n = tower.n
    print(f"tower: N=2^{args.m}, moduli {[hex(q) for q in tower.moduli]} "
          f"(capacity {tower.modulus_product.bit_length()} bits, "
          f"built in {time.time() - t0:.1f}s)")

    rng = np.random.default_rng(0)
    # message polynomials with coefficients up to ~sqrt(capacity)/N so the
    # integer product stays below prod(moduli)
    coef_bits = (tower.modulus_product.bit_length() - args.m - 2) // 2
    hi = 1 << min(coef_bits, 62)
    a = rng.integers(0, hi, size=(args.batch, n), dtype=np.uint64)
    b = rng.integers(0, hi, size=(args.batch, n), dtype=np.uint64)

    t0 = time.time()
    ch_a, ch_b = tower.encode(a), tower.encode(b)
    prod_ch = tower.negacyclic_mul(ch_a, ch_b)
    prod = tower.decode(prod_ch)
    print(f"{args.batch} ciphertext-style products x {len(widths)} channels "
          f"in {time.time() - t0:.1f}s (incl. compile)")

    if args.check:
        want = schoolbook_negacyclic(a[0], b[0], n)
        big_q = tower.modulus_product
        got = [int(x) for x in prod[0]]
        assert got == [w % big_q for w in want], "MISMATCH vs schoolbook"
        print("verified: exact match with the schoolbook negacyclic product")
    else:
        # cheap self-check: re-encoding the reconstructed product gives
        # back exactly the channel residues it was built from
        np.testing.assert_array_equal(tower.encode(prod), prod_ch)
        print("self-check ok (run with --check for the schoolbook oracle)")


if __name__ == "__main__":
    main()
