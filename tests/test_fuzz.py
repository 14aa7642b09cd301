"""Randomized-instance fuzzing (the reference's fresh-rand()-per-run
philosophy, tests/utils.h:12-17, made reproducible).

Each run draws a few random (q_bits, m) NTT instances and random inputs
from an OS-seeded generator, prints the seed for replay, and checks the
full contract: oracle parity, round-trip, lazy bounds, and polymul
against an independent direct evaluation.
"""

import os

import numpy as np
import pytest

from ntt_tpu import api
from ntt_tpu import refmodel as rm
from ntt_tpu.params import NttParams
from ntt_tpu.plan import get_plan

SEED = int(os.environ.get("FUZZ_SEED", int.from_bytes(os.urandom(4), "little")))
print(f"\n[test_fuzz] session seed = {SEED} (rerun: FUZZ_SEED={SEED})")
_RNG = np.random.default_rng(SEED)

# a few random instances per run: q width spanning both limb paths, small m
CASES = [
    (int(_RNG.integers(13, 30)), int(_RNG.integers(6, 10))),
    (int(_RNG.integers(31, 61)), int(_RNG.integers(6, 10))),
    (62, int(_RNG.integers(6, 9))),
]


@pytest.mark.parametrize("q_bits,m", CASES, ids=lambda v: str(v))
def test_fuzz_instance(q_bits, m):
    p = NttParams.generate(q_bits, m)
    plan = get_plan(p)
    a = _RNG.integers(0, p.q, size=(2, p.n), dtype=np.uint64)
    want = rm.fwd_ntt_harvey(a, p.q, plan.w, plan.w_con)
    for variant in ("radix2", "sixstep") + (
        ("radix4", "r4r2") if q_bits <= 61 else ()
    ) + (("radix4-w56",) if q_bits <= 52 else ()):
        got = api.fwd_ntt(a, p, variant=variant)
        np.testing.assert_array_equal(got, want, err_msg=f"{variant} seed={SEED}")
        back = api.inv_ntt(got, p, variant=variant)
        np.testing.assert_array_equal(back, a, err_msg=f"{variant} seed={SEED}")
    lazy = api.fwd_ntt(a, p, variant="radix2", lazy=True)
    assert int(lazy.max()) < 4 * p.q, f"lazy bound violated, seed={SEED}"


def test_fuzz_polymul():
    q_bits, m = int(_RNG.integers(20, 62)), 5
    p = NttParams.generate(q_bits, m)
    a = _RNG.integers(0, p.q, size=(p.n,), dtype=np.uint64)
    b = _RNG.integers(0, p.q, size=(p.n,), dtype=np.uint64)
    got = api.negacyclic_mul(a, b, p)
    acc = np.zeros(p.n, dtype=object)
    for i in range(p.n):
        for j in range(p.n):
            k = (i + j) % p.n
            s = 1 if i + j < p.n else -1
            acc[k] = (acc[k] + s * int(a[i]) * int(b[j])) % p.q
    np.testing.assert_array_equal(
        got, acc.astype(np.uint64), err_msg=f"seed={SEED}"
    )
