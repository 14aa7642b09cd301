"""Experiment: where does the MXU NTT spend time?  (ad-hoc, TPU)

Timing method: wrap the op in lax.fori_loop(K) inside ONE jit; time
T(K=K2) - T(K=K1) with a forced fetch. One dispatch per measurement, all
iteration on device -- immune to tunnel latency and dispatch jitter.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ntt_tpu import modmath as mm
from ntt_tpu.kernels import mxu
from ntt_tpu.params import bench_params
from ntt_tpu.plan import get_plan

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
p = bench_params(m=14, q_bits=27)
plan = get_plan(p)
q = p.q
n1_log = 7
n1 = n2 = 128
tabs = mxu.get_mxu_tables(q, p.w, p.n, n1_log)
rng = np.random.default_rng(0)
a = rng.integers(0, q, (B, n1, n2), dtype=np.uint64).astype(np.uint32)
a_dev = jnp.asarray(a)
MASK = np.uint32((1 << 27) - 1)

print(f"q={q:#x} N=2^14 batch={B} dev={jax.devices()[0].device_kind}", flush=True)

K1, K2 = 4, 36


def timeit(name, body):
    """body: shape-preserving u32 (B,n1,n2) -> same."""

    @jax.jit
    def f(x, k):
        return lax.fori_loop(0, k, lambda i, v: body(v), x)

    np.asarray(f(a_dev, K1)).ravel()[:1]
    np.asarray(f(a_dev, K2)).ravel()[:1]
    lo, hi = [], []
    for _ in range(5):
        t0 = time.time(); np.asarray(f(a_dev, K1)).ravel()[:1]; lo.append(time.time() - t0)
        t0 = time.time(); np.asarray(f(a_dev, K2)).ravel()[:1]; hi.append(time.time() - t0)
    per = (min(hi) - min(lo)) / (K2 - K1)
    print(f"  {name:30s} {per*1e3:8.3f} ms  ({per/B*1e6:6.2f} us/tf)", flush=True)
    return per


# (a) full kernel
timeit("full fwd_mxu (int8)",
       lambda x: mxu.fwd_mxu(x.reshape(B, -1), tabs, q).reshape(B, n1, n2))


# (b) one phase of int8 matmuls (diagonal adds, no mod)
def matmul_only(x):
    xl = mxu._limbs_of_values(x)
    acc = None
    for s in range(mxu.N_LIMBS):
        for t_ in range(mxu.N_LIMBS):
            pp = jnp.einsum("jk,bki->bji", tabs["m1"][s], xl[t_],
                            preferred_element_type=jnp.int32)
            acc = pp if acc is None else acc + pp
    return acc.astype(jnp.uint32) & MASK


timeit("phase int8 16-matmul", matmul_only)


# (c) recombination-only: Horner x2 + T scale (VPU floor)
def recomb_only(x):
    d = [x.astype(jnp.int32)] * (2 * mxu.N_LIMBS - 1)
    c1 = mxu._horner_mod_q(d, q)
    z = mm.cond_sub32(mm.shoup_mul32_q2(tabs["t"], tabs["t_con"], c1, q), q)
    d2 = [z.astype(jnp.int32)] * (2 * mxu.N_LIMBS - 1)
    return mxu._horner_mod_q(d2, q)


timeit("2x Horner + T-scale (VPU)", recomb_only)


# (d) stacked single-matmul bf16 for one phase
mbig = jnp.asarray(
    np.asarray(tabs["m1"]).astype(np.float32).reshape(mxu.N_LIMBS * n1, n1),
    dtype=jnp.bfloat16,
)


def stacked_bf16(x):
    xl = jnp.stack(mxu._limbs_of_values(x)).astype(jnp.bfloat16)  # (L,B,n1,n2)
    xbig = xl.transpose(2, 0, 1, 3).reshape(n1, -1)  # (n1, L*B*n2)
    out = lax.dot_general(mbig, xbig, (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
    o5 = out.astype(jnp.int32).reshape(mxu.N_LIMBS, n1, mxu.N_LIMBS, B, n2)
    folded = o5.sum(axis=(0, 2)).transpose(1, 0, 2)  # (B, n1, n2) placeholder fold
    return folded.astype(jnp.uint32) & MASK


timeit("phase stacked bf16 1-matmul", stacked_bf16)


# (e) batched-as-batch bf16: keep B in batch dims of dot_general
def bf16_16(x):
    xl = mxu._limbs_of_values(x)
    acc = None
    for s in range(mxu.N_LIMBS):
        ms = tabs["m1"][s].astype(jnp.bfloat16)
        for t_ in range(mxu.N_LIMBS):
            pp = jnp.einsum("jk,bki->bji", ms, xl[t_].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
            acc = pp if acc is None else acc + pp
    return acc.astype(jnp.int32).astype(jnp.uint32) & MASK


timeit("phase bf16 16-matmul", bf16_16)
