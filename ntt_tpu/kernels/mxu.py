"""MXU (systolic-array) NTT: the four-step transform as int8 limb matmuls.

Where the VPU kernels compute butterflies, this kernel feeds the MXU: for
N = N1*N2 the forward negacyclic NTT factorizes exactly (derivation in
docs/DESIGN.md; it reproduces the reference's output order,
src/ntt_reference.c:11-31) as

    out[i1, i2] = sum_k2 ( col[i1, k2] * T[i1, k2] ) * W2[br(i2), k2]
    col[i1, k2] = sum_k1 a[k1, k2] * M1[br-order(i1), k1]

with  M1[j1, k1] = phi^((2*br(j1)+1) * k1),   phi = psi^N2  (2*N1-th root)
      T[i1, k2]  = psi^((2*br(i1)+1) * k2)                  (twiddle matrix)
      W2[j2, k2] = xi^(br(j2) * k2),          xi  = psi^(2*N1) (N2-th root)

Both matrix multiplies run on the MXU as *exact integer* matmuls: operands
are decomposed into 7-bit limbs stored as int8, partial products accumulate
in int32 (N1 <= 2^9 keeps every dot < 2^23), and the diagonal limb sums are
recombined mod q with a short Shoup-Horner chain on the VPU.  This is the
TPU analog of tensor-core NTT formulations, replacing the reference's
AVX512-IFMA 52-bit lanes with the 128x128 systolic array.

Scope: q < 2^28 (4 limbs/side, 7 diagonals), forward only for now -- the
same envelope as the reference's IFMA variants (forward-only, q < 2^49,
include/internal/defs.h:62).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ntt_tpu import modmath as mm
from ntt_tpu.twiddles import bit_rev_perm

LIMB_BITS = 7
LIMB_MASK = (1 << LIMB_BITS) - 1
N_LIMBS = 4  # 4*7 = 28 bits
MAX_Q_BITS = 28


def _limbs_of_matrix(mat: np.ndarray) -> np.ndarray:
    """(L, *mat.shape) int8 limb decomposition of a uint64 matrix."""
    out = np.zeros((N_LIMBS,) + mat.shape, dtype=np.int8)
    v = mat.astype(np.uint64)
    for s in range(N_LIMBS):
        out[s] = ((v >> np.uint64(LIMB_BITS * s)) & np.uint64(LIMB_MASK)).astype(
            np.int8
        )
    return out


def _limbs_of_values(x):
    """(L, ...) int8 limbs of a uint32 device array (values < 2^28)."""
    return [
        ((x >> np.uint32(LIMB_BITS * s)) & np.uint32(LIMB_MASK)).astype(jnp.int8)
        for s in range(N_LIMBS)
    ]


def build_mxu_tables(q: int, psi: int, n: int, n1_log: int):
    """Host-side exact tables: limb-decomposed M1, W2 and the Shoup twiddle
    matrix T (value + word_size-32 constant)."""
    assert q < (1 << MAX_Q_BITS), "MXU path requires q < 2^28"
    logn = n.bit_length() - 1
    n1, n2 = 1 << n1_log, 1 << (logn - n1_log)
    br1 = bit_rev_perm(n1)
    br2 = bit_rev_perm(n2)
    phi = pow(psi, n2, q)
    xi = pow(psi, 2 * n1, q)

    m1 = np.zeros((n1, n1), dtype=np.uint64)
    for j1 in range(n1):
        base = pow(phi, 2 * int(br1[j1]) + 1, q)
        cur = 1
        for k1 in range(n1):
            m1[j1, k1] = cur
            cur = cur * base % q

    w2 = np.zeros((n2, n2), dtype=np.uint64)
    for j2 in range(n2):
        base = pow(xi, int(br2[j2]), q)
        cur = 1
        for k2 in range(n2):
            w2[j2, k2] = cur
            cur = cur * base % q

    t = np.zeros((n1, n2), dtype=np.uint64)
    for i1 in range(n1):
        base = pow(psi, 2 * int(br1[i1]) + 1, q)
        cur = 1
        for k2 in range(n2):
            t[i1, k2] = cur
            cur = cur * base % q
    t_con = ((t.astype(object) << 32) // q).astype(np.uint64)

    return {
        "m1": jnp.asarray(_limbs_of_matrix(m1)),
        "w2": jnp.asarray(_limbs_of_matrix(w2)),
        "t": jnp.asarray(t.astype(np.uint32)),
        "t_con": jnp.asarray(t_con.astype(np.uint32)),
        "n1_log": n1_log,
    }


def _horner_mod_q(diags, q: int):
    """Recombine diagonal limb sums sum_d diags[d] * 2^(7d) mod q with a
    Shoup-Horner chain; intermediate acc stays < 2q + 2^25 (u32-safe for
    q < 2^28), and a final Barrett pass produces a strict [0, q) result."""
    c128 = (1 << LIMB_BITS) % q
    c128_con = (c128 << 32) // q
    acc = jnp.asarray(diags[-1]).astype(jnp.uint32)
    for d in range(len(diags) - 2, -1, -1):
        acc = mm.shoup_mul32_q2(np.uint32(c128), np.uint32(c128_con), acc, q)
        acc = acc + diags[d].astype(jnp.uint32)
    return mm.barrett_reduce32(acc, q)


def _matmul_mod_q(mat_limbs, x_u32, q: int, contract: str):
    """Exact (mat @ x) mod q via int8 limb matmuls + diagonal recombination.

    contract='left':  out[j, ...] = sum_k mat[j, k] * x[k, ...]   (phase 1)
    contract='right': out[..., j] = sum_k x[..., k] * mat[j, k]   (phase 3)

    The L value-limbs are CONCATENATED along the non-contracting axis so
    each matrix-limb does ONE wide matmul (L matmuls total instead of L^2
    narrow ones -- 4x fewer MXU dispatches at 4x the free dimension)."""
    x_limbs = _limbs_of_values(x_u32)
    n_diag = 2 * N_LIMBS - 1
    diags = [None] * n_diag
    if contract == "left":
        free = x_u32.shape[-1]
        xcat = jnp.concatenate(x_limbs, axis=-1)  # (b, k, L*free)
        for s in range(N_LIMBS):
            p = jnp.einsum("jk,bki->bji", mat_limbs[s], xcat,
                           preferred_element_type=jnp.int32)
            for t_ in range(N_LIMBS):
                d = s + t_
                part = p[..., t_ * free : (t_ + 1) * free]
                diags[d] = part if diags[d] is None else diags[d] + part
    else:
        free = x_u32.shape[-2]
        xcat = jnp.concatenate(x_limbs, axis=-2)  # (b, L*free, k)
        for s in range(N_LIMBS):
            p = jnp.einsum("bik,jk->bij", xcat, mat_limbs[s],
                           preferred_element_type=jnp.int32)
            for t_ in range(N_LIMBS):
                d = s + t_
                part = p[..., t_ * free : (t_ + 1) * free, :]
                diags[d] = part if diags[d] is None else diags[d] + part
    return _horner_mod_q(diags, q)


def fwd_mxu(a_u32, tabs, q: int, strict: bool = True):
    """Forward NTT on the MXU.  a_u32: uint32 (..., N), values < q < 2^28.
    Output (..., N) in the standard bit-reversed order, < q (strict) or
    < 2q (lazy)."""
    n = a_u32.shape[-1]
    logn = n.bit_length() - 1
    n1_log = tabs["n1_log"]
    n1, n2 = 1 << n1_log, 1 << (logn - n1_log)
    lead = a_u32.shape[:-1]
    a3 = a_u32.reshape((-1, n1, n2))

    # phase 1: column NTTs on the MXU (strict output)
    col = _matmul_mod_q(tabs["m1"], a3, q, "left")

    # phase 2: twiddle scale (VPU, Shoup); strict before re-decomposition
    z = mm.cond_sub32(mm.shoup_mul32_q2(tabs["t"], tabs["t_con"], col, q), q)

    # phase 3: shared row transform on the MXU (strict output)
    out = _matmul_mod_q(tabs["w2"], z, q, "right")
    del strict  # output is always strict; parameter kept for API symmetry
    return out.reshape(lead + (n,))


@functools.lru_cache(maxsize=32)
def get_mxu_tables(q: int, psi: int, n: int, n1_log: int | None = None):
    if n1_log is None:
        # balanced split: both matmul dims land on the 128x128 systolic
        # array aligned (the VPU-path split rule does not apply here)
        n1_log = (n.bit_length() - 1) // 2
    return build_mxu_tables(q, psi, n, n1_log)


# ---------------------------------------------------------------------------
# inverse (the reference ships no vectorized inverse variants -- its IFMA
# paths are forward-only, tests/bench.c:220-235; this framework adds the
# matmul inverse: A = M1inv @ (S o (out @ W2inv)), with N^-1 folded into S)
# ---------------------------------------------------------------------------


def build_mxu_inv_tables(q: int, psi: int, n: int, n1_log: int):
    assert q < (1 << MAX_Q_BITS)
    logn = n.bit_length() - 1
    n1, n2 = 1 << n1_log, 1 << (logn - n1_log)
    br1 = bit_rev_perm(n1)
    br2 = bit_rev_perm(n2)
    psi_inv = pow(psi, -1, q)
    phi_inv = pow(psi_inv, n2, q)
    xi_inv = pow(psi_inv, 2 * n1, q)
    n_inv = pow(n, -1, q)

    # step-1 matrix: mat[k2, j2] = xi^(-br(j2) * k2)
    w2i = np.zeros((n2, n2), dtype=np.uint64)
    for j2 in range(n2):
        base = pow(xi_inv, int(br2[j2]), q)
        cur = 1
        for k2 in range(n2):
            w2i[k2, j2] = cur
            cur = cur * base % q

    # step-3 matrix: mat[k1, j1] = phi^(-(2*br(j1)+1) * k1)
    m1i = np.zeros((n1, n1), dtype=np.uint64)
    for j1 in range(n1):
        base = pow(phi_inv, 2 * int(br1[j1]) + 1, q)
        cur = 1
        for k1 in range(n1):
            m1i[k1, j1] = cur
            cur = cur * base % q

    # step-2 scale: S[i1, k2] = N^-1 * psi^(-(2*br(i1)+1) * k2)
    s = np.zeros((n1, n2), dtype=np.uint64)
    for i1 in range(n1):
        base = pow(psi_inv, 2 * int(br1[i1]) + 1, q)
        cur = n_inv
        for k2 in range(n2):
            s[i1, k2] = cur
            cur = cur * base % q
    s_con = ((s.astype(object) << 32) // q).astype(np.uint64)

    return {
        "m1i": jnp.asarray(_limbs_of_matrix(m1i)),
        "w2i": jnp.asarray(_limbs_of_matrix(w2i)),
        "s": jnp.asarray(s.astype(np.uint32)),
        "s_con": jnp.asarray(s_con.astype(np.uint32)),
        "n1_log": n1_log,
    }


def inv_mxu(a_u32, tabs, q: int):
    """Inverse NTT on the MXU; bit-reversed in, natural out, strict [0,q)."""
    n = a_u32.shape[-1]
    logn = n.bit_length() - 1
    n1_log = tabs["n1_log"]
    n1, n2 = 1 << n1_log, 1 << (logn - n1_log)
    lead = a_u32.shape[:-1]
    a3 = a_u32.reshape((-1, n1, n2))

    col = _matmul_mod_q(tabs["w2i"], a3, q, "right")
    z = mm.cond_sub32(mm.shoup_mul32_q2(tabs["s"], tabs["s_con"], col, q), q)
    out = _matmul_mod_q(tabs["m1i"], z, q, "left")
    return out.reshape(lead + (n,))


@functools.lru_cache(maxsize=32)
def get_mxu_inv_tables(q: int, psi: int, n: int, n1_log: int | None = None):
    if n1_log is None:
        n1_log = (n.bit_length() - 1) // 2  # balanced (see get_mxu_tables)
    return build_mxu_inv_tables(q, psi, n, n1_log)
