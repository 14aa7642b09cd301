"""Element-backend abstraction: one butterfly API over u32 / u64 reps.

A coefficient array is represented as a *rep*: a tuple of uint32 arrays
(1 limb for the q < 2^30 path, 2 limbs for the generic 64-bit path).  The
six-step / Pallas / distributed kernels are written once against this
interface; the limb count is a plan-time choice, exactly as the reference
chooses a word size per backend (defs.h:44-46).
"""

from __future__ import annotations

import numpy as np

from ntt_tpu import modmath as mm


def tmap(f, *reps):
    """Apply f limb-wise across reps (all same limb count)."""
    return tuple(f(*limbs) for limbs in zip(*reps))


class U32Ops:
    """Single-limb ops; word_size=32 Shoup constants; q < 2^30 (radix-2)."""

    nlimb = 1

    @staticmethod
    def fwd_bfly(x, y, wo, wc, q):
        """Harvey forward: inputs < 4q, outputs < 4q."""
        x1 = mm.cond_sub32(x[0], 2 * q)
        t = mm.shoup_mul32_q2(wo[0], wc[0], y[0], q)
        return (x1 + t,), (x1 + np.uint32(2 * q) - t,)

    @staticmethod
    def bkw_bfly(x, y, wo, wc, q):
        x1 = mm.cond_sub32(x[0] + y[0], 2 * q)
        t = x[0] + np.uint32(2 * q) - y[0]
        return (x1,), (mm.shoup_mul32_q2(wo[0], wc[0], t, q),)

    @staticmethod
    def bkw_final(x, y, n_inv_op, n_inv_con, tmp, con, q):
        """Final inverse stage fusing n_inv (src/ntt_reference.c:55-65)."""
        x1 = x[0] + y[0]
        t = x[0] + np.uint32(2 * q) - y[0]
        nx = mm.cond_sub32(
            mm.shoup_mul32_q2(np.uint32(n_inv_op), np.uint32(n_inv_con), x1, q), q
        )
        c_lo = np.uint32(con & 0xFFFFFFFF)
        big_q = mm.mulhi32(c_lo, t)
        if con >> 32:
            big_q = big_q + t
        ny = mm.cond_sub32(np.uint32(tmp) * t - big_q * np.uint32(q), q)
        return (nx,), (ny,)

    @staticmethod
    def reduce_4q_to_q(x, q):
        return (mm.reduce32(x[0], q, 4),)

    @staticmethod
    def shoup_mul(w, wc, x, q):
        """Constant (w, preconditioned wc) times variable x < 4q; out < 2q.
        The twist-multiply primitive of the two-level six-step."""
        return (mm.shoup_mul32_q2(w[0], wc[0], x[0], q),)

    @staticmethod
    def mul_mod(x, y, q):
        """Variable x variable (x*y) mod q, strict (for pointwise NTT-domain
        products)."""
        return (mm.mul_mod_q32(x[0], y[0], q),)

    @staticmethod
    def table(np_u64_table):
        import jax.numpy as jnp

        return (jnp.asarray(np.asarray(np_u64_table, dtype=np.uint64).astype(np.uint32)),)

    @staticmethod
    def from_host(a):
        import jax.numpy as jnp

        return (jnp.asarray(np.asarray(a, dtype=np.uint64).astype(np.uint32)),)

    @staticmethod
    def to_host(rep):
        return np.asarray(rep[0]).astype(np.uint64)


class U64Ops:
    """Two-limb ops; word_size=64 Shoup constants; any q < 2^62.  Bit-exact
    with the reference scalar path including lazy representatives."""

    nlimb = 2

    @staticmethod
    def fwd_bfly(x, y, wo, wc, q):
        x1 = mm.reduce_4q_to_2q(x, q)
        t = mm.shoup_mul_q2(wo, wc, y, q)
        q2 = mm.const_u64(2 * q)
        return mm.add64(x1, t), mm.sub64(mm.add64(x1, q2), t)

    @staticmethod
    def bkw_bfly(x, y, wo, wc, q):
        x1 = mm.reduce_4q_to_2q(mm.add64(x, y), q)
        q2 = mm.const_u64(2 * q)
        t = mm.sub64(mm.add64(x, q2), y)
        return x1, mm.shoup_mul_q2(wo, wc, t, q)

    @staticmethod
    def bkw_final(x, y, n_inv_op, n_inv_con, tmp, con, q):
        x1 = mm.add64(x, y)
        q2 = mm.const_u64(2 * q)
        t = mm.sub64(mm.add64(x, q2), y)
        nx = mm.shoup_mul_q(mm.const_u64(n_inv_op), mm.const_u64(n_inv_con), x1, q)
        c_lo = mm.const_u64(con & ((1 << 64) - 1))
        big_q = mm.mulhi64(c_lo, t)
        if con >> 64:
            big_q = mm.add64(big_q, t)
        res = mm.sub64(mm.mul64_lo_const(t, tmp), mm.mul64_lo_const(big_q, q))
        return nx, mm.reduce_2q_to_q(res, q)

    @staticmethod
    def reduce_4q_to_q(x, q):
        return mm.reduce_4q_to_q(x, q)

    @staticmethod
    def shoup_mul(w, wc, x, q):
        """Constant (w, preconditioned wc) times variable x < 4q; out < 2q."""
        return mm.shoup_mul_q2(w, wc, x, q)

    @staticmethod
    def mul_mod(x, y, q):
        return mm.mul_mod_q(x, y, q)

    @staticmethod
    def table(np_u64_table):
        return mm.from_u64(np.asarray(np_u64_table, dtype=np.uint64))

    from_host = staticmethod(mm.from_u64)
    to_host = staticmethod(mm.to_u64)


def pick_ops(q: int):
    return U32Ops if q < (1 << mm.U32_PATH_MAX_Q_BITS_R2) else U64Ops
