"""NttPlan: cached per-(q, m) twiddle plans, host tables + device arrays.

The reference precomputes, per test case, one table family per kernel
variant at init time and caches it (tests/test_cases.h:212-311, called
once from main).  Here the same role is played by an ``NttPlan`` object:
built once per (q, m), it lazily materializes

  * host NumPy tables (exact, uint64) for every variant layout, and
  * device-resident uint32 representations consumed by the jnp / Pallas
    kernels (u64 limb pairs for the generic path; single uint32 arrays
    with word_size=32 Shoup constants for the q < 2^30 fast path).

Nothing here is performance-critical at transform time -- plans are
amortized over many transforms exactly like the reference's cached
precomputations (pre_compute.h:12-14).
"""

from __future__ import annotations

import functools

import numpy as np

from ntt_tpu import modmath as mm
from ntt_tpu import twiddles as tw
from ntt_tpu.params import NttParams


class NttPlan:
    """All cached tables for one (q, m) instance."""

    def __init__(self, params: NttParams):
        self.params = params
        self.q = params.q
        self.n = params.n
        self.m = params.m

    # -- capability flags ------------------------------------------------
    @property
    def supports_u32_radix2(self) -> bool:
        return self.q < (1 << mm.U32_PATH_MAX_Q_BITS_R2)

    @property
    def supports_u32_radix4(self) -> bool:
        return self.q < (1 << mm.U32_PATH_MAX_Q_BITS_R4)

    # -- host tables (uint64 NumPy) --------------------------------------
    @functools.cached_property
    def w(self) -> np.ndarray:
        return tw.calc_w(self.params.w, self.n, self.q)

    @functools.cached_property
    def w_con(self) -> np.ndarray:
        return tw.calc_w_con(self.w, self.q, 64)

    @functools.cached_property
    def w_inv(self) -> np.ndarray:
        return tw.calc_w_inv(self.params.w_inv, self.n, self.q)

    @functools.cached_property
    def w_inv_con(self) -> np.ndarray:
        return tw.calc_w_con(self.w_inv, self.q, 64)

    @functools.cached_property
    def n_inv_con(self) -> int:
        return tw.calc_ninv_con(self.params.n_inv, self.q, 64)

    @functools.cached_property
    def w_r4(self) -> np.ndarray:
        return tw.expand_w(self.w, self.q)

    @functools.cached_property
    def w_r4_con(self) -> np.ndarray:
        return tw.calc_w_con(self.w_r4, self.q, 64)

    @functools.cached_property
    def w_inv_r4(self) -> np.ndarray:
        return tw.expand_w(self.w_inv, self.q)

    @functools.cached_property
    def w_inv_r4_con(self) -> np.ndarray:
        return tw.calc_w_con(self.w_inv_r4, self.q, 64)

    @functools.cached_property
    def w_hexl(self) -> np.ndarray:
        return tw.expand_w_hexl(self.w)

    @functools.cached_property
    def w_hexl_con(self) -> np.ndarray:
        return tw.calc_w_con(self.w_hexl, self.q, 64)

    @functools.cached_property
    def w_r2_16(self) -> np.ndarray:
        return tw.expand_w_r2_16(self.w)

    @functools.cached_property
    def w_r2_16_con(self) -> np.ndarray:
        return tw.calc_w_con(self.w_r2_16, self.q, 64)

    def w_r4_vec(self, unordered: bool = False) -> np.ndarray:
        cache = self.__dict__.setdefault("_r4_vec_cache", {})
        if unordered not in cache:
            cache[unordered] = tw.expand_w_r4(self.w, self.q, unordered)
        return cache[unordered]

    @functools.cached_property
    def w_r4r2(self) -> np.ndarray:
        return tw.expand_w_r4r2(self.w, self.q)

    @functools.cached_property
    def w_r4r2_con(self) -> np.ndarray:
        return tw.calc_w_con(self.w_r4r2, self.q, 64)

    @functools.cached_property
    def dev_r4r2_u64(self):
        """(table, table_con) of the 5N r4r2 layout as u32 limb pairs."""
        return mm.from_u64(self.w_r4r2), mm.from_u64(self.w_r4r2_con)

    # word_size-56 Shoup constants for the VMSL-analog radix-4 path
    # (test_cases.h:254-264 builds the same three at VMSL_WORD_SIZE)
    @functools.cached_property
    def w_r4_con56(self) -> np.ndarray:
        return tw.calc_w_con(self.w_r4, self.q, 56)

    @functools.cached_property
    def w_inv_r4_con56(self) -> np.ndarray:
        return tw.calc_w_con(self.w_inv_r4, self.q, 56)

    @functools.cached_property
    def n_inv_con56(self) -> int:
        return tw.calc_ninv_con(self.params.n_inv, self.q, 56)

    @functools.cached_property
    def dev_r4_w56(self):
        """(w_r4, con56, w_inv_r4, inv_con56) as device u32 limb pairs."""
        return (
            mm.from_u64(self.w_r4),
            mm.from_u64(self.w_r4_con56),
            mm.from_u64(self.w_inv_r4),
            mm.from_u64(self.w_inv_r4_con56),
        )

    # word_size-32 Shoup constants for the u32 fast path
    def con32(self, table: np.ndarray) -> np.ndarray:
        return tw.calc_w_con(table, self.q, 32)

    @functools.cached_property
    def w_con32(self) -> np.ndarray:
        return self.con32(self.w)

    @functools.cached_property
    def w_inv_con32(self) -> np.ndarray:
        return self.con32(self.w_inv)

    @functools.cached_property
    def w_r4_con32(self) -> np.ndarray:
        return self.con32(self.w_r4)

    @functools.cached_property
    def w_inv_r4_con32(self) -> np.ndarray:
        return self.con32(self.w_inv_r4)

    @functools.cached_property
    def n_inv_con32(self) -> int:
        return tw.calc_ninv_con(self.params.n_inv, self.q, 32)

    # -- device tables ----------------------------------------------------
    @functools.cached_property
    def dev_r2_u64(self):
        """(w, w_con, w_inv, w_inv_con) as device u32 limb pairs."""
        return (
            mm.from_u64(self.w),
            mm.from_u64(self.w_con),
            mm.from_u64(self.w_inv),
            mm.from_u64(self.w_inv_con),
        )

    @functools.cached_property
    def dev_r4_u64(self):
        return (
            mm.from_u64(self.w_r4),
            mm.from_u64(self.w_r4_con),
            mm.from_u64(self.w_inv_r4),
            mm.from_u64(self.w_inv_r4_con),
        )

    @functools.cached_property
    def w_r4_vec_con(self) -> np.ndarray:
        return tw.calc_w_con(self.w_r4_vec(False), self.q, 64)

    @functools.cached_property
    def w_r4_vec_unord_con(self) -> np.ndarray:
        return tw.calc_w_con(self.w_r4_vec(True), self.q, 64)

    @functools.cached_property
    def dev_r4_vec_u64(self):
        """(table, table_con) of the ordered 5N vec layout, u32 limb pairs."""
        return mm.from_u64(self.w_r4_vec(False)), mm.from_u64(self.w_r4_vec_con)

    @functools.cached_property
    def dev_r4_vec_unord_u64(self):
        return (
            mm.from_u64(self.w_r4_vec(True)),
            mm.from_u64(self.w_r4_vec_unord_con),
        )

    @functools.cached_property
    def w_r4_vec_inv(self) -> np.ndarray:
        """5N vec layout of the INVERSE root (new scope: the reference's
        vec variants are forward-only), consumed by radix4.inv_vec_u64."""
        return tw.expand_w_r4(self.w_inv, self.q, False)

    @functools.cached_property
    def w_r4_vec_inv_con(self) -> np.ndarray:
        return tw.calc_w_con(self.w_r4_vec_inv, self.q, 64)

    @functools.cached_property
    def dev_r4_vec_inv_u64(self):
        return mm.from_u64(self.w_r4_vec_inv), mm.from_u64(self.w_r4_vec_inv_con)

    @functools.cached_property
    def w_r4_vec_inv_unord(self) -> np.ndarray:
        """Unordered 5N vec layout of the INVERSE root (FWD1 region
        lane-permuted): consumed by radix4.inv_vec_u64(unordered=True),
        the layout-native inverse of the unordered forward."""
        return tw.expand_w_r4(self.w_inv, self.q, True)

    @functools.cached_property
    def w_r4_vec_inv_unord_con(self) -> np.ndarray:
        return tw.calc_w_con(self.w_r4_vec_inv_unord, self.q, 64)

    @functools.cached_property
    def dev_r4_vec_inv_unord_u64(self):
        return (
            mm.from_u64(self.w_r4_vec_inv_unord),
            mm.from_u64(self.w_r4_vec_inv_unord_con),
        )

    @functools.cached_property
    def dev_hexl_u64(self):
        """(table, table_con) of the 13N/8 HEXL layout as u32 limb pairs."""
        return mm.from_u64(self.w_hexl), mm.from_u64(self.w_hexl_con)

    @functools.cached_property
    def dev_r2_16_u64(self):
        """(table, table_con) of the 3N r2_16 layout as u32 limb pairs."""
        return mm.from_u64(self.w_r2_16), mm.from_u64(self.w_r2_16_con)

    @functools.cached_property
    def dev_r2_u32(self):
        """uint32 tables for the q < 2^30 single-lane path."""
        import jax.numpy as jnp

        assert self.supports_u32_radix2
        return (
            jnp.asarray(self.w.astype(np.uint32)),
            jnp.asarray(self.w_con32.astype(np.uint32)),
            jnp.asarray(self.w_inv.astype(np.uint32)),
            jnp.asarray(self.w_inv_con32.astype(np.uint32)),
        )

    @functools.cached_property
    def dev_r4_u32(self):
        import jax.numpy as jnp

        assert self.supports_u32_radix4
        return (
            jnp.asarray(self.w_r4.astype(np.uint32)),
            jnp.asarray(self.w_r4_con32.astype(np.uint32)),
            jnp.asarray(self.w_inv_r4.astype(np.uint32)),
            jnp.asarray(self.w_inv_r4_con32.astype(np.uint32)),
        )


    # -- XLA six-step pre-broadcast row-twiddle stacks ---------------------
    def dev_row_tabs(self, n1_log: int, nlimb: int, inverse: bool):
        """(tw_tabs, twc_tabs) pre-transposed per-stage row twiddle stacks
        for the XLA six-step row phases (kernels/sixstep.row_tw_stacks):
        each a tuple over row stages s of reps shaped (2^s, 1, n1).
        Removes the in-program reshape(n1, m2).T per stage, which round-3
        profiling identified as the source of fwd_phase2's 17% flop
        inflation (docs/PERF.md)."""
        key = (n1_log, nlimb, inverse)
        cache = self.__dict__.setdefault("_row_tab_cache", {})
        if key not in cache:
            import jax.numpy as jnp

            from ntt_tpu.kernels import sixstep as ss

            n1, n2 = 1 << n1_log, self.n >> n1_log
            if inverse:
                w = self.w_inv
                wc = self.w_inv_con if nlimb == 2 else self.w_inv_con32
            else:
                w = self.w
                wc = self.w_con if nlimb == 2 else self.w_con32
            if nlimb == 2:
                to_rep = mm.from_u64
            else:
                to_rep = lambda t: (jnp.asarray(t.astype(np.uint32)),)
            cache[key] = (
                ss.row_tw_stacks(w, n1, n2, to_rep),
                ss.row_tw_stacks(wc, n1, n2, to_rep),
            )
        return cache[key]

    def dev_col_tabs(self, n1_log: int, nlimb: int, inverse: bool):
        """(tw_tabs, twc_tabs) pre-sliced per-stage COLUMN twiddle stacks
        (kernels/sixstep.col_tw_stacks): each a tuple over column stages s
        of reps shaped (2^s, 1, 1).  With the O(N) table passed as a jit
        argument, the in-program stage slices cost 14x at big N
        (artifacts/PHASE_CONST_AB_r05.json); these small dedicated
        operands restore closure-grade codegen."""
        key = (n1_log, nlimb, inverse)
        cache = self.__dict__.setdefault("_col_tab_cache", {})
        if key not in cache:
            import jax.numpy as jnp

            from ntt_tpu.kernels import sixstep as ss

            n1 = 1 << n1_log
            if inverse:
                w = self.w_inv
                wc = self.w_inv_con if nlimb == 2 else self.w_inv_con32
            else:
                w = self.w
                wc = self.w_con if nlimb == 2 else self.w_con32
            if nlimb == 2:
                to_rep = mm.from_u64
            else:
                to_rep = lambda t: (jnp.asarray(t.astype(np.uint32)),)
            cache[key] = (
                ss.col_tw_stacks(w, n1, to_rep),
                ss.col_tw_stacks(wc, n1, to_rep),
            )
        return cache[key]

    # -- Pallas fused-kernel twiddle stacks --------------------------------
    def pallas_tables(self, inverse: bool, n1_log: int, nlimb: int):
        """Stacked pre-broadcast per-stage twiddle tables for the Pallas
        fused kernels (see kernels/pallas_fused.build_tables); cached per
        (inverse, n1_log, nlimb)."""
        key = (inverse, n1_log, nlimb)
        cache = self.__dict__.setdefault("_pallas_tab_cache", {})
        if key not in cache:
            from ntt_tpu.kernels import pallas_fused as pf

            n1, n2 = 1 << n1_log, self.n >> n1_log
            if inverse:
                w, wc = self.w_inv, (
                    self.w_inv_con if nlimb == 2 else self.w_inv_con32
                )
            else:
                w, wc = self.w, (self.w_con if nlimb == 2 else self.w_con32)
            cache[key] = pf.build_tables(w, wc, n1, n2, nlimb)
        return cache[key]


@functools.lru_cache(maxsize=64)
def _plan_cache(q: int, m: int, w: int, w_inv: int, n_inv: int) -> NttPlan:
    return NttPlan(NttParams(m=m, q=q, w=w, w_inv=w_inv, n_inv=n_inv))


def get_plan(params: NttParams) -> NttPlan:
    return _plan_cache(params.q, params.m, params.w, params.w_inv, params.n_inv)
