"""Public API: fwd_ntt / inv_ntt over a variant registry.

The registry replaces the reference's func_num_t enum + argv dispatch
(tests/tests.h:10-24, tests/main.c:12-17): each variant is a named entry
with capability metadata (inverse support, q-width limits, output order),
and the dispatcher picks the best path ("auto") for a given plan.

Host interface: NumPy uint64 arrays (any leading batch dims, last dim N).
Device interface: each variant exposes a jittable core over uint32 arrays;
jitted callables are cached per (q, m, variant, laziness).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ntt_tpu import modmath as mm
from ntt_tpu.kernels import radix2, radix4, sixstep
from ntt_tpu.kernels.elems import U32Ops, U64Ops
from ntt_tpu.params import NttParams
from ntt_tpu.plan import NttPlan, get_plan


@dataclasses.dataclass(frozen=True)
class Variant:
    """Registry entry (capabilities mirror SURVEY.md section 2.3 table)."""

    name: str
    fwd: Callable  # (plan, lazy) -> host fn np.uint64 -> np.uint64
    inv: Callable | None
    max_q_bits: int = 62
    description: str = ""


_REGISTRY: dict[str, Variant] = {}


def register(v: Variant):
    _REGISTRY[v.name] = v
    return v


def variants() -> dict[str, Variant]:
    return dict(_REGISTRY)


def get_variant(name: str) -> Variant:
    if name not in _REGISTRY:
        raise KeyError(f"unknown NTT variant {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name]


# ---------------------------------------------------------------------------
# jitted cores (cached per static config)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _jit_fwd_r2_u64(q: int, lazy: bool):
    fn = radix2.fwd_lazy_u64 if lazy else radix2.fwd_u64

    def core(alo, ahi, wlo, whi, clo, chi):
        return fn((alo, ahi), (wlo, whi), (clo, chi), q)

    return jax.jit(core)


@functools.lru_cache(maxsize=None)
def _jit_inv_r2_u64(q: int, n_inv_op: int, n_inv_con: int, w1: int):
    def core(alo, ahi, wlo, whi, clo, chi):
        return radix2.inv_u64((alo, ahi), (wlo, whi), (clo, chi), n_inv_op, n_inv_con, w1, q)

    return jax.jit(core)


@functools.lru_cache(maxsize=None)
def _jit_fwd_r2_u32(q: int, lazy: bool):
    fn = radix2.fwd_lazy_u32 if lazy else radix2.fwd_u32
    return jax.jit(lambda a, w, wc: fn(a, w, wc, q))


@functools.lru_cache(maxsize=None)
def _jit_inv_r2_u32(q: int, n_inv_op: int, n_inv_con: int, w1: int):
    return jax.jit(
        lambda a, w, wc: radix2.inv_u32(a, w, wc, n_inv_op, n_inv_con, w1, q)
    )


@functools.lru_cache(maxsize=None)
def _jit_fwd_r4_u64(q: int, lazy: bool):
    fn = radix4.fwd_lazy_u64 if lazy else radix4.fwd_u64

    def core(alo, ahi, wlo, whi, clo, chi):
        return fn((alo, ahi), (wlo, whi), (clo, chi), q)

    return jax.jit(core)


@functools.lru_cache(maxsize=None)
def _jit_inv_r4_u64(q: int, n_inv_op: int, n_inv_con: int):
    def core(alo, ahi, wlo, whi, clo, chi):
        return radix4.inv_u64((alo, ahi), (wlo, whi), (clo, chi), n_inv_op, n_inv_con, q)

    return jax.jit(core)


@functools.lru_cache(maxsize=None)
def _jit_fwd_r4_u32(q: int, lazy: bool):
    fn = radix4.fwd_lazy_u32 if lazy else radix4.fwd_u32
    return jax.jit(lambda a, w, wc: fn(a, w, wc, q))


@functools.lru_cache(maxsize=None)
def _jit_inv_r4_u32(q: int, n_inv_op: int, n_inv_con: int):
    return jax.jit(lambda a, w, wc: radix4.inv_u32(a, w, wc, n_inv_op, n_inv_con, q))


# ---------------------------------------------------------------------------
# host wrappers
# ---------------------------------------------------------------------------


def _r2_u64_fwd(plan: NttPlan, a: np.ndarray, lazy: bool) -> np.ndarray:
    w, wc, _, _ = plan.dev_r2_u64
    alo, ahi = mm.from_u64(a)
    out = _jit_fwd_r2_u64(plan.q, lazy)(alo, ahi, w[0], w[1], wc[0], wc[1])
    return mm.to_u64(out)


def _r2_u64_inv(plan: NttPlan, a: np.ndarray) -> np.ndarray:
    _, _, wi, wic = plan.dev_r2_u64
    alo, ahi = mm.from_u64(a)
    fn = _jit_inv_r2_u64(
        plan.q, plan.params.n_inv, plan.n_inv_con, int(plan.w_inv[1])
    )
    return mm.to_u64(fn(alo, ahi, wi[0], wi[1], wic[0], wic[1]))


def _r2_u32_fwd(plan: NttPlan, a: np.ndarray, lazy: bool) -> np.ndarray:
    w, wc, _, _ = plan.dev_r2_u32
    a32 = jnp.asarray(a.astype(np.uint32))
    out = _jit_fwd_r2_u32(plan.q, lazy)(a32, w, wc)
    return np.asarray(out).astype(np.uint64)


def _r2_u32_inv(plan: NttPlan, a: np.ndarray) -> np.ndarray:
    _, _, wi, wic = plan.dev_r2_u32
    a32 = jnp.asarray(a.astype(np.uint32))
    fn = _jit_inv_r2_u32(
        plan.q, plan.params.n_inv, plan.n_inv_con32, int(plan.w_inv[1])
    )
    return np.asarray(fn(a32, wi, wic)).astype(np.uint64)


def _r4_u64_fwd(plan: NttPlan, a: np.ndarray, lazy: bool) -> np.ndarray:
    w, wc, _, _ = plan.dev_r4_u64
    alo, ahi = mm.from_u64(a)
    out = _jit_fwd_r4_u64(plan.q, lazy)(alo, ahi, w[0], w[1], wc[0], wc[1])
    return mm.to_u64(out)


def _r4_u64_inv(plan: NttPlan, a: np.ndarray) -> np.ndarray:
    _, _, wi, wic = plan.dev_r4_u64
    alo, ahi = mm.from_u64(a)
    fn = _jit_inv_r4_u64(plan.q, plan.params.n_inv, plan.n_inv_con)
    return mm.to_u64(fn(alo, ahi, wi[0], wi[1], wic[0], wic[1]))


def _r4_u32_fwd(plan: NttPlan, a: np.ndarray, lazy: bool) -> np.ndarray:
    w, wc, _, _ = plan.dev_r4_u32
    a32 = jnp.asarray(a.astype(np.uint32))
    out = _jit_fwd_r4_u32(plan.q, lazy)(a32, w, wc)
    return np.asarray(out).astype(np.uint64)


def _r4_u32_inv(plan: NttPlan, a: np.ndarray) -> np.ndarray:
    _, _, wi, wic = plan.dev_r4_u32
    a32 = jnp.asarray(a.astype(np.uint32))
    fn = _jit_inv_r4_u32(plan.q, plan.params.n_inv, plan.n_inv_con32)
    return np.asarray(fn(a32, wi, wic)).astype(np.uint64)


register(
    Variant(
        "radix2",
        fwd=_r2_u64_fwd,
        inv=_r2_u64_inv,
        description="golden radix-2 Harvey, u64 limb pairs (ref: src/ntt_reference.c)",
    )
)
register(
    Variant(
        "radix2-u32",
        fwd=_r2_u32_fwd,
        inv=_r2_u32_inv,
        max_q_bits=mm.U32_PATH_MAX_Q_BITS_R2,
        description="radix-2 Harvey, single uint32 lanes, word_size=32 Shoup",
    )
)
register(
    Variant(
        "radix4",
        fwd=_r4_u64_fwd,
        inv=_r4_u64_inv,
        max_q_bits=61,  # lazy bound is 8q: needs 8q < 2^64
        description="radix-4 five-twiddle, u64 limb pairs (ref: src/ntt_radix4.c)",
    )
)
register(
    Variant(
        "radix4-u32",
        fwd=_r4_u32_fwd,
        inv=_r4_u32_inv,
        max_q_bits=mm.U32_PATH_MAX_Q_BITS_R4,
        description="radix-4, single uint32 lanes, word_size=32 Shoup",
    )
)


@functools.lru_cache(maxsize=None)
def _jit_fwd_r4_w56(q: int, lazy: bool):
    fn = radix4.fwd_lazy_w56 if lazy else radix4.fwd_w56

    def core(alo, ahi, wlo, whi, clo, chi):
        return fn((alo, ahi), (wlo, whi), (clo, chi), q)

    return jax.jit(core)


@functools.lru_cache(maxsize=None)
def _jit_inv_r4_w56(q: int, n_inv_op: int, n_inv_con56: int):
    def core(alo, ahi, wlo, whi, clo, chi):
        return radix4.inv_w56(
            (alo, ahi), (wlo, whi), (clo, chi), n_inv_op, n_inv_con56, q
        )

    return jax.jit(core)


def _r4_w56_fwd(plan: NttPlan, a: np.ndarray, lazy: bool) -> np.ndarray:
    w, wc, _, _ = plan.dev_r4_w56
    alo, ahi = mm.from_u64(a)
    out = _jit_fwd_r4_w56(plan.q, lazy)(alo, ahi, w[0], w[1], wc[0], wc[1])
    return mm.to_u64(out)


def _r4_w56_inv(plan: NttPlan, a: np.ndarray) -> np.ndarray:
    _, _, wi, wic = plan.dev_r4_w56
    alo, ahi = mm.from_u64(a)
    fn = _jit_inv_r4_w56(plan.q, plan.params.n_inv, plan.n_inv_con56)
    return mm.to_u64(fn(alo, ahi, wi[0], wi[1], wic[0], wic[1]))


register(
    Variant(
        "radix4-w56",
        fwd=_r4_w56_fwd,
        inv=_r4_w56_inv,
        max_q_bits=mm.W56_PATH_MAX_Q_BITS,  # dual Shoup: 16q <= 2^56
        description="radix-4 five-twiddle at Shoup word size 56 -- the "
        "s390x VMSL analog (ref: src/ntt_radix4_s390x_vef.c): quotients "
        "shifted 56 out of the 112-bit constant product, q < 2^52",
    )
)


# -- MXU matmul variant ------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _jit_fwd_mxu(q: int, psi: int, n: int):
    from ntt_tpu.kernels import mxu

    tabs = mxu.get_mxu_tables(q, psi, n)
    return jax.jit(lambda a: mxu.fwd_mxu(a, tabs, q))


@functools.lru_cache(maxsize=None)
def _jit_inv_mxu(q: int, psi: int, n: int):
    from ntt_tpu.kernels import mxu

    tabs = mxu.get_mxu_inv_tables(q, psi, n)
    return jax.jit(lambda a: mxu.inv_mxu(a, tabs, q))


def _mxu_fwd(plan: NttPlan, a: np.ndarray, lazy: bool) -> np.ndarray:
    # output is always strict (the matmul recombination fully reduces)
    fn = _jit_fwd_mxu(plan.q, plan.params.w, plan.n)
    out = fn(jnp.asarray(a.astype(np.uint32)))
    return np.asarray(out).astype(np.uint64)


def _mxu_inv(plan: NttPlan, a: np.ndarray) -> np.ndarray:
    fn = _jit_inv_mxu(plan.q, plan.params.w, plan.n)
    out = fn(jnp.asarray(a.astype(np.uint32)))
    return np.asarray(out).astype(np.uint64)


register(
    Variant(
        "mxu",
        fwd=_mxu_fwd,
        inv=_mxu_inv,
        max_q_bits=28,
        description="four-step NTT as int8 limb matmuls on the MXU "
        "(128x128 systolic array); q < 2^28",
    )
)


# -- six-step variants -------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _jit_fwd_sixstep(q: int, lazy: bool, n1_log, nlimb: int, keep_t: bool = False,
                     group: int | None = None):
    ops = U32Ops if nlimb == 1 else U64Ops

    def core(*flat):
        a = flat[:nlimb]
        w = flat[nlimb : 2 * nlimb]
        wc = flat[2 * nlimb : 3 * nlimb]
        tabs = flat[3 * nlimb] if len(flat) > 3 * nlimb else None
        row_tabs, col_tabs = tabs if tabs is not None else (None, None)
        return sixstep.fwd_sixstep(
            a, ops, w, wc, q, n1_log, strict=not lazy, keep_transposed=keep_t,
            group=group, row_tabs=row_tabs, col_tabs=col_tabs,
        )

    return jax.jit(core)


@functools.lru_cache(maxsize=None)
def _jit_inv_sixstep(q, n_inv_op, n_inv_con, f_tmp, f_con, n1_log, nlimb: int,
                     input_t: bool = False, group: int | None = None):
    ops = U32Ops if nlimb == 1 else U64Ops

    def core(*flat):
        a = flat[:nlimb]
        w = flat[nlimb : 2 * nlimb]
        wc = flat[2 * nlimb : 3 * nlimb]
        tabs = flat[3 * nlimb] if len(flat) > 3 * nlimb else None
        row_tabs, col_tabs = tabs if tabs is not None else (None, None)
        return sixstep.inv_sixstep(
            a, ops, w, wc, n_inv_op, n_inv_con, f_tmp, f_con, q, n1_log,
            input_transposed=input_t, group=group, row_tabs=row_tabs,
            col_tabs=col_tabs,
        )

    return jax.jit(core)


def _row_tabs(plan: NttPlan, nlimb: int, inverse: bool,
              n1_log: int | None = None):
    """Pre-broadcast row-twiddle stacks for the six-step jit cores (passed
    as a trailing pytree arg).  Round-4 measured them NEUTRAL at m=14
    (ROWTAB_AB_r04: small tables, XLA folds the in-program derivation
    either way); round 5 found they are worth 3-4x at big N where the
    O(N) table rides as a jit argument (PHASE_CONST_AB_r05: m20 D=1-shape
    phase2 1022-1215 us args vs 299-302 tabs) -- so the stacks are now ON
    by default.  NTT_ROW_TABS=0 restores the in-program derivation."""
    if os.environ.get("NTT_ROW_TABS", "1") == "0":
        return None
    if n1_log is None:
        n1_log = sixstep.default_split(plan.n, nlimb=nlimb)
    return plan.dev_row_tabs(n1_log, nlimb, inverse)


def _col_tabs(plan: NttPlan, nlimb: int, inverse: bool,
              n1_log: int | None = None):
    """Pre-sliced column-twiddle stacks (the phase-1/phase-B analog of
    _row_tabs): worth 12.8x at big N with tables as jit arguments (m20
    D=8 phase1: 458 us args vs 35.9 tabs vs 31.9 closure,
    PHASE_CONST_AB_r05).  NTT_COL_TABS=0 disables."""
    if os.environ.get("NTT_COL_TABS", "1") == "0":
        return None
    if n1_log is None:
        n1_log = sixstep.default_split(plan.n, nlimb=nlimb)
    return plan.dev_col_tabs(n1_log, nlimb, inverse)


def _stage_tabs(plan: NttPlan, nlimb: int, inverse: bool,
                n1_log: int | None = None):
    """(row_tabs, col_tabs) bundle -- the single trailing pytree arg of
    the six-step jit cores."""
    return (_row_tabs(plan, nlimb, inverse, n1_log),
            _col_tabs(plan, nlimb, inverse, n1_log))


def _sixstep_fwd(plan: NttPlan, a: np.ndarray, lazy: bool) -> np.ndarray:
    if plan.supports_u32_radix2:
        w, wc, _, _ = plan.dev_r2_u32
        ops, w_rep, wc_rep = U32Ops, (w,), (wc,)
    else:
        (wlo, whi), (clo, chi), _, _ = plan.dev_r2_u64
        ops, w_rep, wc_rep = U64Ops, (wlo, whi), (clo, chi)
    a_rep = ops.from_host(a)
    out = _jit_fwd_sixstep(plan.q, lazy, None, ops.nlimb)(
        *a_rep, *w_rep, *wc_rep, _stage_tabs(plan, ops.nlimb, False)
    )
    return ops.to_host(out)


def _sixstep_inv(plan: NttPlan, a: np.ndarray) -> np.ndarray:
    word = 32 if plan.supports_u32_radix2 else 64
    ninv_con = plan.n_inv_con32 if word == 32 else plan.n_inv_con
    f_tmp, f_con = radix2._final_mulop(
        plan.params.n_inv, ninv_con, int(plan.w_inv[1]), plan.q, word
    )
    if plan.supports_u32_radix2:
        _, _, wi, wic = plan.dev_r2_u32
        ops, w_rep, wc_rep = U32Ops, (wi,), (wic,)
    else:
        _, _, (ilo, ihi), (iclo, ichi) = plan.dev_r2_u64
        ops, w_rep, wc_rep = U64Ops, (ilo, ihi), (iclo, ichi)
    a_rep = ops.from_host(a)
    fn = _jit_inv_sixstep(
        plan.q, plan.params.n_inv, ninv_con, f_tmp, f_con, None, ops.nlimb
    )
    return ops.to_host(
        fn(*a_rep, *w_rep, *wc_rep, _stage_tabs(plan, ops.nlimb, True))
    )


register(
    Variant(
        "sixstep",
        fwd=_sixstep_fwd,
        inv=_sixstep_inv,
        description="fused six-step N=N1xN2 decomposition, lane-contiguous "
        "stages + one transpose (TPU-native fast path)",
    )
)


def _sixstep_unordered_fwd(plan: NttPlan, a: np.ndarray, lazy: bool) -> np.ndarray:
    """Forward NTT in the documented transposed layout (skips the final
    transpose) -- the analog of the reference's unordered variant
    (src/ntt_radix4_avx512_ifma_unordered.c): callers repair order with
    output_layout(...).fix, or never repair at all when chaining
    NTT -> pointwise -> inverse-NTT."""
    n1_log = sixstep.default_split(
        plan.n, nlimb=1 if plan.supports_u32_radix2 else 2)
    if plan.supports_u32_radix2:
        w, wc, _, _ = plan.dev_r2_u32
        ops, w_rep, wc_rep = U32Ops, (w,), (wc,)
    else:
        (wlo, whi), (clo, chi), _, _ = plan.dev_r2_u64
        ops, w_rep, wc_rep = U64Ops, (wlo, whi), (clo, chi)
    a_rep = ops.from_host(a)
    out = _jit_fwd_sixstep(plan.q, lazy, n1_log, ops.nlimb, keep_t=True)(
        *a_rep, *w_rep, *wc_rep, _stage_tabs(plan, ops.nlimb, False, n1_log)
    )
    return ops.to_host(out)


def _sixstep_unordered_inv(plan: NttPlan, a: np.ndarray) -> np.ndarray:
    """Inverse that CONSUMES the transposed layout directly (skips the
    first six-step transpose): an unordered fwd -> pointwise -> this inv
    chain never materializes standard order.  New scope -- the reference's
    unordered variant is forward-only."""
    n1_log = sixstep.default_split(
        plan.n, nlimb=1 if plan.supports_u32_radix2 else 2)
    word = 32 if plan.supports_u32_radix2 else 64
    ninv_con = plan.n_inv_con32 if word == 32 else plan.n_inv_con
    f_tmp, f_con = radix2._final_mulop(
        plan.params.n_inv, ninv_con, int(plan.w_inv[1]), plan.q, word
    )
    if plan.supports_u32_radix2:
        _, _, wi, wic = plan.dev_r2_u32
        ops, w_rep, wc_rep = U32Ops, (wi,), (wic,)
    else:
        _, _, (ilo, ihi), (iclo, ichi) = plan.dev_r2_u64
        ops, w_rep, wc_rep = U64Ops, (ilo, ihi), (iclo, ichi)
    fn = _jit_inv_sixstep(
        plan.q, plan.params.n_inv, ninv_con, f_tmp, f_con, n1_log, ops.nlimb,
        input_t=True,
    )
    return ops.to_host(fn(*ops.from_host(a), *w_rep, *wc_rep,
                          _stage_tabs(plan, ops.nlimb, True, n1_log)))


register(
    Variant(
        "sixstep-unordered",
        fwd=_sixstep_unordered_fwd,
        inv=_sixstep_unordered_inv,
        description="six-step forward with unordered (transposed-layout) "
        "output + external fix-up permutation, the TPU-native form of the "
        "reference's unordered contract "
        "(src/ntt_radix4_avx512_ifma_unordered.c + fix_a_order); the "
        "inverse consumes the transposed layout directly (new scope)",
    )
)


# -- two-level recursive six-step (the huge-N single-chip path) ---------------
# N = N1*N2 with each level a full negacyclic NTT of the global prefix
# root (docs/DESIGN.md item 2 extended: twiddles.twist_tables_rec), so no
# materialized phase shape leaves the measured fast regime -- the TPU form
# of HEXL's depth-first recursion (fwd-ntt-avx512.c:310-328).


def _rec_level_plans(plan: NttPlan, l1_log: int):
    """Per-level sub-plans: size-N1 with root w^N2, size-N2 with root
    w^N1 (both primitive 2Ni-th roots; tables equal the global prefix)."""
    p = plan.params
    n1, n2 = 1 << l1_log, 1 << (p.m - l1_log)
    p1 = NttParams.make(p.q, l1_log, w=pow(p.w, n2, p.q))
    p2 = NttParams.make(p.q, p.m - l1_log, w=pow(p.w, n1, p.q))
    return get_plan(p1), get_plan(p2)


def _rec_twist_reps(plan: NttPlan, l1_log: int, inverse: bool, ops):
    """Factored twist table reps (A, Ac, B, Bc), cached on the plan."""
    from ntt_tpu import twiddles as tw

    key = ("_rec_twist", l1_log, inverse, ops.nlimb)
    if key not in plan.__dict__:
        p = plan.params
        psi = p.w_inv if inverse else p.w
        a_tab, b_tab = tw.twist_tables_rec(psi, p.q, plan.n, l1_log)
        word = 32 if ops.nlimb == 1 else 64
        n1, hi = a_tab.shape
        lo = b_tab.shape[1]
        plan.__dict__[key] = (
            ops.table(a_tab.reshape(n1, hi, 1)),
            ops.table(tw.calc_w_con(a_tab, p.q, word).reshape(n1, hi, 1)),
            ops.table(b_tab.reshape(n1, 1, lo)),
            ops.table(tw.calc_w_con(b_tab, p.q, word).reshape(n1, 1, lo)),
        )
    return plan.__dict__[key]


def _rec_word_tabs(lvl_plan: NttPlan, u32: bool, inverse: bool):
    if u32:
        w, wc, wi, wic = lvl_plan.dev_r2_u32
        return ((wi,), (wic,)) if inverse else ((w,), (wc,))
    w, wc, wi, wic = lvl_plan.dev_r2_u64
    return (wi, wic) if inverse else (w, wc)


def _rec_ninv(lvl_plan: NttPlan, word: int):
    ninv_con = lvl_plan.n_inv_con32 if word == 32 else lvl_plan.n_inv_con
    f_tmp, f_con = radix2._final_mulop(
        lvl_plan.params.n_inv, ninv_con, int(lvl_plan.w_inv[1]),
        lvl_plan.q, word,
    )
    return (lvl_plan.params.n_inv, ninv_con, f_tmp, f_con)


@functools.lru_cache(maxsize=None)
def _jit_fwd_rec(q: int, lazy: bool, l1_log: int, nlimb: int):
    ops = U32Ops if nlimb == 1 else U64Ops

    def core(*flat):
        parts = [flat[i * nlimb:(i + 1) * nlimb] for i in range(9)]
        a, w1, w1c, w2, w2c = parts[:5]
        return sixstep.fwd_rec(
            a, ops, w1, w1c, w2, w2c, tuple(parts[5:]), q, l1_log,
            strict=not lazy,
        )

    return jax.jit(core)


@functools.lru_cache(maxsize=None)
def _jit_inv_rec(q: int, ninv1: tuple, ninv2: tuple, l1_log: int, nlimb: int):
    ops = U32Ops if nlimb == 1 else U64Ops

    def core(*flat):
        parts = [flat[i * nlimb:(i + 1) * nlimb] for i in range(9)]
        a, wi1, wi1c, wi2, wi2c = parts[:5]
        return sixstep.inv_rec(
            a, ops, wi1, wi1c, wi2, wi2c, tuple(parts[5:]), ninv1, ninv2,
            q, l1_log,
        )

    return jax.jit(core)


def _sixstep_rec_fwd(plan: NttPlan, a: np.ndarray, lazy: bool) -> np.ndarray:
    l1 = sixstep.rec_split(plan.params.m)
    pl1, pl2 = _rec_level_plans(plan, l1)
    u32 = plan.supports_u32_radix2
    ops = U32Ops if u32 else U64Ops
    w1, w1c = _rec_word_tabs(pl1, u32, False)
    w2, w2c = _rec_word_tabs(pl2, u32, False)
    tw = _rec_twist_reps(plan, l1, False, ops)
    fn = _jit_fwd_rec(plan.q, lazy, l1, ops.nlimb)
    return ops.to_host(
        fn(*ops.from_host(a), *w1, *w1c, *w2, *w2c,
           *tw[0], *tw[1], *tw[2], *tw[3])
    )


def _sixstep_rec_inv(plan: NttPlan, a: np.ndarray) -> np.ndarray:
    l1 = sixstep.rec_split(plan.params.m)
    pl1, pl2 = _rec_level_plans(plan, l1)
    u32 = plan.supports_u32_radix2
    ops = U32Ops if u32 else U64Ops
    word = 32 if u32 else 64
    wi1, wi1c = _rec_word_tabs(pl1, u32, True)
    wi2, wi2c = _rec_word_tabs(pl2, u32, True)
    tw = _rec_twist_reps(plan, l1, True, ops)
    fn = _jit_inv_rec(
        plan.q, _rec_ninv(pl1, word), _rec_ninv(pl2, word), l1, ops.nlimb
    )
    return ops.to_host(
        fn(*ops.from_host(a), *wi1, *wi1c, *wi2, *wi2c,
           *tw[0], *tw[1], *tw[2], *tw[3])
    )


register(
    Variant(
        "sixstep-rec",
        fwd=_sixstep_rec_fwd,
        inv=_sixstep_rec_inv,
        description="two-level recursive six-step: balanced N1*N2 outer "
        "split where BOTH levels are full size-Ni negacyclic NTTs of the "
        "global prefix roots (docs/DESIGN.md item 2), glued by a factored "
        "gamma_c^{n2} twist (twiddles.twist_tables_rec) -- no materialized "
        "working set leaves the measured fast regime; the TPU form of "
        "HEXL's depth-first recursion (fwd-ntt-avx512.c:310-328), built "
        "for the huge-N (>= 2^23) sizes where the flat six-step hits the "
        "XLA pathology (kernels/sixstep.default_split)",
    )
)


def output_layout(variant: str, params_or_plan):
    """Layout descriptor for a variant's forward output (layouts.standard
    unless the variant documents otherwise)."""
    from ntt_tpu.kernels import layouts

    plan = _resolve(params_or_plan)
    if variant == "sixstep-unordered":
        return layouts.transposed(plan.n, sixstep.default_split(
            plan.n, nlimb=1 if plan.supports_u32_radix2 else 2))
    if variant == "radix4-vec-unordered":
        return layouts.radix4_vec_unordered(plan.n)
    return layouts.standard(plan.n)


# -- mixed-radix r4r2 variant -------------------------------------------------


@functools.lru_cache(maxsize=None)
def _jit_fwd_r4r2(q: int, lazy: bool, nlimb: int):
    from ntt_tpu.kernels import mixed

    def core(*flat):
        a = flat[:nlimb]
        w, wc = flat[nlimb : 2 * nlimb], flat[2 * nlimb : 3 * nlimb]
        w4, w4c = flat[3 * nlimb : 4 * nlimb], flat[4 * nlimb :]
        if nlimb == 1:
            fn = mixed.fwd_lazy_u32 if lazy else mixed.fwd_u32
            return (fn(a[0], w[0], wc[0], w4[0], w4c[0], q),)
        fn = mixed.fwd_lazy_u64 if lazy else mixed.fwd_u64
        return fn(a, w, wc, w4, w4c, q)

    return jax.jit(core)


@functools.lru_cache(maxsize=None)
def _jit_inv_r4r2(q: int, n_inv_op: int, n_inv_con: int, nlimb: int):
    from ntt_tpu.kernels import mixed

    def core(*flat):
        a = flat[:nlimb]
        w, wc = flat[nlimb : 2 * nlimb], flat[2 * nlimb : 3 * nlimb]
        w4, w4c = flat[3 * nlimb : 4 * nlimb], flat[4 * nlimb :]
        if nlimb == 1:
            return (
                mixed.inv_u32(a[0], w[0], wc[0], w4[0], w4c[0], n_inv_op, n_inv_con, q),
            )
        return mixed.inv_u64(a, w, wc, w4, w4c, n_inv_op, n_inv_con, q)

    return jax.jit(core)


def _r4r2_reps(plan: NttPlan, inverse: bool):
    if plan.supports_u32_radix4:
        ops = U32Ops
        if inverse:
            _, _, w, wc = plan.dev_r2_u32
            _, _, w4, w4c = plan.dev_r4_u32
        else:
            w, wc, _, _ = plan.dev_r2_u32
            w4, w4c, _, _ = plan.dev_r4_u32
        return ops, (w,), (wc,), (w4,), (w4c,)
    ops = U64Ops
    if inverse:
        _, _, w, wc = plan.dev_r2_u64
        _, _, w4, w4c = plan.dev_r4_u64
    else:
        w, wc, _, _ = plan.dev_r2_u64
        w4, w4c, _, _ = plan.dev_r4_u64
    return ops, w, wc, w4, w4c


@functools.lru_cache(maxsize=None)
def _jit_fwd_r4r2_tab(q: int, lazy: bool):
    from ntt_tpu.kernels import mixed

    fn = mixed.fwd_tab_lazy_u64 if lazy else mixed.fwd_tab_u64

    def core(alo, ahi, tlo, thi, clo, chi):
        return fn((alo, ahi), (tlo, thi), (clo, chi), q)

    return jax.jit(core)


def _r4r2_fwd(plan: NttPlan, a: np.ndarray, lazy: bool) -> np.ndarray:
    if not plan.supports_u32_radix4 and plan.n >= 128:
        # u64 path consumes the 5N expand_w_r4r2 layout directly
        tab, tab_con = plan.dev_r4r2_u64
        alo, ahi = mm.from_u64(a)
        fn = _jit_fwd_r4r2_tab(plan.q, lazy)
        return mm.to_u64(fn(alo, ahi, tab[0], tab[1], tab_con[0], tab_con[1]))
    ops, w, wc, w4, w4c = _r4r2_reps(plan, inverse=False)
    fn = _jit_fwd_r4r2(plan.q, lazy, ops.nlimb)
    return ops.to_host(fn(*ops.from_host(a), *w, *wc, *w4, *w4c))


def _r4r2_inv(plan: NttPlan, a: np.ndarray) -> np.ndarray:
    ops, w, wc, w4, w4c = _r4r2_reps(plan, inverse=True)
    ninv_con = plan.n_inv_con32 if ops.nlimb == 1 else plan.n_inv_con
    fn = _jit_inv_r4r2(plan.q, plan.params.n_inv, ninv_con, ops.nlimb)
    return ops.to_host(fn(*ops.from_host(a), *w, *wc, *w4, *w4c))


register(
    Variant(
        "r4r2",
        fwd=_r4r2_fwd,
        inv=_r4r2_inv,
        max_q_bits=61,  # radix-4 sweeps bound 8q: needs 8q < 2^64
        description="mixed radix: radix-4 five-twiddle sweeps + 4-stage "
        "radix-2 tail, lazy bound 4q (ref: src/ntt_r4r2_avx512_ifma.c; "
        "inverse is new scope)",
    )
)


# -- Pallas fused variant (whole transform in VMEM) ---------------------------


@functools.lru_cache(maxsize=None)
def _jit_fwd_pallas(q: int, lazy: bool, n1_log: int, nlimb: int, interpret: bool):
    from ntt_tpu.kernels import pallas_fused as pf

    ops = U32Ops if nlimb == 1 else U64Ops

    def core(*flat):
        a = flat[:nlimb]
        tabs = flat[nlimb:]
        return pf.fwd_fused(
            a, ops, tabs, q, n1_log, strict=not lazy, interpret=interpret
        )

    return jax.jit(core)


@functools.lru_cache(maxsize=None)
def _jit_inv_pallas(
    q: int, n_inv_op: int, n_inv_con: int, f_tmp: int, f_con: int,
    n1_log: int, nlimb: int, interpret: bool,
):
    from ntt_tpu.kernels import pallas_fused as pf

    ops = U32Ops if nlimb == 1 else U64Ops

    def core(*flat):
        a = flat[:nlimb]
        tabs = flat[nlimb:]
        return pf.inv_fused(
            a, ops, tabs, n_inv_op, n_inv_con, f_tmp, f_con, q, n1_log,
            interpret=interpret,
        )

    return jax.jit(core)


# Backends known to execute Mosaic (Pallas TPU) kernels natively.  Pinned
# as an explicit allowlist rather than a raw `!= "tpu"` compare so a plugin
# reporting an unexpected platform string cannot silently flip every
# pallas-fused call onto the (orders-of-magnitude slower) interpreter;
# unknown non-CPU backends fall back to the interpreter WITH a warning.
_PALLAS_NATIVE_BACKENDS = frozenset({"tpu"})
_PALLAS_INTERPRET_BACKENDS = frozenset({"cpu"})  # tests / virtual meshes


def _pallas_interpret(backend: str | None = None) -> bool:
    """True when pallas-fused must run in interpreter mode for `backend`
    (default: the active jax backend).  Native Mosaic on the allowlisted
    TPU platforms; silent interpreter on CPU (the test mesh); interpreter
    WITH a warning for anything unrecognized."""
    b = jax.default_backend() if backend is None else backend
    if b in _PALLAS_NATIVE_BACKENDS:
        return False
    if b not in _PALLAS_INTERPRET_BACKENDS:
        import warnings

        warnings.warn(
            f"pallas-fused: unrecognized backend {b!r}; falling back to the "
            "Pallas interpreter (correct but slow). Add the platform to "
            "api._PALLAS_NATIVE_BACKENDS if it executes Mosaic natively.",
            RuntimeWarning,
            stacklevel=2,
        )
    return True


def _pallas_fwd(plan: NttPlan, a: np.ndarray, lazy: bool) -> np.ndarray:
    from ntt_tpu.kernels import pallas_fused as pf

    nlimb = 1 if plan.supports_u32_radix2 else 2
    ops = U32Ops if nlimb == 1 else U64Ops
    n1_log = pf.pick_split(plan.n)
    tabs = plan.pallas_tables(False, n1_log, nlimb)
    fn = _jit_fwd_pallas(plan.q, lazy, n1_log, nlimb, _pallas_interpret())
    return ops.to_host(fn(*ops.from_host(a), *tabs))


def _pallas_inv(plan: NttPlan, a: np.ndarray) -> np.ndarray:
    from ntt_tpu.kernels import pallas_fused as pf

    nlimb = 1 if plan.supports_u32_radix2 else 2
    ops = U32Ops if nlimb == 1 else U64Ops
    word = 32 if nlimb == 1 else 64
    ninv_con = plan.n_inv_con32 if nlimb == 1 else plan.n_inv_con
    f_tmp, f_con = radix2._final_mulop(
        plan.params.n_inv, ninv_con, int(plan.w_inv[1]), plan.q, word
    )
    n1_log = pf.pick_split(plan.n)
    tabs = plan.pallas_tables(True, n1_log, nlimb)
    fn = _jit_inv_pallas(
        plan.q, plan.params.n_inv, ninv_con, f_tmp, f_con, n1_log, nlimb,
        _pallas_interpret(),
    )
    return ops.to_host(fn(*ops.from_host(a), *tabs))


register(
    Variant(
        "pallas-fused",
        fwd=_pallas_fwd,
        inv=_pallas_inv,
        description="whole transform fused in one Pallas kernel: batch tile "
        "+ all log2(N) stages VMEM-resident, one HBM read/write per poly "
        "(TPU analog of the reference's radix4x4/r4r2/r2_16/HEXL fusion "
        "family).  STATUS: Mosaic correctness testbed, not a fast path -- "
        "measured 3-6x slower than the XLA six-step at both widths and "
        "batch-rate-capped by the tile_b=8 VMEM limit (docs/PERF.md), "
        "with a ~700s u64-inverse compile per (q, m); excluded from "
        "default sweeps (tools/mosaic_check.py probes it per fixture); "
        "interpreter-mode on non-TPU backends",
    )
)


# -- reference variant-family kernels ----------------------------------------
# Each reference SIMD/scheduling family gets its own dataflow here: SEAL's
# dwthandler operation placement, radix4x4's layers-per-materialization
# fusion (as grouped six-step stages), and the HEXL / r2_16 kernels
# consuming their dedicated twiddle memory layouts.


@functools.lru_cache(maxsize=None)
def _jit_fwd_seal(q: int, lazy: bool):
    fn = radix2.fwd_seal_lazy_u64 if lazy else radix2.fwd_seal_u64

    def core(alo, ahi, wlo, whi, clo, chi):
        return fn((alo, ahi), (wlo, whi), (clo, chi), q)

    return jax.jit(core)


@functools.lru_cache(maxsize=None)
def _jit_inv_seal(q: int, n_inv_op: int, n_inv_con: int, w1: int):
    def core(alo, ahi, wlo, whi, clo, chi):
        return radix2.inv_seal_u64(
            (alo, ahi), (wlo, whi), (clo, chi), n_inv_op, n_inv_con, w1, q
        )

    return jax.jit(core)


def _seal_fwd(plan: NttPlan, a: np.ndarray, lazy: bool) -> np.ndarray:
    w, wc, _, _ = plan.dev_r2_u64
    alo, ahi = mm.from_u64(a)
    out = _jit_fwd_seal(plan.q, lazy)(alo, ahi, w[0], w[1], wc[0], wc[1])
    return mm.to_u64(out)


def _seal_inv(plan: NttPlan, a: np.ndarray) -> np.ndarray:
    _, _, wi, wic = plan.dev_r2_u64
    alo, ahi = mm.from_u64(a)
    fn = _jit_inv_seal(
        plan.q, plan.params.n_inv, plan.n_inv_con, int(plan.w_inv[1])
    )
    return mm.to_u64(fn(alo, ahi, wi[0], wi[1], wic[0], wic[1]))


register(
    Variant(
        "seal",
        fwd=_seal_fwd,
        inv=_seal_inv,
        description="SEAL dwthandler radix-2 (third_party/seal/ntt_seal.c): "
        "forward mirrors the special-cased-last-stage schedule (values "
        "bit-identical to 'radix2'); inverse keeps SEAL's distinct final "
        "stage (guard placement, fused scaled_r, trailing 2q->q sweep)",
    )
)


def _radix4x4_fwd(plan: NttPlan, a: np.ndarray, lazy: bool) -> np.ndarray:
    if plan.supports_u32_radix2:
        w, wc, _, _ = plan.dev_r2_u32
        ops, w_rep, wc_rep = U32Ops, (w,), (wc,)
    else:
        (wlo, whi), (clo, chi), _, _ = plan.dev_r2_u64
        ops, w_rep, wc_rep = U64Ops, (wlo, whi), (clo, chi)
    a_rep = ops.from_host(a)
    out = _jit_fwd_sixstep(plan.q, lazy, None, ops.nlimb, group=4)(
        *a_rep, *w_rep, *wc_rep, _stage_tabs(plan, ops.nlimb, False)
    )
    return ops.to_host(out)


def _radix4x4_inv(plan: NttPlan, a: np.ndarray) -> np.ndarray:
    word = 32 if plan.supports_u32_radix2 else 64
    ninv_con = plan.n_inv_con32 if word == 32 else plan.n_inv_con
    f_tmp, f_con = radix2._final_mulop(
        plan.params.n_inv, ninv_con, int(plan.w_inv[1]), plan.q, word
    )
    if plan.supports_u32_radix2:
        _, _, wi, wic = plan.dev_r2_u32
        ops, w_rep, wc_rep = U32Ops, (wi,), (wic,)
    else:
        _, _, (ilo, ihi), (iclo, ichi) = plan.dev_r2_u64
        ops, w_rep, wc_rep = U64Ops, (ilo, ihi), (iclo, ichi)
    fn = _jit_inv_sixstep(
        plan.q, plan.params.n_inv, ninv_con, f_tmp, f_con, None, ops.nlimb,
        group=4,
    )
    return ops.to_host(fn(*ops.from_host(a), *w_rep, *wc_rep,
                          _stage_tabs(plan, ops.nlimb, True)))


register(
    Variant(
        "radix4x4",
        fwd=_radix4x4_fwd,
        inv=_radix4x4_inv,
        description="radix-16 blocked variant (src/ntt_radix4x4.c:64-75): "
        "four butterfly layers per materialization via grouped six-step "
        "stages (one interleave per 4 stages -- the TPU form of "
        "two-radix-4-layers-per-cache-residency); inverse is new scope",
    )
)


@functools.lru_cache(maxsize=None)
def _jit_fwd_layout(q: int, lazy: bool, kind: str):
    fn = {
        ("hexl", False): radix2.fwd_hexl_u64,
        ("hexl", True): radix2.fwd_hexl_lazy_u64,
        ("r2_16", False): radix2.fwd_r2_16_u64,
        ("r2_16", True): radix2.fwd_r2_16_lazy_u64,
    }[(kind, lazy)]

    def core(alo, ahi, tlo, thi, clo, chi):
        return fn((alo, ahi), (tlo, thi), (clo, chi), q)

    return jax.jit(core)


def _hexl_fwd(plan: NttPlan, a: np.ndarray, lazy: bool) -> np.ndarray:
    # HEXL contract (include/ntt_hexl.h:30-39): accepts inputs in [0, 4q)
    # (input_mod_factor up to 4); output_mod_factor 1 (strict) or 4 (lazy);
    # twiddles read from the 13N/8 duplicated layout (expand_w_hexl).
    tab, tab_con = plan.dev_hexl_u64
    alo, ahi = mm.from_u64(a)
    fn = _jit_fwd_layout(plan.q, lazy, "hexl")
    return mm.to_u64(fn(alo, ahi, tab[0], tab[1], tab_con[0], tab_con[1]))


def _r2_16_fwd(plan: NttPlan, a: np.ndarray, lazy: bool) -> np.ndarray:
    tab, tab_con = plan.dev_r2_16_u64
    alo, ahi = mm.from_u64(a)
    fn = _jit_fwd_layout(plan.q, lazy, "r2_16")
    return mm.to_u64(fn(alo, ahi, tab[0], tab[1], tab_con[0], tab_con[1]))


@functools.lru_cache(maxsize=None)
def _jit_fwd_r4_vec(q: int, lazy: bool, unordered: bool):
    fn = radix4.fwd_vec_lazy_u64 if lazy else radix4.fwd_vec_u64

    def core(alo, ahi, tlo, thi, clo, chi):
        return fn((alo, ahi), (tlo, thi), (clo, chi), q, unordered)

    return jax.jit(core)


def _r4_vec_fwd(plan: NttPlan, a: np.ndarray, lazy: bool) -> np.ndarray:
    tab, tab_con = plan.dev_r4_vec_u64
    alo, ahi = mm.from_u64(a)
    fn = _jit_fwd_r4_vec(plan.q, lazy, False)
    return mm.to_u64(fn(alo, ahi, tab[0], tab[1], tab_con[0], tab_con[1]))


def _r4_vec_unord_fwd(plan: NttPlan, a: np.ndarray, lazy: bool) -> np.ndarray:
    tab, tab_con = plan.dev_r4_vec_unord_u64
    alo, ahi = mm.from_u64(a)
    fn = _jit_fwd_r4_vec(plan.q, lazy, True)
    return mm.to_u64(fn(alo, ahi, tab[0], tab[1], tab_con[0], tab_con[1]))


@functools.lru_cache(maxsize=None)
def _jit_inv_r4_vec(q: int, n_inv_op: int, n_inv_con: int,
                    unordered: bool = False):
    def core(alo, ahi, tlo, thi, clo, chi):
        return radix4.inv_vec_u64(
            (alo, ahi), (tlo, thi), (clo, chi), n_inv_op, n_inv_con, q,
            unordered,
        )

    return jax.jit(core)


def _r4_vec_inv(plan: NttPlan, a: np.ndarray) -> np.ndarray:
    tab, tab_con = plan.dev_r4_vec_inv_u64
    alo, ahi = mm.from_u64(a)
    fn = _jit_inv_r4_vec(plan.q, plan.params.n_inv, plan.n_inv_con)
    return mm.to_u64(fn(alo, ahi, tab[0], tab[1], tab_con[0], tab_con[1]))


def _r4_vec_unord_inv(plan: NttPlan, a: np.ndarray) -> np.ndarray:
    """Layout-consuming inverse: accepts the lane-permuted
    radix4_vec_unordered order directly (no fix_a_order pass)."""
    tab, tab_con = plan.dev_r4_vec_inv_unord_u64
    alo, ahi = mm.from_u64(a)
    fn = _jit_inv_r4_vec(plan.q, plan.params.n_inv, plan.n_inv_con, True)
    return mm.to_u64(fn(alo, ahi, tab[0], tab[1], tab_con[0], tab_con[1]))


register(
    Variant(
        "radix4-vec",
        fwd=_r4_vec_fwd,
        inv=_r4_vec_inv,
        max_q_bits=61,
        description="radix-4 over the 5N vector twiddle layout "
        "(src/ntt_radix4_avx512_ifma.c): leading radix-2 stage for odd "
        "log2 N, quintuples walked off the FWD8/FWD4/FWD1 regions of "
        "expand_w_r4 in emission order; inverse (new scope -- the "
        "reference is forward-only) consumes the inverse root's 5N table "
        "regions in reverse emission order",
    )
)
register(
    Variant(
        "radix4-vec-unordered",
        fwd=_r4_vec_unord_fwd,
        inv=_r4_vec_unord_inv,
        max_q_bits=61,
        description="radix4-vec with the lane-permuted FWD1 region of "
        "expand_w_r4(unordered=True): the final stage processes groups in "
        "the table's (0,4,1,5,2,6,3,7) order and stores linearly; output "
        "layout = layouts.radix4_vec_unordered (fix_a_order analog, "
        "src/ntt_radix4_avx512_ifma_unordered.c); the inverse (new scope "
        "-- the reference is forward-only) CONSUMES that layout directly "
        "via the unordered inverse-root table, so fwd -> pointwise -> inv "
        "never materializes standard order",
    )
)
register(
    Variant(
        "hexl",
        fwd=_hexl_fwd,
        inv=_r2_u64_inv,
        description="Intel HEXL radix-2 (third_party/hexl/fwd-ntt-avx512.c): "
        "consumes the 13N/8 duplicated twiddle layout (expand_w_hexl) -- "
        "the x4/x2 tail segments are read as the pre-broadcast (m, t) "
        "views directly; input_mod_factor<=4 / output_mod_factor in {1,4} "
        "via the lazy flag; the reference port is forward-only -- the "
        "inverse here is new scope and INTENTIONALLY uses the plain "
        "bit-reversed table kernel (the 13N/8 duplication only benefits "
        "the forward tail-stage read pattern)",
    )
)
register(
    Variant(
        "r2-16",
        fwd=_r2_16_fwd,
        inv=_r2_u64_inv,
        description="pure radix-2 with fused last-stage tail tables "
        "(src/ntt_r2_16_avx512_ifma.c): consumes the 3N expand_w_r2_16 "
        "layout, reading the FwdT2/FwdT1 segments through the documented "
        "inverse of their lane interleaves; inverse is new scope and "
        "INTENTIONALLY uses the plain bit-reversed table kernel (the 3N "
        "duplication only benefits the forward tail-stage read pattern)",
    )
)


# ---------------------------------------------------------------------------
# device-resident serving API
# ---------------------------------------------------------------------------


# Serving-batch tiling policy (measured, artifacts/BATCH_LAB_r04.log +
# docs/PERF.md batch study): the u64 path falls off a VMEM-residency cliff
# above ~512 rows (b1024 direct 8.5-8.8 us/t vs 5.6-5.8 in 128-row
# unrolled tiles).  Round 5 found the u32 path hits the same cliff one
# octave later: the round-3 "tiling loses 49%" held at the b256 headline,
# but at b1024 the 256-row tiled chain wins 1.5x on the forward (1.23-
# 1.29 vs 1.85-2.03 us/row) and 1.9x on the chained ct-mul (8.37-8.42 vs
# 16.0-16.2) -- artifacts/U32_SERVING_r05.json, interleaved, 2 rounds.
# Per width: (batch threshold, tile) or None.
_AUTO_BATCH_POLICY: dict[int, tuple | None] = {64: (512, 128),
                                               32: (512, 256)}

# statically unrolled tile chains beyond this many tiles fall back to
# lax.map: the round-4 cliff sweep (AUTO_SWEEP_r04.json) has unroll ahead
# at 8 tiles (b1024: 5.35 vs map 5.95 us/t) and map ahead at 16
# (b2048: map 5.72 vs unroll 6.06) -- program size catches up with the
# unrolled chain somewhere between
_UNROLL_MAX_TILES = 8


def _auto_batch_tile(plan: NttPlan, batch: int,
                     allow_pad: bool = False) -> int | None:
    """Measured serving policy: the tile DeviceNtt(batch_tile="auto")
    applies for this plan/batch (None = run direct).  Non-divisible
    batches only tile when the caller opted into pad_to_tile."""
    pol = _AUTO_BATCH_POLICY[32 if plan.supports_u32_radix2 else 64]
    if pol and batch > pol[0] and (allow_pad or batch % pol[1] == 0):
        return pol[1]
    return None


class DeviceNtt:
    """Device-resident transform handle for serving pipelines.

    The top-level fwd_ntt/inv_ntt functions move data host<->device on
    every call -- fine for tests, wrong for production chains.  A
    DeviceNtt pins the plan's tables on device once and exposes jitted
    ops over device *reps* (tuples of uint32 jax arrays: 1 limb for
    q < 2^30, else a (lo, hi) pair), so NTT -> pointwise -> inverse
    chains never leave the chip.  Reps compose with jit/vmap/shard_map.

    >>> ctx = DeviceNtt(params)
    >>> fa, fb = ctx.fwd(ctx.from_host(a)), ctx.fwd(ctx.from_host(b))
    >>> c = ctx.to_host(ctx.inv(ctx.pointwise(fa, fb)))
    """

    def __init__(self, params_or_plan, lazy: bool = False,
                 batch_tile: "int | str | None" = "auto",
                 pad_to_tile: bool = False, tile_mode: str = "unroll"):
        """batch_tile: process large batches in tiles of this many rows.
        Per-transform time is strongly batch-dependent (XLA keeps stage
        intermediates VMEM-resident below ~32MB working sets, docs/PERF.md);
        tiling recovers most of the small-batch rate for large serving
        batches.  "auto" (default) applies the measured policy
        (_auto_batch_tile): u64 batches > 512 run as 128-row tiles
        (measured u64 N=2^14 b1024: direct 8.5-8.8 us/t, lax.map 6.0-6.1,
        unrolled 5.6-5.8 -- artifacts/BATCH_LAB_r04.log); the u32 path
        never tiles (measured 49% slower).  None disables tiling; an int
        forces that tile.  Batches that are <= the tile or not divisible
        by it fall back to the direct (untiled) program -- correct but
        measurably slower for large batches, so size serving batches as a
        multiple of the tile.

        tile_mode: "unroll" (default; statically unrolled tile chain,
        measured faster and run-to-run stabler than lax.map) or "map"
        (lax.map; smaller programs, used automatically beyond
        _UNROLL_MAX_TILES tiles to bound compile size).

        pad_to_tile: instead of that fallback, zero-pad non-divisible
        batches > the tile up to the next multiple, run tiled, and slice
        the pad off -- worthwhile when the pad fraction is smaller than
        the direct path's per-row penalty (e.g. batch 1000 -> 1024), a
        loss when padding nearly doubles the work (batch 130 -> 256);
        explicit opt-in so the cost model stays in the caller's hands."""
        self.plan = _resolve(params_or_plan)
        self._batch_tile = batch_tile
        self._tile_mode = tile_mode
        self._pad_to_tile = pad_to_tile
        plan = self.plan
        self.ops = U32Ops if plan.supports_u32_radix2 else U64Ops
        self._n1_log = sixstep.default_split(
            plan.n, nlimb=1 if plan.supports_u32_radix2 else 2)
        word = 32 if self.ops is U32Ops else 64
        ninv_con = plan.n_inv_con32 if word == 32 else plan.n_inv_con
        f_tmp, f_con = radix2._final_mulop(
            plan.params.n_inv, ninv_con, int(plan.w_inv[1]), plan.q, word
        )
        if self.ops is U32Ops:
            w, wc, wi, wic = plan.dev_r2_u32
            self._w, self._wc = (w,), (wc,)
            self._wi, self._wic = (wi,), (wic,)
        else:
            self._w, self._wc, self._wi, self._wic = plan.dev_r2_u64
        self._rt_f = _stage_tabs(plan, self.ops.nlimb, False, self._n1_log)
        self._rt_i = _stage_tabs(plan, self.ops.nlimb, True, self._n1_log)
        self._fwd = _jit_fwd_sixstep(plan.q, lazy, self._n1_log, self.ops.nlimb)
        self._inv = _jit_inv_sixstep(
            plan.q, plan.params.n_inv, ninv_con, f_tmp, f_con, self._n1_log,
            self.ops.nlimb,
        )
        self._pointwise = _jit_pointwise(plan.q, self.ops.nlimb)
        self._tiled_cache: dict = {}

    # rep <-> host
    def from_host(self, a) -> tuple:
        return self.ops.from_host(np.asarray(a, dtype=np.uint64))

    def to_host(self, rep) -> np.ndarray:
        return self.ops.to_host(rep)

    def _resolve_tile(self, batch: int) -> int | None:
        """The tile to use for this batch: the forced int, the measured
        auto policy, or None (direct)."""
        t = self._batch_tile
        if t == "auto":
            t = _auto_batch_tile(self.plan, batch,
                                 allow_pad=self._pad_to_tile)
        if not t or batch <= t:
            return None
        return t

    def _make_tiled(self, core, tile: int, key):
        """Tiled program for `core`, cached per (core key, tile, mode).
        Mode "unroll" chains the tiles as a statically unrolled Python
        loop (measured faster and stabler than lax.map at serving
        batches, artifacts/BATCH_LAB_r04.log); beyond _UNROLL_MAX_TILES
        tiles it falls back to lax.map to bound program size."""
        cache_key = (key, tile)
        if cache_key in self._tiled_cache:
            return self._tiled_cache[cache_key]
        nlimb = self.ops.nlimb

        def run(*flat):
            rep = flat[:nlimb]
            tabs = flat[nlimb:]
            batch = rep[0].shape[0]
            nt = batch // tile
            if self._tile_mode == "unroll" and nt <= _UNROLL_MAX_TILES:
                outs = [
                    core(*(l[i * tile:(i + 1) * tile] for l in rep), *tabs)
                    for i in range(nt)
                ]
                return tuple(jnp.concatenate(ls, axis=0)
                             for ls in zip(*outs))
            shaped = tuple(l.reshape((nt, tile) + l.shape[1:]) for l in rep)
            out = jax.lax.map(lambda t: core(*t, *tabs), shaped)
            return tuple(l.reshape((batch,) + l.shape[2:]) for l in out)

        fn = jax.jit(run)
        self._tiled_cache[cache_key] = fn
        return fn

    def _maybe_pad(self, rep, tile):
        """(padded rep, original batch) when pad_to_tile applies to this
        rep's batch, else (rep, None).  Zero rows are valid lazy inputs;
        callers slice the pad off the output."""
        if (not tile or not self._pad_to_tile or rep[0].ndim < 2
                or rep[0].shape[0] <= tile or rep[0].shape[0] % tile == 0):
            return rep, None
        batch = rep[0].shape[0]
        pad = tile - batch % tile
        return tuple(
            jnp.concatenate([l, jnp.zeros((pad,) + l.shape[1:], l.dtype)])
            for l in rep
        ), batch

    def _dispatch(self, fn, key, rep, tabs1, tabs2, row_tabs):
        tile = self._resolve_tile(rep[0].shape[0]) if rep[0].ndim >= 2 else None
        if not tile:
            return fn(*rep, *tabs1, *tabs2, row_tabs)
        rep2, batch = self._maybe_pad(rep, tile)
        if rep2[0].shape[0] % tile:  # non-divisible, pad_to_tile off
            return fn(*rep, *tabs1, *tabs2, row_tabs)
        tiled_fn = self._make_tiled(fn, tile, key)
        out = tiled_fn(*rep2, *tabs1, *tabs2, row_tabs)
        return out if batch is None else tuple(l[:batch] for l in out)

    # device ops (rep -> rep, all jitted+cached)
    def fwd(self, rep) -> tuple:
        return self._dispatch(self._fwd, "fwd", rep, self._w,
                              self._wc, self._rt_f)

    def inv(self, rep) -> tuple:
        return self._dispatch(self._inv, "inv", rep, self._wi,
                              self._wic, self._rt_i)

    def pointwise(self, rep_a, rep_b) -> tuple:
        return self._pointwise(rep_a, rep_b)

    def negacyclic(self, rep_a, rep_b) -> tuple:
        """Full product, one chained device program (no host hops).  With
        pad_to_tile, a non-divisible batch is padded ONCE here and sliced
        once at the end.

        When batch tiling engages, the whole chain runs PER TILE
        (fwd a, fwd b, pointwise, inv) with ONE final concatenate --
        the round-4 lab localized the tiled path's residual overhead to
        the full-batch output concatenate (b1024 u64 fwd: 4.99 us/t
        without it vs 5.74 with, artifacts/BATCH_LAB2_r04.log), so
        chaining per tile pays that cost once instead of three times."""
        tile = (self._resolve_tile(rep_a[0].shape[0])
                if rep_a[0].ndim >= 2 else None)
        rep_a, batch = self._maybe_pad(rep_a, tile)
        rep_b, _ = self._maybe_pad(rep_b, tile)
        if tile and rep_a[0].shape[0] % tile == 0:
            out = self._tiled_negacyclic(tile)(
                *rep_a, *rep_b, self._w, self._wc, self._wi, self._wic,
                self._rt_f, self._rt_i,
            )
        else:
            out = self.inv(self.pointwise(self.fwd(rep_a), self.fwd(rep_b)))
        if batch is not None:
            out = tuple(l[:batch] for l in out)
        return out

    def _tiled_negacyclic(self, tile: int):
        key = ("negacyclic", tile)
        if key in self._tiled_cache:
            return self._tiled_cache[key]
        nlimb = self.ops.nlimb
        fwd, inv, pw = self._fwd, self._inv, self._pointwise

        def chain_one(ta, tb, w, wc, wi, wic, rt_f, rt_i):
            fa = fwd(*ta, *w, *wc, rt_f)
            fb = fwd(*tb, *w, *wc, rt_f)
            return inv(*pw(fa, fb), *wi, *wic, rt_i)

        def run(*flat):
            ra = flat[:nlimb]
            rb = flat[nlimb : 2 * nlimb]
            w, wc, wi, wic, rt_f, rt_i = flat[2 * nlimb :]
            nt = ra[0].shape[0] // tile
            cut = lambda rep, i: tuple(
                l[i * tile:(i + 1) * tile] for l in rep)
            if self._tile_mode == "unroll" and nt <= _UNROLL_MAX_TILES:
                outs = [
                    chain_one(cut(ra, i), cut(rb, i), w, wc, wi, wic,
                              rt_f, rt_i)
                    for i in range(nt)
                ]
                return tuple(jnp.concatenate(ls, axis=0)
                             for ls in zip(*outs))
            shape_t = lambda rep: tuple(
                l.reshape((nt, tile) + l.shape[1:]) for l in rep)
            out = jax.lax.map(
                lambda t: chain_one(t[0], t[1], w, wc, wi, wic, rt_f, rt_i),
                (shape_t(ra), shape_t(rb)),
            )
            batch = ra[0].shape[0]
            return tuple(l.reshape((batch,) + l.shape[2:]) for l in out)

        fn = jax.jit(run)
        self._tiled_cache[key] = fn
        return fn


# ---------------------------------------------------------------------------
# top-level dispatch
# ---------------------------------------------------------------------------


def _resolve(params_or_plan) -> NttPlan:
    if isinstance(params_or_plan, NttPlan):
        return params_or_plan
    if isinstance(params_or_plan, NttParams):
        return get_plan(params_or_plan)
    raise TypeError(type(params_or_plan))


# The auto-dispatch decision surface, measured on the v5e by
# tools/auto_sweep.py (artifact: artifacts/AUTO_SWEEP_r03.json;
# tests/test_auto_variant.py pins this table against the recorded sweep,
# the TPU analog of the reference's per-variant bench tables its README
# points users at, README.md:61-67).  Keyed by limb width (the plan's
# supports_u32_radix2 split); each row is (max_m, variant) and the first
# row with m <= max_m wins (None = unbounded tail).
_AUTO_TABLE: dict[str, dict[int, tuple]] = {
    # direction -> width -> ((max_m, variant), ...) rows, first legal row
    # whose max_m admits the plan wins; None = no size cap.
    "fwd": {
        32: ((8, "radix4-u32"), (None, "sixstep")),
        64: ((8, "radix2"), (None, "sixstep")),
    },
    "inv": {
        32: ((None, "sixstep"),),
        64: ((None, "sixstep"),),
    },
}


# Large-N routing to the two-level recursive six-step, measured round 5
# against the production TABS-enabled flat kernel (REC_LAB_TABS*_r05,
# interleaved direct@128 controls).  The driver is BATCH: the flat
# six-step gets its vector width from the batch dim, rec's inner levels
# are batch-independent (lanes come from the N2 axis).  Measured cells:
#   b=1: rec wins m18 both widths (1.12x), m20 u32 (1.8x: 112 vs 201),
#        m22 u32 (1.7x: 427-499 vs 785-840), m24 both (u32 4.73 vs 4.42-
#        5.07 balanced-flat; u64 18.6-18.8 vs 19.8-20.9); m20/m22 u64 tie.
#   b=8: tabs-flat wins every cell EXCEPT m16 u32 (rec 7.1 vs 8.3).
#   b=128: flat keeps the m14/m16 serving headline (5.4/4.9 vs 7.1/6.3).
# Policy: m >= _AUTO_REC_MIN_M always routes rec (fastest-or-tied at b1
# at both widths; batches there mean >=0.5 GB inputs and are unmeasured
# -- stated assumption).  m 16..22 routes rec only up to the per-width
# row caps below: caps 8 are measured b8 wins, caps 2 mark b1-only wins
# (flat retakes by b8), caps 4 interpolate where b1 wins were >=1.7x.
# Unknown batch (rows=None) keeps the flat winners.
_AUTO_REC_MIN_M = 23
_AUTO_REC_ROW_CAP: dict[int, dict[int, int]] = {
    32: {16: 8, 17: 8, 18: 2, 19: 4, 20: 4, 21: 4, 22: 4},
    64: {18: 2, 19: 2, 20: 2, 21: 2, 22: 2},
}


def _auto_variant(plan: NttPlan, inverse: bool = False,
                  rows: int | None = None) -> str:
    """Measured-fastest path for this (direction, q-width, N[, batch]):
    table-driven from the calibrated v5e sweeps (_AUTO_TABLE; see README
    'Performance').  The six-step kernel with the measured N2=64 split
    wins at both modulus widths for the serving sizes (q62 N=2^14: 4.72
    us/t vs 8.06 flat radix-2, AUTO_SWEEP_r04.json); the small-N tail
    flips per direction: at N=2^8 the flat kernels beat the split
    overhead on the FORWARD only (q27 radix-4 0.0156 vs 0.0183 us/t, q62
    radix-2 0.0849 vs 0.0915), while the inverse six-step wins even there
    (q27 0.0159 vs radix-4 0.0175; q62 0.0712 vs radix-2 0.0914 -- its
    fused final stage amortizes the split cost).  Large N routes to the
    two-level recursive six-step (_AUTO_REC_MIN_M above).  A table row
    whose variant cannot admit the plan's q (radix-4's 8q lazy bound caps
    it below the limb path's own bound) falls through to the next row."""
    width = 32 if plan.supports_u32_radix2 else 64
    m = plan.params.m
    if m >= _AUTO_REC_MIN_M:
        return "sixstep-rec"
    cap = _AUTO_REC_ROW_CAP[width].get(m)
    if cap is not None and rows is not None and rows <= cap:
        return "sixstep-rec"
    qb = plan.q.bit_length()
    for max_m, name in _AUTO_TABLE["inv" if inverse else "fwd"][width]:
        if max_m is None or m <= max_m:
            if qb <= get_variant(name).max_q_bits:
                return name
    return "sixstep"


def _plan_device_handle(plan: NttPlan, lazy: bool = False) -> "DeviceNtt":
    """Per-plan cached DeviceNtt (auto tiling policy) backing the host
    API's serving-batch routing; one handle per laziness (the lazy handle
    keeps the documented lazy output bound through the tiled program)."""
    key = "_devntt_auto_lazy" if lazy else "_devntt_auto"
    if key not in plan.__dict__:
        plan.__dict__[key] = DeviceNtt(plan, lazy=lazy)
    return plan.__dict__[key]


def _auto_tile_rows(plan: NttPlan, a: np.ndarray) -> int | None:
    """Serving-batch routing for the host API: the total row count when the
    measured tiling policy applies to `a` (any stack of leading batch dims
    counts -- a (2, 1024, N) input is 2048 serving rows), else None."""
    if a.ndim < 2:
        return None
    rows = int(np.prod(a.shape[:-1]))
    return rows if _auto_batch_tile(plan, rows) else None


def fwd_ntt(a, params_or_plan, variant: str = "auto", lazy: bool = False):
    """Forward negacyclic NTT.  a: uint64 array (..., N), values in [0, q)
    (or the variant's documented lazy input bound).  Returns uint64.

    variant="auto" is batch-aware: past the measured u64 serving-batch
    cliff (batch > 512, artifacts/BATCH_LAB_r04.log) the six-step runs as
    unrolled 128-row tiles via the plan's DeviceNtt handle (bit-exact with
    the direct program; b1024 measured 8.5-8.8 us/t direct vs 5.6-5.8
    tiled).  Any stack of leading dims counts toward the batch -- a
    (2, 1024, N) input is 2048 serving rows -- and lazy callers route
    through a lazy-configured handle (same tiling, lazy output bound)."""
    plan = _resolve(params_or_plan)
    a = np.asarray(a, dtype=np.uint64)
    assert a.shape[-1] == plan.n, f"last dim {a.shape[-1]} != N {plan.n}"
    batch_rows = int(np.prod(a.shape[:-1])) if a.ndim > 1 else 1
    name = (_auto_variant(plan, rows=batch_rows) if variant == "auto"
            else variant)
    v = get_variant(name)
    if plan.q.bit_length() > v.max_q_bits:
        raise ValueError(
            f"variant {name} supports q < 2^{v.max_q_bits}, got {plan.q.bit_length()}-bit q"
        )
    if variant == "auto" and name == "sixstep":
        rows = _auto_tile_rows(plan, a)
        if rows:
            ctx = _plan_device_handle(plan, lazy)
            out = ctx.to_host(ctx.fwd(ctx.from_host(a.reshape(rows, plan.n))))
            return out.reshape(a.shape)
    return v.fwd(plan, a, lazy)


@functools.lru_cache(maxsize=None)
def _jit_pointwise(q: int, nlimb: int):
    if nlimb == 1:
        return jax.jit(lambda a, b: (mm.mul_mod_q32(a[0], b[0], q),))

    def core(alo, ahi, blo, bhi):
        return mm.mul_mod_q((alo, ahi), (blo, bhi), q)

    return jax.jit(lambda a, b: core(*a, *b))


def pointwise_mul(a, b, params_or_plan):
    """Element-wise (a * b) mod q for uint64 arrays of values in [0, q):
    the NTT-domain product step of a negacyclic polynomial multiply."""
    plan = _resolve(params_or_plan)
    ops = U32Ops if plan.supports_u32_radix2 else U64Ops
    fn = _jit_pointwise(plan.q, ops.nlimb)
    return ops.to_host(fn(ops.from_host(np.asarray(a, dtype=np.uint64)),
                          ops.from_host(np.asarray(b, dtype=np.uint64))))


@functools.lru_cache(maxsize=None)
def _jit_polymul(q: int, n_inv_op: int, n_inv_con: int, f_tmp: int,
                 f_con: int, n1_log, nlimb: int):
    """Whole negacyclic product in ONE jit: fwd both inputs (six-step,
    output kept in the transposed layout), pointwise mul_mod, inverse
    consuming the transposed layout directly -- no intermediate host
    round-trips and no order-fixing transposes at all."""
    ops = U32Ops if nlimb == 1 else U64Ops

    def core(*flat):
        a = flat[:nlimb]
        b = flat[nlimb : 2 * nlimb]
        w = flat[2 * nlimb : 3 * nlimb]
        wc = flat[3 * nlimb : 4 * nlimb]
        wi = flat[4 * nlimb : 5 * nlimb]
        wic = flat[5 * nlimb :]
        fa = sixstep.fwd_sixstep(a, ops, w, wc, q, n1_log, strict=True,
                                 keep_transposed=True)
        fb = sixstep.fwd_sixstep(b, ops, w, wc, q, n1_log, strict=True,
                                 keep_transposed=True)
        fc = ops.mul_mod(fa, fb, q)
        return sixstep.inv_sixstep(
            fc, ops, wi, wic, n_inv_op, n_inv_con, f_tmp, f_con, q, n1_log,
            input_transposed=True,
        )

    return jax.jit(core)


def negacyclic_mul(a, b, params_or_plan, variant: str = "auto",
                   fused: bool = True):
    """Polynomial product in R_q[X]/(X^N + 1): NTT -> pointwise -> inverse
    NTT.  This is the workload the reference's kernels exist to serve
    (README.md:3-4).

    fused=True (default) runs the whole product in one jitted device
    program with the NTT-domain intermediates left in the six-step
    transposed layout (the unordered contract's payoff: no order-fixing
    transposes, no host round-trips); the fused pipeline is always the
    six-step kernel, so requesting any other variant composes the public
    per-step APIs through that variant instead."""
    plan = _resolve(params_or_plan)
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    rows = int(np.prod(a.shape[:-1])) if a.ndim > 1 else 1
    if variant == "auto" and _auto_variant(plan, rows=rows) == "sixstep-rec":
        # huge-N / batch-starved: route the whole product through the
        # recursive programs instead of the flat fused polymul
        variant = "sixstep-rec"
    if variant not in ("auto", "sixstep"):
        fused = False
    if not fused:
        fa = fwd_ntt(a, plan, variant)
        fb = fwd_ntt(b, plan, variant)
        return inv_ntt(pointwise_mul(fa, fb, plan), plan, variant)

    n1_log = sixstep.default_split(plan.n)
    if plan.supports_u32_radix2:
        ops = U32Ops
        w, wc, wi, wic = plan.dev_r2_u32
        w_rep, wc_rep, wi_rep, wic_rep = (w,), (wc,), (wi,), (wic,)
        ninv_con, word = plan.n_inv_con32, 32
    else:
        ops = U64Ops
        w_rep, wc_rep, wi_rep, wic_rep = plan.dev_r2_u64
        ninv_con, word = plan.n_inv_con, 64
    f_tmp, f_con = radix2._final_mulop(
        plan.params.n_inv, ninv_con, int(plan.w_inv[1]), plan.q, word
    )
    fn = _jit_polymul(
        plan.q, plan.params.n_inv, ninv_con, f_tmp, f_con, n1_log, ops.nlimb
    )
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    return ops.to_host(
        fn(*ops.from_host(a), *ops.from_host(b),
           *w_rep, *wc_rep, *wi_rep, *wic_rep)
    )


def fwd_ntt_dbl(a, b, params_or_plan, variant: str = "auto", lazy: bool = False):
    """Transform two independent polynomials in one fused call -- the
    generalization of the reference's `_dbl` interleaved variants
    (src/ntt_reference.c:71-91); arbitrary batches go through fwd_ntt's
    leading dims directly."""
    out = fwd_ntt(
        np.stack([np.asarray(a), np.asarray(b)]), params_or_plan, variant, lazy
    )
    return out[0], out[1]


def inv_ntt(a, params_or_plan, variant: str = "auto"):
    """Inverse negacyclic NTT (strict output in [0, q))."""
    plan = _resolve(params_or_plan)
    a = np.asarray(a, dtype=np.uint64)
    assert a.shape[-1] == plan.n
    batch_rows = int(np.prod(a.shape[:-1])) if a.ndim > 1 else 1
    name = (_auto_variant(plan, inverse=True, rows=batch_rows)
            if variant == "auto" else variant)
    v = get_variant(name)
    if v.inv is None:
        raise ValueError(f"variant {name} has no inverse kernel")
    if plan.q.bit_length() > v.max_q_bits:
        raise ValueError(
            f"variant {name} supports q < 2^{v.max_q_bits}, got {plan.q.bit_length()}-bit q"
        )
    if variant == "auto" and name == "sixstep":
        rows = _auto_tile_rows(plan, a)
        if rows:
            ctx = _plan_device_handle(plan)
            out = ctx.to_host(ctx.inv(ctx.from_host(a.reshape(rows, plan.n))))
            return out.reshape(a.shape)
    return v.inv(plan, a)
