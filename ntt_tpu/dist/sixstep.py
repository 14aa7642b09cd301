"""Distributed six-step NTT over a JAX device mesh (shard_map + all_to_all).

The reference library is strictly single-core (SURVEY.md section 2.6);
this module is the genuinely new scaling layer: one transform of size
N = N1*N2 spans the mesh axis.

Dataflow (mirrors kernels/sixstep.py exactly -- the phase functions are
shared, so the distributed transform is bit-exact with the single-chip
kernel and therefore with the golden radix-2 kernel):

  1. view (..., N1, N2), shard the N2 axis over mesh axis 'x';
  2. phase 1: column NTTs -- embarrassingly local (twiddles w[1:N1]
     replicated, identical for every i2);
  3. all_to_all transpose over ICI: (..., N1, N2/D) -> (..., N1/D, N2)
     -- the ONLY communication in the whole transform;
  4. phase 2: row stages, local, with each device slicing its
     [col0, col0 + N1/D) columns of the per-stage twiddle matrices;
  5. output left sharded over the N1 axis in natural (N1, N2) layout.

Batch parallelism (the HE-batch case, BASELINE.json configs[2]) is the
degenerate mode shard='batch': each device runs whole transforms locally.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ntt_tpu.kernels import radix2, sixstep
from ntt_tpu.kernels.elems import U32Ops, U64Ops, tmap
from ntt_tpu.params import NttParams
from ntt_tpu.plan import NttPlan, get_plan


def _as_plan(plan: "NttPlan | NttParams") -> NttPlan:
    """Accept NttParams everywhere a plan is taken, like api.fwd_ntt."""
    return get_plan(plan) if isinstance(plan, NttParams) else plan


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> None:
    """Initialize the JAX distributed runtime for a multi-host slice
    (call once per process before any mesh construction; on Cloud TPU
    pods the arguments auto-detect).  After this, jax.devices() spans the
    whole slice and every dist_* function here works unchanged -- lay the
    transform-sharding axis along ICI (devices within a host / torus
    ring) and keep the batch axis for DCN-crossing edges, since the
    six-step all_to_all is the only latency-critical collective."""
    jax.distributed.initialize(coordinator_address, num_processes, process_id)


def _global_rep(rep_host, mesh: Mesh, spec) -> tuple:
    """Host limb arrays -> jax Arrays for `mesh`.  Single-process: plain
    device arrays (jit shards them).  Multi-process (after
    init_multihost): build GLOBAL arrays -- every process holds the full
    host value (the test/demo contract; production feeds per-process
    shards the same way) and contributes its addressable shards."""
    if jax.process_count() == 1:
        return tuple(jnp.asarray(l) for l in rep_host)
    from jax.sharding import NamedSharding

    sh = NamedSharding(mesh, spec)
    return tuple(
        jax.make_array_from_callback(
            l.shape, sh, lambda idx, l=l: np.asarray(l)[idx]
        )
        for l in rep_host
    )


def _collect(out, ops) -> np.ndarray:
    """Global output rep -> full host uint64 array on every process."""
    if jax.process_count() == 1:
        return ops.to_host(out)
    from jax.experimental import multihost_utils

    gathered = tuple(
        multihost_utils.process_allgather(l, tiled=True) for l in out
    )
    return ops.to_host(gathered)


def _host_limbs(a: np.ndarray, ops) -> tuple:
    """uint64 host array -> host limb arrays matching ops' rep."""
    a = np.asarray(a, dtype=np.uint64)
    if ops.nlimb == 1:
        return (a.astype(np.uint32),)
    return (
        (a & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        (a >> np.uint64(32)).astype(np.uint32),
    )


def default_mesh(n_devices: int | None = None, axis: str = "x") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return jax.make_mesh((len(devs),), (axis,), devices=devs)


def mesh_2d(n_dp: int, n_sp: int, axes: tuple[str, str] = ("dp", "x")) -> Mesh:
    """2-D mesh: batch ('dp') axis x transform-sharding ('x') axis.  On a
    real slice the 'x' axis should map to an ICI ring (all_to_all rides
    ICI); 'dp' needs no communication at all."""
    devs = jax.devices()[: n_dp * n_sp]
    return jax.make_mesh((n_dp, n_sp), axes, devices=devs)


def _tables(plan: NttPlan, inverse: bool, mesh: Mesh | None = None):
    """(ops, w_rep, wc_rep) twiddle tables for the dist kernels.  On a
    multi-process runtime the tables are built as replicated GLOBAL arrays
    for `mesh`; single-process uses the plan's cached device tables."""
    if mesh is not None and jax.process_count() > 1:
        ops = U32Ops if plan.supports_u32_radix2 else U64Ops
        if plan.supports_u32_radix2:
            w_np = plan.w_inv if inverse else plan.w
            wc_np = plan.w_inv_con32 if inverse else plan.w_con32
        else:
            w_np = plan.w_inv if inverse else plan.w
            wc_np = plan.w_inv_con if inverse else plan.w_con
        w = _global_rep(_host_limbs(w_np, ops), mesh, P(None))
        wc = _global_rep(_host_limbs(wc_np, ops), mesh, P(None))
        return ops, w, wc
    if plan.supports_u32_radix2:
        w, wc, wi, wic = plan.dev_r2_u32
        return (U32Ops, (wi,), (wic,)) if inverse else (U32Ops, (w,), (wc,))
    (wlo, whi), (clo, chi), (ilo, ihi), (iclo, ichi) = plan.dev_r2_u64
    if inverse:
        return U64Ops, (ilo, ihi), (iclo, ichi)
    return U64Ops, (wlo, whi), (clo, chi)


def _dist_tabs(plan: NttPlan, n1_log: int, nlimb: int, inverse: bool,
               mesh: Mesh):
    """(row_tabs, col_tabs) pre-broadcast stage stacks for the dist
    kernels -- the round-5 fix for the tables-as-arguments codegen cliff
    (artifacts/PHASE_CONST_AB_r05.json: per-device phases 14-24x faster
    with pre-sliced stacks; the row stacks additionally shard their
    column axis over the mesh so each device holds exactly its slice).
    Multi-process runtimes fall back to in-program derivation (correct,
    slower) -- building process-global sharded stacks is future work."""
    if (jax.process_count() > 1 or
            os.environ.get("NTT_ROW_TABS", "1") == "0"):
        return None, None
    return (plan.dev_row_tabs(n1_log, nlimb, inverse),
            plan.dev_col_tabs(n1_log, nlimb, inverse))


# in_specs prefix for the (row_tabs, col_tabs) bundle: row stacks shard
# their trailing column axis over the transform axis; col stacks replicate
def _tabs_spec(axis: str):
    return (P(None, None, axis), P(None))


def _fwd_transpose_rows(a, ops, w, wc, q: int, n1: int, n2: int, ndev: int,
                        axis: str, n_chunks: int, strict: bool,
                        row_tabs=None):
    """Phase-1 output (..., N1, N2/D) -> all_to_all transpose + row stages
    -> transposed local layout (..., N2, N1/D).

    n_chunks > 1 splits the collective into column chunks: phase 2 is
    independent per column, so chunking is exact and -- on backends whose
    collectives lower to async start/done pairs (XLA:TPU) -- lets the
    latency-hiding scheduler overlap chunk c+1's collective with chunk c's
    compute (comm/compute overlap without a hand-rolled Pallas ring).
    XLA:CPU lowers all-to-all synchronously (zero async pairs in the
    scheduled HLO), so CPU-mesh timings exercise only the chunking's
    working-set effect -- measured evidence in docs/PERF.md ("Chunked
    comm/compute overlap") and artifacts/OVERLAP_STUDY_r03.log.
    Device d's output columns come from row-block d WITHIN each source
    shard, so a chunk slices inside each of the D local row-blocks (view
    rows as (D, N1/D) and cut the inner axis); chunk c then lands on
    contiguous global columns my_col0 + [c*cpc, (c+1)*cpc)."""

    group = sixstep.default_group(ops.nlimb)

    def transpose_and_rows(chunk, col0, ncols, tabs):
        chunk = tmap(
            lambda l: lax.all_to_all(l, axis, split_axis=l.ndim - 2,
                                     concat_axis=l.ndim - 1, tiled=True),
            chunk,
        )
        chunk = tmap(lambda l: jnp.swapaxes(l, -1, -2), chunk)
        return sixstep.fwd_phase2(chunk, ops, w, wc, q, n1, n2, col0, ncols,
                                  group=group, strict=strict, row_tabs=tabs)

    my_col0 = lax.axis_index(axis) * (n1 // ndev)
    if n_chunks == 1:
        return transpose_and_rows(a, my_col0, n1 // ndev, row_tabs)
    cpc = n1 // (ndev * n_chunks)  # columns per chunk

    def cut(l, c):
        lead = l.shape[:-2]
        v = l.reshape(lead + (ndev, n1 // ndev, l.shape[-1]))
        v = v[..., :, c * cpc : (c + 1) * cpc, :]
        return v.reshape(lead + (ndev * cpc, l.shape[-1]))

    def cut_tabs(c):
        # chunk c consumes local tab columns [c*cpc, (c+1)*cpc)
        if row_tabs is None:
            return None
        return tuple(
            tuple(tuple(l[:, :, c * cpc:(c + 1) * cpc] for l in rep)
                  for rep in stacks)
            for stacks in row_tabs
        )

    outs = [
        transpose_and_rows(tmap(lambda l, c=c: cut(l, c), a),
                           my_col0 + c * cpc, cpc, cut_tabs(c))
        for c in range(n_chunks)
    ]
    return tmap(lambda *ls: jnp.concatenate(ls, axis=-1), *outs)


def _inv_collect_phaseB(a, ops, w, wc, n_inv_op, n_inv_con, f_tmp, f_con,
                        q: int, n1: int, n2: int, ndev: int, axis: str,
                        n_chunks: int, col_tabs=None):
    """Post-phaseA data (..., N1/D, N2) -> inverse all_to_all -> column
    stages + fused n_inv final -> natural shard (..., N1, N2/D).

    The mirror of _fwd_transpose_rows: phaseB is independent per lane
    (column twiddles broadcast across lanes, the final n_inv stage is
    element-wise), so the inverse collective chunks along the output lane
    axis -- a chunk slices the inner axis of the N2 dim viewed (D, N2/D),
    landing on contiguous local output lanes [c*cpc, (c+1)*cpc)."""

    group = sixstep.default_group(ops.nlimb)

    def collect_and_cols(chunk):
        chunk = tmap(
            lambda l: lax.all_to_all(l, axis, split_axis=l.ndim - 1,
                                     concat_axis=l.ndim - 2, tiled=True),
            chunk,
        )
        return sixstep.inv_phaseB(
            chunk, ops, w, wc, n_inv_op, n_inv_con, f_tmp, f_con, q, n1,
            chunk[0].shape[-1], group=group, col_tabs=col_tabs,
        )

    if n_chunks == 1:
        return collect_and_cols(a)
    cpc = n2 // (ndev * n_chunks)  # output lanes per chunk

    def cut(l, c):
        lead = l.shape[:-1]
        v = l.reshape(lead + (ndev, n2 // ndev))
        v = v[..., :, c * cpc : (c + 1) * cpc]
        return v.reshape(lead + (ndev * cpc,))

    outs = [
        collect_and_cols(tmap(lambda l, c=c: cut(l, c), a))
        for c in range(n_chunks)
    ]
    return tmap(lambda *ls: jnp.concatenate(ls, axis=-1), *outs)


@functools.lru_cache(maxsize=None)
def _jit_dist_fwd(q: int, n: int, n1_log: int, nlimb: int, ndev: int,
                  axis: str, strict: bool, mesh: Mesh,
                  batch_axis: str | None = None, n_chunks: int = 1):
    ops = U32Ops if nlimb == 1 else U64Ops
    logn = n.bit_length() - 1
    n1, n2 = 1 << n1_log, 1 << (logn - n1_log)
    assert n1 % ndev == 0 and n2 % ndev == 0, (
        f"N1={n1}, N2={n2} must both divide by mesh size {ndev}"
    )
    assert n1 % (ndev * n_chunks) == 0, (
        f"N1={n1} must divide by mesh*chunks = {ndev * n_chunks}"
    )

    def local_fn(*flat):
        a = flat[:nlimb]  # local (..., N1, N2/D)
        w = flat[nlimb : 2 * nlimb]
        wc = flat[2 * nlimb : 3 * nlimb]
        row_tabs, col_tabs = flat[3 * nlimb]
        a = sixstep.fwd_phase1(a, ops, w, wc, q, n1, n2 // ndev,
                               group=sixstep.default_group(ops.nlimb),
                               col_tabs=col_tabs)
        a = _fwd_transpose_rows(a, ops, w, wc, q, n1, n2, ndev, axis,
                                n_chunks, strict, row_tabs=row_tabs)
        return tmap(lambda l: jnp.swapaxes(l, -1, -2), a)  # (..., N1/D, N2)

    a_spec = P(batch_axis, None, axis)  # (batch[, dp-sharded], N1, N2-sharded)
    out_spec = P(batch_axis, axis, None)
    in_specs = tuple([a_spec] * nlimb + [P(None)] * (2 * nlimb)
                     + [_tabs_spec(axis)])
    fn = jax.shard_map(
        local_fn, mesh=mesh, in_specs=in_specs,
        out_specs=tuple([out_spec] * nlimb), check_vma=False,
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _jit_dist_inv(q: int, n: int, n1_log: int, nlimb: int, ndev: int,
                  axis: str, n_inv_op: int, n_inv_con: int, f_tmp: int,
                  f_con: int, mesh: Mesh, batch_axis: str | None = None,
                  n_chunks: int = 1):
    ops = U32Ops if nlimb == 1 else U64Ops
    logn = n.bit_length() - 1
    n1, n2 = 1 << n1_log, 1 << (logn - n1_log)
    assert n1 % ndev == 0 and n2 % ndev == 0, (
        f"N1={n1}, N2={n2} must both divide by mesh size {ndev}"
    )
    assert n2 % (ndev * n_chunks) == 0, (
        f"N2={n2} must divide by mesh*chunks = {ndev * n_chunks}"
    )

    def local_fn(*flat):
        a = flat[:nlimb]  # local (..., N1/D, N2), natural layout sharded on N1
        w = flat[nlimb : 2 * nlimb]
        wc = flat[2 * nlimb : 3 * nlimb]
        row_tabs, col_tabs = flat[3 * nlimb]
        a = tmap(lambda l: jnp.swapaxes(l, -1, -2), a)  # (..., N2, N1/D)
        col0 = lax.axis_index(axis) * (n1 // ndev)
        a = sixstep.inv_phaseA(a, ops, w, wc, q, n1, n2, col0, n1 // ndev,
                               group=sixstep.default_group(ops.nlimb),
                               row_tabs=row_tabs)
        a = tmap(lambda l: jnp.swapaxes(l, -1, -2), a)  # (..., N1/D, N2)
        return _inv_collect_phaseB(
            a, ops, w, wc, n_inv_op, n_inv_con, f_tmp, f_con, q, n1, n2,
            ndev, axis, n_chunks, col_tabs=col_tabs,
        )

    a_spec = P(batch_axis, axis, None)
    out_spec = P(batch_axis, None, axis)
    in_specs = tuple([a_spec] * nlimb + [P(None)] * (2 * nlimb)
                     + [_tabs_spec(axis)])
    fn = jax.shard_map(
        local_fn, mesh=mesh, in_specs=in_specs,
        out_specs=tuple([out_spec] * nlimb), check_vma=False,
    )
    return jax.jit(fn)


def dist_fwd_ntt(a: np.ndarray, plan: NttPlan, mesh: Mesh | None = None,
                 n1_log: int | None = None, lazy: bool = False,
                 axis: str = "x", batch_axis: str | None = None,
                 n_chunks: int = 1) -> np.ndarray:
    """Forward NTT of (..., N) uint64 with the transform sharded over mesh
    axis `axis`; with `batch_axis` set (2-D mesh from mesh_2d), the batch
    dim is simultaneously data-parallel over that axis.  Output order
    identical to the golden radix-2 kernel.  n_chunks > 1 splits the
    all_to_all into column chunks so the collective of chunk c+1 can
    overlap the row stages of chunk c (comm/compute overlap; exact)."""
    plan = _as_plan(plan)
    if mesh is None:
        mesh = default_mesh(axis=axis)
    ndev = mesh.shape[axis]
    n = plan.n
    logn = n.bit_length() - 1
    if n1_log is None:
        n1_log = max(
            sixstep.default_split(
                n, nlimb=1 if plan.supports_u32_radix2 else 2),
            (ndev - 1).bit_length(),
        )
    n1 = 1 << n1_log
    n2 = 1 << (logn - n1_log)

    ops, w, wc = _tables(plan, inverse=False, mesh=mesh)
    a = np.asarray(a, dtype=np.uint64)
    a3 = a.reshape((-1, n1, n2))
    rep = _global_rep(_host_limbs(a3, ops), mesh, P(batch_axis, None, axis))
    fn = _jit_dist_fwd(plan.q, n, n1_log, ops.nlimb, ndev, axis, not lazy,
                       mesh, batch_axis, n_chunks)
    out = fn(*rep, *w, *wc,
             _dist_tabs(plan, n1_log, ops.nlimb, False, mesh))
    return _collect(out, ops).reshape(a.shape)


def dist_inv_ntt(a: np.ndarray, plan: NttPlan, mesh: Mesh | None = None,
                 n1_log: int | None = None, axis: str = "x",
                 batch_axis: str | None = None, n_chunks: int = 1) -> np.ndarray:
    """Inverse NTT sharded over mesh axis `axis`.  n_chunks > 1 splits the
    inverse collective into output-lane chunks so chunk c+1's all_to_all
    overlaps chunk c's column stages (exact; mirror of dist_fwd_ntt)."""
    plan = _as_plan(plan)
    if mesh is None:
        mesh = default_mesh(axis=axis)
    ndev = mesh.shape[axis]
    n = plan.n
    logn = n.bit_length() - 1
    if n1_log is None:
        n1_log = max(
            sixstep.default_split(
                n, nlimb=1 if plan.supports_u32_radix2 else 2),
            (ndev - 1).bit_length(),
        )
    n1 = 1 << n1_log
    n2 = 1 << (logn - n1_log)

    ops, w, wc = _tables(plan, inverse=True, mesh=mesh)
    word = 32 if ops is U32Ops else 64
    ninv_con = plan.n_inv_con32 if word == 32 else plan.n_inv_con
    f_tmp, f_con = radix2._final_mulop(
        plan.params.n_inv, ninv_con, int(plan.w_inv[1]), plan.q, word
    )
    a = np.asarray(a, dtype=np.uint64)
    a3 = a.reshape((-1, n1, n2))
    rep = _global_rep(_host_limbs(a3, ops), mesh, P(batch_axis, axis, None))
    fn = _jit_dist_inv(
        plan.q, n, n1_log, ops.nlimb, ndev, axis,
        plan.params.n_inv, ninv_con, f_tmp, f_con, mesh, batch_axis, n_chunks,
    )
    out = fn(*rep, *w, *wc,
             _dist_tabs(plan, n1_log, ops.nlimb, True, mesh))
    return _collect(out, ops).reshape(a.shape)


# ---------------------------------------------------------------------------
# recursive-structured distributed transform (round 5)
# ---------------------------------------------------------------------------
#
# The flat dist phases above shard the flat kernel's column/row stages;
# at huge N the best SINGLE-chip program is the two-level recursive
# six-step (kernels/sixstep.fwd_rec), so the honest scaling baseline
# moved and the flat-phase dist left ~15-20% on the table (docs/PERF.md
# round 5).  This variant distributes the recursion's OUTER level: local
# size-N1 level transforms, ONE all_to_all (the same collective and the
# same bytes as the flat dist path), the factored gamma twist applied to
# the local rows (twist tables row-sharded via in_specs), local size-N2
# level transforms.  Bit-exact with the flat kernel; local work runs at
# the measured fast-regime rates.


def _rec_dist_args(plan: NttPlan, l1_log: int, inverse: bool, ops):
    """Device args for the rec dist kernels: level word tables, twist
    reps, per-level stage tabs, per-level n_inv constants."""
    from ntt_tpu import api

    pl1, pl2 = api._rec_level_plans(plan, l1_log)
    u32 = ops.nlimb == 1
    w1, w1c = api._rec_word_tabs(pl1, u32, inverse)
    w2, w2c = api._rec_word_tabs(pl2, u32, inverse)
    tw = api._rec_twist_reps(plan, l1_log, inverse, ops)
    word = 32 if u32 else 64

    def lvl_tabs(pl):
        nl = sixstep.default_split(pl.n, nlimb=ops.nlimb)
        if os.environ.get("NTT_ROW_TABS", "1") == "0":
            return (None, None)
        return (pl.dev_row_tabs(nl, ops.nlimb, inverse),
                pl.dev_col_tabs(nl, ops.nlimb, inverse))

    ninv = ((api._rec_ninv(pl1, word), api._rec_ninv(pl2, word))
            if inverse else None)
    return w1, w1c, w2, w2c, tw, (lvl_tabs(pl1), lvl_tabs(pl2)), ninv


def _twist_local(a, ops, tw, q: int, n2: int):
    """Factored twist on the local (..., nloc, N2) rows; tw reps are the
    axis-0 row-shards of the (N1, HI, 1)/(N1, 1, LO) tables."""
    tw_a, tw_ac, tw_b, tw_bc = tw
    hi = tw_a[0].shape[-2]
    lo = tw_b[0].shape[-1]
    lead = a[0].shape[:-2]
    nloc = a[0].shape[-2]
    v = tmap(lambda l: l.reshape(lead + (nloc, hi, lo)), a)
    v = ops.shoup_mul(tw_a, tw_ac, v, q)
    v = ops.shoup_mul(tw_b, tw_bc, v, q)
    return tmap(lambda l: l.reshape(lead + (nloc, n2)), v)


@functools.lru_cache(maxsize=None)
def _jit_dist_rec_fwd(q: int, n: int, l1_log: int, nlimb: int, ndev: int,
                      axis: str, strict: bool, mesh: Mesh,
                      batch_axis: str | None = None):
    ops = U32Ops if nlimb == 1 else U64Ops
    logn = n.bit_length() - 1
    n1, n2 = 1 << l1_log, 1 << (logn - l1_log)
    assert n1 % ndev == 0 and n2 % ndev == 0, (n1, n2, ndev)

    def local_fn(*flat):
        a = flat[:nlimb]  # local (..., N1, N2/D)
        w1 = flat[nlimb : 2 * nlimb]
        w1c = flat[2 * nlimb : 3 * nlimb]
        w2 = flat[3 * nlimb : 4 * nlimb]
        w2c = flat[4 * nlimb : 5 * nlimb]
        tw = flat[5 * nlimb]
        tabs1, tabs2 = flat[5 * nlimb + 1]
        # level 1: size-N1 transforms along the N1 axis, lanes = N2/D
        a = tmap(lambda l: jnp.swapaxes(l, -1, -2), a)
        a = sixstep.fwd_sixstep(a, ops, w1, w1c, q, strict=False,
                                row_tabs=tabs1[0], col_tabs=tabs1[1])
        a = tmap(lambda l: jnp.swapaxes(l, -1, -2), a)
        # the ONE collective: transpose to (..., N1/D, N2)
        a = tmap(
            lambda l: lax.all_to_all(l, axis, split_axis=l.ndim - 2,
                                     concat_axis=l.ndim - 1, tiled=True),
            a,
        )
        # twist the local rows (global k1 = idx*N1/D + r; tw row-sharded)
        a = _twist_local(a, ops, tw, q, n2)
        # level 2: plain size-N2 transforms of the twisted rows
        a = sixstep.fwd_sixstep(a, ops, w2, w2c, q, strict=strict,
                                row_tabs=tabs2[0], col_tabs=tabs2[1])
        return a  # (..., N1/D, N2) [k1-shard, k2] -- dist_fwd's layout

    a_spec = P(batch_axis, None, axis)
    out_spec = P(batch_axis, axis, None)
    in_specs = tuple([a_spec] * nlimb + [P(None)] * (4 * nlimb)
                     + [P(axis), P(None)])
    fn = jax.shard_map(
        local_fn, mesh=mesh, in_specs=in_specs,
        out_specs=tuple([out_spec] * nlimb), check_vma=False,
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _jit_dist_rec_inv(q: int, n: int, l1_log: int, nlimb: int, ndev: int,
                      axis: str, ninv1: tuple, ninv2: tuple, mesh: Mesh,
                      batch_axis: str | None = None):
    ops = U32Ops if nlimb == 1 else U64Ops
    logn = n.bit_length() - 1
    n1, n2 = 1 << l1_log, 1 << (logn - l1_log)
    assert n1 % ndev == 0 and n2 % ndev == 0, (n1, n2, ndev)

    def local_fn(*flat):
        a = flat[:nlimb]  # local (..., N1/D, N2) [k1-shard, k2]
        wi1 = flat[nlimb : 2 * nlimb]
        wi1c = flat[2 * nlimb : 3 * nlimb]
        wi2 = flat[3 * nlimb : 4 * nlimb]
        wi2c = flat[4 * nlimb : 5 * nlimb]
        twi = flat[5 * nlimb]
        tabs1, tabs2 = flat[5 * nlimb + 1]
        a = sixstep.inv_sixstep(a, ops, wi2, wi2c, *ninv2, q,
                                row_tabs=tabs2[0], col_tabs=tabs2[1])
        a = _twist_local(a, ops, twi, q, n2)  # un-twist, < 2q
        a = tmap(
            lambda l: lax.all_to_all(l, axis, split_axis=l.ndim - 1,
                                     concat_axis=l.ndim - 2, tiled=True),
            a,
        )  # (..., N1, N2/D)
        a = tmap(lambda l: jnp.swapaxes(l, -1, -2), a)
        a = sixstep.inv_sixstep(a, ops, wi1, wi1c, *ninv1, q,
                                row_tabs=tabs1[0], col_tabs=tabs1[1])
        return tmap(lambda l: jnp.swapaxes(l, -1, -2), a)

    a_spec = P(batch_axis, axis, None)
    out_spec = P(batch_axis, None, axis)
    in_specs = tuple([a_spec] * nlimb + [P(None)] * (4 * nlimb)
                     + [P(axis), P(None)])
    fn = jax.shard_map(
        local_fn, mesh=mesh, in_specs=in_specs,
        out_specs=tuple([out_spec] * nlimb), check_vma=False,
    )
    return jax.jit(fn)


def _rec_l1_for(plan: NttPlan, ndev: int) -> int:
    """Outer split for the rec dist path: balanced, sharding-divisible."""
    l1 = sixstep.rec_split(plan.params.m)
    return max(l1, (ndev - 1).bit_length())


def dist_rec_fwd_ntt(a: np.ndarray, plan: NttPlan, mesh: Mesh | None = None,
                     l1_log: int | None = None, lazy: bool = False,
                     axis: str = "x", batch_axis: str | None = None
                     ) -> np.ndarray:
    """Forward NTT sharded over `axis` with the RECURSIVE structure:
    local level transforms + one all_to_all + row-sharded twist.  Output
    bit-identical to dist_fwd_ntt / the golden radix-2 kernel."""
    plan = _as_plan(plan)
    if mesh is None:
        mesh = default_mesh(axis=axis)
    ndev = mesh.shape[axis]
    if l1_log is None:
        l1_log = _rec_l1_for(plan, ndev)
    n = plan.n
    n1, n2 = 1 << l1_log, n >> l1_log
    ops = U32Ops if plan.supports_u32_radix2 else U64Ops
    w1, w1c, w2, w2c, tw, tabs, _ = _rec_dist_args(plan, l1_log, False, ops)
    a = np.asarray(a, dtype=np.uint64)
    a3 = a.reshape((-1, n1, n2))
    rep = _global_rep(_host_limbs(a3, ops), mesh, P(batch_axis, None, axis))
    fn = _jit_dist_rec_fwd(plan.q, n, l1_log, ops.nlimb, ndev, axis,
                           not lazy, mesh, batch_axis)
    out = fn(*rep, *w1, *w1c, *w2, *w2c, tw, tabs)
    return _collect(out, ops).reshape(a.shape)


def dist_rec_inv_ntt(a: np.ndarray, plan: NttPlan, mesh: Mesh | None = None,
                     l1_log: int | None = None, axis: str = "x",
                     batch_axis: str | None = None) -> np.ndarray:
    """Inverse of dist_rec_fwd_ntt (strict output)."""
    plan = _as_plan(plan)
    if mesh is None:
        mesh = default_mesh(axis=axis)
    ndev = mesh.shape[axis]
    if l1_log is None:
        l1_log = _rec_l1_for(plan, ndev)
    n = plan.n
    n1, n2 = 1 << l1_log, n >> l1_log
    ops = U32Ops if plan.supports_u32_radix2 else U64Ops
    wi1, wi1c, wi2, wi2c, twi, tabs, ninv = _rec_dist_args(
        plan, l1_log, True, ops)
    a = np.asarray(a, dtype=np.uint64)
    a3 = a.reshape((-1, n1, n2))
    rep = _global_rep(_host_limbs(a3, ops), mesh, P(batch_axis, axis, None))
    fn = _jit_dist_rec_inv(plan.q, n, l1_log, ops.nlimb, ndev, axis,
                           ninv[0], ninv[1], mesh, batch_axis)
    out = fn(*rep, *wi1, *wi1c, *wi2, *wi2c, twi, tabs)
    return _collect(out, ops).reshape(a.shape)


@functools.lru_cache(maxsize=None)
def _jit_dist_polymul(q: int, n: int, n1_log: int, nlimb: int, ndev: int,
                      axis: str, n_inv_op: int, n_inv_con: int, f_tmp: int,
                      f_con: int, mesh: Mesh, batch_axis: str | None,
                      n_chunks: int = 1):
    ops = U32Ops if nlimb == 1 else U64Ops
    logn = n.bit_length() - 1
    n1, n2 = 1 << n1_log, 1 << (logn - n1_log)
    assert n1 % ndev == 0 and n2 % ndev == 0, (
        f"N1={n1}, N2={n2} must both divide by mesh size {ndev}"
    )
    assert n1 % (ndev * n_chunks) == 0 and n2 % (ndev * n_chunks) == 0, (
        f"N1={n1}, N2={n2} must divide by mesh*chunks = {ndev * n_chunks}"
    )

    def fwd_local(a, w, wc, tabs):
        """Forward phases, output LEFT in the transposed (..., N2, N1/D)
        layout -- pointwise products don't care about coefficient order
        (the unordered contract, at the distributed level)."""
        a = sixstep.fwd_phase1(a, ops, w, wc, q, n1, n2 // ndev,
                               group=sixstep.default_group(ops.nlimb),
                               col_tabs=tabs[1])
        return _fwd_transpose_rows(a, ops, w, wc, q, n1, n2, ndev, axis,
                                   n_chunks, strict=True, row_tabs=tabs[0])

    def local_fn(*flat):
        a = flat[:nlimb]
        b = flat[nlimb : 2 * nlimb]
        w = flat[2 * nlimb : 3 * nlimb]
        wc = flat[3 * nlimb : 4 * nlimb]
        wi = flat[4 * nlimb : 5 * nlimb]
        wic = flat[5 * nlimb : 6 * nlimb]
        tabs_f, tabs_i = flat[6 * nlimb]
        fc = ops.mul_mod(fwd_local(a, w, wc, tabs_f),
                         fwd_local(b, w, wc, tabs_f), q)
        # inverse starts exactly where the forward left off: phaseA consumes
        # the transposed layout directly (no transpose, no collective here)
        col0 = lax.axis_index(axis) * (n1 // ndev)
        fc = sixstep.inv_phaseA(fc, ops, wi, wic, q, n1, n2, col0,
                                n1 // ndev,
                                group=sixstep.default_group(ops.nlimb),
                                row_tabs=tabs_i[0])
        fc = tmap(lambda l: jnp.swapaxes(l, -1, -2), fc)
        return _inv_collect_phaseB(
            fc, ops, wi, wic, n_inv_op, n_inv_con, f_tmp, f_con, q, n1, n2,
            ndev, axis, n_chunks, col_tabs=tabs_i[1],
        )

    io_spec = P(batch_axis, None, axis)  # natural (batch, N1, N2-sharded)
    in_specs = tuple([io_spec] * (2 * nlimb) + [P(None)] * (4 * nlimb)
                     + [(_tabs_spec(axis), _tabs_spec(axis))])
    fn = jax.shard_map(
        local_fn, mesh=mesh, in_specs=in_specs,
        out_specs=tuple([io_spec] * nlimb), check_vma=False,
    )
    return jax.jit(fn)


def dist_negacyclic_mul(a: np.ndarray, b: np.ndarray, plan: NttPlan,
                        mesh: Mesh | None = None, n1_log: int | None = None,
                        axis: str = "x", batch_axis: str | None = None,
                        n_chunks: int = 1) -> np.ndarray:
    """Polynomial product in R_q[X]/(X^N+1) with every step sharded over
    the mesh: two forward transforms, the pointwise product, and the
    inverse run inside ONE shard_map/jit -- the NTT-domain intermediates
    stay in the transposed shard layout (never materializing standard
    order), so the whole pipeline costs exactly three all_to_all
    collectives and no other communication."""
    plan = _as_plan(plan)
    if mesh is None:
        mesh = default_mesh(axis=axis)
    ndev = mesh.shape[axis]
    n = plan.n
    logn = n.bit_length() - 1
    if n1_log is None:
        n1_log = max(
            sixstep.default_split(
                n, nlimb=1 if plan.supports_u32_radix2 else 2),
            (ndev - 1).bit_length(),
        )
    n1 = 1 << n1_log
    n2 = 1 << (logn - n1_log)

    ops, w, wc = _tables(plan, inverse=False, mesh=mesh)
    _, wi, wic = _tables(plan, inverse=True, mesh=mesh)
    word = 32 if ops is U32Ops else 64
    ninv_con = plan.n_inv_con32 if word == 32 else plan.n_inv_con
    f_tmp, f_con = radix2._final_mulop(
        plan.params.n_inv, ninv_con, int(plan.w_inv[1]), plan.q, word
    )
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    io_spec = P(batch_axis, None, axis)
    rep_a = _global_rep(_host_limbs(a.reshape((-1, n1, n2)), ops), mesh, io_spec)
    rep_b = _global_rep(_host_limbs(b.reshape((-1, n1, n2)), ops), mesh, io_spec)
    fn = _jit_dist_polymul(
        plan.q, n, n1_log, ops.nlimb, ndev, axis,
        plan.params.n_inv, ninv_con, f_tmp, f_con, mesh, batch_axis, n_chunks,
    )
    out = fn(*rep_a, *rep_b, *w, *wc, *wi, *wic,
             (_dist_tabs(plan, n1_log, ops.nlimb, False, mesh),
              _dist_tabs(plan, n1_log, ops.nlimb, True, mesh)))
    return _collect(out, ops).reshape(a.shape)


def batch_parallel_fwd(a: np.ndarray, plan: NttPlan, mesh: Mesh | None = None,
                       axis: str = "x", lazy: bool = False) -> np.ndarray:
    """HE-batch mode: shard the batch dim; each device runs whole fused
    six-step transforms locally (no collectives at all)."""
    plan = _as_plan(plan)
    if mesh is None:
        mesh = default_mesh(axis=axis)
    ops, w, wc = _tables(plan, inverse=False)
    a = np.asarray(a, dtype=np.uint64)
    assert a.ndim >= 2, "batch mode needs a leading batch dim"
    rep = ops.from_host(a)
    nlimb = ops.nlimb
    q, n = plan.q, plan.n

    n1_log = sixstep.default_split(n, nlimb=nlimb)

    def local_fn(*flat):
        ar = flat[:nlimb]
        w_ = flat[nlimb : 2 * nlimb]
        wc_ = flat[2 * nlimb : 3 * nlimb]
        row_tabs, col_tabs = flat[3 * nlimb]
        return sixstep.fwd_sixstep(ar, ops, w_, wc_, q, n1_log,
                                   strict=not lazy, row_tabs=row_tabs,
                                   col_tabs=col_tabs)

    # batch mode runs WHOLE local transforms: tabs replicate (full width)
    in_specs = tuple([P(axis)] * nlimb + [P(None)] * (2 * nlimb)
                     + [(P(None), P(None))])
    fn = jax.jit(
        jax.shard_map(
            local_fn, mesh=mesh, in_specs=in_specs,
            out_specs=tuple([P(axis)] * nlimb), check_vma=False,
        )
    )
    tabs = ((None, None) if jax.process_count() > 1
            else (plan.dev_row_tabs(n1_log, nlimb, False),
                  plan.dev_col_tabs(n1_log, nlimb, False)))
    return ops.to_host(fn(*rep, *w, *wc, tabs))
