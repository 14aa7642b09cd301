"""Variable x variable modular multiply + negacyclic polynomial product.

The mul_mod_q kernels are exhaustively property-tested against Python
big-int arithmetic (the analog of the reference's UBSAN coverage of its
hand-rolled 128-bit math); negacyclic_mul is pinned to the O(N^2)
schoolbook product in R_q[X]/(X^N + 1).
"""

import numpy as np
import pytest

from ntt_tpu import api
from ntt_tpu import modmath as mm
from ntt_tpu.params import NttParams

from conftest import FIXTURES_ALL, make_input


@pytest.mark.parametrize("q_bits", [13, 29])
def test_mul_mod_q32_property(q_bits, rng):
    q = int(NttParams.generate(q_bits, 8).q)
    vals = rng.integers(0, q, size=(2, 4096), dtype=np.uint64)
    edge = np.array([0, 1, q - 1, q // 2], dtype=np.uint64)
    a = np.concatenate([vals[0], edge, np.full(4, q - 1, dtype=np.uint64)])
    b = np.concatenate([vals[1], edge[::-1], np.full(4, q - 1, dtype=np.uint64)])
    import jax.numpy as jnp

    got = np.asarray(
        mm.mul_mod_q32(jnp.asarray(a.astype(np.uint32)),
                       jnp.asarray(b.astype(np.uint32)), q)
    ).astype(np.uint64)
    want = (a.astype(object) * b.astype(object)) % q
    np.testing.assert_array_equal(got, want.astype(np.uint64))


@pytest.mark.parametrize("q_bits", [13, 30, 31, 32, 33, 51, 62])
def test_mul_mod_q_u64_property(q_bits, rng):
    """Includes small q (13/30-bit): the u64 path must reduce the low
    product limb below q before accumulating (regression: the original
    ladder silently failed for q < 2^30)."""
    q = int(NttParams.generate(q_bits, 8).q)
    vals = rng.integers(0, q, size=(2, 4096), dtype=np.uint64)
    edge = np.array([0, 1, q - 1, q // 2, 1 << 32, (1 << 32) - 1], dtype=np.uint64)
    a = np.concatenate([vals[0], edge, np.full(4, q - 1, dtype=np.uint64)])
    b = np.concatenate([vals[1], edge[::-1], np.full(4, q - 1, dtype=np.uint64)])
    got = mm.to_u64(mm.mul_mod_q(mm.from_u64(a), mm.from_u64(b), q))
    want = (a.astype(object) * b.astype(object)) % q
    np.testing.assert_array_equal(got, want.astype(np.uint64))


def _schoolbook_negacyclic(a, b, q: int):
    n = a.shape[-1]
    c = np.zeros(n, dtype=object)
    ao = a.astype(object)
    bo = b.astype(object)
    for i in range(n):
        for j in range(n):
            k = i + j
            if k < n:
                c[k] = (c[k] + ao[i] * bo[j]) % q
            else:
                c[k - n] = (c[k - n] - ao[i] * bo[j]) % q
    return c.astype(np.uint64)


@pytest.mark.parametrize("p", [FIXTURES_ALL[0], FIXTURES_ALL[13]],
                         ids=lambda p: f"q={p.q:#x},m={p.m}")
def test_negacyclic_mul_schoolbook(p, rng):
    # keep N small for the O(N^2) oracle: use a fresh small-m instance at
    # the fixture's modulus family
    small = NttParams.generate(p.q.bit_length(), 6)
    a = make_input(rng, small.n, small.q)
    b = make_input(rng, small.n, small.q)
    got = api.negacyclic_mul(a, b, small)
    np.testing.assert_array_equal(got, _schoolbook_negacyclic(a, b, small.q))


@pytest.mark.parametrize("q_bits", [29, 51])
def test_negacyclic_mul_fused_vs_composed(q_bits, rng):
    """The fused one-jit product (transposed-layout intermediates) must
    equal the composed per-step public-API path exactly."""
    small = NttParams.generate(q_bits, 7)
    a = make_input(rng, small.n, small.q, batch=2)
    b = make_input(rng, small.n, small.q, batch=2)
    fused = api.negacyclic_mul(a, b, small, fused=True)
    composed = api.negacyclic_mul(a, b, small, fused=False)
    np.testing.assert_array_equal(fused, composed)
    for i in range(2):
        np.testing.assert_array_equal(
            fused[i], _schoolbook_negacyclic(a[i], b[i], small.q)
        )


@pytest.mark.parametrize("q_bits", [29, 51])
def test_device_ntt_serving_api(q_bits, rng):
    """DeviceNtt: whole chain on device reps, exact vs the host API."""
    small = NttParams.generate(q_bits, 7)
    ctx = api.DeviceNtt(small)
    a = make_input(rng, small.n, small.q, batch=2)
    b = make_input(rng, small.n, small.q, batch=2)
    ra, rb = ctx.from_host(a), ctx.from_host(b)
    fa = ctx.fwd(ra)
    np.testing.assert_array_equal(
        ctx.to_host(fa), api.fwd_ntt(a, small, variant="sixstep")
    )
    np.testing.assert_array_equal(ctx.to_host(ctx.inv(fa)), a)
    got = ctx.to_host(ctx.negacyclic(ra, rb))
    np.testing.assert_array_equal(got, api.negacyclic_mul(a, b, small))


def test_device_ntt_batch_tiled(rng):
    """DeviceNtt(batch_tile=K): lax.map-tiled large-batch path is exact
    and non-divisible/small batches fall back to the direct program."""
    small = NttParams.generate(29, 7)
    ctx = api.DeviceNtt(small, batch_tile=4)
    a = make_input(rng, small.n, small.q, batch=8)
    rep = ctx.from_host(a)
    want = api.fwd_ntt(a, small, variant="sixstep")
    np.testing.assert_array_equal(ctx.to_host(ctx.fwd(rep)), want)
    np.testing.assert_array_equal(ctx.to_host(ctx.inv(ctx.fwd(rep))), a)
    a3 = a[:3]  # non-divisible: direct path
    np.testing.assert_array_equal(
        ctx.to_host(ctx.fwd(ctx.from_host(a3))), want[:3]
    )


def test_device_ntt_pad_to_tile(rng):
    """DeviceNtt(pad_to_tile=True): non-divisible batches > the tile are
    zero-padded to the next multiple, run tiled, and sliced back -- exact
    vs the host API at a deliberately awkward batch."""
    small = NttParams.generate(29, 7)
    ctx = api.DeviceNtt(small, batch_tile=4, pad_to_tile=True)
    a = make_input(rng, small.n, small.q, batch=7)  # pads 7 -> 8
    rep = ctx.from_host(a)
    want = api.fwd_ntt(a, small, variant="sixstep")
    got = ctx.fwd(rep)
    assert got[0].shape[0] == 7  # pad sliced off
    np.testing.assert_array_equal(ctx.to_host(got), want)
    np.testing.assert_array_equal(ctx.to_host(ctx.inv(got)), a)
    a3 = a[:3]  # batch <= tile: still the direct program
    np.testing.assert_array_equal(
        ctx.to_host(ctx.fwd(ctx.from_host(a3))), want[:3]
    )


def test_negacyclic_mul_honors_variant(rng):
    """An explicit non-sixstep variant must route through the composed
    per-step path (regression: fused path used to ignore `variant`)."""
    small = NttParams.generate(27, 6)
    a = make_input(rng, small.n, small.q)
    b = make_input(rng, small.n, small.q)
    want = api.negacyclic_mul(a, b, small)
    got = api.negacyclic_mul(a, b, small, variant="mxu")
    np.testing.assert_array_equal(got, want)


def test_negacyclic_mul_batched(rng):
    small = NttParams.generate(29, 6)
    a = make_input(rng, small.n, small.q, batch=3)
    b = make_input(rng, small.n, small.q, batch=3)
    got = api.negacyclic_mul(a, b, small)
    for i in range(3):
        np.testing.assert_array_equal(
            got[i], _schoolbook_negacyclic(a[i], b[i], small.q)
        )


def test_device_ntt_tile_modes_bitexact(rng):
    """unroll-mode and map-mode tiled programs are bit-identical to the
    direct program (the serving default is unroll; beyond
    _UNROLL_MAX_TILES tiles unroll mode falls back to lax.map)."""
    small = NttParams.generate(29, 7)
    a = make_input(rng, small.n, small.q, batch=12)
    want = api.fwd_ntt(a, small, variant="sixstep")
    for mode in ("unroll", "map"):
        ctx = api.DeviceNtt(small, batch_tile=4, tile_mode=mode)
        got = ctx.to_host(ctx.fwd(ctx.from_host(a)))
        np.testing.assert_array_equal(got, want, err_msg=mode)
    # unroll beyond the cap silently uses lax.map: 12/1 = 12 tiles < 16,
    # so force the fallback with a tiny cap
    ctx = api.DeviceNtt(small, batch_tile=1, tile_mode="unroll")
    old = api._UNROLL_MAX_TILES
    try:
        api._UNROLL_MAX_TILES = 2
        got = ctx.to_host(ctx.fwd(ctx.from_host(a)))
    finally:
        api._UNROLL_MAX_TILES = old
    np.testing.assert_array_equal(got, want)


def test_auto_batch_tile_policy():
    """The measured serving policy (artifacts/BATCH_LAB_r04.log + round-5
    U32_SERVING_r05.json): u64 batches > 512 tile by 128; u32 batches >
    512 tile by 256 (the r3 'tiling loses 49%' held only at b256 -- at
    b1024 the 256-row chain wins 1.5-1.9x); non-divisible batches tile
    only with pad_to_tile."""
    from ntt_tpu.plan import get_plan

    p64 = get_plan(NttParams.generate(50, 14))
    p32 = get_plan(NttParams.generate(29, 14))
    assert api._auto_batch_tile(p64, 1024) == 128
    assert api._auto_batch_tile(p64, 512) is None      # at the threshold
    assert api._auto_batch_tile(p64, 2048) == 128
    assert api._auto_batch_tile(p64, 1000) is None     # non-divisible
    assert api._auto_batch_tile(p64, 1000, allow_pad=True) == 128
    assert api._auto_batch_tile(p32, 256) is None      # headline: direct
    assert api._auto_batch_tile(p32, 512) is None
    assert api._auto_batch_tile(p32, 4096) == 256
