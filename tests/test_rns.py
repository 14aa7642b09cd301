"""RNS tower layer: CRT encode/decode exactness and the end-to-end
big-int polynomial product (the HE ciphertext-multiply shape)."""

import numpy as np
import pytest

from ntt_tpu.rns import RnsTower

from conftest import make_input


@pytest.fixture(scope="module")
def tower():
    return RnsTower(m=6, q_bits=(29, 29, 30))


def test_distinct_moduli(tower):
    assert len(set(tower.moduli)) == 3
    for p in tower.params:
        assert (p.q - 1) % (1 << (p.m + 1)) == 0  # 2N-th roots exist


def test_crt_roundtrip(tower, rng):
    big_q = tower.modulus_product
    coeffs = np.array(
        [int(x) % big_q for x in rng.integers(0, 1 << 63, tower.n, dtype=np.uint64)],
        dtype=object,
    )
    ch = tower.encode(coeffs)
    back = tower.decode(ch)
    assert (back == coeffs).all()


def test_channel_fwd_inv(tower, rng):
    a = np.stack([make_input(rng, tower.n, p.q) for p in tower.params])
    f = tower.fwd(a)
    back = tower.inv(f)
    np.testing.assert_array_equal(back, a)


def test_bigint_negacyclic_mul(tower, rng):
    """Big-int product in R_Q[X]/(X^N+1), Q = prod(moduli) (~88 bits):
    exact against a schoolbook big-int oracle."""
    n = tower.n
    big_q = tower.modulus_product
    a = np.array([int(x) for x in rng.integers(0, 1 << 40, n, dtype=np.uint64)],
                 dtype=object)
    b = np.array([int(x) for x in rng.integers(0, 1 << 40, n, dtype=np.uint64)],
                 dtype=object)
    got = tower.negacyclic_mul_bigint(a, b)
    acc = np.zeros(n, dtype=object)
    for i in range(n):
        for j in range(n):
            k = (i + j) % n
            s = 1 if i + j < n else -1
            acc[k] = (acc[k] + s * int(a[i]) * int(b[j])) % big_q
    assert (got == acc).all()


@pytest.fixture(scope="module")
def dev_tower():
    from ntt_tpu.rns import DeviceRnsTower

    return DeviceRnsTower(m=6, q_bits=(29, 29, 30))


def test_device_tower_matches_host_tower(dev_tower, rng):
    """DeviceRnsTower.negacyclic (device-resident reps, one host hop) is
    bit-identical to the host-facing RnsTower channel pipeline."""
    host = RnsTower(m=6, params=dev_tower.params)
    ch_a = np.stack([make_input(rng, dev_tower.n, p.q, batch=3)
                     for p in dev_tower.params])
    ch_b = np.stack([make_input(rng, dev_tower.n, p.q, batch=3)
                     for p in dev_tower.params])
    got = dev_tower.negacyclic_mul(ch_a, ch_b)
    want = host.negacyclic_mul(ch_a, ch_b)
    np.testing.assert_array_equal(got, want)


def test_device_tower_rep_chain(dev_tower, rng):
    """fwd_rep -> pointwise_rep -> inv_rep over device reps equals the
    fused negacyclic, and fwd/inv round-trips exactly."""
    ch = np.stack([make_input(rng, dev_tower.n, p.q, batch=2)
                   for p in dev_tower.params])
    reps = dev_tower.from_host(ch)
    back = dev_tower.to_host(dev_tower.inv_rep(dev_tower.fwd_rep(reps)))
    np.testing.assert_array_equal(back, ch)
    prod = dev_tower.to_host(
        dev_tower.inv_rep(dev_tower.pointwise_rep(
            dev_tower.fwd_rep(reps), dev_tower.fwd_rep(reps)))
    )
    np.testing.assert_array_equal(prod, dev_tower.negacyclic_mul(ch, ch))


def test_device_tower_bigint(dev_tower, rng):
    """End-to-end big-int product through the device-resident tower."""
    n = dev_tower.n
    a = np.array([int(x) for x in rng.integers(0, 1 << 40, n, dtype=np.uint64)],
                 dtype=object)
    b = np.array([int(x) for x in rng.integers(0, 1 << 40, n, dtype=np.uint64)],
                 dtype=object)
    host = RnsTower(m=6, params=dev_tower.params)
    got = dev_tower.negacyclic_mul_bigint(a, b)
    want = host.negacyclic_mul_bigint(a, b)
    assert (got == want).all()


def test_encode_object_and_native_agree(tower, rng):
    """The vectorized uint64 encode path == the big-int object path."""
    vals = rng.integers(0, 1 << 62, size=(2, tower.n), dtype=np.uint64)
    as_obj = np.array([[int(v) for v in row] for row in vals], dtype=object)
    np.testing.assert_array_equal(tower.encode(vals), tower.encode(as_obj))
