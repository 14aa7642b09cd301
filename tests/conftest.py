"""Test configuration: run JAX on CPU with 8 virtual devices.

Mirrors the driver's multi-chip dry-run setup: sharded six-step tests run
on a virtual CPU mesh (no TPU pod needed), per the project instructions.
Must run before jax initializes any backend, hence the env mutation at
import time.
"""

import os

# Note: this image's sitecustomize force-registers the axon TPU plugin and
# JAX_PLATFORMS=axon; the env var alone is NOT enough to select CPU.  Use
# jax.config.update before any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is dominated by XLA:CPU compiles
# (one per (q, m, variant) triple); cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_ntt_tpu_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from ntt_tpu import params as params_mod  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xD1CE)


def make_input(rng, n, q, batch=None):
    """Reproducible random coefficient vector(s) in [0, q) as uint64."""
    shape = (n,) if batch is None else (batch, n)
    # generate 64-bit randomness then reduce mod q (test input distribution
    # matches the reference's rand() % q, tests/utils.h:12-17, but seeded)
    raw = rng.integers(0, 1 << 63, size=shape, dtype=np.uint64)
    return raw % np.uint64(q)


# Fixture subsets: "fast" covers the corner cases (smallest/largest q, odd
# and even m, every m mod 4 class); "all" is the full 19-case reference set.
FIXTURES_ALL = list(params_mod.FIXTURES)
FIXTURES_FAST = [
    params_mod.FIXTURES[0],   # m=8,  q 13-bit (even m)
    params_mod.FIXTURES[1],   # m=9,  q 17-bit (odd m, rem1)
    params_mod.FIXTURES[2],   # m=10, (rem2)
    params_mod.FIXTURES[3],   # m=11, (rem3)
    params_mod.FIXTURES[9],   # m=14, q 29-bit (u32-path boundary)
    params_mod.FIXTURES[13],  # m=14, q 51-bit
    params_mod.FIXTURES[15],  # m=15, q 51-bit odd m
]


def fixture_id(p):
    return f"q={p.q:#x},m={p.m}"
