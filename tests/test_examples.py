"""Smoke-test the shipped examples: they are part of the public surface
(the reference ships runnable binaries as its usage documentation), so a
refactor that breaks them must fail CI, not a user."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.full
def test_he_demo_runs_and_verifies():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_ntt_tpu_tests")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "he_demo.py"),
         "--m", "6", "--widths", "27,27", "--batch", "2",
         "--platform", "cpu", "--check"],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ok" in r.stdout.lower(), r.stdout
