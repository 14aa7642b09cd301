"""Multi-process distributed test: 2 local CPU processes under
jax.distributed form one 4-device global mesh, and the dist six-step
fwd/inv/polymul run across the process boundary (SURVEY section 4's
pod-free multi-host exercise; VERDICT r2 missing item #4).

The single-process tests in test_dist.py cover numerics on a virtual
mesh; this one proves init_multihost + the global-array plumbing work
when the all_to_all actually crosses processes.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "dist_multiproc_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dist_ntt():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_ntt_tpu_tests")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert "OK" in out, f"worker {i} no OK:\n{out[-4000:]}"
