"""Worker process for the multi-process distributed test (SURVEY section 4:
"multi-process jax.distributed on a single host" is the pod-free way to
exercise the multi-host path).

Launched by test_dist_multiproc.py as N processes, each with 2 virtual CPU
devices; together they form one global mesh spanning process boundaries,
so the shard_map all_to_all actually crosses the (gloo) process transport.

argv: coordinator_port num_processes process_id
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

port, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=2"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from ntt_tpu import refmodel as rm  # noqa: E402
from ntt_tpu.dist import sixstep as dist  # noqa: E402
from ntt_tpu.params import FIXTURES  # noqa: E402
from ntt_tpu.plan import get_plan  # noqa: E402

dist.init_multihost(f"127.0.0.1:{port}", nproc, pid)
assert jax.process_count() == nproc, jax.process_count()
ndev = len(jax.devices())
assert ndev == 2 * nproc, f"expected {2 * nproc} global devices, got {ndev}"

mesh = dist.default_mesh()
p = FIXTURES[1]  # q=0x7e01 (u32 path), m=9 -- small enough for quick compiles
plan = get_plan(p)
rng = np.random.default_rng(42)  # same seed on every process: same input
a = rng.integers(0, p.q, size=(2, p.n), dtype=np.uint64)

# balanced split so N1=32 divides mesh*chunks on the 4-device mesh
f = dist.dist_fwd_ntt(a, plan, mesh=mesh, n1_log=5, n_chunks=2)
want = rm.fwd_ntt_harvey(a, p.q, plan.w, plan.w_con)
assert (f == want).all(), "dist_fwd_ntt mismatch vs oracle"

back = dist.dist_inv_ntt(f, plan, mesh=mesh, n1_log=5)
assert (back == a).all(), "dist_inv_ntt round-trip failed"

def _schoolbook_negacyclic(x, y, q):
    n = len(x)
    acc = np.zeros(n, dtype=np.uint64)
    for k in range(n):  # q is 15-bit: products+sums stay far below 2^64
        wrap = np.concatenate([x[: k + 1][::-1], x[k + 1 :][::-1]])
        sign_neg = np.arange(n) > k
        t = (wrap * y) % np.uint64(q)
        t = np.where(sign_neg, (np.uint64(q) - t) % np.uint64(q), t)
        acc[k] = int(t.sum()) % q
    return acc


c = dist.dist_negacyclic_mul(a, a, plan, mesh=mesh)
cw = _schoolbook_negacyclic(a[0], a[0], p.q)
assert (c[0] == cw).all(), "dist_negacyclic_mul mismatch vs schoolbook"

print(f"proc {pid}/{nproc}: fwd+inv+polymul across {ndev} devices OK",
      flush=True)
