"""ntt_tpu: a TPU-native negacyclic NTT framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
IBM/optimized-number-theoretic-transform-implementations: forward/inverse
negacyclic NTT kernel variants over R_q[X]/(X^N+1), batched, fused, and
distributed over TPU meshes via a six-step decomposition.
"""

from ntt_tpu.params import FIXTURES, NttParams  # noqa: F401

__version__ = "0.1.0"
