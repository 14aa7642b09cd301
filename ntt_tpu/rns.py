"""RNS (residue number system) tower convenience layer.

HE schemes (BGV/BFV/CKKS) represent big-integer coefficients as residues
under a tower of NTT-friendly primes and transform each residue channel
independently -- the dominant production workload for NTT kernels.  The
reference is a single-modulus kernel library; this layer composes the
framework's per-modulus plans into one tower object:

  * prime generation: distinct NTT-friendly primes of requested widths;
  * encode/decode: CRT split of big-int coefficients to residue channels
    and exact reconstruction;
  * fwd/inv/negacyclic over all channels (each channel through its own
    jitted kernel -- moduli are trace-time constants by design, so
    channels are separate XLA programs; they pipeline back-to-back on
    device).

Everything is exact big-int math on the host side and the framework's
bit-exact kernels on device.
"""

from __future__ import annotations

import numpy as np

from ntt_tpu import api
from ntt_tpu.params import NttParams


class RnsTower:
    """A tower of k NTT-friendly primes sharing one ring degree N = 2^m."""

    def __init__(self, m: int, q_bits: list[int] | tuple[int, ...] = (30, 30, 30),
                 params: list[NttParams] | None = None):
        if params is not None:
            self.params = list(params)
            assert all(p.m == self.params[0].m for p in self.params)
            self.m = self.params[0].m
        else:
            # one descending prime scan per distinct width (not per channel)
            from ntt_tpu.params import find_ntt_primes

            counts: dict[int, int] = {}
            for bits in q_bits:
                counts[bits] = counts.get(bits, 0) + 1
            pools = {
                bits: iter(find_ntt_primes(bits, m, k)) for bits, k in counts.items()
            }
            self.params = [
                NttParams.make(next(pools[bits]), m) for bits in q_bits
            ]
            self.m = m
        self.n = 1 << self.m
        self.moduli = [p.q for p in self.params]
        self.modulus_product = 1
        for q in self.moduli:
            self.modulus_product *= q

    # -- CRT encode / decode ------------------------------------------------

    def encode(self, coeffs) -> np.ndarray:
        """Big-int (or uint64) coefficients (..., N) -> residue channels
        (k, ..., N) uint64."""
        arr = np.asarray(coeffs, dtype=object)
        out = np.empty((len(self.moduli),) + arr.shape, dtype=np.uint64)
        for i, q in enumerate(self.moduli):
            red = np.vectorize(lambda v, q=q: int(v) % q, otypes=[object])(arr)
            out[i] = red.astype(np.uint64)
        return out

    def decode(self, channels: np.ndarray) -> np.ndarray:
        """Residue channels (k, ..., N) -> big-int coefficients (..., N)
        (object dtype), exact CRT reconstruction mod prod(moduli)."""
        big_q = self.modulus_product
        acc = np.zeros(channels.shape[1:], dtype=object)
        for i, q in enumerate(self.moduli):
            big_qi = big_q // q
            inv = pow(big_qi % q, -1, q)
            lift = (big_qi * inv) % big_q
            acc = (acc + np.vectorize(
                lambda v, lift=lift: int(v) * lift, otypes=[object]
            )(channels[i])) % big_q
        return acc

    # -- per-channel transforms ----------------------------------------------

    def fwd(self, channels: np.ndarray, variant: str = "auto") -> np.ndarray:
        """Forward NTT of every residue channel; channels: (k, ..., N)."""
        return np.stack(
            [api.fwd_ntt(channels[i], p, variant=variant)
             for i, p in enumerate(self.params)]
        )

    def inv(self, channels: np.ndarray, variant: str = "auto") -> np.ndarray:
        return np.stack(
            [api.inv_ntt(channels[i], p, variant=variant)
             for i, p in enumerate(self.params)]
        )

    def negacyclic_mul(self, ch_a: np.ndarray, ch_b: np.ndarray) -> np.ndarray:
        """Channel-wise polynomial product (the HE ciphertext-multiply
        core): each channel through the fused one-jit pipeline."""
        return np.stack(
            [api.negacyclic_mul(ch_a[i], ch_b[i], p)
             for i, p in enumerate(self.params)]
        )

    def negacyclic_mul_bigint(self, a, b):
        """End-to-end: big-int polynomials -> encode -> channel products ->
        decode.  Exact in R_Q[X]/(X^N+1) for Q = prod(moduli) as long as
        the integer product coefficients stay below Q."""
        return self.decode(self.negacyclic_mul(self.encode(a), self.encode(b)))
