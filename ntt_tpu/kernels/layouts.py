"""Output-order descriptors and fix-up permutations.

The reference's unordered IFMA variant stores its last-stage results
linearly instead of scattering (src/ntt_radix4_avx512_ifma_unordered.c:69-84)
and ships a test-side repair routine fix_a_order
(tests/test_correctness.c:179-209).  This framework generalizes that
contract: a kernel may return its result in any documented layout, named
by a ``Layout`` descriptor carrying the exact permutation back to the
standard order (bit-reversed, like every reference forward kernel).

Layouts are pure metadata -- applying one is a host/NumPy or jnp gather,
never part of the hot path (callers that chain NTT -> pointwise ->
inverse-NTT never need to materialize standard order at all, which is the
whole point of the contract).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class Layout:
    """A named output ordering for length-n transforms.

    ``perm`` maps standard-order index -> position in the kernel output:
    ``standard[i] == out[perm[i]]``.
    """

    name: str
    n: int
    perm: np.ndarray

    def fix(self, a):
        """Return ``a`` (..., n) re-ordered to standard order."""
        return a[..., self.perm]

    def unfix(self, a):
        """Inverse of fix: standard order -> this layout."""
        inv = np.empty_like(self.perm)
        inv[self.perm] = np.arange(self.n)
        return a[..., inv]

    def compose(self, other: "Layout") -> "Layout":
        """Layout of applying a kernel with ``other`` layout to data already
        in ``self`` layout (rarely needed; provided for completeness)."""
        return Layout(f"{self.name}+{other.name}", self.n, other.perm[self.perm])


def standard(n: int) -> Layout:
    """Identity layout: the reference's default bit-reversed output order."""
    return Layout("standard", n, np.arange(n))


def radix4_vec_unordered(n: int) -> Layout:
    """The radix4-vec unordered output order: the final t==1 radix-4 stage
    processes its 4-element groups in the table's (0,4,1,5,2,6,3,7) lane
    order per 8-group block and stores linearly
    (src/ntt_radix4_avx512_ifma_unordered.c:69-84).  Standard group g of
    block b sits at slot argsort(perm)[g mod 8]."""
    from ntt_tpu.twiddles import LANE_PERM

    slot_of = np.argsort(LANE_PERM)  # inverse permutation
    r = np.arange(n)
    g, c = r >> 2, r & 3
    b, j = g >> 3, g & 7
    pos = 4 * ((b << 3) + slot_of[j]) + c
    return Layout("radix4-vec-unordered", n, pos)


def transposed(n: int, n1_log: int) -> Layout:
    """The six-step keep_transposed layout: output flattened as (N2, N1)
    instead of (N1, N2).  standard[c1*N2 + c2] == out[c2*N1 + c1]."""
    logn = n.bit_length() - 1
    n1, n2 = 1 << n1_log, 1 << (logn - n1_log)
    # standard index i = c1*n2 + c2 lives at output position c2*n1 + c1
    c1, c2 = np.divmod(np.arange(n), n2)
    return Layout(f"transposed[n1=2^{n1_log}]", n, c2 * n1 + c1)
