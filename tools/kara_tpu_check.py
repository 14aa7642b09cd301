"""On-chip exactness check for the Karatsuba Shoup path (NTT_MULHI64=kara).

Round 2 reproduced an XLA:TPU fusion miscompile of the comparison+where
carry chains inside the full six-step program
(artifacts/KARA_TPU_MISCOMPILE_r02.log); round 3 rewrote the carries as
pure bitwise extraction (modmath._carry32/_borrow32).  This script is the
re-verification protocol:

  phase A (default mulhi64):    python tools/kara_tpu_check.py save out.npz
  phase B (NTT_MULHI64=kara):   NTT_MULHI64=kara python tools/kara_tpu_check.py check out.npz

Run each phase in its OWN process (the impl choice is baked in at trace
time).  Phase B also standalone-checks mulhi64_kara against schoolbook on
20k random + edge cases ON THE DEVICE."""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys

import numpy as np


def _outputs():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_ntt_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from ntt_tpu import api
    from ntt_tpu.params import FIXTURES, bench_params

    outs = {}
    rng = np.random.default_rng(11)
    for name, p in (("fix13", FIXTURES[13]), ("q62", bench_params(14, 62))):
        a = rng.integers(0, p.q, size=(4, p.n), dtype=np.uint64)
        outs[name + "_in"] = a
        outs[name + "_fwd"] = api.fwd_ntt(a, p, variant="sixstep")
        outs[name + "_inv"] = api.inv_ntt(outs[name + "_fwd"], p,
                                          variant="sixstep")
    return outs


def main():
    mode, path = sys.argv[1], sys.argv[2]
    from ntt_tpu import modmath as mm

    if mode == "save":
        assert not mm.USE_KARA, "phase A must run WITHOUT NTT_MULHI64=kara"
        np.savez(path, **_outputs())
        print(f"saved reference outputs to {path}")
        return
    assert mode == "check" and mm.USE_KARA, "phase B needs NTT_MULHI64=kara"
    import jax

    # standalone device-level property check first
    rng = np.random.default_rng(7)
    edges = np.array([0, 1, 2, 0xFFFFFFFF, 0xFFFFFFFE, 0x80000000,
                      0x7FFFFFFF], dtype=np.uint64)
    vals = np.concatenate([
        (edges.reshape(-1, 1) | (edges.reshape(1, -1) << np.uint64(32))).ravel(),
        rng.integers(0, 1 << 64, size=20000, dtype=np.uint64),
    ])
    a = mm.from_u64(vals)
    b = mm.from_u64(vals[::-1].copy())
    got = mm.to_u64(jax.jit(mm.mulhi64_kara)(a, b))
    want = mm.to_u64(jax.jit(mm.mulhi64)(a, b))
    bad = np.nonzero(got != want)[0]
    print(f"standalone mulhi64_kara on {jax.devices()[0].device_kind}: "
          f"{'OK' if bad.size == 0 else f'{bad.size} MISMATCHES'} "
          f"({len(vals)} cases)")
    if bad.size:
        sys.exit(1)

    ref = np.load(path)
    got = _outputs()
    rc = 0
    for k, v in got.items():
        same = bool((ref[k] == v).all())
        print(f"in-context {k}: {'OK' if same else 'MISMATCH'}")
        rc |= not same
    sys.exit(rc)


if __name__ == "__main__":
    main()
