"""On-chip exactness check for the round-3 fast-multiply switches.

Two trace-time alternatives to the exact Shoup multiply exist
(ntt_tpu/modmath.py): NTT_MULMOD=solinas (direct two-fold reduction for
q = 2^e - 2^k + 1) and NTT_MULHI64=approx (truncated mulhi64 + one
repair cond_sub).  Both are CPU-property-tested; the round-2 Karatsuba
episode (artifacts/KARA_TPU_MISCOMPILE_r02.log) proved CPU-green is NOT
chip-green, so each must be re-proven on the device before becoming a
measured (let alone default) path.

Usage (one process per mode -- the impl choice bakes in at trace time):

  NTT_MULMOD=solinas  python tools/solinas_tpu_check.py solinas
  NTT_MULHI64=approx  python tools/solinas_tpu_check.py approx

Checks, all on the device:
  1. standalone property sweep of the switched multiply against Python
     integer arithmetic (values mod q + the documented [0, 2q) bound),
     over random + edge operands at every legal input bound;
  2. end-to-end strict fwd+inv of the sixstep variant vs the NumPy
     oracle (refmodel) at the headline 62-bit Solinas q, fixture 12
     (51-bit Solinas), and -- for solinas mode -- the u32 single-lane
     bench prime 2^27 - 2^11 + 1.
Strict outputs are representative-unique, so oracle comparison needs no
two-phase save/check dance.  Exits nonzero on any mismatch.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys

import numpy as np


def _rand_pairs(rng, q, t_bound, n):
    w = rng.integers(0, q, size=n, dtype=np.uint64)
    t = rng.integers(0, t_bound, size=n, dtype=np.uint64)
    # edge operands: extremes of both ranges
    we = np.array([0, 1, q - 1, q - 2, 1, q - 1], dtype=np.uint64)
    te = np.array([0, t_bound - 1, t_bound - 1, 1, t_bound - 2, 0],
                  dtype=np.uint64)
    return np.concatenate([we, w]), np.concatenate([te, t])


def _check_standalone_solinas(jax, mm):
    import jax.numpy as jnp  # noqa: F401

    rng = np.random.default_rng(3)
    bad = 0
    for q, t_mult in ((0x3FFFFFFFFFFF0001, 4),   # 2^62-2^16+1, radix-2 bound
                      ((1 << 51) - (1 << 17) + 1, 8)):  # fixture 12, radix-4
        e, k = mm.solinas_form(q)
        w, t = _rand_pairs(rng, q, t_mult * q, 20000)
        fn = jax.jit(lambda a, b, q=q, e=e, k=k: mm.mul_mod_q2_solinas(
            a, b, q, e, k))
        got = mm.to_u64(fn(mm.from_u64(w), mm.from_u64(t)))
        want_mod = (w.astype(object) * t.astype(object)) % q
        ok_mod = (got.astype(object) % q == want_mod).all()
        ok_bound = (got < 2 * np.uint64(q)).all()
        print(f"  mul_mod_q2_solinas q=2^{e}-2^{k}+1 t<{t_mult}q: "
              f"{'OK' if ok_mod and ok_bound else 'MISMATCH'} "
              f"({len(w)} cases, mod={ok_mod} bound={ok_bound})")
        bad += int(not (ok_mod and ok_bound))
    # u32 single lane: bench prime family
    q32 = (1 << 27) - (1 << 11) + 1
    form = mm.solinas_form32(q32)
    assert form, q32
    e, k = form
    w, t = _rand_pairs(rng, q32, 8 * q32, 20000)
    w32, t32 = w.astype(np.uint32), t.astype(np.uint32)
    fn = jax.jit(lambda a, b: mm.mul_mod32_q2_solinas(a, b, q32, e, k))
    got = np.asarray(fn(w32, t32)).astype(np.uint64)
    want = (w.astype(object) * t.astype(object)) % q32
    ok_mod = (got.astype(object) % q32 == want).all()
    ok_bound = (got < 2 * q32).all()
    print(f"  mul_mod32_q2_solinas q=2^{e}-2^{k}+1 t<8q: "
          f"{'OK' if ok_mod and ok_bound else 'MISMATCH'} "
          f"(mod={ok_mod} bound={ok_bound})")
    return bad + int(not (ok_mod and ok_bound))


def _check_standalone_approx(jax, mm):
    rng = np.random.default_rng(5)
    q = 0x3FFFFFFFFFFF0001
    w, t = _rand_pairs(rng, q, 4 * q, 20000)
    # w_con = floor(w * 2^64 / q) -- the real preconditioning
    w_con = ((w.astype(object) << 64) // q).astype(np.uint64)
    fn = jax.jit(lambda a, ac, b: mm.shoup_mul_q2(a, ac, b, q))
    got = mm.to_u64(fn(mm.from_u64(w), mm.from_u64(w_con), mm.from_u64(t)))
    want = (w.astype(object) * t.astype(object)) % q
    ok_mod = (got.astype(object) % q == want).all()
    ok_bound = (got < 2 * np.uint64(q)).all()
    print(f"  shoup_mul_q2[approx] q62: {'OK' if ok_mod and ok_bound else 'MISMATCH'} "
          f"({len(w)} cases, mod={ok_mod} bound={ok_bound})")
    return int(not (ok_mod and ok_bound))


def _check_e2e(jax, solinas_mode: bool):
    from ntt_tpu import api
    from ntt_tpu import refmodel as rm
    from ntt_tpu.params import FIXTURES, bench_params
    from ntt_tpu.plan import get_plan

    cases = [("q62", bench_params(14, 62)), ("fix12", FIXTURES[12])]
    if solinas_mode:
        cases.append(("q27u32", bench_params(10, 27)))
    rng = np.random.default_rng(11)
    bad = 0
    for name, p in cases:
        plan = get_plan(p)
        a = rng.integers(0, p.q, size=(4, p.n), dtype=np.uint64)
        fwd = api.fwd_ntt(a, p, variant="sixstep")
        want = np.stack([rm.fwd_ntt_harvey(r, p.q, plan.w, plan.w_con)
                         for r in a])
        ok_f = (fwd == want).all()
        inv = api.inv_ntt(fwd, p, variant="sixstep")
        ok_i = (inv == a).all()
        print(f"  e2e sixstep {name} (q={p.q.bit_length()}b N=2^{p.m}): "
              f"fwd {'OK' if ok_f else 'MISMATCH'}, "
              f"roundtrip {'OK' if ok_i else 'MISMATCH'}")
        bad += int(not (ok_f and ok_i))
    return bad


def main():
    mode = sys.argv[1]
    from ntt_tpu import modmath as mm

    if mode == "solinas":
        assert mm.USE_SOLINAS and not mm.USE_APPROX, \
            "run with NTT_MULMOD=solinas (and no NTT_MULHI64)"
    else:
        assert mode == "approx" and mm.USE_APPROX and not mm.USE_SOLINAS, \
            "run with NTT_MULHI64=approx (and no NTT_MULMOD)"

    import jax

    if _os.environ.get("NTT_CHECK_PLATFORM"):
        # env JAX_PLATFORMS alone does NOT pick the backend here
        # (sitecustomize force-registers the TPU plugin); see CLAUDE.md
        jax.config.update("jax_platforms", _os.environ["NTT_CHECK_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_ntt_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})  mode={mode}")

    bad = (_check_standalone_solinas(jax, mm) if mode == "solinas"
           else _check_standalone_approx(jax, mm))
    bad += _check_e2e(jax, mode == "solinas")
    print(f"{mode}: {'ALL OK' if bad == 0 else f'{bad} FAILURES'}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
