"""ctypes bindings to the native C++ core (csrc/ntt_core.cpp).

The shared library is built on demand with `make -C csrc` (g++ is part of
the image).  All entry points degrade gracefully: ``available()`` returns
False if the toolchain or library is missing, and callers (tests, bench)
skip the native cross-checks in that case.
"""

from __future__ import annotations

import ctypes
import functools
import pathlib
import subprocess

import numpy as np

_CSRC = pathlib.Path(__file__).resolve().parent.parent / "csrc"
_LIB = _CSRC / "libnttcore.so"

_U64P = np.ctypeslib.ndpointer(dtype=np.uint64, flags="C_CONTIGUOUS")


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", str(_CSRC)], check=True, capture_output=True, timeout=120
        )
        return _LIB.exists()
    except Exception:
        return False


@functools.lru_cache(maxsize=1)
def _load():
    if not _LIB.exists() and not _build():
        return None
    lib = ctypes.CDLL(str(_LIB))
    u64 = ctypes.c_uint64
    lib.nttcore_power_table.argtypes = [u64, u64, u64, _U64P]
    lib.nttcore_shoup_table.argtypes = [_U64P, u64, u64, ctypes.c_uint, _U64P]
    lib.nttcore_expand_radix4.argtypes = [_U64P, u64, u64, _U64P]
    lib.nttcore_expand_hexl.argtypes = [_U64P, u64, _U64P]
    lib.nttcore_expand_r2_16.argtypes = [_U64P, u64, _U64P]
    lib.nttcore_expand_r4_vec.argtypes = [_U64P, u64, u64, ctypes.c_int, _U64P]
    lib.nttcore_expand_r4r2.argtypes = [_U64P, u64, u64, _U64P]
    lib.nttcore_fwd_simple.argtypes = [_U64P, u64, u64, _U64P]
    lib.nttcore_inv_simple.argtypes = [_U64P, u64, u64, u64, _U64P]
    lib.nttcore_fwd_lazy64.argtypes = [_U64P, u64, u64, _U64P, _U64P, ctypes.c_int]
    lib.nttcore_bench_fwd_lazy64.argtypes = [u64, u64, u64, ctypes.c_int, ctypes.c_int]
    lib.nttcore_bench_fwd_lazy64.restype = ctypes.c_double
    lib.nttcore_powmod.argtypes = [u64, u64, u64]
    lib.nttcore_powmod.restype = u64
    return lib


def available() -> bool:
    return _load() is not None


def power_table(root: int, n: int, q: int) -> np.ndarray:
    out = np.zeros(n, dtype=np.uint64)
    _load().nttcore_power_table(root, n, q, out)
    return out


def shoup_table(vals: np.ndarray, q: int, word: int = 64) -> np.ndarray:
    vals = np.ascontiguousarray(vals, dtype=np.uint64)
    out = np.zeros_like(vals)
    _load().nttcore_shoup_table(vals, vals.size, q, word, out)
    return out


def expand_radix4(w: np.ndarray, q: int) -> np.ndarray:
    w = np.ascontiguousarray(w, dtype=np.uint64)
    out = np.zeros(2 * w.size, dtype=np.uint64)
    _load().nttcore_expand_radix4(w, w.size, q, out)
    return out


def expand_hexl(w: np.ndarray) -> np.ndarray:
    w = np.ascontiguousarray(w, dtype=np.uint64)
    out = np.zeros(2 * w.size, dtype=np.uint64)
    _load().nttcore_expand_hexl(w, w.size, out)
    return out


def expand_r2_16(w: np.ndarray) -> np.ndarray:
    w = np.ascontiguousarray(w, dtype=np.uint64)
    out = np.zeros(3 * w.size, dtype=np.uint64)
    _load().nttcore_expand_r2_16(w, w.size, out)
    return out


def expand_r4_vec(w: np.ndarray, q: int, unordered: bool = False) -> np.ndarray:
    w = np.ascontiguousarray(w, dtype=np.uint64)
    out = np.zeros(5 * w.size, dtype=np.uint64)
    _load().nttcore_expand_r4_vec(w, w.size, q, 1 if unordered else 0, out)
    return out


def expand_r4r2(w: np.ndarray, q: int) -> np.ndarray:
    w = np.ascontiguousarray(w, dtype=np.uint64)
    out = np.zeros(5 * w.size, dtype=np.uint64)
    _load().nttcore_expand_r4r2(w, w.size, q, out)
    return out


def fwd_simple(a: np.ndarray, q: int, w: np.ndarray) -> np.ndarray:
    buf = np.ascontiguousarray(a, dtype=np.uint64).copy()
    _load().nttcore_fwd_simple(buf, buf.size, q, np.ascontiguousarray(w))
    return buf


def inv_simple(a: np.ndarray, q: int, n_inv: int, w_inv: np.ndarray) -> np.ndarray:
    buf = np.ascontiguousarray(a, dtype=np.uint64).copy()
    _load().nttcore_inv_simple(buf, buf.size, q, n_inv, np.ascontiguousarray(w_inv))
    return buf


def fwd_lazy64(a: np.ndarray, q: int, w: np.ndarray, w_con: np.ndarray,
               strict: bool = True) -> np.ndarray:
    buf = np.ascontiguousarray(a, dtype=np.uint64).copy()
    _load().nttcore_fwd_lazy64(
        buf, buf.size, q, np.ascontiguousarray(w), np.ascontiguousarray(w_con),
        1 if strict else 0,
    )
    return buf


def bench_fwd_lazy64_ns(m: int, q: int, root: int, inner: int = 200,
                        reps: int = 10) -> float:
    """Host-CPU single-core baseline: ns per forward lazy NTT (upstream
    measurement protocol)."""
    return float(_load().nttcore_bench_fwd_lazy64(m, q, root, inner, reps))
