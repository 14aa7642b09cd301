// ntt_tpu native core: independent C++ oracle + host baseline.
//
// Role in the framework (not a copy of the reference C):
//   1. An independently written twiddle/precompute generator and scalar
//      negacyclic NTT, used by the Python tests as a *second* oracle so the
//      NumPy model and the JAX kernels are cross-checked against a foreign
//      implementation (the role tests/test_correctness.c plays upstream).
//   2. A host-CPU Shoup-lazy NTT with the upstream measurement protocol
//      (10 warmups, min of 10 reps x inner-loop mean, CLOCK_MONOTONIC;
//      cf. /root/reference/tests/measurements.h:38-75) -- this provides the
//      "reference-class single-core CPU" baseline that bench.py compares
//      the TPU kernels against.
//
// Exposed via a C ABI for ctypes.  Build: `make -C csrc`.

#include <cstdint>
#include <cstring>
#include <ctime>
#include <vector>

using u64 = std::uint64_t;
using u128 = unsigned __int128;

namespace {

// ---------------------------------------------------------------- utilities

inline u64 mulmod(u64 a, u64 b, u64 q) { return (u64)((u128)a * b % q); }

inline u64 powmod(u64 base, u64 e, u64 q) {
  u64 acc = 1;
  base %= q;
  while (e) {
    if (e & 1) acc = mulmod(acc, base, q);
    base = mulmod(base, base, q);
    e >>= 1;
  }
  return acc;
}

// Bit reversal by the "increment carry" trick rather than per-index loops.
std::vector<u64> bitrev_indices(u64 n) {
  std::vector<u64> rev(n, 0);
  for (u64 i = 1; i < n; ++i) rev[i] = (rev[i >> 1] >> 1) | ((i & 1) ? (n >> 1) : 0);
  return rev;
}

struct ShoupPair {
  u64 value;
  u64 factor;  // floor(value << word / q)
};

inline ShoupPair make_shoup(u64 v, u64 q, unsigned word) {
  return ShoupPair{v, (u64)(((u128)v << word) / q)};
}

// Lazy Shoup product: value*t - hi_word(factor*t)*q, result < 2q.
template <unsigned WORD>
inline u64 shoup_mul(const ShoupPair& s, u64 t, u64 q) {
  u64 approx = (u64)(((u128)s.factor * t) >> WORD);
  return s.value * t - approx * q;
}

}  // namespace

extern "C" {

// ------------------------------------------------------------ table builders

// Bit-reversed powers w^0..w^{n-1} of a root (upstream calc_w semantics,
// pre_compute.h:38-51, reimplemented independently).
void nttcore_power_table(u64 root, u64 n, u64 q, u64* out) {
  auto rev = bitrev_indices(n);
  u64 cur = 1;
  for (u64 i = 0; i < n; ++i) {
    out[rev[i]] = cur;
    cur = mulmod(cur, root, q);
  }
}

// Shoup factors at a parametric word size (upstream calc_w_con semantics).
void nttcore_shoup_table(const u64* vals, u64 n, u64 q, unsigned word, u64* out) {
  for (u64 i = 0; i < n; ++i) out[i] = (u64)(((u128)vals[i] << word) / q);
}

// Radix-4 expanded table (2n entries; upstream expand_w semantics,
// pre_compute.h:85-105): even slots carry the source table, odd slots the
// fused pair products / negated products consumed by 5-twiddle butterflies.
void nttcore_expand_radix4(const u64* w, u64 n, u64 q, u64* out) {
  out[0] = w[0];
  out[1] = 0;
  out[2] = w[1];
  out[3] = 0;
  for (u64 i = 4; i < 2 * n; i += 2) {
    out[i] = w[i / 2];
    bool head = (i % 4 == 0);
    u64 left = head ? out[i / 2] : out[(i - 2) / 2];
    u64 prod = mulmod(left, w[i / 2], q);
    out[i + 1] = head ? prod : q - prod;
  }
}

// ------------------------------------------------------------ simple oracle
//
// Plain mod-q arithmetic (no lazy reduction anywhere): a deliberately
// different algorithmic style from both the reference and the Python model,
// so agreement is strong evidence of correctness.  Natural order in,
// bit-reversed order out; strict [0, q) values throughout.

void nttcore_fwd_simple(u64* a, u64 n, u64 q, const u64* w) {
  for (u64 half = n >> 1, block = 1; half >= 1; half >>= 1, block <<= 1) {
    for (u64 b = 0; b < block; ++b) {
      u64 tw = w[block + b];
      u64* lo = a + 2 * b * half;
      u64* hi = lo + half;
      for (u64 j = 0; j < half; ++j) {
        u64 prod = mulmod(tw, hi[j], q);
        u64 x = lo[j];
        lo[j] = x + prod >= q ? x + prod - q : x + prod;
        hi[j] = x >= prod ? x - prod : x + q - prod;
      }
    }
  }
}

void nttcore_inv_simple(u64* a, u64 n, u64 q, u64 n_inv, const u64* w_inv) {
  for (u64 half = 1, block = n >> 1; block >= 1; half <<= 1, block >>= 1) {
    for (u64 b = 0; b < block; ++b) {
      u64 tw = w_inv[block + b];
      u64* lo = a + 2 * b * half;
      u64* hi = lo + half;
      for (u64 j = 0; j < half; ++j) {
        u64 x = lo[j], y = hi[j];
        u64 s = x + y >= q ? x + y - q : x + y;
        u64 d = x >= y ? x - y : x + q - y;
        lo[j] = s;
        hi[j] = mulmod(tw, d, q);
      }
    }
  }
  for (u64 i = 0; i < n; ++i) a[i] = mulmod(a[i], n_inv, q);
}

// ------------------------------------------------------- Shoup-lazy baseline
//
// Single-core performance-oriented path used only as the bench baseline.
// Word size is fixed at 64; values stay lazily bounded (<4q) until the end.

void nttcore_fwd_lazy64(u64* a, u64 n, u64 q, const u64* w, const u64* wf,
                        int strict) {
  u64 twoq = 2 * q;
  for (u64 half = n >> 1, block = 1; half >= 1; half >>= 1, block <<= 1) {
    for (u64 b = 0; b < block; ++b) {
      ShoupPair tw{w[block + b], wf[block + b]};
      u64* lo = a + 2 * b * half;
      u64* hi = lo + half;
      for (u64 j = 0; j < half; ++j) {
        u64 x = lo[j];
        if (x >= twoq) x -= twoq;
        u64 prod = shoup_mul<64>(tw, hi[j], q);
        lo[j] = x + prod;
        hi[j] = x + twoq - prod;
      }
    }
  }
  if (strict) {
    for (u64 i = 0; i < n; ++i) {
      u64 v = a[i];
      if (v >= twoq) v -= twoq;
      if (v >= q) v -= q;
      a[i] = v;
    }
  }
}

// ------------------------------------------------------------- measurement

// Upstream-style protocol: warmups, then REPS repetitions of an inner loop,
// reporting the minimum per-rep mean in nanoseconds.
static double now_ns() {
  timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return ts.tv_sec * 1e9 + ts.tv_nsec;
}

double nttcore_bench_fwd_lazy64(u64 m, u64 q, u64 root, int inner, int reps) {
  u64 n = 1ull << m;
  std::vector<u64> w(n), wf(n), a(n), scratch(n);
  nttcore_power_table(root, n, q, w.data());
  nttcore_shoup_table(w.data(), n, q, 64, wf.data());
  for (u64 i = 0; i < n; ++i) a[i] = (0x9E3779B97F4A7C15ull * (i + 1)) % q;

  for (int i = 0; i < 10; ++i) {  // warmup
    std::memcpy(scratch.data(), a.data(), n * sizeof(u64));
    nttcore_fwd_lazy64(scratch.data(), n, q, w.data(), wf.data(), 0);
  }
  double best = 1e30;
  for (int r = 0; r < reps; ++r) {
    double t0 = now_ns();
    for (int i = 0; i < inner; ++i) {
      std::memcpy(scratch.data(), a.data(), n * sizeof(u64));
      nttcore_fwd_lazy64(scratch.data(), n, q, w.data(), wf.data(), 0);
    }
    double per = (now_ns() - t0) / inner;
    if (per < best) best = per;
  }
  return best;
}

u64 nttcore_powmod(u64 b, u64 e, u64 q) { return powmod(b, e, q); }

}  // extern "C"
