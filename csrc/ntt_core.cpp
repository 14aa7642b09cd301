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

// ---------------------------------------------------- SIMD layout generators
//
// Foreign cross-checks for the remaining pre_compute.h layout families
// (upstream pre_compute.h:109-367).  Each layout is a pure function of the
// bit-reversed power table; these are written against the layout *spec*
// (segment map + duplication factors), structured around a cursor/emitter
// rather than the upstream index walks, so agreement with the Python
// builders is meaningful evidence.

struct Cursor {
  u64* buf;
  u64 pos = 0;
  void put(u64 v) { buf[pos++] = v; }
  void run(const u64* src, u64 count) {
    for (u64 i = 0; i < count; ++i) put(src[i]);
  }
  void align8_next() { pos = (pos & ~7ull) + 8; }
};

// {w1, w2, w1*w2, w3, -(w1*w3)} for head index i (pre_compute.h:169-177).
inline void emit_quintuple(Cursor& c, const u64* w, u64 i, u64 q) {
  u64 w1 = w[i], w2 = w[2 * i], w3 = w[2 * i + 1];
  c.put(w1);
  c.put(w2);
  c.put(mulmod(w1, w2, q));
  c.put(w3);
  c.put(q - mulmod(w1, w3, q));
}

// Duplicated tail segments shared by the hexl/r2_16/r4r2 layouts.
inline void emit_repeat(Cursor& c, const u64* src, u64 count, u64 times) {
  for (u64 i = 0; i < count; ++i)
    for (u64 r = 0; r < times; ++r) c.put(src[i]);
}

// FwdT2 pattern: per 4 source entries emit (0,0,2,2,1,1,3,3).
inline void emit_t2(Cursor& c, const u64* src, u64 count) {
  static const int ord[8] = {0, 0, 2, 2, 1, 1, 3, 3};
  for (u64 i = 0; i < count; i += 4)
    for (int k = 0; k < 8; ++k) c.put(src[i + ord[k]]);
}

// FwdT1 pattern: per 8 source entries emit the (0,4,1,5,2,6,3,7) interleave.
inline void emit_t1(Cursor& c, const u64* src, u64 count) {
  static const int perm[8] = {0, 4, 1, 5, 2, 6, 3, 7};
  for (u64 i = 0; i < count; i += 8)
    for (int k = 0; k < 8; ++k) c.put(src[i + perm[k]]);
}

// HEXL layout, 2n buffer / 13n/8 used (upstream pre_compute.h:109-137).
void nttcore_expand_hexl(const u64* w, u64 n, u64* out) {
  std::memset(out, 0, 2 * n * sizeof(u64));
  Cursor c{out};
  c.run(w, n / 8);
  emit_repeat(c, w + n / 8, n / 8, 4);
  emit_repeat(c, w + n / 4, n / 4, 2);
  c.run(w + n / 2, n / 2);
}

// r2_16 layout, 3n buffer (upstream pre_compute.h:326-367).
void nttcore_expand_r2_16(const u64* w, u64 n, u64* out) {
  std::memset(out, 0, 3 * n * sizeof(u64));
  Cursor c{out};
  c.run(w, n / 8);
  emit_repeat(c, w + n / 8, n / 8, 4);
  emit_t2(c, w + n / 4, n / 4);
  emit_t1(c, w + n / 2, n / 2);
}

// Vector radix-4 table, 5n buffer, ordered or lane-permuted/unordered
// (upstream pre_compute.h:154-251).
void nttcore_expand_r4_vec(const u64* w, u64 n, u64 q, int unordered, u64* out) {
  std::memset(out, 0, 5 * n * sizeof(u64));
  Cursor c{out};
  bool even = (__builtin_ctzll(n) % 2) == 0;
  u64 i = 1, m = 1;
  c.pos = 1;
  if (!even) {
    c.put(w[1]);  // odd log2: leading radix-2 stage twiddle
    i = m = 2;
  }
  // FWD8: quintuples per group while t >= 8
  while (i < (n >> 5)) {
    for (u64 g = 0; g < m; ++g) emit_quintuple(c, w, i++, q);
    i = 4 * m;
    m <<= 2;
  }
  // FWD4: two-pair broadcast groups of 10
  for (u64 j = n >> 4; j < (n >> 3); j += 2) {
    u64 k = 2 * j;
    c.put(w[j]);
    c.put(w[j + 1]);
    c.put(w[k]);
    c.put(w[k + 2]);
    c.put(mulmod(w[j], w[k], q));
    c.put(mulmod(w[j + 1], w[k + 2], q));
    c.put(w[k + 1]);
    c.put(w[k + 3]);
    c.put(q - mulmod(w[j], w[k + 1], q));
    c.put(q - mulmod(w[j + 1], w[k + 3], q));
  }
  c.align8_next();
  // FWD1: per 8-group, five 8-lane vectors (quintuple components as rows)
  static const int perm[8] = {0, 4, 1, 5, 2, 6, 3, 7};
  for (u64 j = n >> 2; j < (n >> 1); j += 8) {
    u64 block[5][8];
    for (int lane = 0; lane < 8; ++lane) {
      u64 idx = j + lane;
      u64 w1 = w[idx], w2 = w[2 * idx], w3 = w[2 * idx + 1];
      block[0][lane] = w1;
      block[1][lane] = w2;
      block[2][lane] = mulmod(w1, w2, q);
      block[3][lane] = w3;
      block[4][lane] = q - mulmod(w1, w3, q);
    }
    for (int r = 0; r < 5; ++r)
      for (int lane = 0; lane < 8; ++lane)
        c.put(block[r][unordered ? perm[lane] : lane]);
  }
}

// Mixed radix-4 heads + duplicated radix-2 tail, 5n buffer
// (upstream pre_compute.h:253-324).
void nttcore_expand_r4r2(const u64* w, u64 n, u64 q, u64* out) {
  std::memset(out, 0, 5 * n * sizeof(u64));
  Cursor c{out};
  c.pos = 1;
  u64 i = 1, m = 1;
  u64 t = n >> 4;
  while (i < t) {
    for (u64 g = 0; g < m; ++g) emit_quintuple(c, w, i++, q);
    i = 4 * m;
    m <<= 2;
  }
  c.align8_next();
  if ((__builtin_ctzll(n) % 2) == 0) c.run(w + i, t);
  t <<= 1;
  emit_repeat(c, w + t, t, 4);
  t <<= 1;
  emit_t2(c, w + t, t);
  t <<= 1;
  emit_t1(c, w + t, t);
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
