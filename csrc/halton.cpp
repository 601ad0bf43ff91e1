// Generalized Halton sequence core — native replacement for the reference's
// `ghalton` C++ dependency (SURVEY §2.2: low-discrepancy noise for MPPI
// sampling). Exposed through a plain C ABI consumed via ctypes
// (mppiisaac_tpu/ops/halton_native.py); the numpy fallback in
// mppi/sampling.py implements the identical algorithm, so outputs match
// bit-for-bit in double precision.
//
// Build: g++ -O3 -shared -fPIC halton.cpp -o libhalton.so
#include <cstdint>
#include <vector>

namespace {

const int kPrimes[] = {
    2,   3,   5,   7,   11,  13,  17,  19,  23,  29,  31,  37,  41,  43,  47,
    53,  59,  61,  67,  71,  73,  79,  83,  89,  97,  101, 103, 107, 109, 113,
    127, 131, 137, 139, 149, 151, 157, 163, 167, 173, 179, 181, 191, 193, 197,
    199, 211, 223, 227, 229, 233, 239, 241, 251, 257, 263, 269, 271, 277, 281,
    283, 293, 307, 311, 313, 317, 331, 337, 347, 349, 353, 359, 367, 373, 379,
    383, 389, 397, 401, 409, 419, 421, 431, 433, 439, 443, 449, 457, 461, 463,
    467, 479, 487, 491, 499, 503, 509, 521, 523, 541, 547, 557, 563, 569, 571,
    577, 587, 593, 599, 601, 607, 613, 617, 619, 631, 641, 643, 647, 653, 659,
    661, 673, 677, 683, 691};
const int kNumPrimes = sizeof(kPrimes) / sizeof(kPrimes[0]);

// Multiplicatively scrambled radical inverse: digit d → (d·m) mod base with
// m ≈ 0.618·base (golden-ratio stride). Plain Halton degenerates for
// primes > n; scrambling equidistributes every dimension (the ghalton fix).
// Must match mppi/sampling.py::_halton_numpy bit-for-bit.
inline double radical_inverse(int64_t i, int base) {
  int64_t m = static_cast<int64_t>(base * 0.61803398875);
  if (m < 1) m = 1;
  double r = 0.0, f = 1.0;
  while (i > 0) {
    f /= base;
    r += f * static_cast<double>((i % base) * m % base);
    i /= base;
  }
  return r;
}

inline double clamp01(double v) {
  if (v < 1e-6) return 1e-6;
  if (v > 1.0 - 1e-6) return 1.0 - 1e-6;
  return v;
}

}  // namespace

extern "C" {

// Fill out[n*dims] row-major with Halton points, indices [skip, skip+n).
// Returns 0 on success, -1 if dims exceeds the prime table.
int halton_fill(int64_t n, int dims, int64_t skip, double* out) {
  if (dims > kNumPrimes) return -1;
  for (int d = 0; d < dims; ++d) {
    const int base = kPrimes[d];
    for (int64_t i = 0; i < n; ++i) {
      out[i * dims + d] = clamp01(radical_inverse(skip + i, base));
    }
  }
  return 0;
}

int halton_max_dims() { return kNumPrimes; }

}  // extern "C"
