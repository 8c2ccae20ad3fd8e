// Exact integer-arithmetic oracle for the I-ViT integer operator specs.
//
// The TPU compute path carries integer values in f32 lanes (VPU) and the
// dyadic requantization in 16-bit limbs (core/dyadic.py). This library is
// the ground truth those implementations are tested against: every op is
// written in plain int64 arithmetic exactly as an integer-only ISA would
// execute it (the role TVM-generated integer CUDA plays in the reference,
// /root/reference/TVM_benchmark/models/layers.py:329-403).
//
// Build: ivit_tpu/native/build.py (g++ -O2 -shared -fPIC).

#include <cstdint>
#include <cmath>
#include <cstring>

extern "C" {

// Decompose a positive f32 ratio into (m, e) with r ~= m / 2^e,
// m in [2^30, 2^31), mantissa rounded half-up — the batch_frexp spec
// (quant_utils.py:150-175).
void dyadic_decompose(const float* r, int n, int32_t* m, int32_t* e) {
  for (int i = 0; i < n; ++i) {
    int exp;
    double frac = std::frexp((double)r[i], &exp);
    double scaled = frac * 2147483648.0;  // 2^31
    int64_t mm = (int64_t)std::floor(scaled + 0.5);
    m[i] = (int32_t)mm;
    e[i] = 31 - exp;
  }
}

// round-half-away-from-zero of z * m / 2^e in exact int64 arithmetic —
// the fixedpoint_mul spec (quant_utils.py:220-230).
void dyadic_mul(const int32_t* z, int n, int32_t m, int32_t e,
                int32_t* out) {
  int64_t half = (e >= 1) ? (1LL << (e - 1)) : 0;
  for (int i = 0; i < n; ++i) {
    int64_t prod = (int64_t)(z[i] < 0 ? -z[i] : z[i]) * (int64_t)m;
    int64_t res = (prod + half) >> e;
    out[i] = (int32_t)(z[i] < 0 ? -res : res);
  }
}

static inline int64_t shift_exp_one(int64_t q, int64_t x0, int64_t n) {
  // x*log2(e) ~= x + x>>1 - x>>4 with floor semantics on negatives
  // (quant_modules.py:411; floor division, not arithmetic shift of
  // magnitude — both match for two's complement >>).
  q = q + (q >> 1) - (q >> 4);
  int64_t lo = n * x0;
  if (q < lo) q = lo;
  // x0 < 0: floor division by a negative
  int64_t qt = q / x0;
  int64_t rem = q - x0 * qt;
  if (rem < 0) { /* unreachable: q<=0, x0<0 -> qt>=0 exact floor */ }
  int64_t base = rem - 2 * x0;                 // (r/2 - x0)*2 kept integral
  int64_t sh = n - 1 - qt;
  int64_t e = (sh >= 0) ? (base << sh) : (base >> (-sh));
  if (e < 0) e = 0;
  if (e > 2147483647LL) e = 2147483647LL;
  return e;
}

// Integer-only Shiftmax over rows (quant_modules.py:448-497 spec with
// saturating int32 semantics).
void shiftmax_i32(const int32_t* x, int rows, int cols, float scale,
                  int out_bits, int n, int32_t* out) {
  int64_t x0 = (int64_t)std::floor(-1.0 / (double)(float)scale);
  for (int rix = 0; rix < rows; ++rix) {
    const int32_t* row = x + (int64_t)rix * cols;
    int32_t* orow = out + (int64_t)rix * cols;
    int64_t mx = row[0];
    for (int c = 1; c < cols; ++c) if (row[c] > mx) mx = row[c];
    int64_t sum = 0;
    for (int c = 0; c < cols; ++c) {
      int64_t e = shift_exp_one((int64_t)row[c] - mx, x0, n);
      orow[c] = (int32_t)e;
      sum += e;
      if (sum > 2147483647LL) sum = 2147483647LL;
    }
    if (sum < 1) sum = 1;
    int64_t factor = 2147483647LL / sum;
    for (int c = 0; c < cols; ++c) {
      int64_t v = ((int64_t)orow[c] * factor) >> (32 - out_bits);
      orow[c] = (int32_t)v;
    }
  }
}

// Integer-only ShiftGELU (quant_modules.py:389-445 spec).
void shiftgelu_i32(const int32_t* x, int rows, int cols, float sig_scale,
                   int out_bits, int n, int32_t* out) {
  int64_t x0 = (int64_t)std::floor(-1.0 / (double)(float)sig_scale);
  for (int rix = 0; rix < rows; ++rix) {
    const int32_t* row = x + (int64_t)rix * cols;
    int32_t* orow = out + (int64_t)rix * cols;
    int64_t mx = row[0];
    for (int c = 1; c < cols; ++c) if (row[c] > mx) mx = row[c];
    int64_t exp_max = shift_exp_one(-mx, x0, n);
    for (int c = 0; c < cols; ++c) {
      int64_t e = shift_exp_one((int64_t)row[c] - mx, x0, n);
      int64_t sum = e + exp_max;
      if (sum > 2147483647LL) sum = 2147483647LL;
      if (sum < 1) sum = 1;
      int64_t factor = 2147483647LL / sum;
      int64_t sig = (e * factor) >> (32 - out_bits);
      orow[c] = (int32_t)((int64_t)row[c] * sig);
    }
  }
}

// Integer LayerNorm with the 10-iteration Newton integer sqrt
// (quant_modules.py:353-386 spec). gamma/beta folding happens at the
// call site; this computes the normalized integer y.
void int_layernorm_i32(const int32_t* x, int rows, int cols,
                       int32_t* out) {
  for (int rix = 0; rix < rows; ++rix) {
    const int32_t* row = x + (int64_t)rix * cols;
    int32_t* orow = out + (int64_t)rix * cols;
    // round-half-even mean of integers (round_ste on the exact mean)
    double meanf = 0;
    for (int c = 0; c < cols; ++c) meanf += row[c];
    meanf /= cols;
    double fl = std::floor(meanf);
    double diff = meanf - fl;
    int64_t mean;
    if (diff > 0.5) mean = (int64_t)fl + 1;
    else if (diff < 0.5) mean = (int64_t)fl;
    else mean = ((int64_t)fl % 2 == 0) ? (int64_t)fl : (int64_t)fl + 1;
    int64_t var = 0;
    for (int c = 0; c < cols; ++c) {
      int64_t d = (int64_t)row[c] - mean;
      var += d * d;
    }
    int64_t k = 1LL << 16;
    for (int it = 0; it < 10; ++it) k = (k + var / k) / 2;
    if (k < 1) k = 1;
    int64_t factor = 2147483647LL / k;
    for (int c = 0; c < cols; ++c) {
      int64_t d = (int64_t)row[c] - mean;
      int64_t y = d * factor;
      // floor(y/2) for negatives = arithmetic shift
      orow[c] = (int32_t)(y >> 1);
    }
  }
}

}  // extern "C"
