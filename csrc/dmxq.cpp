// dmxq: host-side bit-exact low-precision quantization & packing library.
//
// Native counterpart of the TPU framework's numerics core — the same role the
// reference's quant_cpu C++ extension plays (reference:
// src/dmx/compressor/quant/quant_cpu/*), re-implemented from the numerical
// spec with IEEE-754 bit manipulation:
//   * fixed-point / low-bit-float / block-floating-point fake quantization
//     with round-to-nearest-even on power-of-two grids
//   * BFP payload packing (int8 mantissas + per-block exponents) for
//     host-side checkpoint conversion at data-loading time
//
// Built as a plain shared library (no Python headers); accessed via ctypes
// (dmx_compressor_tpu/native.py).  Serves as an independent oracle for the
// JAX implementation and as the fast path for multi-GB checkpoint packing.

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

inline uint32_t f2b(float f) {
  uint32_t b;
  std::memcpy(&b, &f, sizeof(b));
  return b;
}

inline float b2f(uint32_t b) {
  float f;
  std::memcpy(&f, &b, sizeof(f));
  return f;
}

// exponent of |x| (floor(log2|x|)) for normal values; -127 for subnormals/zero
inline int exponent_of(float x) {
  return static_cast<int>((f2b(x) >> 23) & 0xFFu) - 127;
}

// round-half-to-even of v (|v| < 2^31)
inline double round_half_even(double v) { return std::nearbyint(v); }

// exact 2^k as double (|k| < 1024)
inline double p2(int k) { return std::ldexp(1.0, k); }

}  // namespace

extern "C" {

// y = quantize(x) on the 2^-fl grid, wl total bits, optional clamp.
void dmxq_fixed_point_nearest(const float* x, float* y, long n, int wl, int fl,
                              int clamp, int symmetric) {
  const double step = p2(-fl);
  double t_min = -p2(wl - fl - 1);
  double t_max = -t_min - step;
  if (symmetric) t_min += step;
  for (long i = 0; i < n; ++i) {
    double q = round_half_even(static_cast<double>(x[i]) / step) * step;
    if (clamp) q = q < t_min ? t_min : (q > t_max ? t_max : q);
    y[i] = static_cast<float>(q);
  }
}

// low-bit float quantization: man mantissa bits, exp exponent bits, bias.
void dmxq_float_nearest(const float* x, float* y, long n, int man, int exp_bits,
                        int bias, int flush_subnormal) {
  const int min_exp = -(bias - 1);
  const int emax = 1 << (exp_bits - 1);
  const double maxv = (2.0 - p2(-man)) * p2(emax);
  for (long i = 0; i < n; ++i) {
    const float v = x[i];
    if ((f2b(v) & 0x7FFFFFFFu) == 0) {
      y[i] = v;
      continue;
    }
    int e = exponent_of(v);
    if (e < min_exp) {  // subnormal w.r.t. the format
      if (flush_subnormal) {
        y[i] = 0.0f;
      } else {
        // fp32 shift-add double rounding: first onto the fp32 mantissa grid
        const double fine = round_half_even(v / p2(min_exp - 23)) * p2(min_exp - 23);
        const double step = p2(min_exp - man);
        y[i] = static_cast<float>(round_half_even(fine / step) * step);
      }
      continue;
    }
    const double step = p2(e - man);
    double q = round_half_even(v / step) * step;
    if (q != 0.0 && std::fabs(q) >= p2(emax + 1) && emax < 128) {
      q = (q < 0 ? -maxv : maxv);
    }
    y[i] = static_cast<float>(q);
  }
}

// symmetric BFP over contiguous blocks: rows blocks of length `cols` each.
void dmxq_block_nearest(const float* x, float* y, long rows, long cols, int wl) {
  for (long r = 0; r < rows; ++r) {
    const float* xr = x + r * cols;
    float* yr = y + r * cols;
    float amax = 0.0f;
    for (long c = 0; c < cols; ++c) {
      float a = std::fabs(xr[c]);
      if (a > amax) amax = a;
    }
    if (amax == 0.0f) {
      std::memcpy(yr, xr, cols * sizeof(float));
      continue;
    }
    const int e = exponent_of(amax);
    const double step = p2(e + 2 - wl);
    const double lim = p2(e + 1);
    const double maxv = (2.0 - p2(-(wl - 2))) * p2(e);
    const float base = static_cast<float>(6.0 * p2(e));
    for (long c = 0; c < cols; ++c) {
      // fp32 rebase-add double rounding (matches the reference kernel)
      const float t = xr[c] + base;  // fp32: first rounding
      double q = round_half_even(t / step) * step - static_cast<double>(base);
      if (std::fabs(q) >= lim) q = (q < 0 ? -maxv : maxv);
      yr[c] = static_cast<float>(q);
    }
  }
}

// pack rows x cols tensor into BFP payload along the last axis:
// man[rows*cols] int8 mantissas, exp[rows * cols/bs] int8 block exponents.
void dmxq_bfp_pack(const float* x, int8_t* man, int8_t* exp, long rows,
                   long cols, int bs, int wl) {
  const long nb = cols / bs;
  const int limit = (1 << (wl - 1)) - 1;
  for (long r = 0; r < rows; ++r) {
    const float* xr = x + r * cols;
    for (long b = 0; b < nb; ++b) {
      const float* xb = xr + b * bs;
      float amax = 0.0f;
      for (int c = 0; c < bs; ++c) {
        float a = std::fabs(xb[c]);
        if (a > amax) amax = a;
      }
      const int e = (amax == 0.0f) ? 0 : exponent_of(amax);
      exp[r * nb + b] = static_cast<int8_t>(e);
      const double inv_step = p2(wl - 2 - e);
      const float base = static_cast<float>(6.0 * p2(e));
      const double rebase = 3.0 * p2(wl - 1);
      for (int c = 0; c < bs; ++c) {
        const float t = xb[c] + base;  // fp32 double rounding
        double m = round_half_even(t * inv_step) - rebase;
        if (m > limit) m = limit;
        if (m < -limit) m = -limit;
        man[r * cols + b * bs + c] = static_cast<int8_t>(m);
      }
    }
  }
}

// unpack for verification
void dmxq_bfp_unpack(const int8_t* man, const int8_t* exp, float* y, long rows,
                     long cols, int bs, int wl) {
  const long nb = cols / bs;
  for (long r = 0; r < rows; ++r) {
    for (long b = 0; b < nb; ++b) {
      const double step = p2(static_cast<int>(exp[r * nb + b]) + 2 - wl);
      for (int c = 0; c < bs; ++c) {
        y[r * cols + b * bs + c] =
            static_cast<float>(man[r * cols + b * bs + c] * step);
      }
    }
  }
}

}  // extern "C"
