// llmi_native — the framework's native data-path library.
//
// The reference engine's loader/compute layers are C++ (gguf.cpp, ops.cpp);
// this is the TPU framework's native counterpart for the HOST-side byte
// work, where Python/numpy overhead dominates model load times:
//
//   - repack_*:        GGUF block bytes -> planar int8 + f32 group scales
//                      (the device layout of quant/device.py)
//   - dequant_bf16_*:  GGUF block bytes -> bf16 words for serve-mode loads
//   - encode_q4_0:     f32 -> Q4_0 blocks (fixture/benchmark generation)
//
// Bit-level semantics mirror quant/layouts.py, which is itself validated
// bit-for-bit against the reference engine's row codecs (tests/test_quant.py).
// Compiled on demand by llm_inference_tpu/native.py with ctypes bindings;
// everything falls back to the numpy implementations when unavailable.
//
// Layout citations: Q4_0/Q5_0/Q8_0 reference ops.h:25-31,89-92 &
// gguf_test.cpp:253-267 (nibble order); Q4_K/Q6_K superblocks reference
// ops.h:11-23 and ops.cpp:958-1043.

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

// IEEE binary16 -> binary32, bit-exact (same contract as np.float16).
inline float f16_to_f32(uint16_t h) {
  const uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
  uint32_t exp = (h >> 10) & 0x1F;
  uint32_t man = h & 0x3FF;
  uint32_t bits;
  if (exp == 0) {
    if (man == 0) {
      bits = sign;
    } else {  // subnormal: normalize
      exp = 127 - 15 + 1;
      while (!(man & 0x400)) {
        man <<= 1;
        --exp;
      }
      man &= 0x3FF;
      bits = sign | (exp << 23) | (man << 13);
    }
  } else if (exp == 0x1F) {
    bits = sign | 0x7F800000u | (man << 13);
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (man << 13);
  }
  float out;
  std::memcpy(&out, &bits, sizeof(out));
  return out;
}

// binary32 -> binary16 with round-to-nearest-even (np.float16 semantics).
inline uint16_t f32_to_f16(float f) {
  uint32_t x;
  std::memcpy(&x, &f, sizeof(x));
  const uint32_t sign = (x >> 16) & 0x8000u;
  x &= 0x7FFFFFFFu;
  if (x >= 0x7F800000u) {  // inf/nan
    return (uint16_t)(sign | 0x7C00u | (x > 0x7F800000u ? 0x200u : 0));
  }
  if (x < 0x38800000u) {  // subnormal or zero
    // value = man24 * 2^(e-150); f16 subnormal unit is 2^-24, so the
    // result quantum count is man24 >> (126 - e), rounded to nearest-even.
    uint32_t e = x >> 23;
    if (e < 102) return (uint16_t)sign;  // < 2^-25: underflows to zero
    uint32_t shift = 126 - e;            // 14..24 here
    uint32_t man = (x & 0x7FFFFFu) | 0x800000u;
    uint32_t rounded = man >> shift;
    uint32_t rem = man & ((1u << shift) - 1);
    uint32_t half = 1u << (shift - 1);
    if (rem > half || (rem == half && (rounded & 1))) ++rounded;
    return (uint16_t)(sign | rounded);
  }
  // normal
  uint32_t exp = (x >> 23) - 127 + 15;
  uint32_t man = x & 0x7FFFFFu;
  if (exp >= 0x1F) return (uint16_t)(sign | 0x7C00u);
  uint16_t out = (uint16_t)(sign | (exp << 10) | (man >> 13));
  uint32_t rem = man & 0x1FFFu;
  if (rem > 0x1000u || (rem == 0x1000u && (out & 1))) ++out;
  return out;
}

inline uint16_t f32_to_bf16(float f) {
  uint32_t bits;
  std::memcpy(&bits, &f, sizeof(bits));
  uint32_t rounded = bits + 0x7FFFu + ((bits >> 16) & 1);
  return (uint16_t)(rounded >> 16);
}

// round-to-nearest-even (the reference's magic-number nearest_int,
// reference ops.cpp:107-113)
inline int nearest_int(float v) {
  float x = v + 12582912.0f;
  int i;
  std::memcpy(&i, &x, sizeof(i));
  return (i & 0x007fffff) - 0x00400000;
}

// Q4_K 6-bit scale/min unpack (reference get_scale_min_k4, ops.cpp:964-972)
inline void scale_min_k4(const uint8_t* s, int j, uint8_t* sc, uint8_t* m) {
  if (j < 4) {
    *sc = s[j] & 63;
    *m = s[j + 4] & 63;
  } else {
    *sc = (s[j + 4] & 0x0F) | ((s[j - 4] >> 6) << 4);
    *m = (s[j + 4] >> 4) | ((s[j] >> 6) << 4);
  }
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// repack: raw row-major block bytes -> planar int8 [R, C] + f32 scales
// (+ f32 offsets for Q4_K). Group sizes: 32 (Q4_0/Q5_0/Q8_0/Q4_K), 16 (Q6_K).

void repack_q4_0(const uint8_t* src, int64_t n_rows, int64_t n_cols,
                 int8_t* q, float* scale) {
  const int64_t nb = n_cols / 32;
  for (int64_t r = 0; r < n_rows; ++r) {
    for (int64_t b = 0; b < nb; ++b) {
      const uint8_t* blk = src + (r * nb + b) * 18;
      uint16_t d16;
      std::memcpy(&d16, blk, 2);
      scale[r * nb + b] = f16_to_f32(d16);
      int8_t* out = q + (r * nb + b) * 32;
      const uint8_t* qs = blk + 2;
      for (int i = 0; i < 16; ++i) {
        out[i] = (int8_t)(qs[i] & 0x0F) - 8;
        out[i + 16] = (int8_t)(qs[i] >> 4) - 8;
      }
    }
  }
}

void repack_q8_0(const uint8_t* src, int64_t n_rows, int64_t n_cols,
                 int8_t* q, float* scale) {
  const int64_t nb = n_cols / 32;
  for (int64_t r = 0; r < n_rows; ++r) {
    for (int64_t b = 0; b < nb; ++b) {
      const uint8_t* blk = src + (r * nb + b) * 34;
      uint16_t d16;
      std::memcpy(&d16, blk, 2);
      scale[r * nb + b] = f16_to_f32(d16);
      std::memcpy(q + (r * nb + b) * 32, blk + 2, 32);
    }
  }
}

void repack_q5_0(const uint8_t* src, int64_t n_rows, int64_t n_cols,
                 int8_t* q, float* scale) {
  const int64_t nb = n_cols / 32;
  for (int64_t r = 0; r < n_rows; ++r) {
    for (int64_t b = 0; b < nb; ++b) {
      const uint8_t* blk = src + (r * nb + b) * 22;
      uint16_t d16;
      std::memcpy(&d16, blk, 2);
      scale[r * nb + b] = f16_to_f32(d16);
      uint32_t qh;
      std::memcpy(&qh, blk + 2, 4);
      const uint8_t* qs = blk + 6;
      int8_t* out = q + (r * nb + b) * 32;
      for (int i = 0; i < 16; ++i) {
        out[i] = (int8_t)((qs[i] & 0x0F) | (((qh >> i) & 1) << 4)) - 16;
        out[i + 16] = (int8_t)((qs[i] >> 4) | (((qh >> (i + 16)) & 1) << 4)) - 16;
      }
    }
  }
}

void repack_q4_k(const uint8_t* src, int64_t n_rows, int64_t n_cols,
                 int8_t* q, float* scale, float* offset) {
  const int64_t nb = n_cols / 256;
  for (int64_t r = 0; r < n_rows; ++r) {
    for (int64_t b = 0; b < nb; ++b) {
      const uint8_t* blk = src + (r * nb + b) * 144;
      uint16_t d16, dmin16;
      std::memcpy(&d16, blk, 2);
      std::memcpy(&dmin16, blk + 2, 2);
      const float d = f16_to_f32(d16);
      const float dmin = f16_to_f32(dmin16);
      const uint8_t* scales = blk + 4;
      const uint8_t* qs = blk + 16;
      int8_t* out = q + (r * nb + b) * 256;
      for (int g = 0; g < 8; ++g) {
        uint8_t sc, m;
        scale_min_k4(scales, g, &sc, &m);
        scale[(r * nb + b) * 8 + g] = d * (float)sc;
        offset[(r * nb + b) * 8 + g] = dmin * (float)m;
        const uint8_t* chunk = qs + 32 * (g / 2);
        for (int i = 0; i < 32; ++i) {
          out[32 * g + i] = (int8_t)((g % 2) ? (chunk[i] >> 4) : (chunk[i] & 0x0F));
        }
      }
    }
  }
}

void repack_q6_k(const uint8_t* src, int64_t n_rows, int64_t n_cols,
                 int8_t* q, float* scale) {
  const int64_t nb = n_cols / 256;
  for (int64_t r = 0; r < n_rows; ++r) {
    for (int64_t b = 0; b < nb; ++b) {
      const uint8_t* blk = src + (r * nb + b) * 210;
      const uint8_t* ql = blk;
      const uint8_t* qh = blk + 128;
      const int8_t* scales = (const int8_t*)(blk + 192);
      uint16_t d16;
      std::memcpy(&d16, blk + 208, 2);
      const float d = f16_to_f32(d16);
      for (int g = 0; g < 16; ++g) scale[(r * nb + b) * 16 + g] = d * (float)scales[g];
      int8_t* out = q + (r * nb + b) * 256;
      for (int half = 0; half < 2; ++half) {
        const uint8_t* qlc = ql + 64 * half;
        const uint8_t* qhc = qh + 32 * half;
        int8_t* o = out + 128 * half;
        for (int i = 0; i < 32; ++i) {
          o[i] = (int8_t)((qlc[i] & 0x0F) | (((qhc[i] >> 0) & 3) << 4)) - 32;
          o[i + 32] = (int8_t)((qlc[i + 32] & 0x0F) | (((qhc[i] >> 2) & 3) << 4)) - 32;
          o[i + 64] = (int8_t)((qlc[i] >> 4) | (((qhc[i] >> 4) & 3) << 4)) - 32;
          o[i + 96] = (int8_t)((qlc[i + 32] >> 4) | (((qhc[i] >> 6) & 3) << 4)) - 32;
        }
      }
    }
  }
}

// ---------------------------------------------------------------------------
// direct-to-bf16 dequant for serve-mode loads (fmt codes = GGMLType values)

int dequant_bf16(const uint8_t* src, int fmt, int64_t n_rows, int64_t n_cols,
                 uint16_t* out) {
  const int64_t n = n_rows * n_cols;
  switch (fmt) {
    case 0: {  // F32
      const float* p = (const float*)src;
      for (int64_t i = 0; i < n; ++i) out[i] = f32_to_bf16(p[i]);
      return 0;
    }
    case 1: {  // F16
      const uint16_t* p = (const uint16_t*)src;
      for (int64_t i = 0; i < n; ++i) out[i] = f32_to_bf16(f16_to_f32(p[i]));
      return 0;
    }
    case 30: {  // BF16: identity
      std::memcpy(out, src, n * 2);
      return 0;
    }
    case 2: {  // Q4_0
      const int64_t nb = n_cols / 32;
      for (int64_t r = 0; r < n_rows; ++r)
        for (int64_t b = 0; b < nb; ++b) {
          const uint8_t* blk = src + (r * nb + b) * 18;
          uint16_t d16;
          std::memcpy(&d16, blk, 2);
          const float d = f16_to_f32(d16);
          const uint8_t* qs = blk + 2;
          uint16_t* o = out + r * n_cols + b * 32;
          for (int i = 0; i < 16; ++i) {
            o[i] = f32_to_bf16(((int)(qs[i] & 0x0F) - 8) * d);
            o[i + 16] = f32_to_bf16(((int)(qs[i] >> 4) - 8) * d);
          }
        }
      return 0;
    }
    case 8: {  // Q8_0
      const int64_t nb = n_cols / 32;
      for (int64_t r = 0; r < n_rows; ++r)
        for (int64_t b = 0; b < nb; ++b) {
          const uint8_t* blk = src + (r * nb + b) * 34;
          uint16_t d16;
          std::memcpy(&d16, blk, 2);
          const float d = f16_to_f32(d16);
          const int8_t* qs = (const int8_t*)(blk + 2);
          uint16_t* o = out + r * n_cols + b * 32;
          for (int i = 0; i < 32; ++i) o[i] = f32_to_bf16(qs[i] * d);
        }
      return 0;
    }
    case 6: {  // Q5_0
      const int64_t nb = n_cols / 32;
      for (int64_t r = 0; r < n_rows; ++r)
        for (int64_t b = 0; b < nb; ++b) {
          const uint8_t* blk = src + (r * nb + b) * 22;
          uint16_t d16;
          std::memcpy(&d16, blk, 2);
          const float d = f16_to_f32(d16);
          uint32_t qh;
          std::memcpy(&qh, blk + 2, 4);
          const uint8_t* qs = blk + 6;
          uint16_t* o = out + r * n_cols + b * 32;
          for (int i = 0; i < 16; ++i) {
            o[i] = f32_to_bf16((float)((int)((qs[i] & 0x0F) | (((qh >> i) & 1) << 4)) - 16) * d);
            o[i + 16] = f32_to_bf16(
                (float)((int)((qs[i] >> 4) | (((qh >> (i + 16)) & 1) << 4)) - 16) * d);
          }
        }
      return 0;
    }
    case 12: {  // Q4_K
      const int64_t nb = n_cols / 256;
      for (int64_t r = 0; r < n_rows; ++r)
        for (int64_t b = 0; b < nb; ++b) {
          const uint8_t* blk = src + (r * nb + b) * 144;
          uint16_t d16, dmin16;
          std::memcpy(&d16, blk, 2);
          std::memcpy(&dmin16, blk + 2, 2);
          const float d = f16_to_f32(d16), dmin = f16_to_f32(dmin16);
          const uint8_t* scales = blk + 4;
          const uint8_t* qs = blk + 16;
          uint16_t* o = out + r * n_cols + b * 256;
          for (int g = 0; g < 8; ++g) {
            uint8_t sc, m;
            scale_min_k4(scales, g, &sc, &m);
            const float es = d * sc, em = dmin * m;
            const uint8_t* chunk = qs + 32 * (g / 2);
            for (int i = 0; i < 32; ++i) {
              int v = (g % 2) ? (chunk[i] >> 4) : (chunk[i] & 0x0F);
              o[32 * g + i] = f32_to_bf16(es * v - em);
            }
          }
        }
      return 0;
    }
    case 14: {  // Q6_K
      const int64_t nb = n_cols / 256;
      for (int64_t r = 0; r < n_rows; ++r)
        for (int64_t b = 0; b < nb; ++b) {
          const uint8_t* blk = src + (r * nb + b) * 210;
          const uint8_t* ql = blk;
          const uint8_t* qh = blk + 128;
          const int8_t* scales = (const int8_t*)(blk + 192);
          uint16_t d16;
          std::memcpy(&d16, blk + 208, 2);
          const float d = f16_to_f32(d16);
          uint16_t* o = out + r * n_cols + b * 256;
          for (int half = 0; half < 2; ++half) {
            const uint8_t* qlc = ql + 64 * half;
            const uint8_t* qhc = qh + 32 * half;
            uint16_t* oo = o + 128 * half;
            for (int i = 0; i < 32; ++i) {
              int q0 = ((qlc[i] & 0x0F) | (((qhc[i] >> 0) & 3) << 4)) - 32;
              int q1 = ((qlc[i + 32] & 0x0F) | (((qhc[i] >> 2) & 3) << 4)) - 32;
              int q2 = ((qlc[i] >> 4) | (((qhc[i] >> 4) & 3) << 4)) - 32;
              int q3 = ((qlc[i + 32] >> 4) | (((qhc[i] >> 6) & 3) << 4)) - 32;
              const int col = 128 * half;
              oo[i] = f32_to_bf16(d * scales[(col + i) / 16] * q0);
              oo[i + 32] = f32_to_bf16(d * scales[(col + i + 32) / 16] * q1);
              oo[i + 64] = f32_to_bf16(d * scales[(col + i + 64) / 16] * q2);
              oo[i + 96] = f32_to_bf16(d * scales[(col + i + 96) / 16] * q3);
            }
          }
        }
      return 0;
    }
    default:
      return -1;
  }
}

// ---------------------------------------------------------------------------
// fast encoders for fixture/benchmark generation

void encode_q4_0(const float* w, int64_t n_rows, int64_t n_cols, uint8_t* out) {
  const int64_t nb = n_cols / 32;
  for (int64_t r = 0; r < n_rows; ++r) {
    for (int64_t b = 0; b < nb; ++b) {
      const float* x = w + r * n_cols + b * 32;
      float amax = 0.0f;
      for (int i = 0; i < 32; ++i) {
        float a = std::fabs(x[i]);
        if (a > amax) amax = a;
      }
      float d = amax < 1e-8f ? 1e-8f : amax / 7.0f;
      uint8_t* blk = out + (r * nb + b) * 18;
      uint16_t d16 = f32_to_f16(d);
      std::memcpy(blk, &d16, 2);
      uint8_t* qs = blk + 2;
      for (int i = 0; i < 16; ++i) {
        int lo = nearest_int(x[i] / d);
        int hi = nearest_int(x[i + 16] / d);
        lo = lo < -8 ? -8 : (lo > 7 ? 7 : lo);
        hi = hi < -8 ? -8 : (hi > 7 ? 7 : hi);
        qs[i] = (uint8_t)((lo + 8) | ((hi + 8) << 4));
      }
    }
  }
}

void encode_f16(const float* w, int64_t n, uint16_t* out) {
  for (int64_t i = 0; i < n; ++i) out[i] = f32_to_f16(w[i]);
}

// Cache-blocked int8 transpose: dst[c, r] = src[r, c]. The capacity
// loader's hot copy — numpy's strided int8 transpose runs ~1 GB/s
// scalar; 128x128 tiles keep both streams in L1/L2.
void transpose_i8(const int8_t* src, int64_t rows, int64_t cols,
                  int8_t* dst) {
  constexpr int64_t T = 128;
  for (int64_t r0 = 0; r0 < rows; r0 += T) {
    const int64_t r1 = r0 + T < rows ? r0 + T : rows;
    for (int64_t c0 = 0; c0 < cols; c0 += T) {
      const int64_t c1 = c0 + T < cols ? c0 + T : cols;
      for (int64_t r = r0; r < r1; ++r) {
        const int8_t* s = src + r * cols;
        for (int64_t c = c0; c < c1; ++c) dst[c * rows + r] = s[c];
      }
    }
  }
}

}  // extern "C"
