// Test-only C ABI wrapper around the reference engine, used as a golden
// oracle for cross-engine parity tests (the same role llama.cpp's
// eval-callback plays for the reference itself — see SURVEY.md §2 C16).
//
// This file is original glue code; the reference sources are compiled from
// /root/reference at test time (see tests/oracle_harness.py) and are NOT
// vendored into this repository.

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

#include "gguf.h"
#include "model.h"
#include "ops.h"

bool verbose_g = false;  // required by the reference's common.h logging macros

namespace {
struct Engine {
  GGUFFile gguf;
  Model model;
  explicit Engine(const uint8_t* data, size_t size) : gguf(data, size), model(gguf) {}
};
}  // namespace

extern "C" {

void oracle_init(int n_threads) { init_ops(n_threads); }

// Toggle the reference's VERBOSE named-activation dump (tensor.h:22-85);
// the parity harness captures stdout and parses it.
void oracle_set_verbose(int v) { verbose_g = v != 0; }

void* oracle_gguf_open(const uint8_t* data, size_t size) {
  try {
    return new GGUFFile(data, size);
  } catch (...) {
    return nullptr;
  }
}

void oracle_gguf_close(void* f) { delete static_cast<GGUFFile*>(f); }

// Dequantize a full tensor (by name) to f32, using the reference row codecs.
// Returns number of elements written, or -1 on error.
long oracle_dequant(void* fp, const char* name, float* out) {
  auto* f = static_cast<GGUFFile*>(fp);
  for (const auto& info : f->get_tensor_infos()) {
    if (info.name != name) continue;
    const size_t n_cols = info.shape[0];
    size_t n_rows = 1;
    for (size_t i = 1; i < info.shape.size(); ++i) n_rows *= info.shape[i];
    const uint8_t* data = f->get_tensor_data(info);
    auto t = static_cast<GGUFTensorType>(info.tensor_type);
    std::vector<float> row;
    size_t row_bytes;
    switch (t) {
      case GGUFTensorType::Q4_K:
        row_bytes = n_cols / 256 * sizeof(block_q4_K);
        for (size_t r = 0; r < n_rows; ++r) {
          dequantize_q4_k_row(row, data + r * row_bytes, n_cols);
          memcpy(out + r * n_cols, row.data(), n_cols * sizeof(float));
        }
        return (long)(n_rows * n_cols);
      case GGUFTensorType::Q6_K:
        row_bytes = n_cols / 256 * sizeof(block_q6_K);
        for (size_t r = 0; r < n_rows; ++r) {
          dequantize_q6_k_row(row, data + r * row_bytes, n_cols);
          memcpy(out + r * n_cols, row.data(), n_cols * sizeof(float));
        }
        return (long)(n_rows * n_cols);
      case GGUFTensorType::Q8_0:
        row_bytes = n_cols / 32 * sizeof(BlockQ8_0);
        for (size_t r = 0; r < n_rows; ++r) {
          dequantize_q8_0_row(row, data + r * row_bytes, n_cols);
          memcpy(out + r * n_cols, row.data(), n_cols * sizeof(float));
        }
        return (long)(n_rows * n_cols);
      case GGUFTensorType::Q5_0:
        row_bytes = n_cols / 32 * sizeof(block_q5_0);
        for (size_t r = 0; r < n_rows; ++r) {
          dequantize_q5_0_row(row, data + r * row_bytes, n_cols);
          memcpy(out + r * n_cols, row.data(), n_cols * sizeof(float));
        }
        return (long)(n_rows * n_cols);
      case GGUFTensorType::Q4_0: {
        row_bytes = (n_cols + 31) / 32 * 18;
        for (size_t r = 0; r < n_rows; ++r) {
          const uint8_t* rp = data + r * row_bytes;
          for (size_t b = 0; b * 32 < n_cols; ++b) {
            uint16_t s;
            memcpy(&s, rp + b * 18, 2);
            float d = f16_to_f32(s);
            const uint8_t* q = rp + b * 18 + 2;
            for (int i = 0; i < 16; ++i) {
              out[r * n_cols + b * 32 + i] = dequantize_q4_0(q[i] & 0x0F, d);
              out[r * n_cols + b * 32 + 16 + i] = dequantize_q4_0(q[i] >> 4, d);
            }
          }
        }
        return (long)(n_rows * n_cols);
      }
      case GGUFTensorType::F16: {
        const uint16_t* p = reinterpret_cast<const uint16_t*>(data);
        for (size_t i = 0; i < n_rows * n_cols; ++i) out[i] = f16_to_f32(p[i]);
        return (long)(n_rows * n_cols);
      }
      case GGUFTensorType::BF16: {
        const uint16_t* p = reinterpret_cast<const uint16_t*>(data);
        for (size_t i = 0; i < n_rows * n_cols; ++i) out[i] = bf16_to_f32(p[i]);
        return (long)(n_rows * n_cols);
      }
      default:
        return -1;
    }
  }
  return -1;
}

// Reference quantized mat-vec: out[rows] = W(name) . x . Returns rows or -1.
long oracle_matvec(void* fp, const char* name, const float* x, long x_len, float* out) {
  auto* f = static_cast<GGUFFile*>(fp);
  for (const auto& info : f->get_tensor_infos()) {
    if (info.name != name) continue;
    std::vector<float> xv(x, x + x_len);
    std::vector<float> o;
    try {
      if (info.tensor_type == (uint32_t)GGUFTensorType::F16) {
        // The dispatcher has no F16 case; the model calls mat_vec_mul_fp16
        // directly for preloaded F16 weights (reference model.cpp:992-996).
        const size_t n_cols = info.shape[0];
        const size_t n_rows = info.shape[1];
        const uint16_t* p = reinterpret_cast<const uint16_t*>(f->get_tensor_data(info));
        std::vector<uint16_t> w(p, p + n_rows * n_cols);
        mat_vec_mul_fp16(o, w, xv, n_rows, n_cols);
      } else {
        mat_vec_mul(o, info, *f, xv);
      }
    } catch (...) {
      return -1;
    }
    memcpy(out, o.data(), o.size() * sizeof(float));
    return (long)o.size();
  }
  return -1;
}

// Reference activation quantizers, for bit-parity checks of quant/act_quant.
void oracle_quantize_q8_0(const float* x, long n, uint16_t* d_out, int8_t* q_out) {
  std::vector<float> xv(x, x + n);
  std::vector<BlockQ8_0> blocks;
  quantize_row_q8_0(xv, blocks, n);
  for (size_t i = 0; i < blocks.size(); ++i) {
    d_out[i] = blocks[i].d;
    memcpy(q_out + i * 32, blocks[i].qs, 32);
  }
}

void oracle_quantize_q8_k(const float* x, long n, float* d_out, int8_t* q_out,
                          int16_t* bsums_out) {
  std::vector<float> xv(x, x + n);
  std::vector<block_q8_K> blocks;
  quantize_row_q8_k(xv, blocks, n);
  for (size_t i = 0; i < blocks.size(); ++i) {
    d_out[i] = blocks[i].d;
    memcpy(q_out + i * 256, blocks[i].qs, 256);
    memcpy(bsums_out + i * 16, blocks[i].bsums, 16 * sizeof(int16_t));
  }
}

void* oracle_model_new(const uint8_t* data, size_t size) {
  try {
    return new Engine(data, size);
  } catch (...) {
    return nullptr;
  }
}

void oracle_model_free(void* m) { delete static_cast<Engine*>(m); }

// Full reference forward pass; writes logits for the LAST input token.
// Returns vocab size or -1.
long oracle_forward(void* mp, const int* tokens, int n_tokens, int pos, float* logits_out) {
  auto* e = static_cast<Engine*>(mp);
  std::vector<int> toks(tokens, tokens + n_tokens);
  auto result = e->model.forward(toks, pos);
  if (result.empty()) return -1;
  const auto& logits = result.back();
  memcpy(logits_out, logits.data(), logits.size() * sizeof(float));
  return (long)logits.size();
}

// Reference tokenizer. Returns token count (<= max_out) or -1.
long oracle_tokenize(void* mp, const char* prompt, int apply_chat_template, int* out,
                     long max_out) {
  auto* e = static_cast<Engine*>(mp);
  bool prefilled = false;
  std::vector<int> toks = e->model.tokenize(prompt, apply_chat_template != 0, &prefilled);
  long n = (long)toks.size();
  if (n > max_out) n = max_out;
  memcpy(out, toks.data(), n * sizeof(int));
  return n;
}

}  // extern "C"
