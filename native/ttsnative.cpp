// ttsnative — native data-path kernels for the tts_tpu loader/quantizer.
//
// TPU-era equivalent of the reference's native runtime plumbing
// (ggml-patches/llama-mmap + ggml_quantize_chunk): the GGUF payloads are
// mmap'd by the Python reader, and this library provides the hot
// byte-crunching over them:
//   * unpack_*_transposed: ggml quant blocks -> planar (K, N) codes +
//     (K/32, N) scales in the device layout consumed by the Pallas
//     dequant-matmul (single pass, no intermediate copies).
//   * quantize_*: float rows -> ggml blocks, threaded across rows
//     (reference quantize_impl.cpp:104-163 uses the same row striping).
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int QK = 32;

inline float fp16_to_fp32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t mant = h & 0x3FF;
    uint32_t f;
    if (exp == 0) {
        if (mant == 0) {
            f = sign;
        } else {
            exp = 127 - 15 + 1;
            while (!(mant & 0x400)) { mant <<= 1; exp--; }
            mant &= 0x3FF;
            f = sign | (exp << 23) | (mant << 13);
        }
    } else if (exp == 31) {
        f = sign | 0x7F800000 | (mant << 13);
    } else {
        f = sign | ((exp - 15 + 127) << 23) | (mant << 13);
    }
    float out;
    std::memcpy(&out, &f, 4);
    return out;
}

inline uint16_t fp32_to_fp16(float v) {
    uint32_t f;
    std::memcpy(&f, &v, 4);
    uint32_t sign = (f >> 16) & 0x8000;
    int32_t exp = ((f >> 23) & 0xFF) - 127 + 15;
    uint32_t mant = f & 0x7FFFFF;
    if (exp <= 0) {
        if (exp < -10) return (uint16_t)sign;
        mant |= 0x800000;
        uint32_t shift = 14 - exp;
        uint16_t h = (uint16_t)(sign | (mant >> shift));
        if ((mant >> (shift - 1)) & 1) h++;
        return h;
    }
    if (exp >= 31) return (uint16_t)(sign | 0x7C00);
    uint16_t h = (uint16_t)(sign | (exp << 10) | (mant >> 13));
    if (mant & 0x1000) h++;
    return h;
}

template <typename Fn>
void parallel_rows(int64_t n_rows, int n_threads, Fn&& fn) {
    if (n_threads <= 1 || n_rows < 2) {
        fn(0, n_rows);
        return;
    }
    n_threads = (int)std::min<int64_t>(n_threads, n_rows);
    std::vector<std::thread> workers;
    int64_t chunk = (n_rows + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; t++) {
        int64_t lo = t * chunk;
        int64_t hi = std::min<int64_t>(lo + chunk, n_rows);
        if (lo >= hi) break;
        workers.emplace_back([lo, hi, &fn] { fn(lo, hi); });
    }
    for (auto& w : workers) w.join();
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// unpack: raw blocks (rows x cols, row-major blocks) -> transposed planar.
// codes_t has shape (cols, rows) [stride rows], scales_t (cols/32, rows).
// ---------------------------------------------------------------------------

void tts_unpack_q4_transposed(const uint8_t* raw, int64_t rows, int64_t cols,
                              int8_t* codes_t, float* scales_t, int n_threads) {
    const int64_t nb = cols / QK;
    parallel_rows(rows, n_threads, [&](int64_t lo, int64_t hi) {
        for (int64_t r = lo; r < hi; r++) {
            const uint8_t* p = raw + r * nb * 18;
            for (int64_t b = 0; b < nb; b++) {
                uint16_t d16;
                std::memcpy(&d16, p, 2);
                scales_t[(b)*rows + r] = fp16_to_fp32(d16);
                const uint8_t* qs = p + 2;
                const int64_t base = b * QK;
                for (int j = 0; j < 16; j++) {
                    codes_t[(base + j) * rows + r] = (int8_t)(qs[j] & 0x0F);
                    codes_t[(base + 16 + j) * rows + r] = (int8_t)(qs[j] >> 4);
                }
                p += 18;
            }
        }
    });
}

void tts_unpack_q5_transposed(const uint8_t* raw, int64_t rows, int64_t cols,
                              int8_t* codes_t, float* scales_t, int n_threads) {
    const int64_t nb = cols / QK;
    parallel_rows(rows, n_threads, [&](int64_t lo, int64_t hi) {
        for (int64_t r = lo; r < hi; r++) {
            const uint8_t* p = raw + r * nb * 22;
            for (int64_t b = 0; b < nb; b++) {
                uint16_t d16;
                uint32_t qh;
                std::memcpy(&d16, p, 2);
                std::memcpy(&qh, p + 2, 4);
                scales_t[(b)*rows + r] = fp16_to_fp32(d16);
                const uint8_t* qs = p + 6;
                const int64_t base = b * QK;
                for (int j = 0; j < 16; j++) {
                    int hi_lo = ((qh >> j) & 1) << 4;
                    int hi_hi = ((qh >> (j + 16)) & 1) << 4;
                    codes_t[(base + j) * rows + r] = (int8_t)((qs[j] & 0x0F) | hi_lo);
                    codes_t[(base + 16 + j) * rows + r] = (int8_t)((qs[j] >> 4) | hi_hi);
                }
                p += 22;
            }
        }
    });
}

void tts_unpack_q8_transposed(const uint8_t* raw, int64_t rows, int64_t cols,
                              int8_t* codes_t, float* scales_t, int n_threads) {
    const int64_t nb = cols / QK;
    parallel_rows(rows, n_threads, [&](int64_t lo, int64_t hi) {
        for (int64_t r = lo; r < hi; r++) {
            const uint8_t* p = raw + r * nb * 34;
            for (int64_t b = 0; b < nb; b++) {
                uint16_t d16;
                std::memcpy(&d16, p, 2);
                scales_t[(b)*rows + r] = fp16_to_fp32(d16);
                const int8_t* qs = (const int8_t*)(p + 2);
                const int64_t base = b * QK;
                for (int j = 0; j < QK; j++) {
                    codes_t[(base + j) * rows + r] = qs[j];
                }
                p += 34;
            }
        }
    });
}

// ---------------------------------------------------------------------------
// quantize: float rows -> ggml blocks (threaded). Matches ggml reference
// rounding (signed absmax scaling, round-half-away / truncate-plus-half).
// ---------------------------------------------------------------------------

void tts_quantize_q4_0(const float* x, int64_t rows, int64_t cols,
                       uint8_t* out, int n_threads) {
    const int64_t nb = cols / QK;
    parallel_rows(rows, n_threads, [&](int64_t lo, int64_t hi) {
        for (int64_t r = lo; r < hi; r++) {
            const float* px = x + r * cols;
            uint8_t* p = out + r * nb * 18;
            for (int64_t b = 0; b < nb; b++) {
                const float* v = px + b * QK;
                float amax = 0.0f, m = 0.0f;
                for (int j = 0; j < QK; j++) {
                    if (std::fabs(v[j]) > amax) { amax = std::fabs(v[j]); m = v[j]; }
                }
                float d = m / -8.0f;
                float inv = d != 0.0f ? 1.0f / d : 0.0f;
                uint16_t d16 = fp32_to_fp16(d);
                std::memcpy(p, &d16, 2);
                for (int j = 0; j < 16; j++) {
                    uint8_t lo4 = (uint8_t)std::min(15.0f, v[j] * inv + 8.5f);
                    uint8_t hi4 = (uint8_t)std::min(15.0f, v[j + 16] * inv + 8.5f);
                    p[2 + j] = (uint8_t)(lo4 | (hi4 << 4));
                }
                p += 18;
            }
        }
    });
}

void tts_quantize_q5_0(const float* x, int64_t rows, int64_t cols,
                       uint8_t* out, int n_threads) {
    const int64_t nb = cols / QK;
    parallel_rows(rows, n_threads, [&](int64_t lo, int64_t hi) {
        for (int64_t r = lo; r < hi; r++) {
            const float* px = x + r * cols;
            uint8_t* p = out + r * nb * 22;
            for (int64_t b = 0; b < nb; b++) {
                const float* v = px + b * QK;
                float amax = 0.0f, m = 0.0f;
                for (int j = 0; j < QK; j++) {
                    if (std::fabs(v[j]) > amax) { amax = std::fabs(v[j]); m = v[j]; }
                }
                float d = m / -16.0f;
                float inv = d != 0.0f ? 1.0f / d : 0.0f;
                uint16_t d16 = fp32_to_fp16(d);
                std::memcpy(p, &d16, 2);
                uint32_t qh = 0;
                for (int j = 0; j < 16; j++) {
                    uint8_t q0 = (uint8_t)std::min(31.0f, std::max(0.0f, v[j] * inv + 16.5f));
                    uint8_t q1 = (uint8_t)std::min(31.0f, std::max(0.0f, v[j + 16] * inv + 16.5f));
                    p[6 + j] = (uint8_t)((q0 & 0x0F) | ((q1 & 0x0F) << 4));
                    qh |= (uint32_t)(q0 >> 4) << j;
                    qh |= (uint32_t)(q1 >> 4) << (j + 16);
                }
                std::memcpy(p + 2, &qh, 4);
                p += 22;
            }
        }
    });
}

void tts_quantize_q8_0(const float* x, int64_t rows, int64_t cols,
                       uint8_t* out, int n_threads) {
    const int64_t nb = cols / QK;
    parallel_rows(rows, n_threads, [&](int64_t lo, int64_t hi) {
        for (int64_t r = lo; r < hi; r++) {
            const float* px = x + r * cols;
            uint8_t* p = out + r * nb * 34;
            for (int64_t b = 0; b < nb; b++) {
                const float* v = px + b * QK;
                float amax = 0.0f;
                for (int j = 0; j < QK; j++) amax = std::max(amax, std::fabs(v[j]));
                float d = amax / 127.0f;
                float inv = d != 0.0f ? 1.0f / d : 0.0f;
                uint16_t d16 = fp32_to_fp16(d);
                std::memcpy(p, &d16, 2);
                int8_t* q = (int8_t*)(p + 2);
                for (int j = 0; j < QK; j++) {
                    float s = v[j] * inv;
                    q[j] = (int8_t)std::max(-128.0f, std::min(127.0f, std::roundf(s)));
                }
                p += 34;
            }
        }
    });
}

int tts_native_abi_version(void) { return 1; }

}  // extern "C"
