// Native host-side data-path kernels for the dcpt_tpu loader.
//
// The reference's native layer is CUDA compute ops; on TPU the device compute
// is Pallas/XLA, and the native-code need moves to the HOST runtime: the data
// loader's per-image conversion (uint8 BGR HWC -> float32 RGB, /255, optional
// mean/std) and batch packing, which in pure numpy costs several temporaries
// per sample. These kernels do it in one fused pass per image, writing
// directly into the preallocated NHWC batch slot, parallelised across threads
// by the loader.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libpack_kernels.so pack_kernels.cpp
// Loaded via ctypes (dcpt_tpu/native/__init__.py); pure-numpy fallback when
// the toolchain is unavailable.

#include <cmath>
#include <cstdint>
#include <cstddef>

extern "C" {

// uint8 HWC (any channel count) -> float32 HWC, /255, optional BGR->RGB swap.
void u8_to_f32(const uint8_t* src, float* dst, int64_t h, int64_t w, int64_t c,
               int swap_rb) {
  const int64_t n = h * w;
  if (swap_rb && c == 3) {
    for (int64_t i = 0; i < n; ++i) {
      const uint8_t* p = src + i * 3;
      float* q = dst + i * 3;
      q[0] = p[2] * (1.0f / 255.0f);
      q[1] = p[1] * (1.0f / 255.0f);
      q[2] = p[0] * (1.0f / 255.0f);
    }
  } else {
    const int64_t total = n * c;
    for (int64_t i = 0; i < total; ++i) dst[i] = src[i] * (1.0f / 255.0f);
  }
}

// float32 HWC -> float32 HWC with mean/std normalisation fused in.
void f32_normalize(const float* src, float* dst, int64_t h, int64_t w,
                   int64_t c, const float* mean, const float* inv_std) {
  const int64_t n = h * w;
  for (int64_t i = 0; i < n; ++i) {
    const float* p = src + i * c;
    float* q = dst + i * c;
    for (int64_t k = 0; k < c; ++k) q[k] = (p[k] - mean[k]) * inv_std[k];
  }
}

// float32 [0,1] HWC RGB -> uint8 HWC BGR with round-half-even (the tensor2img
// hot path for saving validation images).
void f32_to_u8_bgr(const float* src, uint8_t* dst, int64_t h, int64_t w,
                   int64_t c) {
  const int64_t n = h * w;
  if (c == 3) {
    for (int64_t i = 0; i < n; ++i) {
      const float* p = src + i * 3;
      uint8_t* q = dst + i * 3;
      for (int k = 0; k < 3; ++k) {
        float v = p[2 - k];
        v = v < 0.0f ? 0.0f : (v > 1.0f ? 1.0f : v);
        q[k] = (uint8_t)nearbyintf(v * 255.0f);
      }
    }
  } else {
    const int64_t total = n * c;
    for (int64_t i = 0; i < total; ++i) {
      float v = src[i];
      v = v < 0.0f ? 0.0f : (v > 1.0f ? 1.0f : v);
      dst[i] = (uint8_t)nearbyintf(v * 255.0f);
    }
  }
}

}  // extern "C"
