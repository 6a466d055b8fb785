// Host-side data-path kernels for the TPU input pipeline.
//
// The reference's training input pipeline burns host CPU in
// torchvision ToTensor+Normalize (uint8 HWC -> fp32 CHW in [-1,1],
// `/root/reference/f_lite/data.py:146-153`). On TPU the pipeline is
// NHWC and the equivalent numpy chain allocates twice; this does it in
// one fused OpenMP pass. Bound via ctypes (no pybind11 in this image).
//
// Build: `make -C f_lite_tpu/native` (or python -m f_lite_tpu.native).

#include <cmath>
#include <cstdint>
#include <cstddef>

extern "C" {

// uint8 HWC -> float32 HWC in [-1, 1]; n = total elements.
void normalize_u8_to_f32(const uint8_t* in, float* out, size_t n) {
    // division form keeps endpoints exact: 255 -> 1.0f, 0 -> -1.0f
#pragma omp parallel for schedule(static)
    for (ptrdiff_t i = 0; i < (ptrdiff_t)n; ++i) {
        out[i] = (float)in[i] / 255.0f * 2.0f - 1.0f;
    }
}

// Batched variant with horizontal flip support: images (B, H, W, C) u8,
// flags (B,) nonzero => mirror along W. Output fp32 [-1, 1].
void normalize_batch_u8_to_f32(
    const uint8_t* in, float* out,
    size_t b, size_t h, size_t w, size_t c,
    const uint8_t* flip_flags) {
    const size_t img = h * w * c;
    const size_t row = w * c;
#pragma omp parallel for collapse(2) schedule(static)
    for (ptrdiff_t bi = 0; bi < (ptrdiff_t)b; ++bi) {
        for (ptrdiff_t y = 0; y < (ptrdiff_t)h; ++y) {
            const uint8_t* src = in + bi * img + y * row;
            float* dst = out + bi * img + y * row;
            if (flip_flags && flip_flags[bi]) {
                for (size_t x = 0; x < w; ++x) {
                    const uint8_t* sp = src + (w - 1 - x) * c;
                    float* dp = dst + x * c;
                    for (size_t ch = 0; ch < c; ++ch)
                        dp[ch] = (float)sp[ch] / 255.0f * 2.0f - 1.0f;
                }
            } else {
                for (size_t i = 0; i < row; ++i)
                    dst[i] = (float)src[i] / 255.0f * 2.0f - 1.0f;
            }
        }
    }
}

// fp32 [-1,1] NHWC -> uint8 RGB (postprocess: (x/2+0.5)*255 rounded,
// `pipeline.py:324-326`).
void denormalize_f32_to_u8(const float* in, uint8_t* out, size_t n) {
#pragma omp parallel for schedule(static)
    for (ptrdiff_t i = 0; i < (ptrdiff_t)n; ++i) {
        float v = (in[i] * 0.5f + 0.5f) * 255.0f;
        v = v < 0.0f ? 0.0f : (v > 255.0f ? 255.0f : v);
        // half-to-even, matching np.round / torch .round()
        out[i] = (uint8_t)nearbyintf(v);
    }
}

}  // extern "C"
