// DCNv2 forward, CPU reference implementation — kernel parity oracle.
//
// The reference ships a C++ CPU DCNv2 (DCNv2/src/cpu/dcn_v2_cpu.cpp) used for
// CPU-only demos and as the gradcheck target. This is an independent NHWC
// implementation of the documented sampling semantics (see
// centerpose_tpu/ops/dcn.py) used to cross-validate the Pallas/XLA kernels from a
// second, non-JAX codebase. C ABI for ctypes.

#include <cmath>
#include <cstring>

namespace {

inline float bilinear(const float *x, int h, int w, int c, float py, float px,
                      int ch) {
  // Zero outside; partial corners on the border (CUDA sampler semantics).
  int y0 = static_cast<int>(std::floor(py));
  int x0 = static_cast<int>(std::floor(px));
  float fy = py - y0, fx = px - x0;
  float out = 0.f;
  for (int dy = 0; dy < 2; ++dy) {
    int yy = y0 + dy;
    if (yy < 0 || yy >= h) continue;
    float wy = dy ? fy : 1.f - fy;
    for (int dx = 0; dx < 2; ++dx) {
      int xx = x0 + dx;
      if (xx < 0 || xx >= w) continue;
      float wx = dx ? fx : 1.f - fx;
      out += wy * wx * x[(yy * w + xx) * c + ch];
    }
  }
  return out;
}

}  // namespace

extern "C" {

// x:      [B, H, W, C]        (NHWC, float32)
// offset: [B, Ho, Wo, 2*K*K]  interleaved (dy, dx) per tap, row-major taps
// mask:   [B, Ho, Wo, K*K]
// weight: [K, K, C, Co]       (HWIO)
// bias:   [Co]
// out:    [B, Ho, Wo, Co]
void dcn_v2_forward_cpu(const float *x, const float *offset, const float *mask,
                        const float *weight, const float *bias, float *out,
                        int b, int h, int w, int c, int ho, int wo, int co,
                        int kh, int kw, int stride, int pad, int dilation) {
  const int kk = kh * kw;
  for (int n = 0; n < b; ++n) {
    const float *xb = x + static_cast<long>(n) * h * w * c;
    for (int oy = 0; oy < ho; ++oy) {
      for (int ox = 0; ox < wo; ++ox) {
        long pix = ((static_cast<long>(n) * ho + oy) * wo + ox);
        const float *off = offset + pix * 2 * kk;
        const float *m = mask + pix * kk;
        float *dst = out + pix * co;
        for (int j = 0; j < co; ++j) dst[j] = bias[j];
        for (int ki = 0; ki < kh; ++ki) {
          for (int kj = 0; kj < kw; ++kj) {
            int t = ki * kw + kj;
            float py = oy * stride - pad + ki * dilation + off[2 * t];
            float px = ox * stride - pad + kj * dilation + off[2 * t + 1];
            if (py <= -1.f || py >= h || px <= -1.f || px >= w) continue;
            for (int ch = 0; ch < c; ++ch) {
              float v = bilinear(xb, h, w, c, py, px, ch) * m[t];
              if (v == 0.f) continue;
              const float *wrow = weight + ((ki * kw + kj) * c + ch) * co;
              for (int j = 0; j < co; ++j) dst[j] += v * wrow[j];
            }
          }
        }
      }
    }
  }
}

}  // extern "C"
