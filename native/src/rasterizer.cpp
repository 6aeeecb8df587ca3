// CPU rasterizer implementation. See include/gs/rasterizer.h for the
// contract. Fresh TPU-framework-native implementation of the same math as
// tpu_gaussians/ops (oracle: tests/np_oracle.py); the reference analog is
// renderer_cpu.cpp but this version differs deliberately: adaptive splat
// radius from the weight cutoff (not fixed 3-sigma), fused projection
// pass, and a single scatter loop shared by both compositing modes.

#include "gs/rasterizer.h"

#include <algorithm>
#include <cmath>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

constexpr float kWeightCutoff = 1e-5f;

struct Splat {
  float px, py;        // screen center
  float inv_sx2, inv_sy2;
  float rad_x, rad_y;  // adaptive radius where w drops below cutoff
  float opacity;
  float r, g, b;
  float z_cam;         // signed camera z (larger = closer)
  bool valid;
};

inline void mul4(const float* m, const float* v, float* out) {
  for (int i = 0; i < 4; ++i) {
    out[i] = m[i * 4 + 0] * v[0] + m[i * 4 + 1] * v[1] +
             m[i * 4 + 2] * v[2] + m[i * 4 + 3] * v[3];
  }
}

inline float clamp01(float x) { return x < 0.f ? 0.f : (x > 1.f ? 1.f : x); }

// Project one gaussian to screen space; mirrors ops/projection.py.
Splat project(const float* mean, const float* scale, const float* color,
              float opacity, const float* view, const float* proj, int width,
              int height) {
  Splat s{};
  const float p_obj[4] = {mean[0], mean[1], mean[2], 1.0f};
  float p_cam[4], p_clip[4];
  mul4(view, p_obj, p_cam);
  mul4(proj, p_cam, p_clip);

  const float w = p_clip[3];
  const float w_safe = (std::fabs(w) < 1e-8f) ? 1.0f : w;
  const float ndc_x = p_clip[0] / w_safe;
  const float ndc_y = p_clip[1] / w_safe;
  const float ndc_z = p_clip[2] / w_safe;

  s.valid = (ndc_z >= -1.0f && ndc_z <= 1.0f && w != 0.0f);
  s.px = (ndc_x * 0.5f + 0.5f) * (width - 1);
  s.py = (1.0f - (ndc_y * 0.5f + 0.5f)) * (height - 1);
  s.z_cam = p_cam[2];

  const float z_abs = std::max(std::fabs(p_cam[2]), 1e-6f);
  const float fx = std::fabs(proj[0]);
  const float fy = std::fabs(proj[5]);
  const float sx = std::max(std::fabs(scale[0]) * 0.5f * width * fx / z_abs, 1.0f);
  const float sy = std::max(std::fabs(scale[1]) * 0.5f * height * fy / z_abs, 1.0f);
  s.inv_sx2 = 1.0f / (sx * sx);
  s.inv_sy2 = 1.0f / (sy * sy);

  s.opacity = std::max(opacity, 0.0f);
  // Adaptive radius: w = op*exp(-r^2/2) >= cutoff  =>  r <= sqrt(2 ln(op/cutoff)).
  float rad = 0.0f;
  if (s.opacity > kWeightCutoff) {
    rad = std::sqrt(2.0f * std::log(s.opacity / kWeightCutoff));
  } else {
    s.valid = false;  // never exceeds the cutoff anywhere
  }
  s.rad_x = rad * sx;
  s.rad_y = rad * sy;

  s.r = clamp01(color[0]);
  s.g = clamp01(color[1]);
  s.b = clamp01(color[2]);
  return s;
}

}  // namespace

extern "C" int gs_render_f32(const float* means, const float* scales,
                             const float* colors, const float* opacities,
                             int n, int width, int height, const float* view,
                             const float* proj, const float* background,
                             int mode, float* out_rgb, float* out_alpha) {
  if (width <= 0 || height <= 0 || n < 0) return 1;
  if (!means || !scales || !colors || !opacities || !view || !proj ||
      !background || !out_rgb)
    return 2;

  const size_t pixels = static_cast<size_t>(width) * height;

  std::vector<Splat> splats(static_cast<size_t>(n));
  for (int i = 0; i < n; ++i) {
    splats[i] = project(means + i * 3, scales + i * 3, colors + i * 3,
                        opacities[i], view, proj, width, height);
  }

  std::vector<size_t> order(splats.size());
  std::iota(order.begin(), order.end(), size_t{0});
  if (mode == 1) {
    // Near-to-far: camera looks down -z, so larger z_cam is closer.
    std::stable_sort(order.begin(), order.end(), [&](size_t a, size_t b) {
      return splats[a].z_cam > splats[b].z_cam;
    });
  }

  // accum: RGB + (weight-sum or alpha) per pixel.
  std::vector<float> acc(pixels * 3, 0.0f);
  std::vector<float> acc_w(pixels, 0.0f);

  for (size_t oi = 0; oi < order.size(); ++oi) {
    const Splat& s = splats[order[oi]];
    if (!s.valid) continue;

    const int xmin = std::max(0, static_cast<int>(std::floor(s.px - s.rad_x)));
    const int xmax = std::min(width - 1, static_cast<int>(std::ceil(s.px + s.rad_x)));
    const int ymin = std::max(0, static_cast<int>(std::floor(s.py - s.rad_y)));
    const int ymax = std::min(height - 1, static_cast<int>(std::ceil(s.py + s.rad_y)));

    for (int y = ymin; y <= ymax; ++y) {
      const size_t row = static_cast<size_t>(y) * width;
      const float dy = (static_cast<float>(y) + 0.5f) - s.py;
      const float ey = dy * dy * s.inv_sy2;
      for (int x = xmin; x <= xmax; ++x) {
        const float dx = (static_cast<float>(x) + 0.5f) - s.px;
        const float e = -0.5f * (dx * dx * s.inv_sx2 + ey);
        float w = s.opacity * std::exp(e);
        if (w < kWeightCutoff) continue;
        const size_t p = row + x;
        if (mode == 1) {
          w = clamp01(w);
          const float contrib = (1.0f - acc_w[p]) * w;
          if (contrib <= 0.0f) continue;
          acc[p * 3 + 0] += contrib * s.r;
          acc[p * 3 + 1] += contrib * s.g;
          acc[p * 3 + 2] += contrib * s.b;
          acc_w[p] += contrib;
        } else {
          acc[p * 3 + 0] += w * s.r;
          acc[p * 3 + 1] += w * s.g;
          acc[p * 3 + 2] += w * s.b;
          acc_w[p] += w;
        }
      }
    }
  }

  for (size_t p = 0; p < pixels; ++p) {
    float r, g, b, a;
    if (mode == 1) {
      a = clamp01(acc_w[p]);
      r = acc[p * 3 + 0] + (1.0f - a) * background[0];
      g = acc[p * 3 + 1] + (1.0f - a) * background[1];
      b = acc[p * 3 + 2] + (1.0f - a) * background[2];
    } else {
      const float denom = 1.0f + acc_w[p];
      r = (background[0] + acc[p * 3 + 0]) / denom;
      g = (background[1] + acc[p * 3 + 1]) / denom;
      b = (background[2] + acc[p * 3 + 2]) / denom;
      a = acc_w[p] / denom;
    }
    out_rgb[p * 3 + 0] = clamp01(r);
    out_rgb[p * 3 + 1] = clamp01(g);
    out_rgb[p * 3 + 2] = clamp01(b);
    if (out_alpha) out_alpha[p] = clamp01(a);
  }
  return 0;
}

extern "C" int gs_render_rgba8(const float* means, const float* scales,
                               const float* colors, const float* opacities,
                               int n, int width, int height, const float* view,
                               const float* proj, const float* background,
                               int mode, unsigned char* out_rgba) {
  if (!out_rgba) return 2;
  const size_t pixels = static_cast<size_t>(width) * height;
  std::vector<float> rgb(pixels * 3);
  const int rc = gs_render_f32(means, scales, colors, opacities, n, width,
                               height, view, proj, background, mode,
                               rgb.data(), nullptr);
  if (rc != 0) return rc;
  for (size_t p = 0; p < pixels; ++p) {
    out_rgba[p * 4 + 0] = static_cast<unsigned char>(rgb[p * 3 + 0] * 255.0f + 0.5f);
    out_rgba[p * 4 + 1] = static_cast<unsigned char>(rgb[p * 3 + 1] * 255.0f + 0.5f);
    out_rgba[p * 4 + 2] = static_cast<unsigned char>(rgb[p * 3 + 2] * 255.0f + 0.5f);
    out_rgba[p * 4 + 3] = 255;
  }
  return 0;
}
