// gs_native: C++17 CPU rasterizer for 3D Gaussian splats.
//
// The native forward-render stack of the framework (the reference keeps its
// realtime path native too: renderer_cpu.cpp / renderer.cu + viewer). Same
// math contract as the JAX renderer (tpu_gaussians/ops): projection with
// safe-w divide and y-flip, axis-aligned screen sigma clamped >= 1px, and
// two compositing modes:
//   mode 0 — order-independent weighted average: out = (bg + sum w*c)/(1 + sum w)
//   mode 1 — global depth sort (camera z descending) + front-to-back alpha
//            compositing, background blended by residual transmittance.
// Adaptive splat radius: per-gaussian bounding box solves op*exp(-r^2/2) =
// weight_cutoff exactly instead of a fixed 3-sigma box, so the scatter loop
// skips all sub-cutoff pixels without approximation error beyond the cutoff.
//
// C ABI for ctypes/FFI use; all matrices row-major float32.

#pragma once
#include <cstdint>

extern "C" {

// Renders N gaussians to an RGBA8 buffer of width*height*4 bytes.
//   means:     N*3   world-space centers
//   scales:    N*3   axis scales (z unused by the footprint model)
//   colors:    N*3   RGB in [0,1] (SH must be pre-evaluated by the caller)
//   opacities: N     in [0,1]
//   view,proj: 16    row-major 4x4
//   background:3
//   mode:      0 = weighted average, 1 = depth-sorted front-to-back
//   out_rgba:  width*height*4, row-major, y-down
// Returns 0 on success, nonzero on invalid arguments.
int gs_render_rgba8(const float* means, const float* scales,
                    const float* colors, const float* opacities, int n,
                    int width, int height, const float* view,
                    const float* proj, const float* background, int mode,
                    unsigned char* out_rgba);

// Float variant: out is width*height*3 float32 RGB in [0,1] plus optional
// width*height alpha (pass nullptr to skip). Used for parity testing.
int gs_render_f32(const float* means, const float* scales,
                  const float* colors, const float* opacities, int n,
                  int width, int height, const float* view, const float* proj,
                  const float* background, int mode, float* out_rgb,
                  float* out_alpha);

}  // extern "C"
