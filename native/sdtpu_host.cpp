// sdtpu_host: native host-side runtime kernels for superviseddescent_tpu.
//
// The TPU compute path is XLA/Pallas; this library covers the *host* side
// of the pipeline where the reference also uses native code (OpenCV imread/
// cvtColor/resize, VLFeat hog.c): image colour conversion, patch
// crop+pad+resize, and a CPU HOG reference used as a fallback and as an
// independent parity cross-check for the XLA kernels.
//
// Implemented clean-room from the documented semantics in
// superviseddescent_tpu/ops/hog.py and ops/patches.py (which cite the
// reference's behaviour file:line). Exposed via a plain C ABI for ctypes.
//
// Build: see native/build.sh (produces libsdtpu_host.so).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline float tent(float d) { return std::max(0.0f, 1.0f - std::fabs(d)); }

// round-half-to-even, matching cvRound / jnp.round
inline float rint_f(float v) { return std::nearbyintf(v); }

}  // namespace

extern "C" {

// RGB (interleaved, uint8) -> gray uint8 with OpenCV fixed-point parity:
// y = (R*4899 + G*9617 + B*1868 + 8192) >> 14.
void sdtpu_rgb_to_gray_u8(const uint8_t* rgb, int64_t n_pixels,
                          uint8_t* gray) {
  for (int64_t i = 0; i < n_pixels; ++i) {
    const int32_t r = rgb[3 * i + 0];
    const int32_t g = rgb[3 * i + 1];
    const int32_t b = rgb[3 * i + 2];
    gray[i] = static_cast<uint8_t>((r * 4899 + g * 9617 + b * 1868 + 8192) >> 14);
  }
}

// Fused crop + zero-pad + bilinear resize of one square patch.
// image: (h, w) float32 row-major. center is rounded half-to-even.
// Destination pixel d samples source coordinate
//   origin + clamp((d + 0.5) * (2*phw / out) - 0.5, 0, 2*phw - 1)
// with zeros outside the image. If quantize, output is round(v) in [0,255].
void sdtpu_extract_patch(const float* image, int h, int w,
                         float center_x, float center_y, int patch_half,
                         int out_size, int quantize, float* out) {
  const float ox = rint_f(center_x) - static_cast<float>(patch_half);
  const float oy = rint_f(center_y) - static_cast<float>(patch_half);
  const float scale = (2.0f * patch_half) / static_cast<float>(out_size);
  const float hi = 2.0f * patch_half - 1.0f;
  for (int dy = 0; dy < out_size; ++dy) {
    float sy = std::min(std::max((dy + 0.5f) * scale - 0.5f, 0.0f), hi) + oy;
    const float y0f = std::floor(sy);
    const float wy = sy - y0f;
    const int y0 = static_cast<int>(y0f);
    for (int dx = 0; dx < out_size; ++dx) {
      float sx = std::min(std::max((dx + 0.5f) * scale - 0.5f, 0.0f), hi) + ox;
      const float x0f = std::floor(sx);
      const float wx = sx - x0f;
      const int x0 = static_cast<int>(x0f);
      auto at = [&](int yy, int xx) -> float {
        if (yy < 0 || yy >= h || xx < 0 || xx >= w) return 0.0f;
        return image[static_cast<int64_t>(yy) * w + xx];
      };
      float v = at(y0, x0) * (1 - wx) * (1 - wy) + at(y0, x0 + 1) * wx * (1 - wy) +
                at(y0 + 1, x0) * (1 - wx) * wy + at(y0 + 1, x0 + 1) * wx * wy;
      if (quantize) v = std::min(std::max(std::floor(v + 0.5f), 0.0f), 255.0f);
      out[static_cast<int64_t>(dy) * out_size + dx] = v;
    }
  }
}

// CPU HOG descriptor (Uoctti variant=1, DalalTriggs variant=0) for one
// (size x size) float patch. Output layout: channels-last cells
// out[cy][cx][d] with C = (size + cell/2) / cell and
// D = 3*O+4 (Uoctti) or 4*O (DalalTriggs).
//
// Semantics: interior central-difference gradients; hard assignment to the
// best of 2*O directed bins (first-wins ties); separable tent splat into
// cells; per-cell folded-histogram energy; four 2x2-block inverse norms
// (clamped 3x3 neighbourhood, +1e-4); components clamped at 0.2.
void sdtpu_hog(const float* patch, int size, int cell, int num_orient,
               int variant, float* out) {
  const int C = (size + cell / 2) / cell;
  const int O = num_orient;
  const int dims = (variant == 1) ? 3 * O + 4 : 4 * O;

  std::vector<float> cells(static_cast<size_t>(C) * C * 2 * O, 0.0f);
  std::vector<float> cosv(O), sinv(O);
  for (int k = 0; k < O; ++k) {
    const double a = k * M_PI / O;
    cosv[k] = static_cast<float>(std::cos(a));
    sinv[k] = static_cast<float>(std::sin(a));
  }

  for (int y = 1; y < size - 1; ++y) {
    for (int x = 1; x < size - 1; ++x) {
      const float gx = patch[y * size + x + 1] - patch[y * size + x - 1];
      const float gy = patch[(y + 1) * size + x] - patch[(y - 1) * size + x];
      const float mag = std::sqrt(gx * gx + gy * gy);
      const float inv = 1.0f / std::max(mag, 1e-10f);
      const float nx = gx * inv, ny = gy * inv;

      int best = -1;
      float best_score = 0.0f;
      for (int k = 0; k < O; ++k) {
        float s = nx * cosv[k] + ny * sinv[k];
        int bin = k;
        if (s < 0) { s = -s; bin = k + O; }
        if (s > best_score) { best_score = s; best = bin; }
      }
      if (best < 0) continue;

      const float hx = (x + 0.5f) / cell - 0.5f;
      const float hy = (y + 0.5f) / cell - 0.5f;
      for (int cy = std::max(0, (int)std::floor(hy));
           cy <= std::min(C - 1, (int)std::floor(hy) + 1); ++cy) {
        const float wyv = tent(hy - cy);
        if (wyv <= 0) continue;
        for (int cx = std::max(0, (int)std::floor(hx));
             cx <= std::min(C - 1, (int)std::floor(hx) + 1); ++cx) {
          const float wxv = tent(hx - cx);
          if (wxv <= 0) continue;
          cells[((static_cast<size_t>(cy) * C + cx) * 2 * O) + best] +=
              mag * wxv * wyv;
        }
      }
    }
  }

  // per-cell energy of the folded (undirected) histogram
  std::vector<float> energy(static_cast<size_t>(C) * C, 0.0f);
  for (int c = 0; c < C * C; ++c) {
    float e = 0.0f;
    for (int k = 0; k < O; ++k) {
      const float f = cells[c * 2 * O + k] + cells[c * 2 * O + k + O];
      e += f * f;
    }
    energy[c] = e;
  }

  auto eat = [&](int cy, int cx) -> double {
    cy = std::min(std::max(cy, 0), C - 1);
    cx = std::min(std::max(cx, 0), C - 1);
    return energy[static_cast<size_t>(cy) * C + cx];
  };

  for (int cy = 0; cy < C; ++cy) {
    for (int cx = 0; cx < C; ++cx) {
      const double f1 = 1.0 / std::sqrt(eat(cy - 1, cx - 1) + eat(cy - 1, cx) +
                                        eat(cy, cx - 1) + eat(cy, cx) + 1e-4);
      const double f2 = 1.0 / std::sqrt(eat(cy - 1, cx) + eat(cy - 1, cx + 1) +
                                        eat(cy, cx) + eat(cy, cx + 1) + 1e-4);
      const double f3 = 1.0 / std::sqrt(eat(cy, cx - 1) + eat(cy, cx) +
                                        eat(cy + 1, cx - 1) + eat(cy + 1, cx) + 1e-4);
      const double f4 = 1.0 / std::sqrt(eat(cy, cx) + eat(cy, cx + 1) +
                                        eat(cy + 1, cx) + eat(cy + 1, cx + 1) + 1e-4);
      const double factors[4] = {f1, f2, f3, f4};

      float* o = out + (static_cast<size_t>(cy) * C + cx) * dims;
      double t[4] = {0, 0, 0, 0};
      const float* cell_hist = &cells[(static_cast<size_t>(cy) * C + cx) * 2 * O];
      for (int k = 0; k < O; ++k) {
        const double ha = cell_hist[k];
        const double hb = cell_hist[k + O];
        double has = 0.0, hbs = 0.0, hcs = 0.0;
        double hcf[4];
        for (int i = 0; i < 4; ++i) {
          const double hai = factors[i] * ha;
          const double hbi = factors[i] * hb;
          const double hci = std::min(0.2, hai + hbi);
          has += std::min(0.2, hai);
          hbs += std::min(0.2, hbi);
          hcs += hci;
          t[i] += hci;
          hcf[i] = hci;
        }
        if (variant == 1) {
          o[k] = static_cast<float>(0.5 * has);
          o[O + k] = static_cast<float>(0.5 * hbs);
          o[2 * O + k] = static_cast<float>(0.5 * hcs);
        } else {
          for (int i = 0; i < 4; ++i)
            o[i * O + k] = static_cast<float>(hcf[i]);
        }
      }
      if (variant == 1) {
        const float s = 1.0f / std::sqrt(18.0f);
        for (int i = 0; i < 4; ++i)
          o[3 * O + i] = static_cast<float>(t[i]) * s;
      }
    }
  }
}

// Batched variants ------------------------------------------------------ //

void sdtpu_hog_batch(const float* patches, int batch, int size, int cell,
                     int num_orient, int variant, float* out) {
  const int C = (size + cell / 2) / cell;
  const int dims = (variant == 1) ? 3 * num_orient + 4 : 4 * num_orient;
  const int64_t in_stride = static_cast<int64_t>(size) * size;
  const int64_t out_stride = static_cast<int64_t>(C) * C * dims;
#pragma omp parallel for schedule(static)
  for (int b = 0; b < batch; ++b) {
    sdtpu_hog(patches + b * in_stride, size, cell, num_orient, variant,
              out + b * out_stride);
  }
}

int sdtpu_version() { return 1; }

}  // extern "C"
