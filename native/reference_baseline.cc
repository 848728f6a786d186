// Reference CPU baseline: times the predict path of
// patrikhuber/superviseddescent's RCR-22 landmark detection, reconstructed
// from SURVEY.md §3.2 (model.hpp:132-144 + superviseddescent.hpp:323-344 +
// adaptive_vlhog.hpp:109-183).
//
// The reference itself cannot be built in this image (Eigen is absent; it
// is needed only by the training solvers, regressors.hpp:180-306). This
// harness therefore measures exactly the inference-path work the reference
// does per face, using the SAME vendored VLFeat hog.c — compiled directly
// from /root/reference at build time, never vendored here — and OpenCV for
// the crop/copyMakeBorder/resize and the per-level GEMV, in the documented
// order:
//   per level (4): IED -> patch_half = round(rel_size*IED/2); per landmark
//   (22): integer crop of 2*patch_half px, zero-pad at borders, bilinear
//   resize to num_cells*cell_size px, vl_hog_put_image + vl_hog_extract,
//   Matlab-order flatten; concat + bias; update = row * W (1x8801 · 8801x44
//   cv::gemm); x -= update * IED.
//
// Weights are random (the pretrained blob is missing from the checkout,
// .MISSING_LARGE_BLOBS) — wall time is independent of weight values.
//
// Build & run: sh native/build_reference_baseline.sh

#include <chrono>
#include <cmath>
#include <cstdio>
#include <random>
#include <vector>

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

// The reference's hog.c is compiled separately as plain C (see
// build_reference_baseline.sh); declare the documented API (hog.h:104-139)
// with C linkage here.
extern "C" {
typedef unsigned long long vl_size;
typedef int vl_bool;
typedef struct VlHog_ VlHog;
typedef enum VlHogVariant_ {
  VlHogVariantDalalTriggs,
  VlHogVariantUoctti
} VlHogVariant;
VlHog* vl_hog_new(VlHogVariant variant, vl_size numOrientations,
                  vl_bool transposed);
void vl_hog_delete(VlHog* self);
void vl_hog_put_image(VlHog* self, float const* image, vl_size width,
                      vl_size height, vl_size numChannels, vl_size cellSize);
void vl_hog_extract(VlHog* self, float* features);
vl_size vl_hog_get_width(VlHog* self);
vl_size vl_hog_get_height(VlHog* self);
vl_size vl_hog_get_dimension(VlHog const* self);
}
#define VL_FALSE 0

struct LevelCfg {
  int num_cells, cell_size, num_bins;
  float rel_patch;
};

// shipped RCR-22 configuration (rcr-train.cpp:447)
static const LevelCfg kLevels[4] = {
    {5, 11, 4, 1.0f}, {5, 10, 4, 0.7f}, {5, 8, 4, 0.4f}, {5, 6, 4, 0.25f}};
static const int kNumLandmarks = 22;
// indices of the eye landmarks within the 22-landmark row
// (ibug ids 37,40 right / 43,46 left within the rcr_training_22.cfg list)
static const int kRightEye[2] = {4, 7}, kLeftEye[2] = {10, 13};

static float ied(const std::vector<float>& x) {
  float rx = 0, ry = 0, lx = 0, ly = 0;
  for (int i : kRightEye) { rx += x[i] / 2; ry += x[i + kNumLandmarks] / 2; }
  for (int i : kLeftEye)  { lx += x[i] / 2; ly += x[i + kNumLandmarks] / 2; }
  return std::sqrt((rx - lx) * (rx - lx) + (ry - ly) * (ry - ly));
}

int main(int argc, char** argv) {
  const char* image_path = argc > 1
      ? argv[1]
      : "/root/reference/examples/data/ibug_lfpw_trainset/image_0001.png";
  cv::Mat gray = cv::imread(image_path, cv::IMREAD_GRAYSCALE);
  if (gray.empty()) { std::fprintf(stderr, "no image\n"); return 1; }

  // feature dim: 5x5 cells x (3*4+4)=16 dims x 22 landmarks + bias
  const int kDescPerLm = 5 * 5 * 16;
  const int kFeat = kDescPerLm * kNumLandmarks + 1;

  std::mt19937 rng(0);
  std::normal_distribution<float> nd(0.f, 1e-4f);
  std::vector<cv::Mat> weights;
  for (int l = 0; l < 4; ++l) {
    cv::Mat w(kFeat, 2 * kNumLandmarks, CV_32F);
    for (int i = 0; i < w.rows * w.cols; ++i)
      w.at<float>(i / w.cols, i % w.cols) = nd(rng);
    weights.push_back(w);
  }

  // plausible initial shape: a grid inside a central facebox
  std::vector<float> x0(2 * kNumLandmarks);
  float fx = gray.cols * 0.3f, fy = gray.rows * 0.3f,
        fw = gray.cols * 0.4f, fh = gray.rows * 0.4f;
  for (int i = 0; i < kNumLandmarks; ++i) {
    x0[i] = fx + fw * (0.15f + 0.7f * (i % 5) / 4.0f);
    x0[i + kNumLandmarks] = fy + fh * (0.15f + 0.7f * (i / 5) / 4.0f);
  }

  const int warmup = 5;
  int iters = argc > 2 ? std::atoi(argv[2]) : 50;
  double total_ms = 0;
  cv::Mat grayf;
  gray.convertTo(grayf, CV_32F);  // HOG input is float; done once per image

  for (int it = 0; it < warmup + iters; ++it) {
    auto t0 = std::chrono::steady_clock::now();
    std::vector<float> x = x0;
    for (int l = 0; l < 4; ++l) {
      const LevelCfg& cfg = kLevels[l];
      const int S = cfg.num_cells * cfg.cell_size;
      float cur_ied = ied(x);
      int patch_half = (int)std::lround(cfg.rel_patch * cur_ied / 2.0f);
      if (patch_half < 1) patch_half = 1;

      cv::Mat row(1, kFeat, CV_32F);
      VlHog* hog = vl_hog_new(VlHogVariantUoctti, cfg.num_bins, VL_FALSE);
      std::vector<float> desc(kDescPerLm);
      for (int lm = 0; lm < kNumLandmarks; ++lm) {
        int cx = (int)std::lround(x[lm]);
        int cy = (int)std::lround(x[lm + kNumLandmarks]);
        // integer crop with zero border padding (adaptive_vlhog.hpp:136-151)
        cv::Rect want(cx - patch_half, cy - patch_half,
                      2 * patch_half, 2 * patch_half);
        cv::Rect img(0, 0, gray.cols, gray.rows);
        cv::Rect inside = want & img;
        cv::Mat patch;
        if (inside == want) {
          patch = grayf(want);
        } else {
          cv::Mat padded = cv::Mat::zeros(want.height, want.width, CV_32F);
          if (inside.area() > 0)
            grayf(inside).copyTo(padded(
                cv::Rect(inside.x - want.x, inside.y - want.y,
                         inside.width, inside.height)));
          patch = padded;
        }
        cv::Mat resized;
        cv::resize(patch, resized, cv::Size(S, S));  // INTER_LINEAR default
        cv::Mat cont = resized.isContinuous() ? resized : resized.clone();
        vl_hog_put_image(hog, cont.ptr<float>(), S, S, 1, cfg.cell_size);
        vl_hog_extract(hog, desc.data());
        // Matlab-order flatten into the feature row
        std::copy(desc.begin(), desc.end(),
                  row.ptr<float>() + lm * kDescPerLm);
      }
      vl_hog_delete(hog);
      row.at<float>(0, kFeat - 1) = 1.0f;

      cv::Mat update;
      cv::gemm(row, weights[l], 1.0, cv::Mat(), 0.0, update);  // 1xF · Fx44
      for (int i = 0; i < 2 * kNumLandmarks; ++i)
        x[i] -= update.at<float>(0, i) * cur_ied;
    }
    auto t1 = std::chrono::steady_clock::now();
    if (it >= warmup)
      total_ms +=
          std::chrono::duration<double, std::milli>(t1 - t0).count();
  }
  double ms = total_ms / iters;
  std::printf("{\"metric\": \"reference_rcr22_predict_ms_per_face\", "
              "\"value\": %.3f, \"faces_per_sec\": %.1f, "
              "\"hardware\": \"cpu_single_thread\", \"iters\": %d}\n",
              ms, 1000.0 / ms, iters);
  return 0;
}
