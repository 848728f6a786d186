// End-to-end C++-vs-JAX parity harness: runs the REFERENCE's actual
// RCR inference loop (model.hpp:132-144 -> superviseddescent.hpp:323-344,
// with adaptive_vlhog.hpp:109-183 feature semantics and the reference's
// own vendored VLFeat hog.c compiled from /root/reference) on a
// self-trained model file, and prints the final landmark rows so the
// Python side (scripts/parity_e2e.py) can diff them against
// DetectionModel.detect to the BASELINE.json 1e-4 IOD budget.
//
// The model file is loaded through the reference's own serialization
// stack (vendored cereal-1.1.1 + utils/mat_cerealisation.hpp, compiled
// from /root/reference — see native/cereal_crosscheck.cc for the framing
// cross-check). The reference's load_detection_model itself cannot be
// compiled here (its solver templates need Eigen, absent from the image),
// so the archive is read field-by-field in the documented order
// (SURVEY.md §5).
//
// Inference semantics intentionally reproduced (all in f32, like the
// reference):
//   x0 = align_mean(mean, facebox)              model.hpp:64-76 (sx=1,tx=0)
//   per level: ied = ||mean(right eyes) - mean(left eyes)||
//                                               helpers.hpp:136-160
//     patch_half = round(rel_size * ied / 2)    adaptive_vlhog.hpp:123
//     per landmark: center = cvRound(x),cvRound(y); crop 2*patch_half
//       square from the UINT8 gray image, zero border padding
//       (adaptive_vlhog.hpp:131-151), cv::resize INTER_LINEAR while still
//       uint8, THEN convert to f32 (adaptive_vlhog.hpp:154-158 — the
//       resize happens before convertTo, so resampled pixels are rounded
//       to integers; the JAX quantize=True path mirrors this);
//     vl_hog_put_image + vl_hog_extract (reference hog.c), Matlab-order
//       flatten flat[j*w*h + x*h + y] = raw[j*w*h + y*w + x]
//       (adaptive_vlhog.hpp:166-175), concat + bias 1.0;
//   update = row * W  (1xF . Fx2L);  x -= update * ied
//                                               superviseddescent.hpp:337-341
//
// Usage: reference_parity <model.bin> <jobs.txt> [float_resize]
//   jobs.txt lines: <image_path> <box_x> <box_y> <box_w> <box_h>
//   float_resize: optional 3rd arg — resize in f32 instead of uint8
//   (diagnostic mode pairing with the JAX quantize=False path; the
//   default uint8 resize is what the reference does)
// Output: one line per job: final 2L landmark coords, space-separated, %.7g
//
// Build: sh native/build_reference_parity.sh

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

#include "cereal/cereal.hpp"
#include "cereal/archives/binary.hpp"
#include "cereal/types/string.hpp"
#include "cereal/types/vector.hpp"
#include "superviseddescent/utils/mat_cerealisation.hpp"

// reference hog.c API (hog.h:104-139), compiled separately as plain C
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

struct HogParam {
  int variant, num_cells, cell_size, num_bins;
  float rel_patch;
};

struct Model {
  std::vector<cv::Mat> weights;           // (F, 2L) per level
  cv::Mat mean;                           // (1, 2L)
  std::vector<std::string> landmark_ids;
  std::vector<HogParam> hog;
  std::vector<int> right_eye, left_eye;   // indices into landmark row
};

static int id_index(const std::vector<std::string>& ids,
                    const std::string& id) {
  for (size_t i = 0; i < ids.size(); ++i)
    if (ids[i] == id) return (int)i;
  std::fprintf(stderr, "eye id %s not in model landmarks\n", id.c_str());
  std::exit(3);
}

static Model load_model(const char* path) {
  std::ifstream in(path, std::ios::binary);
  if (!in) { std::fprintf(stderr, "cannot open %s\n", path); std::exit(2); }
  cereal::BinaryInputArchive ar(in);
  Model m;
  cereal::size_type nreg;
  ar(cereal::make_size_tag(nreg));
  for (cereal::size_type i = 0; i < nreg; ++i) {
    cv::Mat w;
    ar(w);
    int reg_type; float lambda; bool reg_last;
    ar(reg_type, lambda, reg_last);
    m.weights.push_back(w);
  }
  std::vector<std::string> norm_lms, norm_right, norm_left;
  ar(norm_lms, norm_right, norm_left);
  ar(m.mean);
  ar(m.landmark_ids);
  cereal::size_type nhog;
  ar(cereal::make_size_tag(nhog));
  for (cereal::size_type i = 0; i < nhog; ++i) {
    HogParam p;
    ar(p.variant, p.num_cells, p.cell_size, p.num_bins, p.rel_patch);
    m.hog.push_back(p);
  }
  std::vector<std::string> right_ids, left_ids;
  ar(right_ids, left_ids);
  for (const auto& id : right_ids)
    m.right_eye.push_back(id_index(m.landmark_ids, id));
  for (const auto& id : left_ids)
    m.left_eye.push_back(id_index(m.landmark_ids, id));
  return m;
}

// helpers.hpp:136-160: distance between the mean right-eye and mean
// left-eye positions
static float ied(const std::vector<float>& x, const Model& m) {
  int L = (int)m.landmark_ids.size();
  float rx = 0, ry = 0, lx = 0, ly = 0;
  for (int i : m.right_eye) { rx += x[i]; ry += x[i + L]; }
  rx /= m.right_eye.size(); ry /= m.right_eye.size();
  for (int i : m.left_eye) { lx += x[i]; ly += x[i + L]; }
  lx /= m.left_eye.size(); ly /= m.left_eye.size();
  return std::sqrt((rx - lx) * (rx - lx) + (ry - ly) * (ry - ly));
}

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s model.bin jobs.txt\n", argv[0]);
    return 2;
  }
  Model m = load_model(argv[1]);
  const bool float_resize = argc > 3;
  const int L = (int)m.landmark_ids.size();

  std::ifstream jobs(argv[2]);
  std::string line;
  while (std::getline(jobs, line)) {
    if (line.empty()) continue;
    std::istringstream ss(line);
    std::string img_path;
    float bx, by, bw, bh;
    ss >> img_path >> bx >> by >> bw >> bh;
    // the reference loads COLOR and converts in HogTransform
    // (rcr-detect.cpp:106 + adaptive_vlhog.hpp:114-120); imread's own
    // IMREAD_GRAYSCALE path uses libpng's converter with different
    // rounding — ~0.4 greylevel mean difference, enough to break 1e-4
    // landmark parity
    cv::Mat color = cv::imread(img_path);
    if (color.empty()) { std::fprintf(stderr, "no image %s\n",
                                      img_path.c_str()); return 2; }
    cv::Mat gray;
    if (color.channels() == 3) cv::cvtColor(color, gray, cv::COLOR_BGR2GRAY);
    else gray = color;

    // align_mean (model.hpp:64-76, default scaling/translation)
    std::vector<float> x(2 * L);
    for (int i = 0; i < L; ++i) {
      x[i] = (m.mean.at<float>(0, i) + 0.5f) * bw + bx;
      x[i + L] = (m.mean.at<float>(0, i + L) + 0.5f) * bh + by;
    }

    for (size_t lvl = 0; lvl < m.weights.size(); ++lvl) {
      const HogParam& cfg = m.hog[lvl];
      const int S = cfg.num_cells * cfg.cell_size;
      float cur_ied = ied(x, m);
      int patch_half = (int)std::lround(cfg.rel_patch * cur_ied / 2.0f);
      if (patch_half < 1) patch_half = 1;

      VlHog* hog = vl_hog_new((VlHogVariant)cfg.variant, cfg.num_bins, 0);
      const int F = m.weights[lvl].rows;
      cv::Mat row(1, F, CV_32F);
      std::vector<float> raw;
      std::vector<float> patches;           // diagnostic dump: L*S*S
      patches.reserve((size_t)L * S * S);
      cv::Mat roif;
      for (int lm = 0; lm < L; ++lm) {
        int cx = cvRound(x[lm]);
        int cy = cvRound(x[lm + L]);
        cv::Rect want(cx - patch_half, cy - patch_half,
                      2 * patch_half, 2 * patch_half);
        cv::Rect img(0, 0, gray.cols, gray.rows);
        cv::Rect inside = want & img;
        // zero-pad crop, still uint8 (adaptive_vlhog.hpp:131-151)
        cv::Mat patch = cv::Mat::zeros(want.height, want.width, CV_8U);
        if (inside.area() > 0)
          gray(inside).copyTo(patch(
              cv::Rect(inside.x - want.x, inside.y - want.y,
                       inside.width, inside.height)));
        cv::Mat resized;
        if (float_resize) {
          cv::Mat patchf;
          patch.convertTo(patchf, CV_32F);
          cv::resize(patchf, roif, cv::Size(S, S));
        } else {
          cv::resize(patch, resized, cv::Size(S, S));  // uint8 INTER_LINEAR
          resized.convertTo(roif, CV_32F);             // float AFTER resize
        }
        cv::Mat cont = roif.isContinuous() ? roif : roif.clone();
        if (std::getenv("SDTPU_PARITY_DUMP"))
          patches.insert(patches.end(), cont.ptr<float>(),
                         cont.ptr<float>() + (size_t)S * S);
        vl_hog_put_image(hog, cont.ptr<float>(), S, S, 1, cfg.cell_size);
        int ww = (int)vl_hog_get_width(hog);
        int hh = (int)vl_hog_get_height(hog);
        int dd = (int)vl_hog_get_dimension(hog);
        raw.resize((size_t)ww * hh * dd);
        vl_hog_extract(hog, raw.data());
        // Matlab-order flatten (adaptive_vlhog.hpp:166-175)
        float* out = row.ptr<float>() + lm * ww * hh * dd;
        for (int j = 0; j < dd; ++j)
          for (int px = 0; px < ww; ++px)
            for (int py = 0; py < hh; ++py)
              out[j * ww * hh + px * hh + py] =
                  raw[(size_t)j * ww * hh + (size_t)py * ww + px];
      }
      vl_hog_delete(hog);
      row.at<float>(0, F - 1) = 1.0f;

      // diagnostic: dump the pre-level x and the feature row per level
      if (const char* dir = std::getenv("SDTPU_PARITY_DUMP")) {
        char p[512];
        std::snprintf(p, sizeof p, "%s/level%zu.bin", dir, lvl);
        std::FILE* fp = std::fopen(p, "ab");
        std::fwrite(x.data(), sizeof(float), x.size(), fp);
        std::fwrite(&cur_ied, sizeof(float), 1, fp);
        std::fwrite(row.ptr<float>(), sizeof(float), F, fp);
        std::fwrite(patches.data(), sizeof(float), patches.size(), fp);
        std::fclose(fp);
      }

      cv::Mat update;
      cv::gemm(row, m.weights[lvl], 1.0, cv::Mat(), 0.0, update);
      // norm = 1/IED  =>  x -= update * IED  (superviseddescent.hpp:337-341)
      for (int i = 0; i < 2 * L; ++i)
        x[i] -= update.at<float>(0, i) * cur_ied;
    }

    for (int i = 0; i < 2 * L; ++i)
      std::printf("%s%.7g", i ? " " : "", x[i]);
    std::printf("\n");
  }
  return 0;
}
