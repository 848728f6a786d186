// Cross-validates this framework's cereal-format model files against the
// REFERENCE'S OWN serialization stack: the vendored cereal-1.1.1 library
// and utils/mat_cerealisation.hpp, both compiled directly from
// /root/reference (read-only; nothing vendored here).
//
// The reference's load_detection_model cannot be compiled in this image
// (its regressor templates require Eigen, which is absent), so this
// harness deserializes the archive field-by-field in the documented order
// (SURVEY.md §5; model.hpp:178-182, superviseddescent.hpp:356-360,
// regressors.hpp:395-399, adaptive_vlhog.hpp:55-59) through the real
// cereal BinaryInputArchive + the real cv::Mat cereal adapter. If our
// writer's framing (cereal size_type, bool encoding, Mat header layout,
// string vectors) deviated anywhere, these reads would desynchronise and
// the printed fields would be garbage / throw.
//
// Usage: cereal_crosscheck <model.bin>
// Prints one JSON line with the parsed structure for the Python side to
// compare against what it wrote (tests/test_native.py).
//
// Build: sh native/build_cereal_crosscheck.sh

#include <cstdio>
#include <fstream>
#include <string>
#include <vector>

#include <opencv2/core.hpp>

#include "cereal/cereal.hpp"
#include "cereal/archives/binary.hpp"
#include "cereal/types/string.hpp"
#include "cereal/types/vector.hpp"
#include "superviseddescent/utils/mat_cerealisation.hpp"

int main(int argc, char** argv) {
  if (argc < 2) { std::fprintf(stderr, "usage: %s model.bin\n", argv[0]); return 2; }
  std::ifstream in(argv[1], std::ios::binary);
  if (!in) { std::fprintf(stderr, "cannot open %s\n", argv[1]); return 2; }
  cereal::BinaryInputArchive ar(in);

  // SDO: vector<LinearRegressor>, each = (x: cv::Mat, Regulariser)
  cereal::size_type num_regressors;
  ar(cereal::make_size_tag(num_regressors));
  std::vector<int> rows, cols;
  std::vector<float> lambdas, w00, wlast;
  std::vector<int> reg_types;
  std::vector<bool> reg_last;
  for (cereal::size_type i = 0; i < num_regressors; ++i) {
    cv::Mat x;
    ar(x);
    int reg_type; float lambda; bool regularise_last_row;
    ar(reg_type, lambda, regularise_last_row);
    rows.push_back(x.rows); cols.push_back(x.cols);
    reg_types.push_back(reg_type); lambdas.push_back(lambda);
    reg_last.push_back(regularise_last_row);
    w00.push_back(x.at<float>(0, 0));
    wlast.push_back(x.at<float>(x.rows - 1, x.cols - 1));
  }
  // InterEyeDistanceNormalisation: 3 string vectors
  std::vector<std::string> norm_lms, norm_right, norm_left;
  ar(norm_lms, norm_right, norm_left);
  // detection_model tail: mean Mat, landmark ids, hog params, eye ids
  cv::Mat mean;
  ar(mean);
  std::vector<std::string> landmark_ids;
  ar(landmark_ids);
  cereal::size_type num_hog;
  ar(cereal::make_size_tag(num_hog));
  std::vector<int> hps;
  for (cereal::size_type i = 0; i < num_hog; ++i) {
    int variant, num_cells, cell_size, num_bins; float rel;
    ar(variant, num_cells, cell_size, num_bins, rel);
    hps.push_back(cell_size);
  }
  std::vector<std::string> right_ids, left_ids;
  ar(right_ids, left_ids);

  std::printf("{\"num_regressors\": %llu, \"weight_shapes\": [",
              (unsigned long long)num_regressors);
  for (size_t i = 0; i < rows.size(); ++i)
    std::printf("%s[%d,%d]", i ? "," : "", rows[i], cols[i]);
  std::printf("], \"lambda0\": %.9g, \"regularise_last_row0\": %s, ",
              lambdas[0], reg_last[0] ? "true" : "false");
  std::printf("\"w00\": [");
  for (size_t i = 0; i < w00.size(); ++i)
    std::printf("%s%.9g", i ? "," : "", w00[i]);
  std::printf("], \"w_last\": [");
  for (size_t i = 0; i < wlast.size(); ++i)
    std::printf("%s%.9g", i ? "," : "", wlast[i]);
  std::printf("], \"mean_shape\": [%d,%d], \"mean00\": %.9g, ",
              mean.rows, mean.cols, mean.at<float>(0, 0));
  std::printf("\"num_landmarks\": %zu, \"first_landmark\": \"%s\", ",
              landmark_ids.size(), landmark_ids[0].c_str());
  std::printf("\"cell_sizes\": [");
  for (size_t i = 0; i < hps.size(); ++i)
    std::printf("%s%d", i ? "," : "", hps[i]);
  std::printf("], \"right_eye\": [");
  for (size_t i = 0; i < right_ids.size(); ++i)
    std::printf("%s\"%s\"", i ? "," : "", right_ids[i].c_str());
  std::printf("], \"left_eye\": [");
  for (size_t i = 0; i < left_ids.size(); ++i)
    std::printf("%s\"%s\"", i ? "," : "", left_ids[i].c_str());
  std::printf("]}\n");

  // must be at EOF: a single stray byte means a framing mismatch
  char extra;
  in.read(&extra, 1);
  if (!in.eof()) { std::fprintf(stderr, "TRAILING BYTES\n"); return 3; }
  return 0;
}
