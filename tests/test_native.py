"""Native host-library tests: cross-checks C++ kernels against both the XLA
implementations and the committed reference-C goldens."""

import os

import numpy as np
import pytest

from superviseddescent_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens", "hog_goldens.npz")


def test_version():
    assert native._load().sdtpu_version() == 1


def test_gray_matches_python():
    from superviseddescent_tpu.ops.patches import rgb_to_gray_u8
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, size=(37, 21, 3), dtype=np.uint8)
    np.testing.assert_array_equal(native.rgb_to_gray_u8(rgb),
                                  rgb_to_gray_u8(rgb))


def test_patch_matches_xla():
    from superviseddescent_tpu.ops.patches import extract_patches
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(64, 48)).astype(np.float32)
    for (cx, cy, ph, s, q) in [(20.3, 30.7, 8, 16, True),
                               (2.0, 2.0, 6, 12, False),
                               (47.0, 63.0, 10, 20, True)]:
        nat = native.extract_patch(img, cx, cy, ph, s, q)
        xla = np.asarray(extract_patches(
            img[None], np.int32([0]), np.float32([[cx]]), np.float32([[cy]]),
            np.float32([ph]), s, quantize=q))[0, 0]
        np.testing.assert_allclose(nat, xla, atol=1e-4)


def test_hog_matches_reference_goldens():
    data = np.load(GOLDENS)
    for i in range(int(data["num_cases"])):
        variant, num_orient, size, cs, ww, hh, dd = (
            int(v) for v in data[f"meta_{i}"])
        got = native.hog(data[f"input_{i}"], cs, num_orient, variant)
        np.testing.assert_allclose(np.transpose(got, (2, 0, 1)),
                                   data[f"output_{i}"],
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=f"case {i}")


def test_hog_batch_matches_single():
    rng = np.random.default_rng(2)
    patches = rng.integers(0, 256, size=(8, 30, 30)).astype(np.float32)
    batch = native.hog_batch(patches, 6, 4)
    for i in range(8):
        np.testing.assert_array_equal(batch[i], native.hog(patches[i], 6, 4))


def test_cereal_crosscheck_against_reference_stack(tmp_path):
    """The reference's OWN vendored cereal library + cv::Mat adapter
    (compiled from /root/reference) must parse a model file written by
    io/cereal.py, field for field, with no trailing bytes."""
    import json
    import shutil
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    model_path = os.path.join(repo, "pretrained", "rcr22_lfpw5.bin")
    if not os.path.exists(model_path):
        pytest.skip("pretrained model absent")
    if not shutil.which("g++") or not os.path.isdir(
            "/root/reference/3rdparty/cereal-1.1.1"):
        pytest.skip("toolchain or reference cereal absent")

    exe = tmp_path / "cereal_crosscheck"
    build = subprocess.run(
        ["sh", os.path.join(repo, "native", "build_cereal_crosscheck.sh")],
        env=dict(os.environ, OUT=str(exe)), capture_output=True, text=True)
    assert build.returncode == 0, build.stderr

    out = subprocess.run([str(exe), model_path], capture_output=True,
                         text=True)
    assert out.returncode == 0, out.stderr
    parsed = json.loads(out.stdout)

    from superviseddescent_tpu.models import DetectionModel
    model = DetectionModel.load(model_path)
    w = [np.asarray(r.weights) for r in model.sdo.regressors]
    assert parsed["num_regressors"] == len(w)
    assert parsed["weight_shapes"] == [list(x.shape) for x in w]
    np.testing.assert_allclose(parsed["w00"], [float(x[0, 0]) for x in w],
                               rtol=1e-6)
    np.testing.assert_allclose(parsed["w_last"],
                               [float(x[-1, -1]) for x in w], rtol=1e-6)
    assert parsed["num_landmarks"] == len(model.landmark_ids)
    assert parsed["first_landmark"] == model.landmark_ids[0]
    assert parsed["cell_sizes"] == [p.cell_size for p in model.hog_params]
    assert parsed["right_eye"] == model.right_eye_ids
    assert parsed["left_eye"] == model.left_eye_ids
    np.testing.assert_allclose(parsed["mean00"], float(model.mean[0]),
                               rtol=1e-6)
