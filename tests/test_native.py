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
