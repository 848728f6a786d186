"""HOG golden tests: the XLA implementation vs. the reference C kernel.

Goldens in tests/goldens/hog_goldens.npz were produced by compiling the
reference's vendored VLFeat hog.c offline (it is not linked or vendored
here) and running vl_hog_put_image + vl_hog_extract on the stored inputs.
Golden layout is the raw C feature array [d][y][x].
"""

import os

import numpy as np
import pytest

from superviseddescent_tpu.ops.hog import (
    HogVariant, hog_cells, hog_extract, hog_num_cells, hog_dimension,
    hog_descriptor,
)

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens", "hog_goldens.npz")


def load_cases():
    data = np.load(GOLDENS)
    n = int(data["num_cases"])
    for i in range(n):
        meta = data[f"meta_{i}"]
        variant, num_orient, size, cs, ww, hh, dd = (int(v) for v in meta)
        yield (i, HogVariant(variant), num_orient, size, cs, ww, hh, dd,
               data[f"input_{i}"], data[f"output_{i}"])


CASES = list(load_cases())


@pytest.mark.parametrize("case", CASES, ids=[
    f"case{i}_v{v}_O{o}_s{s}_cs{cs}" for i, v, o, s, cs, *_ in CASES])
def test_hog_matches_reference_c(case):
    i, variant, num_orient, size, cs, ww, hh, dd, img, golden = case
    assert hog_num_cells(size, cs) == ww == hh
    assert hog_dimension(variant, num_orient) == dd

    cells = hog_cells(img[None].astype(np.float32), cs, num_orient)
    out = np.asarray(hog_extract(cells, variant))[0]      # (C, C, D) [y,x,d]
    got = np.transpose(out, (2, 0, 1))                    # -> [d][y][x]
    np.testing.assert_allclose(got, golden, rtol=2e-4, atol=2e-5,
                               err_msg=f"case {i}")


def test_descriptor_flatten_order():
    # Matlab order: index = d*C*C + x*C + y (adaptive_vlhog.hpp:166-175).
    i, variant, num_orient, size, cs, ww, hh, dd, img, golden = CASES[0]
    desc = np.asarray(hog_descriptor(
        img[None].astype(np.float32), cs, num_orient, variant))[0]
    expected = np.transpose(golden, (0, 2, 1)).reshape(-1)  # [d][x][y] ravel
    np.testing.assert_allclose(desc, expected, rtol=2e-4, atol=2e-5)


def test_hog_batched_consistency():
    # vmapping over the batch axis must equal per-sample computation.
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, size=(4, 30, 30)).astype(np.float32)
    batch = np.asarray(hog_descriptor(imgs, 6, 4))
    for i in range(4):
        single = np.asarray(hog_descriptor(imgs[i:i+1], 6, 4))[0]
        np.testing.assert_allclose(batch[i], single, rtol=1e-6)


BILINEAR_GOLDENS = os.path.join(os.path.dirname(__file__), "goldens",
                                "hog_bilinear_goldens.npz")


def test_bilinear_orientation_matches_reference_c():
    from superviseddescent_tpu.ops.hog import hog_cells
    data = np.load(BILINEAR_GOLDENS)
    for i in range(int(data["num_cases"])):
        variant, num_orient, size, cs, ww, hh, dd = (
            int(v) for v in data[f"meta_{i}"])
        cells = hog_cells(data[f"input_{i}"][None].astype(np.float32),
                          cs, num_orient, bilinear_orientation=True)
        out = np.asarray(hog_extract(cells, HogVariant(variant)))[0]
        np.testing.assert_allclose(np.transpose(out, (2, 0, 1)),
                                   data[f"output_{i}"], rtol=3e-4, atol=3e-5,
                                   err_msg=f"bilinear case {i}")
