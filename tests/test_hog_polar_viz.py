"""Polar-field HOG, flip permutation, and glyph goldens vs the reference C."""

import os

import numpy as np
import pytest

from superviseddescent_tpu.ops.hog import (
    HogVariant, hog_cells_from_polar, hog_extract,
)
from superviseddescent_tpu.ops.hog_viz import (
    hog_flip_permutation, hog_glyphs, hog_render, GLYPH_SIZE,
)

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens",
                       "hog_polar_goldens.npz")
DATA = np.load(GOLDENS)
CASES = list(range(int(DATA["num_cases"])))


@pytest.mark.parametrize("i", CASES)
def test_polar_field_cells_and_features(i):
    variant, o_count, size, cs, directed, bilinear, ww, hh, two_o, dd = (
        int(v) for v in DATA[f"meta_{i}"])
    cells = np.asarray(hog_cells_from_polar(
        DATA[f"mod_{i}"][None], DATA[f"ang_{i}"][None],
        bool(directed), cs, o_count,
        bilinear_orientation=bool(bilinear)))[0]     # (C, C, 2O) [y,x,o]
    golden_cells = DATA[f"cells_{i}"]                 # (2O, H, W)
    np.testing.assert_allclose(np.transpose(cells, (2, 0, 1)), golden_cells,
                               rtol=2e-4, atol=2e-4, err_msg=f"case {i}")
    feats = np.asarray(hog_extract(cells[None], HogVariant(variant)))[0]
    np.testing.assert_allclose(np.transpose(feats, (2, 0, 1)),
                               DATA[f"feats_{i}"], rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("i", CASES)
def test_flip_permutation_matches(i):
    variant, o_count, *_ = (int(v) for v in DATA[f"meta_{i}"])
    perm = hog_flip_permutation(HogVariant(variant), o_count)
    np.testing.assert_array_equal(perm, DATA[f"perm_{i}"])


@pytest.mark.parametrize("i", [0, 2])
def test_glyphs_match(i):
    variant, o_count, *_ = (int(v) for v in DATA[f"meta_{i}"])
    glyphs = hog_glyphs(o_count)
    # C layout glyphs[x + G*y + G*G*k] -> (O, y, x); ours is (O, row=y, col=x)
    np.testing.assert_array_equal(glyphs, DATA[f"glyphs_{i}"])


def test_render_shapes_and_energy():
    # smoke: rendering a one-hot descriptor draws exactly one bar per cell
    o_count = 4
    desc = np.zeros((2, 3, 16), np.float32)
    desc[0, 0, 2] = 1.0          # directed bin 2 of cell (0,0)
    img = hog_render(desc, HogVariant.Uoctti, o_count)
    assert img.shape == (2 * GLYPH_SIZE, 3 * GLYPH_SIZE)
    tile = img[:GLYPH_SIZE, :GLYPH_SIZE]
    np.testing.assert_array_equal(tile, hog_glyphs(o_count)[2])
    assert img[GLYPH_SIZE:, :].max() == 0.0
