"""Flat-layout Pallas HOG kernel vs XLA implementation and reference goldens."""

import os

import numpy as np
import pytest

from superviseddescent_tpu.ops.hog import HogVariant, hog_descriptor
from superviseddescent_tpu.ops.hog_pallas_flat import hog_descriptor_pallas_flat

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens", "hog_goldens.npz")


def run_flat(patches, cs, o_count, variant=HogVariant.Uoctti, block=4):
    b, s, _ = patches.shape
    return np.asarray(hog_descriptor_pallas_flat(
        patches.reshape(b, s * s), s, cs, o_count, variant,
        block=block, interpret=True))


def test_flat_matches_xla_uoctti():
    rng = np.random.default_rng(0)
    patches = rng.integers(0, 256, size=(5, 30, 30)).astype(np.float32)
    xla = np.asarray(hog_descriptor(patches, 6, 4))
    flat = run_flat(patches, 6, 4)
    np.testing.assert_allclose(flat, xla, rtol=1e-5, atol=1e-6)


def test_flat_matches_xla_dalaltriggs():
    rng = np.random.default_rng(1)
    patches = rng.integers(0, 256, size=(3, 64, 64)).astype(np.float32)
    xla = np.asarray(hog_descriptor(patches, 8, 9, HogVariant.DalalTriggs))
    flat = run_flat(patches, 8, 9, HogVariant.DalalTriggs, block=2)
    np.testing.assert_allclose(flat, xla, rtol=1e-5, atol=1e-6)


def test_flat_matches_reference_goldens():
    data = np.load(GOLDENS)
    for i in range(int(data["num_cases"])):
        variant, num_orient, size, cs, ww, hh, dd = (
            int(v) for v in data[f"meta_{i}"])
        got = run_flat(data[f"input_{i}"][None], cs, num_orient,
                       HogVariant(variant), block=1)[0]
        expected = np.transpose(data[f"output_{i}"], (0, 2, 1)).reshape(-1)
        np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-5,
                                   err_msg=f"case {i}")


def test_flat_batch_padding():
    rng = np.random.default_rng(2)
    patches = rng.integers(0, 256, size=(7, 30, 30)).astype(np.float32)
    xla = np.asarray(hog_descriptor(patches, 6, 4))
    flat = run_flat(patches, 6, 4, block=4)
    np.testing.assert_allclose(flat, xla, rtol=1e-5, atol=1e-6)
