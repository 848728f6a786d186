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


def test_flat_transposed_matches_direct():
    # transposed=True consumes (x, y)-major patches and produces the
    # same descriptors (up to splat-dot pixel summation order).
    rng = np.random.default_rng(3)
    patches = rng.integers(0, 256, size=(5, 30, 30)).astype(np.float32)
    direct = run_flat(patches, 6, 4)
    b, s, _ = patches.shape
    transposed = np.asarray(hog_descriptor_pallas_flat(
        patches.transpose(0, 2, 1).reshape(b, s * s), s, 6, 4,
        HogVariant.Uoctti, block=4, transposed=True, interpret=True))
    np.testing.assert_allclose(transposed, direct, rtol=1e-5, atol=1e-6)


def test_flat_fast_sector_binning_close_to_exact():
    # fast mode: bf16 splat + direct sector orientation classification.
    # Same descriptors as exact mode within the documented ~0.4% class.
    rng = np.random.default_rng(4)
    patches = rng.integers(0, 256, size=(6, 30, 30)).astype(np.float32)
    exact = run_flat(patches, 6, 4)
    b, s, _ = patches.shape
    fast = np.asarray(hog_descriptor_pallas_flat(
        patches.reshape(b, s * s), s, 6, 4, HogVariant.Uoctti,
        block=4, fast=True, interpret=True))
    err = np.abs(fast - exact)
    assert np.median(err) < 2e-3 and np.max(err) < 0.05, (
        np.median(err), np.max(err))


def test_flat_bf16_input_matches_f32():
    import jax.numpy as jnp
    rng = np.random.default_rng(5)
    patches = rng.integers(0, 256, size=(4, 30, 30)).astype(np.float32)
    b, s, _ = patches.shape
    f32 = run_flat(patches, 6, 4)
    bf16 = np.asarray(hog_descriptor_pallas_flat(
        jnp.asarray(patches.reshape(b, s * s), jnp.bfloat16), s, 6, 4,
        HogVariant.Uoctti, block=4, interpret=True))
    np.testing.assert_allclose(bf16, f32, rtol=1e-5, atol=1e-6)
