"""Pallas window-resident sampler vs the dense XLA sampler.

Runs in interpret mode on the CPU test backend. Quantisation is off in the
equality checks: the kernel's dot contraction can fuse multiply-adds in a
different order than XLA's einsum (~1e-5 relative), which would flip
pixels that land exactly on a .5 rounding boundary — the same documented
difference class as fast sampling.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from superviseddescent_tpu.ops.patches import extract_patches_dense
from superviseddescent_tpu.ops.patches_pallas import sample_patches_window


def make_case(seed=0, n=3, r=128, l=4):
    rng = np.random.default_rng(seed)
    wins = rng.integers(0, 256, size=(n, r, r)).astype(np.float32)
    cx = rng.uniform(10, r - 10, (n, l)).astype(np.float32)
    cy = rng.uniform(10, r - 10, (n, l)).astype(np.float32)
    phw = rng.uniform(5, 14, (n,)).astype(np.float32).round()
    return wins, cx, cy, phw


def dense(wins, cx, cy, phw, s, **kw):
    n = wins.shape[0]
    return np.asarray(extract_patches_dense(
        jnp.asarray(wins), jnp.arange(n, dtype=jnp.int32),
        jnp.asarray(cx), jnp.asarray(cy), jnp.asarray(phw), s,
        precision=jax.lax.Precision.HIGHEST, **kw))


@pytest.mark.parametrize("sub_window", [0, 48])
def test_window_sampler_matches_dense(sub_window):
    wins, cx, cy, phw = make_case()
    s = 24
    ref = dense(wins, cx, cy, phw, s, quantize=False)
    out = np.asarray(sample_patches_window(
        jnp.asarray(wins), jnp.asarray(cx), jnp.asarray(cy),
        jnp.asarray(phw), s, sub_window=sub_window, quantize=False,
        interpret=True))
    np.testing.assert_allclose(out, ref, atol=5e-3)


def test_window_sampler_lane_subwindow_matches_dense():
    # 128-aligned lane (column) sub-window: same result as full-width.
    # wx=256 < r=384 actually exercises the dynamic lane slice; phw <= 14
    # is far inside max_patch_half_x(256) = 63.
    wins, cx, cy, phw = make_case(seed=2, n=3, r=384, l=5)
    cx = cx * (374.0 / 118.0)  # spread centers over the full 384 width
    cy = cy * (374.0 / 118.0)
    s = 24
    ref = dense(wins, cx, cy, phw, s, quantize=False)
    out = np.asarray(sample_patches_window(
        jnp.asarray(wins), jnp.asarray(cx), jnp.asarray(cy),
        jnp.asarray(phw), s, sub_window=48, sub_window_x=256,
        quantize=False, interpret=True))
    np.testing.assert_allclose(out, ref, atol=5e-3)


def test_window_sampler_lane_subwindow_border_zero_pad():
    # patches overlapping the window border with lane slicing active.
    # wx=256 supports patch_half <= max_patch_half_x(256) = 63; centers
    # straddle both window borders and a 128-alignment boundary.
    wins, _, _, _ = make_case(seed=4, n=2, r=384)
    n, s = wins.shape[0], 24
    cx = np.tile(np.float32([3.0, 381.0, 130.0]), (n, 1))
    cy = np.tile(np.float32([378.0, 2.0, 128.0]), (n, 1))
    phw = np.full((n,), 8.0, np.float32)
    ref = dense(wins, cx, cy, phw, s, quantize=False)
    out = np.asarray(sample_patches_window(
        jnp.asarray(wins), jnp.asarray(cx), jnp.asarray(cy),
        jnp.asarray(phw), s, sub_window=48, sub_window_x=256,
        quantize=False, interpret=True))
    np.testing.assert_allclose(out, ref, atol=5e-3)


def test_window_sampler_rectangular_rows_only():
    # full-width row-band windows (RY=64 rows, RX=384 lanes) with lane
    # sub-windows doing the x-windowing — the stepped detector's rows-only
    # crop shape
    rng = np.random.default_rng(7)
    n, ry, rx, l, s = 3, 64, 384, 4, 24
    wins = rng.integers(0, 256, size=(n, ry, rx)).astype(np.float32)
    cx = rng.uniform(12, rx - 12, (n, l)).astype(np.float32)
    cy = rng.uniform(12, ry - 12, (n, l)).astype(np.float32)
    phw = rng.uniform(5, 11, (n,)).astype(np.float32).round()
    ref = dense(wins, cx, cy, phw, s, quantize=False)
    out = np.asarray(sample_patches_window(
        jnp.asarray(wins), jnp.asarray(cx), jnp.asarray(cy),
        jnp.asarray(phw), s, sub_window=40, sub_window_x=256,
        quantize=False, interpret=True))
    np.testing.assert_allclose(out, ref, atol=5e-3)


def test_window_sampler_border_zero_pad():
    # patches overlapping the window border: zero outside, like the dense
    # sampler on the same windows
    wins, _, _, _ = make_case()
    n, l, s = wins.shape[0], 2, 24
    cx = np.tile(np.float32([2.0, 126.0]), (n, 1))
    cy = np.tile(np.float32([125.0, 1.0]), (n, 1))
    phw = np.full((n,), 8.0, np.float32)
    ref = dense(wins, cx, cy, phw, s, quantize=False)
    out = np.asarray(sample_patches_window(
        jnp.asarray(wins), jnp.asarray(cx), jnp.asarray(cy),
        jnp.asarray(phw), s, sub_window=48, quantize=False, interpret=True))
    np.testing.assert_allclose(out, ref, atol=5e-3)


def test_window_sampler_quantize_mostly_exact():
    wins, cx, cy, phw = make_case(seed=1)
    s = 24
    ref = dense(wins, cx, cy, phw, s, quantize=True)
    out = np.asarray(sample_patches_window(
        jnp.asarray(wins), jnp.asarray(cx), jnp.asarray(cy),
        jnp.asarray(phw), s, sub_window=0, quantize=True, interpret=True))
    d = np.abs(out - ref)
    assert d.max() <= 1.0            # only .5-boundary flips
    assert (d > 0).mean() < 0.02     # and those are rare


def test_window_backend_with_chunking(monkeypatch):
    # HogTransform(patch_backend='window', chunk_size=...) gathers the
    # chunk's windows per lax.map step and matches the unchunked result
    from superviseddescent_tpu.models.rcr import HogTransform, HogParams
    from superviseddescent_tpu.ops.hog import HogVariant

    rng = np.random.default_rng(3)
    n, r = 6, 64
    wins = rng.integers(0, 256, size=(n, r, r)).astype(np.float32)
    params = (HogParams(HogVariant.Uoctti, 3, 6, 4, 0.8),)
    names = ["1", "2", "3", "4"]
    x = np.concatenate([rng.uniform(20, 44, (n, 4)),
                        rng.uniform(20, 44, (n, 4))], 1).astype(np.float32)
    # force the pallas path through interpret mode on CPU
    import superviseddescent_tpu.ops.patches_pallas as pp
    orig = pp.sample_patches_window
    monkeypatch.setattr(
        pp, "sample_patches_window",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    kw = dict(image_indices=np.arange(n, dtype=np.int32),
              patch_backend="window", sub_windows=(48,), quantize=False)
    hog = HogTransform(wins, params, names, ["1"], ["2"], **kw)
    hogc = HogTransform(wins, params, names, ["1"], ["2"], chunk_size=4,
                        **kw)
    a = np.asarray(hog(jnp.asarray(x), 0))
    b = np.asarray(hogc(jnp.asarray(x), 0))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_window_sampler_transposed_matches_direct():
    # transposed=True emits patch^T via the x-first dot order; same
    # values as the direct order up to dot-order fp noise.
    wins, cx, cy, phw = make_case(seed=3)
    s = 24
    ref = np.asarray(sample_patches_window(
        jnp.asarray(wins), jnp.asarray(cx), jnp.asarray(cy),
        jnp.asarray(phw), s, sub_window=48, quantize=False,
        interpret=True))
    out = np.asarray(sample_patches_window(
        jnp.asarray(wins), jnp.asarray(cx), jnp.asarray(cy),
        jnp.asarray(phw), s, sub_window=48, quantize=False,
        transposed=True, interpret=True))
    np.testing.assert_allclose(out.transpose(0, 1, 3, 2), ref, atol=5e-3)


def test_window_sampler_bf16_output_dtype():
    wins, cx, cy, phw = make_case(seed=4)
    s = 16
    out = sample_patches_window(
        jnp.asarray(wins), jnp.asarray(cx), jnp.asarray(cy),
        jnp.asarray(phw), s, sub_window=48, quantize=True,
        out_dtype=jnp.bfloat16, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = np.asarray(sample_patches_window(
        jnp.asarray(wins), jnp.asarray(cx), jnp.asarray(cy),
        jnp.asarray(phw), s, sub_window=48, quantize=True,
        interpret=True))
    # quantized pixels are integers 0..255: bf16 is lossless
    np.testing.assert_array_equal(np.asarray(out, np.float32), ref)
