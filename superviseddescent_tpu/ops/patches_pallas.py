"""Pallas window-resident patch sampler (the fast serving sampler).

Third-generation patch extraction. The dense XLA sampler
(ops/patches.py::extract_patches_dense) is mathematically right for the
MXU but materialises its (N, L, S, R) tent and row intermediates in HBM —
at serving batch sizes that traffic (~10 GB/level) dominates the detect
cascade. This kernel keeps everything after the window read in VMEM:

  * the per-face ROI window (R x R, bf16) streams HBM -> VMEM once per
    level through the normal pallas pipeline (one grid step per sample);
  * per landmark, a W-row full-width sub-window around the patch is
    sliced out of VMEM (8-aligned dynamic sublane offset), and the two
    bilinear tent matrices are built in-register from iota — they never
    exist in HBM;
  * the patch is two small MXU dots, ty @ sub @ tx^T, quantised in f32.

Numerics match extract_patches_dense(precision=DEFAULT) (bf16 multiplies,
f32 accumulation): same cv::resize source grid incl. the crop-space clamp,
same rounded centers, same zero-pad-outside-window semantics. Sum-order
inside the dots can differ from XLA's, so quantised pixels sitting exactly
on a .5 boundary may flip by 1 greylevel (same class of difference as the
documented fast-sampling behaviour).

Exactness caveat (mirrors the `roi` caveat in DetectionModel): a patch is
sampled correctly iff patch_half <= max_patch_half(W) for the static
sub-window side W. Size W per cascade level with min_sub_window() from
the level's relative_patch_size and the largest expected IED, and clamp
patch_half with max_patch_half() to degrade gracefully beyond it.

Reference behaviour being reproduced: adaptive_vlhog.hpp:131-157
(crop/copyMakeBorder/resize -> HOG input), recast as TPU window DMA +
in-VMEM tent matmuls instead of per-landmark OpenCV calls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Mosaic requires dynamic sublane offsets to be 8-aligned and dynamic
# lane offsets to be 128-aligned; flooring the sub-window origin to the
# alignment costs up to ALIGN-1 rows/columns of coverage, plus the
# bilinear tent's +-1 support. These helpers OWN the fit invariant —
# size sub-windows / clamp patch sizes through them, never with ad-hoc
# constants at call sites.
SUBLANE_ALIGN = 8
LANE_ALIGN = 128
_FIT_MARGIN = 2  # bilinear tent support around the outermost sample


def max_patch_half(sub_window: int, align: int = SUBLANE_ALIGN) -> float:
    """Largest patch_half whose patch is fully covered by a W-row (or,
    with align=LANE_ALIGN, W-column) sub-window after aligned origin
    flooring."""
    return (sub_window - align - _FIT_MARGIN) / 2.0


def min_sub_window(max_extent: float, align: int = SUBLANE_ALIGN) -> int:
    """Smallest legal sub-window side (multiple of `align`) covering a
    patch extent of `max_extent` pixels (extent = 2*patch_half)."""
    need = int(-(-max_extent // 1)) + align + _FIT_MARGIN
    return -(-need // align) * align


def max_patch_half_x(sub_window_x: int) -> float:
    """Lane-axis counterpart of max_patch_half (128-aligned origins)."""
    return max_patch_half(sub_window_x, LANE_ALIGN)


def min_sub_window_x(max_extent: float) -> int:
    """Lane-axis counterpart of min_sub_window (multiple of 128)."""
    return min_sub_window(max_extent, LANE_ALIGN)


_PRECISIONS = {
    "exact": (jnp.float32, jax.lax.Precision.HIGHEST),
    # Mosaic has no bf16x3 (HIGH) dot lowering — 'high' runs the exact
    # dots, so it is never less accurate than requested, just not faster;
    # the dense XLA backend offers true bf16x3
    "high": (jnp.float32, jax.lax.Precision.HIGHEST),
    "fast": (jnp.bfloat16, jax.lax.Precision.DEFAULT),
}


def _sampler_kernel(oxy_ref, sp_ref, win_ref, o_ref, *,
                    num_landmarks, out_size, sub_window, sub_window_x,
                    roi_y, roi_x, quantize, sampling, transposed):
    s, w, wx, ry, rx = out_size, sub_window, sub_window_x, roi_y, roi_x
    l = num_landmarks

    st = sp_ref[0, 0, 0]                  # resize step 2*phw/S
    ph = sp_ref[0, 0, 1]                  # patch_half
    # cv::resize source grid within the crop, clamped to the crop
    # (ops/patches.py::_src_coords)
    j = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0).astype(jnp.float32)
    src = jnp.clip((j + 0.5) * st - 0.5, 0.0, 2.0 * ph - 1.0)   # (S,1)
    src0 = src[0, 0]

    # sub-windows subset sublanes (y, 8-aligned dynamic offset) AND lanes
    # (x, 128-aligned dynamic offset); the tent coordinates absorb both
    # origins, so alignment costs coverage (sized by min_sub_window*), not
    # correctness
    uy = jax.lax.broadcasted_iota(jnp.int32, (s, w), 1
                                  ).astype(jnp.float32)         # (S,W)
    ux = jax.lax.broadcasted_iota(jnp.int32, (s, wx), 1
                                  ).astype(jnp.float32)         # (S,WX)
    mm_dtype, precision = _PRECISIONS[sampling]

    for lm in range(l):
        by = oxy_ref[0, 0, lm]            # crop origin, window space
        bx = oxy_ref[0, 0, l + lm]
        oy = jnp.clip(jnp.floor(by + src0), 0.0, float(ry - w)
                      ).astype(jnp.int32)
        oy = pl.multiple_of((oy // SUBLANE_ALIGN) * SUBLANE_ALIGN,
                            SUBLANE_ALIGN)
        if wx == rx:
            sub = win_ref[0, pl.ds(oy, w), :].astype(mm_dtype)  # (W,RX)
            ox = jnp.float32(0.0)
        else:
            # rx and wx are both multiples of 128 here (asserted by the
            # wrapper), so clip-then-floor stays within [0, rx - wx]
            oxi = jnp.clip(jnp.floor(bx + src0), 0.0, float(rx - wx)
                           ).astype(jnp.int32)
            oxi = pl.multiple_of((oxi // LANE_ALIGN) * LANE_ALIGN,
                                 LANE_ALIGN)
            sub = win_ref[0, pl.ds(oy, w), pl.ds(oxi, wx)
                          ].astype(mm_dtype)                    # (W,WX)
            ox = oxi.astype(jnp.float32)

        cy = by + src - oy.astype(jnp.float32)                  # (S,1)
        cx = bx + src - ox
        ty = jnp.maximum(0.0, 1.0 - jnp.abs(cy - uy))
        tx = jnp.maximum(0.0, 1.0 - jnp.abs(cx - ux))
        if quantize and mm_dtype != jnp.bfloat16:
            # cv::resize 8U: 11-bit fixed-point coefficients (see
            # ops/patches.py::_quantize_coef; bf16 fast mode skips — its
            # 8 mantissa bits cannot hold the grid)
            ty = jnp.round(ty * 2048.0) * (1.0 / 2048.0)
            tx = jnp.round(tx * 2048.0) * (1.0 / 2048.0)
        ty = ty.astype(mm_dtype)
        tx = tx.astype(mm_dtype)

        if transposed:
            # x-contraction first, emitting patch^T: replaces the
            # N=WX-lane dot1 + N=S dot2 of the direct order with
            # K=WX dot1 + K=W dot2 — ~25% fewer padded MXU FLOPs at
            # serving shapes (both outputs pad S to 128 lanes, but the
            # direct order's dot2 contracts WX > W). Consumers get
            # patch[x, y]; pair with hog(..., transposed=True).
            q = jax.lax.dot_general(                            # (S,W) f32
                tx, sub, (((1,), (1,)), ((), ())),
                precision=precision, preferred_element_type=jnp.float32)
            patch = jax.lax.dot_general(                        # (S,S) f32
                q.astype(mm_dtype), ty, (((1,), (1,)), ((), ())),
                precision=precision, preferred_element_type=jnp.float32)
        else:
            rows = jax.lax.dot_general(                         # (S,WX) f32
                ty, sub, (((1,), (0,)), ((), ())),
                precision=precision, preferred_element_type=jnp.float32)
            patch = jax.lax.dot_general(                        # (S,S) f32
                rows.astype(mm_dtype), tx, (((1,), (1,)), ((), ())),
                precision=precision, preferred_element_type=jnp.float32)
        if quantize:
            patch = jnp.clip(jnp.floor(patch + 0.5), 0.0, 255.0)
        o_ref[0, lm] = patch.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "out_size", "sub_window", "sub_window_x", "quantize", "sampling",
    "transposed", "out_dtype", "interpret"))
def sample_patches_window(windows: jnp.ndarray,
                          centers_x: jnp.ndarray,
                          centers_y: jnp.ndarray,
                          patch_half: jnp.ndarray,
                          out_size: int,
                          sub_window: int = 0,
                          sub_window_x: int = 0,
                          quantize: bool = True,
                          sampling: str = None,
                          transposed: bool = False,
                          out_dtype=jnp.float32,
                          interpret: bool = False) -> jnp.ndarray:
    """Sample (N, L, S, S) patches from per-sample ROI windows.

    windows: (N, RY, RX) bf16 or f32 (rectangular windows are fine, e.g.
    full-image-width row bands); centers in window coordinates;
    patch_half: (N,) traced scalar per sample.
    sub_window: static row-window W, a multiple of 8 (0 -> RY).
    sub_window_x: static column-window WX, a multiple of 128 (0 -> RX) —
    shrinks the sampling dots from the full window width to WX lanes;
    requires RX to be a multiple of 128 too (so aligned origins can reach
    the right edge).
    Patches whose extent exceeds max_patch_half(W)*2 (rows) or
    max_patch_half_x(WX)*2 (columns) are silently truncated — see the
    module caveat (callers should clamp via the max_patch_half helpers).
    sampling: 'exact' (f32 HIGHEST), 'high' (f32 bf16x3 passes) or 'fast'
    (bf16); default 'fast' for bf16 windows else 'exact'.
    transposed: emit patch^T per landmark (out[n, l, x, y]) via the
    cheaper x-first dot order — pair with a transposed-input HOG.
    out_dtype: patch dtype (f32 default; bf16 is lossless for quantized
    pixels and halves the hand-off traffic to a fused consumer).
    """
    # Pallas TPU kernels only run interpreted on the CPU backend (tests,
    # debugging); auto-switch so the window serving path is portable
    interpret = interpret or jax.default_backend() == "cpu"
    n, ry, rx = windows.shape
    _, l = centers_x.shape
    s = out_size
    w = sub_window or ry
    wx = sub_window_x or rx
    if not (w <= ry and w % SUBLANE_ALIGN == 0 and ry % SUBLANE_ALIGN == 0):
        raise ValueError(
            f"sample_patches_window: row sub-window W={w} and window "
            f"height RY={ry} must both be multiples of {SUBLANE_ALIGN} "
            f"with W <= RY")
    if not (wx <= rx and (wx == rx or
                          (wx % LANE_ALIGN == 0 and rx % LANE_ALIGN == 0))):
        raise ValueError(
            f"sample_patches_window: column sub-window WX={wx} requires "
            f"both WX and the window width RX={rx} to be multiples of "
            f"{LANE_ALIGN} (or WX == RX); size sub-windows via "
            f"models.rcr.level_sub_windows, which only enables lane "
            f"sub-windows for 128-aligned ROIs")
    if sampling is None:
        sampling = "fast" if windows.dtype == jnp.bfloat16 else "exact"
    if windows.dtype == jnp.uint8:
        # Mosaic cannot cast uint8 in-kernel; cast once here (callers keep
        # uint8 stacks in HBM and should pre-cast when reusing windows
        # across levels). bf16 is lossless for 0..255 pixels.
        windows = windows.astype(
            jnp.bfloat16 if sampling == "fast" else jnp.float32)

    cx = jnp.round(centers_x)
    cy = jnp.round(centers_y)
    oxy = jnp.concatenate([cy - patch_half[:, None],
                           cx - patch_half[:, None]], axis=1)   # (N, 2L)
    sp = jnp.stack([2.0 * patch_half / s, patch_half], axis=1)  # (N, 2)

    kernel = functools.partial(
        _sampler_kernel, num_landmarks=l, out_size=s, sub_window=w,
        sub_window_x=wx, roi_y=ry, roi_x=rx, quantize=quantize,
        sampling=sampling, transposed=transposed)
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            # per-step scalar rows live in SMEM (whole-array scalar
            # prefetch at serving batch sizes overflows the 1 MB SMEM);
            # singleton middle axis so the block's trailing dims equal the
            # array's, as the SMEM lowering requires
            pl.BlockSpec((1, 1, 2 * l), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ry, rx), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, l, s, s), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, l, s, s), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(oxy.astype(jnp.float32)[:, None, :],
      sp.astype(jnp.float32)[:, None, :], windows)
    return out
