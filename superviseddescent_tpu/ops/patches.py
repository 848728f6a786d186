"""Batched landmark-patch extraction: fused crop + zero-pad + resize.

TPU-native replacement for the reference's per-landmark OpenCV sequence
(/root/reference/include/rcr/adaptive_vlhog.hpp:131-157):

    crop a (2*phw)^2 square at the rounded landmark -> zero-pad at image
    borders (copyMakeBorder) -> cv::resize to the fixed HOG input size
    -> convert to float

All three steps collapse into ONE bilinear gather: for destination pixel d,
the source coordinate is crop_origin + clamp((d + 0.5) * (2*phw / S) - 0.5,
0, 2*phw - 1) (cv::resize INTER_LINEAR's mapping with edge clamping inside
the crop), sampled from the original image with zeros outside its bounds
(reproducing the black canvas of copyMakeBorder). The patch size 2*phw is a
*traced scalar* (it depends on the current IED estimate), while the output
size S is static — so the adaptive patch size creates no dynamic shapes.

Parity notes:
  * landmark centers are rounded half-to-even (cvRound);
  * `quantize=True` rounds samples to integers in [0, 255], emulating that
    the reference resizes the uint8 image *before* converting to float
    (adaptive_vlhog.hpp:155-157). OpenCV's fixed-point bilinear may differ
    by at most 1 LSB in rare cases.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _src_coords(patch_half, out_size: int, dtype):
    """cv::resize INTER_LINEAR source coordinates within the crop.

    patch_half: traced scalar (pixels). Returns (out_size,) coordinates in
    crop space, clamped to [0, 2*patch_half - 1].
    """
    d = jnp.arange(out_size, dtype=dtype)
    scale = (2.0 * patch_half) / out_size
    src = (d + 0.5) * scale - 0.5
    return jnp.clip(src, 0.0, 2.0 * patch_half - 1.0)


def extract_patches(images: jnp.ndarray,
                    image_indices: jnp.ndarray,
                    centers_x: jnp.ndarray,
                    centers_y: jnp.ndarray,
                    patch_half: jnp.ndarray,
                    out_size: int,
                    quantize: bool = True) -> jnp.ndarray:
    """Sample fixed-size patches around landmark centers.

    Args:
      images: (I, H, W) float32 image stack (gray, 0..255). Images smaller
        than (H, W) must be zero-padded into the stack — zeros reproduce the
        reference's black-canvas border handling.
      image_indices: (N,) int32 image index per sample.
      centers_x, centers_y: (N, L) landmark coordinates (unrounded).
      patch_half: (N,) per-sample half patch size in source pixels (traced).
      out_size: S, static output patch side (num_cells * cell_size).
      quantize: emulate the reference's uint8 resize output.

    Returns:
      (N, L, S, S) float32 patches.
    """
    dtype = (jnp.float32 if images.dtype == jnp.uint8 else images.dtype)
    n, l = centers_x.shape
    h, w = images.shape[1], images.shape[2]

    # cvRound (round half to even) then crop origin
    cx = jnp.round(centers_x)                               # (N, L)
    cy = jnp.round(centers_y)
    origin_x = cx - patch_half[:, None]                     # (N, L)
    origin_y = cy - patch_half[:, None]

    # source sampling coordinates per sample: (N, S) each axis
    src = jax.vmap(lambda ph: _src_coords(ph, out_size, dtype))(patch_half)
    ax = origin_x[:, :, None] + src[:, None, :]             # (N, L, S)
    ay = origin_y[:, :, None] + src[:, None, :]

    x0 = jnp.floor(ax)
    y0 = jnp.floor(ay)
    wx = (ax - x0)[:, :, None, :]                           # (N, L, 1, S)
    wy = (ay - y0)[:, :, None, :].transpose(0, 1, 3, 2)     # (N, L, S, 1)
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    # Separable two-stage sampling (TPU-friendly): a pointwise 2-D gather is
    # catastrophically slow on TPU (element-granular); instead gather whole
    # image ROWS (contiguous W-lane copies), then take_along_axis on the
    # lane dimension. The bilinear y-mix happens in row space so only one
    # (N, L, S, W) row tensor is ever materialised.
    def rows_at(iy):
        """(N, L, S) row indices -> (N, L, S, W) rows, zero outside."""
        inb = ((iy >= 0) & (iy < h))[..., None]
        iyc = jnp.clip(iy, 0, h - 1)
        vals = images[image_indices[:, None, None], iyc, :].astype(dtype)
        return jnp.where(inb, vals, jnp.asarray(0.0, dtype))

    # mix the two source rows per output row while still in row space
    rows = (rows_at(y0) * (1.0 - wy) + rows_at(y0 + 1) * wy)  # (N, L, S, W)

    def cols_at(ix):
        """(N, L, S) col indices -> (N, L, S, S) via lane take, 0 outside."""
        inb = ((ix >= 0) & (ix < w))[:, :, None, :]
        ixc = jnp.clip(ix, 0, w - 1)
        take = jnp.broadcast_to(ixc[:, :, None, :],
                                (n, l, out_size, out_size))
        vals = jnp.take_along_axis(rows, take, axis=3)
        return jnp.where(inb, vals, jnp.asarray(0.0, dtype))

    out = cols_at(x0) * (1.0 - wx) + cols_at(x0 + 1) * wx
    if quantize:
        # uint8 resize output: fixed-point rounding, saturating
        out = jnp.clip(jnp.floor(out + 0.5), 0.0, 255.0)
    return out


def extract_patches_dense(images: jnp.ndarray,
                          image_indices: jnp.ndarray,
                          centers_x: jnp.ndarray,
                          centers_y: jnp.ndarray,
                          patch_half: jnp.ndarray,
                          out_size: int,
                          quantize: bool = True,
                          precision=None) -> jnp.ndarray:
    """MXU patch sampling: bilinear interpolation as two tent matmuls.

    Mathematically identical to :func:`extract_patches` (a bilinear sample
    at coordinate a is sum_r tent(a - r) * img[r], and out-of-image rows/
    columns get zero tent weight, reproducing the zero-pad semantics), but
    expressed as dense einsums over the image height/width instead of a
    pointwise gather — pointwise gathers are element-granular on TPU
    (~2 s per RCR level at batch 512) while this runs on the MXU.

    Cost: O(N*L*S*H*W) FLOPs — dense over the image, so best when samples
    map 1:1 to (cropped) images. Materialises images[image_indices]; for
    training batches with heavily shared images, chunk the call or use the
    gather path.

    precision: None -> HIGHEST (exact f32 parity). Pass
    jax.lax.Precision.DEFAULT for bf16 multiplies (~4x faster; pixel error
    comparable to the uint8 quantisation the reference applies anyway).
    """
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    # uint8 and bfloat16 image stacks are supported (4x / 2x less HBM than
    # f32); integer gray pixels 0..255 are EXACT in bf16 (8 mantissa bits),
    # so neither narrow storage changes any sampled value
    dtype = (jnp.float32 if images.dtype in (jnp.uint8, jnp.bfloat16)
             else images.dtype)
    n, l = centers_x.shape
    h, w = images.shape[1], images.shape[2]

    cx = jnp.round(centers_x)
    cy = jnp.round(centers_y)
    src = jax.vmap(lambda ph: _src_coords(ph, out_size, dtype))(patch_half)
    ax = (cx - patch_half[:, None])[:, :, None] + src[:, None, :]  # (N,L,S)
    ay = (cy - patch_half[:, None])[:, :, None] + src[:, None, :]

    # In fast mode the MXU consumes bf16 anyway; building the (large) tent
    # matrices directly in bf16 halves their HBM traffic.
    tent_dtype = (jnp.bfloat16 if precision == jax.lax.Precision.DEFAULT
                  else dtype)
    rows_iota = jnp.arange(h, dtype=dtype)
    cols_iota = jnp.arange(w, dtype=dtype)
    ty = jnp.maximum(0.0, 1.0 - jnp.abs(ay[..., None] - rows_iota)
                     ).astype(tent_dtype)                            # (N,L,S,H)
    tx = jnp.maximum(0.0, 1.0 - jnp.abs(ax[..., None] - cols_iota)
                     ).astype(tent_dtype)                            # (N,L,S,W)

    # fast mode feeds the MXU bf16 directly — reading bf16 windows from HBM
    # halves the dominant memory traffic and multiplies identically (the
    # cast to bf16 happens either way inside a DEFAULT-precision dot)
    img_dtype = (jnp.bfloat16 if precision == jax.lax.Precision.DEFAULT
                 else dtype)
    imgs = images[image_indices].astype(img_dtype)                   # (N,H,W)
    rows = jnp.einsum("nlih,nhw->nliw", ty, imgs, precision=precision,
                      preferred_element_type=dtype)
    out = jnp.einsum("nliw,nljw->nlij", rows, tx, precision=precision,
                     preferred_element_type=dtype)
    if quantize:
        out = jnp.clip(jnp.floor(out + 0.5), 0.0, 255.0)
    return out


def rgb_to_gray_u8(rgb):
    """OpenCV-parity RGB -> gray for uint8 images.

    cv::cvtColor uses fixed-point weights (R*4899 + G*9617 + B*1868 +
    8192) >> 14, equal to rounding 0.299R + 0.587G + 0.114B. The reference
    loads BGR and converts BGR2GRAY (adaptive_vlhog.hpp:114-120) — identical
    result for the same pixel values.

    rgb: (..., 3) uint8 (numpy or jax). Returns (...,) uint8-valued array.
    """
    import numpy as np
    rgb = np.asarray(rgb)
    r = rgb[..., 0].astype(np.int32)
    g = rgb[..., 1].astype(np.int32)
    b = rgb[..., 2].astype(np.int32)
    return ((r * 4899 + g * 9617 + b * 1868 + 8192) >> 14).astype(np.uint8)


def load_gray_image(path):
    """Load an image file as (H, W) float32 gray in [0, 255] with OpenCV
    colour-conversion parity."""
    import numpy as np
    from PIL import Image
    img = Image.open(path)
    if img.mode == "L":
        arr = np.asarray(img, np.uint8)
    else:
        arr = rgb_to_gray_u8(np.asarray(img.convert("RGB"), np.uint8))
    return arr.astype(np.float32)


def stack_images(gray_images, dtype=None, pad_width_to=1):
    """Zero-pad a list of (H_i, W_i) images into one (I, Hmax, Wmax) stack.

    Zero padding preserves the reference's zero-border patch semantics for
    out-of-image crops, so differently-sized training images batch cleanly.
    Returns (stack, sizes) where sizes is (I, 2) [h, w].

    dtype: np.float32 (default) or np.uint8 — uint8 quarters the device
    memory of big training stacks; the samplers cast per chunk.
    pad_width_to: round the stack width up to a multiple of this (128
    enables the stepped detector's lane-static rows-only ROI crop).
    """
    import numpy as np
    dtype = dtype or np.float32
    hmax = max(im.shape[0] for im in gray_images)
    wmax = max(im.shape[1] for im in gray_images)
    wmax = -(-wmax // pad_width_to) * pad_width_to
    stack = np.zeros((len(gray_images), hmax, wmax), dtype)
    sizes = np.zeros((len(gray_images), 2), np.int32)
    for i, im in enumerate(gray_images):
        stack[i, :im.shape[0], :im.shape[1]] = np.asarray(im, dtype)
        sizes[i] = im.shape
    return stack, sizes
