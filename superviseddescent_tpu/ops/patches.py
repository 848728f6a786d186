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
  * `quantize=True` emulates the reference's uint8 resize (the crop is
    resized *before* converting to float, adaptive_vlhog.hpp:155-157).
    The gather path reproduces OpenCV's 8U fixed-point pipeline
    BIT-EXACTLY (11-bit coefficients, truncating >>4 / mulhi>>16 shifts,
    replicate-border with unclamped fractions — see the quantize branch in
    extract_patches); the MXU paths (extract_patches_dense, the Pallas
    window sampler) use float math with 11-bit-quantised tent weights and
    may differ from OpenCV by 1 LSB on ~12% of pixels (the truncating
    shifts cannot ride a fused matmul).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# cv::resize's 8U INTER_LINEAR path quantises the bilinear coefficients to
# 11-bit fixed point: short coeff = cvRound(w * 2048) (INTER_RESIZE_COEF
# in imgproc/resize.cpp), then rounds (sum + 2^21) >> 22 at the end. The
# complementary coefficients always sum to exactly 2048 after rounding, so
# quantising each tent weight independently reproduces the pair.
_CV_RESIZE_COEF = 2048.0


def _quantize_coef(t):
    """Snap bilinear weights to cv::resize's 11-bit fixed-point grid."""
    return jnp.round(t * _CV_RESIZE_COEF) * (1.0 / _CV_RESIZE_COEF)


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

    # source sampling coordinates per sample: (N, S) each axis.
    # Float path: crop-space clamped coordinates (mathematically equal to
    # cv::resize's replicate-border handling — replicating pixel p with
    # fraction f gives p*(1-f) + p*f = p, the same as clamping f to 0).
    # Quantized path: the fraction must stay UNCLAMPED (cv::resize clamps
    # only the indices; the split truncation of the fixed-point products
    # differs from the merged one at borders).
    if quantize:
        d = jnp.arange(out_size, dtype=dtype)
        src = jax.vmap(lambda ph: (d + 0.5) * (2.0 * ph / out_size) - 0.5
                       )(patch_half)                        # (N, S), raw
    else:
        src = jax.vmap(lambda ph: _src_coords(ph, out_size, dtype)
                       )(patch_half)
    ax = origin_x[:, :, None] + src[:, None, :]             # (N, L, S)
    ay = origin_y[:, :, None] + src[:, None, :]

    # crop-space fractions (small numbers -> full f32 precision, like
    # OpenCV's float fx)
    sf = src[:, None, :]                                    # (N, 1, S)
    s0 = jnp.floor(sf)
    frac = sf - s0                                          # (N, 1, S)
    x0 = jnp.floor(ax)
    y0 = jnp.floor(ay)
    wx = jnp.broadcast_to(frac, ax.shape)[:, :, None, :]    # (N, L, 1, S)
    wy = jnp.broadcast_to(frac, ay.shape)[:, :, None, :
                                          ].transpose(0, 1, 3, 2)
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    # Separable two-stage sampling (TPU-friendly): a pointwise 2-D gather is
    # catastrophically slow on TPU (element-granular); instead gather whole
    # image ROWS (contiguous W-lane copies), then take_along_axis on the
    # lane dimension.
    def rows_at(iy):
        """(N, L, S) row indices -> (N, L, S, W) rows, zero outside."""
        inb = ((iy >= 0) & (iy < h))[..., None]
        iyc = jnp.clip(iy, 0, h - 1)
        vals = images[image_indices[:, None, None], iyc, :].astype(dtype)
        return jnp.where(inb, vals, jnp.asarray(0.0, dtype))

    def cols_at(rows, ix):
        """(N, L, S) col indices -> (N, L, S, S) via lane take, 0 outside."""
        inb = ((ix >= 0) & (ix < w))[:, :, None, :]
        ixc = jnp.clip(ix, 0, w - 1)
        take = jnp.broadcast_to(ixc[:, :, None, :],
                                (n, l, out_size, out_size))
        vals = jnp.take_along_axis(rows, take, axis=3)
        return jnp.where(inb, vals, jnp.asarray(0.0, dtype))

    if not quantize:
        # float bilinear: the y-mix happens in row space so only one
        # (N, L, S, W) row tensor is ever materialised
        rows = (rows_at(y0) * (1.0 - wy) + rows_at(y0 + 1) * wy)
        return cols_at(rows, x0) * (1.0 - wx) + cols_at(rows, x0 + 1) * wx

    # quantize=True: BIT-EXACT emulation of cv::resize's 8U INTER_LINEAR
    # pipeline (imgproc/resize.cpp, the vectorised path every desktop
    # OpenCV takes). Verified exact against cv2 across up/down scales
    # (scripts/parity_e2e.py):
    #   a1 = cvRound(fx*2048); a0 = 2048-a1  (11-bit coefficients; the
    #       fraction is NOT clamped at borders — only the source indices
    #       replicate-clamp into the crop)
    #   h  = p0*a0 + p1*a1                   (horizontal pass, int)
    #   t  = ((h>>4)*b) >> 16 per row pair   (vertical mulhi path)
    #   dst = sat((t0 + t1 + 2) >> 2)
    # The truncating shifts differ from exact float + final rounding on
    # ~12% of pixels by 1 greylevel; integer ops reproduce them exactly
    # (all intermediates fit int32). This is the parity path; the MXU
    # samplers (extract_patches_dense / the Pallas window kernel) keep
    # float math with a documented +-1 LSB difference class.
    ext = (2.0 * patch_half - 1.0)[:, None, None]           # (N, 1, 1)
    i0 = jnp.clip(s0, 0.0, ext)                             # (N, 1, S) crop
    i1 = jnp.clip(s0 + 1.0, 0.0, ext)
    ix0 = (origin_x[:, :, None] + i0).astype(jnp.int32)     # (N, L, S)
    ix1 = (origin_x[:, :, None] + i1).astype(jnp.int32)
    iy0 = (origin_y[:, :, None] + i0).astype(jnp.int32)
    iy1 = (origin_y[:, :, None] + i1).astype(jnp.int32)
    r0 = rows_at(iy0)
    r1 = rows_at(iy1)
    c00 = cols_at(r0, ix0).astype(jnp.int32)
    c01 = cols_at(r0, ix1).astype(jnp.int32)
    c10 = cols_at(r1, ix0).astype(jnp.int32)
    c11 = cols_at(r1, ix1).astype(jnp.int32)
    ax1 = jnp.round(wx * 2048.0).astype(jnp.int32)          # (N, L, 1, S)
    ay1 = jnp.round(wy * 2048.0).astype(jnp.int32)          # (N, L, S, 1)
    ax0 = 2048 - ax1
    ay0 = 2048 - ay1
    h0 = c00 * ax0 + c01 * ax1                              # <= 255*2048
    h1 = c10 * ax0 + c11 * ax1
    t = (((h0 >> 4) * ay0) >> 16) + (((h1 >> 4) * ay1) >> 16)
    return jnp.clip((t + 2) >> 2, 0, 255).astype(dtype)


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
    ty = jnp.maximum(0.0, 1.0 - jnp.abs(ay[..., None] - rows_iota))  # (N,L,S,H)
    tx = jnp.maximum(0.0, 1.0 - jnp.abs(ax[..., None] - cols_iota))  # (N,L,S,W)
    if quantize and tent_dtype != jnp.bfloat16:
        # uint8 resize: 11-bit fixed-point coefficients (exact-parity
        # paths only; bf16 tents cannot hold the 11-bit grid anyway)
        ty = _quantize_coef(ty)
        tx = _quantize_coef(tx)
    ty = ty.astype(tent_dtype)
    tx = tx.astype(tent_dtype)

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


def stack_images(gray_images, dtype=None, pad_width_to=1,
                 pad_height_to=None):
    """Zero-pad a list of (H_i, W_i) images into one (I, Hmax, Wmax) stack.

    Zero padding preserves the reference's zero-border patch semantics for
    out-of-image crops, so differently-sized training images batch cleanly.
    Returns (stack, sizes) where sizes is (I, 2) [h, w].

    dtype: np.float32 (default) or np.uint8 — uint8 quarters the device
    memory of big training stacks; the samplers cast per chunk.
    pad_width_to: round the stack width up to a multiple of this (128
    enables the stepped detector's lane-static rows-only ROI crop).
    pad_height_to: round the stack height up likewise. Defaults to
    pad_width_to's row grain: a 128-aligned width implies the caller
    wants the fused frames path, whose in-kernel window DMA also needs
    a FRAME_ROW_ALIGN(32)-aligned height so the clamped aligned origins
    lose no bottom rows (ADVICE r3; models/rcr.py::_aligned_origins).
    """
    import numpy as np
    dtype = dtype or np.float32
    if pad_height_to is None:
        pad_height_to = 32 if pad_width_to % 128 == 0 else 1
    hmax = max(im.shape[0] for im in gray_images)
    hmax = -(-hmax // pad_height_to) * pad_height_to
    wmax = max(im.shape[1] for im in gray_images)
    wmax = -(-wmax // pad_width_to) * pad_width_to
    stack = np.zeros((len(gray_images), hmax, wmax), dtype)
    sizes = np.zeros((len(gray_images), 2), np.int32)
    for i, im in enumerate(gray_images):
        stack[i, :im.shape[0], :im.shape[1]] = np.asarray(im, dtype)
        sizes[i] = im.shape
    return stack, sizes
