"""VLFeat-style HOG descriptors as pure XLA ops, batched over patches.

From-scratch TPU reimplementation of the behaviour of the reference's
vendored VLFeat HOG kernel (/root/reference/include/rcr/hog.c: vl_hog_new
:174, vl_hog_put_image :596, vl_hog_extract :858) — the one large native
C kernel of the reference — redesigned for the MXU/VPU:

  * The per-pixel scalar loops of vl_hog_put_image become vectorised
    gradient + hard orientation assignment over the whole (B, S, S) patch
    batch at once.
  * The bilinear *spatial splat* of gradient magnitude into cells is
    separable: pixel (x, y) contributes tent(hx - cx) * tent(hy - cy) to
    cell (cx, cy), so the accumulation is two small dense matmuls with
    precomputed (S, C) tent-weight matrices — no scatters, MXU-friendly.
  * vl_hog_extract's block normalisation is pure elementwise math on the
    (B, C, C, 2O) cell tensor (VPU).

Semantics matched to the C (validated bit-close by golden tests against the
reference implementation compiled offline, tests/test_hog_golden.py):

  * interior pixels only (loops start at 1, hog.c:616-617);
  * central differences; gradient normalised by max(||g||, 1e-10) (:645-647);
    multi-channel inputs select the max-squared-gradient channel per pixel
    with the first channel winning ties (:631-648);
  * hard assignment to the best of 2*O directed bins by dot product with
    bin unit vectors (cos, sin)(k*pi/O), strict-> first-wins ties
    (:656-672); bilinear orientation assignment is off by default (:185);
  * cell grid C = (S + cs//2) // cs (:542-543); splat weights from
    h = (p + 0.5)/cs - 0.5 (:696-704);
  * block norms: per-cell squared L2 energy of the folded histogram
    (:875-890), four 2x2-block factors 1/sqrt(sum + 1e-4) with clamped
    border indexing (:926-982), components clamped at 0.2 (:1005-1018);
  * Uoctti output = 0.5 * sum of 4 normalised copies for directed (2O) and
    undirected (O) channels plus 4 texture dims t_i/sqrt(18) (:1025-1052);
    DalalTriggs output = the 4 normalised undirected copies (4O channels).
"""

from __future__ import annotations

import enum
import functools

import jax
import jax.numpy as jnp
import numpy as np


class HogVariant(enum.IntEnum):
    """Matches VlHogVariant (hog.h:72): DalalTriggs=0, Uoctti=1."""
    DalalTriggs = 0
    Uoctti = 1


def hog_num_cells(size: int, cell_size: int) -> int:
    """Cell-grid side length (hog.c:542-543)."""
    return (size + cell_size // 2) // cell_size


def hog_dimension(variant: HogVariant, num_orientations: int) -> int:
    """Descriptor channels per cell (hog.c:212-223)."""
    if variant == HogVariant.Uoctti:
        return 3 * num_orientations + 4
    return 4 * num_orientations


@functools.lru_cache(maxsize=None)
def _cell_weights_full(size: int, cell_size: int) -> np.ndarray:
    """(S, C) tent weights including border pixels (the polar-field entry
    point accumulates all pixels, hog.c:770-771, unlike put_image)."""
    n_cells = hog_num_cells(size, cell_size)
    p = np.arange(size, dtype=np.float64)
    h = (p + 0.5) / cell_size - 0.5
    c = np.arange(n_cells, dtype=np.float64)
    w = np.maximum(0.0, 1.0 - np.abs(h[:, None] - c[None, :]))
    return w.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _cell_weights(size: int, cell_size: int) -> np.ndarray:
    """(S, C) tent-weight matrix: weight of pixel p onto cell c.

    Equivalent to the 4-neighbour bounds-checked splat of hog.c:684-724:
    for h = (p + 0.5)/cs - 0.5, cells floor(h) and floor(h)+1 receive
    weights (1 - frac) and frac — i.e. w(p, c) = max(0, 1 - |h - c|).
    Border pixels (p = 0, S-1) are excluded from the gradient loops.
    """
    n_cells = hog_num_cells(size, cell_size)
    p = np.arange(size, dtype=np.float64)
    h = (p + 0.5) / cell_size - 0.5
    c = np.arange(n_cells, dtype=np.float64)
    w = np.maximum(0.0, 1.0 - np.abs(h[:, None] - c[None, :]))
    w[0, :] = 0.0
    w[-1, :] = 0.0
    return w.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _orientation_vectors(num_orientations: int,
                         transposed: bool = False) -> np.ndarray:
    """(2, O) unit vectors (cos, sin)(k*pi/O) (hog.c:195-204). In the C's
    transposed (column-major image buffer) mode the x/y components are
    swapped (hog.c:197-203)."""
    angles = np.arange(num_orientations, dtype=np.float64) * np.pi / num_orientations
    vecs = np.stack([np.cos(angles), np.sin(angles)]).astype(np.float32)
    return vecs[::-1].copy() if transposed else vecs


@functools.lru_cache(maxsize=None)
def _cell_weights_2d(size: int, cell_size: int) -> np.ndarray:
    """(S*S, C*C) combined tent-weight matrix W2[p, cy*C+cx] =
    Wy[y, cy] * Wx[x, cx] for p = y*S + x — the two separable splat matmuls
    fused into one pixel->cells GEMM (better MXU utilisation, and it keeps
    the pixel axis last so TPU (8, 128) tiling pads nothing pathological)."""
    w = _cell_weights(size, cell_size)            # (S, C)
    w2 = np.einsum("yc,xd->yxcd", w, w)           # (S, S, C, C)
    n_cells = w.shape[1]
    return w2.reshape(size * size, n_cells * n_cells).astype(np.float32)


def hog_cells(images: jnp.ndarray, cell_size: int, num_orientations: int,
              bilinear_orientation: bool = False,
              transposed: bool = False) -> jnp.ndarray:
    """Directed-orientation cell histograms.

    Args:
      images: (B, S, S) float32 patches, values in [0, 255] like the
        reference (uint8 images converted to float), or (B, Ch, S, S)
        planar multi-channel patches (the C's channelStride layout,
        hog.c:603). With Ch > 1 the channel with the maximum squared
        gradient magnitude is selected per pixel (hog.c:631-648; the
        strict ">" update means the FIRST channel wins ties).
      cell_size: HOG cell size in pixels.
      num_orientations: O undirected orientations (2*O directed bins).
      bilinear_orientation: split mass between the two closest directed
        bins (hog.c:674-682; OFF by default like the reference, :185).
        Reproduces the C's quirk of applying the orientation weight to both
        spatial factors, i.e. contributions scale with the weight SQUARED.
      transposed: the buffer is a column-major (Matlab-layout) image
        (vl_hog_new's transposed flag): orientation unit vectors swap their
        x/y components (hog.c:197-203). Pair with hog_extract(...,
        transposed=True).

    Returns:
      (B, C, C, 2*O) cell histograms, [cy, cx, bin] — matching the C's
      hog[x + y*W + bin*W*H] layout transposed to channels-last.
    """
    if images.ndim == 3:
        images = images[:, None, :, :]
    b, ch, s, s2 = images.shape
    assert s == s2, "square patches expected"
    dtype = images.dtype
    n_cells = hog_num_cells(s, cell_size)
    two_o = 2 * num_orientations

    # Layout rule (TPU (8, 128) tiling): never put a tiny axis (O, C) in the
    # trailing two positions of a large tensor. All big intermediates here
    # are (B, [O,] P) with P = S*S as the lane axis.

    # Central differences on interior pixels (borders get zero weight
    # via the tent matrices anyway, but zero them for exactness).
    gx = jnp.zeros_like(images)
    gy = jnp.zeros_like(images)
    gx = gx.at[:, :, :, 1:-1].set(images[:, :, :, 2:] - images[:, :, :, :-2])
    gy = gy.at[:, :, 1:-1, :].set(images[:, :, 2:, :] - images[:, :, :-2, :])
    gx = gx.reshape(b, ch, s * s)
    gy = gy.reshape(b, ch, s * s)

    if ch == 1:
        gx = gx[:, 0, :]
        gy = gy[:, 0, :]
    else:
        # Max-gradient channel selection (hog.c:631-648): argmax's
        # first-max-wins matches the C's strict ">" update; the all-zero
        # case picks channel 0, whose gradient is the C's (0, 0) init.
        grad2 = gx * gx + gy * gy                               # (B, Ch, P)
        k = jnp.argmax(grad2, axis=1)[:, None, :]               # (B, 1, P)
        gx = jnp.take_along_axis(gx, k, axis=1)[:, 0, :]
        gy = jnp.take_along_axis(gy, k, axis=1)[:, 0, :]

    grad = jnp.sqrt(gx * gx + gy * gy)                          # (B, P)
    denom = jnp.maximum(grad, jnp.asarray(1e-10, dtype))
    gxn = gx / denom
    gyn = gy / denom

    ov = jnp.asarray(_orientation_vectors(num_orientations, transposed))
    # scores_k = gxn*cos_k + gyn*sin_k  -> (B, O, P): O mid-axis, P last
    scores = (gxn[:, None, :] * ov[0][None, :, None]
              + gyn[:, None, :] * ov[1][None, :, None])
    abs_scores = jnp.abs(scores)
    k_best = jnp.argmax(abs_scores, axis=1)                     # (B, P), first max wins
    best_score = jnp.take_along_axis(abs_scores, k_best[:, None, :],
                                     axis=1)[:, 0, :]
    sign_neg = jnp.take_along_axis(scores, k_best[:, None, :],
                                   axis=1)[:, 0, :] < 0
    directed = k_best + num_orientations * sign_neg.astype(k_best.dtype)

    oids = jnp.arange(two_o, dtype=directed.dtype)[None, :, None]
    if bilinear_orientation:
        # second-best directed bin (strict ">" updates -> first max wins)
        masked = jnp.where(
            jax.nn.one_hot(k_best, num_orientations, dtype=jnp.bool_,
                           axis=1), -jnp.inf, abs_scores)
        k2 = jnp.argmax(masked, axis=1)
        sign2_neg = jnp.take_along_axis(scores, k2[:, None, :],
                                        axis=1)[:, 0, :] < 0
        directed2 = k2 + num_orientations * sign2_neg.astype(k2.dtype)
        # weights from the angle to the best bin (hog.c:676-678); the C
        # multiplies the weight into both spatial factors -> squared
        angle0 = jnp.arccos(jnp.minimum(best_score, 1.0))
        w1 = angle0 / (np.pi / num_orientations)
        w0 = 1.0 - w1
        g = (grad[:, None, :] * jnp.square(w0)[:, None, :]
             * (directed[:, None, :] == oids).astype(dtype)
             + grad[:, None, :] * jnp.square(w1)[:, None, :]
             * (directed2[:, None, :] == oids).astype(dtype))
    else:
        # hard assignment: G[b, o, p] = grad * (directed == o)
        g = grad[:, None, :] * (directed[:, None, :] == oids).astype(dtype)

    # one pixels->cells GEMM: (B*2O, P) x (P, C*C)
    w2 = jnp.asarray(_cell_weights_2d(s, cell_size))            # (P, C*C)
    cells = jnp.einsum("bop,pc->boc", g, w2,
                       precision=jax.lax.Precision.HIGHEST)     # (B,2O,C*C)
    cells = cells.reshape(b, two_o, n_cells, n_cells)
    return jnp.transpose(cells, (0, 2, 3, 1))                   # (B,C,C,2O)


def hog_cells_from_polar(modulus: jnp.ndarray, angle: jnp.ndarray,
                         directed: bool, cell_size: int,
                         num_orientations: int,
                         bilinear_orientation: bool = False) -> jnp.ndarray:
    """Cell histograms from a user-supplied polar gradient field.

    Behavioural rebuild of vl_hog_put_polar_field (hog.c:746-845): angles
    are measured clockwise from the x axis (y down); they wrap at 2*pi when
    `directed` else at pi. Unlike the image entry point, ALL pixels
    contribute (no border exclusion) and orientation assignment rounds the
    angle to the nearest bin (or splits bilinearly).

    modulus, angle: (B, S, S). Returns (B, C, C, 2*O) — undirected mode
    populates only the first O channels, matching the C buffer layout.
    """
    b, s, s2 = modulus.shape
    assert s == s2
    dtype = modulus.dtype
    o_count = num_orientations
    two_o = 2 * o_count
    period = o_count * (2 if directed else 1)
    n_cells = hog_num_cells(s, cell_size)

    mod = modulus.reshape(b, s * s)
    ang = angle.reshape(b, s * s)
    angle_step = np.pi / o_count
    ho = ang / jnp.asarray(angle_step, dtype)
    bino = jnp.floor(ho)
    wo2 = ho - bino
    wo1 = 1.0 - wo2
    bino = jnp.mod(bino.astype(jnp.int32), two_o)     # the C while-loop wrap

    mod = jnp.where(mod > 0, mod, 0.0)                # <=0 pixels contribute 0
    oids = jnp.arange(two_o, dtype=jnp.int32)[None, :, None]
    if bilinear_orientation:
        # Reference quirk (hog.c:823-826): the orientation weight is
        # multiplied into BOTH the wx and wy spatial weights, so each
        # contribution is scaled by wo^2 (total mass wo1^2 + wo2^2 < 1).
        # Reproduced bit-for-bit; validated against the C goldens.
        b0 = jnp.mod(bino, period)[:, None, :]
        b1 = jnp.mod(bino + 1, period)[:, None, :]
        w0 = jnp.square(wo1)[:, None, :]
        w1 = jnp.square(wo2)[:, None, :]
        g = (mod[:, None, :] * w0 * (b0 == oids).astype(dtype)
             + mod[:, None, :] * w1 * (b1 == oids).astype(dtype))
    else:
        nearest = jnp.mod(bino + (wo1 <= wo2).astype(jnp.int32), period)
        g = mod[:, None, :] * (nearest[:, None, :] == oids).astype(dtype)

    w = jnp.asarray(_cell_weights_full(s, cell_size))           # (S, C)
    w2 = jnp.einsum("yc,xd->yxcd", w, w).reshape(
        s * s, n_cells * n_cells)
    cells = jnp.einsum("bop,pc->boc", g, jnp.asarray(w2),
                       precision=jax.lax.Precision.HIGHEST)
    cells = cells.reshape(b, two_o, n_cells, n_cells)
    return jnp.transpose(cells, (0, 2, 3, 1))


def hog_extract(cells: jnp.ndarray, variant: HogVariant = HogVariant.Uoctti,
                transposed: bool = False) -> jnp.ndarray:
    """Block-normalised descriptor from directed cell histograms.

    cells: (B, C, C, 2*O) -> (B, C, C, D) with D = hog_dimension(...).

    With `transposed` (column-major image buffers) the second and third
    block-norm factors swap (hog.c:971-981), reordering the DalalTriggs
    copies and the Uoctti texture dims.
    """
    b, c, c2, two_o = cells.shape
    num_orientations = two_o // 2
    dtype = cells.dtype

    ha = cells[..., :num_orientations]          # directed, first half
    hb = cells[..., num_orientations:]          # directed, second half
    folded = ha + hb                            # undirected histogram

    energy = jnp.sum(folded * folded, axis=-1)  # (B, C, C) cell energy

    # clamped 3x3 neighbourhood via edge-replicate padding (hog.c:930-943)
    e = jnp.pad(energy, ((0, 0), (1, 1), (1, 1)), mode="edge")
    n1 = e[:, :-2, :-2]; n2 = e[:, :-2, 1:-1]; n3 = e[:, :-2, 2:]
    n4 = e[:, 1:-1, :-2]; n5 = e[:, 1:-1, 1:-1]; n6 = e[:, 1:-1, 2:]
    n7 = e[:, 2:, :-2]; n8 = e[:, 2:, 1:-1]; n9 = e[:, 2:, 2:]

    eps = jnp.asarray(1e-4, dtype)
    f1 = jax.lax.rsqrt(n1 + n2 + n4 + n5 + eps)
    f2 = jax.lax.rsqrt(n2 + n3 + n5 + n6 + eps)
    f3 = jax.lax.rsqrt(n4 + n5 + n7 + n8 + eps)
    f4 = jax.lax.rsqrt(n5 + n6 + n8 + n9 + eps)
    if transposed:
        f2, f3 = f3, f2
    factors = jnp.stack([f1, f2, f3, f4], axis=-1)[..., None]   # (B,C,C,4,1)

    clamp = jnp.asarray(0.2, dtype)
    ha_i = factors * ha[..., None, :]                           # (B,C,C,4,O)
    hb_i = factors * hb[..., None, :]
    hc_i = jnp.minimum(ha_i + hb_i, clamp)  # hc built from unclamped parts
    ha_i = jnp.minimum(ha_i, clamp)
    hb_i = jnp.minimum(hb_i, clamp)

    if variant == HogVariant.Uoctti:
        out_ha = 0.5 * jnp.sum(ha_i, axis=-2)
        out_hb = 0.5 * jnp.sum(hb_i, axis=-2)
        out_hc = 0.5 * jnp.sum(hc_i, axis=-2)
        t = jnp.sum(hc_i, axis=-1) * jnp.asarray(
            np.float32(1.0) / np.sqrt(np.float32(18.0)), dtype)  # (B,C,C,4)
        return jnp.concatenate([out_ha, out_hb, out_hc, t], axis=-1)
    # DalalTriggs: the four normalised undirected copies, factor-major
    return hc_i.reshape(b, c, c2, 4 * num_orientations)


def hog_descriptor(images: jnp.ndarray, cell_size: int, num_orientations: int,
                   variant: HogVariant = HogVariant.Uoctti,
                   transposed: bool = False) -> jnp.ndarray:
    """Full HOG pipeline: (B, S, S) patches -> (B, C*C*D) row descriptors.

    Also accepts (B, Ch, S, S) planar multi-channel patches (max-gradient
    channel selection, see hog_cells).

    Flattening follows the reference's Matlab column-major order
    (adaptive_vlhog.hpp:166-175): index = d*C*C + x*C + y.
    """
    cells = hog_cells(images, cell_size, num_orientations,
                      transposed=transposed)
    desc = hog_extract(cells, variant, transposed=transposed)   # (B,C,C,D)
    desc = jnp.transpose(desc, (0, 3, 2, 1))                    # (B,D,X,Y)
    return desc.reshape(desc.shape[0], -1)
