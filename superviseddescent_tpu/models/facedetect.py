"""TPU-native Viola-Jones face detection (Haar cascade evaluator).

The reference library leaves face detection to OpenCV's
``CascadeClassifier::detectMultiScale`` (rcr-detect.cpp:110,
rcr-train.cpp:410, rcr-track.cpp:141; default model
``haarcascade_frontalface_alt2.xml``). This module makes the framework
standalone: it evaluates the same stock OpenCV cascade files on device,
redesigned for the MXU instead of the reference's per-window integral-image
scalar loops:

  * Every Haar feature is linear in the window's pixels, so the whole
    weak-classifier bank evaluates as TWO matmuls: window patches
    ``(N, wh*ww)`` against the node-0 / node-1 pixel-weight banks
    ``(wh*ww, T)`` built by ``io/haar.py``. No integral images, no
    per-feature gathers — the MXU computes every tree of every window.
  * There is no per-window early exit (that is data-dependent control
    flow); instead all S stage sums are computed densely and combined
    with a running pass mask. The wasted FLOPs are MXU-cheap; the
    branchy reference algorithm becomes 2 matmuls + static slicing.
  * Variance normalisation folds into the node comparison:
    ``raw/nf < t  <=>  raw < t*nf`` (nf > 0), so no divisions.
  * The scale pyramid resizes the image (like OpenCV's new
    implementation) and reuses the one compiled single-scale program per
    image shape.

Numerics: window pixel sums are exact in f32 (integer pixel values,
integer rect weights); the squared-sum for the norm factor can round in
the last bits vs OpenCV's integer integrals, so windows razor-close to a
node threshold may flip. cv2 5.x removed CascadeClassifier, so there is
no OpenCV run to diff against in this environment; validation is against
the reference's own check_face ground-truth criterion on the bundled
LFPW images plus an exactly-predictable synthetic cascade
(tests/test_facedetect.py), with the evaluator semantics documented
line-by-line against cascadedetect.cpp in io/haar.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from superviseddescent_tpu.io.haar import HaarCascadeData, parse_opencv_cascade


@functools.partial(jax.jit, static_argnames=("wh", "ww", "stride",
                                             "stage_bounds"))
def _evaluate_scale(image, bank0, bank1, thresh0, thresh1, flip0, leaves,
                    stage_thresholds, norm_mask, wh: int, ww: int,
                    stride: int, stage_bounds: Tuple[int, ...]):
    """Dense cascade evaluation over every stride-aligned window.

    image: (H, W) f32 grayscale. Returns (oh, ow) bool pass mask.
    """
    img = image[None, None, :, :]                           # NCHW
    patches = jax.lax.conv_general_dilated_patches(
        img, filter_shape=(wh, ww), window_strides=(stride, stride),
        padding="VALID")                                    # (1, wh*ww, oh, ow)
    _, d, oh, ow = patches.shape
    p = patches.reshape(d, oh * ow).T                       # (N, wh*ww)

    # inner-rect variance norm factor (OpenCV normrect = (1,1,w-2,h-2)):
    # nf = sqrt(area*sumsq - sum^2), or 1 if non-positive. HIGHEST
    # precision: squared pixels need 16 mantissa bits, and the variance
    # is a catastrophic cancellation — bf16 multiplies would corrupt nf
    # (and with it every threshold comparison) on TPU.
    # Pixels are centred at 128 first: area*Σ(p-c)^2 - (Σ(p-c))^2 is
    # mathematically identical to the uncentred form for any constant c,
    # but shrinks both operands of the subtraction by ~4x (and for integer
    # pixels the centred sums are exact in f32 up to ~20x20 windows),
    # keeping the cancellation benign on low-variance windows where the
    # uncentred f32 products can lose all significant bits (ADVICE r1).
    area = jnp.sum(norm_mask)
    pc = p - 128.0
    s = jnp.dot(pc, norm_mask,
                precision=jax.lax.Precision.HIGHEST)        # (N,)
    sq = jnp.dot(pc * pc, norm_mask,
                 precision=jax.lax.Precision.HIGHEST)
    var = area * sq - s * s
    nf = jnp.where(var > 0.0, jnp.sqrt(jnp.maximum(var, 0.0)), 1.0)

    raw0 = jax.lax.dot_general(
        p, bank0, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)                # (N, T)
    raw1 = jax.lax.dot_general(
        p, bank1, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)
    nfc = nf[:, None]
    # flip0: trees whose TRUE branch descends to node 1 (swapped children
    # in the XML) — XOR the node-0 comparison so "True" always means leaf 0
    cond0 = jnp.logical_xor(raw0 < thresh0[None, :] * nfc, flip0[None, :])
    leaf = jnp.where(cond0,
                     leaves[None, :, 0],
                     jnp.where(raw1 < thresh1[None, :] * nfc,
                               leaves[None, :, 1],
                               leaves[None, :, 2]))         # (N, T)

    passed = jnp.ones((p.shape[0],), bool)
    for si in range(len(stage_bounds) - 1):
        a, b = stage_bounds[si], stage_bounds[si + 1]
        stage_sum = jnp.sum(leaf[:, a:b], axis=1)
        passed = jnp.logical_and(passed, stage_sum >= stage_thresholds[si])
    return passed.reshape(oh, ow)


@functools.partial(jax.jit, static_argnames=("rows",))
def _pad_rows(x, rows: int):
    """Zero-pad rows as a jitted program (an eager jnp.pad in the
    banded serving path would dispatch synchronously per scale)."""
    return jnp.pad(x, ((0, rows), (0, 0)))


@jax.jit
def _flatten_masks(*pieces):
    """Ravel + concatenate every pyramid scale's mask bands into ONE
    buffer so the host needs a single readback for the whole pyramid.
    Recompiles per distinct shape tuple — shapes are 64-bucketed, so one
    compile per image-size class. (Fallback path: the serving path is
    _compact_candidates, whose readback is K indices, not mask bands.)"""
    return jnp.concatenate([p.reshape(-1) for p in pieces])


@functools.partial(jax.jit, static_argnames=("k",))
def _compact_candidates(valids, k: int, *pieces):
    """Device-side candidate extraction: mask each pyramid piece to its
    valid (rows, cols) region (the bucketed evaluation pads beyond the
    true scaled size — padding windows must never become detections),
    flatten everything, and compact the passing flat indices to a fixed
    k-slot buffer. Returns one (k+1,) int32 array [idx_0..idx_{k-1},
    total_count] so the host needs a SINGLE few-KB readback for the
    whole pyramid — the mask-band readback plus host np.nonzero used to
    dominate detect() latency (~50 of ~80 ms at 600x512,
    docs/PERF_NOTES.md). Slots past the count hold -1; if count > k the
    host falls back to the full-mask readback (correctness over speed).

    valids: (n_pieces, 2) int32 [valid_rows, valid_cols] per piece.
    """
    flats = []
    for i, p in enumerate(pieces):
        ih = jax.lax.broadcasted_iota(jnp.int32, p.shape, 0)
        iw = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
        m = jnp.logical_and(p, jnp.logical_and(ih < valids[i, 0],
                                               iw < valids[i, 1]))
        flats.append(m.reshape(-1))
    flat = jnp.concatenate(flats)
    count = jnp.sum(flat.astype(jnp.int32))
    (idx,) = jnp.nonzero(flat, size=k, fill_value=-1)
    return jnp.concatenate([idx.astype(jnp.int32), count[None]])


@functools.partial(jax.jit, static_argnames=("sh", "sw", "bh", "bw"))
def _resize_pad(img, sh: int, sw: int, bh: int, bw: int):
    """Pyramid step: f32 cast + resize (cv2-style bilinear, no
    antialias) + zero-pad to the compile bucket, in one jitted program
    (the cast here keeps uint8 device frames 100% on the jitted path —
    an eager astype would dispatch synchronously)."""
    scaled = jax.image.resize(img.astype(jnp.float32), (sh, sw),
                              method="linear", antialias=False)
    if (bh, bw) != (sh, sw):
        scaled = jnp.pad(scaled, ((0, bh - sh), (0, bw - sw)))
    return scaled


@functools.partial(jax.jit, static_argnames=("bph", "wh", "ww", "stride",
                                             "stage_bounds"))
def _evaluate_band(image, start_row, bank0, bank1, thresh0, thresh1, flip0,
                   leaves, stage_thresholds, norm_mask, bph: int, wh: int,
                   ww: int, stride: int, stage_bounds: Tuple[int, ...]):
    """Evaluate one bph-row horizontal band (traced start row: one
    compiled program serves every band of every scale at this width)."""
    band = jax.lax.dynamic_slice(
        image, (start_row, 0), (bph, image.shape[1]))
    return _evaluate_scale(band, bank0, bank1, thresh0, thresh1, flip0,
                           leaves, stage_thresholds, norm_mask, wh, ww,
                           stride, stage_bounds)


def group_rectangles(boxes: np.ndarray, min_neighbors: int,
                     eps: float = 0.2) -> np.ndarray:
    """OpenCV-style groupRectangles: cluster similar boxes, average each
    cluster, drop clusters with <= min_neighbors members, prune averaged
    boxes contained in bigger ones (cascadedetect.cpp groupRectangles)."""
    n = len(boxes)
    if n == 0:
        return np.zeros((0, 4), np.float32)
    parent = np.arange(n)

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    # pairwise similarity vectorised (numpy broadcasting): the former
    # O(n^2) Python loop cost ~10 ms at a few hundred candidates and sat
    # directly on the detect() latency path. Same predicate, same union
    # order (upper triangle, row-major).
    b = np.asarray(boxes, np.float32)
    delta = eps * 0.5 * (np.minimum(b[:, 2:3], b[None, :, 2])
                         + np.minimum(b[:, 3:4], b[None, :, 3]))
    x2 = b[:, 0] + b[:, 2]
    y2 = b[:, 1] + b[:, 3]
    sim = ((np.abs(b[:, 0:1] - b[None, :, 0]) <= delta)
           & (np.abs(b[:, 1:2] - b[None, :, 1]) <= delta)
           & (np.abs(x2[:, None] - x2[None, :]) <= delta)
           & (np.abs(y2[:, None] - y2[None, :]) <= delta))
    for i, j in np.argwhere(np.triu(sim, 1)):
        pi, pj = find(i), find(j)
        if pi != pj:
            parent[pj] = pi
    roots = np.array([find(i) for i in range(n)])
    out, counts = [], []
    for r in np.unique(roots):
        members = b[roots == r]
        if len(members) <= min_neighbors:
            continue
        out.append(members.mean(axis=0))
        counts.append(len(members))
    if not out:
        return np.zeros((0, 4), np.float32)
    out = np.stack(out)
    # prune a grouped box contained inside a bigger one when the big
    # cluster clearly dominates OR the small one is weak (< 3 members) —
    # OpenCV's `n2 > max(3, n1) || n1 < 3` clause, tested against every
    # other cluster regardless of its own fate (groupRectangles,
    # cascadedetect.cpp)
    keep = np.ones(len(out), bool)
    for i in range(len(out)):
        for j in range(len(out)):
            if i == j:
                continue
            dx, dy = out[j, 2] * 0.2, out[j, 3] * 0.2
            if (out[i, 0] >= out[j, 0] - dx
                    and out[i, 1] >= out[j, 1] - dy
                    and out[i, 0] + out[i, 2] <= out[j, 0] + out[j, 2] + dx
                    and out[i, 1] + out[i, 3] <= out[j, 1] + out[j, 3] + dy
                    and (counts[j] > max(3, counts[i]) or counts[i] < 3)):
                keep[i] = False
                break
    return out[keep]


class HaarCascadeDetector:
    """detectMultiScale-equivalent built on the batched MXU evaluator.

    Drop-in for the reference apps' OpenCV face detection step — loads
    the same XML cascade files (e.g.
    /usr/share/opencv4/haarcascades/haarcascade_frontalface_alt2.xml).
    """

    def __init__(self, cascade, scale_factor: float = 1.2,
                 min_neighbors: int = 2,
                 min_size: Tuple[int, int] = (50, 50),
                 max_size: Optional[Tuple[int, int]] = None):
        if isinstance(cascade, str):
            cascade = parse_opencv_cascade(cascade)
        self.data: HaarCascadeData = cascade
        self.scale_factor = float(scale_factor)
        self.min_neighbors = int(min_neighbors)
        self.min_size = tuple(min_size)
        self.max_size = tuple(max_size) if max_size else None
        d = self.data
        mask = np.zeros((d.window_height, d.window_width), np.float32)
        mask[1:-1, 1:-1] = 1.0
        self._norm_mask = jnp.asarray(mask.reshape(-1))
        self._bank0 = jnp.asarray(d.bank0)
        self._bank1 = jnp.asarray(d.bank1)
        self._thresh0 = jnp.asarray(d.thresh0)
        self._thresh1 = jnp.asarray(d.thresh1)
        self._flip0 = jnp.asarray(d.flip0)
        self._leaves = jnp.asarray(d.leaves)
        self._stage_thresholds = jnp.asarray(d.stage_thresholds)
        self._stage_bounds = tuple(int(v) for v in d.stage_bounds)

    # windows evaluated per program call: bounds the (N, T) feature
    # intermediates to a few hundred MB regardless of image size
    MAX_WINDOWS_PER_CALL = 1 << 16

    # candidate slots in the device-side compaction buffer (4 KB
    # readback); a frame with more raw hits falls back to the full-mask
    # readback path
    MAX_CANDIDATES = 1 << 10

    def _mask_pieces(self, scaled, sh: int, sw: int, stride: int):
        """Pass mask for one pyramid scale as a list of DEVICE arrays
        (row bands of the full-width mask) — no host readback here, so
        the whole pyramid can be enqueued before a single transfer.
        Banding bounds the (N, T) feature intermediates when the window
        count would blow up device memory (e.g. 4K frames at the first
        stride-1 scale)."""
        d = self.data
        wh, ww = d.window_height, d.window_width
        bh, bw = scaled.shape
        args = (self._bank0, self._bank1, self._thresh0, self._thresh1,
                self._flip0, self._leaves, self._stage_thresholds,
                self._norm_mask)
        oh_full = (bh - wh) // stride + 1
        ow_full = (bw - ww) // stride + 1
        if oh_full * ow_full <= self.MAX_WINDOWS_PER_CALL:
            return [_evaluate_scale(
                scaled, *args, wh, ww, stride, self._stage_bounds)]
        boh = max(1, self.MAX_WINDOWS_PER_CALL // ow_full)
        bph = boh * stride + wh - stride          # pixel rows per band
        oh = (sh - wh) // stride + 1
        n_bands = -(-oh // boh)
        need = (n_bands - 1) * boh * stride + bph
        if need > bh:
            scaled = _pad_rows(scaled, need - bh)
        return [_evaluate_band(
            scaled, b * boh * stride, *args, bph, wh, ww, stride,
            self._stage_bounds) for b in range(n_bands)]

    def detect(self, image) -> np.ndarray:
        """Detect objects in a grayscale image.

        Returns (K, 4) float32 [x, y, w, h] boxes in image coordinates
        (grouped, like OpenCV's detectMultiScale).
        """
        if isinstance(image, jax.Array):
            # device-resident frame (e.g. the tracking loop's uploaded
            # frame): skip the synchronous host->device re-upload, which
            # costs a full RTT per call on tunneled backends (any dtype;
            # _resize_pad casts to f32 inside its jitted program)
            img_dev = image
            if img_dev.ndim != 2:
                raise ValueError("expected a (H, W) grayscale image")
            h, w = img_dev.shape
        else:
            img = np.asarray(image, np.float32)
            if img.ndim != 2:
                raise ValueError("expected a (H, W) grayscale image")
            h, w = img.shape
            img_dev = None
        d = self.data
        # one upload per image; every per-scale step below is a jitted
        # call (eager ops dispatch synchronously on remote backends).
        # Phase 1 enqueues the WHOLE pyramid without reading anything
        # back; phase 2 compacts the passing windows ON DEVICE to a
        # fixed-K index buffer and reads back those few KB in a single
        # transfer (_compact_candidates) — per-scale readbacks used to
        # cost one tunnel RTT (~30 ms) per scale, and even the single
        # flattened mask-band readback + host np.nonzero cost ~50 ms of
        # the former ~80 ms frame.
        if img_dev is None:
            img_dev = jnp.asarray(img)
        pieces = []                    # device mask bands, all scales
        scale_infos = []               # (first_piece, n_pieces, oh, ow,
        #                                 stride, factor)
        factor = 1.0
        while True:
            win_w = d.window_width * factor
            win_h = d.window_height * factor
            if win_w > w or win_h > h:
                break
            if self.max_size and (win_w > self.max_size[0]
                                  or win_h > self.max_size[1]):
                break
            sw = int(round(w / factor))
            sh = int(round(h / factor))
            if (win_w >= self.min_size[0] and win_h >= self.min_size[1]
                    and sw >= d.window_width and sh >= d.window_height):
                # bucket the evaluated shape to multiples of 64 so the
                # jitted program is reused across scales/images (one
                # compile per bucket, not per exact size); the mask is
                # cropped back to positions valid for the true size, so
                # the zero padding cannot add detections
                bh = -(-sh // 64) * 64
                bw = -(-sw // 64) * 64
                scaled = _resize_pad(img_dev, sh, sw, bh, bw)
                stride = 1 if factor > 2.0 else 2
                ps = self._mask_pieces(scaled, sh, sw, stride)
                oh = (sh - d.window_height) // stride + 1
                ow = (sw - d.window_width) // stride + 1
                scale_infos.append((len(pieces), len(ps), oh, ow,
                                    stride, factor))
                pieces.extend(ps)
            factor *= self.scale_factor

        boxes = np.zeros((0, 4), np.float32)
        if pieces:
            # per-piece decode metadata (band row offset in output-row
            # units, valid rows/cols, scale stride/factor)
            p_valid = np.zeros((len(pieces), 2), np.int32)
            p_band = np.zeros(len(pieces), np.int64)
            p_stride = np.zeros(len(pieces), np.int64)
            p_factor = np.zeros(len(pieces), np.float64)
            for first, n_ps, oh, ow, stride, factor in scale_infos:
                for b in range(n_ps):
                    i = first + b
                    boh = pieces[i].shape[0]
                    p_valid[i] = (min(boh, oh - b * boh), ow)
                    p_band[i] = b * boh
                    p_stride[i] = stride
                    p_factor[i] = factor
            # ONE few-KB readback: compacted flat candidate indices
            packed = np.asarray(_compact_candidates(
                jnp.asarray(p_valid), self.MAX_CANDIDATES, *pieces))
            count = int(packed[-1])
            offsets = np.cumsum([0] + [int(np.prod(p.shape))
                                       for p in pieces])
            if count <= self.MAX_CANDIDATES:
                sel = packed[:count].astype(np.int64)
            else:
                # overflow: fall back to the full-mask readback (valid-
                # region masking + flat indices, identical decode below)
                flat = np.asarray(_flatten_masks(*pieces))
                keep = np.zeros(offsets[-1], bool)
                for i, p in enumerate(pieces):
                    m = np.zeros(p.shape, bool)
                    m[:p_valid[i, 0], :p_valid[i, 1]] = True
                    keep[offsets[i]:offsets[i + 1]] = m.reshape(-1)
                sel = np.nonzero(flat & keep)[0]
            if len(sel):
                pid = np.searchsorted(offsets, sel, side="right") - 1
                local = sel - offsets[pid]
                pw = np.array([p.shape[1] for p in pieces])[pid]
                ys = p_band[pid] + local // pw
                xs = local % pw
                sf = p_stride[pid] * p_factor[pid]
                boxes = np.stack([
                    np.round(xs * sf), np.round(ys * sf),
                    np.round(d.window_width * p_factor[pid]),
                    np.round(d.window_height * p_factor[pid])],
                    axis=1).astype(np.float32)
        if self.min_neighbors > 0:
            return group_rectangles(boxes, self.min_neighbors)
        return boxes
