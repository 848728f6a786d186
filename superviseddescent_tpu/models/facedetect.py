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
    image shape. All evaluation is batched over a leading frames axis:
    ``detect_batch`` runs B same-shape frames through one pyramid
    enqueue and ONE device->host readback for every frame's candidates.

Numerics — exact integer evaluation on the MXU: the pyramid is rounded
to integer pixel values after each bilinear resize (OpenCV's pyramid IS
uint8, so this matches the reference pipeline's quantisation, modulo
cv2's fixed-point interpolation weights). With integer pixels in
[0, 255] and the stock cascades' small-integer rect weights (alt2:
{-1, 0, 1, 2}; checked at load), every product is exactly representable
in bf16 x bf16 and every partial sum is an integer far below 2^24, so
the MXU's default bf16-multiply / f32-accumulate path computes the bank
matmuls EXACTLY — no Precision.HIGHEST 6-pass penalty (6x matmul cost)
is needed. The variance norm factor is computed with exact elementwise
f32 ops on centred pixels (products <= 128^2, sums < 2^24: exact).
Cascades whose weights fail the integer/bf16/magnitude check fall back
to Precision.HIGHEST automatically (see ``_banks_exact_in_bf16``).
cv2 5.x removed CascadeClassifier, so there is no OpenCV run to diff
against in this environment; validation is against the reference's own
check_face ground-truth criterion on the bundled LFPW images plus an
exactly-predictable synthetic cascade (tests/test_facedetect.py), with
the evaluator semantics documented line-by-line against
cascadedetect.cpp in io/haar.py.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from superviseddescent_tpu.io.haar import HaarCascadeData, parse_opencv_cascade


def _banks_exact_in_bf16(d: HaarCascadeData) -> bool:
    """True when the bank matmuls are EXACT under the MXU's default
    bf16-multiply / f32-accumulate path for integer pixels in [0, 255]:
    integer weights, bf16-representable, and a worst-case absolute
    column sum x 255 below 2^24 (so every partial sum is an integer f32
    can hold exactly)."""
    import ml_dtypes
    for b in (d.bank0, d.bank1):
        if not np.all(b == np.round(b)):
            return False
        if not np.all(b.astype(ml_dtypes.bfloat16).astype(np.float32) == b):
            return False
        if np.abs(b).sum(axis=0).max() * 255.0 >= 2.0 ** 24:
            return False
    return True


@functools.partial(jax.jit, static_argnames=("wh", "ww", "stride",
                                             "stage_bounds", "precision"))
def _evaluate_scale(images, bank0, bank1, thresh0, thresh1, flip0, leaves,
                    stage_thresholds, norm_mask, wh: int, ww: int,
                    stride: int, stage_bounds: Tuple[int, ...],
                    precision=jax.lax.Precision.DEFAULT):
    """Dense cascade evaluation over every stride-aligned window.

    images: (B, H, W) f32 grayscale (integer-valued pixels for the exact
    bf16 path). Returns (B, oh, ow) bool pass mask.
    """
    b_frames = images.shape[0]
    patches = jax.lax.conv_general_dilated_patches(
        images[:, None], filter_shape=(wh, ww),
        window_strides=(stride, stride),
        padding="VALID")                                    # (B, wh*ww, oh, ow)
    _, d, oh, ow = patches.shape
    p = jnp.moveaxis(patches, 1, -1).reshape(-1, d)         # (B*oh*ow, wh*ww)

    # inner-rect variance norm factor (OpenCV normrect = (1,1,w-2,h-2)):
    # nf = sqrt(area*sumsq - sum^2), or 1 if non-positive. Pixels are
    # centred at 128: for integer pixels the centred values are exact
    # 8-bit ints, their squares exact (<= 16384) and both reductions sum
    # integers below 2^24 — exact in f32 on the VPU, no MXU pass needed.
    # (Centring also keeps the final var subtraction benign on
    # low-variance windows — ADVICE r1.)
    area = jnp.sum(norm_mask)
    pc = p - 128.0
    pcm = pc * norm_mask[None, :]
    s = jnp.sum(pcm, axis=-1)                               # (N,)
    sq = jnp.sum(pcm * pc, axis=-1)
    var = area * sq - s * s
    nf = jnp.where(var > 0.0, jnp.sqrt(jnp.maximum(var, 0.0)), 1.0)

    # the hot matmuls: with integer pixels and integer bf16-exact banks
    # the DEFAULT (single-pass bf16) MXU path is exact; HIGHEST is only
    # used for cascades that fail _banks_exact_in_bf16
    raw0 = jax.lax.dot_general(
        p, bank0, (((1,), (0,)), ((), ())), precision=precision)  # (N, T)
    raw1 = jax.lax.dot_general(
        p, bank1, (((1,), (0,)), ((), ())), precision=precision)
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
    return passed.reshape(b_frames, oh, ow)


@functools.partial(jax.jit, static_argnames=("rows",))
def _pad_rows(x, rows: int):
    """Zero-pad image rows as a jitted program (an eager jnp.pad in the
    banded serving path would dispatch synchronously per scale)."""
    return jnp.pad(x, ((0, 0), (0, rows), (0, 0)))


@jax.jit
def _flatten_masks(*pieces):
    """Ravel + concatenate every pyramid scale's mask bands into ONE
    (B, total) buffer so the host needs a single readback for the whole
    pyramid. Recompiles per distinct shape tuple — shapes are
    64-bucketed, so one compile per image-size class. (Fallback path:
    the serving path is _compact_candidates, whose readback is K indices
    per frame, not mask bands.)"""
    b = pieces[0].shape[0]
    return jnp.concatenate([p.reshape(b, -1) for p in pieces], axis=1)


@functools.partial(jax.jit, static_argnames=("k",))
def _compact_candidates(valids, k: int, *pieces):
    """Device-side candidate extraction: mask each pyramid piece to its
    valid (rows, cols) region (the bucketed evaluation pads beyond the
    true scaled size — padding windows must never become detections),
    flatten everything, and compact each frame's passing flat indices to
    a fixed k-slot buffer. Returns one (B, k+1) int32 array
    [idx_0..idx_{k-1}, total_count] per frame so the host needs a SINGLE
    few-KB readback for the whole batch's pyramids — the mask-band
    readback plus host np.nonzero used to dominate detect() latency
    (~50 of ~80 ms at 600x512, docs/PERF_NOTES.md). Slots past the count
    hold -1; if a frame's count > k the host falls back to the full-mask
    readback for that frame (correctness over speed).

    valids: (n_pieces, 2) int32 [valid_rows, valid_cols] per piece.
    """
    flats = []
    for i, p in enumerate(pieces):
        ih = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
        iw = jax.lax.broadcasted_iota(jnp.int32, p.shape, 2)
        m = jnp.logical_and(p, jnp.logical_and(ih < valids[i, 0],
                                               iw < valids[i, 1]))
        flats.append(m.reshape(p.shape[0], -1))
    flat = jnp.concatenate(flats, axis=1)                   # (B, total)
    count = jnp.sum(flat.astype(jnp.int32), axis=1)         # (B,)
    idx = jax.vmap(
        lambda f: jnp.nonzero(f, size=k, fill_value=-1)[0])(flat)
    return jnp.concatenate([idx.astype(jnp.int32), count[:, None]], axis=1)


@functools.partial(jax.jit, static_argnames=("sh", "sw", "bh", "bw"))
def _resize_pad(imgs, sh: int, sw: int, bh: int, bw: int):
    """Pyramid step: f32 cast + resize (cv2-style bilinear, no
    antialias) + round to integer pixels + zero-pad to the compile
    bucket, in one jitted program (the cast here keeps uint8 device
    frames 100% on the jitted path — an eager astype would dispatch
    synchronously). Rounding reproduces OpenCV's uint8 pyramid
    semantics and is what makes the bank matmuls exact under the
    single-pass bf16 MXU path (module docstring)."""
    b = imgs.shape[0]
    scaled = jax.image.resize(imgs.astype(jnp.float32), (b, sh, sw),
                              method="linear", antialias=False)
    scaled = jnp.clip(jnp.round(scaled), 0.0, 255.0)
    if (bh, bw) != (sh, sw):
        scaled = jnp.pad(scaled, ((0, 0), (0, bh - sh), (0, bw - sw)))
    return scaled


@functools.partial(jax.jit, static_argnames=("bph", "wh", "ww", "stride",
                                             "stage_bounds", "precision"))
def _evaluate_band(images, start_row, bank0, bank1, thresh0, thresh1, flip0,
                   leaves, stage_thresholds, norm_mask, bph: int, wh: int,
                   ww: int, stride: int, stage_bounds: Tuple[int, ...],
                   precision=jax.lax.Precision.DEFAULT):
    """Evaluate one bph-row horizontal band (traced start row: one
    compiled program serves every band of every scale at this width)."""
    band = jax.lax.dynamic_slice(
        images, (0, start_row, 0),
        (images.shape[0], bph, images.shape[2]))
    return _evaluate_scale(band, bank0, bank1, thresh0, thresh1, flip0,
                           leaves, stage_thresholds, norm_mask, wh, ww,
                           stride, stage_bounds, precision)


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
        # exact single-pass bf16 MXU path for integer-weight cascades
        # (all stock OpenCV frontal-face files); 6-pass HIGHEST otherwise
        self._precision = (jax.lax.Precision.DEFAULT
                           if _banks_exact_in_bf16(d)
                           else jax.lax.Precision.HIGHEST)

    # windows evaluated per program call (including the frames axis):
    # bounds the (N, T) feature intermediates to a few hundred MB
    # regardless of image size or batch
    MAX_WINDOWS_PER_CALL = 1 << 16

    # candidate slots per frame in the device-side compaction buffer
    # (4 KB readback); a frame with more raw hits falls back to the
    # full-mask readback path
    MAX_CANDIDATES = 1 << 10

    def _mask_pieces(self, scaled, sh: int, sw: int, stride: int):
        """Pass mask for one pyramid scale as a list of DEVICE arrays
        (row bands of the full-width (B, oh, ow) mask) — no host
        readback here, so the whole pyramid can be enqueued before a
        single transfer. Banding bounds the (N, T) feature
        intermediates when the window count would blow up device memory
        (e.g. 4K frames at the first stride-1 scale)."""
        d = self.data
        wh, ww = d.window_height, d.window_width
        n_frames, bh, bw = scaled.shape
        args = (self._bank0, self._bank1, self._thresh0, self._thresh1,
                self._flip0, self._leaves, self._stage_thresholds,
                self._norm_mask)
        oh_full = (bh - wh) // stride + 1
        ow_full = (bw - ww) // stride + 1
        if n_frames * oh_full * ow_full <= self.MAX_WINDOWS_PER_CALL:
            return [_evaluate_scale(
                scaled, *args, wh, ww, stride, self._stage_bounds,
                self._precision)]
        boh = max(1, self.MAX_WINDOWS_PER_CALL // (n_frames * ow_full))
        bph = boh * stride + wh - stride          # pixel rows per band
        oh = (sh - wh) // stride + 1
        n_bands = -(-oh // boh)
        need = (n_bands - 1) * boh * stride + bph
        if need > bh:
            scaled = _pad_rows(scaled, need - bh)
        return [_evaluate_band(
            scaled, b * boh * stride, *args, bph, wh, ww, stride,
            self._stage_bounds, self._precision) for b in range(n_bands)]

    def _enqueue_pyramid(self, imgs_dev, h: int, w: int):
        """Enqueue the whole scale pyramid for a (B, h, w) device frame
        stack. Returns (pieces, scale_infos): device mask bands and
        their decode metadata. No host readback happens here."""
        d = self.data
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
                scaled = _resize_pad(imgs_dev, sh, sw, bh, bw)
                stride = 1 if factor > 2.0 else 2
                ps = self._mask_pieces(scaled, sh, sw, stride)
                oh = (sh - d.window_height) // stride + 1
                ow = (sw - d.window_width) // stride + 1
                scale_infos.append((len(pieces), len(ps), oh, ow,
                                    stride, factor))
                pieces.extend(ps)
            factor *= self.scale_factor
        return pieces, scale_infos

    def _decode_boxes(self, pieces, scale_infos) -> List[np.ndarray]:
        """ONE readback of the compacted per-frame candidate indices,
        then pure-numpy decode to raw [x, y, w, h] boxes per frame."""
        d = self.data
        n_frames = pieces[0].shape[0]
        # per-piece decode metadata (band row offset in output-row
        # units, valid rows/cols, scale stride/factor)
        p_valid = np.zeros((len(pieces), 2), np.int32)
        p_band = np.zeros(len(pieces), np.int64)
        p_stride = np.zeros(len(pieces), np.int64)
        p_factor = np.zeros(len(pieces), np.float64)
        for first, n_ps, oh, ow, stride, factor in scale_infos:
            for b in range(n_ps):
                i = first + b
                boh = pieces[i].shape[1]
                p_valid[i] = (min(boh, oh - b * boh), ow)
                p_band[i] = b * boh
                p_stride[i] = stride
                p_factor[i] = factor
        # ONE few-KB readback: compacted flat candidate indices, all frames
        packed = np.asarray(_compact_candidates(
            jnp.asarray(p_valid), self.MAX_CANDIDATES, *pieces))
        offsets = np.cumsum(
            [0] + [int(np.prod(p.shape[1:])) for p in pieces])
        flat_full = None               # lazy full-mask overflow fallback
        keep_full = None
        out: List[np.ndarray] = []
        for fi in range(n_frames):
            count = int(packed[fi, -1])
            if count <= self.MAX_CANDIDATES:
                sel = packed[fi, :count].astype(np.int64)
            else:
                # overflow: fall back to the full-mask readback (valid-
                # region masking + flat indices, identical decode below)
                if flat_full is None:
                    flat_full = np.asarray(_flatten_masks(*pieces))
                    keep_full = np.zeros(offsets[-1], bool)
                    for i, p in enumerate(pieces):
                        m = np.zeros(p.shape[1:], bool)
                        m[:p_valid[i, 0], :p_valid[i, 1]] = True
                        keep_full[offsets[i]:offsets[i + 1]] = m.reshape(-1)
                sel = np.nonzero(flat_full[fi] & keep_full)[0]
            if not len(sel):
                out.append(np.zeros((0, 4), np.float32))
                continue
            pid = np.searchsorted(offsets, sel, side="right") - 1
            local = sel - offsets[pid]
            pw = np.array([p.shape[2] for p in pieces])[pid]
            ys = p_band[pid] + local // pw
            xs = local % pw
            sf = p_stride[pid] * p_factor[pid]
            out.append(np.stack([
                np.round(xs * sf), np.round(ys * sf),
                np.round(d.window_width * p_factor[pid]),
                np.round(d.window_height * p_factor[pid])],
                axis=1).astype(np.float32))
        return out

    def _detect_stack(self, imgs_dev, h: int, w: int) -> List[np.ndarray]:
        pieces, scale_infos = self._enqueue_pyramid(imgs_dev, h, w)
        n_frames = imgs_dev.shape[0]
        if not pieces:
            raws = [np.zeros((0, 4), np.float32)] * n_frames
        else:
            raws = self._decode_boxes(pieces, scale_infos)
        if self.min_neighbors > 0:
            return [group_rectangles(r, self.min_neighbors) for r in raws]
        return raws

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
            if image.ndim != 2:
                raise ValueError("expected a (H, W) grayscale image")
            h, w = image.shape
            imgs_dev = image[None]
        else:
            img = np.asarray(image, np.float32)
            if img.ndim != 2:
                raise ValueError("expected a (H, W) grayscale image")
            h, w = img.shape
            # one upload per image; every per-scale step below is a
            # jitted call (eager ops dispatch synchronously on remote
            # backends)
            imgs_dev = jnp.asarray(img[None])
        return self._detect_stack(imgs_dev, h, w)[0]

    def detect_batch(self, images) -> List[np.ndarray]:
        """Detect objects in a stack of same-shape grayscale frames.

        images: (B, H, W) array (numpy or device-resident jax.Array, any
        integer-valued dtype). The whole batch shares one pyramid
        enqueue and ONE device->host candidate readback, so per-frame
        cost amortises the tunnel RTT that dominates single-frame
        detect() on remote backends — this is the entry point for video
        segments, training-set re-detection, and tracking-loss recovery
        sweeps (reference: rcr-train.cpp:410 re-detects every training
        image one by one through cv::detectMultiScale).

        Returns a list of B (K_i, 4) float32 [x, y, w, h] grouped boxes.
        """
        if isinstance(images, jax.Array):
            if images.ndim != 3:
                raise ValueError("expected a (B, H, W) grayscale stack")
            imgs_dev = images
        else:
            arr = np.asarray(images, np.float32)
            if arr.ndim != 3:
                raise ValueError("expected a (B, H, W) grayscale stack")
            imgs_dev = jnp.asarray(arr)
        _, h, w = imgs_dev.shape
        return self._detect_stack(imgs_dev, int(h), int(w))
