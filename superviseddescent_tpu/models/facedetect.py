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
  * The WHOLE scale pyramid — every resize, every cascade evaluation,
    the valid-region crops, and the candidate compaction — is ONE
    compiled XLA program per (frame count, H, W) class
    (``_run_pyramid_packed``): one dispatch and one few-KB readback per
    detect call. Per-scale programs used to cost ~1.5 ms of launch gap
    each over remote tunnels (~18 ms of a 54 ms frame, measured in
    scripts/probe_haar.py). All evaluation carries a leading frames
    axis: ``detect_batch`` runs B same-shape frames through the same
    single program and single readback.

Numerics — exact integer evaluation on the MXU: the pyramid is rounded
to integer pixel values after each bilinear resize (OpenCV's pyramid IS
uint8, so this matches the reference pipeline's quantisation, modulo
cv2's fixed-point interpolation weights). With integer pixels in
[0, 255] and the stock cascades' small-integer rect weights (alt2:
{-1, 0, 1, 2}; checked at load), every product is exactly representable
in bf16 x bf16 and every partial sum is an integer far below 2^24, so
the MXU's default bf16-multiply / f32-accumulate path computes the bank
matmuls EXACTLY — no Precision.HIGHEST 6-pass penalty (measured 6.1x:
140 vs 22 TFLOP/s on the alt2 bank, scripts/probe_haar.py). The
variance norm factor is computed with exact elementwise f32 ops on
centred pixels (products <= 128^2, sums < 2^24: exact). Cascades whose
weights fail the integer/bf16/magnitude check fall back to
Precision.HIGHEST automatically (see ``_banks_exact_in_bf16``).
cv2 5.x removed CascadeClassifier, so there is no OpenCV run to diff
against in this environment; validation is against the reference's own
check_face ground-truth criterion on the bundled LFPW images plus an
exactly-predictable synthetic cascade (tests/test_facedetect.py), with
the evaluator semantics documented line-by-line against
cascadedetect.cpp in io/haar.py.
"""

from __future__ import annotations

import functools
from typing import Iterable, Iterator, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from superviseddescent_tpu.io.haar import HaarCascadeData, parse_opencv_cascade


class PendingDetect(NamedTuple):
    """In-flight detect: the dispatched pyramid's device-side candidate
    buffer plus everything `_decode_pending` needs to fence + decode it.
    Returned by ``detect_begin``; holds ``imgs_dev`` alive because the
    dense overflow fallback re-runs the pyramid on it."""
    packed: Optional[jax.Array]     # (B, k+2) device candidates, or None
    imgs_dev: Optional[jax.Array]   # the frame stack (kept for fallback)
    plan: tuple
    args: tuple
    statics: tuple
    n_frames: int


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


# stages evaluated densely on EVERY window before survivor compaction;
# the remaining stages run only on windows that pass these (OpenCV's
# early-out, re-shaped for SIMD: a static two-phase split instead of
# per-window branching)
N_PRE_STAGES = 3


def _tree_leaves(p, nf, bank0, bank1, thresh0, thresh1, flip0, leaves,
                 precision, lo: int, hi: int):
    """Leaf values of trees [lo, hi) for the window-patch rows ``p``.

    The hot matmuls: with integer pixels and integer bf16-exact banks the
    DEFAULT (single-pass bf16) MXU path is exact; HIGHEST is only used
    for cascades that fail _banks_exact_in_bf16. Per-row results are
    independent of which other rows are present (same contraction dim,
    same accumulation order — and exact integers besides), so evaluating
    a compacted subset of windows is BIT-IDENTICAL to the dense run.
    """
    raw0 = jax.lax.dot_general(
        p, bank0[:, lo:hi], (((1,), (0,)), ((), ())),
        precision=precision)                                # (N, hi-lo)
    raw1 = jax.lax.dot_general(
        p, bank1[:, lo:hi], (((1,), (0,)), ((), ())),
        precision=precision)
    nfc = nf[:, None]
    # flip0: trees whose TRUE branch descends to node 1 (swapped children
    # in the XML) — XOR the node-0 comparison so "True" always means leaf 0
    cond0 = jnp.logical_xor(raw0 < thresh0[None, lo:hi] * nfc,
                            flip0[None, lo:hi])
    return jnp.where(cond0,
                     leaves[None, lo:hi, 0],
                     jnp.where(raw1 < thresh1[None, lo:hi] * nfc,
                               leaves[None, lo:hi, 1],
                               leaves[None, lo:hi, 2]))


def _stage_pass(leaf, stage_thresholds, stage_bounds, s_lo: int, s_hi: int,
                tree_off: int):
    """AND of stage decisions s_lo..s_hi-1 over leaf values whose column
    0 is tree index ``tree_off``."""
    passed = jnp.ones((leaf.shape[0],), bool)
    for si in range(s_lo, s_hi):
        a = stage_bounds[si] - tree_off
        b = stage_bounds[si + 1] - tree_off
        stage_sum = jnp.sum(leaf[:, a:b], axis=1)
        passed = jnp.logical_and(passed, stage_sum >= stage_thresholds[si])
    return passed


def _patch_rows(images, wh: int, ww: int, stride: int):
    """Extract every stride-aligned window of a (B, H, W) image stack as
    rows of a (B*oh*ow, wh*ww) matrix (b-major, then y, then x)."""
    patches = jax.lax.conv_general_dilated_patches(
        images[:, None], filter_shape=(wh, ww),
        window_strides=(stride, stride),
        padding="VALID")                                    # (B, wh*ww, oh, ow)
    _, d, oh, ow = patches.shape
    return jnp.moveaxis(patches, 1, -1), oh, ow


def _eval_patch_rows(p, bank0, bank1, thresh0, thresh1, flip0, leaves,
                     stage_thresholds, norm_mask,
                     stage_bounds: Tuple[int, ...], precision,
                     survivor_div: int):
    """Cascade evaluation of window-patch rows (traced inside the
    pyramid program), in two phases: the first N_PRE_STAGES stages run
    densely on all rows (a few % of the trees), then the surviving rows
    are compacted to a fixed N//survivor_div buffer (survivor_div=0
    disables the prefilter: dense evaluation) and only they see the
    remaining ~97% of the bank — OpenCV's early-out rebuilt as a static
    gather instead of branching. Cuts both the dominant (N, T) matmul
    FLOPs and HBM traffic ~4-20x; results are bit-identical to the dense
    evaluation (_tree_leaves docstring).

    p: (N, wh*ww) f32 patch rows (integer-valued pixels for the exact
    bf16 path). Returns ((N,) bool pass mask, pre_overflow bool scalar —
    True when the survivor buffer was too small, in which case the mask
    is only correct where passed_pre is False and the caller must fall
    back to a dense program).
    """
    n = p.shape[0]

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

    args = (bank0, bank1, thresh0, thresh1, flip0, leaves, precision)
    n_stages = len(stage_bounds) - 1
    n_pre = min(N_PRE_STAGES, n_stages)
    t_pre = stage_bounds[n_pre]
    t_total = stage_bounds[-1]

    leaf_pre = _tree_leaves(p, nf, *args, 0, t_pre)
    passed_pre = _stage_pass(leaf_pre, stage_thresholds, stage_bounds,
                             0, n_pre, 0)
    if n_pre == n_stages:
        return passed_pre, jnp.zeros((), bool)

    k = max(128, n // survivor_div) if survivor_div > 0 else n
    n_surv = jnp.sum(passed_pre.astype(jnp.int32))
    if survivor_div <= 0 or k >= n:
        # dense fallback program / tiny scale where the compacted
        # buffer would not shrink anything
        leaf_rest = _tree_leaves(p, nf, *args, t_pre, t_total)
        passed_rest = _stage_pass(leaf_rest, stage_thresholds,
                                  stage_bounds, n_pre, n_stages, t_pre)
        return (jnp.logical_and(passed_pre, passed_rest),
                jnp.zeros((), bool))

    (idx,) = jnp.nonzero(passed_pre, size=k, fill_value=0)
    p_sel = jnp.take(p, idx, axis=0)                        # (k, wh*ww)
    nf_sel = jnp.take(nf, idx)
    leaf_rest = _tree_leaves(p_sel, nf_sel, *args, t_pre, t_total)
    passed_sel = _stage_pass(leaf_rest, stage_thresholds, stage_bounds,
                             n_pre, n_stages, t_pre)
    # scatter back; filler slots (slot >= n_surv) all point at row 0 —
    # mask them so a non-surviving row 0 cannot be resurrected
    valid = jnp.arange(k) < n_surv
    passed_rest = jnp.zeros((n,), bool).at[idx].max(
        jnp.logical_and(passed_sel, valid))
    passed = jnp.logical_and(passed_pre, passed_rest)
    return passed, n_surv > k


def _eval_windows(images, bank0, bank1, thresh0, thresh1, flip0, leaves,
                  stage_thresholds, norm_mask, wh: int, ww: int,
                  stride: int, stage_bounds: Tuple[int, ...], precision,
                  survivor_div: int = 4):
    """_patch_rows + _eval_patch_rows for one (B, H, W) scale: returns
    ((B, oh, ow) bool pass mask, pre_overflow scalar)."""
    b_frames = images.shape[0]
    pr, oh, ow = _patch_rows(images, wh, ww, stride)
    p = pr.reshape(-1, pr.shape[-1])
    passed, ovf = _eval_patch_rows(
        p, bank0, bank1, thresh0, thresh1, flip0, leaves,
        stage_thresholds, norm_mask, stage_bounds, precision,
        survivor_div)
    return passed.reshape(b_frames, oh, ow), ovf


# per-scale plan entry: (sh, sw, bh, bw, stride, oh, ow, n_bands, boh,
# bph, pad_rows, factor) — all static, so the whole pyramid traces into
# one program and the valid-region crops are static slices
ScalePlan = Tuple[int, int, int, int, int, int, int, int, int, int, int,
                  float]


def _trace_pyramid(imgs, bank0, bank1, thresh0, thresh1, flip0, leaves,
                   stage_thresholds, norm_mask, plan: Tuple[ScalePlan, ...],
                   wh: int, ww: int, stage_bounds: Tuple[int, ...],
                   precision, survivor_div: int, concat_eval: bool):
    """Trace every pyramid scale: resize + integer-quantise + evaluate
    (+ row-band chunking for memory-bounded scales), cropping each mask
    to its valid region. Returns (flats, overflow): a list of (B, n_i)
    flat bool masks in plan order — the decode metadata in
    ``_plan_decode_meta`` mirrors this layout exactly — and the OR of
    every piece's survivor-buffer overflow flag.

    concat_eval=True (small total window counts — the batch-1 serving
    case) concatenates EVERY scale's valid patch rows and runs ONE
    evaluation chain (one variance pass, one pre-stage matmul, one
    survivor compaction, one rest-stage matmul) instead of one chain per
    scale: at batch 1 each scale's tensors are tiny and the program is
    per-op-floor-bound (measured 20.8 ms net for 12 chains vs 6.7
    ms/frame amortised at B=32, scripts/probe_haar.py), so collapsing
    ~12x the op count is the latency lever. Identical results: the row
    evaluation is row-independent (_tree_leaves docstring) and the
    caller only sets it when no scale needs row-band chunking."""
    args = (bank0, bank1, thresh0, thresh1, flip0, leaves,
            stage_thresholds, norm_mask)
    if imgs.ndim == 2:
        imgs = imgs[None]      # free inside the traced program — saves
        #                        the separate _expand0 dispatch at batch 1
    b = imgs.shape[0]
    if concat_eval:
        plist, sizes = [], []
        for (sh, sw, bh, bw, stride, oh, ow, n_bands, boh, bph, pad_rows,
             _factor) in plan:
            scaled = jax.image.resize(imgs.astype(jnp.float32),
                                      (b, sh, sw), method="linear",
                                      antialias=False)
            scaled = jnp.clip(jnp.round(scaled), 0.0, 255.0)
            if (bh + pad_rows, bw) != (sh, sw):
                scaled = jnp.pad(scaled, ((0, 0), (0, bh + pad_rows - sh),
                                          (0, bw - sw)))
            pr, _ohf, _owf = _patch_rows(scaled, wh, ww, stride)
            plist.append(pr[:, :oh, :ow, :].reshape(-1, pr.shape[-1]))
            sizes.append((oh, ow))
        p_all = jnp.concatenate(plist, axis=0)
        passed, overflow = _eval_patch_rows(
            p_all, *args, stage_bounds, precision, survivor_div)
        flats, off = [], 0
        for oh, ow in sizes:
            nsc = b * oh * ow
            flats.append(passed[off:off + nsc].reshape(b, -1))
            off += nsc
        return flats, overflow
    flats = []
    overflow = jnp.zeros((), bool)
    for (sh, sw, bh, bw, stride, oh, ow, n_bands, boh, bph, pad_rows,
         _factor) in plan:
        # cv2-style bilinear (no antialias) + round to integer pixels
        # (OpenCV's uint8 pyramid; enables the exact bf16 MXU path) +
        # zero-pad to the 64-bucketed compile shape. Padding windows are
        # cropped away below, so they can never become detections.
        scaled = jax.image.resize(imgs.astype(jnp.float32), (b, sh, sw),
                                  method="linear", antialias=False)
        scaled = jnp.clip(jnp.round(scaled), 0.0, 255.0)
        if (bh + pad_rows, bw) != (sh, sw):
            scaled = jnp.pad(scaled, ((0, 0), (0, bh + pad_rows - sh),
                                      (0, bw - sw)))
        if n_bands == 1:
            mask, ovf = _eval_windows(scaled, *args, wh, ww, stride,
                                      stage_bounds, precision,
                                      survivor_div)
            overflow = jnp.logical_or(overflow, ovf)
            flats.append(mask[:, :oh, :ow].reshape(b, -1))
        else:
            # row bands bound the (N, T) intermediates (e.g. 4K frames
            # at the first stride-1 scale)
            for bi in range(n_bands):
                r0 = bi * boh * stride
                band = jax.lax.slice(scaled, (0, r0, 0),
                                     (b, r0 + bph, scaled.shape[2]))
                mask, ovf = _eval_windows(band, *args, wh, ww, stride,
                                          stage_bounds, precision,
                                          survivor_div)
                overflow = jnp.logical_or(overflow, ovf)
                vr = min(boh, oh - bi * boh)
                flats.append(mask[:, :vr, :ow].reshape(b, -1))
    return flats, overflow


@functools.partial(jax.jit, static_argnames=("plan", "wh", "ww",
                                             "stage_bounds", "precision",
                                             "concat_eval", "survivor_div",
                                             "k"))
def _run_pyramid_packed(imgs, bank0, bank1, thresh0, thresh1, flip0, leaves,
                        stage_thresholds, norm_mask,
                        plan: Tuple[ScalePlan, ...], wh: int, ww: int,
                        stage_bounds: Tuple[int, ...], precision,
                        concat_eval: bool, survivor_div: int, k: int):
    """THE detect program: whole pyramid (with the two-phase survivor
    prefilter) + device-side candidate compaction in one compiled XLA
    program. Returns one (B, k+2) int32 array
    [idx_0..idx_{k-1}, total_count, pre_overflow] per frame — a single
    few-KB readback serves the entire batch. Slots past the count hold
    -1; a frame whose count > k, or any run whose survivor buffer
    overflowed (pre_overflow != 0, broadcast to every frame), falls back
    to the dense ``_run_pyramid_masks`` (correctness over speed)."""
    flats, overflow = _trace_pyramid(
        imgs, bank0, bank1, thresh0, thresh1, flip0, leaves,
        stage_thresholds, norm_mask, plan, wh, ww, stage_bounds,
        precision, survivor_div, concat_eval)
    flat = jnp.concatenate(flats, axis=1)                   # (B, total)
    count = jnp.sum(flat.astype(jnp.int32), axis=1)         # (B,)
    idx = jax.vmap(
        lambda f: jnp.nonzero(f, size=k, fill_value=-1)[0])(flat)
    ovf = jnp.broadcast_to(overflow.astype(jnp.int32)[None],
                           (flat.shape[0],))
    return jnp.concatenate([idx.astype(jnp.int32), count[:, None],
                            ovf[:, None]], axis=1)


@functools.partial(jax.jit, static_argnames=("plan", "wh", "ww",
                                             "stage_bounds", "precision",
                                             "concat_eval"))
def _run_pyramid_masks(imgs, bank0, bank1, thresh0, thresh1, flip0, leaves,
                       stage_thresholds, norm_mask,
                       plan: Tuple[ScalePlan, ...], wh: int, ww: int,
                       stage_bounds: Tuple[int, ...], precision,
                       concat_eval: bool):
    # dense: survivor_div=0 disables the prefilter
    """Overflow fallback: the full (B, total) flat mask readback — a
    DENSE evaluation (no survivor prefilter), compiled only if a frame
    ever exceeds the candidate buffer or a survivor buffer overflows."""
    flats, _ = _trace_pyramid(imgs, bank0, bank1, thresh0, thresh1, flip0,
                              leaves, stage_thresholds, norm_mask, plan,
                              wh, ww, stage_bounds, precision,
                              survivor_div=0, concat_eval=concat_eval)
    return jnp.concatenate(flats, axis=1)


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

    # windows evaluated per traced cascade call (including the frames
    # axis): bounds the (N, T) feature intermediates to a few hundred MB
    # regardless of image size or batch
    MAX_WINDOWS_PER_CALL = 1 << 16

    # candidate slots per frame in the device-side compaction buffer
    # (4 KB readback); a frame with more raw hits falls back to the
    # full-mask readback path
    MAX_CANDIDATES = 1 << 10

    # survivor buffer divisor of the two-phase prefilter: windows
    # passing the first N_PRE_STAGES stages are compacted into
    # N // SURVIVOR_DIV slots before the remaining stages run; overflow
    # falls back to the dense-mask program (0 disables the prefilter)
    SURVIVOR_DIV = 4

    # below this total window count the pyramid evaluates as ONE
    # concatenated chain across all scales (latency mode; ~256k windows
    # x 400 px = ~410 MB of patch rows)
    CONCAT_MAX = 1 << 18

    def _pyramid_plan(self, n_frames: int, h: int,
                      w: int) -> Tuple[ScalePlan, ...]:
        """Static per-(B, H, W) pyramid plan: scaled sizes bucketed to
        multiples of 64 (one compiled program per image-size class, not
        per exact size), stride choice, and row-band chunking when
        B*windows would blow past MAX_WINDOWS_PER_CALL."""
        d = self.data
        wh, ww = d.window_height, d.window_width
        plan = []
        factor = 1.0
        while True:
            win_w = ww * factor
            win_h = wh * factor
            if win_w > w or win_h > h:
                break
            if self.max_size and (win_w > self.max_size[0]
                                  or win_h > self.max_size[1]):
                break
            sw = int(round(w / factor))
            sh = int(round(h / factor))
            if (win_w >= self.min_size[0] and win_h >= self.min_size[1]
                    and sw >= ww and sh >= wh):
                bh = -(-sh // 64) * 64
                bw = -(-sw // 64) * 64
                stride = 1 if factor > 2.0 else 2
                oh = (sh - wh) // stride + 1
                ow = (sw - ww) // stride + 1
                oh_full = (bh - wh) // stride + 1
                ow_full = (bw - ww) // stride + 1
                if n_frames * oh_full * ow_full <= self.MAX_WINDOWS_PER_CALL:
                    n_bands, boh, bph, pad_rows = 1, oh, bh, 0
                else:
                    boh = max(1, self.MAX_WINDOWS_PER_CALL
                              // (n_frames * ow_full))
                    bph = boh * stride + wh - stride  # pixel rows per band
                    n_bands = -(-oh // boh)
                    need = (n_bands - 1) * boh * stride + bph
                    pad_rows = max(0, need - bh)
                plan.append((sh, sw, bh, bw, stride, oh, ow, n_bands,
                             boh, bph, pad_rows, factor))
            factor *= self.scale_factor
        return tuple(plan)

    @staticmethod
    def _plan_decode_meta(plan: Tuple[ScalePlan, ...]):
        """Per-piece decode metadata matching _trace_pyramid's flat
        layout: (offsets, band_row, out_width, stride, factor) arrays."""
        band, pw, stride_a, factor_a, sizes = [], [], [], [], []
        for (sh, sw, bh, bw, stride, oh, ow, n_bands, boh, bph, pad_rows,
             factor) in plan:
            for bi in range(n_bands):
                vr = min(boh, oh - bi * boh) if n_bands > 1 else oh
                band.append(bi * boh)
                pw.append(ow)
                stride_a.append(stride)
                factor_a.append(factor)
                sizes.append(vr * ow)
        offsets = np.cumsum([0] + sizes)
        return (offsets, np.asarray(band, np.int64),
                np.asarray(pw, np.int64), np.asarray(stride_a, np.int64),
                np.asarray(factor_a, np.float64))

    def _dispatch_stack(self, imgs_dev, h: int, w: int) -> "PendingDetect":
        """Enqueue the whole pyramid program for a frame stack and return
        a handle WITHOUT reading the result back (the async half of
        detect; `_decode_pending` is the fence + decode half)."""
        d = self.data
        n_frames = 1 if imgs_dev.ndim == 2 else int(imgs_dev.shape[0])
        plan = self._pyramid_plan(n_frames, h, w)
        if not plan:
            return PendingDetect(None, None, (), (), (), n_frames)
        args = (self._bank0, self._bank1, self._thresh0, self._thresh1,
                self._flip0, self._leaves, self._stage_thresholds,
                self._norm_mask)
        # one concatenated evaluation chain when the total window
        # count is small (the latency-sensitive batch-1 case; the plan
        # never bands below CONCAT_MAX <= MAX_WINDOWS_PER_CALL*B classes
        # that band, so all n_bands are 1 whenever this fires)
        total_windows = n_frames * sum(s[5] * s[6] for s in plan)
        concat_eval = (total_windows <= self.CONCAT_MAX
                       and all(s[7] == 1 for s in plan))
        statics = (plan, d.window_height, d.window_width,
                   self._stage_bounds, self._precision, concat_eval)
        # ONE program dispatch; the ONE few-KB readback happens in
        # _decode_pending so callers can overlap it with other work
        packed_dev = _run_pyramid_packed(
            imgs_dev, *args, *statics, self.SURVIVOR_DIV,
            self.MAX_CANDIDATES)
        return PendingDetect(packed_dev, imgs_dev, plan, args, statics,
                             n_frames)

    def _decode_pending(self, pend: "PendingDetect") -> List[np.ndarray]:
        """Fence the one candidate readback of a `_dispatch_stack` handle
        and decode boxes (incl. the dense overflow fallback + grouping)."""
        n_frames = pend.n_frames
        if pend.packed is None:
            return [np.zeros((0, 4), np.float32)] * n_frames
        plan, args, statics = pend.plan, pend.args, pend.statics
        imgs_dev = pend.imgs_dev
        packed = np.asarray(pend.packed)     # the readback fence
        offsets, p_band, p_w, p_stride, p_factor = \
            self._plan_decode_meta(plan)
        d = self.data
        masks_full = None              # lazy full-mask overflow fallback
        raws = []
        for fi in range(n_frames):
            count = int(packed[fi, -2])
            pre_overflow = bool(packed[fi, -1])
            if count <= self.MAX_CANDIDATES and not pre_overflow:
                sel = packed[fi, :count].astype(np.int64)
            else:
                # overflow (candidate buffer or survivor prefilter):
                # dense full-mask readback (identical decode below)
                if masks_full is None:
                    masks_full = np.asarray(_run_pyramid_masks(
                        imgs_dev, *args, *statics))
                sel = np.nonzero(masks_full[fi])[0]
            if not len(sel):
                raws.append(np.zeros((0, 4), np.float32))
                continue
            pid = np.searchsorted(offsets, sel, side="right") - 1
            local = sel - offsets[pid]
            ys = p_band[pid] + local // p_w[pid]
            xs = local % p_w[pid]
            sf = p_stride[pid] * p_factor[pid]
            raws.append(np.stack([
                np.round(xs * sf), np.round(ys * sf),
                np.round(d.window_width * p_factor[pid]),
                np.round(d.window_height * p_factor[pid])],
                axis=1).astype(np.float32))
        if self.min_neighbors > 0:
            return [group_rectangles(r, self.min_neighbors) for r in raws]
        return raws

    def _detect_stack(self, imgs_dev, h: int, w: int) -> List[np.ndarray]:
        return self._decode_pending(self._dispatch_stack(imgs_dev, h, w))

    def detect(self, image) -> np.ndarray:
        """Detect objects in a grayscale image.

        Returns (K, 4) float32 [x, y, w, h] boxes in image coordinates
        (grouped, like OpenCV's detectMultiScale).
        """
        if isinstance(image, jax.Array):
            # device-resident frame (e.g. the tracking loop's uploaded
            # frame): skip the synchronous host->device re-upload, which
            # costs a full RTT per call on tunneled backends (any dtype;
            # the pyramid program casts to f32 internally)
            if image.ndim != 2:
                raise ValueError("expected a (H, W) grayscale image")
            h, w = image.shape
            imgs_dev = image       # 2D: the pyramid program adds the
            #                        frames axis inside the trace
        else:
            img = np.asarray(image, np.float32)
            if img.ndim != 2:
                raise ValueError("expected a (H, W) grayscale image")
            h, w = img.shape
            # one upload per image; everything else is ONE jitted call
            imgs_dev = jnp.asarray(img[None])
        return self._detect_stack(imgs_dev, int(h), int(w))[0]

    def detect_batch(self, images) -> List[np.ndarray]:
        """Detect objects in a stack of same-shape grayscale frames.

        images: (B, H, W) array (numpy or device-resident jax.Array, any
        integer-valued dtype). The whole batch shares one compiled
        pyramid program and ONE device->host candidate readback, so
        per-frame cost amortises the tunnel RTT that dominates
        single-frame detect() on remote backends — this is the entry
        point for video segments, training-set re-detection, and
        tracking-loss recovery sweeps (reference: rcr-train.cpp:410
        re-detects every training image one by one through
        cv::detectMultiScale).

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

    def detect_begin(self, image) -> PendingDetect:
        """Asynchronous half of :meth:`detect`: enqueue the whole pyramid
        program for one frame and return immediately (jax dispatch is
        async — no device round trip happens here). Fetch the boxes later
        with :meth:`detect_end`.

        Why: on a remote/tunneled backend the single candidate readback
        costs a payload-independent ~25 ms RTT — ~70% of the 36 ms
        single-frame wall (docs/PERF_NOTES.md readback anatomy). Issuing
        frame N+1's pyramid BEFORE fencing frame N overlaps that RTT with
        the next frame's device compute, so a streaming loop pays
        ~max(RTT, device time) per frame instead of their sum. The
        reference prints exactly this per-frame FD latency as its own
        metric (rcr-track.cpp:146-166). Accepts a (H, W) numpy frame or a
        device-resident jax.Array like :meth:`detect`.
        """
        if isinstance(image, jax.Array):
            if image.ndim != 2:
                raise ValueError("expected a (H, W) grayscale image")
            h, w = image.shape
            imgs_dev = image
        else:
            img = np.asarray(image, np.float32)
            if img.ndim != 2:
                raise ValueError("expected a (H, W) grayscale image")
            h, w = img.shape
            imgs_dev = jnp.asarray(img[None])
        return self._dispatch_stack(imgs_dev, int(h), int(w))

    def detect_end(self, pending: PendingDetect) -> np.ndarray:
        """Fence + decode a :meth:`detect_begin` handle. Returns the same
        (K, 4) grouped [x, y, w, h] boxes ``detect`` would have."""
        return self._decode_pending(pending)[0]

    def detect_stream(self, frames: Iterable,
                      depth: int = 4) -> Iterator[np.ndarray]:
        """Pipelined single-frame detection over a frame iterable (video
        sweep): yields each frame's grouped boxes in order, keeping
        ``depth`` detects in flight. Each frame's candidate readback
        starts at dispatch (``copy_to_host_async``) and is collected
        ``depth`` frames later — D independent in-flight transfers
        pipeline over a remote tunnel at ~RTT/D per frame
        (scripts/probe_async_readback.py), so the steady per-frame cost
        tends to ~max(device pyramid time, RTT/D) instead of
        device + RTT (lag-one, the round-4 scheme, still paid one full
        RTT per frame). Boxes are identical for every depth; delivery
        lags the dispatch front by ``depth`` frames. Frames may differ
        in shape (each (H, W) class compiles once). For same-shape
        frames wanting throughput over ordering latency, prefer
        :meth:`detect_batch` (one readback for the whole stack)."""
        if depth < 1:
            raise ValueError(f"depth must be >= 1, got {depth}")
        import collections
        window = collections.deque()
        for frame in frames:
            cur = self.detect_begin(frame)
            if cur.packed is not None:
                cur.packed.copy_to_host_async()
            window.append(cur)
            if len(window) > depth:
                yield self._decode_pending(window.popleft())[0]
        while window:
            yield self._decode_pending(window.popleft())[0]
