"""Robust Cascaded Regression (RCR) facial landmark detection.

TPU-native rebuild of the reference's RCR layer
(/root/reference/include/rcr/model.hpp, adaptive_vlhog.hpp): the flagship
application of the SDM cascade — 22-landmark face alignment with adaptive
VLFeat-HOG features and inter-eye-distance normalisation.

Key differences from the reference, by design:
  * HogTransform is batched: one call produces the (N, F) feature matrix for
    all samples of a cascade level as a single XLA computation (patch gather
    + HOG matmuls), instead of a per-sample thread-pool task
    (superviseddescent.hpp:173-189).
  * detect() over a batch of faces is ONE jit-compiled program over the
    whole 4-level cascade — the "jit(scan over levels)(vmapped over faces)"
    promise of SURVEY.md §3.2.
  * Face detection itself is pluggable and outside the library scope, as in
    the reference (OpenCV Haar is used there, rcr-detect.cpp:110); a
    ground-truth-derived facebox helper is provided for training/eval.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from superviseddescent_tpu.core.cascade import SupervisedDescentOptimiser
from superviseddescent_tpu.core.regressor import LinearRegressor
from superviseddescent_tpu.core.regulariser import Regulariser, RegularisationType
from superviseddescent_tpu.io.cereal import (
    CerealDetectionModel, CerealHoGParam, CerealRegressor,
    load_detection_model as _load_cereal,
    save_detection_model as _save_cereal,
)
from superviseddescent_tpu.ops.hog import HogVariant, hog_descriptor
from superviseddescent_tpu.ops.patches import (
    extract_patches, extract_patches_dense)
from superviseddescent_tpu.utils.landmarks import (
    LandmarkCollection, ied_from_rows, resolve_eye_indices,
    to_landmark_collection,
)


@dataclass(frozen=True)
class HogParams:
    """Per-cascade-level HOG configuration
    (reference HoGParam, adaptive_vlhog.hpp:41-60)."""
    variant: HogVariant = HogVariant.Uoctti
    num_cells: int = 5
    cell_size: int = 11
    num_bins: int = 4
    relative_patch_size: float = 1.0   # patch size as a fraction of the IED

    @property
    def patch_size(self) -> int:
        """Fixed resize target in pixels (adaptive_vlhog.hpp:154)."""
        return self.num_cells * self.cell_size


# The shipped RCR-22 configuration (rcr-train.cpp:447)
RCR22_HOG_PARAMS = (
    HogParams(HogVariant.Uoctti, 5, 11, 4, 1.0),
    HogParams(HogVariant.Uoctti, 5, 10, 4, 0.7),
    HogParams(HogVariant.Uoctti, 5, 8, 4, 0.4),
    HogParams(HogVariant.Uoctti, 5, 6, 4, 0.25),
)


def rows_shift(ox, oy, n_lm: int) -> jnp.ndarray:
    """(N,) window origins -> (N, 2L) additive shift for [x..., y...]
    landmark rows (shared by the stepped prologue and both fused
    entry points — the row layout is encoded once)."""
    return jnp.concatenate([
        jnp.tile(ox[:, None], (1, n_lm)),
        jnp.tile(oy[:, None], (1, n_lm))], axis=1)


def align_mean(mean, facebox, scaling_x=1.0, scaling_y=1.0,
               translation_x=0.0, translation_y=0.0):
    """Place the mean shape ([-0.5, 0.5]^2 facebox space) into a pixel
    facebox (x, y, w, h) (reference: model.hpp:64-76).

    mean: (..., 2L) rows; facebox: 4 scalars or (..., 4) arrays.
    """
    mean = jnp.asarray(mean)
    fb = jnp.asarray(facebox, mean.dtype)
    x, y, w, h = fb[..., 0], fb[..., 1], fb[..., 2], fb[..., 3]
    l = mean.shape[-1] // 2
    mx = (mean[..., :l] * scaling_x + 0.5 + translation_x) * w[..., None] + x[..., None]
    my = (mean[..., l:] * scaling_y + 0.5 + translation_y) * h[..., None] + y[..., None]
    return jnp.concatenate([mx, my], axis=-1)


class InterEyeDistanceNormalisation:
    """Adaptive normalisation: rows of 1/IED(current estimate)
    (reference: model.hpp:84-116)."""

    def __init__(self, model_landmarks: Sequence[str],
                 right_eye_ids: Sequence[str], left_eye_ids: Sequence[str]):
        self.model_landmarks = list(model_landmarks)
        self.right_eye_ids = list(right_eye_ids)
        self.left_eye_ids = list(left_eye_ids)
        self._right_idx, self._left_idx = resolve_eye_indices(
            model_landmarks, right_eye_ids, left_eye_ids)

    def __call__(self, params: jnp.ndarray) -> jnp.ndarray:
        ied = ied_from_rows(params, self._right_idx, self._left_idx)
        return jnp.ones_like(params) / ied[..., None]


class HogTransform:
    """Batched adaptive-HOG projection function for the SDM cascade
    (reference: adaptive_vlhog.hpp:70-195).

    Per level: patch half-size = round(relative_patch_size * IED(x)/2) px in
    the original image (adaptive, data-dependent — but only a *scalar*, so
    shapes stay static); fixed-size patches are gathered and described with
    HOG, flattened per landmark in Matlab order, concatenated, plus a bias 1.
    """

    def __init__(self, images, hog_params: Sequence[HogParams],
                 model_landmarks: Sequence[str],
                 right_eye_ids: Sequence[str],
                 left_eye_ids: Sequence[str],
                 image_indices=None,
                 quantize: bool = True,
                 backend: str = "auto",
                 fast_sampling: bool = False,
                 sampling: Optional[str] = None,
                 chunk_size: Optional[int] = None,
                 patch_backend: Optional[str] = None,
                 sub_windows: Optional[Sequence[int]] = None,
                 sub_windows_x: Optional[Sequence[int]] = None,
                 hog_fast: bool = False,
                 frame_table=None,
                 frame_window: Optional[Tuple[int, int]] = None):
        """images: (I, H, W) float32 gray stack (see ops.patches.stack_images).
        image_indices: (N,) sample -> image map; defaults to arange or zeros
        depending on batch size at call time.
        backend: 'pallas' (fused VMEM kernel), 'xla', or 'auto'
        (pallas on TPU, xla elsewhere).
        sampling: MXU precision of the dense patch-sampling matmuls:
          'exact' (f32, default), 'high' (bf16x3 passes: ~2x faster,
          <0.006 greylevel pixel error — below the uint8 quantisation step),
          'fast' (bf16: ~3x faster, +-1 greylevel worst case, landmark
          deltas ~1e-5 IOD units).
        fast_sampling: back-compat alias for sampling='fast'.
        chunk_size: process the sample axis in lax.map chunks of this size.
        Required for 300-W-scale training batches (tens of thousands of
        samples x 8801 features): bounds peak memory to one chunk's patch
        and tent intermediates while the (N, F) feature matrix still
        materialises once. Pass a uint8 image stack to quarter image HBM.
        patch_backend: None/'auto' (dense on TPU, gather elsewhere),
        'dense', 'gather', or 'window' — the Pallas window-resident sampler
        (ops/patches_pallas.py): requires one image per sample (per-face
        ROI windows) and per-level sub_windows sizes; its tent matrices
        never touch HBM, making it the fastest serving path.
        sub_windows: per-level static sub-window sides W for the 'window'
        backend (patch extent 2*phw+1 must fit in W).
        sub_windows_x: per-level static lane (column) sub-window sides WX
        for the 'window' backend, multiples of 128 (0/None -> full width);
        shrinks the sampling dots to WX lanes.
        hog_fast: bf16 cell-splat in the Pallas HOG kernel (~1.3x faster,
        ~0.4% descriptor noise); exact f32 by default.
        frame_table: fused backend only — (frame_idx, oy, ox) per-FACE
        int32 arrays enabling the in-kernel window crop
        (ops/cascade_pallas.py::extract_features_fused_frames): `images`
        is then the uint8 full-FRAME stack (width a FRAME_COL_ALIGN
        multiple), image_indices maps sample -> face (row of the table),
        origins are FRAME_*_ALIGN-aligned, and x is expressed in each
        sample's aligned-window coordinates. No per-sample window stack
        is ever gathered/materialised, so chunking is unnecessary.
        frame_window: static (RY, RX) window shape for frame_table mode."""
        self.images = jnp.asarray(images)
        if self.images.ndim == 2:
            self.images = self.images[None]
        self.hog_params = tuple(hog_params)
        self.model_landmarks = list(model_landmarks)
        self._right_idx, self._left_idx = resolve_eye_indices(
            model_landmarks, right_eye_ids, left_eye_ids)
        self.image_indices = (None if image_indices is None
                              else jnp.asarray(image_indices, jnp.int32))
        # lazily computed by _identity_for: is the explicit sample->image
        # map the identity permutation? (lets _call_block skip the window
        # gather safely — a bare images.shape[0] == n check would mis-fire
        # when an explicit non-identity map has as many samples as images)
        self._indices_are_arange = None
        self.quantize = quantize
        on_tpu = jax.default_backend() == "tpu"
        if backend == "auto":
            backend = "pallas" if on_tpu else "xla"
        if backend not in ("pallas", "xla"):
            raise ValueError(f"unknown HOG backend: {backend!r}")
        self.backend = backend
        # patch sampling: dense tent matmuls on the MXU (TPU) vs pointwise
        # gather (CPU/small problems); both are numerically identical.
        # 'fused' = the whole sample+HOG level in one Pallas kernel
        # (ops/cascade_pallas.py::extract_features_fused) — the fastest
        # training extraction; NOTE its features come back in the
        # kernel's compact column order (bias last), see
        # compact_to_standard_rows for mapping solved weights back.
        if patch_backend in (None, "auto"):
            patch_backend = "dense" if on_tpu else "gather"
        if patch_backend not in ("dense", "gather", "window", "fused"):
            raise ValueError(f"unknown patch backend: {patch_backend!r}")
        if patch_backend in ("window", "fused") and sub_windows is None:
            sub_windows = tuple(0 for _ in self.hog_params)
        if patch_backend == "fused":
            p0 = self.hog_params[0]
            if any((p.num_cells, p.num_bins, p.variant) !=
                   (p0.num_cells, p0.num_bins, p0.variant)
                   for p in self.hog_params):
                raise ValueError("fused backend requires uniform "
                                 "cell-count/bins across levels")
            from superviseddescent_tpu.ops.cascade_pallas import (
                validate_fused_config)
            validate_fused_config(len(model_landmarks), p0.num_cells,
                                  p0.num_bins, p0.variant)
            if not quantize:
                raise ValueError("fused backend always quantizes patches")
        if frame_table is not None:
            if patch_backend != "fused":
                raise ValueError("frame_table requires the fused backend")
            if frame_window is None:
                raise ValueError("frame_table requires frame_window")
            if self.images.dtype != jnp.uint8:
                raise ValueError("frame_table requires a uint8 frame stack")
            frame_table = tuple(jnp.asarray(t, jnp.int32)
                                for t in frame_table)
        self.frame_table = frame_table
        self.frame_window = (None if frame_window is None
                             else tuple(int(v) for v in frame_window))
        self.patch_method = patch_backend
        self.sub_windows = None if sub_windows is None else tuple(sub_windows)
        self.sub_windows_x = (None if sub_windows_x is None
                              else tuple(sub_windows_x))
        if sampling is None:
            sampling = "fast" if fast_sampling else "exact"
        if sampling not in ("exact", "high", "fast"):
            raise ValueError(f"unknown sampling mode: {sampling!r} "
                             "(expected 'exact', 'high' or 'fast')")
        self.sampling = sampling
        self.sampling_precision = {
            "exact": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "fast": jax.lax.Precision.DEFAULT,
        }[sampling]
        self.chunk_size = chunk_size
        self.hog_fast = hog_fast

    def feature_dim(self, level: int = 0) -> int:
        p = self.hog_params[level]
        from superviseddescent_tpu.ops.hog import hog_num_cells, hog_dimension
        c = hog_num_cells(p.patch_size, p.cell_size)
        return len(self.model_landmarks) * c * c * hog_dimension(
            p.variant, p.num_bins) + 1

    def _indices_for(self, n: int):
        if self.image_indices is not None:
            return self.image_indices
        if self.images.shape[0] == 1:
            return jnp.zeros((n,), jnp.int32)
        if self.images.shape[0] == n:
            return jnp.arange(n, dtype=jnp.int32)
        raise ValueError(
            f"cannot infer image indices for batch {n} over "
            f"{self.images.shape[0]} images; pass image_indices")

    def _identity_for(self, n: int) -> bool:
        """True iff sample i provably reads window/image i (so the
        per-sample window gather can be skipped)."""
        if self.images.shape[0] != n:
            return False
        if self.image_indices is None:
            return True
        if self.image_indices.shape[0] != n:
            return False
        if isinstance(self.image_indices, jax.core.Tracer):
            # constructed under jit with traced indices: identity cannot
            # be proven, so gather (always correct; pass concrete arange
            # indices — or None — to skip the gather)
            return False
        if self._indices_are_arange is None:
            self._indices_are_arange = bool(np.array_equal(
                np.asarray(self.image_indices), np.arange(n)))
        return self._indices_are_arange

    def __call__(self, x: jnp.ndarray, level: int) -> jnp.ndarray:
        n = x.shape[0]
        return self.call_with_indices(x, level, self._indices_for(n),
                                      identity=self._identity_for(n))

    def call_with_indices(self, x: jnp.ndarray, level: int, image_indices,
                          identity: bool = False) -> jnp.ndarray:
        """__call__ with an explicit sample -> image map (the entry point
        parallel/dist.py::ShardedHogTransform shard_maps: each device
        passes its x/index shard while the image stack rides in as a
        replicated closure constant)."""
        n = x.shape[0]
        if (self.chunk_size is not None and n > self.chunk_size
                and not (self.patch_method == "fused"
                         and (identity or self.frame_table is not None))):
            # the fused kernel streams per-face blocks itself, so an
            # identity batch needs no lax.map chunking — nor does the
            # frames mode (the kernel crops windows straight from HBM;
            # only (N,) int origin rows are per-sample). A non-identity
            # windows batch still gathers one window per sample ahead of
            # the kernel, and THAT allocation must stay chunked
            return self._call_chunked(x, level, image_indices)
        return self._call_block(x, level, image_indices,
                                identity=identity)

    def _call_chunked(self, x, level, indices):
        """lax.map over fixed-size sample chunks: one compiled body, peak
        memory bounded by the chunk's intermediates."""
        n = x.shape[0]
        c = self.chunk_size
        padded = -(-n // c) * c
        if padded != n:
            # pad with copies of row 0 (valid coordinates), dropped below
            x = jnp.concatenate([x, jnp.tile(x[:1], (padded - n, 1))])
            indices = jnp.concatenate(
                [indices, jnp.tile(indices[:1], (padded - n,))])
        x_chunks = x.reshape(padded // c, c, -1)
        idx_chunks = indices.reshape(padded // c, c)
        out = jax.lax.map(
            lambda args: self._call_block(args[0], level, args[1]),
            (x_chunks, idx_chunks))
        return out.reshape(padded, -1)[:n]

    def _call_block(self, x: jnp.ndarray, level: int,
                    image_indices, identity: bool = False) -> jnp.ndarray:
        p = self.hog_params[level]
        n, two_l = x.shape
        l = two_l // 2
        s = p.patch_size

        ied = ied_from_rows(x, self._right_idx, self._left_idx)     # (N,)
        # std::round (half away from zero); guard degenerate estimates
        phw = jnp.floor(p.relative_patch_size * ied / 2.0 + 0.5)
        phw = jnp.maximum(phw, 1.0)

        # transposed fast path: the window sampler's x-first dot order is
        # ~25% cheaper on the MXU and hands bf16 patch^T rows straight to
        # the transposed-input HOG kernel (half the HBM round-trip).
        # Numerics are the fast-mode class (bf16 dots either way), so it
        # is keyed on fast sampling + fast HOG only.
        transposed = (self.patch_method == "window"
                      and self.backend == "pallas"
                      and self.sampling == "fast" and self.hog_fast)

        if self.patch_method == "fused":
            from superviseddescent_tpu.ops.cascade_pallas import (
                compact_feature_columns, extract_features_fused,
                extract_features_fused_frames)
            from superviseddescent_tpu.ops.hog import hog_dimension
            dims = hog_dimension(p.variant, p.num_bins)
            if self.frame_table is not None:
                # in-kernel window crop: image_indices maps sample ->
                # face row of the (frame, oy, ox) table; the kernel DMAs
                # each sample's window straight from the uint8 frames
                fi, foy, fox = (t[image_indices] for t in self.frame_table)
                ry_w, rx_w = self.frame_window
                w = self.sub_windows[level] or ry_w
                wx = (self.sub_windows_x[level] if self.sub_windows_x
                      else 0) or rx_w
                feats_k = extract_features_fused_frames(
                    self.images, fi, foy, fox, x, (ry_w, rx_w),
                    (p.patch_size, w, wx, p.relative_patch_size),
                    p.cell_size, p.num_bins, dims,
                    tuple(int(i) for i in self._right_idx),
                    tuple(int(i) for i in self._left_idx))
                return compact_feature_columns(feats_k, l, p.num_cells,
                                               dims)
            windows = self.images if identity else self.images[image_indices]
            w = self.sub_windows[level] or windows.shape[1]
            wx = (self.sub_windows_x[level] if self.sub_windows_x
                  else 0) or windows.shape[2]
            feats_k = extract_features_fused(
                windows, x, (p.patch_size, w, wx, p.relative_patch_size),
                p.cell_size, p.num_bins, dims,
                tuple(int(i) for i in self._right_idx),
                tuple(int(i) for i in self._left_idx))
            return compact_feature_columns(feats_k, l, p.num_cells, dims)

        if self.patch_method == "window":
            from superviseddescent_tpu.ops.patches_pallas import (
                max_patch_half, max_patch_half_x, sample_patches_window)
            # chunked calls (and shared-window batches) index into the
            # window stack per sample; identity batches skip the gather
            windows = self.images if identity else self.images[image_indices]
            w = self.sub_windows[level] or windows.shape[1]
            wx = (self.sub_windows_x[level] if self.sub_windows_x
                  else 0) or windows.shape[2]
            # degrade gracefully for faces larger than the sub-window was
            # sized for: clamp the patch half-size so the whole patch fits
            # (a consistently smaller patch) instead of silently truncating
            # one side of the bilinear support
            phw = jnp.minimum(phw, max_patch_half(w))
            if wx != windows.shape[2]:
                phw = jnp.minimum(phw, max_patch_half_x(wx))
            patches = sample_patches_window(
                windows, x[:, :l], x[:, l:], phw, s,
                sub_window=self.sub_windows[level],
                sub_window_x=(self.sub_windows_x[level]
                              if self.sub_windows_x else 0),
                quantize=self.quantize,
                sampling=self.sampling,
                transposed=transposed,
                # bf16 hand-off is lossless only for quantized (integer)
                # pixels; unquantized patches stay f32
                out_dtype=(jnp.bfloat16 if transposed and self.quantize
                           else jnp.float32))                        # (N,L,S,S)
        elif self.patch_method == "dense":
            patches = extract_patches_dense(
                self.images, image_indices,
                x[:, :l], x[:, l:], phw, s, quantize=self.quantize,
                precision=self.sampling_precision)                   # (N,L,S,S)
        else:
            patches = extract_patches(
                self.images, image_indices,
                x[:, :l], x[:, l:], phw, s, quantize=self.quantize)
        if self.backend == "pallas":
            from superviseddescent_tpu.ops.hog_pallas_flat import (
                hog_descriptor_pallas_flat)
            desc = hog_descriptor_pallas_flat(
                patches.reshape(n * l, s * s), s,
                p.cell_size, p.num_bins, p.variant,
                fast=self.hog_fast,
                transposed=transposed)                               # (N*L,F1)
        else:
            desc = hog_descriptor(patches.reshape(n * l, s, s),
                                  p.cell_size, p.num_bins, p.variant)
        desc = desc.reshape(n, -1)
        bias = jnp.ones((n, 1), desc.dtype)
        return jnp.concatenate([desc, bias], axis=1)


class DetectionModel:
    """A trained RCR landmark detection model
    (reference: rcr::detection_model, model.hpp:122-219)."""

    def __init__(self, sdo: SupervisedDescentOptimiser, mean,
                 landmark_ids: Sequence[str],
                 hog_params: Sequence[HogParams],
                 right_eye_ids: Sequence[str],
                 left_eye_ids: Sequence[str]):
        self.sdo = sdo
        self.mean = np.asarray(mean, np.float32)
        self.landmark_ids = list(landmark_ids)
        self.hog_params = tuple(hog_params)
        self.right_eye_ids = list(right_eye_ids)
        self.left_eye_ids = list(left_eye_ids)

    # -------------------------------------------------------------- #
    # Inference
    # -------------------------------------------------------------- #
    def _hog(self, images, image_indices=None, quantize=True,
             sampling=None, patch_backend=None, sub_windows=None,
             sub_windows_x=None, hog_fast=False, backend="auto"):
        return HogTransform(images, self.hog_params, self.landmark_ids,
                            self.right_eye_ids, self.left_eye_ids,
                            image_indices=image_indices, quantize=quantize,
                            sampling=sampling, patch_backend=patch_backend,
                            sub_windows=sub_windows,
                            sub_windows_x=sub_windows_x, hog_fast=hog_fast,
                            backend=backend)

    def detect(self, image, facebox) -> LandmarkCollection:
        """Detect landmarks in one image from a facebox (x, y, w, h)
        (reference: model.hpp:132-144)."""
        init = align_mean(self.mean, np.asarray(facebox, np.float32))
        hog = self._hog(np.asarray(image, np.float32))
        row = self.sdo.predict(init, None, hog)
        return to_landmark_collection(np.asarray(row), self.landmark_ids)

    def detect_from_landmarks(self, image, initialisation) -> LandmarkCollection:
        """Detect from a prior landmark estimate, e.g. the previous video
        frame (tracking; reference: model.hpp:147-157)."""
        hog = self._hog(np.asarray(image, np.float32))
        row = self.sdo.predict(jnp.asarray(initialisation), None, hog)
        return to_landmark_collection(np.asarray(row), self.landmark_ids)

    def detect_batch(self, images, faceboxes, image_indices=None,
                     quantize=True) -> jnp.ndarray:
        """Batched detection: (I, H, W) image stack + (B, 4) faceboxes ->
        (B, 2L) landmark rows. Traceable; wrap in jax.jit for the hot path."""
        init = align_mean(self.mean[None, :],
                          jnp.asarray(faceboxes, jnp.float32))
        hog = self._hog(images, image_indices=image_indices,
                        quantize=quantize)
        return self.sdo.test(init, None, hog)

    def make_batched_detector(self, image_shape, batch: int,
                              quantize: bool = True):
        """Return a jitted ``f(images (B,H,W), faceboxes (B,4)) -> (B,2L)``
        for fixed shapes — the serving entry point."""
        def run(images, faceboxes):
            return self.detect_batch(images, faceboxes,
                                     image_indices=jnp.arange(batch, dtype=jnp.int32),
                                     quantize=quantize)
        return jax.jit(run)

    def make_stepped_detector(self, batch: int, quantize: bool = True,
                              roi: Optional[int] = None,
                              fast_sampling: bool = False,
                              sampling: Optional[str] = None,
                              window_sampler: bool = False,
                              max_ied: Optional[float] = None,
                              hog_backend: str = "auto"):
        """Return ``f(images (B,H,W), faceboxes (B,4)) -> (B,2L)`` that runs
        each cascade level as its OWN jitted program.

        Numerically identical to the monolithic detector, but the four small
        graphs compile dramatically faster than one whole-cascade graph
        (minutes vs tens of minutes through the remote compiler) at the cost
        of ~per-level dispatch overhead. Preferred for cold-start serving.

        roi: optional square ROI side R. When set, a fixed R x R window
        centred on each facebox is sliced out first and the whole cascade
        runs against the windows — the dense MXU patch sampling then scales
        with R^2 instead of H*W. Exact (bit-identical) as long as every
        landmark patch stays inside the window: R should be at least
        ~1.6x the largest facebox side. Windows are clamped inside the
        image, so image-border zero-padding semantics are preserved.

        window_sampler: use the Pallas window-resident sampler
        (ops/patches_pallas.py) instead of the dense XLA sampler — its tent
        matrices never touch HBM. Requires roi. Per-level sub-windows are
        sized from max_ied (default roi/2.13, the largest IED whose 1.6x
        facebox still fits the ROI); faces beyond max_ied degrade
        gracefully to a consistently smaller patch (the patch half-size is
        clamped so the patch always fits the sub-window).
        """
        if sampling is None:
            sampling = "fast" if fast_sampling else "exact"
        if window_sampler and roi is None:
            raise ValueError("window_sampler requires roi")
        sub_windows = sub_windows_x = None
        if window_sampler:
            mi = max_ied if max_ied is not None else roi / 2.13
            sub_windows, sub_windows_x = level_sub_windows(
                self.hog_params, roi, mi)
        idx = jnp.arange(batch, dtype=jnp.int32)
        mean = jnp.asarray(self.mean)
        # fast mode: bf16 multiplies in the regressor GEMV too — the HOG
        # descriptors it consumes already carry ~0.4% bf16 splat noise, and
        # the update accumulates in f32 (same numerics class, ~6x less MXU
        # work than the HIGHEST-precision parity dot)
        gemv_precision = (jax.lax.Precision.DEFAULT if sampling == "fast"
                          else jax.lax.Precision.HIGHEST)
        levels = []
        for li, regressor in enumerate(self.sdo.regressors):
            def level_fn(images, x, _li=li, _reg=regressor):
                hog = self._hog(
                    images, image_indices=idx, quantize=quantize,
                    sampling=sampling,
                    patch_backend="window" if window_sampler else None,
                    sub_windows=sub_windows,
                    sub_windows_x=sub_windows_x,
                    hog_fast=(sampling == "fast"),
                    backend=hog_backend)
                observed = hog(x, _li)
                norm = self.sdo.normalisation(x)
                update = jnp.dot(observed, _reg.weights,
                                 precision=gemv_precision,
                                 preferred_element_type=jnp.float32)
                return x - update / norm
            levels.append(jax.jit(level_fn))

        init_fn = jax.jit(lambda boxes: align_mean(mean[None, :], boxes))

        if roi is None:
            def run(images, faceboxes):
                x = init_fn(jnp.asarray(faceboxes, jnp.float32))
                for fn in levels:
                    x = fn(images, x)
                return x
            return run

        # fast mode keeps the windows in bf16: gray pixels 0..255 are exact
        # in bf16 and a DEFAULT-precision dot casts to bf16 anyway, so this
        # halves the per-level window reads with zero numeric change. The
        # input stack may be uint8 (4x less transfer + crop bandwidth).
        win_dtype = jnp.bfloat16 if sampling == "fast" else jnp.float32

        @jax.jit
        def crop_fn(images, boxes):
            h, w = images.shape[1], images.shape[2]
            if h < roi or w < roi:
                raise ValueError(f"roi {roi} exceeds image stack {h}x{w}")
            cx = boxes[:, 0] + boxes[:, 2] / 2.0
            cy = boxes[:, 1] + boxes[:, 3] / 2.0
            oy = jnp.clip(jnp.round(cy - roi / 2.0), 0, h - roi
                          ).astype(jnp.int32)
            rows_only = (window_sampler and w % 128 == 0
                         and sub_windows_x is not None
                         and all(sub_windows_x))
            if rows_only:
                # rows-only crop: slice full-width row bands (a lane-static
                # slice — the lane-dynamic x slice costs ~4x more than the
                # moved bytes) and let the sampler's 128-aligned lane
                # sub-windows do the x-windowing. Origins floor to the
                # uint8 sublane tile so the y slice stays tile-aligned.
                oy = (oy // 32) * 32
                windows = jax.vmap(
                    lambda img, y0: jax.lax.dynamic_slice(
                        img, (y0, 0), (roi, w)))(images, oy)
                ox = jnp.zeros(oy.shape, jnp.float32)
            else:
                ox = jnp.clip(jnp.round(cx - roi / 2.0), 0, w - roi
                              ).astype(jnp.int32)
                windows = jax.vmap(
                    lambda img, y0, x0: jax.lax.dynamic_slice(
                        img, (y0, x0), (roi, roi)))(images, oy, ox)
                ox = ox.astype(jnp.float32)
            return (windows.astype(win_dtype),
                    ox, oy.astype(jnp.float32))

        n_lm = len(self.landmark_ids)

        # everything host-visible is a jitted call: eager jnp ops dispatch
        # synchronously through remote backends (measured ~30 ms each over
        # the axon tunnel) while jitted calls enqueue asynchronously
        @jax.jit
        def prologue(boxes, ox, oy):
            shift = rows_shift(ox, oy, n_lm)
            return align_mean(mean[None, :], boxes) - shift, shift

        epilogue = jax.jit(lambda x, shift: x + shift)

        def run(images, faceboxes):
            boxes = jnp.asarray(faceboxes, jnp.float32)
            windows, ox, oy = crop_fn(jnp.asarray(images), boxes)
            x, shift = prologue(boxes, ox, oy)
            for fn in levels:
                x = fn(windows, x)
            return epilogue(x, shift)
        return run

    def make_fused_detector(self, roi: int,
                            max_ied: Optional[float] = None,
                            init: str = "facebox",
                            faces_per_step: Optional[int] = None,
                            g_unroll: Optional[int] = None,
                            quantize: bool = True):
        """Whole-cascade FUSED Pallas detector (ops/cascade_pallas.py):
        one kernel samples, HOG-describes and regresses all levels with
        the face window resident in VMEM — no per-level window
        re-streams, no patch HBM round-trips, 1 dispatch instead of 8.
        The returned callable is batch-polymorphic (one compile per
        distinct batch size).

        init="facebox" (default) returns f(images, faceboxes) with the
        mean shape aligned into each box (model.hpp:132-144);
        init="landmarks" returns f(images, prior_rows) initialising from
        a prior estimate, e.g. the previous video frame — the tracking
        overload (model.hpp:147-157); see also make_fused_tracker.
        Both accept an optional image_indices=(B,) int map when several
        faces share source frames: images is then the unique-frame stack
        (n_img, H, W) and each window is sliced from its frame in one
        fused gather — no per-face (B, H, W) stack is materialised.
        NOTE: an out-of-range index CLAMPS to the last frame (JAX
        dynamic_slice/gather semantics, same as detect_batch) and yields
        plausible-looking but wrong landmarks — validate indices
        host-side when they come from untrusted input.

        Serving-fast numerics only (bf16 dots, sector binning, quantised
        patches) — the same class as make_stepped_detector(
        sampling='fast', window_sampler=True, hog_fast=True).
        Requires a square 128-aligned roi (the window crop) sized like
        the stepped window path; max_ied as there.

        quantize=False skips the in-kernel patch round-to-uint8
        (reference parity detail, adaptive_vlhog.hpp:154-155): landmark
        deltas vs the quantised path are sub-pixel, same class as the
        fast-mode noise (measured in docs/PERF_NOTES.md).

        faces_per_step (the kernel's G, faces per grid step) and
        g_unroll (faces per face-loop iteration) default per model size
        (ops/cascade_pallas.py::default_faces_per_step/default_g_unroll).
        Since round 4 the kernel's face loop is a fori_loop, so Mosaic
        compile time scales with levels x L x g_unroll emitted sampler
        bodies — NOT with G x L as before: RCR-22 compiles in ~50-75 s
        cold (was 419 s) at the same 55k faces/s, and ibug-68 no longer
        needs a tiny G. Outputs are bit-identical across G and g_unroll;
        batches are padded to a G multiple inside the kernel.
        """
        from superviseddescent_tpu.ops.cascade_pallas import (
            FRAME_COL_ALIGN, FRAME_ROW_ALIGN, SEG, detect_cascade_fused,
            detect_cascade_fused_frames, permute_weights,
            validate_fused_config)
        from superviseddescent_tpu.ops.hog import hog_dimension
        if roi % 128 != 0:
            raise ValueError("fused detector requires a 128-aligned roi")
        if init not in ("facebox", "landmarks"):
            raise ValueError(f"unknown init mode: {init!r}")
        mi = max_ied if max_ied is not None else roi / 2.13
        sub_w, sub_x = level_sub_windows(self.hog_params, roi, mi)
        p0 = self.hog_params[0]
        c = p0.num_cells
        dims = hog_dimension(p0.variant, p0.num_bins)
        for p in self.hog_params:
            if (p.num_cells, p.num_bins, p.variant) != (
                    c, p0.num_bins, p0.variant):
                raise ValueError(
                    "fused detector requires uniform cell-count/bins")
        validate_fused_config(len(self.landmark_ids), c, p0.num_bins,
                              p0.variant)
        levels = tuple(
            (p.patch_size, sub_w[li], sub_x[li] or roi,
             p.relative_patch_size)
            for li, p in enumerate(self.hog_params))
        cell_sizes = tuple(p.cell_size for p in self.hog_params)
        r_idx, l_idx = resolve_eye_indices(
            self.landmark_ids, self.right_eye_ids, self.left_eye_ids)
        weights_perm = tuple(
            permute_weights(np.asarray(r.weights, np.float32).copy(),
                            len(self.landmark_ids), c, dims).copy()
            for r in self.sdo.regressors)

        mean = jnp.asarray(self.mean)
        n_lm = len(self.landmark_ids)

        @jax.jit
        def crop_fn(images, boxes, image_indices=None):
            h, w = images.shape[1], images.shape[2]
            if h < roi or w < roi:
                raise ValueError(f"roi {roi} exceeds image stack {h}x{w}")
            cx = boxes[:, 0] + boxes[:, 2] / 2.0
            cy = boxes[:, 1] + boxes[:, 3] / 2.0
            oy = jnp.clip(jnp.round(cy - roi / 2.0), 0, h - roi
                          ).astype(jnp.int32)
            ox = jnp.clip(jnp.round(cx - roi / 2.0), 0, w - roi
                          ).astype(jnp.int32)
            if image_indices is None:
                windows = jax.vmap(
                    lambda img, y0, x0: jax.lax.dynamic_slice(
                        img, (y0, x0), (roi, roi)))(images, oy, ox)
            else:
                # faces share source frames: slice each face's window
                # straight out of the unique-image stack in one fused
                # gather — the expanded (B, H, W) per-face stack is never
                # materialised (saves its HBM write + re-read)
                idx = jnp.asarray(image_indices, jnp.int32)
                windows = jax.vmap(
                    lambda i, y0, x0: jax.lax.dynamic_slice(
                        images, (i, y0, x0), (1, roi, roi))[0])(idx, oy, ox)
            return (windows.astype(jnp.bfloat16),
                    ox.astype(jnp.float32), oy.astype(jnp.float32))

        def _frames_path_ok(images):
            # the in-kernel-crop path: uint8 frames whose row stride is
            # lane-tile aligned (stack_images(pad_width_to=128)) can be
            # DMA'd straight from HBM by the kernel — no crop prologue.
            # Height must be FRAME_ROW_ALIGN-aligned too: _aligned_origins
            # clamps against h - ry_w, and only an aligned h keeps that
            # bound on the alignment grid so bottom-edge faces lose no
            # rows vs the legacy crop (ADVICE r3). stack_images pads
            # heights to 32 whenever the width is 128-padded.
            return (images.dtype == jnp.uint8
                    and images.shape[2] % FRAME_COL_ALIGN == 0
                    and images.shape[1] % FRAME_ROW_ALIGN == 0)

        def _aligned_origins(images, boxes):
            """Tile-aligned per-face window origins + the static window
            shape for detect_cascade_fused_frames. The desired roi crop
            origin is aligned DOWN to the (row, col) DMA grain and the
            window enlarged by one grain so it still covers the whole
            desired crop — every patch the legacy crop path could sample
            is present, just origin-shifted (compensated via x0).

            Order matters (ADVICE r3): FLOOR first, then clamp against
            the aligned upper bound. _frames_path_ok guarantees h and w
            are grain multiples, so h - ry_w / w - rx_w sit on the grid
            and the clamp cannot strip the one-grain slack from bottom/
            right-edge faces (clip-then-floor lost up to grain-1 rows
            the legacy crop sampled)."""
            h, w = images.shape[1], images.shape[2]
            if h < roi or w < roi:
                raise ValueError(f"roi {roi} exceeds image stack {h}x{w}")
            assert h % FRAME_ROW_ALIGN == 0 and w % FRAME_COL_ALIGN == 0
            ry_w = roi + (FRAME_ROW_ALIGN if h >= roi + FRAME_ROW_ALIGN
                          else 0)
            rx_w = roi + (FRAME_COL_ALIGN if w >= roi + FRAME_COL_ALIGN
                          else 0)
            cx = boxes[:, 0] + boxes[:, 2] / 2.0
            cy = boxes[:, 1] + boxes[:, 3] / 2.0
            oy = jnp.round(cy - roi / 2.0).astype(jnp.int32)
            oy = jnp.clip((oy // FRAME_ROW_ALIGN) * FRAME_ROW_ALIGN,
                          0, h - ry_w)
            ox = jnp.round(cx - roi / 2.0).astype(jnp.int32)
            ox = jnp.clip((ox // FRAME_COL_ALIGN) * FRAME_COL_ALIGN,
                          0, w - rx_w)
            return oy, ox, (ry_w, rx_w)

        def _run_frames(images, boxes, x0_img, image_indices):
            oy, ox, window_shape = _aligned_origins(images, boxes)
            if image_indices is None:
                idx = jnp.arange(images.shape[0], dtype=jnp.int32)
            else:
                # clamp: the frames kernel passes idx straight into an
                # HBM DMA (no gather semantics), so an out-of-range
                # entry must clamp here to honour the docstring's
                # dynamic_slice contract (ADVICE r3) instead of reading
                # out of bounds
                idx = jnp.clip(jnp.asarray(image_indices, jnp.int32),
                               0, images.shape[0] - 1)
            shift = rows_shift(ox.astype(jnp.float32),
                               oy.astype(jnp.float32), n_lm)
            out = detect_cascade_fused_frames(
                images, idx, oy, ox, x0_img - shift, weights_perm,
                window_shape, levels, cell_sizes, p0.num_bins, dims,
                tuple(r_idx), tuple(l_idx),
                faces_per_step=faces_per_step, g_unroll=g_unroll,
                quantize=quantize)
            return out + shift

        @jax.jit
        def run_fused(images, faceboxes, image_indices=None):
            boxes = jnp.asarray(faceboxes, jnp.float32)
            images = jnp.asarray(images)
            x0_img = align_mean(mean[None, :], boxes)
            if _frames_path_ok(images):
                return _run_frames(images, boxes, x0_img, image_indices)
            windows, ox, oy = crop_fn(images, boxes, image_indices)
            shift = rows_shift(ox, oy, n_lm)
            out = detect_cascade_fused(
                windows, x0_img - shift, weights_perm, levels, cell_sizes,
                p0.num_bins, dims, tuple(r_idx), tuple(l_idx),
                faces_per_step=faces_per_step, g_unroll=g_unroll,
                quantize=quantize)
            return out + shift

        @jax.jit
        def run_fused_from_landmarks(images, prior_rows, image_indices=None):
            # tracking init (model.hpp:147-157): x0 = the prior frame's
            # landmark row; the roi window is centred on its enclosing box
            rows = jnp.asarray(prior_rows, jnp.float32)
            images = jnp.asarray(images)
            xs, ys = rows[:, :n_lm], rows[:, n_lm:]
            boxes = jnp.stack([
                (xs.min(1) + xs.max(1)) / 2.0 - roi / 2.0,
                (ys.min(1) + ys.max(1)) / 2.0 - roi / 2.0,
                jnp.full(rows.shape[:1], float(roi)),
                jnp.full(rows.shape[:1], float(roi))], axis=1)
            if _frames_path_ok(images):
                return _run_frames(images, boxes, rows, image_indices)
            windows, ox, oy = crop_fn(images, boxes, image_indices)
            shift = rows_shift(ox, oy, n_lm)
            out = detect_cascade_fused(
                windows, rows - shift, weights_perm, levels, cell_sizes,
                p0.num_bins, dims, tuple(r_idx), tuple(l_idx),
                faces_per_step=faces_per_step, g_unroll=g_unroll,
                quantize=quantize)
            return out + shift

        return (run_fused_from_landmarks if init == "landmarks"
                else run_fused)

    def make_fused_tracker(self, roi: int,
                           max_ied: Optional[float] = None):
        """Fused whole-cascade fit initialised from prior landmark rows:
        ``f(frames (N, H, W), prior_rows (N, 2L)) -> (N, 2L)`` — the
        video tracking loop (reference: model.hpp:147-157) at the fused
        kernel's batch-1 latency (scripts/bench_latency.py)."""
        return self.make_fused_detector(roi, max_ied=max_ied,
                                        init="landmarks")

    def make_fused_track_stream(self, roi: int,
                                max_ied: Optional[float] = None,
                                chunk: int = 1,
                                depth: Optional[int] = None):
        """Pipelined per-frame tracking over a frame iterable: returns
        ``stream(frames, facebox) -> iterator of (2L,) numpy rows``, one
        per frame in order.

        The reference's tracking loop prints per-frame fit latency as its
        own metric (rcr-track.cpp:146-166). The naive loop pays a
        synchronous host readback (~25-30 ms RTT on a remote/tunneled
        backend) per frame for a ~0.1 ms device fit — but the loop's
        only true inter-frame dependency (frame N+1 initialises from
        frame N's landmark row, model.hpp:147-157) lives ON DEVICE, so
        frame N+1's fit is dispatched from the device-resident row
        BEFORE frame N's row is read back: the readback RTT overlaps the
        next frame's upload + fit, and a streaming loop pays
        ~max(RTT, upload + fit) per frame instead of their sum — the
        same one-in-flight scheme as HaarCascadeDetector.detect_stream
        (models/facedetect.py).

        The first frame initialises from ``facebox`` (align_mean, the
        detect overload, model.hpp:132-144); every later frame from its
        predecessor's device row. Frames may be (H, W) numpy arrays or
        device-resident jax.Arrays (pass device arrays to skip the
        synchronous per-frame upload). For loss detection + facebox
        re-init, drive the two fits directly with the same lag-one
        pattern (apps/rcr_track.py does).

        ``chunk`` amortises the readback RTT: with a ~0.1 ms device fit,
        per-frame wall is ONE readback RTT no matter how the lag-one
        loop is arranged (measured: seq and lag-one pipelining both
        ~26.7 ms/frame device-resident over the ~25 ms tunnel —
        scripts/probe_track.py), so the only way past the RTT wall is
        reading MORE THAN ONE row per round trip. chunk=K concatenates
        K device rows (one jitted op) and reads them back in one
        transfer, overlapped with the NEXT K fits — per-frame cost
        tends to ``(fit + dispatch) + RTT/K``. Landmark rows are
        bit-identical to chunk=1 (the on-device row chain is untouched);
        the only semantic change is DELIVERY LAG — rows arrive in bursts
        of K, up to 2K-1 frames behind the dispatch front. Use chunk=1
        (default) for interactive per-frame consumers, chunk=8-16 for
        offline video sweeps.

        ``depth`` selects the ASYNC-WINDOW alternative (mutually
        exclusive with chunk>1): every fit's row starts a
        ``copy_to_host_async`` at dispatch and is collected exactly D
        frames later — measured (scripts/probe_async_readback.py) D
        independent in-flight transfers pipeline over the tunnel at
        ~RTT/D per row (16.3x at D=16), so per-frame cost matches
        chunk~2D while delivery is SMOOTH (one row per frame, fixed
        D-frame lag, no 2K-1 bursts) and no gather op is dispatched."""
        if chunk < 1:
            raise ValueError(f"chunk must be >= 1, got {chunk}")
        if depth is not None and (depth < 1 or chunk > 1):
            raise ValueError("depth requires chunk=1 and depth >= 1, "
                             f"got depth={depth}, chunk={chunk}")
        detector = self.make_fused_detector(roi, max_ied=max_ied)
        tracker = self.make_fused_tracker(roi, max_ied=max_ied)
        gather = jax.jit(lambda *rows: jnp.concatenate(rows, axis=0))

        def stream_depth(frames, facebox):
            import collections
            box = np.asarray(facebox, np.float32)[None]
            prev = None
            window = collections.deque()   # rows with readback in flight
            for frame in frames:
                img = (frame if isinstance(frame, jax.Array)
                       else jnp.asarray(np.asarray(frame)))
                if img.ndim == 2:
                    img = img[None]
                cur = detector(img, box) if prev is None \
                    else tracker(img, prev)
                prev = cur
                cur.copy_to_host_async()
                window.append(cur)
                if len(window) > depth:
                    yield np.asarray(window.popleft())[0]
            while window:
                yield np.asarray(window.popleft())[0]

        if depth is not None:
            return stream_depth

        def stream(frames, facebox):
            box = np.asarray(facebox, np.float32)[None]
            prev = None      # previous frame's device row (1, 2L)
            pend = []        # device rows not yet in a flush, oldest first
            flushing = None  # device (chunk, 2L) batch awaiting readback
            for frame in frames:
                img = (frame if isinstance(frame, jax.Array)
                       else jnp.asarray(np.asarray(frame)))
                if img.ndim == 2:
                    img = img[None]
                cur = detector(img, box) if prev is None \
                    else tracker(img, prev)
                prev = cur
                pend.append(cur)
                if len(pend) >= chunk:
                    batch_dev = pend[0] if chunk == 1 else gather(*pend)
                    pend = []
                    # read the PREVIOUS flush now: its transfer overlaps
                    # the chunk of fits dispatched since it was issued
                    if flushing is not None:
                        for row in np.asarray(flushing):
                            yield row
                    flushing = batch_dev
            if flushing is not None:
                for row in np.asarray(flushing):
                    yield row
            # tail shorter than chunk: read rows individually (a fresh
            # gather shape would cost a stray compile for < chunk rows)
            for r in pend:
                yield np.asarray(r)[0]

        return stream

    def make_fused_track_scan(self, roi: int,
                              max_ied: Optional[float] = None):
        """Whole-clip tracking as ONE compiled program:
        ``f(frames (N, H, W), facebox (4,)) -> (N, 2L)`` — frame 0 fits
        from the facebox (the detect overload, model.hpp:132-144), every
        later frame initialises from its predecessor's row
        (model.hpp:147-157) via a ``lax.scan`` whose carry is the
        device-resident landmark row.

        This is the offline-sweep speed-of-light: the host dispatches
        ONE program and reads back ONE (N, 2L) array per clip, so
        neither the per-frame Python dispatch (~3 ms over a tunnel) nor
        any readback RTT appears in the loop — against the streaming
        path's ~RTT/D floor (make_fused_track_stream). Rows match the
        sequential detector/tracker chain exactly (the scan body IS the
        tracker's traced fn; CPU test). Frames must share one shape;
        pass uint8 (32, 128)-aligned stacks to ride the in-kernel-crop
        frames path. No loss detection — it is a fixed-length scan; run
        loss checks on the returned rows host-side if needed."""
        tracker = self.make_fused_tracker(roi, max_ied=max_ied)
        detector = self.make_fused_detector(roi, max_ied=max_ied)

        @jax.jit
        def run(frames, facebox):
            row0 = detector(frames[:1], jnp.asarray(
                facebox, jnp.float32)[None])            # (1, 2L)

            def step(carry, frame):
                row = tracker(frame[None], carry)
                return row, row[0]

            _, rows = jax.lax.scan(step, row0, frames[1:])
            return jnp.concatenate([row0, rows], axis=0)

        return run

    def make_scan_detector(self, batch: int, quantize: bool = True):
        """Whole-cascade detector whose levels run as ONE ``lax.scan``
        body over the stacked weights (core/cascade.py::weight_stack) —
        the XLA graph holds a single level body instead of R unrolled
        copies, shrinking compile time for the monolithic path.

        Requires every cascade level to share its HOG configuration: the
        scan body must be shape-uniform, and per-level params change the
        static patch/cell sizes. The shipped RCR-22 config is
        heterogeneous (cell_size 11/10/8/6, rcr-train.cpp:447), so it
        CANNOT scan — use make_stepped_detector there (four small
        programs). This entry point serves uniform-config models and is
        the measured basis for the scan-vs-unrolled compile-time study
        (scripts/bench_scan_compile.py, docs/PERF_NOTES.md).
        """
        if len({(p.variant, p.num_cells, p.cell_size, p.num_bins,
                 p.relative_patch_size) for p in self.hog_params}) != 1:
            raise ValueError(
                "make_scan_detector requires uniform per-level HOG params "
                "(the scan body must be shape-uniform); this model's "
                "levels differ — use make_stepped_detector")
        w_stack = self.sdo.weight_stack            # (R, F, 2L)
        if not isinstance(w_stack, jnp.ndarray):
            raise ValueError("levels have differing weight shapes")
        idx = jnp.arange(batch, dtype=jnp.int32)
        mean = jnp.asarray(self.mean)

        def run(images, faceboxes):
            hog = self._hog(images, image_indices=idx, quantize=quantize)
            x0 = align_mean(mean[None, :],
                            jnp.asarray(faceboxes, jnp.float32))

            def body(x, w):
                observed = hog(x, 0)               # uniform params: any level
                norm = self.sdo.normalisation(x)
                update = jnp.dot(observed, w,
                                 precision=jax.lax.Precision.HIGHEST,
                                 preferred_element_type=jnp.float32)
                return x - update / norm, None

            x, _ = jax.lax.scan(body, x0, w_stack)
            return x
        return jax.jit(run)

    # -------------------------------------------------------------- #
    # Persistence (cereal byte-compatible + native)
    # -------------------------------------------------------------- #
    def to_cereal(self) -> CerealDetectionModel:
        regs = []
        for r in self.sdo.regressors:
            reg = r.regulariser
            regs.append(CerealRegressor(
                weights=np.asarray(r.weights, np.float32),
                regularisation_type=int(reg.regularisation_type),
                lambda_=float(reg.param),
                regularise_last_row=bool(reg.regularise_last_row)))
        return CerealDetectionModel(
            regressors=regs,
            norm_model_landmarks=self.landmark_ids,
            norm_right_eye_ids=self.right_eye_ids,
            norm_left_eye_ids=self.left_eye_ids,
            mean=self.mean,
            landmark_ids=self.landmark_ids,
            hog_params=[CerealHoGParam(int(p.variant), p.num_cells,
                                       p.cell_size, p.num_bins,
                                       p.relative_patch_size)
                        for p in self.hog_params],
            right_eye_ids=self.right_eye_ids,
            left_eye_ids=self.left_eye_ids)

    @classmethod
    def from_cereal(cls, cm: CerealDetectionModel) -> "DetectionModel":
        regressors = []
        for cr in cm.regressors:
            # weights stay HOST numpy at rest: jnp/jit consumers accept
            # them as-is (closed over as constants / uploaded per call),
            # while an eager device upload here would make every later
            # host-side read (e.g. the fused detector's weight
            # permutation) a device->HOST round trip — measured 50-180 s
            # of pure tunnel readback per process for the 4-level RCR-22
            # weights before this was fixed (docs/PERF_NOTES.md
            # "Process-preamble anatomy")
            regressors.append(LinearRegressor(
                weights=np.asarray(cr.weights, np.float32),
                regulariser=Regulariser(
                    RegularisationType(cr.regularisation_type),
                    cr.lambda_, cr.regularise_last_row)))
        norm = InterEyeDistanceNormalisation(
            cm.norm_model_landmarks, cm.norm_right_eye_ids,
            cm.norm_left_eye_ids)
        sdo = SupervisedDescentOptimiser(regressors, norm)
        hog_params = tuple(HogParams(HogVariant(p.vlhog_variant), p.num_cells,
                                     p.cell_size, p.num_bins,
                                     p.relative_patch_size)
                           for p in cm.hog_params)
        return cls(sdo, cm.mean, cm.landmark_ids, hog_params,
                   cm.right_eye_ids, cm.left_eye_ids)

    def save(self, filename):
        """Write the reference-compatible cereal binary format."""
        _save_cereal(self.to_cereal(), filename)

    @classmethod
    def load(cls, filename) -> "DetectionModel":
        return cls.from_cereal(_load_cereal(filename))


def level_sub_windows(hog_params: Sequence[HogParams], roi: int,
                      max_ied: float):
    """Per-level window-sampler sub-window sides (W rows, WX columns) for
    a given ROI and IED bound — the single source of the serving/profiling
    sub-window sizing (see ops/patches_pallas.py for the fit invariants).

    Returns (sub_windows, sub_windows_x); a WX of 0 means full width.
    Lane (column) sub-windows carry a 128-px alignment margin, so WX only
    shrinks below the ROI for moderate max_ied — still worth it: the
    sampling dots scale with WX.

    Lane sub-windows are only enabled when ``roi`` is a multiple of 128:
    the sampler requires the window width RX to be lane-aligned whenever a
    column sub-window is active (ops/patches_pallas.py fit invariants), and
    the square-crop serving path produces RX == roi. A non-128-aligned roi
    simply falls back to full-width sampling (sub_x all 0) instead of
    tripping the kernel's alignment check.
    """
    from superviseddescent_tpu.ops.patches_pallas import (
        min_sub_window, min_sub_window_x)
    sub = tuple(
        min(roi, min_sub_window(p.relative_patch_size * max_ied + 2))
        for p in hog_params)
    if roi % 128 != 0:
        return sub, (0,) * len(sub)
    sub_x = tuple(
        (lambda v: 0 if v >= roi else v)(
            min_sub_window_x(p.relative_patch_size * max_ied + 2))
        for p in hog_params)
    return sub, sub_x


def gt_facebox(landmarks: LandmarkCollection, margin: float = 0.2,
               square: bool = True):
    """Derive a facebox from ground-truth landmarks (for training/eval when
    no face detector is wired in — the reference's OpenCV Haar cascade is an
    external dependency, outside library scope per SURVEY.md §3.2)."""
    c = landmarks.coordinates
    x0, y0 = c.min(axis=0)
    x1, y1 = c.max(axis=0)
    w, h = x1 - x0, y1 - y0
    if square:
        side = max(w, h) * (1.0 + margin)
        cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
        return (float(cx - side / 2), float(cy - side / 2),
                float(side), float(side))
    return (float(x0 - w * margin / 2), float(y0 - h * margin / 2),
            float(w * (1 + margin)), float(h * (1 + margin)))
