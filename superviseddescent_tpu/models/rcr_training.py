"""RCR training pipeline: perturbation augmentation, metrics, orchestration.

Rebuild of the reference rcr-train app's training logic
(/root/reference/apps/rcr/rcr-train.cpp:119-212, 383-461) with explicit PRNG
keys (the reference seeds from std::random_device and is unreproducible —
SURVEY.md §4 nondeterminism note).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from superviseddescent_tpu.core.cascade import SupervisedDescentOptimiser
from superviseddescent_tpu.core.regressor import LinearRegressor
from superviseddescent_tpu.core.regulariser import Regulariser, RegularisationType
from superviseddescent_tpu.models.rcr import (
    DetectionModel, HogParams, HogTransform, InterEyeDistanceNormalisation,
    RCR22_HOG_PARAMS, align_mean,
)
from superviseddescent_tpu.utils.landmarks import ied_from_rows, resolve_eye_indices


def perturb_facebox(facebox, translation_x, translation_y, scaling=1.0):
    """Perturb a facebox, keeping its center fixed under scaling.

    tx/ty are fractions of box width/height (reference: rcr-train.cpp:130-146).
    facebox and outputs are (..., 4) [x, y, w, h] float arrays.
    """
    fb = jnp.asarray(facebox, jnp.float32)
    x, y, w, h = fb[..., 0], fb[..., 1], fb[..., 2], fb[..., 3]
    tx_px = translation_x * w
    ty_px = translation_y * h
    pw = w * scaling
    ph = h * scaling
    nx = x + (w - pw) / 2.0 + tx_px
    ny = y + (h - ph) / 2.0 + ty_px
    return jnp.stack([nx, ny, pw, ph], axis=-1)


def augment_initialisations(mean, faceboxes, key,
                            num_perturbations: int = 10,
                            sigma_translation: float = 0.04,
                            sigma_scale: float = 0.04,
                            sigma_rotation: float = 0.0):
    """Perturbation augmentation: per facebox, the original plus
    `num_perturbations` randomly perturbed boxes, each aligned with the mean
    (reference: rcr-train.cpp:386-434; tx,ty ~ N(0, 0.04), s ~ N(1, 0.04)).

    sigma_rotation (radians) goes beyond the reference's translation/scale
    jitter: each perturbed initialisation is additionally rotated about its
    own centroid by theta ~ N(0, sigma_rotation). Faceboxes are
    axis-aligned, so an in-plane-rotated face yields an initialisation the
    cascade must de-rotate — training with rotated initialisations teaches
    that correction (measured on the leave-one-identity-out synthetic
    protocol, whose faces carry +-12 deg warps; docs/PERF_NOTES.md).
    The default 0.0 reproduces the reference augmentation bit-for-bit.

    Args:
      mean: (2L,) mean shape in facebox space.
      faceboxes: (B, 4).
      key: jax PRNG key.

    Returns:
      (x0, sample_to_box): x0 is (B*(P+1), 2L) initialisations; sample_to_box
      maps each row to its source facebox index (use it to replicate ground
      truth rows and image indices). The original box comes first per group,
      like the reference.
    """
    faceboxes = jnp.asarray(faceboxes, jnp.float32)
    b = faceboxes.shape[0]
    p = num_perturbations
    if sigma_rotation > 0.0:
        k_t, k_s, k_r = jax.random.split(key, 3)
    else:
        k_t, k_s = jax.random.split(key)
    trans = jax.random.normal(k_t, (b, p, 2)) * sigma_translation
    scale = 1.0 + jax.random.normal(k_s, (b, p)) * sigma_scale

    perturbed = perturb_facebox(faceboxes[:, None, :],
                                trans[..., 0], trans[..., 1], scale)  # (B,P,4)
    all_boxes = jnp.concatenate([faceboxes[:, None, :], perturbed],
                                axis=1)                               # (B,P+1,4)
    x0 = align_mean(jnp.asarray(mean)[None, None, :], all_boxes)      # (B,P+1,2L)
    if sigma_rotation > 0.0:
        # rotate each PERTURBED copy about its centroid; copy 0 (the
        # unperturbed box, like the reference) stays unrotated
        theta = jnp.concatenate([
            jnp.zeros((b, 1)),
            jax.random.normal(k_r, (b, p)) * sigma_rotation], axis=1)
        l = x0.shape[-1] // 2
        xs, ys = x0[..., :l], x0[..., l:]
        cx = xs.mean(axis=-1, keepdims=True)
        cy = ys.mean(axis=-1, keepdims=True)
        ca = jnp.cos(theta)[..., None]
        sa = jnp.sin(theta)[..., None]
        dx, dy = xs - cx, ys - cy
        x0 = jnp.concatenate([cx + dx * ca - dy * sa,
                              cy + dx * sa + dy * ca], axis=-1)
    x0 = x0.reshape(b * (p + 1), -1)
    sample_to_box = jnp.repeat(jnp.arange(b, dtype=jnp.int32), p + 1)
    return x0, sample_to_box


def normalised_landmark_errors(predictions, groundtruth,
                               right_idx: Tuple[int, ...],
                               left_idx: Tuple[int, ...]):
    """Per-landmark L2 error normalised by the IED of the *prediction*
    (reference: rcr-train.cpp:200-212). Returns (N, L)."""
    pred = jnp.asarray(predictions)
    gt = jnp.asarray(groundtruth)
    l = pred.shape[-1] // 2
    dx = pred[..., :l] - gt[..., :l]
    dy = pred[..., l:] - gt[..., l:]
    norms = jnp.sqrt(dx * dx + dy * dy)
    ied = ied_from_rows(pred, right_idx, left_idx)
    return norms / ied[..., None]


@dataclass
class RcrTrainConfig:
    """Hyperparameters of the reference rcr-train main()
    (rcr-train.cpp:387-447), surfaced as config instead of hardcoded."""
    hog_params: Sequence[HogParams] = RCR22_HOG_PARAMS
    regularisation: Regulariser = Regulariser(
        RegularisationType.MatrixNorm, 1.5, regularise_last_row=False)
    num_perturbations: int = 10
    sigma_translation: float = 0.04
    sigma_scale: float = 0.04
    # in-plane rotation jitter (radians) on the perturbed initialisations —
    # beyond the reference's translation/scale augmentation; 0.0 keeps the
    # reference behaviour exactly (augment_initialisations docstring)
    sigma_rotation: float = 0.0
    seed: int = 0
    solver_method: str = "lu"
    quantize_patches: bool = True
    # chunk the per-level feature extraction (lax.map) — required for
    # 300-W-scale sample counts; None = single block
    feature_chunk_size: Optional[int] = None
    # crop a fixed ROI window per face (host-side, before augmentation) and
    # train against the windows: device memory and sampling cost scale with
    # roi^2 instead of the full image area. Exact as long as every landmark
    # patch stays inside the window (~1.6x the largest facebox side, like
    # the detectors' roi).
    roi: Optional[int] = None
    # patch sampling backend for feature extraction (None = auto: dense on
    # TPU / gather on CPU; 'window' = the Pallas window-resident sampler,
    # requires roi). sampling: 'exact' | 'high' | 'fast' MXU precision.
    patch_backend: Optional[str] = None
    sampling: str = "exact"
    # bf16 fast mode for the Pallas HOG kernel during feature extraction
    # (~0.4% descriptor noise — same class as sampling='fast'); with the
    # window backend it also enables the transposed sampler->HOG hand-off
    hog_fast: bool = False
    # horizontal-flip augmentation: double the training set with mirrored
    # images + mirror-permuted ground truth (utils/landmarks.py::
    # mirror_permutation — the landmark-level twin of the reference's HOG
    # flip permutation, hog.c:233-268; the reference's own accuracy lever
    # beyond facebox perturbation, rcr-train.cpp:386-434)
    mirror_augmentation: bool = False


def _crop_face_windows(images, image_indices, faceboxes, roi):
    """Per-face ROI crop, on device (dtype-preserving; uint8 stays uint8).

    The image stack is transferred once (it is small — a few unique
    images); the (B, roi, roi) window stack is materialised by a jitted
    batched dynamic_slice so it never exists host-side nor crosses the
    host->device link (at 300-W scale that link transfer plus a Python
    crop loop used to dominate the level-0 wall time).

    Returns (windows (B, roi, roi) jax array, per-face origins (B, 2)
    [ox, oy] numpy). Origins are clamped inside each image, preserving
    the zero-pad border semantics of the full stack.
    """
    images = jnp.asarray(images)
    h, w = images.shape[1], images.shape[2]
    if h < roi or w < roi:
        raise ValueError(f"roi {roi} exceeds the image stack {h}x{w}")
    boxes = np.asarray(faceboxes, np.float32)
    cx = boxes[:, 0] + boxes[:, 2] / 2.0
    cy = boxes[:, 1] + boxes[:, 3] / 2.0
    ox = np.clip(np.round(cx - roi / 2.0), 0, w - roi).astype(np.int32)
    oy = np.clip(np.round(cy - roi / 2.0), 0, h - roi).astype(np.int32)
    idx = np.asarray(image_indices, np.int32)

    @jax.jit
    def crop(stack, idx, oy, ox):
        return jax.vmap(
            lambda i, y0, x0: jax.lax.dynamic_slice(
                stack, (i, y0, x0), (1, roi, roi))[0])(idx, oy, ox)

    windows = crop(images, jnp.asarray(idx), jnp.asarray(oy),
                   jnp.asarray(ox))
    return windows, np.stack([ox, oy], axis=1).astype(np.float32)


def train_rcr(images, groundtruth_rows, faceboxes,
              model_landmarks: Sequence[str],
              right_eye_ids: Sequence[str],
              left_eye_ids: Sequence[str],
              mean,
              config: RcrTrainConfig = RcrTrainConfig(),
              image_indices=None,
              on_epoch=None,
              checkpointer=None,
              mesh=None) -> DetectionModel:
    """Train an RCR detection model (the rcr-train pipeline, stack §3.3).

    Args:
      images: (I, H, W) float32 zero-padded gray stack.
      groundtruth_rows: (B, 2L) ground-truth landmark rows (one per kept
        face/image).
      faceboxes: (B, 4) faceboxes for the mean-shape initialisation.
      model_landmarks / eye ids: landmark naming + IED definition.
      mean: (2L,) mean shape (already reduced to the model landmarks).
      image_indices: (B,) map face -> image in the stack (default arange).
      on_epoch: optional callback(current_predictions) per cascade level.
      checkpointer: optional io.checkpoint.TrainCheckpointer. Each level's
        weights + estimates are persisted when its solve completes, and a
        restarted call resumes from the last completed level (a capability
        the reference lacks — its weights live only in memory until the
        final save, SURVEY.md §5).
      mesh: optional jax.sharding.Mesh with a "data" axis. The augmented
        sample axis is sharded over it: feature extraction partitions via
        GSPMD, and each level's learn becomes psum-reduced partial normal
        equations + a replicated solve
        (parallel/dist.py::distributed_train_level — the SURVEY §5
        communication pattern). The batch is zero-row-padded to divide the
        mesh, which leaves AtA/Atb and the MatrixNorm lambda exactly
        unchanged, so the trained weights match the single-device result
        up to psum summation order.

    Returns a trained DetectionModel.
    """
    gt = jnp.asarray(groundtruth_rows, jnp.float32)
    b = gt.shape[0]
    if image_indices is None:
        image_indices = jnp.arange(b, dtype=jnp.int32)
    else:
        image_indices = jnp.asarray(image_indices, jnp.int32)

    if config.mirror_augmentation:
        # double the set with horizontally flipped copies: flipped image
        # i+n_img is images[i] mirrored; its ground truth is the mirror-
        # permuted row reflected about the (padded) stack width. The
        # flipped stack's left-side zero padding behaves exactly like the
        # reference's copyMakeBorder zero pad for border patches.
        from superviseddescent_tpu.utils.landmarks import mirror_permutation
        perm = mirror_permutation(model_landmarks)
        imgs = jnp.asarray(images)
        n_img, _, wpx = imgs.shape
        lm = gt.shape[1] // 2
        images = jnp.concatenate([imgs, imgs[:, :, ::-1]])
        gt_flip = jnp.concatenate(
            [(wpx - 1.0) - gt[:, :lm][:, perm], gt[:, lm:][:, perm]],
            axis=1)
        gt = jnp.concatenate([gt, gt_flip])
        fb = jnp.asarray(faceboxes, jnp.float32)
        faceboxes = jnp.concatenate([
            fb, jnp.stack([wpx - fb[:, 0] - fb[:, 2], fb[:, 1],
                           fb[:, 2], fb[:, 3]], axis=1)])
        image_indices = jnp.concatenate(
            [image_indices, image_indices + n_img])
        b = gt.shape[0]

    l = gt.shape[1] // 2
    sample_shift = None
    frame_table = frame_window = None
    images = jnp.asarray(images)
    if config.roi is not None and config.patch_backend == "fused":
        # frames mode (in-kernel window crop): eligible whenever the
        # fused detect frames path is (uint8 stack, lane-aligned width,
        # ops/cascade_pallas.py::extract_features_fused_frames) — the
        # per-sample window stack is never gathered/materialised
        from superviseddescent_tpu.ops.cascade_pallas import (
            FRAME_COL_ALIGN, FRAME_ROW_ALIGN)
        h, w = int(images.shape[1]), int(images.shape[2])
        # eligibility additionally requires (ADVICE r3): a grain-aligned
        # roi (a non-128 roi would make rx_w/the clip bound unaligned and
        # the uint8 window DMA width untiled) and grain-aligned stack
        # dims (so the clamp below cannot strip the one-grain slack from
        # bottom/right-edge faces) — otherwise fall back to the windows-
        # based fused path, which is exact for any shape
        if (images.dtype == jnp.uint8
                and config.roi % FRAME_COL_ALIGN == 0
                and w % FRAME_COL_ALIGN == 0
                and h % FRAME_ROW_ALIGN == 0
                and h >= config.roi and w >= config.roi):
            roi = config.roi
            ry_w = roi + (FRAME_ROW_ALIGN if h >= roi + FRAME_ROW_ALIGN
                          else 0)
            rx_w = roi + (FRAME_COL_ALIGN if w >= roi + FRAME_COL_ALIGN
                          else 0)
            boxes = np.asarray(faceboxes, np.float32)
            cx = boxes[:, 0] + boxes[:, 2] / 2.0
            cy = boxes[:, 1] + boxes[:, 3] / 2.0
            # FLOOR first, then clamp to the (aligned) bound — the same
            # order as models/rcr.py::_aligned_origins (ADVICE r3)
            oy = np.clip(np.round(cy - roi / 2.0).astype(np.int32)
                         // FRAME_ROW_ALIGN * FRAME_ROW_ALIGN,
                         0, h - ry_w)
            ox = np.clip(np.round(cx - roi / 2.0).astype(np.int32)
                         // FRAME_COL_ALIGN * FRAME_COL_ALIGN,
                         0, w - rx_w)
            idx_cl = np.clip(np.asarray(image_indices, np.int32),
                             0, images.shape[0] - 1)
            frame_table = (jnp.asarray(idx_cl, jnp.int32),
                           jnp.asarray(oy), jnp.asarray(ox))
            frame_window = (ry_w, rx_w)
            origins = np.stack([ox, oy], axis=1).astype(np.float32)
            # everything below runs in each face's ALIGNED-window
            # coordinates (the kernel samples relative to the aligned
            # origin); callbacks translate back to image coordinates
            shift_rows = jnp.concatenate(
                [jnp.tile(jnp.asarray(origins[:, :1]), (1, l)),
                 jnp.tile(jnp.asarray(origins[:, 1:2]), (1, l))], axis=1)
            gt = gt - shift_rows
            faceboxes = jnp.asarray(faceboxes, jnp.float32
                                    ).at[:, :2].add(-jnp.asarray(origins))
            # HogTransform's image_indices become sample -> FACE (table
            # row); the table maps face -> (frame, oy, ox)
            image_indices = jnp.arange(b, dtype=jnp.int32)
    if config.roi is not None and frame_table is None:
        # train against per-face windows: everything below runs in window
        # coordinates (HOG features are invariant to the shared shift);
        # callbacks translate back to image coordinates
        images, origins = _crop_face_windows(
            images, image_indices, faceboxes, config.roi)
        shift_rows = jnp.concatenate(
            [jnp.tile(jnp.asarray(origins[:, :1]), (1, l)),
             jnp.tile(jnp.asarray(origins[:, 1:2]), (1, l))], axis=1)
        gt = gt - shift_rows
        faceboxes = jnp.asarray(faceboxes, jnp.float32
                                ).at[:, :2].add(-jnp.asarray(origins))
        image_indices = jnp.arange(b, dtype=jnp.int32)

    key = jax.random.PRNGKey(config.seed)
    x0, sample_to_box = augment_initialisations(
        mean, faceboxes, key,
        num_perturbations=config.num_perturbations,
        sigma_translation=config.sigma_translation,
        sigma_scale=config.sigma_scale,
        sigma_rotation=config.sigma_rotation)
    x_gt = gt[sample_to_box]
    sample_image_indices = image_indices[sample_to_box]
    if config.roi is not None:
        sample_shift = shift_rows[sample_to_box]

    n_real = x0.shape[0]
    learn_fn = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from superviseddescent_tpu.parallel.dist import (
            distributed_train_level)
        n_dev = int(np.prod(list(mesh.shape.values())))
        pad = (-n_real) % n_dev
        if pad:
            # zero-feature rows contribute nothing to AtA/Atb (masked in
            # learn_fn below); x rows are copies of row 0 so the feature
            # extraction stays on valid coordinates
            x0 = jnp.concatenate([x0, jnp.tile(x0[:1], (pad, 1))])
            x_gt = jnp.concatenate([x_gt, jnp.tile(x_gt[:1], (pad, 1))])
            sample_image_indices = jnp.concatenate(
                [sample_image_indices,
                 jnp.tile(sample_image_indices[:1], (pad,))])
        row_sharding = NamedSharding(mesh, P("data", None))
        batch_sharding = NamedSharding(mesh, P("data"))
        x0 = jax.device_put(x0, row_sharding)
        x_gt = jax.device_put(x_gt, row_sharding)
        sample_image_indices = jax.device_put(sample_image_indices,
                                              batch_sharding)
        images = jax.device_put(jnp.asarray(images),
                                NamedSharding(mesh, P()))  # replicated
        valid = jax.device_put(
            (jnp.arange(n_real + pad) < n_real).astype(jnp.float32),
            batch_sharding)

        def learn_fn(regressor, observed, b_rows, level):
            w = distributed_train_level(
                observed * valid[:, None], b_rows * valid[:, None],
                regressor.regulariser, mesh, method=regressor.method,
                num_samples=n_real)
            return LinearRegressor(weights=w,
                                   regulariser=regressor.regulariser,
                                   method=regressor.method)

    sub_windows = sub_windows_x = None
    if config.patch_backend in ("window", "fused"):
        if config.roi is None:
            raise ValueError(
                f"patch_backend={config.patch_backend!r} requires config.roi")
        from superviseddescent_tpu.models.rcr import level_sub_windows
        from superviseddescent_tpu.utils.landmarks import resolve_eye_indices as _rei
        ri, li = _rei(model_landmarks, right_eye_ids, left_eye_ids)
        max_ied = float(jnp.max(ied_from_rows(gt, ri, li)))
        # 1.4x margin: intermediate estimates can have a larger IED than
        # the ground truth; beyond it the sampler clamps gracefully
        sub_windows, sub_windows_x = level_sub_windows(
            config.hog_params, config.roi, 1.4 * max_ied)
        images = jnp.asarray(images)
        if images.dtype == jnp.uint8 and frame_table is None:
            # pre-cast once: the pallas sampler cannot consume uint8, and
            # bf16 is lossless for 0..255 gray pixels (frames mode keeps
            # uint8 — the kernel casts in-VMEM after the window DMA)
            target = (jnp.bfloat16 if config.sampling == "fast"
                      else jnp.float32)
            images = images.astype(target)

    hog = HogTransform(images, config.hog_params, model_landmarks,
                       right_eye_ids, left_eye_ids,
                       image_indices=sample_image_indices,
                       quantize=config.quantize_patches,
                       chunk_size=config.feature_chunk_size,
                       patch_backend=config.patch_backend,
                       sub_windows=sub_windows,
                       sub_windows_x=sub_windows_x,
                       sampling=config.sampling,
                       hog_fast=config.hog_fast,
                       frame_table=frame_table,
                       frame_window=frame_window)
    if mesh is not None and hog.patch_method in ("window", "fused"):
        # Pallas extraction kernels are GSPMD-opaque: under plain jit
        # they would replicate rather than split over the mesh. Wrap the
        # extraction in an explicit per-shard shard_map (images/frame
        # table replicated, x/indices batch-sharded) so mesh training
        # composes with the memory-scalable backends (VERDICT r3 item 5).
        from superviseddescent_tpu.parallel.dist import ShardedHogTransform
        hog = ShardedHogTransform(hog, mesh)
    norm = InterEyeDistanceNormalisation(model_landmarks, right_eye_ids,
                                         left_eye_ids)
    regressors = [LinearRegressor(regulariser=config.regularisation,
                                  method=config.solver_method)
                  for _ in config.hog_params]
    sdo = SupervisedDescentOptimiser(regressors, norm)

    def _unpad(current_x):
        return current_x[:n_real] if current_x.shape[0] != n_real else current_x

    def _to_caller(current_x):
        """Callback view: unpadded, and back in image coordinates."""
        current_x = _unpad(current_x)
        if sample_shift is not None:
            current_x = current_x + sample_shift
        return current_x

    start_level = 0
    if checkpointer is not None:
        # fused-backend levels are solved (and checkpointed) in the
        # kernel's compact feature order; tag each level so a resume
        # under a different backend — or a changed kernel order — fails
        # loudly instead of scrambling weight rows
        if config.patch_backend == "fused":
            from superviseddescent_tpu.ops.cascade_pallas import (
                KERNEL_FEATURE_ORDER as _ckpt_order)
        else:
            _ckpt_order = "std"
        start_level = min(checkpointer.completed_levels(),
                          len(config.hog_params))
        for lvl in range(start_level):
            w, x_restored = checkpointer.load_level(
                lvl, expect_order=_ckpt_order)
            sdo.regressors[lvl] = LinearRegressor(
                weights=jnp.asarray(w),
                regulariser=config.regularisation,
                method=config.solver_method)
            x_restored = jnp.asarray(x_restored)
            if mesh is not None:
                if x_restored.shape[0] != x0.shape[0]:
                    x_restored = jnp.concatenate(
                        [x_restored,
                         jnp.tile(x_restored[:1],
                                  (x0.shape[0] - x_restored.shape[0], 1))])
                x_restored = jax.device_put(x_restored, row_sharding)
            x0 = x_restored

        level_counter = [start_level]

        def _on_epoch_with_ckpt(current_x):
            lvl = level_counter[0]
            checkpointer.save_level(
                lvl, sdo.regressors[lvl].weights, _unpad(current_x),
                feature_order=_ckpt_order)
            level_counter[0] += 1
            if on_epoch is not None:
                on_epoch(_to_caller(current_x))
        epoch_cb = _on_epoch_with_ckpt
    elif on_epoch is not None:
        epoch_cb = lambda current_x: on_epoch(_to_caller(current_x))
    else:
        epoch_cb = None

    sdo.train(x_gt, x0, None, hog, on_training_epoch_callback=epoch_cb,
              start_level=start_level, learn_fn=learn_fn)

    if config.patch_backend == "fused":
        # the fused extractor emits features in the kernel's compact
        # column order (bias last); the solves were run in that order, so
        # map each level's weight rows back to the reference's Matlab
        # order before storing them in the model. (Mid-train checkpoints
        # of a fused run hold kernel-order weights; they carry the
        # KERNEL_FEATURE_ORDER tag and load_level enforces it on resume.)
        from superviseddescent_tpu.ops.cascade_pallas import (
            compact_to_standard_rows)
        from superviseddescent_tpu.ops.hog import hog_dimension
        p0 = config.hog_params[0]
        std_rows = compact_to_standard_rows(
            len(model_landmarks), p0.num_cells,
            hog_dimension(p0.variant, p0.num_bins))
        for li, reg in enumerate(sdo.regressors):
            wk = np.asarray(reg.weights)
            w_std = np.empty_like(wk)
            w_std[std_rows] = wk
            sdo.regressors[li] = LinearRegressor(
                weights=jnp.asarray(w_std),
                regulariser=reg.regulariser, method=reg.method)

    return DetectionModel(sdo, mean, list(model_landmarks),
                          tuple(config.hog_params),
                          list(right_eye_ids), list(left_eye_ids))
