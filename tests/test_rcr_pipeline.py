"""End-to-end RCR pipeline tests on the bundled 5-image LFPW set.

Uses a reduced HOG/landmark configuration so the normal-equations solves
stay small on the CPU test backend; the full RCR-22 scale runs on TPU via
bench.py. Exercises: patch extraction parity plumbing, HogTransform, IED
normalisation, perturbation augmentation, cascade training, batched
detection, and cereal round-trip through DetectionModel.
"""

import glob
import os

import numpy as np
import pytest
import jax.numpy as jnp

from superviseddescent_tpu.io import (
    read_pts_landmarks, load_mean, read_landmarks_list_to_train,
    read_ied_definition,
)
from superviseddescent_tpu.models import (
    DetectionModel, HogParams, HogTransform, RcrTrainConfig, align_mean,
    gt_facebox, normalised_landmark_errors, perturb_facebox,
    augment_initialisations, train_rcr,
)
from superviseddescent_tpu.ops.hog import HogVariant
from superviseddescent_tpu.ops.patches import (
    extract_patches, load_gray_image, stack_images,
)
from superviseddescent_tpu.utils.landmarks import (
    resolve_eye_indices, to_landmark_collection, to_row,
)

DATA = "/root/reference/examples/data/ibug_lfpw_trainset"
needs_data = pytest.mark.skipif(not os.path.isdir(DATA),
                                reason="reference data absent")

# a small 10-landmark model for fast CPU tests: eyes, nose, mouth
SMALL_LANDMARKS = ["31", "37", "40", "43", "46", "49", "52", "55", "58", "9"]
RIGHT_EYE = ["37", "40"]
LEFT_EYE = ["43", "46"]
SMALL_HOG = (HogParams(HogVariant.Uoctti, 3, 8, 4, 0.8),
             HogParams(HogVariant.Uoctti, 3, 6, 4, 0.5))


def test_align_mean_formula():
    mean = np.float32([-0.5, 0.5, -0.25, 0.25])   # 2 landmarks
    out = np.asarray(align_mean(mean, np.float32([10, 20, 100, 200])))
    # x' = (mx + 0.5) * w + x ; y' = (my + 0.5) * h + y
    np.testing.assert_allclose(out, [10.0, 110.0, 70.0, 170.0])


def test_perturb_facebox_center_preserved():
    fb = np.float32([0, 0, 100, 100])
    out = np.asarray(perturb_facebox(fb, 0.0, 0.0, 0.5))
    # center stays at (50, 50); size halves
    np.testing.assert_allclose(out, [25, 25, 50, 50])
    out2 = np.asarray(perturb_facebox(fb, 0.1, -0.2, 1.0))
    np.testing.assert_allclose(out2, [10, -20, 100, 100])


def test_augmentation_shapes_and_originals():
    import jax
    mean = np.float32([-0.1, 0.1, -0.1, 0.1])
    boxes = np.float32([[0, 0, 100, 100], [50, 50, 80, 80]])
    x0, s2b = augment_initialisations(mean, boxes, jax.random.PRNGKey(0),
                                      num_perturbations=3)
    assert x0.shape == (8, 4)
    np.testing.assert_array_equal(np.asarray(s2b), [0, 0, 0, 0, 1, 1, 1, 1])
    # group leader is the unperturbed box
    np.testing.assert_allclose(np.asarray(x0)[0],
                               np.asarray(align_mean(mean, boxes[0])))


def test_augmentation_rotation_jitter():
    import jax
    mean = np.float32([-0.1, 0.1, 0.0, 0.0, 0.0, 0.3])   # L=3
    boxes = np.float32([[0, 0, 100, 100], [50, 50, 80, 80]])
    key = jax.random.PRNGKey(3)
    # sigma_rotation=0.0 reproduces the reference augmentation exactly
    x0_ref, _ = augment_initialisations(mean, boxes, key,
                                        num_perturbations=4)
    x0_zero, _ = augment_initialisations(mean, boxes, key,
                                         num_perturbations=4,
                                         sigma_rotation=0.0)
    np.testing.assert_array_equal(np.asarray(x0_ref), np.asarray(x0_zero))
    x0_rot, s2b = augment_initialisations(mean, boxes, key,
                                          num_perturbations=4,
                                          sigma_rotation=0.2)
    assert x0_rot.shape == x0_ref.shape
    r = np.asarray(x0_rot).reshape(2, 5, 6)
    # group leaders (the unperturbed boxes) stay unrotated
    np.testing.assert_allclose(
        r[:, 0], np.asarray(align_mean(mean[None], boxes)), rtol=1e-6)
    for g in range(2):
        for k in range(1, 5):
            row = r[g, k]
            xs, ys = row[:3], row[3:]
            # rotation about the centroid preserves every point's distance
            # to the centroid: recover theta from one point and check all
            cx, cy = xs.mean(), ys.mean()
            assert not np.allclose(row, np.asarray(x0_ref).reshape(
                2, 5, 6)[g, k])                 # actually rotated
            ref = np.asarray(x0_ref).reshape(2, 5, 6)[g, k]
            rx, ry = ref[:3] - ref[:3].mean(), ref[3:] - ref[3:].mean()
            dx, dy = xs - cx, ys - cy
            np.testing.assert_allclose(np.hypot(dx, dy), np.hypot(rx, ry),
                                       rtol=1e-4, atol=1e-5)
            theta = np.arctan2(dy[0], dx[0]) - np.arctan2(ry[0], rx[0])
            ca, sa = np.cos(theta), np.sin(theta)
            np.testing.assert_allclose(dx, rx * ca - ry * sa,
                                       rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(dy, rx * sa + ry * ca,
                                       rtol=1e-4, atol=1e-4)


def test_extract_patches_known_values():
    # image with a known ramp; patch entirely inside; no resize (phw*2 == S)
    img = np.arange(100, dtype=np.float32).reshape(10, 10)
    patches = extract_patches(
        img[None], np.int32([0]),
        np.float32([[5.0]]), np.float32([[5.0]]),
        np.float32([2.0]), 4, quantize=False)
    # crop origin (3,3), scale=1: src coords = 0..3 + origin => rows 3..6
    expected = img[3:7, 3:7]
    np.testing.assert_allclose(np.asarray(patches)[0, 0], expected)


def test_extract_patches_zero_padding():
    img = np.full((10, 10), 200.0, np.float32)
    patches = extract_patches(
        img[None], np.int32([0]),
        np.float32([[0.0]]), np.float32([[0.0]]),
        np.float32([2.0]), 4, quantize=False)
    p = np.asarray(patches)[0, 0]
    # crop origin (-2,-2): top-left quadrant is outside the image -> zeros
    assert p[0, 0] == 0.0 and p[0, 1] == 0.0
    assert p[3, 3] == 200.0


def test_extract_patches_resize_halves():
    # 8x8 crop resized to 4x4: cv::resize area-like bilinear at scale 2
    img = np.zeros((20, 20), np.float32)
    img[6:14, 6:14] = np.arange(64, dtype=np.float32).reshape(8, 8)
    patches = extract_patches(
        img[None], np.int32([0]),
        np.float32([[10.0]]), np.float32([[10.0]]),
        np.float32([4.0]), 4, quantize=False)
    p = np.asarray(patches)[0, 0]
    # src = (d+0.5)*2-0.5 = 0.5, 2.5, 4.5, 6.5 -> bilinear midpoints
    crop = img[6:14, 6:14]
    for i, sy in enumerate([0.5, 2.5, 4.5, 6.5]):
        for j, sx in enumerate([0.5, 2.5, 4.5, 6.5]):
            y0, x0 = int(sy), int(sx)
            expected = crop[y0:y0+2, x0:x0+2].mean()
            np.testing.assert_allclose(p[i, j], expected, rtol=1e-5)


@needs_data
def load_small_dataset():
    images, rows = [], []
    for png in sorted(glob.glob(os.path.join(DATA, "*.png"))):
        lms = read_pts_landmarks(png.replace(".png", ".pts"))
        small = lms.filter(SMALL_LANDMARKS)
        images.append(load_gray_image(png))
        rows.append(to_row(small))
    stack, _ = stack_images(images)
    return stack, np.stack(rows)


@needs_data
def test_hog_transform_feature_dim():
    stack, rows = load_small_dataset()
    hog = HogTransform(stack, SMALL_HOG, SMALL_LANDMARKS, RIGHT_EYE, LEFT_EYE)
    feats = np.asarray(hog(jnp.asarray(rows), 0))
    # 3x3 cells x 16 dims x 10 landmarks + bias
    assert feats.shape == (5, 10 * 9 * 16 + 1)
    assert np.all(feats[:, -1] == 1.0)
    assert np.isfinite(feats).all()
    assert feats[:, :-1].max() <= 0.4 + 1e-6 and feats[:, :-1].min() >= 0.0


@needs_data
def test_hog_transform_chunked_matches_block():
    # lax.map chunking (incl. a ragged final chunk) must be a pure memory
    # optimisation: identical features to the single-block path.
    stack, rows = load_small_dataset()
    rows3 = np.concatenate([rows, rows[:2] + 1.5, rows[1:4] - 2.0])  # N=10
    idx = np.concatenate([np.arange(5), [0, 1], [1, 2, 3]]).astype(np.int32)
    # quantize=False: the only allowed difference is float rounding from
    # the lax.map body compiling as one fused program
    hog = HogTransform(stack, SMALL_HOG, SMALL_LANDMARKS, RIGHT_EYE,
                       LEFT_EYE, image_indices=idx, quantize=False)
    hog_chunked = HogTransform(stack, SMALL_HOG, SMALL_LANDMARKS, RIGHT_EYE,
                               LEFT_EYE, image_indices=idx, quantize=False,
                               chunk_size=4)
    for level in range(2):
        a = np.asarray(hog(jnp.asarray(rows3), level))
        b = np.asarray(hog_chunked(jnp.asarray(rows3), level))
        np.testing.assert_allclose(a, b, atol=1e-5)
    # with uint8 quantization, ~1e-5 sampler rounding differences can flip
    # pixels sitting on a .5 boundary (same effect class as fast sampling:
    # +-1 greylevel); descriptors must stay close and mostly identical
    hq = HogTransform(stack, SMALL_HOG, SMALL_LANDMARKS, RIGHT_EYE,
                      LEFT_EYE, image_indices=idx)
    hq_chunked = HogTransform(stack, SMALL_HOG, SMALL_LANDMARKS, RIGHT_EYE,
                              LEFT_EYE, image_indices=idx, chunk_size=4)
    a = np.asarray(hq(jnp.asarray(rows3), 0))
    b = np.asarray(hq_chunked(jnp.asarray(rows3), 0))
    np.testing.assert_allclose(a, b, atol=0.05)


@needs_data
def test_uint8_stack_matches_float32():
    # uint8 image stacks (4x less HBM) are lossless for integer gray pixels.
    images = [load_gray_image(p)
              for p in sorted(glob.glob(os.path.join(DATA, "*.png")))]
    _, rows = load_small_dataset()
    stack_f32, _ = stack_images(images)
    stack_u8, _ = stack_images(images, dtype=np.uint8)
    assert stack_u8.dtype == np.uint8
    np.testing.assert_array_equal(stack_u8.astype(np.float32), stack_f32)
    hf = HogTransform(stack_f32, SMALL_HOG, SMALL_LANDMARKS, RIGHT_EYE,
                      LEFT_EYE)
    hu = HogTransform(stack_u8, SMALL_HOG, SMALL_LANDMARKS, RIGHT_EYE,
                      LEFT_EYE)
    x = jnp.asarray(rows)
    np.testing.assert_array_equal(np.asarray(hf(x, 0)), np.asarray(hu(x, 0)))


def test_window_backend_nonidentity_indices_same_count():
    # Regression: an explicit NON-identity image_indices map whose length
    # happens to equal the window-stack size must still gather per sample
    # (the window/fused branches used to shortcut on shape equality and
    # silently sample window i for sample i).
    rng = np.random.default_rng(7)
    n, r, l = 5, 128, len(SMALL_LANDMARKS)
    wins = rng.integers(0, 256, size=(n, r, r)).astype(np.float32)
    rows = np.concatenate([
        rng.uniform(40, r - 40, (n, l)).astype(np.float32),
        rng.uniform(40, r - 40, (n, l)).astype(np.float32)], axis=1)
    perm = np.array([2, 0, 4, 1, 3], np.int32)

    def feats(stack, indices):
        hog = HogTransform(stack, SMALL_HOG, SMALL_LANDMARKS, RIGHT_EYE,
                           LEFT_EYE, image_indices=indices,
                           patch_backend="window", quantize=False)
        return np.asarray(hog(jnp.asarray(rows), 0))

    via_indices = feats(wins, perm)          # N samples over N windows
    pre_gathered = feats(wins[perm], None)   # ground truth: explicit gather
    np.testing.assert_allclose(via_indices, pre_gathered, atol=1e-5)
    # identity detection: arange indices (detect_batch's construction)
    # must still take the no-gather shortcut
    hog = HogTransform(wins, SMALL_HOG, SMALL_LANDMARKS, RIGHT_EYE,
                       LEFT_EYE, image_indices=np.arange(n, dtype=np.int32),
                       patch_backend="window", quantize=False)
    assert hog._identity_for(n) and not hog._identity_for(n - 1)


@needs_data
def test_rcr_end_to_end_train_detect_roundtrip(tmp_path):
    stack, gt_rows = load_small_dataset()
    boxes = np.stack([
        gt_facebox(to_landmark_collection(r, SMALL_LANDMARKS))
        for r in gt_rows]).astype(np.float32)

    # mean: average of the GT shapes mapped into facebox space
    def to_box_space(row, box):
        l = len(SMALL_LANDMARKS)
        x, y, w, h = box
        return np.concatenate([(row[:l] - x) / w - 0.5,
                               (row[l:] - y) / h - 0.5])
    mean = np.mean([to_box_space(r, b) for r, b in zip(gt_rows, boxes)],
                   axis=0).astype(np.float32)

    # MatrixNorm 0.1 like the reference's landmark_detection hello-world
    # (landmark_detection.cpp:440): the RCR-22 lambda factor of 1.5 is tuned
    # for thousands of samples and over-regularises a 20-sample toy set.
    from superviseddescent_tpu import Regulariser, RegularisationType
    cfg = RcrTrainConfig(
        hog_params=SMALL_HOG, num_perturbations=3, seed=42,
        regularisation=Regulariser(RegularisationType.MatrixNorm, 0.1,
                                   regularise_last_row=False))
    right_idx, left_idx = resolve_eye_indices(
        SMALL_LANDMARKS, RIGHT_EYE, LEFT_EYE)

    errors = []
    def on_epoch(x):
        errors.append(float(np.mean(np.asarray(normalised_landmark_errors(
            x, np.repeat(gt_rows, cfg.num_perturbations + 1, 0),
            right_idx, left_idx)))))

    model = train_rcr(stack, gt_rows, boxes, SMALL_LANDMARKS,
                      RIGHT_EYE, LEFT_EYE, mean, cfg, on_epoch=on_epoch)

    init_rows = np.asarray(align_mean(mean[None, :], boxes))
    init_err = float(np.mean(np.asarray(normalised_landmark_errors(
        init_rows, gt_rows, right_idx, left_idx))))
    # cascade levels improve on each other and beat the mean-shape init
    assert errors[-1] < errors[0]
    assert errors[-1] < init_err

    # batched detection on the training images
    pred = np.asarray(model.detect_batch(stack, boxes))
    det_err = float(np.mean(np.asarray(normalised_landmark_errors(
        pred, gt_rows, right_idx, left_idx))))
    assert det_err < init_err

    # single-image detect agrees with the batched path
    lc = model.detect(stack[0], boxes[0])
    np.testing.assert_allclose(to_row(lc), pred[0], atol=1e-4)

    # cereal round-trip: identical predictions after save/load
    path = tmp_path / "rcr_small.bin"
    model.save(path)
    loaded = DetectionModel.load(path)
    pred2 = np.asarray(loaded.detect_batch(stack, boxes))
    np.testing.assert_allclose(pred2, pred, atol=1e-5)


@needs_data
def test_train_rcr_roi_windows_match_full_images():
    # config.roi crops per-face windows host-side and trains in window
    # coordinates; the learned model and its image-coordinate predictions
    # must match full-image training (float rounding differs slightly:
    # window coordinates have smaller magnitudes)
    from superviseddescent_tpu import Regulariser, RegularisationType

    stack, gt_rows = load_small_dataset()
    boxes = np.stack([
        gt_facebox(to_landmark_collection(r, SMALL_LANDMARKS))
        for r in gt_rows]).astype(np.float32)

    def to_box_space(row, box):
        l = len(SMALL_LANDMARKS)
        x, y, w, h = box
        return np.concatenate([(row[:l] - x) / w - 0.5,
                               (row[l:] - y) / h - 0.5])
    mean = np.mean([to_box_space(r, b) for r, b in zip(gt_rows, boxes)],
                   axis=0).astype(np.float32)
    base = dict(hog_params=SMALL_HOG, num_perturbations=2, seed=11,
                regularisation=Regulariser(RegularisationType.MatrixNorm,
                                           0.1, regularise_last_row=False))

    cb_full, cb_roi = [], []
    full = train_rcr(stack, gt_rows, boxes, SMALL_LANDMARKS, RIGHT_EYE,
                     LEFT_EYE, mean, RcrTrainConfig(**base),
                     on_epoch=lambda x: cb_full.append(np.asarray(x)))
    roi = train_rcr(stack, gt_rows, boxes, SMALL_LANDMARKS, RIGHT_EYE,
                    LEFT_EYE, mean, RcrTrainConfig(roi=512, **base),
                    on_epoch=lambda x: cb_roi.append(np.asarray(x)))

    # callbacks are reported back in image coordinates
    for a, b in zip(cb_full, cb_roi):
        np.testing.assert_allclose(b, a, atol=0.2)
    p_full = np.asarray(full.detect_batch(stack, boxes))
    p_roi = np.asarray(roi.detect_batch(stack, boxes))
    np.testing.assert_allclose(p_roi, p_full, atol=0.2)


def test_mirror_permutation_properties():
    # involution + self-mapped midline ids; one-sided sets must raise
    from superviseddescent_tpu.utils.landmarks import mirror_permutation
    ids22 = [str(i) for i in (9, 31, 32, 36, 37, 38, 39, 40, 41, 42, 43,
                              44, 45, 46, 47, 48, 49, 52, 55, 58, 63, 67)]
    for ids in (SMALL_LANDMARKS, ids22, [str(i) for i in range(1, 69)]):
        p = mirror_permutation(ids)
        np.testing.assert_array_equal(p[p], np.arange(len(ids)))
        for i, n in enumerate(ids):   # midline ids map to themselves
            if n in ("9", "31", "52", "58", "63", "67"):
                assert p[i] == i, n
    # "37" (right outer eye corner) without its partner "46"
    with pytest.raises(ValueError, match="mirror-closed"):
        mirror_permutation(["9", "37"])


@needs_data
def test_mirror_augmentation_end_to_end():
    # mirror_augmentation doubles the set with flipped images +
    # mirror-permuted ground truth (hog.c:233-268 is the reference's
    # feature-space twin). The trained model must fit the ORIGINAL faces
    # and, because the training set is now symmetric, fit the FLIPPED
    # faces equally well.
    from superviseddescent_tpu.utils.landmarks import mirror_permutation
    stack, gt_rows = load_small_dataset()
    boxes = np.stack([
        gt_facebox(to_landmark_collection(r, SMALL_LANDMARKS))
        for r in gt_rows]).astype(np.float32)
    l = len(SMALL_LANDMARKS)

    def to_box_space(row, box):
        x, y, w, h = box
        return np.concatenate([(row[:l] - x) / w - 0.5,
                               (row[l:] - y) / h - 0.5])
    mean = np.mean([to_box_space(r, b) for r, b in zip(gt_rows, boxes)],
                   axis=0).astype(np.float32)
    from superviseddescent_tpu import Regulariser, RegularisationType
    cfg = RcrTrainConfig(
        hog_params=SMALL_HOG, num_perturbations=2, seed=5,
        mirror_augmentation=True,
        regularisation=Regulariser(RegularisationType.MatrixNorm, 0.1,
                                   regularise_last_row=False))
    model = train_rcr(stack, gt_rows, boxes, SMALL_LANDMARKS,
                      RIGHT_EYE, LEFT_EYE, mean, cfg)
    right_idx, left_idx = resolve_eye_indices(
        SMALL_LANDMARKS, RIGHT_EYE, LEFT_EYE)
    init_rows = np.asarray(align_mean(mean[None, :], boxes))
    init_err = float(np.mean(np.asarray(normalised_landmark_errors(
        init_rows, gt_rows, right_idx, left_idx))))

    pred = np.asarray(model.detect_batch(stack, boxes))
    err = float(np.mean(np.asarray(normalised_landmark_errors(
        pred, gt_rows, right_idx, left_idx))))
    assert err < init_err / 2, (err, init_err)

    # flipped faces: same model, flipped stack/boxes/gt (the formula
    # train_rcr uses internally)
    perm = mirror_permutation(SMALL_LANDMARKS)
    wpx = stack.shape[2]
    flipped = np.asarray(stack)[:, :, ::-1]
    gt_flip = np.concatenate(
        [(wpx - 1.0) - gt_rows[:, :l][:, perm], gt_rows[:, l:][:, perm]],
        axis=1)
    boxes_flip = np.stack([wpx - boxes[:, 0] - boxes[:, 2], boxes[:, 1],
                           boxes[:, 2], boxes[:, 3]], axis=1)
    pred_f = np.asarray(model.detect_batch(flipped, boxes_flip))
    err_f = float(np.mean(np.asarray(normalised_landmark_errors(
        pred_f, gt_flip, right_idx, left_idx))))
    assert err_f < init_err / 2, (err_f, init_err)
