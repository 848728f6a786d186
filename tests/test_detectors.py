"""Detector-variant equivalence: monolithic vs stepped vs ROI-windowed."""

import glob
import os

import numpy as np
import pytest

from superviseddescent_tpu import Regulariser, RegularisationType
from superviseddescent_tpu.io import read_pts_landmarks
from superviseddescent_tpu.models import (
    HogParams, RcrTrainConfig, gt_facebox, train_rcr,
)
from superviseddescent_tpu.ops.hog import HogVariant
from superviseddescent_tpu.ops.patches import load_gray_image, stack_images
from superviseddescent_tpu.utils.landmarks import (
    to_landmark_collection, to_row,
)

DATA = "/root/reference/examples/data/ibug_lfpw_trainset"
pytestmark = pytest.mark.skipif(not os.path.isdir(DATA),
                                reason="reference data absent")

LANDMARKS = ["31", "37", "40", "43", "46", "55", "58", "9"]
RIGHT_EYE, LEFT_EYE = ["37", "40"], ["43", "46"]
HOG = (HogParams(HogVariant.Uoctti, 3, 6, 4, 0.7),
       HogParams(HogVariant.Uoctti, 3, 4, 4, 0.4))


@pytest.fixture(scope="module")
def trained():
    images, rows = [], []
    for png in sorted(glob.glob(os.path.join(DATA, "*.png"))):
        lms = read_pts_landmarks(png.replace(".png", ".pts"))
        images.append(load_gray_image(png))
        rows.append(to_row(lms.filter(LANDMARKS)))
    stack, _ = stack_images(images)
    gt_rows = np.stack(rows)
    boxes = np.stack([gt_facebox(to_landmark_collection(r, LANDMARKS))
                      for r in gt_rows]).astype(np.float32)
    l = len(LANDMARKS)
    mean = np.mean([np.concatenate([(r[:l] - b[0]) / b[2] - 0.5,
                                    (r[l:] - b[1]) / b[3] - 0.5])
                    for r, b in zip(gt_rows, boxes)], axis=0).astype(np.float32)
    cfg = RcrTrainConfig(
        hog_params=HOG, num_perturbations=2, seed=9,
        regularisation=Regulariser(RegularisationType.MatrixNorm, 0.1, False))
    model = train_rcr(stack, gt_rows, boxes, LANDMARKS, RIGHT_EYE, LEFT_EYE,
                      mean, cfg)
    return model, stack, boxes


def test_stepped_matches_monolithic(trained):
    model, stack, boxes = trained
    import jax.numpy as jnp
    mono = np.asarray(model.detect_batch(
        stack, boxes, image_indices=jnp.arange(len(boxes))))
    # separate per-level jit programs fuse/round slightly differently
    stepped = np.asarray(model.make_stepped_detector(len(boxes))(stack, boxes))
    np.testing.assert_allclose(stepped, mono, atol=0.01)


def test_roi_matches_monolithic(trained):
    model, stack, boxes = trained
    import jax.numpy as jnp
    mono = np.asarray(model.detect_batch(
        stack, boxes, image_indices=jnp.arange(len(boxes))))
    # boxes max ~300 px; roi 512 is within the 728-wide stack. Window
    # offsets change f32 summation order in the tent matmuls -> ~0.05 px
    roi = np.asarray(model.make_stepped_detector(len(boxes), roi=512)(
        stack, boxes))
    np.testing.assert_allclose(roi, mono, atol=0.25)


def test_fast_sampling_close(trained):
    model, stack, boxes = trained
    base = np.asarray(model.make_stepped_detector(len(boxes))(stack, boxes))
    fast = np.asarray(model.make_stepped_detector(
        len(boxes), fast_sampling=True)(stack, boxes))
    # bf16 multiplies: sub-pixel deltas only (on CPU DEFAULT==HIGHEST, so
    # this is a no-op there; on TPU ~0.1 px)
    np.testing.assert_allclose(fast, base, atol=0.5)


def test_window_sampler_stepped_close(trained):
    # the bench serving path (Pallas window sampler + transposed fast
    # HOG), interpreted on CPU. hog_backend='pallas' forces the Pallas
    # HOG here (backend='auto' would pick XLA on CPU and skip the
    # transposed sampler->HOG pairing entirely). Fast-mode numerics:
    # sub-pixel deltas.
    model, stack, boxes = trained
    import jax.numpy as jnp
    mono = np.asarray(model.detect_batch(
        stack, boxes, image_indices=jnp.arange(len(boxes))))
    stack128, _ = stack_images(
        [np.asarray(stack[i]) for i in range(stack.shape[0])],
        pad_width_to=128)
    win = np.asarray(model.make_stepped_detector(
        len(boxes), roi=512, sampling="fast", window_sampler=True,
        max_ied=145.0, hog_backend="pallas")(
            stack128.astype(np.uint8), boxes))
    np.testing.assert_allclose(win, mono, atol=0.5)


def test_fused_cascade_close(trained):
    # the whole-cascade fused Pallas kernel (ops/cascade_pallas.py),
    # interpreted on CPU: serving-fast numerics, sub-pixel deltas vs the
    # exact monolithic path
    model, stack, boxes = trained
    import jax.numpy as jnp
    mono = np.asarray(model.detect_batch(
        stack, boxes, image_indices=jnp.arange(len(boxes))))
    stack128, _ = stack_images(
        [np.asarray(stack[i]) for i in range(stack.shape[0])],
        pad_width_to=128)
    fused = np.asarray(model.make_fused_detector(roi=512, max_ied=145.0)(
        stack128.astype(np.uint8), boxes))
    np.testing.assert_allclose(fused, mono, atol=0.75)


def test_fused_image_indices_matches_expanded(trained):
    # several faces sharing source frames: f(unique_stack, boxes,
    # image_indices) must equal f(expanded_stack, boxes) bit-for-bit —
    # only the window-crop gather differs, the kernel input is identical
    model, stack, boxes = trained
    stack128, _ = stack_images(
        [np.asarray(stack[i]) for i in range(stack.shape[0])],
        pad_width_to=128)
    stack_u8 = stack128.astype(np.uint8)
    idx = np.array([0, 2, 2, 4], np.int32)
    bx = boxes[idx]
    detect = model.make_fused_detector(roi=512, max_ied=145.0)
    expanded = np.asarray(detect(stack_u8[idx], bx))
    indexed = np.asarray(detect(stack_u8, bx, image_indices=idx))
    np.testing.assert_array_equal(indexed, expanded)


def test_fused_frames_path_matches_crop_path(trained):
    # uint8 frames with a 128-aligned width route through the in-kernel
    # window crop (detect_cascade_fused_frames: the kernel DMAs each
    # face's window straight from the HBM frame stack); f32 frames take
    # the legacy XLA crop prologue. Same pixels, origin-shifted windows
    # only -> interior faces must agree to float-noise level.
    model, stack, boxes = trained
    stack128, _ = stack_images(
        [np.asarray(stack[i]) for i in range(stack.shape[0])],
        pad_width_to=128)
    detect = model.make_fused_detector(roi=512, max_ied=145.0)
    frames = np.asarray(detect(stack128.astype(np.uint8), boxes))
    legacy = np.asarray(detect(stack128.astype(np.float32), boxes))
    np.testing.assert_allclose(frames, legacy, atol=1e-3)


def test_scan_detector_matches_unrolled():
    # Uniform per-level HOG params: the lax.scan whole-cascade body is
    # shape-legal and must match the unrolled monolithic application
    # exactly (same math, same per-level weights, just rolled).
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    import jax.numpy as jnp
    from bench_scan_compile import uniform_model
    model = uniform_model(num_landmarks=6, levels=3, cell_size=4)
    rng = np.random.default_rng(0)
    batch = 3
    images = rng.integers(0, 256, (batch, 96, 96)).astype(np.float32)
    boxes = np.tile(np.float32([20, 20, 56, 56]), (batch, 1))
    scan = np.asarray(model.make_scan_detector(batch)(images, boxes))
    mono = np.asarray(model.detect_batch(
        images, boxes, image_indices=jnp.arange(batch)))
    np.testing.assert_allclose(scan, mono, atol=1e-4)


def test_scan_detector_rejects_heterogeneous(trained):
    model, stack, boxes = trained
    with pytest.raises(ValueError, match="uniform"):
        model.make_scan_detector(len(boxes))


def test_window_sampler_unaligned_roi(trained):
    # Regression (ADVICE r1): an 8-aligned but non-128-aligned roi on a
    # non-128-padded stack used to die in the sampler's lane-alignment
    # assert because level_sub_windows enabled a 128-aligned lane
    # sub-window against a 400-wide square crop. It must instead fall back
    # to full-width sampling and produce the same landmarks.
    model, stack, boxes = trained
    import jax.numpy as jnp
    mono = np.asarray(model.detect_batch(
        stack, boxes, image_indices=jnp.arange(len(boxes))))
    win = np.asarray(model.make_stepped_detector(
        len(boxes), roi=400, sampling="fast", window_sampler=True,
        max_ied=145.0, hog_backend="pallas")(stack, boxes))
    np.testing.assert_allclose(win, mono, atol=0.5)


def test_fused_training_backend(trained):
    # patch_backend='fused' trains through the one-kernel extractor
    # (kernel-order features, weights mapped back to reference order);
    # compared against the WINDOW backend in the SAME fast numerics
    # class so the tolerance is tight (VERDICT r2 item 7: the old
    # comparison vs the exact-trained fixture needed a 2 px atol that
    # could hide a feature-ordering regression)
    model_x, stack, boxes = trained
    from superviseddescent_tpu.io import read_pts_landmarks
    pngs = sorted(glob.glob(os.path.join(DATA, "*.png")))
    gt_rows = np.stack([
        to_row(read_pts_landmarks(p.replace(".png", ".pts"))
               .filter(LANDMARKS)) for p in pngs])
    l = len(LANDMARKS)
    mean = np.mean([np.concatenate([(r[:l] - b[0]) / b[2] - 0.5,
                                    (r[l:] - b[1]) / b[3] - 0.5])
                    for r, b in zip(gt_rows, boxes)],
                   axis=0).astype(np.float32)
    base = dict(
        hog_params=HOG, num_perturbations=2, seed=9,
        regularisation=Regulariser(RegularisationType.MatrixNorm, 0.1,
                                   False),
        roi=512, sampling="fast", hog_fast=True)
    m_f = train_rcr(stack, gt_rows, boxes, LANDMARKS, RIGHT_EYE, LEFT_EYE,
                    mean, RcrTrainConfig(patch_backend="fused", **base))
    m_w = train_rcr(stack, gt_rows, boxes, LANDMARKS, RIGHT_EYE, LEFT_EYE,
                    mean, RcrTrainConfig(patch_backend="window", **base))
    for rf, rw in zip(m_f.sdo.regressors, m_w.sdo.regressors):
        # same numerics class, different extractors -> tiny weight deltas
        dw = np.abs(np.asarray(rf.weights) - np.asarray(rw.weights))
        assert dw.mean() < 1e-3, dw.mean()
    import jax.numpy as jnp
    pred = np.asarray(m_f.detect_batch(
        stack, boxes, image_indices=jnp.arange(len(boxes))))
    ref = np.asarray(m_w.detect_batch(
        stack, boxes, image_indices=jnp.arange(len(boxes))))
    np.testing.assert_allclose(pred, ref, atol=0.75)  # px, same-class train
    # and the fused-trained model still fits the exact-trained fixture's
    # predictions to fast-vs-exact class deltas (sanity vs round-2 bound)
    ref_exact = np.asarray(model_x.detect_batch(
        stack, boxes, image_indices=jnp.arange(len(boxes))))
    np.testing.assert_allclose(pred, ref_exact, atol=2.0)


def test_fused_training_frames_mode(trained, monkeypatch):
    # a uint8 lane-aligned-width stack routes fused training through the
    # in-kernel window crop (extract_features_fused_frames): no
    # per-sample window stack is ever gathered. Same sampling math and
    # quantised pixels as the windows-based fused path — only the
    # aligned window origin differs — so weights and landmarks must
    # match to the frames-vs-legacy detect class (PERF_NOTES: 0.0018 px
    # at the bench config).
    model_x, stack, boxes = trained
    from superviseddescent_tpu.io import read_pts_landmarks
    from superviseddescent_tpu.ops import cascade_pallas
    pngs = sorted(glob.glob(os.path.join(DATA, "*.png")))
    images = [load_gray_image(p) for p in pngs]
    gt_rows = np.stack([
        to_row(read_pts_landmarks(p.replace(".png", ".pts"))
               .filter(LANDMARKS)) for p in pngs])
    stack_u8, _ = stack_images(images, dtype=np.uint8, pad_width_to=128)
    l = len(LANDMARKS)
    mean = np.mean([np.concatenate([(r[:l] - b[0]) / b[2] - 0.5,
                                    (r[l:] - b[1]) / b[3] - 0.5])
                    for r, b in zip(gt_rows, boxes)],
                   axis=0).astype(np.float32)
    calls = []
    orig = cascade_pallas.extract_features_fused_frames
    monkeypatch.setattr(
        cascade_pallas, "extract_features_fused_frames",
        lambda *a, **k: (calls.append(1), orig(*a, **k))[1])
    base = dict(
        hog_params=HOG, num_perturbations=2, seed=9,
        regularisation=Regulariser(RegularisationType.MatrixNorm, 0.1,
                                   False),
        roi=512, sampling="fast", hog_fast=True)
    m_fr = train_rcr(stack_u8, gt_rows, boxes, LANDMARKS, RIGHT_EYE,
                     LEFT_EYE, mean,
                     RcrTrainConfig(patch_backend="fused", **base))
    assert calls, "uint8 aligned stack must take the frames path"
    m_wi = train_rcr(stack, gt_rows, boxes, LANDMARKS, RIGHT_EYE,
                     LEFT_EYE, mean,
                     RcrTrainConfig(patch_backend="fused", **base))
    for rf, rw in zip(m_fr.sdo.regressors, m_wi.sdo.regressors):
        dw = np.abs(np.asarray(rf.weights) - np.asarray(rw.weights))
        assert dw.mean() < 1e-3, dw.mean()
    import jax.numpy as jnp
    pred = np.asarray(m_fr.detect_batch(
        stack, boxes, image_indices=jnp.arange(len(boxes))))
    ref = np.asarray(m_wi.detect_batch(
        stack, boxes, image_indices=jnp.arange(len(boxes))))
    np.testing.assert_allclose(pred, ref, atol=0.75)  # px, same class


def test_feature_order_mappings_consistent():
    # The three feature-order artifacts must agree on ONE kernel column
    # order (cx-major segments, (lm, cy) inner, bias last):
    # permute_weights (detect GEMV), compact_feature_columns (training
    # features) and compact_to_standard_rows (training weight map).
    # Feeding the identity through permute_weights yields the
    # std-row -> kernel-column placement matrix, which ties them
    # together exactly.
    from superviseddescent_tpu.ops.cascade_pallas import (
        SEG, compact_feature_columns, compact_to_standard_rows,
        permute_weights)
    l, c, d = 5, 3, 16
    f = l * d * c * c + 1
    m = permute_weights(np.eye(f, dtype=np.float32), l, c, d)
    assert m.shape == (f, (d * c + 1) * SEG)
    # a permutation into the padded width: every std feature lands on
    # exactly one kernel column, no two share one
    assert (m.sum(axis=1) == 1.0).all()
    assert ((m.sum(axis=0) == 0) | (m.sum(axis=0) == 1)).all()
    assert m.sum() == f
    compact = np.asarray(compact_feature_columns(m, l, c, d))
    std_rows = compact_to_standard_rows(l, c, d)
    expect = (std_rows[None, :] == np.arange(f)[:, None]).astype(
        np.float32)
    np.testing.assert_array_equal(compact, expect)


def test_fused_config_validation():
    # the fused kernel's baked-in invariants must raise clearly, not
    # produce silent garbage (sector binning is num_bins=4-only); any
    # landmark count is served via multi-segment packing (seg_packing)
    from superviseddescent_tpu.ops.cascade_pallas import (
        seg_packing, validate_fused_config)
    from superviseddescent_tpu.ops.hog import HogVariant

    validate_fused_config(22, 5, 4, HogVariant.Uoctti)     # RCR-22: fine
    validate_fused_config(25, 5, 4, HogVariant.Uoctti)     # 125 lanes: fine
    validate_fused_config(29, 5, 4, HogVariant.Uoctti)     # 2 segments
    validate_fused_config(68, 5, 4, HogVariant.Uoctti)     # 3 segments
    assert seg_packing(22, 5) == (25, 1)
    assert seg_packing(29, 5) == (25, 2)
    assert seg_packing(68, 5) == (25, 3)
    with pytest.raises(ValueError, match="num_bins=4"):
        validate_fused_config(22, 5, 6, HogVariant.Uoctti)
    with pytest.raises(ValueError, match="Uoctti"):
        validate_fused_config(22, 5, 4, HogVariant.DalalTriggs)
    with pytest.raises(ValueError, match="num_cells"):
        validate_fused_config(1, 129, 4, HogVariant.Uoctti)

    # the model-level entry points hit the same validation
    from superviseddescent_tpu.models import HogParams, HogTransform
    bad = (HogParams(HogVariant.Uoctti, 5, 8, 6, 0.7),)
    with pytest.raises(ValueError, match="num_bins=4"):
        HogTransform(np.zeros((1, 128, 128), np.float32), bad,
                     LANDMARKS, RIGHT_EYE, LEFT_EYE,
                     patch_backend="fused")


def test_dalaltriggs_model_end_to_end(tmp_path):
    # The VLFeat kernel's second variant (hog.c:212-223: 4*O dims/cell
    # vs Uoctti's 3*O+4) must work END TO END, not just at the HOG-op
    # level: train a model whose hog_params use DalalTriggs and serve it
    # through the batched detector. The fused kernel validates-and-
    # rejects non-Uoctti (test_fused_config_validation); everything
    # upstream of it — feature dims, Matlab-order flatten, cereal
    # round-trip — is variant-generic and this pins that.
    import jax.numpy as jnp
    images, rows = [], []
    for png in sorted(glob.glob(os.path.join(DATA, "*.png"))):
        lms = read_pts_landmarks(png.replace(".png", ".pts"))
        images.append(load_gray_image(png))
        rows.append(to_row(lms.filter(LANDMARKS)))
    stack, _ = stack_images(images)
    gt_rows = np.stack(rows)
    boxes = np.stack([gt_facebox(to_landmark_collection(r, LANDMARKS))
                      for r in gt_rows]).astype(np.float32)
    l = len(LANDMARKS)
    mean = np.mean([np.concatenate([(r[:l] - b[0]) / b[2] - 0.5,
                                    (r[l:] - b[1]) / b[3] - 0.5])
                    for r, b in zip(gt_rows, boxes)],
                   axis=0).astype(np.float32)
    hog_dt = (HogParams(HogVariant.DalalTriggs, 3, 6, 4, 0.7),
              HogParams(HogVariant.DalalTriggs, 3, 4, 4, 0.4))
    cfg = RcrTrainConfig(
        hog_params=hog_dt, num_perturbations=2, seed=5,
        regularisation=Regulariser(RegularisationType.MatrixNorm, 0.1,
                                   False))
    model = train_rcr(stack, gt_rows, boxes, LANDMARKS, RIGHT_EYE,
                      LEFT_EYE, mean, cfg)
    # feature dim: 4*O*cells^2 per landmark + bias
    assert model.sdo.regressors[0].weights.shape[0] == 16 * 9 * l + 1

    from superviseddescent_tpu.models import normalised_landmark_errors
    from superviseddescent_tpu.models.rcr import align_mean
    from superviseddescent_tpu.utils.landmarks import resolve_eye_indices
    r_idx, l_idx = resolve_eye_indices(LANDMARKS, RIGHT_EYE, LEFT_EYE)
    pred = np.asarray(model.detect_batch(
        stack, boxes, image_indices=jnp.arange(len(boxes))))
    err = float(np.mean(normalised_landmark_errors(
        jnp.asarray(pred), jnp.asarray(gt_rows), r_idx, l_idx)))
    init_err = float(np.mean(normalised_landmark_errors(
        align_mean(mean[None], jnp.asarray(boxes)), jnp.asarray(gt_rows),
        r_idx, l_idx)))
    assert err < 0.1 and err < init_err / 2, (err, init_err)

    # the cereal round-trip carries the variant enum (adaptive_vlhog.hpp
    # :55-59 serialises it): reload and reproduce the same landmarks
    path = str(tmp_path / "dalaltriggs.bin")
    model.save(path)
    from superviseddescent_tpu.models import DetectionModel
    model2 = DetectionModel.load(path)
    assert model2.hog_params[0].variant == HogVariant.DalalTriggs
    pred2 = np.asarray(model2.detect_batch(
        stack, boxes, image_indices=jnp.arange(len(boxes))))
    np.testing.assert_allclose(pred2, pred, atol=1e-4)


def test_cofw29_scale_model_end_to_end():
    # The reference ships a second model family at 29 landmarks
    # (face_landmarks_model_rcr_cofw_29.bin, .MISSING_LARGE_BLOBS). The
    # framework must not be specialised to 22: train a 29-landmark model
    # (29 ibug ids standing in for the COFW annotation) at the flagship
    # FIVE-cell config (29 x 5 = 145 packed lanes -> 2 seg_packing
    # segments) and serve it through both the exact monolithic path and
    # the fused cascade kernel.
    import jax.numpy as jnp
    ids29 = [str(i) for i in
             (3, 9, 15, 18, 20, 22, 23, 25, 27, 28, 31, 32, 34, 36,
              37, 38, 40, 41, 43, 44, 46, 47, 49, 51, 52, 53, 55, 58, 63)]
    assert len(ids29) == 29
    images, rows = [], []
    for png in sorted(glob.glob(os.path.join(DATA, "*.png"))):
        lms = read_pts_landmarks(png.replace(".png", ".pts"))
        images.append(load_gray_image(png))
        rows.append(to_row(lms.filter(ids29)))
    stack, _ = stack_images(images)
    gt_rows = np.stack(rows)
    boxes = np.stack([gt_facebox(to_landmark_collection(r, ids29))
                      for r in gt_rows]).astype(np.float32)
    l = len(ids29)
    mean = np.mean([np.concatenate([(r[:l] - b[0]) / b[2] - 0.5,
                                    (r[l:] - b[1]) / b[3] - 0.5])
                    for r, b in zip(gt_rows, boxes)], axis=0).astype(np.float32)
    hog5 = (HogParams(HogVariant.Uoctti, 5, 6, 4, 0.7),
            HogParams(HogVariant.Uoctti, 5, 4, 4, 0.4))
    cfg = RcrTrainConfig(
        hog_params=hog5, num_perturbations=2, seed=3,
        regularisation=Regulariser(RegularisationType.MatrixNorm, 0.1, False))
    model = train_rcr(stack, gt_rows, boxes, ids29, RIGHT_EYE, LEFT_EYE,
                      mean, cfg)

    from superviseddescent_tpu.models import normalised_landmark_errors
    from superviseddescent_tpu.utils.landmarks import resolve_eye_indices
    r_idx, l_idx = resolve_eye_indices(ids29, RIGHT_EYE, LEFT_EYE)
    mono = np.asarray(model.detect_batch(
        stack, boxes, image_indices=jnp.arange(len(boxes))))
    err = float(np.mean(normalised_landmark_errors(
        jnp.asarray(mono), jnp.asarray(gt_rows), r_idx, l_idx)))
    from superviseddescent_tpu.models.rcr import align_mean
    init_err = float(np.mean(normalised_landmark_errors(
        align_mean(mean[None], jnp.asarray(boxes)), jnp.asarray(gt_rows),
        r_idx, l_idx)))
    assert err < 0.1 and err < init_err / 2, (err, init_err)

    stack128, _ = stack_images(
        [np.asarray(stack[i]) for i in range(stack.shape[0])],
        pad_width_to=128)
    fused = np.asarray(model.make_fused_detector(roi=512, max_ied=145.0)(
        stack128.astype(np.uint8), boxes))
    np.testing.assert_allclose(fused, mono, atol=0.75)


def test_fused_68_landmark_multisegment():
    # Full ibug-68 at 5 cells = 340 packed lanes -> 3 seg_packing
    # segments: the fused kernel must reproduce the exact monolithic
    # path. Training a 68-lm model is too slow for the suite, so ONE
    # cascade level runs small random weights — the GEMV multiplies
    # every feature lane, so wrong multi-segment packing (feature order,
    # y-tent/block-sum lanes, bias placement) shows up as multi-pixel
    # landmark deltas. (One level only: random weights do not contract
    # like a trained cascade, so a second level would amplify legitimate
    # fast-class rounding through the integer patch-origin rounding; the
    # trained COFW-29 test covers multi-level multi-segment.)
    import jax.numpy as jnp
    from superviseddescent_tpu.core.cascade import (
        SupervisedDescentOptimiser)
    from superviseddescent_tpu.core.regressor import LinearRegressor
    from superviseddescent_tpu.models import DetectionModel
    from superviseddescent_tpu.models.rcr import (
        InterEyeDistanceNormalisation)

    ids68 = [str(i) for i in range(1, 69)]
    pngs = sorted(glob.glob(os.path.join(DATA, "*.png")))[:2]
    images, rows = [], []
    for png in pngs:
        lms = read_pts_landmarks(png.replace(".png", ".pts"))
        images.append(load_gray_image(png))
        rows.append(to_row(lms.filter(ids68)))
    stack, _ = stack_images(images)
    gt_rows = np.stack(rows)
    boxes = np.stack([gt_facebox(to_landmark_collection(r, ids68))
                      for r in gt_rows]).astype(np.float32)
    l = len(ids68)
    mean = np.mean([np.concatenate([(r[:l] - b[0]) / b[2] - 0.5,
                                    (r[l:] - b[1]) / b[3] - 0.5])
                    for r, b in zip(gt_rows, boxes)],
                   axis=0).astype(np.float32)
    hog5 = (HogParams(HogVariant.Uoctti, 5, 6, 4, 0.7),)
    rng = np.random.default_rng(7)
    f = l * 16 * 25 + 1
    # sigma sized for few-px updates: the cascade multiplies the GEMV
    # output by the IED (~100 px here), so 1e-3 * sqrt(sum feat^2) * IED
    # lands at ~1-3 px per level — enough signal, no divergence
    regs = [LinearRegressor(
        weights=jnp.asarray(rng.normal(0, 1e-3, (f, 2 * l))
                            .astype(np.float32)),
        regulariser=Regulariser(RegularisationType.MatrixNorm, 0.1, False))
        for _ in hog5]
    norm = InterEyeDistanceNormalisation(ids68, RIGHT_EYE, LEFT_EYE)
    model = DetectionModel(SupervisedDescentOptimiser(regs, norm),
                           mean, ids68, hog5, RIGHT_EYE, LEFT_EYE)

    mono = np.asarray(model.detect_batch(
        stack, boxes, image_indices=jnp.arange(len(boxes))))
    stack128, _ = stack_images(
        [np.asarray(stack[i]) for i in range(stack.shape[0])],
        pad_width_to=128)
    fused = np.asarray(model.make_fused_detector(
        roi=512, max_ied=145.0, faces_per_step=2)(
            stack128.astype(np.uint8), boxes))
    np.testing.assert_allclose(fused, mono, atol=0.75)


def test_fused_68_landmark_training_end_to_end():
    # VERDICT r4 item 2: a 68-landmark model TRAINED through the fused
    # extraction backend (patch_backend='fused', kernel-order features,
    # weights mapped back to reference order, multi-segment lane
    # packing), then served through the fused detector — the reference's
    # largest model family exercised end to end, not as a random-weights
    # throughput demo. Small 1-level config keeps CPU interpret
    # affordable; the committed TPU-trained flagship-config twin is
    # pretrained/rcr68_lfpw5.bin (bench.py families section).
    import jax.numpy as jnp

    ids68 = [str(i) for i in range(1, 69)]
    pngs = sorted(glob.glob(os.path.join(DATA, "*.png")))[:3]
    images, rows = [], []
    for png in pngs:
        lms = read_pts_landmarks(png.replace(".png", ".pts"))
        images.append(load_gray_image(png))
        rows.append(to_row(lms.filter(ids68)))
    stack, _ = stack_images(images, pad_width_to=128)
    gt_rows = np.stack(rows)
    boxes = np.stack([gt_facebox(to_landmark_collection(r, ids68))
                      for r in gt_rows]).astype(np.float32)
    l = len(ids68)
    mean = np.mean([np.concatenate([(r[:l] - b[0]) / b[2] - 0.5,
                                    (r[l:] - b[1]) / b[3] - 0.5])
                    for r, b in zip(gt_rows, boxes)],
                   axis=0).astype(np.float32)
    cfg = RcrTrainConfig(
        hog_params=(HogParams(HogVariant.Uoctti, 3, 4, 4, 0.7),),
        num_perturbations=1, seed=3,
        regularisation=Regulariser(RegularisationType.MatrixNorm, 0.1,
                                   False),
        roi=512, patch_backend="fused", sampling="fast", hog_fast=True,
        solver_method="cholesky")
    model = train_rcr(stack, gt_rows, boxes, ids68, RIGHT_EYE, LEFT_EYE,
                      mean, cfg)
    w = np.asarray(model.sdo.regressors[0].weights)
    assert w.shape == (l * 16 * 9 + 1, 2 * l)
    assert np.isfinite(w).all()

    # serve the trained model through the fused kernel and score it:
    # training reduces the train-set IOD error well below the aligned
    # mean init's
    from superviseddescent_tpu.models import normalised_landmark_errors
    from superviseddescent_tpu.models.rcr import align_mean
    from superviseddescent_tpu.utils.landmarks import resolve_eye_indices
    detect = model.make_fused_detector(roi=512, max_ied=145.0,
                                       faces_per_step=2)
    out = np.asarray(detect(stack.astype(np.uint8), boxes))
    r_idx, l_idx = resolve_eye_indices(ids68, RIGHT_EYE, LEFT_EYE)
    err = np.mean(np.asarray(normalised_landmark_errors(
        out, gt_rows, r_idx, l_idx)))
    err0 = np.mean(np.asarray(normalised_landmark_errors(
        np.asarray(align_mean(mean[None], boxes)), gt_rows, r_idx, l_idx)))
    assert np.isfinite(err)
    assert err < 0.6 * err0, (err, err0)
    # and the fused serving output matches the exact monolithic path on
    # the same trained weights (fast-class deltas)
    mono = np.asarray(model.detect_batch(
        stack, boxes, image_indices=jnp.arange(len(boxes))))
    np.testing.assert_allclose(out, mono, atol=0.75)


def test_fused_tracker_matches_monolithic(trained):
    # init='landmarks' (the tracking overload, model.hpp:147-157): start
    # from a perturbed prior row and compare against the exact
    # detect_from_landmarks path; fast-mode numerics, sub-pixel deltas
    model, stack, boxes = trained
    from superviseddescent_tpu.utils.landmarks import to_row
    rng = np.random.default_rng(11)
    # prior estimates: ground truth detections jittered by a few px
    import jax.numpy as jnp
    prior = np.asarray(model.detect_batch(
        stack, boxes, image_indices=jnp.arange(len(boxes))))
    prior = prior + rng.normal(0, 2.0, prior.shape).astype(np.float32)
    mono = np.stack([
        to_row(model.detect_from_landmarks(np.asarray(stack[i]), prior[i]))
        for i in range(len(prior))])
    stack128, _ = stack_images(
        [np.asarray(stack[i]) for i in range(stack.shape[0])],
        pad_width_to=128)
    tracked = np.asarray(model.make_fused_tracker(roi=512, max_ied=145.0)(
        stack128.astype(np.uint8), prior))
    np.testing.assert_allclose(tracked, mono, atol=0.75)


def test_fused_track_stream_matches_sequential(trained):
    # the pipelined tracking stream (VERDICT r4 item 4): one fit stays in
    # flight so frame N's readback overlaps frame N+1's fit, but the
    # yielded rows must EQUAL the naive sequential loop's (frame 0 from
    # the facebox, every later frame initialised from its predecessor's
    # row) — the pipeline only reorders host readbacks, not device math
    model, stack, boxes = trained
    stack128, _ = stack_images(
        [np.asarray(stack[i]) for i in range(stack.shape[0])],
        pad_width_to=128)
    frames = [stack128[i].astype(np.uint8) for i in range(4)]
    box0 = boxes[0]

    detector = model.make_fused_detector(roi=512, max_ied=145.0)
    tracker = model.make_fused_tracker(roi=512, max_ied=145.0)
    seq, prev = [], None
    for f in frames:
        prev = (detector(f[None], box0[None]) if prev is None
                else tracker(f[None], prev))
        seq.append(np.asarray(prev)[0])

    stream = model.make_fused_track_stream(roi=512, max_ied=145.0)
    out = list(stream(frames, box0))
    assert len(out) == len(frames)
    np.testing.assert_array_equal(np.stack(out), np.stack(seq))

    # chunked readback (round 5: one RTT per K frames — the only lever
    # past the per-frame RTT wall, see probe_track.py): rows must stay
    # BIT-identical for every chunk size, including chunk > n_frames
    # (pure-tail flush) and a non-dividing chunk (partial tail)
    for chunk in (2, 3, 4, 7):
        out_c = list(model.make_fused_track_stream(
            roi=512, max_ied=145.0, chunk=chunk)(frames, box0))
        assert len(out_c) == len(frames), chunk
        np.testing.assert_array_equal(np.stack(out_c), np.stack(seq))

    # async-window readback (depth mode): copy_to_host_async at dispatch,
    # collected exactly D frames later — same bit-identical rows, incl.
    # depth > n_frames (pure drain)
    for depth in (1, 3, 7):
        out_d = list(model.make_fused_track_stream(
            roi=512, max_ied=145.0, depth=depth)(frames, box0))
        assert len(out_d) == len(frames), depth
        np.testing.assert_array_equal(np.stack(out_d), np.stack(seq))
    with pytest.raises(ValueError):
        model.make_fused_track_stream(roi=512, chunk=2, depth=2)

    # whole-clip lax.scan tracking: one program, one readback — rows
    # must equal the sequential detector/tracker chain
    scan_rows = np.asarray(model.make_fused_track_scan(
        roi=512, max_ied=145.0)(np.stack(frames), box0))
    np.testing.assert_array_equal(scan_rows, np.stack(seq))


def test_fused_frames_border_clamped_windows(trained):
    # VERDICT r3 item 8 + ADVICE r3: the frames path aligns window
    # origins DOWN to the (32, 128) DMA grain and clamps against the
    # aligned bound; the one-grain window enlargement must survive the
    # clamp so faces whose desired roi crop saturates at any of the four
    # image borders still cover every pixel the legacy crop sampled.
    # Build four 1024x1024 canvases (h % 32 == 0, w % 128 == 0) with the
    # same face pasted at each corner, so the desired window clamps at
    # ox=0 / ox=max / oy=0 / oy=max, and compare the fused frames path
    # against the exact monolithic detector on identical canvases.
    import jax.numpy as jnp
    model, stack, boxes = trained
    face = np.asarray(stack[1], np.float32)     # 450 x 300 source image
    fh, fw = 450, 300
    hh, ww = 1024, 1024
    canvases = np.zeros((4, hh, ww), np.float32)
    offs = [(0, 0), (0, ww - fw), (hh - fh, 0), (hh - fh, ww - fw)]
    bx = np.zeros((4, 4), np.float32)
    for i, (dy, dx) in enumerate(offs):
        canvases[i, dy:dy + fh, dx:dx + fw] = face[:fh, :fw]
        bx[i] = boxes[1] + np.float32([dx, dy, 0, 0])
    mono = np.asarray(model.detect_batch(
        canvases, bx, image_indices=jnp.arange(4)))
    detect = model.make_fused_detector(roi=512, max_ied=145.0)
    fused = np.asarray(detect(canvases.astype(np.uint8), bx))
    np.testing.assert_allclose(fused, mono, atol=0.75)
    # the landmark geometry must also be consistent across corners:
    # every canvas holds the same face, so predictions shifted back by
    # the paste offset must agree with each other
    l = len(LANDMARKS)
    shifts = np.stack([np.concatenate([np.full(l, dx), np.full(l, dy)])
                       for dy, dx in offs]).astype(np.float32)
    local = fused - shifts
    np.testing.assert_allclose(local, np.tile(local[0], (4, 1)), atol=0.75)
