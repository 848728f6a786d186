"""Native checkpoint tests: orbax model save/load + per-level train resume."""

import glob
import os

import numpy as np
import pytest

from superviseddescent_tpu import Regulariser, RegularisationType
from superviseddescent_tpu.io.checkpoint import (
    TrainCheckpointer, load_native, save_native,
)
from superviseddescent_tpu.models import (
    HogParams, RcrTrainConfig, gt_facebox, train_rcr,
)
from superviseddescent_tpu.ops.hog import HogVariant
from superviseddescent_tpu.ops.patches import load_gray_image, stack_images
from superviseddescent_tpu.io import read_pts_landmarks
from superviseddescent_tpu.utils.landmarks import (
    to_landmark_collection, to_row,
)

DATA = "/root/reference/examples/data/ibug_lfpw_trainset"
needs_data = pytest.mark.skipif(not os.path.isdir(DATA),
                                reason="reference data absent")

LANDMARKS = ["31", "37", "40", "43", "46", "49", "55", "58"]
RIGHT_EYE, LEFT_EYE = ["37", "40"], ["43", "46"]
SMALL_HOG = (HogParams(HogVariant.Uoctti, 3, 6, 4, 0.7),
             HogParams(HogVariant.Uoctti, 3, 4, 4, 0.4))


def _dataset():
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
    return stack, gt_rows, boxes, mean


CFG = RcrTrainConfig(
    hog_params=SMALL_HOG, num_perturbations=2, seed=3,
    regularisation=Regulariser(RegularisationType.MatrixNorm, 0.1, False))


@needs_data
def test_native_checkpoint_roundtrip(tmp_path):
    stack, gt_rows, boxes, mean = _dataset()
    model = train_rcr(stack, gt_rows, boxes, LANDMARKS, RIGHT_EYE, LEFT_EYE,
                      mean, CFG)
    pred = np.asarray(model.detect_batch(stack, boxes))

    save_native(model, tmp_path / "ckpt")
    loaded = load_native(tmp_path / "ckpt")
    assert loaded.landmark_ids == model.landmark_ids
    assert loaded.hog_params == model.hog_params
    pred2 = np.asarray(loaded.detect_batch(stack, boxes))
    np.testing.assert_allclose(pred2, pred, atol=1e-5)


@needs_data
def test_train_resume_from_level_checkpoints(tmp_path):
    stack, gt_rows, boxes, mean = _dataset()

    # full run with checkpointing
    ck_dir = tmp_path / "train_ckpt"
    model_full = train_rcr(stack, gt_rows, boxes, LANDMARKS, RIGHT_EYE,
                           LEFT_EYE, mean, CFG,
                           checkpointer=TrainCheckpointer(ck_dir))
    assert TrainCheckpointer(ck_dir).completed_levels() == 2

    # simulate a crash after level 0: drop the level-1 checkpoint and resume
    os.remove(os.path.join(ck_dir, "level_01.npz"))
    ck = TrainCheckpointer(ck_dir)
    assert ck.completed_levels() == 1
    model_resumed = train_rcr(stack, gt_rows, boxes, LANDMARKS, RIGHT_EYE,
                              LEFT_EYE, mean, CFG, checkpointer=ck)
    # resumed run reproduces the full run exactly (same PRNG key, same
    # level-0 weights restored from disk)
    for rf, rr in zip(model_full.sdo.regressors, model_resumed.sdo.regressors):
        np.testing.assert_allclose(np.asarray(rf.weights),
                                   np.asarray(rr.weights), atol=1e-6)


def test_level_checkpoint_order_marker(tmp_path):
    # Mid-train checkpoints carry the weight-row feature order; a resume
    # expecting a different order (e.g. a fused-run checkpoint resumed
    # non-fused, or one written before a kernel column-order bump) must
    # fail loudly instead of silently scrambling the weight map-back.
    import pytest
    from superviseddescent_tpu.ops.cascade_pallas import (
        KERNEL_FEATURE_ORDER)
    ck = TrainCheckpointer(tmp_path / "ck")
    w = np.arange(12, dtype=np.float32).reshape(3, 4)
    x = np.zeros((2, 4), np.float32)
    ck.save_level(0, w, x, feature_order=KERNEL_FEATURE_ORDER)
    wl, _ = ck.load_level(0, expect_order=KERNEL_FEATURE_ORDER)
    np.testing.assert_array_equal(wl, w)
    with pytest.raises(ValueError, match="feature|order"):
        ck.load_level(0)  # default expects std order
    # pre-marker archives (no feature_order key) only pass as std
    np.savez(os.path.join(ck.directory, "level_01.npz"),
             weights=w, current_x=x)
    wl, _ = ck.load_level(1)
    np.testing.assert_array_equal(wl, w)
    with pytest.raises(ValueError, match="order"):
        ck.load_level(1, expect_order=KERNEL_FEATURE_ORDER)
