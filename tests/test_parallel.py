"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superviseddescent_tpu import Regulariser, RegularisationType
from superviseddescent_tpu.ops.solver import solve_ridge_normal_equations
from superviseddescent_tpu.parallel import (
    distributed_train_level, make_mesh, replicate, shard_batch,
)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


@pytest.mark.parametrize("reg", [
    Regulariser(),
    Regulariser(RegularisationType.Manual, 5.0, True),
    Regulariser(RegularisationType.MatrixNorm, 1.5, False),
])
def test_distributed_solve_matches_single_device(reg):
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(64, 24)).astype(np.float32)
    feats[:, -1] = 1.0
    b = rng.normal(size=(64, 6)).astype(np.float32)

    single = np.asarray(solve_ridge_normal_equations(feats, b, reg))

    mesh = make_mesh()
    f_sh = shard_batch(jnp.asarray(feats), mesh)
    b_sh = shard_batch(jnp.asarray(b), mesh)
    dist = np.asarray(distributed_train_level(f_sh, b_sh, reg, mesh))
    # psum-reduced partial AtA vs single big GEMM: identical math, different
    # summation order -> tiny f32 differences
    np.testing.assert_allclose(dist, single, rtol=1e-4, atol=1e-5)


def test_sharded_cascade_training_matches():
    """A full 3-level cascade trained with batch-sharded inputs under jit
    must match the single-device result (XLA inserts the collectives)."""
    from superviseddescent_tpu import LinearRegressor, SupervisedDescentOptimiser

    def h(x, level):
        return jnp.sin(x)

    rng = np.random.default_rng(1)
    y = rng.uniform(-1, 1, size=(64, 1)).astype(np.float32)
    x_gt = np.arcsin(y)
    x0 = np.full_like(x_gt, 0.5)

    sdo_a = SupervisedDescentOptimiser([LinearRegressor() for _ in range(3)])
    sdo_a.train(x_gt, x0, y, h)

    mesh = make_mesh()
    sdo_b = SupervisedDescentOptimiser([LinearRegressor() for _ in range(3)])
    sdo_b.train(shard_batch(jnp.asarray(x_gt), mesh),
                shard_batch(jnp.asarray(x0), mesh),
                shard_batch(jnp.asarray(y), mesh), h)
    for ra, rb in zip(sdo_a.regressors, sdo_b.regressors):
        np.testing.assert_allclose(np.asarray(ra.weights),
                                   np.asarray(rb.weights), rtol=2e-4,
                                   atol=1e-6)


def test_replicate_helper():
    mesh = make_mesh()
    x = replicate(jnp.ones((4, 4)), mesh)
    assert x.sharding.is_fully_replicated


def test_train_rcr_mesh_matches_single_device():
    """Full RCR training with mesh=8 (zero-row padding + psum-reduced
    normal equations) must reproduce the single-device model."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_rcr_pipeline import (
        load_small_dataset, SMALL_HOG, SMALL_LANDMARKS, RIGHT_EYE, LEFT_EYE)
    from superviseddescent_tpu.models import (
        RcrTrainConfig, gt_facebox, train_rcr)
    from superviseddescent_tpu.utils.landmarks import to_landmark_collection

    if not os.path.isdir("/root/reference/examples/data/ibug_lfpw_trainset"):
        pytest.skip("reference data absent")

    stack, gt_rows = load_small_dataset()
    boxes = np.stack([
        gt_facebox(to_landmark_collection(r, SMALL_LANDMARKS))
        for r in gt_rows]).astype(np.float32)
    l = len(SMALL_LANDMARKS)
    mean = np.mean([np.concatenate([(r[:l] - b[0]) / b[2] - 0.5,
                                    (r[l:] - b[1]) / b[3] - 0.5])
                    for r, b in zip(gt_rows, boxes)], axis=0).astype(np.float32)
    cfg = RcrTrainConfig(
        hog_params=SMALL_HOG, num_perturbations=3, seed=7,
        regularisation=Regulariser(RegularisationType.MatrixNorm, 0.1,
                                   regularise_last_row=False))

    single = train_rcr(stack, gt_rows, boxes, SMALL_LANDMARKS,
                       RIGHT_EYE, LEFT_EYE, mean, cfg)
    mesh = make_mesh()
    # 5 faces x 4 inits = 20 samples -> padded to 24 over 8 devices
    dist = train_rcr(stack, gt_rows, boxes, SMALL_LANDMARKS,
                     RIGHT_EYE, LEFT_EYE, mean, cfg, mesh=mesh)

    for rs, rd in zip(single.sdo.regressors, dist.sdo.regressors):
        np.testing.assert_allclose(np.asarray(rd.weights),
                                   np.asarray(rs.weights),
                                   rtol=2e-2, atol=2e-4)
    p_s = np.asarray(single.detect_batch(stack, boxes))
    p_d = np.asarray(dist.detect_batch(stack, boxes))
    np.testing.assert_allclose(p_d, p_s, atol=0.05)  # px


def test_sharded_fused_detect_matches():
    """The fused whole-cascade kernel under shard_map (8-device mesh)
    must match the single-device fused result exactly (pure data
    parallelism, no collectives)."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    if not os.path.isdir("/root/reference/examples/data/ibug_lfpw_trainset"):
        pytest.skip("reference data absent")
    from test_rcr_pipeline import (
        load_small_dataset, SMALL_HOG, SMALL_LANDMARKS, RIGHT_EYE, LEFT_EYE)
    from superviseddescent_tpu.models import (
        RcrTrainConfig, gt_facebox, train_rcr)
    from superviseddescent_tpu.parallel.dist import sharded_detect_fused
    from superviseddescent_tpu.utils.landmarks import to_landmark_collection
    from superviseddescent_tpu.ops.patches import stack_images

    stack, gt_rows = load_small_dataset()
    boxes = np.stack([
        gt_facebox(to_landmark_collection(r, SMALL_LANDMARKS))
        for r in gt_rows]).astype(np.float32)
    l = len(SMALL_LANDMARKS)
    mean = np.mean([np.concatenate([(r[:l] - b[0]) / b[2] - 0.5,
                                    (r[l:] - b[1]) / b[3] - 0.5])
                    for r, b in zip(gt_rows, boxes)], axis=0).astype(np.float32)
    cfg = RcrTrainConfig(
        hog_params=SMALL_HOG, num_perturbations=2, seed=3,
        regularisation=Regulariser(RegularisationType.MatrixNorm, 0.1,
                                   regularise_last_row=False))
    model = train_rcr(stack, gt_rows, boxes, SMALL_LANDMARKS,
                      RIGHT_EYE, LEFT_EYE, mean, cfg)

    # 8 faces over 8 devices (tile the 5 LFPW faces)
    sel = np.arange(8) % stack.shape[0]
    stack128, _ = stack_images(
        [np.asarray(stack[i]) for i in sel], pad_width_to=128)
    boxes8 = boxes[sel]

    single = np.asarray(model.make_fused_detector(roi=512,
                                                  max_ied=145.0)(
        stack128, boxes8))
    mesh = make_mesh()
    sharded = np.asarray(sharded_detect_fused(
        model, stack128, boxes8, mesh, roi=512, max_ied=145.0))
    np.testing.assert_allclose(sharded, single, atol=1e-4)


def test_sharded_fused_multisegment_matches():
    """Multi-segment lane packing (29 landmarks x 5 cells = 145 lanes ->
    2 seg_packing segments) under shard_map must match the single-device
    fused result exactly (pure data parallelism)."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import _tiny_model
    from superviseddescent_tpu.parallel.dist import sharded_detect_fused

    model = _tiny_model(num_landmarks=29, levels=2, seed=4, hog_cells=5)
    rng = np.random.default_rng(6)
    batch = 8
    imgs = rng.integers(0, 256, size=(batch, 128, 128)).astype(np.float32)
    boxes = np.tile(np.float32([40, 40, 48, 48]), (batch, 1))

    single = np.asarray(model.make_fused_detector(roi=128)(imgs, boxes))
    assert np.isfinite(single).all()
    mesh = make_mesh()
    sharded = np.asarray(sharded_detect_fused(
        model, imgs, boxes, mesh, roi=128))
    np.testing.assert_allclose(sharded, single, atol=1e-4)


def test_sharded_fused_frames_path_matches():
    """The SHIPPING serving input class under the mesh (VERDICT r4
    item 6): a uint8 stack with (32, 128)-aligned shape routes each
    shard's detect through the in-kernel window-DMA crop
    (ops/cascade_pallas.py::detect_cascade_fused_frames) rather than the
    legacy f32 crop prologue the other sharded tests cover. Pure data
    parallelism over faces: the sharded output must EQUAL the
    single-device frames output."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import _tiny_model
    from superviseddescent_tpu.parallel.dist import sharded_detect_fused

    model = _tiny_model(num_landmarks=6, levels=2, seed=2)
    rng = np.random.default_rng(7)
    batch = 8
    imgs = rng.integers(0, 256, size=(batch, 128, 128)).astype(np.uint8)
    boxes = np.tile(np.float32([40, 40, 48, 48]), (batch, 1))

    # guard the premise: this input class must select the frames path
    # (if the router's eligibility rule changes, fail loudly rather than
    # silently re-testing the legacy prologue)
    from superviseddescent_tpu.ops.cascade_pallas import (
        FRAME_COL_ALIGN, FRAME_ROW_ALIGN)
    assert (imgs.dtype == np.uint8
            and imgs.shape[2] % FRAME_COL_ALIGN == 0
            and imgs.shape[1] % FRAME_ROW_ALIGN == 0)

    single = np.asarray(model.make_fused_detector(roi=128)(imgs, boxes))
    assert np.isfinite(single).all()
    # the legacy f32 prologue on the same pixels is a different code path
    # but identical math up to window-origin alignment — stay within .5px
    legacy = np.asarray(model.make_fused_detector(roi=128)(
        imgs.astype(np.float32), boxes))
    np.testing.assert_allclose(single, legacy, atol=0.5)
    mesh = make_mesh()
    sharded = np.asarray(sharded_detect_fused(
        model, imgs, boxes, mesh, roi=128))
    np.testing.assert_array_equal(sharded, single)


def test_train_rcr_mesh_window_backend_matches():
    """Mesh training with the memory-scalable WINDOW extraction backend
    (roi crop + Pallas window sampler — the 300-W training config,
    VERDICT r3 item 5): the Pallas kernel is GSPMD-opaque, so the
    extraction runs through parallel.dist.ShardedHogTransform (explicit
    per-shard shard_map). Weights must match the single-device window-
    backend result (extraction is per-sample exact; only the psum
    summation order differs in the solve), at a 300-W-ish sample count
    (48 faces x 11 inits = 528 samples over the 8-device mesh)."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_rcr_pipeline import (
        load_small_dataset, SMALL_HOG, SMALL_LANDMARKS, RIGHT_EYE, LEFT_EYE)
    from superviseddescent_tpu.models import (
        RcrTrainConfig, gt_facebox, train_rcr)
    from superviseddescent_tpu.utils.landmarks import to_landmark_collection

    if not os.path.isdir("/root/reference/examples/data/ibug_lfpw_trainset"):
        pytest.skip("reference data absent")

    stack, gt_rows = load_small_dataset()
    boxes5 = np.stack([
        gt_facebox(to_landmark_collection(r, SMALL_LANDMARKS))
        for r in gt_rows]).astype(np.float32)
    l = len(SMALL_LANDMARKS)
    mean = np.mean([np.concatenate([(r[:l] - b[0]) / b[2] - 0.5,
                                    (r[l:] - b[1]) / b[3] - 0.5])
                    for r, b in zip(gt_rows, boxes5)],
                   axis=0).astype(np.float32)
    sel = (np.arange(48) % stack.shape[0]).astype(np.int32)
    gt48, bx48 = gt_rows[sel], boxes5[sel]
    stack_u8 = np.asarray(stack, np.uint8)
    cfg = RcrTrainConfig(
        hog_params=SMALL_HOG, num_perturbations=10, seed=7, roi=512,
        patch_backend="window", sampling="fast", hog_fast=True,
        solver_method="cholesky", feature_chunk_size=256,
        regularisation=Regulariser(RegularisationType.MatrixNorm, 0.1,
                                   regularise_last_row=False))

    single = train_rcr(stack_u8, gt48, bx48, SMALL_LANDMARKS,
                       RIGHT_EYE, LEFT_EYE, mean, cfg, image_indices=sel)
    mesh = make_mesh()
    dist = train_rcr(stack_u8, gt48, bx48, SMALL_LANDMARKS,
                     RIGHT_EYE, LEFT_EYE, mean, cfg, image_indices=sel,
                     mesh=mesh)

    for rs, rd in zip(single.sdo.regressors, dist.sdo.regressors):
        np.testing.assert_allclose(np.asarray(rd.weights),
                                   np.asarray(rs.weights),
                                   rtol=2e-2, atol=2e-4)
    p_s = np.asarray(single.detect_batch(stack, boxes5))
    p_d = np.asarray(dist.detect_batch(stack, boxes5))
    np.testing.assert_allclose(p_d, p_s, atol=0.05)  # px
