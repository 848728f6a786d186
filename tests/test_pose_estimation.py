"""Pose-estimation end-to-end test: the known-template SDM branch.

Rebuild of /root/reference/examples/pose_estimation.cpp:254-336: train a
3-level cascade on 500 random poses of the 10-point face model and recover
the pose of the hardcoded landmark set (expected pitch ~= 11, yaw ~= -25,
roll ~= -10).
"""

import numpy as np

from superviseddescent_tpu import (LinearRegressor, SupervisedDescentOptimiser,
                                   Regulariser, RegularisationType)
from superviseddescent_tpu.models.pose import PoseProjection, IBUG_10PT_FACE_MODEL


def test_pose_projection_geometry():
    proj = PoseProjection(IBUG_10PT_FACE_MODEL)
    # At identity rotation and tz=-2000, the nose tip (near origin) must
    # project close to the image center (normalised ~0).
    out = np.asarray(proj(np.float32([0, 0, 0, 0, 0, -2000])))
    assert out.shape == (20,)
    assert abs(out[0]) < 0.01 and abs(out[10]) < 0.01
    # Right-eye outer corner (x<0 in model space) projects left of center.
    assert out[2] < 0
    # y axis is flipped (image origin top-left): model +y (up) -> -y image.
    assert out[12] < 0  # eye corner is above center


def test_pose_estimation_cascade():
    rng = np.random.default_rng(7)
    proj = PoseProjection(IBUG_10PT_FACE_MODEL)

    num_samples = 500
    angles = rng.uniform(-30, 30, size=(num_samples, 3)).astype(np.float32)
    x_tr = np.concatenate([
        angles,
        np.tile(np.float32([0.0, 0.0, -2000.0]), (num_samples, 1))], axis=1)
    y_tr = np.asarray(proj(x_tr))

    x0 = np.zeros_like(x_tr)
    x0[:, 5] = -2000.0

    reg = Regulariser(RegularisationType.MatrixNorm, 2.0, True)
    sdo = SupervisedDescentOptimiser(
        [LinearRegressor(regulariser=reg) for _ in range(3)])
    residuals = []
    sdo.train(x_tr, x0, y_tr, proj,
              on_training_epoch_callback=lambda x: residuals.append(
                  float(np.linalg.norm(np.asarray(x) - x_tr)
                        / np.linalg.norm(x_tr))))
    assert residuals[-1] < residuals[0]

    # The hardcoded test landmarks of the reference (:325-327), normalised.
    landmarks = np.float32([498, 504, 479, 498, 529, 553, 489, 503, 527, 503,
                            502, 513, 457, 465, 471, 471, 522, 522, 530, 536])
    landmarks = (landmarks - 500.0) / 1800.0
    init = np.zeros(6, np.float32)
    init[5] = -2000.0
    predicted = np.asarray(sdo.predict(init, landmarks[None, :], proj))
    pitch, yaw, roll = predicted[:3]
    # reference prints expected ~ pitch 11, yaw -25, roll -10
    assert abs(pitch - 11.0) < 4.0
    assert abs(yaw - (-25.0)) < 4.0
    assert abs(roll - (-10.0)) < 4.0
