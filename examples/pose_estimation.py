"""6-DoF pose estimation from 2D landmarks (known-template SDM).

Rebuild of /root/reference/examples/pose_estimation.cpp: learn descent
directions for [pitch, yaw, roll, tx, ty, tz] from 500 random poses of a
10-point 3D face model; recover the pose of a hardcoded landmark set.
Run: python examples/pose_estimation.py
"""

import numpy as np

from superviseddescent_tpu import (LinearRegressor, Regulariser,
                                   RegularisationType,
                                   SupervisedDescentOptimiser)
from superviseddescent_tpu.models.pose import (IBUG_10PT_FACE_MODEL,
                                               PoseProjection)


def main():
    rng = np.random.default_rng()  # the reference uses a random_device seed
    proj = PoseProjection(IBUG_10PT_FACE_MODEL)

    num_samples = 500
    angles = rng.uniform(-30, 30, size=(num_samples, 3)).astype(np.float32)
    x_tr = np.concatenate(
        [angles, np.tile(np.float32([0, 0, -2000]), (num_samples, 1))], axis=1)
    y_tr = np.asarray(proj(x_tr))
    x0 = np.zeros_like(x_tr)
    x0[:, 5] = -2000.0

    reg = Regulariser(RegularisationType.MatrixNorm, 2.0, True)
    sdo = SupervisedDescentOptimiser(
        [LinearRegressor(regulariser=reg) for _ in range(3)])

    def print_residual(x):
        r = np.linalg.norm(np.asarray(x) - x_tr) / np.linalg.norm(x_tr)
        print(f"train residual: {r:.6f}")

    print("Training, residual after each regressor:")
    sdo.train(x_tr, x0, y_tr, proj, on_training_epoch_callback=print_residual)

    landmarks = np.float32([498, 504, 479, 498, 529, 553, 489, 503, 527, 503,
                            502, 513, 457, 465, 471, 471, 522, 522, 530, 536])
    landmarks = (landmarks - 500.0) / 1800.0
    init = np.zeros(6, np.float32)
    init[5] = -2000.0
    pred = np.asarray(sdo.predict(init, landmarks[None, :], proj))
    print("Groundtruth pose: pitch = 11.0, yaw = -25.0, roll = -10.0")
    print(f"Predicted pose:   pitch = {pred[0]:.1f}, yaw = {pred[1]:.1f}, "
          f"roll = {pred[2]:.1f}")


if __name__ == "__main__":
    main()
