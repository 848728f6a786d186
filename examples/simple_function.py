"""Hello-world: invert sin(x) with a cascade of linear regressors.

Rebuild of /root/reference/examples/simple_function.cpp: train 10
unregularised regressors to step from x0 = 0.5 toward asin(y), then test on
a finer grid. Run: python examples/simple_function.py
"""

import numpy as np
import jax.numpy as jnp

from superviseddescent_tpu import LinearRegressor, SupervisedDescentOptimiser


def grid(start, step, n):
    out = np.empty(n, np.float32)
    v = np.float32(start)
    for i in range(n):
        out[i] = v
        v = np.float32(v + np.float32(step))
    return out


def main():
    h = lambda x, level: jnp.sin(x)

    y_tr = grid(-1.0, 0.2, 11).reshape(-1, 1)
    x_tr = np.arcsin(np.minimum(y_tr, np.float32(1.0)))
    x0 = np.full_like(x_tr, 0.5)

    sdo = SupervisedDescentOptimiser([LinearRegressor() for _ in range(10)])

    def print_residual(current_x):
        r = np.linalg.norm(np.asarray(current_x) - x_tr) / np.linalg.norm(x_tr)
        print(f"train residual: {r:.6f}")

    print("Training, residual after each regressor:")
    sdo.train(x_tr, x0, y_tr, h, on_training_epoch_callback=print_residual)

    y_ts = grid(-1.0, 0.05, 41).reshape(-1, 1)
    x_ts_gt = np.arcsin(np.minimum(y_ts, np.float32(1.0)))
    pred = sdo.test(np.full_like(x_ts_gt, 0.5), y_ts, h)
    r = np.linalg.norm(np.asarray(pred) - x_ts_gt) / np.linalg.norm(x_ts_gt)
    print(f"test residual: {r:.6f}  (reference pins 0.026157)")


if __name__ == "__main__":
    main()
