"""SDM cascade convergence conformance suite.

Ports /root/reference/tests/test_SupervisedDescentOptimiser.cpp: cascades of
linear regressors inverting sin/x^3/erf/exp, single-level and 10-level, plus
the multi-output (sin + erf) case. The pinned residuals are the de-facto
conformance constants of the reference (BASELINE.md); they were produced by
f32 Eigen LU + libm, so we assert them within small absolute tolerances that
absorb f32 transcendental/factorisation differences on XLA.
"""

import jax.numpy as jnp
import jax.scipy.special
import numpy as np
from scipy.special import erfinv

from superviseddescent_tpu import LinearRegressor, SupervisedDescentOptimiser


def strided_iota(start, step, n):
    """f32 accumulation loop, matching the reference's strided_iota
    (value += stride in float, test_SupervisedDescentOptimiser.cpp:16-23)."""
    out = np.empty(n, np.float32)
    v = np.float32(start)
    for i in range(n):
        out[i] = v
        v = np.float32(v + np.float32(step))
    return out


def nlsr(prediction, groundtruth):
    p = np.asarray(prediction, np.float64)
    g = np.asarray(groundtruth, np.float64)
    return np.linalg.norm(p - g) / np.linalg.norm(g)


def run_case(h, h_inv, train_grid, test_grid, num_regressors):
    y_tr = train_grid.reshape(-1, 1)
    x_tr = h_inv(y_tr).astype(np.float32)
    x0 = np.full_like(x_tr, 0.5)

    sdo = SupervisedDescentOptimiser(
        [LinearRegressor() for _ in range(num_regressors)])
    sdo.train(x_tr, x0, y_tr, h)
    train_pred = sdo.test(x0, y_tr, h)

    y_ts = test_grid.reshape(-1, 1)
    x_ts_gt = h_inv(y_ts).astype(np.float32)
    x0_ts = np.full_like(x_ts_gt, 0.5)
    test_pred = sdo.test(x0_ts, y_ts, h)
    return nlsr(train_pred, x_tr), nlsr(test_pred, x_ts_gt)


def h_sin(x, level):
    return jnp.sin(x)


def asin_clipped(y):
    # reference clamps y >= 1 to asin(1) (test file :33-38)
    return np.arcsin(np.minimum(y, np.float32(1.0)))


def test_sin_convergence_single():
    train_r, test_r = run_case(
        h_sin, asin_clipped,
        strided_iota(-1.0, 0.2, 11), strided_iota(-1.0, 0.05, 41), 1)
    np.testing.assert_allclose(train_r, 0.21369851877468238, atol=2e-6)
    np.testing.assert_allclose(test_r, 0.1800101229, atol=2e-6)


def test_sin_convergence_cascade():
    train_r, test_r = run_case(
        h_sin, asin_clipped,
        strided_iota(-1.0, 0.2, 11), strided_iota(-1.0, 0.05, 41), 10)
    np.testing.assert_allclose(train_r, 0.040279395, atol=5e-6)
    np.testing.assert_allclose(test_r, 0.026156775, atol=5e-6)


def test_sin_callback_mechanism():
    # The per-level callback fires with current predictions (ref :58-63).
    grid = strided_iota(-1.0, 0.2, 11)
    y_tr = grid.reshape(-1, 1)
    x_tr = asin_clipped(y_tr).astype(np.float32)
    x0 = np.full_like(x_tr, 0.5)
    seen = []
    sdo = SupervisedDescentOptimiser([LinearRegressor()])
    history = sdo.train(x_tr, x0, y_tr, h_sin,
                        on_training_epoch_callback=lambda x: seen.append(x))
    assert len(seen) == 1
    np.testing.assert_allclose(nlsr(seen[0], x_tr), 0.21369851877468238,
                               atol=2e-6)
    assert history.shape == (1,) + x_tr.shape


def h_cube(x, level):
    return x ** 3


def test_xcube_convergence_single():
    train_r, test_r = run_case(
        h_cube, np.cbrt,
        strided_iota(-27.0, 3.0, 19), strided_iota(-27.0, 0.5, 109), 1)
    np.testing.assert_allclose(train_r, 0.34416553, atol=5e-6)
    np.testing.assert_allclose(test_r, 0.353428615, atol=3e-5)


def test_xcube_convergence_cascade():
    train_r, test_r = run_case(
        h_cube, np.cbrt,
        strided_iota(-27.0, 3.0, 19), strided_iota(-27.0, 0.5, 109), 10)
    np.testing.assert_allclose(train_r, 0.04312725, atol=2e-5)
    np.testing.assert_allclose(test_r, 0.05889855, atol=2e-5)


def h_erf(x, level):
    return jax.scipy.special.erf(x)


def erfinv32(y):
    return erfinv(np.asarray(y, np.float64)).astype(np.float32)


def test_erf_convergence_single():
    train_r, test_r = run_case(
        h_erf, erfinv32,
        strided_iota(-0.99, 0.11, 19), strided_iota(-0.99, 0.03, 67), 1)
    np.testing.assert_allclose(train_r, 0.30944183, atol=5e-6)
    np.testing.assert_allclose(test_r, 0.25736006, atol=5e-6)


def test_erf_convergence_cascade():
    train_r, test_r = run_case(
        h_erf, erfinv32,
        strided_iota(-0.99, 0.11, 19), strided_iota(-0.99, 0.03, 67), 10)
    np.testing.assert_allclose(train_r, 0.06951067, atol=1e-5)
    np.testing.assert_allclose(test_r, 0.04632717, atol=1e-5)


def h_exp(x, level):
    return jnp.exp(x)


def test_exp_convergence_single():
    train_r, test_r = run_case(
        h_exp, np.log,
        strided_iota(1.0, 3.0, 10), strided_iota(1.0, 0.5, 55), 1)
    np.testing.assert_allclose(train_r, 0.19952251597692217, atol=5e-6)
    np.testing.assert_allclose(test_r, 0.1924569501, atol=5e-6)


def test_exp_convergence_cascade():
    train_r, test_r = run_case(
        h_exp, np.log,
        strided_iota(1.0, 3.0, 10), strided_iota(1.0, 0.5, 55), 10)
    np.testing.assert_allclose(train_r, 0.02510868, atol=1e-5)
    np.testing.assert_allclose(test_r, 0.01253494, atol=1e-5)


def test_sin_erf_multi_y_cascade():
    # Multi-output cascade: column 0 is sin, column 1 is erf (ref :443-521).
    def h(x, level):
        return jnp.stack([jnp.sin(x[:, 0]),
                          jax.scipy.special.erf(x[:, 1])], axis=1)

    grid = strided_iota(-0.99, 0.11, 19)
    y_tr = np.stack([grid, grid], axis=1)
    x_tr = np.stack([asin_clipped(grid), erfinv32(grid)], axis=1)
    x0 = np.full_like(x_tr, 0.5)

    sdo = SupervisedDescentOptimiser([LinearRegressor() for _ in range(10)])
    sdo.train(x_tr, x0, y_tr, h)
    train_r = nlsr(sdo.test(x0, y_tr, h), x_tr)
    np.testing.assert_allclose(train_r, 0.0002677, atol=3e-5)

    grid_ts = strided_iota(-0.99, 0.03, 67)
    y_ts = np.stack([grid_ts, grid_ts], axis=1)
    x_ts_gt = np.stack([asin_clipped(grid_ts), erfinv32(grid_ts)], axis=1)
    x0_ts = np.full_like(x_ts_gt, 0.5)
    test_r = nlsr(sdo.test(x0_ts, y_ts, h), x_ts_gt)
    np.testing.assert_allclose(test_r, 0.0024807, atol=3e-5)


def test_predict_single_sample():
    # predict() on a single row matches the batched test() path.
    grid = strided_iota(-1.0, 0.2, 11)
    y_tr = grid.reshape(-1, 1)
    x_tr = asin_clipped(y_tr).astype(np.float32)
    x0 = np.full_like(x_tr, 0.5)
    sdo = SupervisedDescentOptimiser([LinearRegressor() for _ in range(10)])
    sdo.train(x_tr, x0, y_tr, h_sin)
    one = sdo.predict(np.asarray([0.5], np.float32),
                      np.asarray([[y_tr[3, 0]]], np.float32), h_sin)
    # approximation quality of the learned cascade, not a numerics bound
    np.testing.assert_allclose(np.asarray(one)[0], x_tr[3, 0], atol=2e-2)
    batched = sdo.test(np.asarray([[0.5]], np.float32),
                       np.asarray([[y_tr[3, 0]]], np.float32), h_sin)
    np.testing.assert_allclose(np.asarray(one)[0], np.asarray(batched)[0, 0],
                               rtol=1e-6)
