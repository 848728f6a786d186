"""LinearRegressor conformance tests.

Ports the expectations of the reference tests
/root/reference/tests/test_LinearRegressor1D.cpp and
test_LinearRegressorND.cpp (Matlab-derived ground-truth coefficients) to the
JAX implementation. The reference asserts EXPECT_FLOAT_EQ on f32 Eigen LU
results; we assert the same constants with small tolerances since a different
(but equally valid) f32 factorisation is used.
"""

import numpy as np
import pytest

from superviseddescent_tpu import LinearRegressor, Regulariser, RegularisationType


def learn(data, labels, reg=None, method="lu"):
    lr = LinearRegressor(regulariser=reg or Regulariser(), method=method)
    return lr.learn(np.asarray(data, np.float32), np.asarray(labels, np.float32))


# --------------------------------------------------------------------- #
# 1D tests (test_LinearRegressor1D.cpp)
# --------------------------------------------------------------------- #
def test_one_dim_learning():
    lr = learn([[1.0]], [[1.0]])
    assert lr.weights.shape == (1, 1)
    np.testing.assert_allclose(np.asarray(lr.weights)[0, 0], 1.0, rtol=1e-6)


def test_one_dim_prediction():
    lr = learn([[1.0]], [[1.0]])
    pred = lr.predict(np.asarray([[2.0]], np.float32))
    np.testing.assert_allclose(np.asarray(pred)[0, 0], 2.0, rtol=1e-6)


def test_one_dim_residual():
    # Exact expected residual from test_LinearRegressor1D.cpp:84-103:
    # learn 1->1, test [0,1,2] against gt [-1,2,2] => sqrt(2)/3.
    lr = learn([[1.0]], [[1.0]])
    data = np.asarray([[0.0], [1.0], [2.0]], np.float32)
    labels = np.asarray([[-1.0], [2.0], [2.0]], np.float32)
    residual = float(lr.test(data, labels))
    np.testing.assert_allclose(residual, 0.47140452079103173, rtol=1e-6)


# --------------------------------------------------------------------- #
# ND tests (test_LinearRegressorND.cpp)
# --------------------------------------------------------------------- #
def test_one_example_regularisation_makes_solvable():
    # test_LinearRegressorND.cpp:21-32: singular 1-sample system + lambda=1
    reg = Regulariser(RegularisationType.Manual, 1.0, True)
    lr = learn([[1.0, 1.0]], [[1.0]], reg)
    w = np.asarray(lr.weights)
    np.testing.assert_allclose(w[:, 0], [1.0 / 3.0, 1.0 / 3.0], rtol=1e-6)


def test_two_examples_learning():
    lr = learn([[0.0, 1.0], [1.0, 1.0]], [[0.0], [1.0]])
    w = np.asarray(lr.weights)
    np.testing.assert_allclose(w[:, 0], [1.0, 0.0], atol=1e-6)


def test_two_examples_prediction():
    lr = learn([[0.0, 1.0], [1.0, 1.0]], [[0.0], [1.0]])
    pred = np.asarray(lr.predict(np.asarray([[2.0, 2.0]], np.float32)))
    np.testing.assert_allclose(pred[0, 0], 2.0, atol=1e-6)


def test_two_examples_residual():
    lr = learn([[0.0, 1.0], [1.0, 1.0]], [[0.0], [1.0]])
    test = np.asarray([[0.0, 2.0], [2.0, 1.0], [2.0, 1.0]], np.float32)
    gt = np.asarray([[0.0], [2.0], [-1.0]], np.float32)
    np.testing.assert_allclose(float(lr.test(test, gt)), 1.3416407, atol=1e-6)


def test_multi_label_learning():
    # Every label column gets its own coefficient column (ND.cpp:90-103).
    lr = learn([[0.0, 1.0], [1.0, 1.0]], [[0.0, 1.0], [1.0, 1.0]])
    w = np.asarray(lr.weights)
    np.testing.assert_allclose(w, [[1.0, 0.0], [0.0, 1.0]], atol=1e-6)


def test_multi_label_prediction():
    lr = learn([[0.0, 1.0], [1.0, 1.0]], [[0.0, 1.0], [1.0, 1.0]])
    pred = np.asarray(lr.predict(np.asarray([[1.0, 2.0]], np.float32)))
    np.testing.assert_allclose(pred[0], [1.0, 2.0], atol=1e-6)


def test_multi_label_residual():
    lr = learn([[0.0, 1.0], [1.0, 1.0]], [[0.0, 1.0], [1.0, 1.0]])
    test = np.asarray([[0.0, 2.0], [2.0, 1.0], [2.0, 1.0]], np.float32)
    gt = np.asarray([[0.0, 0.0], [2.0, 4.0], [-1.0, -2.0]], np.float32)
    np.testing.assert_allclose(float(lr.test(test, gt)), 1.11355285, atol=2e-7)


DATA_5x3 = [[1, 4, 2], [4, 9, 1], [6, 5, 2], [0, 6, 2], [6, 1, 9]]
LABELS_5x2 = [[1, 1], [2, 5], [3, -2], [0, 5], [6, 3]]


def test_many_examples_matlab_coefficients():
    lr = learn(DATA_5x3, LABELS_5x2)
    w = np.asarray(lr.weights)
    expected = np.array([[0.489539, -0.833899379],
                         [-0.06608297, 0.626753688],
                         [0.339629412, 0.744218946]], np.float32)
    np.testing.assert_allclose(w, expected, rtol=3e-5)


def test_many_examples_regularised():
    reg = Regulariser(RegularisationType.Manual, 50.0, True)
    lr = learn(DATA_5x3, LABELS_5x2, reg)
    w = np.asarray(lr.weights)
    expected = np.array([[0.282755911, -0.0989616],
                         [0.03607957, 0.330635577],
                         [0.291039944, 0.217046738]], np.float32)
    np.testing.assert_allclose(w, expected, rtol=3e-5)


def _with_bias(rows):
    return [list(r) + [1.0] for r in rows]


def test_many_examples_bias():
    lr = learn(_with_bias(DATA_5x3), LABELS_5x2)
    w = np.asarray(lr.weights)
    expected = np.array([[0.485009, -0.894791],
                         [0.012218, 1.679203],
                         [0.407823, 1.660814],
                         [-0.61515, -8.26833]], np.float32)
    np.testing.assert_allclose(w, expected, rtol=2e-3, atol=2e-4)


def test_many_examples_bias_regularised():
    reg = Regulariser(RegularisationType.Manual, 50.0, True)
    lr = learn(_with_bias(DATA_5x3), LABELS_5x2, reg)
    w = np.asarray(lr.weights)
    expected = np.array([[0.2814246, -0.1005448],
                         [0.03317654, 0.327183396],
                         [0.289116770, 0.214759737],
                         [0.0320090912, 0.03806401]], np.float32)
    np.testing.assert_allclose(w, expected, rtol=3e-5, atol=1e-6)


def test_many_examples_bias_regularised_but_not_bias():
    # Bias row exempt from lambda (ND.cpp:255-282; regressors.hpp:143-146)
    reg = Regulariser(RegularisationType.Manual, 50.0, False)
    lr = learn(_with_bias(DATA_5x3), LABELS_5x2, reg)
    w = np.asarray(lr.weights)
    expected = np.array([[0.2188783, -0.174922630],
                         [-0.1032114, 0.164996058],
                         [0.1987606, 0.1073116],
                         [1.53583705, 1.82635951]], np.float32)
    np.testing.assert_allclose(w, expected, rtol=3e-5, atol=1e-6)


@pytest.mark.parametrize("method", ["lu", "cholesky"])
def test_solver_methods_agree(method):
    reg = Regulariser(RegularisationType.MatrixNorm, 1.5, False)
    rng = np.random.default_rng(0)
    data = rng.normal(size=(64, 17)).astype(np.float32)
    data[:, -1] = 1.0
    labels = rng.normal(size=(64, 4)).astype(np.float32)
    lr = learn(data, labels, reg, method=method)
    # cross-check against numpy f64 (the debugging parity mode)
    a64 = data.astype(np.float64)
    ata = a64.T @ a64
    lam = 1.5 * np.linalg.norm(ata, "fro") / data.shape[0]
    diag = np.full(17, lam)
    diag[-1] = 0.0
    w64 = np.linalg.solve(ata + np.diag(diag), a64.T @ labels.astype(np.float64))
    # f32 normal equations square the condition number; ~1e-3 abs agreement
    # with the f64 reference is the expected envelope here.
    np.testing.assert_allclose(np.asarray(lr.weights), w64, atol=2e-3)
