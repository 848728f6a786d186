"""QR diagnostic solver: rank warning + agreement with LU on regular systems."""

import numpy as np
import pytest

from superviseddescent_tpu import Regulariser, RegularisationType
from superviseddescent_tpu.ops.solver import solve_ridge_normal_equations


def test_qr_agrees_with_lu():
    rng = np.random.default_rng(0)
    data = rng.normal(size=(40, 12)).astype(np.float32)
    labels = rng.normal(size=(40, 3)).astype(np.float32)
    reg = Regulariser(RegularisationType.Manual, 2.0, True)
    w_lu = np.asarray(solve_ridge_normal_equations(data, labels, reg, "lu"))
    w_qr = np.asarray(solve_ridge_normal_equations(data, labels, reg, "qr"))
    np.testing.assert_allclose(w_qr, w_lu, rtol=2e-4, atol=1e-5)


def test_qr_warns_on_singular(capfd):
    # 1 sample, 2 features, no regularisation -> rank-1 normal matrix
    data = np.ones((1, 2), np.float32)
    labels = np.ones((1, 1), np.float32)
    import jax
    w = solve_ridge_normal_equations(data, labels, Regulariser(), "qr")
    jax.block_until_ready(w)
    jax.effects_barrier()
    err = capfd.readouterr().err
    assert "Increase lambda" in err


def test_qr_no_warning_when_regularised(capfd):
    data = np.ones((1, 2), np.float32)
    labels = np.ones((1, 1), np.float32)
    reg = Regulariser(RegularisationType.Manual, 1.0, True)
    import jax
    w = solve_ridge_normal_equations(data, labels, reg, "qr")
    jax.block_until_ready(w)
    jax.effects_barrier()
    assert "Increase lambda" not in capfd.readouterr().err
    np.testing.assert_allclose(np.asarray(w)[:, 0], [1/3, 1/3], rtol=1e-5)
