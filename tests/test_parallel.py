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
