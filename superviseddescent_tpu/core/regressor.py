"""Linear regressor pytree.

Mirrors the capability surface of the reference LinearRegressor
(/root/reference/include/superviseddescent/regressors.hpp:318-400):
learn (ridge normal-equations solve), predict (values @ W), test
(normalised L2 residual ||pred - labels|| / ||labels||) — but batched:
predict takes (N, F) and returns (N, L); the reference predicts one row at a
time from inside a thread-pool loop.

The regressor is registered as a pytree so a cascade of them can be stacked
into a single (levels, F, L) weight tensor and scanned over inside one jit.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp

from superviseddescent_tpu.core.regulariser import Regulariser
from superviseddescent_tpu.ops.solver import solve_ridge_normal_equations


@jax.tree_util.register_dataclass
@dataclass
class LinearRegressor:
    """Ridge-regularised multi-output linear regressor.

    Attributes:
      weights: (F, L) learned coefficient matrix (None before learn()).
        Public like the reference's `x` member (regressors.hpp:383).
      regulariser: static ridge configuration (not traced).
      method: "lu" | "cholesky" factorisation (not traced).
    """

    weights: Optional[jnp.ndarray] = None
    regulariser: Regulariser = field(
        default=Regulariser(), metadata=dict(static=True))
    method: str = field(default="lu", metadata=dict(static=True))

    def learn(self, data: jnp.ndarray, labels: jnp.ndarray) -> "LinearRegressor":
        """Pure functional learn: returns a new regressor with weights set.

        data: (N, F); labels: (N, L). Each label column is learned
        independently through the shared factorisation.
        """
        w = solve_ridge_normal_equations(
            data, labels, regulariser=self.regulariser, method=self.method)
        return LinearRegressor(weights=w, regulariser=self.regulariser,
                               method=self.method)

    def predict(self, values: jnp.ndarray) -> jnp.ndarray:
        """values: (..., F) -> (..., L)."""
        if self.weights is None:
            raise ValueError("predict() before learn(): weights are unset")
        # HIGHEST keeps true-f32 multiplies on the MXU (default would be
        # bf16); required for the 1e-4 IOD-normalised landmark parity target.
        return jnp.dot(values, self.weights,
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=values.dtype)

    def test(self, data: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
        """Normalised least-squares residual ||pred - labels|| / ||labels||
        (reference: regressors.hpp:361-369). Returns a scalar array."""
        predictions = self.predict(data)
        return (jnp.linalg.norm(predictions - labels)
                / jnp.linalg.norm(labels))
