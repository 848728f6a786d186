"""Ridge regularisation for the linear-regressor normal equations.

Behaviour parity with the reference Regulariser
(/root/reference/include/superviseddescent/regressors.hpp:87-169):

  * ``Manual``     — lambda is used as given.
  * ``MatrixNorm`` — lambda = param * ||AtA||_F / num_training_samples, where
    the Frobenius norm is taken of the *normal matrix* A^T A (the reference
    passes AtA as `data` to get_matrix, regressors.hpp:211-212) and the
    divisor is the number of training rows of A (`data.rows` at the call
    site). cv::norm's default for a matrix is the Frobenius norm.
  * ``regularise_last_row=False`` zeroes the regularisation of the last
    diagonal entry (the bias row), regressors.hpp:143-146.

The reference has a state-mutation quirk: MatrixNorm overwrites its stored
lambda in place, so a second learn() on the same regressor compounds it
(regressors.hpp:135). We reproduce the behaviour *per single train* and keep
the regulariser immutable (documented deviation; the reference never re-learns
a regressor within one training run).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass

import jax.numpy as jnp


class RegularisationType(enum.IntEnum):
    """How to compute lambda. Integer values match the on-disk cereal enum
    encoding of the reference (int32, Manual=0, MatrixNorm=1)."""

    Manual = 0
    MatrixNorm = 1


@dataclass(frozen=True)
class Regulariser:
    """Static (non-traced) configuration of the ridge term.

    Args:
      regularisation_type: Manual (lambda = param) or MatrixNorm
        (lambda = param * ||AtA||_F / n_samples).
      param: lambda itself, or the MatrixNorm factor.
      regularise_last_row: if False, the bias (last) diagonal entry gets no
        regularisation.
    """

    regularisation_type: RegularisationType = RegularisationType.Manual
    param: float = 0.0
    regularise_last_row: bool = True

    def lambda_value(self, ata: jnp.ndarray, num_training_elements: int):
        """Scalar lambda given the normal matrix AtA and the sample count.

        Traceable: `ata` may be a tracer; the result is a scalar array.
        """
        if self.regularisation_type == RegularisationType.Manual:
            return jnp.asarray(self.param, dtype=ata.dtype)
        # MatrixNorm: the reference computes the Frobenius norm in double and
        # casts to float (regressors.hpp:135); in f32 mode we compute in f32.
        frob = jnp.sqrt(jnp.sum(jnp.square(ata)))
        return (jnp.asarray(self.param, ata.dtype) * frob
                / jnp.asarray(num_training_elements, ata.dtype))

    def diagonal(self, ata: jnp.ndarray, num_training_elements: int):
        """Diagonal regularisation vector of length ata.shape[0]."""
        n = ata.shape[0]
        lam = self.lambda_value(ata, num_training_elements)
        diag = jnp.full((n,), lam, dtype=ata.dtype)
        if not self.regularise_last_row:
            diag = diag.at[n - 1].set(0.0)
        return diag
