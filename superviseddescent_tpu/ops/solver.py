"""Regularised least-squares solve via the normal equations, on the MXU.

Solves (A^T A + diag(reg)) W = A^T B for W, the TPU-native equivalent of the
reference's PartialPivLUSolver / ColPivHouseholderQRSolver / Verbose solver
(/root/reference/include/superviseddescent/regressors.hpp:180-306,
 verbose_solver.hpp:44-112):

  * A^T A and A^T B are single large GEMMs — they tile straight onto the MXU
    (this is hot loop #4 of the reference, the N x 8801 GEMM for RCR-22).
  * The factorisation uses LU (jnp.linalg.solve) to match the reference's
    PartialPivLU behaviour (no invertibility check); a Cholesky path is
    available since AtA + lambda*I is SPD whenever lambda > 0.
  * For multi-chip training the same math runs sharded: each shard computes
    its partial A_s^T A_s / A_s^T B_s and a psum over the batch axis forms the
    full normal equations (see parallel/dist_solver.py).

There is deliberately no "verbose" solver subclass: per-stage timing is a
flag (`profile=True` in utils/profiling.py) rather than a type, since under
jit the stages fuse anyway.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from superviseddescent_tpu.core.regulariser import Regulariser


@functools.partial(jax.jit, static_argnames=("regulariser", "method"))
def solve_ridge_normal_equations(
    data: jnp.ndarray,
    labels: jnp.ndarray,
    regulariser: Regulariser = Regulariser(),
    method: str = "lu",
) -> jnp.ndarray:
    """Solve (data^T data + diag(reg)) W = data^T labels.

    Args:
      data:   (N, F) design matrix, one sample per row.
      labels: (N, L) labels; each label column gets its own coefficient column
              (reference convention, regressors.hpp:318-350).
      regulariser: static ridge config. MatrixNorm uses ||AtA||_F / N.
      method: "lu" (parity with Eigen PartialPivLU) or "cholesky"
              (SPD fast path; valid when the regularised AtA is PD).

    Returns:
      (F, L) weight matrix W.
    """
    if data.ndim != 2 or labels.ndim != 2:
        raise ValueError("data and labels must be rank-2 (N,F) and (N,L)")
    n = data.shape[0]
    # HIGHEST precision: TPU f32 matmuls otherwise use bf16 multiplies, which
    # is fatal for the normal equations (condition number is squared).
    ata = jnp.dot(data.T, data, precision=jax.lax.Precision.HIGHEST,
                  preferred_element_type=data.dtype)
    atb = jnp.dot(data.T, labels, precision=jax.lax.Precision.HIGHEST,
                  preferred_element_type=data.dtype)
    return _solve_from_normal(ata, atb, n, regulariser, method)


def _solve_from_normal(ata, atb, num_samples, regulariser, method):
    """Shared tail: regularise AtA and factorise. Used by the local and the
    distributed (psum-reduced) paths."""
    diag = regulariser.diagonal(ata, num_samples)
    ata_reg = ata + jnp.diag(diag)
    if method == "cholesky":
        chol = jax.scipy.linalg.cho_factor(ata_reg, lower=True)
        return jax.scipy.linalg.cho_solve(chol, atb)
    if method == "lu":
        return jnp.linalg.solve(ata_reg, atb)
    if method == "qr":
        # Diagnostic path, analogous to the reference's
        # ColPivHouseholderQRSolver (regressors.hpp:245-306): estimates the
        # rank and warns when the regularised normal matrix is singular
        # ("Increase lambda"), then solves via the QR factors. Slower than
        # LU/Cholesky, like the reference's variant.
        q, r = jnp.linalg.qr(ata_reg)
        rdiag = jnp.abs(jnp.diagonal(r))
        n = ata_reg.shape[0]
        tol = jnp.finfo(ata_reg.dtype).eps * n * jnp.max(rdiag)
        rank = jnp.sum(rdiag > tol)

        def warn(rank_val, _n):
            import sys
            print(f"The regularised AtA is not invertible (rank "
                  f"{int(rank_val)}, full rank would be {int(_n)}). "
                  "The solve may return garbage. Increase lambda.",
                  file=sys.stderr, flush=True)

        jax.lax.cond(
            rank < n,
            lambda: jax.debug.callback(warn, rank, jnp.asarray(n)),
            lambda: None)
        return jax.scipy.linalg.solve_triangular(
            r, jnp.dot(q.T, atb, precision=jax.lax.Precision.HIGHEST),
            lower=False)
    raise ValueError(f"unknown solve method: {method!r}")
