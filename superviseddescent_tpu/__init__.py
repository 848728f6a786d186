"""superviseddescent_tpu — a TPU-native JAX framework for the Supervised Descent Method.

A from-scratch rebuild of the capabilities of patrikhuber/superviseddescent
(SDM cascades of learned linear regressors; RCR facial landmark detection with
VLFeat-style HOG features), designed TPU-first:

  * the cascade train/test/predict loops are jit-compiled, vmapped over samples
    (reference: per-sample std::thread pool, superviseddescent.hpp:166-344);
  * the ridge normal-equations solve runs as a batched GEMM + LU/Cholesky on
    the MXU (reference: Eigen PartialPivLU, regressors.hpp:180-235);
  * the HOG descriptor is a composition of dense matmuls + elementwise ops
    (and a fused Pallas kernel), batched over [faces x landmarks] patches
    (reference: scalar C loops, rcr/hog.c);
  * multi-chip scaling uses jax.sharding Meshes with psum-reduced partial
    normal equations (the reference is single-process CPU only).
"""

__version__ = "0.1.0"

from superviseddescent_tpu.core.regulariser import Regulariser, RegularisationType
from superviseddescent_tpu.core.regressor import LinearRegressor
from superviseddescent_tpu.core.cascade import (
    SupervisedDescentOptimiser,
    NoNormalisation,
)

__all__ = [
    "Regulariser",
    "RegularisationType",
    "LinearRegressor",
    "SupervisedDescentOptimiser",
    "NoNormalisation",
]
