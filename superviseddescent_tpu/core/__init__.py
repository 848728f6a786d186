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
