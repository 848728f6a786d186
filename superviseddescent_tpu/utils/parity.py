"""Debugging parity modes.

The reference runs f32 Eigen LU on a CPU (regressors.hpp:199-235); XLA's
f32 factorisations differ in the last ulps, which a cascade can amplify.
For debugging numeric drift, SURVEY.md §4 prescribes an f64-on-CPU parity
mode: run the same cascade in float64, where both implementations agree to
~1e-7 and any larger difference is a real semantic bug, not float noise.
"""

from __future__ import annotations

import jax


def enable_f64(platform: str = "cpu") -> None:
    """Switch this process into the f64-on-CPU parity mode.

    Must be called before any jax computation. Enables x64 semantics (f64
    arrays stay f64 through the cascade, the solver factorises in f64) and
    pins the platform (TPUs have no native f64).
    """
    jax.config.update("jax_enable_x64", True)
    if platform:
        jax.config.update("jax_platforms", platform)
