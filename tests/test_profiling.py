"""Observability utilities (utils/profiling.py, utils/timing.py) — the
functional replacements for the reference's VerbosePartialPivLUSolver
stage prints and rcr-track latency prints (verbose_solver.hpp:60-103,
rcr-track.cpp:146-166)."""

import io

import jax
import jax.numpy as jnp
import numpy as np

from superviseddescent_tpu import LinearRegressor, SupervisedDescentOptimiser
from superviseddescent_tpu.utils.profiling import (
    LevelTimer, enable_nan_checks, timed)
from superviseddescent_tpu.utils.timing import force, measure


def test_timed_returns_result_and_prints():
    stream = io.StringIO()
    out = timed(jax.jit(lambda x: x * 2.0), jnp.ones((4,)),
                label="double", stream=stream)
    np.testing.assert_array_equal(np.asarray(out), 2.0 * np.ones(4))
    text = stream.getvalue()
    assert "[timed] double:" in text and "ms" in text


def test_level_timer_records_each_cascade_level():
    # one entry per trained level, positive wall times, quiet mode silent
    stream = io.StringIO()
    timer = LevelTimer(stream=stream, verbose=False)
    y = jnp.arange(-1.0, 1.01, 0.2).reshape(-1, 1)
    x = jnp.arcsin(jnp.clip(y, -1.0, 1.0))
    sdo = SupervisedDescentOptimiser([LinearRegressor() for _ in range(3)])
    sdo.train(x, jnp.full_like(x, 0.5), y, lambda v, lvl: jnp.sin(v),
              on_training_epoch_callback=timer)
    assert len(timer.times_ms) == 3
    assert all(t > 0 for t in timer.times_ms)
    assert stream.getvalue() == ""


def test_measure_returns_positive_steady_state():
    f = jax.jit(lambda x: jnp.tanh(x) @ jnp.tanh(x).T)
    x = jnp.ones((64, 64))
    per_call, fence_rtt = measure(f, x, reps=3)
    assert per_call > 0 and fence_rtt >= 0


def test_force_scalarizes_any_pytree():
    assert force({"a": jnp.ones((3,)), "b": jnp.zeros((2, 2))}) == 0.0
    assert force([]) == 0.0  # no jax leaves: falls back gracefully


def test_enable_nan_checks_toggles():
    try:
        enable_nan_checks(True)
        assert jax.config.jax_debug_nans
    finally:
        enable_nan_checks(False)
    assert not jax.config.jax_debug_nans
