"""Profiling & observability utilities.

The reference's observability is ad-hoc printing: VerbosePartialPivLUSolver
wall-times each solver stage (/root/reference/include/superviseddescent/
verbose_solver.hpp:60-103) and rcr-track prints per-frame latencies. Under
jit those stages fuse, so the TPU-native equivalents are:

  * :func:`timed` — wall-clock a device computation correctly (fenced by
    a data-dependent scalar readback — ``jax.block_until_ready`` returns
    after *dispatch*, not execution, on tunneled backends; see
    utils/timing.py), the analogue of the per-stage chrono prints;
  * :func:`trace` — wrap a block in a jax.profiler trace for XProf;
  * :func:`enable_nan_checks` — jax_debug_nans as the safety net analogous
    to the reference's (absent) sanitizers (SURVEY.md §5 race detection).
"""

from __future__ import annotations

import contextlib
import sys
import time

import jax


def timed(fn, *args, label: str = "", stream=sys.stderr, **kwargs):
    """Run fn(*args) and print device-synchronised wall time.

    Returns fn's result. Works for jitted functions: fences with a
    data-dependent scalar readback so the measurement includes device
    execution (block_until_ready alone does not wait on remote backends),
    like the reference's explicit chrono brackets around Eigen calls.
    """
    from superviseddescent_tpu.utils.timing import force
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    force(out)
    dt = (time.perf_counter() - t0) * 1000.0
    print(f"[timed] {label or getattr(fn, '__name__', 'fn')}: {dt:.2f} ms",
          file=stream, flush=True)
    return out


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; view with XProf/TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_checks(enable: bool = True):
    """Turn on jax_debug_nans: any NaN produced by a jitted computation
    raises immediately with the offending primitive."""
    jax.config.update("jax_debug_nans", enable)


class LevelTimer:
    """Per-cascade-level timing callback for SDO.train/test: the functional
    replacement for the verbose solver's stage prints.

    Usage::

        timer = LevelTimer()
        sdo.train(x, x0, y, h, on_training_epoch_callback=timer)
        print(timer.times_ms)
    """

    def __init__(self, stream=sys.stderr, verbose: bool = True):
        self._last = time.perf_counter()
        self.times_ms = []
        self.stream = stream
        self.verbose = verbose

    def __call__(self, current_x):
        from superviseddescent_tpu.utils.timing import force
        force(current_x)
        now = time.perf_counter()
        dt = (now - self._last) * 1000.0
        self._last = now
        self.times_ms.append(dt)
        if self.verbose:
            print(f"[level {len(self.times_ms) - 1}] {dt:.1f} ms",
                  file=self.stream, flush=True)
