"""Honest device timing over remote/tunneled backends.

On this environment's TPU backend (the axon tunnel),
``jax.block_until_ready`` returns before the device has actually executed
the enqueued programs, so the usual

    t0; for _ in range(reps): out = f(x); out.block_until_ready(); dt

measures *dispatch*, not execution. Measured here: a Pallas sampler call
whose true execution is ~5 ms "times" at 0.03 ms with block-last, while a
forced scalar readback (device-side reduction -> ``float()``) shows the
real cost. The only reliable completion fence is a host readback of a
value that data-depends on the work.

These helpers implement that fence. The device stream is FIFO, so reading
back one scalar that depends on the last program forces everything
enqueued before it.
"""

from __future__ import annotations

import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


@jax.jit
def _scalarize(leaf):
    # cheap on-device reduction to one element; ravel()[-1:] avoids a full
    # reduction for big outputs while still depending on the buffer
    return jnp.ravel(leaf)[-1]


def force(tree) -> float:
    """Force completion of everything enqueued before (and including) the
    computation producing ``tree``: reads back one dependent scalar.

    Returns the scalar (useful as an optimisation barrier on the host).
    """
    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if isinstance(x, jax.Array)]
    if not leaves:
        jax.block_until_ready(tree)
        return 0.0
    return float(_scalarize(leaves[-1]))


def rtt() -> float:
    """One forced-readback round trip with no device work, in seconds."""
    x = jnp.zeros((8,), jnp.float32)
    force(x)
    t0 = time.perf_counter()
    force(x)
    return time.perf_counter() - t0


def measure(fn: Callable, *args, reps: int = 20,
            warmup: int = 1) -> Tuple[float, float]:
    """Steady-state seconds/call of ``fn(*args)`` with a completion fence.

    Enqueues ``reps`` calls back-to-back (device-pipelined, as in serving)
    and fences once at the end; the single readback RTT is measured
    separately and subtracted. Returns (seconds_per_call, fence_rtt_s).
    """
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    force(out)
    r = rtt()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    force(out)
    dt = time.perf_counter() - t0
    return max(dt - r, 1e-12) / reps, r
