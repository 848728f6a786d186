"""Probe: do overlapping device->host readbacks PIPELINE over the axon
tunnel, or serialize at one ~25 ms RTT each?

probe_track.py measured that one-in-flight pipelined tracking buys
nothing: with a ~0.1 ms fit, BOTH the sequential and the lag-one loops
pay exactly one readback RTT per frame (~26.7 ms device-resident). The
only way a tracking stream can beat the RTT wall is depth-D readback
overlap: dispatch D fits (the frame-to-frame recurrence lives on
device), start D ``copy_to_host_async`` transfers, and collect. If the
tunnel pipelines independent transfers, per-frame wall tends to
``max(fit, RTT / D)``; if it serializes them, depth buys nothing and
~37 fps is the tunnel's physical tracking ceiling.

Method: N small (1, 44) f32 rows, each data-dependent on its own tiny
jitted op (so transfers cannot be coalesced into one). Measure wall for
``asarray`` of all N rows, with and without ``copy_to_host_async``
pre-issued, at several depths.

Usage: python scripts/probe_async_readback.py
"""
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    from superviseddescent_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    step = jax.jit(lambda x, s: x * 1.000001 + s)
    base = jnp.zeros((1, 44), jnp.float32)
    # warm the compile + one RTT estimate
    np.asarray(step(base, 0.0))
    t0 = time.perf_counter()
    for _ in range(10):
        np.asarray(step(base, 1.0))
    rtt = (time.perf_counter() - t0) / 10
    print(f"single sync readback: {rtt*1e3:.1f} ms")

    for depth in (2, 4, 8, 16, 32):
        reps = 3
        walls = []
        for r in range(reps):
            rows = [step(base, float(i + r)) for i in range(depth)]
            t0 = time.perf_counter()
            for row in rows:
                row.copy_to_host_async()
            outs = [np.asarray(row) for row in rows]
            walls.append(time.perf_counter() - t0)
        w = min(walls)
        print(f"depth {depth:3d}: {w*1e3:7.1f} ms total, "
              f"{w/depth*1e3:6.2f} ms/row "
              f"({rtt/(w/depth):4.1f}x vs serial)", flush=True)


if __name__ == "__main__":
    main()
