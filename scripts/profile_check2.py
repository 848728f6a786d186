"""Discriminate: does block_until_ready actually wait over the axon tunnel?

Times a jit that REDUCES the sampler output to one scalar on device, then
float()s it (forces execution + 4-byte transfer). Subtracting the no-op
RTT gives true per-call execution time. Also scales batch 256 -> 1024 to
check the measurement responds to work.
"""
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp
    from superviseddescent_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from superviseddescent_tpu.ops.patches_pallas import (
        sample_patches_window)

    l, roi, s, w = 22, 512, 55, 256
    rng = np.random.default_rng(0)

    @jax.jit
    def noop(a):
        return jnp.sum(a) * 0.0 + 1.0

    def sampler_sum(windows, cx, cy, phw):
        p = sample_patches_window(windows, cx, cy, phw, s,
                                  sub_window=w, sampling="fast")
        return jnp.sum(p)

    f = jax.jit(sampler_sum)

    for batch in (256, 1024):
        windows = jnp.asarray(
            rng.integers(0, 256, (batch, roi, roi)), jnp.bfloat16)
        cx = jnp.asarray(rng.uniform(200, 312, (batch, l)), jnp.float32)
        cy = jnp.asarray(rng.uniform(200, 312, (batch, l)), jnp.float32)
        phw = jnp.full((batch,), 55.0, jnp.float32)

        float(f(windows, cx, cy, phw))  # compile
        float(noop(cx))

        t0 = time.time()
        for _ in range(10):
            float(noop(cx))
        rtt = (time.time() - t0) / 10 * 1e3

        t0 = time.time()
        for _ in range(10):
            float(f(windows, cx, cy, phw))
        tot = (time.time() - t0) / 10 * 1e3
        print(f"batch {batch:5d}: noop-rtt {rtt:7.2f} ms  "
              f"sampler+sum {tot:7.2f} ms  => exec ~{tot - rtt:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
