"""Sanity-check timing methodology through the axon tunnel."""
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

    batch, roi, l, s, w = 1024, 512, 22, 55, 256
    rng = np.random.default_rng(0)
    windows = jnp.asarray(
        rng.integers(0, 256, (batch, roi, roi)), jnp.bfloat16)
    cx = jnp.asarray(rng.uniform(200, 312, (batch, l)), jnp.float32)
    cy = jnp.asarray(rng.uniform(200, 312, (batch, l)), jnp.float32)
    phw = jnp.full((batch,), 55.0, jnp.float32)

    run = lambda: sample_patches_window(windows, cx, cy, phw, s,
                                        sub_window=w, sampling="fast")
    out = run(); jax.block_until_ready(out)

    # method A: block only the last result
    t0 = time.time()
    for _ in range(20):
        out = run()
    jax.block_until_ready(out)
    print(f"A block-last      : {(time.time()-t0)/20*1e3:8.3f} ms/call",
          flush=True)

    # method B: block every call
    t0 = time.time()
    for _ in range(20):
        jax.block_until_ready(run())
    print(f"B block-each      : {(time.time()-t0)/20*1e3:8.3f} ms/call",
          flush=True)

    # method C: force host readback of one element each call
    t0 = time.time()
    acc = 0.0
    for _ in range(20):
        acc += float(run()[0, 0, 0, 0])
    print(f"C readback-each   : {(time.time()-t0)/20*1e3:8.3f} ms/call "
          f"(acc={acc:.1f})", flush=True)

    # method D: chain reps so each depends on the previous (defeats any
    # possible dead-result elision)
    t0 = time.time()
    x = cx
    for _ in range(20):
        p = sample_patches_window(windows, x, cy, phw, s,
                                  sub_window=w, sampling="fast")
        x = cx + p[:, :, 0, 0] * 0.0
    jax.block_until_ready(x)
    print(f"D chained         : {(time.time()-t0)/20*1e3:8.3f} ms/call",
          flush=True)


if __name__ == "__main__":
    main()
