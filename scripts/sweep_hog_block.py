"""Sweep the flat HOG kernel's batch-block size at serving shapes."""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax.numpy as jnp
    from superviseddescent_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from superviseddescent_tpu.ops.hog import HogVariant
    from superviseddescent_tpu.ops.hog_pallas_flat import (
        hog_descriptor_pallas_flat)
    from superviseddescent_tpu.utils.timing import measure

    rng = np.random.default_rng(0)
    n = 1024 * 22
    for s, cs in [(55, 11), (50, 10), (40, 8), (30, 6)]:
        flat = jnp.asarray(
            rng.integers(0, 256, (n, s * s)), jnp.bfloat16)
        line = [f"S={s}"]
        for block in (64, 128, 256, 512):
            dt, _ = measure(
                lambda: hog_descriptor_pallas_flat(
                    flat, s, cs, 4, HogVariant.Uoctti, block=block,
                    fast=True, transposed=True), reps=20)
            line.append(f"b{block}:{dt*1e3:6.2f}ms")
        print("  ".join(line), flush=True)


if __name__ == "__main__":
    main()
