"""Time the stepped detector's ROI crop at bench shapes."""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp
    from superviseddescent_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from superviseddescent_tpu.utils.timing import measure

    batch, roi = 1024, 512
    h, w = 544, 544
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (batch, h, w)), jnp.uint8)
    boxes = jnp.asarray(
        np.stack([rng.uniform(0, w - 310, batch),
                  rng.uniform(0, h - 310, batch),
                  rng.uniform(150, 300, batch),
                  rng.uniform(150, 300, batch)], 1), jnp.float32)

    @jax.jit
    def crop(images, boxes):
        cx = boxes[:, 0] + boxes[:, 2] / 2.0
        cy = boxes[:, 1] + boxes[:, 3] / 2.0
        ox = jnp.clip(jnp.round(cx - roi / 2.0), 0, w - roi).astype(jnp.int32)
        oy = jnp.clip(jnp.round(cy - roi / 2.0), 0, h - roi).astype(jnp.int32)
        windows = jax.vmap(
            lambda img, y0, x0: jax.lax.dynamic_slice(
                img, (y0, x0), (roi, roi)))(images, oy, ox)
        return windows.astype(jnp.bfloat16), ox, oy

    @jax.jit
    def crop_aligned(images, boxes):
        cx = boxes[:, 0] + boxes[:, 2] / 2.0
        cy = boxes[:, 1] + boxes[:, 3] / 2.0
        ox = jnp.clip(jnp.round(cx - roi / 2.0), 0, w - roi).astype(jnp.int32)
        oy = jnp.clip(jnp.round(cy - roi / 2.0), 0, h - roi).astype(jnp.int32)
        ox = (ox // 128) * 128
        oy = (oy // 8) * 8
        windows = jax.vmap(
            lambda img, y0, x0: jax.lax.dynamic_slice(
                img, (y0, x0), (roi, roi)))(images, oy, ox)
        return windows.astype(jnp.bfloat16), ox, oy

    for name, fn in [("crop unaligned", crop), ("crop aligned", crop_aligned)]:
        dt, _ = measure(fn, images, boxes, reps=20)
        print(f"{name}: {dt*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
