"""Split v1 (sampler+HOG) into sampler / reshape-relayout / HOG at bench
shapes, per level."""
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
    from superviseddescent_tpu.models import DetectionModel
    from superviseddescent_tpu.ops.hog_pallas_flat import (
        hog_descriptor_pallas_flat)
    from superviseddescent_tpu.ops.patches_pallas import (
        min_sub_window, min_sub_window_x, sample_patches_window)
    from superviseddescent_tpu.utils.timing import measure

    model = DetectionModel.load(os.path.join(REPO, "pretrained",
                                             "rcr22_lfpw5.bin"))
    batch, roi, mi = 1024, 512, 145.0
    l = len(model.landmark_ids)
    rng = np.random.default_rng(0)
    windows = jnp.asarray(
        rng.integers(0, 256, (batch, roi, roi)), jnp.bfloat16)
    cx = jnp.asarray(rng.uniform(180, 330, (batch, l)), jnp.float32)
    cy = jnp.asarray(rng.uniform(180, 330, (batch, l)), jnp.float32)

    for li, p in enumerate(model.hog_params):
        s = p.patch_size
        w = min(roi, min_sub_window(p.relative_patch_size * mi + 2))
        wx = (lambda v: 0 if v >= roi else v)(
            min_sub_window_x(p.relative_patch_size * mi + 2))
        phw = jnp.full((batch,), min(52.0 * p.relative_patch_size,
                                     (w - 10) / 2), jnp.float32)

        samp = jax.jit(lambda wins, cx, cy, phw, _s=s, _w=w, _wx=wx:
                       sample_patches_window(wins, cx, cy, phw, _s,
                                             sub_window=_w, sub_window_x=_wx,
                                             quantize=True, sampling="fast"))
        t_s, _ = measure(samp, windows, cx, cy, phw, reps=20)
        patches = samp(windows, cx, cy, phw)

        resh = jax.jit(lambda pp, _s=s: pp.reshape(batch * l, _s * _s))
        t_r, _ = measure(resh, patches, reps=20)
        flat = resh(patches)

        hogk = jax.jit(lambda f, _s=s, _p=p: hog_descriptor_pallas_flat(
            f, _s, _p.cell_size, _p.num_bins, _p.variant, fast=True))
        t_h, _ = measure(hogk, flat, reps=20)

        print(f"level {li}: S={s} W={w} WX={wx or roi} "
              f"sampler {t_s*1e3:6.2f}ms  reshape {t_r*1e3:6.2f}ms  "
              f"hog {t_h*1e3:6.2f}ms  sum {(t_s+t_r+t_h)*1e3:6.2f}ms",
              flush=True)


if __name__ == "__main__":
    main()
