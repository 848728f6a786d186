"""Per-stage timing of the serving detect path at bench shapes.

Times, per cascade level at batch=1024 / roi=512 (bench.py's config):
  - the Pallas window sampler alone
  - the flat Pallas HOG kernel alone
  - the regressor GEMV alone
  - the full level fn (sampler + HOG + GEMV + update)
so kernel-level optimisation effort goes where the time is.
"""
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def timeit(fn, *args, reps=20):
    from superviseddescent_tpu.utils.timing import measure
    dt, _ = measure(fn, *args, reps=reps)
    return dt * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp
    from superviseddescent_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from superviseddescent_tpu.models import DetectionModel
    from superviseddescent_tpu.ops.hog_pallas_flat import (
        hog_descriptor_pallas_flat)
    from superviseddescent_tpu.models.rcr import level_sub_windows
    from superviseddescent_tpu.ops.patches_pallas import (
        max_patch_half, max_patch_half_x, sample_patches_window)

    model = DetectionModel.load(os.path.join(REPO, "pretrained",
                                             "rcr22_lfpw5.bin"))
    batch, roi = 1024, 512
    l = len(model.landmark_ids)
    rng = np.random.default_rng(0)
    windows = jnp.asarray(
        rng.integers(0, 256, (batch, roi, roi)), jnp.bfloat16)
    # realistic LFPW-ish geometry: IED ~100 px, landmarks near center
    cx = jnp.asarray(rng.uniform(200, 312, (batch, l)), jnp.float32)
    cy = jnp.asarray(rng.uniform(200, 312, (batch, l)), jnp.float32)

    mi = 145.0  # bench.py's measured max_ied bound for LFPW
    print(f"batch={batch} roi={roi} max_ied={mi:.0f}", flush=True)
    # sub-windows via the SAME sizing the serving detector uses
    sub_w, sub_wx = level_sub_windows(model.hog_params, roi, mi)
    total_lvl = 0.0
    for li, p in enumerate(model.hog_params):
        w, wx = sub_w[li], sub_wx[li]
        phw = jnp.full((batch,), min(
            round(p.relative_patch_size * 100 / 2), max_patch_half(w),
            max_patch_half_x(wx) if wx else 1e9),
            jnp.float32)
        s = p.patch_size

        t_samp = timeit(lambda: sample_patches_window(
            windows, cx, cy, phw, s, sub_window=w, sub_window_x=wx,
            sampling="fast", transposed=True, out_dtype=jnp.bfloat16))
        patches = sample_patches_window(
            windows, cx, cy, phw, s, sub_window=w, sub_window_x=wx,
            sampling="fast", transposed=True, out_dtype=jnp.bfloat16)
        flat = patches.reshape(batch * l, s * s)
        t_hog = timeit(lambda: hog_descriptor_pallas_flat(
            flat, s, p.cell_size, p.num_bins, p.variant, fast=True,
            transposed=True))
        desc = hog_descriptor_pallas_flat(
            flat, s, p.cell_size, p.num_bins, p.variant, fast=True,
            transposed=True)
        feats = jnp.concatenate(
            [desc.reshape(batch, -1), jnp.ones((batch, 1), jnp.float32)], 1)
        wmat = jnp.asarray(model.sdo.regressors[li].weights)
        gemv = jax.jit(lambda f, m: f @ m)
        t_gemv = timeit(lambda: gemv(feats, wmat))
        lvl = t_samp + t_hog + t_gemv
        total_lvl += lvl
        print(f"level {li}: S={s} W={w} WX={wx} sampler {t_samp:6.2f} ms  "
              f"hog {t_hog:6.2f} ms  gemv {t_gemv:5.2f} ms  "
              f"sum {lvl:6.2f} ms", flush=True)
    print(f"sum of kernel stages over 4 levels: {total_lvl:.2f} ms "
          f"({batch / total_lvl * 1e3:.0f} faces/s bound)", flush=True)


if __name__ == "__main__":
    main()
