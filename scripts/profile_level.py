"""Locate the gap between kernel-stage sums and full level time.

Times, at bench config (batch 1024, roi 512, max_ied 145):
  v0: the stepped detector's full level fn (sampler+HOG+GEMV+update)
  v1: sampler + HOG only (incl. the (N,L,S,S)->(N*L,S*S) reshape)
  v2: v1 + desc reshape + bias concat (no dot)
  v3: v1 + folded-bias GEMV (no concat)
"""
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
    from superviseddescent_tpu.utils.timing import measure

    model = DetectionModel.load(os.path.join(REPO, "pretrained",
                                             "rcr22_lfpw5.bin"))
    batch, roi, mi = 1024, 512, 145.0
    l = len(model.landmark_ids)
    rng = np.random.default_rng(0)
    windows = jnp.asarray(
        rng.integers(0, 256, (batch, roi, roi)), jnp.bfloat16)
    x = jnp.asarray(np.concatenate([
        rng.uniform(180, 330, (batch, l)),
        rng.uniform(180, 330, (batch, l))], 1), jnp.float32)

    from superviseddescent_tpu.ops.patches_pallas import (
        min_sub_window, min_sub_window_x)
    sub_w = tuple(min(roi, min_sub_window(p.relative_patch_size * mi + 2))
                  for p in model.hog_params)
    sub_wx = tuple((lambda v: 0 if v >= roi else v)(
        min_sub_window_x(p.relative_patch_size * mi + 2))
        for p in model.hog_params)

    def hog_for(wins):
        return model._hog(wins,
                          image_indices=jnp.arange(batch, dtype=jnp.int32),
                          quantize=True, sampling="fast",
                          patch_backend="window", sub_windows=sub_w,
                          sub_windows_x=sub_wx, hog_fast=True)

    from superviseddescent_tpu.utils.landmarks import resolve_eye_indices
    ri, lei = resolve_eye_indices(model.landmark_ids, model.right_eye_ids,
                                  model.left_eye_ids)

    for li, reg in enumerate(model.sdo.regressors):
        w0 = jnp.asarray(reg.weights)

        @jax.jit
        def v0(x, wins, w):
            obs = hog_for(wins)(x, li)
            norm = model.sdo.normalisation(x)
            upd = jnp.dot(obs, w, precision=jax.lax.Precision.DEFAULT,
                          preferred_element_type=jnp.float32)
            return x - upd / norm

        # pieces: replicate _call_block internals without bias/dot
        p = model.hog_params[li]
        s = p.patch_size

        @jax.jit
        def v1(x, wins):
            from superviseddescent_tpu.ops.patches_pallas import (
                max_patch_half, max_patch_half_x, sample_patches_window)
            from superviseddescent_tpu.ops.hog_pallas_flat import (
                hog_descriptor_pallas_flat)
            from superviseddescent_tpu.utils.landmarks import ied_from_rows
            ied = ied_from_rows(x, ri, lei)
            phw = jnp.maximum(jnp.floor(
                p.relative_patch_size * ied / 2.0 + 0.5), 1.0)
            phw = jnp.minimum(phw, max_patch_half(sub_w[li]))
            if sub_wx[li]:
                phw = jnp.minimum(phw, max_patch_half_x(sub_wx[li]))
            patches = sample_patches_window(
                wins, x[:, :l], x[:, l:], phw, s,
                sub_window=sub_w[li], sub_window_x=sub_wx[li],
                quantize=True, sampling="fast")
            return hog_descriptor_pallas_flat(
                patches.reshape(batch * l, s * s), s, p.cell_size,
                p.num_bins, p.variant, fast=True)

        @jax.jit
        def v2(x, wins):
            desc = v1(x, wins).reshape(batch, -1)
            return jnp.concatenate(
                [desc, jnp.ones((batch, 1), desc.dtype)], axis=1)

        @jax.jit
        def v3(x, wins, w):
            desc = v1(x, wins).reshape(batch, -1)
            return jnp.dot(desc, w[:-1],
                           precision=jax.lax.Precision.DEFAULT,
                           preferred_element_type=jnp.float32) + w[-1]

        ts = {}
        for name, fn, args in [("v0 full", v0, (x, windows, w0)),
                               ("v1 samp+hog", v1, (x, windows)),
                               ("v2 +concat", v2, (x, windows)),
                               ("v3 +folded-gemv", v3, (x, windows, w0))]:
            dt, _ = measure(fn, *args, reps=20)
            ts[name] = dt * 1e3
        print(f"level {li}: " + "  ".join(
            f"{k} {v:6.2f}ms" for k, v in ts.items()), flush=True)


if __name__ == "__main__":
    main()
