"""Unambiguous device timing: chain K data-dependent iterations of a
computation inside ONE jitted program; the K=big vs K=small slope is the
true per-iteration execution time, immune to RPC/dispatch artifacts.

Checks three suspects: the window sampler, the ROI crop, and a full
detect level.
"""
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def timed_call(fn, *args):
    from superviseddescent_tpu.utils.timing import force
    force(fn(*args))     # compile + drain the stream BEFORE timing
    force(fn(*args))
    t0 = time.perf_counter()
    out = fn(*args)
    force(out)
    return time.perf_counter() - t0


def slope(fn_k, lo=4, hi=12):
    import jax
    f_lo = jax.jit(lambda *a: fn_k(lo, *a))
    f_hi = jax.jit(lambda *a: fn_k(hi, *a))
    return f_lo, f_hi, lo, hi


def main():
    import jax
    import jax.numpy as jnp
    from superviseddescent_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from superviseddescent_tpu.models import DetectionModel
    from superviseddescent_tpu.ops.patches_pallas import (
        min_sub_window, min_sub_window_x, sample_patches_window)

    model = DetectionModel.load(os.path.join(REPO, "pretrained",
                                             "rcr22_lfpw5.bin"))
    batch, roi, mi = 1024, 512, 145.0
    l = len(model.landmark_ids)
    rng = np.random.default_rng(0)
    windows = jnp.asarray(
        rng.integers(0, 256, (batch, roi, roi)), jnp.bfloat16)
    cx = jnp.asarray(rng.uniform(180, 330, (batch, l)), jnp.float32)
    cy = jnp.asarray(rng.uniform(180, 330, (batch, l)), jnp.float32)
    phw = jnp.full((batch,), 52.0, jnp.float32)
    p0 = model.hog_params[0]
    w0 = min(roi, min_sub_window(p0.relative_patch_size * mi + 2))
    wx0 = (lambda v: 0 if v >= roi else v)(
        min_sub_window_x(p0.relative_patch_size * mi + 2))

    # --- sampler: K chained iterations
    def samp_k(k, wins, cx, cy, phw):
        def body(i, carry):
            c, acc = carry
            pp = sample_patches_window(wins, c, cy, phw, p0.patch_size,
                                       sub_window=w0, sub_window_x=wx0,
                                       quantize=True, sampling="fast")
            return (cx + pp[:, :, 0, 0] * 1e-12, acc + pp[0, 0, 0, 0])
        return jax.lax.fori_loop(0, k, body, (cx, 0.0))[1]

    f_lo, f_hi, lo, hi = slope(samp_k)
    t_lo = timed_call(f_lo, windows, cx, cy, phw)
    t_hi = timed_call(f_hi, windows, cx, cy, phw)
    print(f"sampler L0: K={lo}: {t_lo*1e3:7.1f}ms K={hi}: {t_hi*1e3:7.1f}ms"
          f" -> {((t_hi-t_lo)/(hi-lo))*1e3:7.2f} ms/iter", flush=True)

    # --- ROI crop from a wide image stack
    h, w = 1024, 728
    images = jnp.asarray(rng.integers(0, 256, (batch, h, w)), jnp.uint8)
    boxes = jnp.asarray(np.stack([
        rng.uniform(0, w - 310, batch), rng.uniform(0, h - 310, batch),
        rng.uniform(150, 300, batch), rng.uniform(150, 300, batch)], 1),
        jnp.float32)

    def crop_k(k, images, boxes):
        def body(i, carry):
            bx, acc = carry
            ccx = bx[:, 0] + bx[:, 2] / 2.0
            ccy = bx[:, 1] + bx[:, 3] / 2.0
            ox = jnp.clip(jnp.round(ccx - roi / 2.0), 0, w - roi
                          ).astype(jnp.int32)
            oy = jnp.clip(jnp.round(ccy - roi / 2.0), 0, h - roi
                          ).astype(jnp.int32)
            wins = jax.vmap(lambda img, y0, x0: jax.lax.dynamic_slice(
                img, (y0, x0), (roi, roi)))(images, oy, ox)
            wins = wins.astype(jnp.bfloat16)
            return (boxes + wins[0, 0, 0] * 1e-12, acc + wins[0, 0, 0])
        return jax.lax.fori_loop(0, k, body, (boxes, jnp.bfloat16(0)))[1]

    f_lo, f_hi, lo, hi = slope(crop_k)
    t_lo = timed_call(f_lo, images, boxes)
    t_hi = timed_call(f_hi, images, boxes)
    print(f"crop 728w : K={lo}: {t_lo*1e3:7.1f}ms K={hi}: {t_hi*1e3:7.1f}ms"
          f" -> {((t_hi-t_lo)/(hi-lo))*1e3:7.2f} ms/iter", flush=True)


    # --- full stepped-detector pipeline (crop + 4 levels), chained
    detect = model.make_stepped_detector(batch, roi=roi, sampling="fast",
                                         window_sampler=True, max_ied=mi)

    def detect_k(k, images, boxes):
        def body(i, carry):
            bx, acc = carry
            out = detect(images, bx)
            return (bx + out[:, :4] * 1e-12, acc + out[0, 0])
        return jax.lax.fori_loop(0, k, body, (boxes, 0.0))[1]

    # detect() builds jitted subcalls; nest them under one outer jit so the
    # whole chain is a single program
    f_lo = jax.jit(lambda im, bx: detect_k(4, im, bx))
    f_hi = jax.jit(lambda im, bx: detect_k(12, im, bx))
    t_lo = timed_call(f_lo, images, boxes)
    t_hi = timed_call(f_hi, images, boxes)
    print(f"detect e2e: K=4: {t_lo*1e3:7.1f}ms K=12: {t_hi*1e3:7.1f}ms"
          f" -> {((t_hi-t_lo)/8)*1e3:7.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
