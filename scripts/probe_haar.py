"""Phase-level profile of HaarCascadeDetector.detect on the real TPU.

Splits the wall time of a device-resident 608x512 detect() into:
  A  pyramid enqueue (all _resize_pad + _evaluate_scale dispatches,
     nothing read back)
  B  device compute drain (enqueue + a 1-element fence readback on the
     last piece)
  C  compaction + the single packed readback
  D  host decode + grouping
  E  full detect() wall
plus an isolated bank-matmul timing at DEFAULT vs HIGHEST precision to
confirm the exact-bf16 speedup landed (facedetect module docstring).

Usage: python scripts/probe_haar.py
"""
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

XML = "/usr/share/opencv4/haarcascades/haarcascade_frontalface_alt2.xml"
DATA = "/root/reference/examples/data/ibug_lfpw_trainset"


def main():
    from superviseddescent_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from superviseddescent_tpu.models import facedetect as fd
    from superviseddescent_tpu.ops.patches import load_gray_image, \
        stack_images

    det = fd.HaarCascadeDetector(XML, scale_factor=1.2, min_neighbors=2,
                                 min_size=(50, 50))
    print("precision:", det._precision)
    stack, _ = stack_images(
        [load_gray_image(os.path.join(DATA, "image_0001.png"))],
        pad_width_to=128)
    img_dev = jax.device_put(jnp.asarray(np.asarray(stack[0], np.float32)))
    h, w = img_dev.shape
    imgs = img_dev    # 2D: the program adds the frames axis in-trace

    det.detect(img_dev)                      # warm everything

    reps = 10
    d = det.data
    plan = det._pyramid_plan(1, h, w)
    args = (det._bank0, det._bank1, det._thresh0, det._thresh1,
            det._flip0, det._leaves, det._stage_thresholds,
            det._norm_mask)
    total = sum(s[5] * s[6] for s in plan)
    concat = total <= det.CONCAT_MAX and all(s[7] == 1 for s in plan)
    statics = (plan, d.window_height, d.window_width,
               det._stage_bounds, det._precision, concat)
    print(f"total windows {total}, concat_eval={concat}")

    packed = np.asarray(fd._run_pyramid_packed(
        imgs, *args, *statics, det.SURVIVOR_DIV, det.MAX_CANDIDATES))
    print(f"packed: count={packed[0, -2]} pre_overflow={packed[0, -1]}")

    t0 = time.perf_counter()
    for _ in range(reps):
        fd._run_pyramid_packed(imgs, *args, *statics,
                               det.SURVIVOR_DIV, det.MAX_CANDIDATES)
    t_enq = (time.perf_counter() - t0) / reps
    print(f"A program dispatch only:   {t_enq*1e3:7.2f} ms "
          f"({len(plan)} scales, 1 program)")

    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(fd._run_pyramid_packed(imgs, *args, *statics,
                                          det.SURVIVOR_DIV,
                                          det.MAX_CANDIDATES))
    t_dec = (time.perf_counter() - t0) / reps
    print(f"C dispatch + readback:     {t_dec*1e3:7.2f} ms")

    t0 = time.perf_counter()
    for _ in range(reps):
        n = len(det.detect(img_dev))
    t_full = (time.perf_counter() - t0) / reps
    print(f"E full detect():           {t_full*1e3:7.2f} ms ({n} boxes)")

    # isolated bank matmul: (N, 400) x (400, T) at both precisions
    d = det.data
    n_win = 1 << 15
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.integers(0, 256, (n_win, d.bank0.shape[0]))
                    .astype(np.float32))
    b0 = jnp.asarray(d.bank0)

    from superviseddescent_tpu.utils.timing import measure
    for prec in (jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST):
        f = jax.jit(lambda x, b, pr=prec: jax.lax.dot_general(
            x, b, (((1,), (0,)), ((), ())), precision=pr))
        f(p, b0).block_until_ready()
        dt, _ = measure(f, p, b0, reps=30)
        gf = 2 * n_win * d.bank0.shape[0] * d.bank0.shape[1] / dt / 1e9
        print(f"bank matmul {prec}: {dt*1e3:6.2f} ms "
              f"({gf:,.0f} GFLOP/s, N={n_win}, T={d.bank0.shape[1]})")


if __name__ == "__main__":
    main()
