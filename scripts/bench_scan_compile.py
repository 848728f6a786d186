"""Scan-vs-unrolled whole-cascade compile-time study (VERDICT r1 item 6).

The monolithic whole-cascade jit is the pathological compile (tens of
minutes cold through the remote compiler at serving batch sizes); the
stepped detector works around it with four per-level programs. This
script measures, for a UNIFORM-config 4-level RCR model at F=8801 (the
only case where a scan body is shape-legal — the shipped RCR-22 config
has per-level cell sizes 11/10/8/6 and cannot scan):

  1. make_scan_detector  — one lax.scan body over the weight stack;
  2. detect_batch (jit)  — the unrolled monolithic graph;
  3. make_stepped_detector — four separate programs.

Compilation cache deliberately NOT enabled; weights are random (compile
time does not depend on values).

Run: python scripts/bench_scan_compile.py [batch]
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def uniform_model(num_landmarks=22, levels=4, cell_size=11):
    import jax.numpy as jnp
    from superviseddescent_tpu import (
        LinearRegressor, Regulariser, RegularisationType,
        SupervisedDescentOptimiser)
    from superviseddescent_tpu.models import (
        DetectionModel, InterEyeDistanceNormalisation)
    from superviseddescent_tpu.models.rcr import HogParams
    from superviseddescent_tpu.ops.hog import (
        HogVariant, hog_dimension, hog_num_cells)

    names = [str(i + 1) for i in range(num_landmarks)]
    right, left = [names[0], names[1]], [names[2], names[3]]
    p = HogParams(HogVariant.Uoctti, 5, cell_size, 4, 1.0)
    hog_params = tuple(p for _ in range(levels))
    c = hog_num_cells(p.patch_size, p.cell_size)
    f = num_landmarks * c * c * hog_dimension(p.variant, p.num_bins) + 1
    rng = np.random.default_rng(0)
    regs = [LinearRegressor(
        weights=jnp.asarray(rng.normal(size=(f, 2 * num_landmarks))
                            .astype(np.float32) * 1e-4),
        regulariser=Regulariser(RegularisationType.MatrixNorm, 1.5, False))
        for _ in range(levels)]
    norm = InterEyeDistanceNormalisation(names, right, left)
    sdo = SupervisedDescentOptimiser(regs, norm)
    mean = np.concatenate([
        np.linspace(-0.35, 0.35, num_landmarks),
        np.linspace(-0.3, 0.3, num_landmarks)]).astype(np.float32)
    return DetectionModel(sdo, mean, names, hog_params, right, left)


def main():
    import jax
    import jax.numpy as jnp

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    model = uniform_model()
    rng = np.random.default_rng(1)
    images = rng.integers(0, 256, size=(batch, 512, 512)).astype(np.float32)
    boxes = np.tile(np.float32([96, 96, 320, 320]), (batch, 1))
    images_d = jax.device_put(jnp.asarray(images))
    boxes_d = jax.device_put(jnp.asarray(boxes))
    print(f"batch={batch} F=8801 levels=4 backend={jax.default_backend()}",
          flush=True)

    t0 = time.perf_counter()
    scan = model.make_scan_detector(batch)
    out_scan = scan(images_d, boxes_d)
    out_scan.block_until_ready()
    t_scan = time.perf_counter() - t0
    print(f"scan detector  cold compile+first: {t_scan:7.1f}s", flush=True)

    t0 = time.perf_counter()
    mono = jax.jit(lambda im, bx: model.detect_batch(
        im, bx, image_indices=jnp.arange(batch, dtype=jnp.int32)))
    out_mono = mono(images_d, boxes_d)
    out_mono.block_until_ready()
    t_mono = time.perf_counter() - t0
    print(f"unrolled mono  cold compile+first: {t_mono:7.1f}s", flush=True)

    t0 = time.perf_counter()
    stepped = model.make_stepped_detector(batch)
    out_st = stepped(images_d, boxes_d)
    out_st.block_until_ready()
    t_st = time.perf_counter() - t0
    print(f"stepped (4 programs) cold compile+first: {t_st:7.1f}s",
          flush=True)

    d_ms = float(np.max(np.abs(np.asarray(out_scan) - np.asarray(out_mono))))
    d_st = float(np.max(np.abs(np.asarray(out_st) - np.asarray(out_mono))))
    print(f"max |scan - mono| = {d_ms:.2e} px; "
          f"max |stepped - mono| = {d_st:.2e} px", flush=True)


if __name__ == "__main__":
    main()
