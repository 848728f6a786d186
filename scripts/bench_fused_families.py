"""Measure the fused whole-cascade kernel across model families.

The reference's model layer is size-generic (model.hpp:122-219): it ships
a 22-landmark and a 29-landmark (COFW) model, and the ibug annotation it
trains from has 68 points. Round 3 generalised the fused kernel's lane
packing past 128 lanes (ops/cascade_pallas.py::seg_packing), so this
script measures the headline serving path at COFW-29 and ibug-68 scale —
both at the flagship 4-level, 5-cell RCR configuration (cell sizes
11/10/8/6, rel patch 1.0/0.7/0.4/0.25; rcr-train.cpp:447).

Weights are random (throughput is weight-agnostic); correctness on
silicon is cross-checked against the same kernel in CPU interpret mode
(run in a clean CPU subprocess — the CPU test suite pins interpret mode
against the exact monolithic path).

Usage: python scripts/bench_fused_families.py [L] [G] [batch]
       (defaults: 29 8 4096; results -> docs/PERF_NOTES.md)
"""
import glob
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

IDS29 = [str(i) for i in
         (3, 9, 15, 18, 20, 22, 23, 25, 27, 28, 31, 32, 34, 36,
          37, 38, 40, 41, 43, 44, 46, 47, 49, 51, 52, 53, 55, 58, 63)]


def build(n_lm):
    """Deterministic random-weight model + LFPW data for n_lm landmarks."""
    import jax.numpy as jnp

    from superviseddescent_tpu import (
        LinearRegressor, Regulariser, RegularisationType,
        SupervisedDescentOptimiser)
    from superviseddescent_tpu.io.pts import read_pts_landmarks
    from superviseddescent_tpu.models import DetectionModel, gt_facebox
    from superviseddescent_tpu.models.rcr import (
        HogParams, InterEyeDistanceNormalisation)
    from superviseddescent_tpu.ops.hog import (
        HogVariant, hog_dimension, hog_num_cells)
    from superviseddescent_tpu.ops.patches import (
        load_gray_image, stack_images)
    from superviseddescent_tpu.utils.landmarks import (
        to_landmark_collection, to_row)

    ids = IDS29 if n_lm == 29 else [str(i) for i in range(1, 69)]
    assert len(ids) == n_lm, n_lm
    # flagship 4-level config at 5 cells (rcr-train.cpp:447)
    hog_params = tuple(
        HogParams(HogVariant.Uoctti, 5, cs, 4, rp)
        for cs, rp in ((11, 1.0), (10, 0.7), (8, 0.4), (6, 0.25)))

    data = "/root/reference/examples/data/ibug_lfpw_trainset"
    images, rows = [], []
    for png in sorted(glob.glob(f"{data}/*.png")):
        lms = read_pts_landmarks(png.replace(".png", ".pts"))
        images.append(load_gray_image(png))
        rows.append(to_row(lms.filter(ids)))
    gt_rows = np.stack(rows)
    boxes5 = np.stack([gt_facebox(to_landmark_collection(r, ids))
                       for r in gt_rows]).astype(np.float32)
    stack, _ = stack_images(images, pad_width_to=128)
    mean = np.mean([np.concatenate([(r[:n_lm] - b[0]) / b[2] - 0.5,
                                    (r[n_lm:] - b[1]) / b[3] - 0.5])
                    for r, b in zip(gt_rows, boxes5)],
                   axis=0).astype(np.float32)

    rng = np.random.default_rng(0)
    dims = hog_dimension(HogVariant.Uoctti, 4)
    regs = []
    for p in hog_params:
        c = hog_num_cells(p.patch_size, p.cell_size)
        f = n_lm * c * c * dims + 1
        regs.append(LinearRegressor(
            weights=jnp.asarray(
                rng.normal(0, 1e-3, (f, 2 * n_lm)).astype(np.float32)),
            regulariser=Regulariser(RegularisationType.MatrixNorm, 1.5,
                                    False)))
    norm = InterEyeDistanceNormalisation(ids, ["37", "40"], ["43", "46"])
    model = DetectionModel(SupervisedDescentOptimiser(regs, norm),
                           mean, ids, hog_params,
                           ["37", "40"], ["43", "46"])
    return model, stack, boxes5


def cpu_check(n_lm, g, path):
    """Subprocess entry (clean CPU backend): run the small batch through
    the fused kernel in interpret mode, save the output."""
    model, stack, boxes5 = build(n_lm)
    detect = model.make_fused_detector(roi=512, max_ied=145.0,
                                       faces_per_step=g)
    small = 2 * g
    sel = np.arange(small) % stack.shape[0]
    out = np.asarray(detect(np.asarray(stack, np.uint8)[sel], boxes5[sel]))
    np.save(path, out)


def measure_family(n_lm, g=None, batch=4096, verify=True):
    """Measure the fused serving path for an n_lm-landmark model at the
    flagship 5-cell config; returns faces/sec. g=None uses the model-size
    default (ops/cascade_pallas.py::default_faces_per_step). verify=True
    cross-checks a small batch against CPU interpret mode in a clean
    subprocess. Importable (bench.py "families" section)."""
    import jax
    import jax.numpy as jnp

    from superviseddescent_tpu.ops.cascade_pallas import (
        default_faces_per_step, seg_packing)
    from superviseddescent_tpu.utils.timing import measure

    g = g or default_faces_per_step(n_lm)
    lps, nseg = seg_packing(n_lm, 5)
    print(f"L={n_lm} C=5: {n_lm * 5} packed lanes -> {nseg} segment(s), "
          f"G={g}, batch={batch}", flush=True)

    model, stack, boxes5 = build(n_lm)
    detect = model.make_fused_detector(roi=512, max_ied=145.0,
                                       faces_per_step=g)
    if verify:
        small = 2 * g
        sel_s = np.arange(small) % stack.shape[0]
        imgs_s = np.asarray(stack, np.uint8)[sel_s]
        bxs_s = boxes5[sel_s]
        t0 = time.time()
        out_tpu = np.asarray(detect(imgs_s, bxs_s))
        print(f"compile+first (batch {small}): {time.time()-t0:.1f}s",
              flush=True)

        # CPU interpret reference in a clean subprocess
        ref_path = f"/tmp/fused_fam_{n_lm}_{g}.npy"
        env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cpu-check",
             str(n_lm), str(g), ref_path], check=True, env=env)
        out_cpu = np.load(ref_path)
        d = np.abs(out_tpu - out_cpu)
        print(f"TPU vs CPU-interpret: max {d.max():.4f} px, "
              f"mean {d.mean():.4f} px", flush=True)
        assert d.max() < 0.5, "fused kernel diverged from interpret mode"

    # throughput at the serving batch (device-resident windows, like
    # bench.py: expand the unique images on device)
    sel = np.arange(batch) % stack.shape[0]
    stk = jnp.asarray(stack, jnp.uint8)
    imgs = jax.jit(lambda st, i: st[i])(stk, jnp.asarray(sel, jnp.int32))
    bxs = jnp.asarray(boxes5[sel])
    t0 = time.time()
    detect(imgs, bxs).block_until_ready()
    print(f"compile+first (batch {batch}): {time.time()-t0:.1f}s",
          flush=True)
    dt, rtt = measure(detect, imgs, bxs, reps=20)
    print(f"L={n_lm} ({nseg} seg) G={g}: {dt*1e3:8.2f} ms / {batch} faces "
          f"-> {batch/dt:.0f} faces/sec (rtt {rtt*1e3:.1f} ms)",
          flush=True)
    return batch / dt


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--cpu-check":
        cpu_check(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
        return

    from superviseddescent_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    n_lm = int(sys.argv[1]) if len(sys.argv) > 1 else 29
    g = int(sys.argv[2]) if len(sys.argv) > 2 else None
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
    measure_family(n_lm, g, batch)


if __name__ == "__main__":
    main()
