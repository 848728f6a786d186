"""Probe: faces-per-grid-step (G) sweep for the fused cascade kernel.

G=8 is the shipped default; G=16 was a >30 min Mosaic compile cliff
(docs/PERF_NOTES.md). This sweeps intermediate G at a batch divisible by
every candidate (3072) to see whether the batched-HOG-tail / GEMV
amortisation keeps paying past 8. Results -> docs/PERF_NOTES.md.
"""
import glob
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    from superviseddescent_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from superviseddescent_tpu.io import read_landmarks_list_to_train
    from superviseddescent_tpu.io.pts import read_pts_landmarks
    from superviseddescent_tpu.models import DetectionModel, gt_facebox
    from superviseddescent_tpu.models.rcr import (
        align_mean, level_sub_windows)
    from superviseddescent_tpu.ops.cascade_pallas import (
        detect_cascade_fused, permute_weights)
    from superviseddescent_tpu.ops.hog import hog_dimension
    from superviseddescent_tpu.ops.patches import (
        load_gray_image, stack_images)
    from superviseddescent_tpu.utils.landmarks import (
        resolve_eye_indices, to_landmark_collection, to_row)
    from superviseddescent_tpu.utils.timing import measure

    data = "/root/reference/examples/data/ibug_lfpw_trainset"
    cfg = "/root/reference/apps/rcr/data"
    model = DetectionModel.load(os.path.join(REPO, "pretrained",
                                             "rcr22_lfpw5.bin"))
    model_landmarks = read_landmarks_list_to_train(
        f"{cfg}/rcr_training_22.cfg")
    images, rows = [], []
    for png in sorted(glob.glob(f"{data}/*.png")):
        lms = read_pts_landmarks(png.replace(".png", ".pts"))
        images.append(load_gray_image(png))
        rows.append(to_row(lms.filter(model_landmarks)))
    boxes5 = np.stack([gt_facebox(to_landmark_collection(r, model_landmarks))
                       for r in np.stack(rows)]).astype(np.float32)
    stack, _ = stack_images(images, pad_width_to=128)

    batch, roi = 3072, 512
    # args: G or GxU (faces-per-step x g_unroll), e.g. "32x8"
    def parse(a):
        if "x" in a:
            g, u = a.split("x")
            return int(g), int(u)
        return int(a), None
    g_list = [parse(a) for a in sys.argv[1:]] or [(8, None), (12, None)]
    sel = np.arange(batch) % stack.shape[0]
    boxes = boxes5[sel]
    stk = jnp.asarray(stack, jnp.uint8)
    imgs = jax.jit(lambda st, i: st[i])(stk, jnp.asarray(sel, jnp.int32))

    max_ied = 145.0
    sub_w, sub_x = level_sub_windows(model.hog_params, roi, max_ied)
    p0 = model.hog_params[0]
    c = p0.num_cells
    dims = hog_dimension(p0.variant, p0.num_bins)
    levels = tuple((p.patch_size, sub_w[li], sub_x[li] or roi,
                    p.relative_patch_size)
                   for li, p in enumerate(model.hog_params))
    cell_sizes = tuple(p.cell_size for p in model.hog_params)
    r_idx, l_idx = resolve_eye_indices(
        model.landmark_ids, model.right_eye_ids, model.left_eye_ids)
    weights_perm = tuple(
        permute_weights(np.asarray(r.weights, np.float32).copy(),
                        len(model.landmark_ids), c, dims).copy()
        for r in model.sdo.regressors)
    n_lm = len(model.landmark_ids)

    h, w = imgs.shape[1], imgs.shape[2]
    bx = jnp.asarray(boxes)
    cx = bx[:, 0] + bx[:, 2] / 2.0
    cy = bx[:, 1] + bx[:, 3] / 2.0
    oy = jnp.clip(jnp.round(cy - roi / 2.0), 0, h - roi).astype(jnp.int32)
    ox = jnp.clip(jnp.round(cx - roi / 2.0), 0, w - roi).astype(jnp.int32)
    windows = jax.jit(jax.vmap(lambda img, y0, x0: jax.lax.dynamic_slice(
        img, (y0, x0), (roi, roi))))(imgs, oy, ox).astype(jnp.bfloat16)
    shift = jnp.concatenate([
        jnp.tile(ox.astype(jnp.float32)[:, None], (1, n_lm)),
        jnp.tile(oy.astype(jnp.float32)[:, None], (1, n_lm))], axis=1)
    x0 = align_mean(jnp.asarray(model.mean)[None, :], bx) - shift

    def build(g, gu):
        # constant weights closed into the jit (probe_fused.py lesson)
        @jax.jit
        def run(wn, xx):
            return detect_cascade_fused(
                wn, xx, weights_perm, levels, cell_sizes, p0.num_bins,
                dims, tuple(r_idx), tuple(l_idx), faces_per_step=g,
                g_unroll=gu)
        return run

    ref_out = None
    for g, gu in g_list:
        run = build(g, gu)
        t0 = time.time()
        out = run(windows, x0)
        out.block_until_ready()
        print(f"G={g}x{gu}: compile+first {time.time()-t0:.1f}s", flush=True)
        o = np.asarray(out)
        if ref_out is None:
            ref_out = o
        else:
            print(f"G={g}x{gu}: max |delta| vs first: "
                  f"{np.abs(o - ref_out).max():.4f} px", flush=True)
        dt, rtt = measure(run, windows, x0, reps=20)
        print(f"G={g}x{gu}: {dt*1e3:7.2f} ms / {batch} faces "
              f"-> {batch/dt:.0f} faces/sec (rtt {rtt*1e3:.1f} ms)",
              flush=True)


if __name__ == "__main__":
    main()
