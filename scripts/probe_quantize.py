"""Probe: skip the fused kernel's in-kernel patch quantisation
(VERDICT r4 item 3: attack the per-landmark VPU floor — the round+clamp
is 2 full VPU passes over every sampled patch, ~(S, L*S) per level).

quantize=True reproduces the reference's uint8 patches
(cv::resize output, adaptive_vlhog.hpp:154-155); quantize=False keeps
the bilinear sample in bf16 — landmark deltas are sub-pixel (same class
as fast-mode sampling). Measures both through make_fused_detector at
the bench config and prints the accuracy delta on the train-set faces.

Usage: python scripts/probe_quantize.py [batch]
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
    from superviseddescent_tpu.models import (
        DetectionModel, gt_facebox, normalised_landmark_errors)
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
    gt_rows = np.stack(rows)
    boxes5 = np.stack([gt_facebox(to_landmark_collection(r, model_landmarks))
                       for r in gt_rows]).astype(np.float32)
    stack, _ = stack_images(images, pad_width_to=128)

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    roi = 512
    sel = np.arange(batch) % stack.shape[0]
    stk_u8 = jnp.asarray(stack, jnp.uint8)
    sel_dev = jnp.asarray(sel, jnp.int32)
    imgs_u8 = jax.jit(lambda st, i: st[i])(stk_u8, sel_dev)
    boxes = jnp.asarray(boxes5[sel])
    r_idx, l_idx = resolve_eye_indices(model_landmarks,
                                       model.right_eye_ids,
                                       model.left_eye_ids)

    outs = {}
    for q in (True, False):
        detect = model.make_fused_detector(roi=roi, max_ied=145.0,
                                           quantize=q)
        t0 = time.time()
        out = detect(imgs_u8, boxes)
        out.block_until_ready()
        print(f"quantize={q}: compile+first {time.time()-t0:.1f}s",
              flush=True)
        o = np.asarray(out)
        outs[q] = o
        err = float(np.mean(np.asarray(normalised_landmark_errors(
            o, gt_rows[sel], r_idx, l_idx))))
        dt, rtt = measure(detect, imgs_u8, boxes, reps=20)
        print(f"quantize={q}: {dt*1e3:7.2f} ms / {batch} "
              f"-> {batch/dt:.0f} faces/sec (rtt {rtt*1e3:.1f} ms), "
              f"train-set IOD err {err:.4f}", flush=True)
    d = np.abs(outs[True] - outs[False])
    print(f"landmark delta quantize on/off: max {d.max():.4f} px, "
          f"mean {d.mean():.4f} px", flush=True)


if __name__ == "__main__":
    main()
