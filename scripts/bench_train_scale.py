"""Fenced 300-W-scale training benchmark (README's scale-train claim).

1,024 faces (LFPW tiled) x 11 inits = 11,264 samples, window backend,
roi=512, feature_chunk_size=2048, uint8 stack. Prints per-level fenced
times (LevelTimer) and the fenced end-to-end wall time, warm and cold.
"""
import glob
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
DATA = "/root/reference/examples/data/ibug_lfpw_trainset"
CFG_DIR = "/root/reference/apps/rcr/data"


def main():
    import jax.numpy as jnp
    from superviseddescent_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from superviseddescent_tpu.io import (load_mean,
                                          read_landmarks_list_to_train,
                                          read_pts_landmarks)
    from superviseddescent_tpu.models import (RcrTrainConfig, gt_facebox,
                                              train_rcr)
    from superviseddescent_tpu.ops.patches import (load_gray_image,
                                                   stack_images)
    from superviseddescent_tpu.utils.landmarks import (
        to_landmark_collection, to_row)
    from superviseddescent_tpu.utils.profiling import LevelTimer
    from superviseddescent_tpu.utils.timing import force
    from superviseddescent_tpu.io import read_ied_definition

    model_landmarks = read_landmarks_list_to_train(
        f"{CFG_DIR}/rcr_training_22.cfg")
    right_ids, left_ids = read_ied_definition(f"{CFG_DIR}/rcr_eval.cfg")
    mean68 = load_mean(f"{CFG_DIR}/mean_ibug_lfpw_68.txt")
    ibug_ids = [str(i) for i in range(1, 69)]
    mean = to_row(to_landmark_collection(mean68, ibug_ids)
                  .filter(model_landmarks))

    images, rows = [], []
    for png in sorted(glob.glob(f"{DATA}/*.png")):
        lms = read_pts_landmarks(png.replace(".png", ".pts"))
        images.append(load_gray_image(png))
        rows.append(to_row(lms.filter(model_landmarks)))
    # pad width to the lane tile so patch_backend='fused' can take the
    # in-kernel-crop frames path (harmless zero columns for 'window')
    stack, _ = stack_images(images, dtype=np.uint8, pad_width_to=128)
    # default 1024 faces (the README scale config); pass e.g. 3148 for the
    # full 300-W train-set face count (x11 inits = 34,628 samples)
    n_faces = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    backend = sys.argv[2] if len(sys.argv) > 2 else "window"
    sel = (np.arange(n_faces) % stack.shape[0]).astype(np.int32)
    gt = np.stack(rows)[sel]
    boxes = np.stack([gt_facebox(to_landmark_collection(r, model_landmarks))
                      for r in gt]).astype(np.float32)

    cfg = RcrTrainConfig(seed=0, roi=512, patch_backend=backend,
                         hog_fast=True,
                         sampling="fast", solver_method="cholesky",
                         feature_chunk_size=2048)
    print(f"backend={backend} faces={n_faces}", flush=True)

    for label in ("cold", "warm"):
        timer = LevelTimer()
        t0 = time.perf_counter()
        model = train_rcr(stack, gt, boxes, model_landmarks,
                          right_ids, left_ids, mean, cfg,
                          image_indices=sel, on_epoch=timer)
        force(model.sdo.regressors[-1].weights)
        dt = time.perf_counter() - t0
        print(f"{label}: total {dt:6.1f}s  levels "
              + " ".join(f"{t/1e3:.2f}s" for t in timer.times_ms),
              flush=True)


if __name__ == "__main__":
    main()
