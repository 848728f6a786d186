"""Probe: fused-indexed serving throughput vs batch size (VERDICT r4
item 7 — re-pin the headline faces/sec under the fixed bench).

The bench measures batch 4096; the g_unroll sweep (windows path,
batch 3072) hinted ~2% headroom from batch choice. Sweeps the
fused+image_indices path (the headline config) across batches at the
default G=32, g_unroll=4. Results -> docs/PERF_NOTES.md and, if a
clearly better batch exists, bench.py.

Usage: python scripts/probe_fused_batch.py [batch ...]
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
    from superviseddescent_tpu.ops.patches import (
        load_gray_image, stack_images)
    from superviseddescent_tpu.utils.landmarks import (
        to_landmark_collection, to_row)
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
    stk_u8 = jnp.asarray(stack, jnp.uint8)

    batches = [int(a) for a in sys.argv[1:]] or [2048, 4096, 8192, 16384]
    detect = model.make_fused_detector(roi=512, max_ied=145.0)
    for batch in batches:
        sel = (np.arange(batch) % stack.shape[0]).astype(np.int32)
        boxes = jnp.asarray(boxes5[sel])
        sel_dev = jnp.asarray(sel)
        t0 = time.time()
        detect(stk_u8, boxes, sel_dev).block_until_ready()
        t_c = time.time() - t0
        dt, rtt = measure(detect, stk_u8, boxes, sel_dev, reps=20)
        print(f"batch {batch:6d}: {dt*1e3:7.2f} ms -> {batch/dt:7.0f} "
              f"faces/sec (compile+first {t_c:.1f}s, rtt {rtt*1e3:.1f} ms)",
              flush=True)


if __name__ == "__main__":
    main()
