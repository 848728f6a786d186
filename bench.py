"""Benchmark: RCR 22-landmark batched detection throughput (faces/sec).

Trains a quick RCR-22 model on the bundled 5-image LFPW set, then measures
steady-state throughput of the jit-compiled 4-level detect cascade over a
device-resident face batch on the available TPU device(s).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "faces/sec", "vs_baseline": N/10000}
(North star: >10k faces/sec on a v5e-8; BASELINE.md — the reference itself
publishes no numbers.)
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from superviseddescent_tpu.io import (
        load_mean, read_landmarks_list_to_train, read_ied_definition,
        read_pts_landmarks)
    from superviseddescent_tpu.models import (
        RcrTrainConfig, gt_facebox, normalised_landmark_errors, train_rcr)
    from superviseddescent_tpu.ops.patches import load_gray_image, stack_images
    from superviseddescent_tpu.utils.landmarks import (
        resolve_eye_indices, to_landmark_collection, to_row)

    devices = jax.devices()
    log(f"devices: {devices}")

    data = "/root/reference/examples/data/ibug_lfpw_trainset"
    cfg_dir = "/root/reference/apps/rcr/data"
    model_landmarks = read_landmarks_list_to_train(
        f"{cfg_dir}/rcr_training_22.cfg")
    right_ids, left_ids = read_ied_definition(f"{cfg_dir}/rcr_eval.cfg")
    mean68 = load_mean(f"{cfg_dir}/mean_ibug_lfpw_68.txt")
    ibug_ids = [str(i) for i in range(1, 69)]
    mean = to_row(to_landmark_collection(mean68, ibug_ids)
                  .filter(model_landmarks))

    import glob
    images, rows = [], []
    for png in sorted(glob.glob(f"{data}/*.png")):
        lms = read_pts_landmarks(png.replace(".png", ".pts"))
        images.append(load_gray_image(png))
        rows.append(to_row(lms.filter(model_landmarks)))
    gt_rows = np.stack(rows)
    boxes = np.stack([gt_facebox(to_landmark_collection(r, model_landmarks))
                      for r in gt_rows]).astype(np.float32)
    stack, _ = stack_images(images)
    log(f"training RCR-22 on {len(images)} images "
        f"(stack {stack.shape}, {stack.nbytes/1e6:.0f} MB)")

    t0 = time.time()
    model = train_rcr(stack, gt_rows, boxes, model_landmarks,
                      right_ids, left_ids, mean,
                      RcrTrainConfig(seed=0))
    train_s = time.time() - t0
    log(f"cascade train: {train_s:.1f}s (incl. compile)")

    right_idx, left_idx = resolve_eye_indices(model_landmarks, right_ids,
                                              left_ids)
    pred = np.asarray(model.detect_batch(stack, boxes))
    err = float(np.mean(np.asarray(normalised_landmark_errors(
        pred, gt_rows, right_idx, left_idx))))
    log(f"IOD-normalised train-set detect error: {err:.4f}")

    # ---------------- throughput: batched detect ---------------- #
    batch = 512
    rng = np.random.default_rng(0)
    sel = rng.integers(0, len(images), size=batch)
    bench_images = jax.device_put(jnp.asarray(stack[sel]))
    bench_boxes = jax.device_put(jnp.asarray(boxes[sel]))
    idx = jnp.arange(batch, dtype=jnp.int32)

    @jax.jit
    def detect(imgs, bxs):
        return model.detect_batch(imgs, bxs, image_indices=idx)

    t0 = time.time()
    detect(bench_images, bench_boxes).block_until_ready()
    log(f"detect compile: {time.time()-t0:.1f}s")

    # steady state
    reps = 10
    t0 = time.time()
    for _ in range(reps):
        out = detect(bench_images, bench_boxes)
    out.block_until_ready()
    dt = (time.time() - t0) / reps
    faces_per_sec = batch / dt
    log(f"batched detect: {dt*1e3:.2f} ms / {batch} faces "
        f"-> {faces_per_sec:.0f} faces/sec on {len(devices)} device(s)")

    print(json.dumps({
        "metric": "rcr22_faces_per_sec",
        "value": round(faces_per_sec, 1),
        "unit": "faces/sec",
        "vs_baseline": round(faces_per_sec / 10000.0, 4),
    }))


if __name__ == "__main__":
    main()
