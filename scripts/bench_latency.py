"""Fenced single-face (batch-1) serving latency — the rcr-track scenario.

The reference's rcr-track prints per-frame face-detect + landmark-fit
wall times (rcr-track.cpp:146-166) but records no numbers; its landmark
fit is the single-threaded SDO::predict loop measured at ~10 ms/face on
this machine (BASELINE.md). This script measures the TPU equivalents at
batch 1 with the scalar-readback fence (utils/timing.py):

  * fused whole-cascade kernel (ops/cascade_pallas.py), batch 1;
  * stepped window-sampler fast path (8 kernels), batch 1;
  * Haar face detection (models/facedetect.py), one 512x768 frame.

Faces/boxes live on device (the steady tracking loop re-uses the frame
already uploaded for face detection; host->device frame upload is a
PCIe-class transfer outside the tunnel's artificial RTT).
"""
import glob
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
DATA = "/root/reference/examples/data/ibug_lfpw_trainset"
CFG_DIR = "/root/reference/apps/rcr/data"


def main():
    import jax
    import jax.numpy as jnp
    from superviseddescent_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from superviseddescent_tpu.io import (read_landmarks_list_to_train,
                                          read_pts_landmarks)
    from superviseddescent_tpu.models import DetectionModel, gt_facebox
    from superviseddescent_tpu.ops.patches import (load_gray_image,
                                                   stack_images)
    from superviseddescent_tpu.utils.landmarks import (
        to_landmark_collection, to_row)
    from superviseddescent_tpu.utils.timing import measure

    model = DetectionModel.load(os.path.join(REPO, "pretrained",
                                             "rcr22_lfpw5.bin"))
    model_landmarks = read_landmarks_list_to_train(
        f"{CFG_DIR}/rcr_training_22.cfg")
    png = sorted(glob.glob(f"{DATA}/*.png"))[0]
    lms = read_pts_landmarks(png.replace(".png", ".pts"))
    row = to_row(lms.filter(model_landmarks))
    box = gt_facebox(to_landmark_collection(row, model_landmarks))
    stack, _ = stack_images([load_gray_image(png)], pad_width_to=128)

    frame = jax.device_put(jnp.asarray(stack, jnp.uint8))        # (1, H, W)
    box1 = jax.device_put(jnp.asarray(box, jnp.float32)[None])   # (1, 4)

    fused = model.make_fused_detector(roi=512, max_ied=145.0)
    dt, r = measure(fused, frame, box1, reps=50)
    print(f"fused cascade, batch 1:   {dt*1e3:7.2f} ms/frame "
          f"(fence rtt {r*1e3:.1f} ms)")

    stepped = model.make_stepped_detector(
        1, roi=512, sampling="fast", window_sampler=True, max_ied=145.0)
    dt_s, _ = measure(stepped, frame, box1, reps=50)
    print(f"stepped window, batch 1:  {dt_s*1e3:7.2f} ms/frame")

    xml = "/usr/share/opencv4/haarcascades/haarcascade_frontalface_alt2.xml"
    if os.path.exists(xml):
        from superviseddescent_tpu.models.facedetect import (
            HaarCascadeDetector)
        det = HaarCascadeDetector(xml, scale_factor=1.2, min_neighbors=2,
                                  min_size=(50, 50))
        img = np.asarray(stack[0], np.float32)
        det.detect(img)                       # compile + host grouping
        import time

        def med_wall(f, reps=30):
            """Median + p90 wall time: the tunnel's readback RTT has
            ~±10 ms outliers (scripts/probe_readback.py), so a 10-rep
            mean overstates the typical frame by several ms."""
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                f()
                ts.append(time.perf_counter() - t0)
            ts = np.sort(ts)
            return ts[len(ts) // 2], ts[int(len(ts) * 0.9)]

        dt_fd, p90 = med_wall(lambda: det.detect(img))
        n = len(det.detect(img))
        print(f"Haar face detect ({img.shape[0]}x{img.shape[1]}): "
              f"{dt_fd*1e3:7.2f} ms/frame median (p90 {p90*1e3:.1f}; "
              f"{n} boxes; host grouping + readback included)")
        img_dev = jax.device_put(jnp.asarray(img))
        dt_fd, p90 = med_wall(lambda: det.detect(img_dev))
        print(f"Haar, device-resident frame:  {dt_fd*1e3:7.2f} ms/frame "
              f"median (p90 {p90*1e3:.1f}; skips the per-call frame upload)")
        # batched multi-frame sweep: one pyramid enqueue + ONE readback
        # for the whole stack (training re-detection / video segments)
        for nb in (8, 32):
            frames = jax.device_put(jnp.broadcast_to(
                jnp.asarray(img), (nb,) + img.shape))
            det.detect_batch(frames)          # compile
            t0 = time.perf_counter()
            reps = 5
            for _ in range(reps):
                outs = det.detect_batch(frames)
            dt_b = (time.perf_counter() - t0) / (reps * nb)
            print(f"Haar detect_batch, B={nb}:    {dt_b*1e3:7.2f} ms/frame "
                  f"({1.0/dt_b:,.0f} frames/sec; {len(outs)} frames/call)")
        # pipelined single-frame stream (detect_begin/detect_end): frame
        # N's ~25 ms readback RTT overlaps frame N+1's device compute,
        # preserving per-frame ordering latency unlike detect_batch
        n_stream = 30
        stream_frames = [img_dev] * n_stream
        list(det.detect_stream(stream_frames[:2]))    # warm
        t0 = time.perf_counter()
        outs = list(det.detect_stream(stream_frames))
        dt_st = (time.perf_counter() - t0) / n_stream
        print(f"Haar detect_stream (pipelined, {n_stream} frames): "
              f"{dt_st*1e3:7.2f} ms/frame ({1.0/dt_st:,.0f} frames/sec; "
              f"{len(outs[0])} boxes/frame)")
    else:
        print("no Haar cascade XML found; skipping face-detect latency")

    print(f"\ntracking loop (fit only): {1.0/dt:,.0f} frames/sec fused; "
          f"reference ~10 ms/face single-core (BASELINE.md)")


if __name__ == "__main__":
    main()
