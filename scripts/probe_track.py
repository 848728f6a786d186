"""Measure tracked frames/s: sequential vs pipelined landmark fitting.

The reference's rcr-track prints per-frame fit latency as its own metric
(/root/reference/apps/rcr/rcr-track.cpp:146-166). Over a remote/tunneled
backend the naive loop pays a synchronous host readback (~25-30 ms RTT)
per frame for a ~0.1 ms device fit; the pipelined stream
(models/rcr.py::make_fused_track_stream, VERDICT r4 item 4) dispatches
frame N+1's fit before frame N's readback so the RTT overlaps the next
frame's upload + fit.

Four measured modes over a ~100-frame synthetic sequence (the bundled
LFPW face under a +-2 px horizontal drift):

  seq-host    per-frame upload + fit + blocking np.asarray readback
              (the pre-round-5 app loop)
  pipe-host   make_fused_track_stream over host numpy frames
              (the round-5 app default)
  seq-dev     frames pre-uploaded to device, sequential readback
  pipe-dev    stream over device-resident frames

Usage: python scripts/probe_track.py [n_frames]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 100
WARMUP = 10     # frames excluded from the timed window (compile + ramp)
ROI = 512
MAX_IED = 145.0


def build_frames(base, n):
    """Synthetic tracking sequence: the base frame under a slow +-2 px
    horizontal sinusoidal drift (content-preserving roll keeps the face
    in frame and the tracker locked)."""
    h, w = base.shape
    frames = []
    for t in range(n):
        dx = int(round(2.0 * np.sin(2 * np.pi * t / 25.0)))
        frames.append(np.roll(base, dx, axis=1))
    return frames


def main():
    import glob

    from superviseddescent_tpu.models import DetectionModel, gt_facebox
    from superviseddescent_tpu.io import read_pts_landmarks
    from superviseddescent_tpu.ops.patches import load_gray_image
    from superviseddescent_tpu.utils.cache import enable_compilation_cache
    from superviseddescent_tpu.utils.landmarks import to_row

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    repo = os.path.join(os.path.dirname(__file__), "..")
    data = "/root/reference/examples/data/ibug_lfpw_trainset"
    model = DetectionModel.load(os.path.join(repo, "pretrained",
                                             "rcr22_lfpw5.bin"))
    png = sorted(glob.glob(os.path.join(data, "*.png")))[0]
    lms = read_pts_landmarks(png.replace(".png", ".pts"))
    base = np.asarray(load_gray_image(png), np.float32)
    # pad to the fused detector's expectations (roi window must fit)
    h, w = base.shape
    ph, pw = max(h, ROI), max(((w + 127) // 128) * 128, ROI)
    padded = np.zeros((ph, pw), np.float32)
    padded[:h, :w] = base
    box = np.asarray(gt_facebox(lms.filter(model.landmark_ids)), np.float32)

    frames = build_frames(padded, N_FRAMES)
    detector = model.make_fused_detector(roi=ROI, max_ied=MAX_IED)
    tracker = model.make_fused_tracker(roi=ROI, max_ied=MAX_IED)

    # warm the compiles once (cold remote compiles must not hit the loops)
    r0 = detector(frames[0][None], box[None])
    r1 = tracker(frames[1][None], r0)
    np.asarray(r1)

    def run_sequential(frame_seq, label):
        prev = detector(np.asarray(frame_seq[0])[None]
                        if not isinstance(frame_seq[0], jax.Array)
                        else frame_seq[0][None], box[None])
        last = np.asarray(prev)
        t0 = None
        for i, f in enumerate(frame_seq[1:], 1):
            img = f[None] if isinstance(f, jax.Array) \
                else jnp.asarray(f)[None]
            prev = tracker(img, prev)
            last = np.asarray(prev)          # blocking per-frame readback
            if i == WARMUP:
                t0 = time.time()
        dt = time.time() - t0
        n = len(frame_seq) - 1 - WARMUP
        print(f"{label:10s} {dt / n * 1e3:7.2f} ms/frame "
              f"({n / dt:6.1f} fps)", flush=True)
        return last, dt / n

    def run_pipelined(frame_seq, label, chunk=1, depth=None):
        stream = model.make_fused_track_stream(roi=ROI, max_ied=MAX_IED,
                                               chunk=chunk, depth=depth)
        t0 = None
        n_timed = 0
        last = None
        for i, row in enumerate(stream(iter(frame_seq), box)):
            last = row
            if i == WARMUP:
                t0 = time.time()
            elif i > WARMUP:
                n_timed += 1
        dt = time.time() - t0
        print(f"{label:10s} {dt / n_timed * 1e3:7.2f} ms/frame "
              f"({n_timed / dt:6.1f} fps)", flush=True)
        return last, dt / n_timed

    print(f"{N_FRAMES} frames {padded.shape}, timing frames "
          f"{WARMUP + 1}..{N_FRAMES - 1}", flush=True)

    seq_host, t_sh = run_sequential(frames, "seq-host")
    pipe_host, t_ph = run_pipelined(frames, "pipe-host")

    dev_frames = [jax.device_put(jnp.asarray(f)) for f in frames]
    np.asarray(dev_frames[-1])  # fence the uploads out of the timed window
    seq_dev, t_sd = run_sequential(dev_frames, "seq-dev")
    pipe_dev, t_pd = run_pipelined(dev_frames, "pipe-dev")

    np.testing.assert_allclose(np.asarray(seq_host)[0], pipe_host, atol=1e-4)
    np.testing.assert_allclose(np.asarray(seq_dev)[0], pipe_dev, atol=1e-4)
    print(f"pipelining speedup: host {t_sh / t_ph:.2f}x, "
          f"device-resident {t_sd / t_pd:.2f}x", flush=True)

    # chunked readback (round 5): one (K, 2L) transfer per K frames —
    # the only lever past the one-RTT-per-frame wall measured above
    for chunk in (4, 8, 16):
        last_h, t_ch = run_pipelined(frames, f"chunk{chunk}-host",
                                     chunk=chunk)
        np.testing.assert_allclose(np.asarray(seq_host)[0], last_h,
                                   atol=1e-4)
        last_d, t_cd = run_pipelined(dev_frames, f"chunk{chunk}-dev",
                                     chunk=chunk)
        np.testing.assert_allclose(np.asarray(seq_dev)[0], last_d,
                                   atol=1e-4)
        print(f"  chunk={chunk}: host {t_sh / t_ch:.2f}x, "
              f"device-resident {t_sd / t_cd:.2f}x vs sequential",
              flush=True)

    # async-window readback (round 5): copy_to_host_async at dispatch,
    # collect D frames later — D in-flight transfers pipeline at ~RTT/D
    # (scripts/probe_async_readback.py), per-frame delivery, fixed lag
    for depth in (4, 8, 16):
        last_h, t_dh = run_pipelined(frames, f"depth{depth}-host",
                                     depth=depth)
        np.testing.assert_allclose(np.asarray(seq_host)[0], last_h,
                                   atol=1e-4)
        last_d, t_dd = run_pipelined(dev_frames, f"depth{depth}-dev",
                                     depth=depth)
        np.testing.assert_allclose(np.asarray(seq_dev)[0], last_d,
                                   atol=1e-4)
        print(f"  depth={depth}: host {t_sh / t_dh:.2f}x, "
              f"device-resident {t_sd / t_dd:.2f}x vs sequential",
              flush=True)


if __name__ == "__main__":
    main()
