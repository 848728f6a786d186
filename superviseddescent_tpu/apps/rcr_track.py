"""rcr-track: track landmarks over a frame sequence.

CLI rebuild of /root/reference/apps/rcr/rcr-track.cpp. Operates on a
directory of image frames (sorted) instead of an OpenCV VideoCapture; tracks
by initialising each frame from the previous frame's landmarks (the
reference stubs this out and re-detects per frame, rcr-track.cpp:168-177 —
here tracking is actually wired, with a facebox re-init fallback when the
estimate collapses). Prints per-frame fit latencies like the reference
(:146-166).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time

import numpy as np


def enclosing_bbox(row):
    """Bounding box of a landmark row (reference: rcr-track.cpp:47-55)."""
    l = row.shape[0] // 2
    x0, y0 = row[:l].min(), row[l:].min()
    x1, y1 = row[:l].max(), row[l:].max()
    return float(x0), float(y0), float(x1 - x0), float(y1 - y0)


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Track facial landmarks over an image sequence (TPU)")
    p.add_argument("-m", "--model", required=True)
    p.add_argument("-f", "--frames", required=True,
                   help="directory of frames (*.png / *.jpg, sorted)")
    p.add_argument("--facebox", default=None,
                   help="initial facebox x,y,w,h for the first frame")
    p.add_argument("--face-detector", default=None,
                   help="OpenCV Haar cascade XML: detect the initial "
                        "facebox (and re-detect on tracking loss) like the "
                        "reference app (rcr-track.cpp:141)")
    p.add_argument("-o", "--output-dir", default=None,
                   help="write annotated frames here")
    p.add_argument("--no-fused", action="store_true",
                   help="disable the fused whole-cascade tracking kernel "
                        "(exact monolithic fit instead of fast-mode)")
    p.add_argument("--depth", type=int, default=8,
                   help="keep D tracked rows' device->host readbacks in "
                        "flight (each row's async transfer starts at "
                        "dispatch and is collected D frames later; D "
                        "overlapped transfers pipeline at ~RTT/D over a "
                        "remote tunnel). Rows are bit-identical to "
                        "--depth 1; output and loss detection lag the "
                        "dispatch front by exactly D frames. Measured: "
                        "21 -> 129 tracked fps at D=8 "
                        "(docs/PERF_NOTES.md). Use --depth 1 for strict "
                        "per-frame interactive output")
    p.add_argument("--scan", action="store_true",
                   help="offline whole-clip mode: upload every frame "
                        "once and run the entire sequence as ONE "
                        "compiled lax.scan program (one dispatch, one "
                        "readback; 0.026 ms/frame measured — "
                        "docs/PERF_NOTES.md). Requires same-shape "
                        "frames; loss checks run host-side afterwards "
                        "(no mid-clip facebox re-init)")
    args = p.parse_args(argv)
    if args.depth < 1:
        raise SystemExit("--depth must be >= 1")

    from superviseddescent_tpu.models import DetectionModel
    from superviseddescent_tpu.ops.patches import load_gray_image
    from superviseddescent_tpu.utils.landmarks import to_row

    model = DetectionModel.load(args.model)
    frames = sorted(glob.glob(os.path.join(args.frames, "*.png"))
                    + glob.glob(os.path.join(args.frames, "*.jpg")))
    if not frames:
        raise SystemExit(f"no frames in {args.frames}")

    face_det = None
    if args.face_detector:
        from superviseddescent_tpu.models.facedetect import HaarCascadeDetector
        face_det = HaarCascadeDetector(args.face_detector, scale_factor=1.2,
                                       min_neighbors=2, min_size=(50, 50))
    if args.facebox:
        box = tuple(float(v) for v in args.facebox.split(","))
    elif face_det is not None:
        first = load_gray_image(frames[0])
        boxes = face_det.detect(np.asarray(first))
        if len(boxes) == 0:
            raise SystemExit("no face detected in the first frame")
        box = tuple(float(v) for v in boxes[0])
    else:
        raise SystemExit("provide --facebox or --face-detector")
    def estimate_ok(row, shape):
        """Sanity of the tracked estimate: finite, not collapsed, and not
        drifted out of frame — on failure we re-initialise from a facebox
        (the reference's re-detect-on-loss intent, rcr-track.cpp:168-177,
        which it stubs out by re-detecting every frame)."""
        if not np.isfinite(row).all():
            return False
        x, y, w, h = enclosing_bbox(row)
        hh, ww = shape
        return (w > 5 and h > 5 and x + w > 0 and y + h > 0
                and x < ww and y < hh)

    from superviseddescent_tpu.utils.landmarks import to_landmark_collection

    tracker = detector = None   # fused whole-cascade fits (lazy)
    fused_usable = not args.no_fused
    ROI = 512

    def fused_pair(shape, face_size):
        """Build (or fetch) the fused facebox + tracking fits; None when
        the model, this frame, or this FACE cannot use them — a face
        larger than ~60% of the roi window would be cropped/IED-clamped
        by the fused fit (the exact path handles any size), so such
        frames fall back per frame. The fused path also avoids the
        monolithic single-face jit whose cold remote compile dominates a
        first frame."""
        nonlocal tracker, detector, fused_usable
        if (not fused_usable or shape[0] < ROI or shape[1] < ROI
                or face_size > 0.6 * ROI):
            return None
        if tracker is None:
            try:
                detector = model.make_fused_detector(roi=ROI)
                tracker = model.make_fused_tracker(roi=ROI)
                print("using the fused whole-cascade kernel "
                      "(--no-fused for the exact fit)")
            except ValueError as e:
                fused_usable = False
                print(f"fused kernel unavailable ({e}); using the "
                      "exact fit")
                return None
        return detector, tracker

    def annotate(path, lms):
        from PIL import Image, ImageDraw
        os.makedirs(args.output_dir, exist_ok=True)
        img = Image.open(path).convert("RGB")
        draw = ImageDraw.Draw(img)
        for x, y in lms.coordinates:
            draw.ellipse([x - 2, y - 2, x + 2, y + 2],
                         outline=(0, 255, 0))
        img.save(os.path.join(args.output_dir, os.path.basename(path)))

    def pad_align(img_u8):
        """Zero-pad a uint8 frame to the fused kernel's (32, 128) DMA
        alignment so it rides the in-kernel-crop frames path AS uint8 —
        the per-frame host->device upload is the host-loop bottleneck
        over a remote tunnel and uint8 quarters it (measured: 37.7 ->
        128.8 tracked fps at depth/chunk 8, docs/PERF_NOTES.md).
        Padding is right/bottom only: coordinates are unchanged."""
        h, w = img_u8.shape
        ph, pw = -(-h // 32) * 32, -(-w // 128) * 128
        if (ph, pw) == (h, w):
            return img_u8
        out = np.zeros((ph, pw), np.uint8)
        out[:h, :w] = img_u8
        return out

    if args.scan:
        # offline whole-clip mode: ONE lax.scan program over the padded
        # uint8 frame stack (make_fused_track_scan; rows identical to
        # the streaming loop), loss checks host-side afterwards
        if args.no_fused:
            raise SystemExit("--scan requires the fused kernel")
        imgs = [pad_align(np.asarray(load_gray_image(p))) for p in frames]
        if len({im.shape for im in imgs}) != 1:
            raise SystemExit("--scan requires same-shape frames")
        if imgs[0].shape[0] < ROI or imgs[0].shape[1] < ROI:
            raise SystemExit(f"--scan requires frames >= {ROI}x{ROI}")
        scan = model.make_fused_track_scan(roi=ROI)
        t0 = time.time()
        rows = np.asarray(scan(np.stack(imgs), np.float32(box)))
        wall = time.time() - t0
        print(f"scan: {len(frames)} frames in {wall*1e3:.1f} ms "
              f"({wall / len(frames) * 1e3:.3f} ms/frame incl. "
              "upload+compile on first run)")
        for i, (path, row) in enumerate(zip(frames, rows)):
            print(f"frame {i} ({os.path.basename(path)}): "
                  f"bbox {tuple(round(v, 1) for v in enclosing_bbox(row))}")
            if not estimate_ok(row, imgs[i].shape):
                print(f"frame {i}: tracking lost (no mid-clip re-init "
                      "in --scan mode)")
            if args.output_dir:
                annotate(path, to_landmark_collection(
                    row, model.landmark_ids))
        return 0

    # Fused tracking runs as an ASYNC-WINDOW pipeline (VERDICT r4
    # item 4; docs/PERF_NOTES.md "Tracked frames/s"): the loop's only
    # inter-frame dependency — frame N+1 initialises from frame N's
    # landmark row (model.hpp:147-157) — stays device-resident, so fits
    # keep dispatching while each completed row's device->host readback
    # (started at dispatch via copy_to_host_async) rides back in
    # parallel; D overlapped transfers pipeline at ~RTT/D over a remote
    # tunnel, and each row is collected exactly D frames after its
    # dispatch (measured: 21 -> 129 tracked fps at D=8 on host frames).
    # Output and loss detection lag the dispatch front by exactly D
    # frames; on a loss every frame in flight rode a bad chain, so
    # refit() re-fits them synchronously from the (re-detected) facebox.
    import collections
    prev_row = None   # last DECODED host row (lags the dispatch front)
    prev_dev = None   # device row driving the next fused fit
    pending = collections.deque()   # in flight: [i, path, image, row_dev]
    t_iter = time.time()
    lag_tag = f" (lag {args.depth})" if args.depth > 1 else " (pipelined)"

    def report_row(i, path, image, row, tag):
        """Print + annotate + loss-check one decoded row. Returns False
        when tracking was lost (facebox re-detected as a side effect)."""
        nonlocal box, t_iter
        wall_ms = (time.time() - t_iter) * 1000.0
        t_iter = time.time()
        print(f"frame {i} ({os.path.basename(path)}): fit {wall_ms:.1f} ms"
              f"{tag}, "
              f"bbox {tuple(round(v, 1) for v in enclosing_bbox(row))}")
        if args.output_dir:
            annotate(path, to_landmark_collection(row, model.landmark_ids))
        if not estimate_ok(row, image.shape):
            print(f"frame {i}: tracking lost, re-initialising")
            if face_det is not None:
                redetected = face_det.detect(image)
                if len(redetected):
                    box = tuple(float(v) for v in redetected[0])
            return False
        return True

    def decode_oldest():
        """Collect the oldest in-flight row. Returns False on a
        tracking loss (caller must refit the rest of the pipeline)."""
        nonlocal prev_row
        i, path, image, row_dev = pending.popleft()
        row = np.asarray(row_dev)[0]
        if report_row(i, path, image, row, lag_tag):
            prev_row = row
            return True
        return False

    def refit(metas):
        """Re-fit frames that rode a lost chain, synchronously from the
        (re-detected) facebox; leaves prev_dev/prev_row on the new
        chain. Frames whose re-fit is ALSO lost restart the chain."""
        nonlocal prev_dev, prev_row
        prev_dev = None
        for (i, path, image, _) in metas:
            if prev_dev is None:
                row_dev = detector(image[None], np.float32(box)[None])
            else:
                row_dev = tracker(image[None], prev_dev)
            prev_dev = row_dev
            row = np.asarray(row_dev)[0]
            if report_row(i, path, image, row, " (refit)"):
                prev_row = row
            else:
                prev_dev = None
                prev_row = None

    def recover():
        """A decoded row was a tracking loss: every frame still in
        flight rode the bad chain — re-fit them from the facebox."""
        nonlocal prev_dev, prev_row
        metas = list(pending)
        pending.clear()
        if metas:
            refit(metas)
        else:
            prev_dev = None
            prev_row = None

    def drain():
        """Decode everything in flight, recovering from any loss."""
        while pending:
            if not decode_oldest():
                recover()

    for i, path in enumerate(frames):
        image = np.asarray(load_gray_image(path))   # uint8 grayscale
        if prev_row is None and prev_dev is None:
            face_size = max(box[2], box[3])
        else:
            # the lagged host row is a slightly-stale (fine) size proxy;
            # before the first decode, fall back to the facebox size
            ref = prev_row if prev_row is not None else np.float32(
                [box[0], box[0] + box[2], box[1], box[1] + box[3]])
            _, _, bw, bh = enclosing_bbox(ref)
            face_size = max(bw, bh)
        fused = fused_pair(image.shape, face_size)
        t0 = time.time()
        try:
            if fused:
                detector_f, tracker_f = fused
                pimg = pad_align(image)
                if prev_dev is None:
                    row_dev = detector_f(pimg[None], np.float32(box)[None])
                else:
                    row_dev = tracker_f(pimg[None], prev_dev)
                prev_dev = row_dev
                row_dev.copy_to_host_async()
                pending.append([i, path, pimg, row_dev])
                if len(pending) > args.depth:
                    if not decode_oldest():
                        recover()
                continue
            # exact (non-fused) path: synchronous per frame; drain the
            # pipeline first so prev_row is current
            drain()
            prev_dev = None
            if prev_row is None:
                lms = model.detect(image, box)
            else:
                lms = model.detect_from_landmarks(image, prev_row)
        except Exception as e:  # noqa: BLE001 — degrade, don't crash
            if not fused:
                raise
            # first-call compile/trace failures surface here, not at
            # build time; disable the fused path and redo exactly
            print(f"fused fit failed ({type(e).__name__}: {e}); "
                  "falling back to the exact fit")
            tracker = detector = None
            fused_usable = False
            prev_dev = None
            pending.clear()
            if prev_row is None:
                lms = model.detect(image, box)
            else:
                lms = model.detect_from_landmarks(image, prev_row)
        fit_ms = (time.time() - t0) * 1000.0
        t_iter = time.time()
        prev_row = to_row(lms)
        print(f"frame {i} ({os.path.basename(path)}): fit {fit_ms:.1f} ms, "
              f"bbox {tuple(round(v, 1) for v in enclosing_bbox(prev_row))}")
        if not estimate_ok(prev_row, np.asarray(image).shape):
            print(f"frame {i}: tracking lost, re-initialising")
            if face_det is not None:
                redetected = face_det.detect(np.asarray(image))
                if len(redetected):
                    box = tuple(float(v) for v in redetected[0])
            prev_row = None  # next frame restarts from the facebox
        if args.output_dir:
            annotate(path, lms)
    drain()
    return 0


if __name__ == "__main__":
    sys.exit(main())
