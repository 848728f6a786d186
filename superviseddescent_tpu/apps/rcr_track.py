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

    prev_row = None
    for i, path in enumerate(frames):
        image = np.asarray(load_gray_image(path), np.float32)
        if prev_row is None:
            face_size = max(box[2], box[3])
        else:
            _, _, bw, bh = enclosing_bbox(prev_row)
            face_size = max(bw, bh)
        fused = fused_pair(image.shape, face_size)
        t0 = time.time()
        try:
            if prev_row is None:
                if fused:
                    row = np.asarray(fused[0](
                        image[None], np.float32(box)[None]))[0]
                    lms = to_landmark_collection(row, model.landmark_ids)
                else:
                    lms = model.detect(image, box)
            else:
                if fused:
                    row = np.asarray(fused[1](
                        image[None], prev_row[None]))[0]
                    lms = to_landmark_collection(row, model.landmark_ids)
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
            if prev_row is None:
                lms = model.detect(image, box)
            else:
                lms = model.detect_from_landmarks(image, prev_row)
        fit_ms = (time.time() - t0) * 1000.0
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
            from PIL import Image, ImageDraw
            os.makedirs(args.output_dir, exist_ok=True)
            img = Image.open(path).convert("RGB")
            draw = ImageDraw.Draw(img)
            for x, y in lms.coordinates:
                draw.ellipse([x - 2, y - 2, x + 2, y + 2],
                             outline=(0, 255, 0))
            img.save(os.path.join(args.output_dir, os.path.basename(path)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
