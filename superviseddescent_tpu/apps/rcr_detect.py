"""rcr-detect: detect landmarks in one image with a trained RCR model.

CLI rebuild of /root/reference/apps/rcr/rcr-detect.cpp. The facebox comes
from --facebox x,y,w,h, from ground-truth landmarks (--pts), or from the
built-in TPU-native Haar cascade face detector (-f/--face-detector <xml>,
the same stock OpenCV cascade files the reference app loads,
rcr-detect.cpp:58-63,110; models/facedetect.py). Draws landmarks into an
output PNG when --output is given (PIL instead of cv::circle).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Detect facial landmarks with a trained RCR model (TPU)")
    p.add_argument("-m", "--model", required=True, help="trained model file")
    p.add_argument("-i", "--image", required=True, help="image to detect in")
    p.add_argument("--facebox", default=None, help="x,y,w,h")
    p.add_argument("--pts", default=None,
                   help="derive the facebox from this ground-truth .pts file")
    p.add_argument("-f", "--face-detector", default=None,
                   help="OpenCV Haar cascade XML for built-in face "
                        "detection (e.g. haarcascade_frontalface_alt2.xml)")
    p.add_argument("-o", "--output", default=None,
                   help="output image with drawn landmarks")
    args = p.parse_args(argv)

    from superviseddescent_tpu.models import DetectionModel, gt_facebox
    from superviseddescent_tpu.ops.patches import load_gray_image

    try:
        model = DetectionModel.load(args.model)
    except (OSError, ValueError) as e:
        print(f"Error loading the model: {e}")
        return 1

    image = load_gray_image(args.image)

    if args.facebox:
        box = tuple(float(v) for v in args.facebox.split(","))
    elif args.pts:
        from superviseddescent_tpu.io import read_pts_landmarks
        lms = read_pts_landmarks(args.pts).filter(model.landmark_ids)
        box = gt_facebox(lms)
    elif args.face_detector:
        from superviseddescent_tpu.models.facedetect import HaarCascadeDetector
        det = HaarCascadeDetector(args.face_detector, scale_factor=1.2,
                                  min_neighbors=2, min_size=(50, 50))
        boxes = det.detect(np.asarray(image))
        if len(boxes) == 0:
            print("No face detected.")
            return 1
        box = tuple(float(v) for v in boxes[0])
    else:
        print("Provide --facebox, --pts, or --face-detector <cascade.xml>.")
        return 1

    landmarks = model.detect(image, box)
    for name, (x, y) in zip(landmarks.names, landmarks.coordinates):
        print(f"{name}: {x:.2f} {y:.2f}")

    if args.output:
        from PIL import Image, ImageDraw
        img = Image.open(args.image).convert("RGB")
        draw = ImageDraw.Draw(img)
        for x, y in landmarks.coordinates:
            draw.ellipse([x - 2, y - 2, x + 2, y + 2], outline=(0, 255, 0))
        x0, y0, w, h = box
        draw.rectangle([x0, y0, x0 + w, y0 + h], outline=(255, 0, 0))
        img.save(args.output)
        print(f"Wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
