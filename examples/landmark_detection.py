"""Hello-world HOG landmark detection: 5 of the 68 ibug landmarks.

Rebuild of /root/reference/examples/landmark_detection.cpp: non-adaptive HOG
(fixed patch size = num_cells * cell_size, so relative sizing is bypassed by
fixing the patch to the HOG input size), 3 regressors, MatrixNorm 0.1, on
the bundled LFPW images. Like the reference (landmark_detection.cpp:420-427)
the faceboxes come from Haar cascade face detection — here the built-in
TPU-native evaluator on the stock OpenCV XML (models/facedetect.py), with a
ground-truth-derived fallback when the XML is absent.

Run: python examples/landmark_detection.py
"""

import glob
import os
import tempfile

import numpy as np

from superviseddescent_tpu import Regulariser, RegularisationType
from superviseddescent_tpu.io import read_pts_landmarks
from superviseddescent_tpu.models import (
    HogParams, RcrTrainConfig, gt_facebox, normalised_landmark_errors,
    train_rcr)
from superviseddescent_tpu.ops.hog import HogVariant
from superviseddescent_tpu.ops.patches import load_gray_image, stack_images
from superviseddescent_tpu.utils.landmarks import (
    resolve_eye_indices, to_landmark_collection, to_row)

DATA = "/root/reference/examples/data/ibug_lfpw_trainset"

# 5 landmarks: right eye outer, left eye outer, mouth corners, nose tip
# (landmark_detection.cpp:129-143 uses ibug ids 31, 37, 46, 49, 55)
LANDMARKS = ["31", "37", "46", "49", "55"]
RIGHT_EYE, LEFT_EYE = ["37"], ["46"]


def main():
    images, rows = [], []
    for png in sorted(glob.glob(os.path.join(DATA, "*.png"))):
        lms = read_pts_landmarks(png.replace(".png", ".pts"))
        images.append(load_gray_image(png))
        rows.append(to_row(lms.filter(LANDMARKS)))
    gt_rows = np.stack(rows)
    xml = ("/usr/share/opencv4/haarcascades/"
           "haarcascade_frontalface_alt2.xml")
    if os.path.exists(xml):
        # the reference's pipeline: detectMultiScale(1.2, 2, 50x50)
        # (landmark_detection.cpp:420-427)
        from superviseddescent_tpu.models import HaarCascadeDetector
        det = HaarCascadeDetector(xml, scale_factor=1.2, min_neighbors=2,
                                  min_size=(50, 50))
        boxes = []
        for img, r in zip(images, gt_rows):
            found = det.detect(np.asarray(img))
            boxes.append(found[0] if len(found) else
                         gt_facebox(to_landmark_collection(r, LANDMARKS)))
        boxes = np.stack(boxes).astype(np.float32)
    else:
        boxes = np.stack([gt_facebox(to_landmark_collection(r, LANDMARKS))
                          for r in gt_rows]).astype(np.float32)
    stack, _ = stack_images(images)

    # mean from the training shapes mapped into facebox space
    def to_box_space(row, box):
        l = len(LANDMARKS)
        x, y, w, h = box
        return np.concatenate([(row[:l] - x) / w - 0.5,
                               (row[l:] - y) / h - 0.5])
    mean = np.mean([to_box_space(r, b) for r, b in zip(gt_rows, boxes)],
                   axis=0).astype(np.float32)

    # non-adaptive: 3 cells x 12 px, 4 bins (landmark_detection.cpp:440);
    # a large relative patch keeps the IED-adaptive size near the HOG input.
    hog = tuple(HogParams(HogVariant.Uoctti, 3, 12, 4, 1.0)
                for _ in range(3))
    cfg = RcrTrainConfig(
        hog_params=hog,
        regularisation=Regulariser(RegularisationType.MatrixNorm, 0.1, True),
        num_perturbations=5, seed=0)

    right_idx, left_idx = resolve_eye_indices(LANDMARKS, RIGHT_EYE, LEFT_EYE)
    model = train_rcr(stack, gt_rows, boxes, LANDMARKS, RIGHT_EYE, LEFT_EYE,
                      mean, cfg)

    pred = np.asarray(model.detect_batch(stack, boxes))
    err = np.asarray(normalised_landmark_errors(pred, gt_rows,
                                                right_idx, left_idx))
    print(f"IOD-normalised detect error over {len(images)} images: "
          f"{float(err.mean()):.4f}")
    out = os.path.join(tempfile.gettempdir(), "landmark_detection_model.bin")
    model.save(out)
    print(f"Saved {out}")

    lc = to_landmark_collection(pred[0], LANDMARKS)
    for name, (x, y) in zip(lc.names, lc.coordinates):
        print(f"  {name}: ({x:.1f}, {y:.1f})")


if __name__ == "__main__":
    main()
