"""Materialise a multi-hundred-image training set on disk.

The bundled LFPW sample is 5 images; the reference's real training runs
use 300-W-scale sets (rcr-train.cpp:361-380 loads a directory of
image+.pts pairs). This script derives N *distinct* image files from the
bundled 5 by random similarity warps (rotation/scale/translation about
the face centre) plus photometric jitter, writing consistent warped
.pts annotations next to each PNG — so the full training I/O path
(file scan, PNG decode, .pts parse, stacking, host->device upload) can
be driven end to end at realistic scale, not with a tiled device array.

Usage: python scripts/make_synth_dataset.py OUT_DIR [N] [SEED]
"""
import glob
import os
import sys

import numpy as np
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATA = "/root/reference/examples/data/ibug_lfpw_trainset"


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth300"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 0

    from superviseddescent_tpu.io.pts import (
        read_pts_landmarks, write_pts_landmarks)
    from superviseddescent_tpu.utils.landmarks import LandmarkCollection

    os.makedirs(out_dir, exist_ok=True)
    bases = []
    for png in sorted(glob.glob(f"{DATA}/*.png")):
        img = Image.open(png).convert("L")
        bases.append((np.asarray(img, np.uint8),
                      read_pts_landmarks(png.replace(".png", ".pts"))))
    assert bases, DATA

    rng = np.random.default_rng(seed)
    for i in range(n):
        img, lms = bases[i % len(bases)]
        h, w = img.shape
        theta = rng.uniform(-12, 12) * np.pi / 180.0
        s = rng.uniform(0.9, 1.1)
        tx, ty = rng.uniform(-10, 10, size=2)
        c = lms.coordinates.mean(axis=0)  # rotate about the face centre
        ca, sa = s * np.cos(theta), s * np.sin(theta)
        # forward map: p' = R(p - c) + c + t
        A = np.array([[ca, -sa], [sa, ca]], np.float64)
        b = c - A @ c + np.array([tx, ty])
        # PIL's AFFINE takes the output->input (inverse) map
        Ai = np.linalg.inv(A)
        bi = -Ai @ b
        warped = Image.fromarray(img).transform(
            (w, h), Image.AFFINE,
            (Ai[0, 0], Ai[0, 1], bi[0], Ai[1, 0], Ai[1, 1], bi[1]),
            resample=Image.BILINEAR)
        arr = np.asarray(warped, np.float64)
        gain = rng.uniform(0.85, 1.15)
        bias = rng.uniform(-12, 12)
        arr = np.clip(arr * gain + bias
                      + rng.normal(0, 2.0, arr.shape), 0, 255)
        coords = (lms.coordinates @ A.T + b).astype(np.float32)
        stem = os.path.join(out_dir, f"synth_{i:04d}")
        Image.fromarray(arr.astype(np.uint8)).save(stem + ".png")
        write_pts_landmarks(stem + ".pts",
                            LandmarkCollection(list(lms.names), coords))
    print(f"wrote {n} image+.pts pairs to {out_dir}")


if __name__ == "__main__":
    main()
