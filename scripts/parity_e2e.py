"""End-to-end C++-vs-JAX landmark parity (BASELINE.json: <= 1e-4 IOD).

Runs the REFERENCE's actual RCR inference loop (native/reference_parity.cc:
reference-compiled hog.c + cereal model loading + the model.hpp:132-144 /
superviseddescent.hpp:323-344 predict semantics) and this framework's
DetectionModel.detect (exact sampling path) on the SAME self-trained model
and the SAME faceboxes over the 5 bundled LFPW images, then reports the
max/mean IOD-normalised landmark delta between the two implementations.

Because both sides consume identical weights from the model file, this
isolates *inference* parity end-to-end: patch crop/resize semantics, HOG
descriptor, Matlab-order flatten, GEMV, IED normalisation, cascade wiring.

Run (CPU is fine; exact math either way):
    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/parity_e2e.py
"""

import glob
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = "/root/reference/examples/data/ibug_lfpw_trainset"
BIN = "/tmp/reference_parity"


def build_harness():
    if not os.path.exists(BIN):
        subprocess.run(["sh", os.path.join(REPO, "native",
                                           "build_reference_parity.sh")],
                       check=True)
    return BIN


def run_parity(model_path=None, verbose=True):
    import jax
    from superviseddescent_tpu.io import read_pts_landmarks
    from superviseddescent_tpu.models import DetectionModel, gt_facebox
    from superviseddescent_tpu.utils.landmarks import (
        resolve_eye_indices, to_landmark_collection, to_row)

    model_path = model_path or os.path.join(REPO, "pretrained",
                                            "rcr22_lfpw5.bin")
    model = DetectionModel.load(model_path)
    ids = model.landmark_ids
    r_idx, l_idx = resolve_eye_indices(ids, model.right_eye_ids,
                                       model.left_eye_ids)

    pngs = sorted(glob.glob(os.path.join(DATA, "*.png")))
    gt_rows, boxes = [], []
    for png in pngs:
        lms = read_pts_landmarks(png.replace(".png", ".pts")).filter(ids)
        row = to_row(lms)
        gt_rows.append(row)
        boxes.append(gt_facebox(to_landmark_collection(row, ids)))
    gt_rows = np.stack(gt_rows).astype(np.float32)
    boxes = np.asarray(boxes, np.float32)

    # ---- C++ reference loop ---- #
    harness = build_harness()
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        for png, b in zip(pngs, boxes):
            f.write(f"{png} {b[0]:.9g} {b[1]:.9g} {b[2]:.9g} {b[3]:.9g}\n")
        jobs = f.name
    out = subprocess.run([harness, model_path, jobs], check=True,
                         capture_output=True, text=True).stdout
    cpp = np.array([[float(v) for v in line.split()]
                    for line in out.strip().splitlines()], np.float32)

    # ---- JAX exact path ---- #
    from superviseddescent_tpu.ops.patches import load_gray_image
    jax_rows = []
    for png, b in zip(pngs, boxes):
        img = load_gray_image(png)
        pred = model.detect(img, b)
        jax_rows.append(to_row(pred))
    jx = np.stack(jax_rows).astype(np.float32)

    # ---- parity metrics ---- #
    # The BASELINE.json budget is *error parity*: the IOD-normalised
    # landmark error vs ground truth must agree between the two
    # implementations to 1e-4. Raw landmark deltas are also reported as a
    # diagnostic; they are occasionally inflated by cvRound threshold
    # flips (an estimate differing by ~1e-5 px crosses a .5 boundary and
    # crops a discretely different patch) — inherent to the reference's
    # integer crop grid, and exactly the instability the error metric
    # averages away.
    from superviseddescent_tpu.utils.landmarks import ied_from_rows
    ied = np.asarray(ied_from_rows(gt_rows, r_idx, l_idx))      # (5,)
    L = len(ids)
    d = np.hypot(cpp[:, :L] - jx[:, :L], cpp[:, L:] - jx[:, L:])  # (5, L)
    rel = d / ied[:, None]

    def iod_err(rows):
        e = np.hypot(rows[:, :L] - gt_rows[:, :L],
                     rows[:, L:] - gt_rows[:, L:])
        return e.mean(axis=1) / ied
    err_cpp = iod_err(cpp)
    err_jax = iod_err(jx)
    err_delta = np.abs(err_cpp - err_jax)
    if verbose:
        print(f"platform: {jax.default_backend()}")
        for i, png in enumerate(pngs):
            print(f"  {os.path.basename(png)}: IOD err C++ {err_cpp[i]:.6f} "
                  f"JAX {err_jax[i]:.6f} |delta| {err_delta[i]:.2e} | "
                  f"lm delta max {rel[i].max():.2e} mean {rel[i].mean():.2e}")
        print(f"IOD-normalised ERROR parity: max |delta| {err_delta.max():.3e} "
              f"(budget 1e-4)")
        print(f"raw landmark delta: max {rel.max():.3e}, "
              f"mean {rel.mean():.3e} IOD units")
    return float(err_delta.max()), float(rel.max()), float(rel.mean())


if __name__ == "__main__":
    err_mx, lm_mx, lm_mean = run_parity(
        sys.argv[1] if len(sys.argv) > 1 else None)
    sys.exit(0 if err_mx <= 1e-4 else 1)
