"""Leave-one-IDENTITY-out held-out accuracy on the synthetic set.

The bundled LFPW sample has 5 faces, so the bench's leave-one-out
protocol trains on 4 images — data-starved and only 5 test points. This
protocol scales both sides with the synthetic derivation
(make_synth_dataset.py): N images round-robin the 5 identities under
random similarity warps + photometric jitter, each fold trains on every
image of 4 identities (mirror-augmented) and evaluates on every image of
the held-out identity — the held-out face is never seen at ANY warp.
Same generalisation axis as the reference's train/test split
(rcr-train.cpp:474-538), with 12x the test points of the 5-image
protocol. Results -> docs/PERF_NOTES.md + README.

Usage: python scripts/eval_heldout_synth.py [DIR] [N]
"""
import glob
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CFG_DIR = "/root/reference/apps/rcr/data"
# identity count = the number of base PNGs make_synth_dataset.py round-
# robins (i % len(bases)); derived from the same dir so the fold labels
# can never misalign with the generator (ADVICE r3)
BASE_DIR = "/root/reference/examples/data/ibug_lfpw_trainset"


def n_identities() -> int:
    return len(glob.glob(os.path.join(BASE_DIR, "*.png")))


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth60"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    if len(glob.glob(os.path.join(d, "*.png"))) < n:
        subprocess.run([sys.executable,
                        os.path.join(REPO, "scripts/make_synth_dataset.py"),
                        d, str(n)], check=True,
                       env=dict(os.environ, PALLAS_AXON_POOL_IPS="",
                                JAX_PLATFORMS="cpu"))

    from superviseddescent_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from superviseddescent_tpu.io import (
        load_mean, read_ied_definition, read_landmarks_list_to_train,
        read_pts_landmarks)
    from superviseddescent_tpu.models import (
        RcrTrainConfig, gt_facebox, normalised_landmark_errors, train_rcr)
    from superviseddescent_tpu.ops.patches import (
        load_gray_image, stack_images)
    from superviseddescent_tpu.utils.landmarks import (
        resolve_eye_indices, to_landmark_collection, to_row)

    model_landmarks = read_landmarks_list_to_train(
        f"{CFG_DIR}/rcr_training_22.cfg")
    right_ids, left_ids = read_ied_definition(f"{CFG_DIR}/rcr_eval.cfg")
    mean68 = load_mean(
        "/root/reference/examples/data/mean_ibug_lfpw_68.txt")
    ibug_ids = [str(i) for i in range(1, 69)]
    mean = to_row(to_landmark_collection(mean68, ibug_ids)
                  .filter(model_landmarks))
    r_idx, l_idx = resolve_eye_indices(model_landmarks, right_ids, left_ids)

    n_ident = n_identities()
    images, rows, ident = [], [], []
    pngs = sorted(glob.glob(os.path.join(d, "*.png")))[:n]
    for i, png in enumerate(pngs):
        lms = read_pts_landmarks(png.replace(".png", ".pts"))
        images.append(load_gray_image(png))
        rows.append(to_row(lms.filter(model_landmarks)))
        ident.append(i % n_ident)  # make_synth_dataset round-robins
    rows = np.stack(rows)
    ident = np.asarray(ident)
    boxes = np.stack([gt_facebox(to_landmark_collection(r, model_landmarks))
                      for r in rows]).astype(np.float32)
    stack, _ = stack_images(images, dtype=np.uint8, pad_width_to=128)

    cfg = RcrTrainConfig(seed=0, roi=512, patch_backend="window",
                         sampling="fast", hog_fast=True,
                         solver_method="cholesky", feature_chunk_size=2048,
                         mirror_augmentation=True)
    fold_err = []
    for k in range(n_ident):
        tr = np.nonzero(ident != k)[0]
        te = np.nonzero(ident == k)[0]
        t0 = time.time()
        model = train_rcr(stack[tr], rows[tr], boxes[tr], model_landmarks,
                          right_ids, left_ids, mean, cfg)
        pred = np.asarray(model.detect_batch(stack[te], boxes[te]))
        err = np.asarray(normalised_landmark_errors(
            pred, rows[te], r_idx, l_idx))
        fold_err.append(err)
        print(f"fold {k}: train {len(tr)} imgs (x2 mirror x11 inits), "
              f"test {len(te)} -> IOD err mean {err.mean():.4f} "
              f"worst {err.max():.4f}  ({time.time()-t0:.1f}s)", flush=True)
    all_err = np.concatenate(fold_err)
    print(f"leave-one-identity-out ({n} synth images): "
          f"mean {all_err.mean():.4f} worst-image {all_err.max():.4f} "
          f"per-fold means {[f'{e.mean():.4f}' for e in fold_err]}",
          flush=True)


if __name__ == "__main__":
    main()
