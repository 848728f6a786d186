"""rcr-train: train an RCR landmark detection model.

CLI rebuild of /root/reference/apps/rcr/rcr-train.cpp. Differences:
  * no OpenCV: faceboxes come from ground-truth landmarks (--facebox-source
    gt, default, with the margin mimicking a face-detector box) or from a
    JSON file of precomputed boxes (--facebox-source file:<path>) produced by
    any external face detector;
  * reproducible: --seed controls the perturbation PRNG (the reference seeds
    from std::random_device, rcr-train.cpp:392-395).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np


def load_dataset(directory, model_landmarks):
    """Load .png images + .pts landmarks, filtered to the model landmarks
    (reference: rcr-train.cpp:65-89, 361)."""
    from superviseddescent_tpu.io import read_pts_landmarks
    from superviseddescent_tpu.ops.patches import load_gray_image
    from superviseddescent_tpu.utils.landmarks import to_row

    images, rows, full_landmarks = [], [], []
    for png in sorted(glob.glob(os.path.join(directory, "*.png"))):
        pts = png.replace(".png", ".pts")
        if not os.path.exists(pts):
            continue
        lms = read_pts_landmarks(pts)
        images.append(load_gray_image(png))
        full_landmarks.append(lms)
        rows.append(to_row(lms.filter(model_landmarks)))
    if not images:
        raise SystemExit(f"no .png/.pts pairs found in {directory}")
    return images, np.stack(rows), full_landmarks


def resolve_faceboxes(source, full_landmarks, rows, model_landmarks,
                      images=None):
    from superviseddescent_tpu.models import gt_facebox
    from superviseddescent_tpu.utils.landmarks import to_landmark_collection
    if source.startswith("cascade:"):
        # the reference pipeline: Haar face detection + check_face
        # true-positive filter, discarding images whose face is not found
        # (rcr-train.cpp:383-436) — here with the TPU-native cascade
        # evaluator instead of OpenCV
        from superviseddescent_tpu.models.facedetect import HaarCascadeDetector
        from superviseddescent_tpu.utils.landmarks import check_face
        det = HaarCascadeDetector(source[len("cascade:"):], scale_factor=1.2,
                                  min_neighbors=2, min_size=(50, 50))
        # detect_batch per image-size class: one pyramid enqueue + ONE
        # device readback per distinct (H, W) instead of per image (the
        # reference re-detects image by image, rcr-train.cpp:410)
        by_shape = {}
        for i, img in enumerate(images):
            by_shape.setdefault(np.asarray(img).shape, []).append(i)
        all_boxes = [None] * len(images)
        for idxs in by_shape.values():
            stack = np.stack([np.asarray(images[i], np.float32)
                              for i in idxs])
            for i, bx in zip(idxs, det.detect_batch(stack)):
                all_boxes[i] = bx
        kept, out = [], []
        for i, full in enumerate(full_landmarks):
            boxes = all_boxes[i]
            # the reference checks only the FIRST detection and discards
            # the image if it fails (rcr-train.cpp:410-417 -> check_face
            # inspects detected_faces[0], helpers.hpp:106-131)
            if check_face(boxes, full):
                kept.append(i)
                out.append(boxes[0])
            else:
                print(f"image {i}: skipped (no verified face detection)")
        if not out:
            raise SystemExit("face detection found no usable training faces")
        return np.asarray(out, np.float32), kept
    if source == "gt":
        return np.stack([
            gt_facebox(to_landmark_collection(r, model_landmarks))
            for r in rows]).astype(np.float32), list(range(len(rows)))
    if source.startswith("file:"):
        with open(source[5:]) as f:
            boxes = json.load(f)   # list of [x, y, w, h] or null per image
        kept, out = [], []
        for i, b in enumerate(boxes):
            if b is not None:
                kept.append(i)
                out.append(b)
        return np.asarray(out, np.float32), kept
    raise SystemExit(f"unknown --facebox-source: {source}")


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Train an RCR facial landmark detection model (TPU)")
    p.add_argument("-d", "--data", required=True,
                   help="path to ibug images + .pts landmarks")
    p.add_argument("-m", "--mean",
                   default="/root/reference/examples/data/mean_ibug_lfpw_68.txt",
                   help="pre-calculated 68-point mean shape CSV")
    p.add_argument("-c", "--config",
                   default="/root/reference/apps/rcr/data/rcr_training_22.cfg",
                   help="model config (landmark list, INFO format)")
    p.add_argument("-e", "--evaluation",
                   default="/root/reference/apps/rcr/data/rcr_eval.cfg",
                   help="evaluation config (IED definition, INFO format)")
    p.add_argument("-o", "--output", default="model.bin",
                   help="model output file (cereal-compatible binary)")
    p.add_argument("-t", "--test-data", default=None,
                   help="optional test-set directory for evaluation")
    p.add_argument("--facebox-source", default="gt",
                   help="'gt' (from landmarks), 'file:<boxes.json>', or "
                        "'cascade:<haar.xml>' (built-in TPU face detector "
                        "+ check_face filter, like the reference app)")
    p.add_argument("--num-perturbations", type=int, default=10)
    p.add_argument("--lambda-factor", type=float, default=1.5,
                   help="MatrixNorm regularisation factor (reference: 1.5)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--levels", type=int, default=4)
    p.add_argument("--mesh", type=int, default=0,
                   help="shard training over this many devices (0 = single"
                        " device); uses a 1-D 'data' mesh with psum-reduced"
                        " normal equations")
    p.add_argument("--feature-chunk-size", type=int, default=None,
                   help="bound per-level feature-extraction memory by"
                        " processing the sample axis in chunks")
    p.add_argument("--roi", type=int, default=None,
                   help="crop a fixed ROI window per face before training"
                        " (device memory and sampling cost scale with"
                        " roi^2, not image area)")
    p.add_argument("--patch-backend", default=None,
                   choices=["dense", "gather", "window"],
                   help="patch sampler ('window' = Pallas window-resident,"
                        " requires --roi)")
    p.add_argument("--sampling", default="exact",
                   choices=["exact", "high", "fast"],
                   help="MXU precision of patch sampling")
    p.add_argument("--sigma-rotation", type=float, default=0.0,
                   help="in-plane rotation jitter (radians) on the"
                        " perturbed initialisations, beyond the reference's"
                        " translation/scale augmentation (0 = reference"
                        " behaviour)")
    p.add_argument("--mirror", action="store_true",
                   help="horizontal-flip augmentation: double the training"
                        " set with mirrored images + mirror-permuted"
                        " ground truth (ibug-68 correspondence)")
    args = p.parse_args(argv)

    from superviseddescent_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from superviseddescent_tpu import Regulariser, RegularisationType
    from superviseddescent_tpu.io import (
        load_mean, read_landmarks_list_to_train, read_ied_definition)
    from superviseddescent_tpu.models import (
        RCR22_HOG_PARAMS, RcrTrainConfig, align_mean,
        normalised_landmark_errors, train_rcr)
    from superviseddescent_tpu.ops.patches import stack_images
    from superviseddescent_tpu.utils.landmarks import (
        resolve_eye_indices, to_landmark_collection, to_row)

    model_landmarks = read_landmarks_list_to_train(args.config)
    print(f"Loaded a list of {len(model_landmarks)} landmarks to train the model.")
    right_ids, left_ids = read_ied_definition(args.evaluation)

    mean68 = load_mean(args.mean)
    ibug_ids = [str(i) for i in range(1, 69)]
    mean = to_row(to_landmark_collection(mean68, ibug_ids)
                  .filter(model_landmarks))

    images, gt_rows, full_lms = load_dataset(args.data, model_landmarks)
    boxes, kept = resolve_faceboxes(args.facebox_source, full_lms, gt_rows,
                                    model_landmarks, images=images)
    images = [images[i] for i in kept]
    gt_rows = gt_rows[kept]
    print(f"Kept {len(images)} images.")
    # uint8 is lossless for decoded grays (load_gray_image returns
    # uint8-valued f32) and quarters the host->device upload; the
    # 128-multiple width keeps the window backend's ROI crop on the
    # lane-static fast path (measured 29.4 -> 11.3 s warm at 300
    # distinct training images, scripts/bench_train_real_io.py)
    stack, _ = stack_images(images, dtype=np.uint8, pad_width_to=128)

    hog_params = RCR22_HOG_PARAMS[:args.levels]
    cfg = RcrTrainConfig(
        hog_params=hog_params,
        regularisation=Regulariser(RegularisationType.MatrixNorm,
                                   args.lambda_factor,
                                   regularise_last_row=False),
        num_perturbations=args.num_perturbations,
        sigma_rotation=args.sigma_rotation,
        seed=args.seed,
        feature_chunk_size=args.feature_chunk_size,
        roi=args.roi,
        patch_backend=args.patch_backend,
        sampling=args.sampling,
        mirror_augmentation=args.mirror)
    mesh = None
    if args.mesh:
        from superviseddescent_tpu.parallel import make_mesh
        mesh = make_mesh(args.mesh)
    right_idx, left_idx = resolve_eye_indices(model_landmarks, right_ids,
                                              left_ids)
    gt_rows_cb = gt_rows
    if args.mirror:
        # train_rcr appends the flipped faces after the originals; mirror
        # the callback ground truth the same way (same formula)
        from superviseddescent_tpu.utils.landmarks import mirror_permutation
        perm = mirror_permutation(model_landmarks)
        wpx = stack.shape[2]
        l = len(model_landmarks)
        gt_flip = np.concatenate(
            [(wpx - 1.0) - gt_rows[:, :l][:, perm],
             gt_rows[:, l:][:, perm]], axis=1)
        gt_rows_cb = np.concatenate([gt_rows, gt_flip])
    gt_aug = np.repeat(gt_rows_cb, args.num_perturbations + 1, axis=0)

    def on_epoch(x):
        x = np.asarray(x)
        nlsr = np.linalg.norm(x - gt_aug) / np.linalg.norm(gt_aug)
        err = float(np.mean(np.asarray(normalised_landmark_errors(
            x, gt_aug, right_idx, left_idx))))
        print(f"NLSR train: {nlsr:.6f}")
        print(f"Normalised LM-error train: {err:.6f}")

    print("Training the model, printing the residual after each learned regressor:")
    t0 = time.time()
    model = train_rcr(stack, gt_rows, boxes, model_landmarks,
                      right_ids, left_ids, mean, cfg, on_epoch=on_epoch,
                      mesh=mesh)
    print(f"Training took {time.time() - t0:.1f}s")
    model.save(args.output)
    print(f"Saved model to {args.output}")

    if args.test_data:
        t_images, t_rows, t_full = load_dataset(args.test_data,
                                                model_landmarks)
        t_boxes, t_kept = resolve_faceboxes(args.facebox_source, t_full,
                                            t_rows, model_landmarks,
                                            images=t_images)
        t_images = [t_images[i] for i in t_kept]
        t_rows = t_rows[t_kept]
        print(f"Kept {len(t_images)} test images.")
        t_stack, _ = stack_images(t_images, dtype=np.uint8,
                                  pad_width_to=128)

        init = np.asarray(align_mean(mean[None, :], t_boxes))
        err0 = float(np.mean(np.asarray(normalised_landmark_errors(
            init, t_rows, right_idx, left_idx))))
        print(f"Normalised LM-error test from mean init: {err0:.6f}")

        pred = np.asarray(model.detect_batch(t_stack, t_boxes))
        nlsr = np.linalg.norm(pred - t_rows) / np.linalg.norm(t_rows)
        per_lm = np.asarray(normalised_landmark_errors(
            pred, t_rows, right_idx, left_idx))
        print(f"NLSR test: {nlsr:.6f}")
        print(f"Normalised LM-error test: {float(per_lm.mean()):.6f}")

        # per-landmark error file for plotting (rcr-train.cpp:526-538)
        error_file = os.path.splitext(args.output)[0] + ".error.txt"
        with open(error_file, "w") as f:
            f.write(", ".join(f"{v:g}" for v in per_lm.mean(axis=0)) + "\n")
        print(f"Wrote per-landmark errors to {error_file}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
