"""Native checkpointing for detection models (orbax + JSON metadata).

The reference's only persistence is the final cereal binary dump — there is
no mid-training checkpoint/resume (SURVEY.md §5: each level's weights exist
only in memory until the final save). Here:

  * :func:`save_native` / :func:`load_native` store a DetectionModel as an
    orbax PyTree checkpoint (weight stack) + a JSON sidecar (landmark ids,
    HOG params, regulariser config) — the TPU-native format; the cereal
    codec (io/cereal.py) remains the reference-compatible import/export.
  * :class:`TrainCheckpointer` adds per-cascade-level checkpoint/resume for
    long training runs: each trained level's weights are persisted as soon
    as the solve finishes, and training can resume from the last completed
    level (new capability over the reference).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np


def _model_meta(model) -> dict:
    return {
        "format_version": 1,
        "landmark_ids": model.landmark_ids,
        "right_eye_ids": model.right_eye_ids,
        "left_eye_ids": model.left_eye_ids,
        "hog_params": [
            {"variant": int(p.variant), "num_cells": p.num_cells,
             "cell_size": p.cell_size, "num_bins": p.num_bins,
             "relative_patch_size": p.relative_patch_size}
            for p in model.hog_params],
        "regularisers": [
            {"type": int(r.regulariser.regularisation_type),
             "param": float(r.regulariser.param),
             "regularise_last_row": bool(r.regulariser.regularise_last_row)}
            for r in model.sdo.regressors],
    }


def save_native(model, directory) -> None:
    """Save a DetectionModel as an orbax checkpoint + metadata JSON."""
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    with open(os.path.join(directory, "model.json"), "w") as f:
        json.dump(_model_meta(model), f, indent=2)

    tree = {
        "mean": np.asarray(model.mean, np.float32),
        "weights": {str(i): np.asarray(r.weights, np.float32)
                    for i, r in enumerate(model.sdo.regressors)},
    }
    path = os.path.join(directory, "weights")
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, tree, force=True)


def load_native(directory):
    """Load a DetectionModel saved by :func:`save_native`."""
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from superviseddescent_tpu.core.cascade import SupervisedDescentOptimiser
    from superviseddescent_tpu.core.regressor import LinearRegressor
    from superviseddescent_tpu.core.regulariser import (
        Regulariser, RegularisationType)
    from superviseddescent_tpu.models.rcr import (
        DetectionModel, HogParams, InterEyeDistanceNormalisation)
    from superviseddescent_tpu.ops.hog import HogVariant

    directory = os.path.abspath(directory)
    with open(os.path.join(directory, "model.json")) as f:
        meta = json.load(f)
    if meta.get("format_version") != 1:
        raise ValueError(
            f"unsupported checkpoint format: {meta.get('format_version')}")

    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.restore(os.path.join(directory, "weights"))

    regressors = []
    for i, rmeta in enumerate(meta["regularisers"]):
        regressors.append(LinearRegressor(
            weights=jnp.asarray(tree["weights"][str(i)]),
            regulariser=Regulariser(RegularisationType(rmeta["type"]),
                                    rmeta["param"],
                                    rmeta["regularise_last_row"])))
    norm = InterEyeDistanceNormalisation(
        meta["landmark_ids"], meta["right_eye_ids"], meta["left_eye_ids"])
    sdo = SupervisedDescentOptimiser(regressors, norm)
    hog_params = tuple(
        HogParams(HogVariant(p["variant"]), p["num_cells"], p["cell_size"],
                  p["num_bins"], p["relative_patch_size"])
        for p in meta["hog_params"])
    return DetectionModel(sdo, tree["mean"], meta["landmark_ids"], hog_params,
                          meta["right_eye_ids"], meta["left_eye_ids"])


class TrainCheckpointer:
    """Per-cascade-level checkpoint/resume for RCR training.

    Usage: pass ``checkpointer.on_level`` as the training epoch callback and
    query :meth:`completed_levels` / :meth:`load_level` on resume. Levels are
    written as plain .npz (small matrices; atomic rename)."""

    def __init__(self, directory):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._level = 0

    def _path(self, level: int) -> str:
        return os.path.join(self.directory, f"level_{level:02d}.npz")

    def save_level(self, level: int, weights, current_x,
                   feature_order: str = "std") -> None:
        """feature_order tags the weight-ROW order of this level:
        "std" (reference Matlab order — every non-fused backend) or the
        fused kernel's compact order tag (rcr_training passes
        ops/cascade_pallas.KERNEL_FEATURE_ORDER, versioned so a kernel
        column-order change can never silently scramble a resumed
        run)."""
        # np.savez appends .npz when missing, so keep the suffix on the tmp
        tmp = os.path.join(self.directory, f".tmp_level_{level:02d}.npz")
        np.savez(tmp, weights=np.asarray(weights, np.float32),
                 current_x=np.asarray(current_x, np.float32),
                 feature_order=np.str_(feature_order))
        os.replace(tmp, self._path(level))

    def completed_levels(self) -> int:
        n = 0
        while os.path.exists(self._path(n)):
            n += 1
        return n

    def load_level(self, level: int, expect_order: str = "std"):
        with np.load(self._path(level)) as data:
            if "feature_order" in data:
                order = str(data["feature_order"])
            else:
                # pre-marker checkpoint: its row order is unknowable in
                # general (old fused runs used a since-changed kernel
                # order), so only the std order may assume compatibility
                order = "std"
            if order != expect_order:
                raise ValueError(
                    f"checkpoint level {level} holds '{order}'-order "
                    f"weights but this run solves in '{expect_order}' "
                    f"order — resume with the config that wrote it, or "
                    f"delete the checkpoint directory to retrain")
            return data["weights"], data["current_x"]
