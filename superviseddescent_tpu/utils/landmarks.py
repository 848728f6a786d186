"""Landmark containers and helpers.

Host-side equivalent of the reference's landmark layer
(/root/reference/include/rcr/landmark.hpp:34-64, helpers.hpp:45-160).

The device-side convention everywhere (matching the reference) is one row
per shape: ``[x_0 .. x_{n-1}, y_0 .. y_{n-1}]``.

Named landmarks only exist at the host boundary (IO, configs). On device,
eye identifiers etc. are resolved once to static index tuples so the IED
computation is jit-traceable (see :func:`ied_from_rows`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


@dataclass
class LandmarkCollection:
    """Named 2D landmarks. ``coordinates`` is (N, 2) float32 [x, y]."""

    names: list
    coordinates: np.ndarray

    def __post_init__(self):
        self.coordinates = np.asarray(self.coordinates, np.float32)
        assert self.coordinates.shape == (len(self.names), 2)

    def __len__(self):
        return len(self.names)

    def filter(self, keep_names: Sequence[str]) -> "LandmarkCollection":
        """Subset by name, in the order of `keep_names`
        (reference: landmark.hpp:54-64 keeps search order of the filter list)."""
        index = {n: i for i, n in enumerate(self.names)}
        rows = [index[n] for n in keep_names if n in index]
        kept = [n for n in keep_names if n in index]
        return LandmarkCollection(kept, self.coordinates[rows])

    def __getitem__(self, name: str) -> np.ndarray:
        return self.coordinates[self.names.index(name)]


def to_row(landmarks: LandmarkCollection) -> np.ndarray:
    """(N,2) named landmarks -> (2N,) row [x..., y...]
    (reference: helpers.hpp:45-55)."""
    c = landmarks.coordinates
    return np.concatenate([c[:, 0], c[:, 1]]).astype(np.float32)


def to_landmark_collection(row, names: Sequence[str]) -> LandmarkCollection:
    """Row [x..., y...] -> named landmarks (reference: helpers.hpp:66-75)."""
    row = np.asarray(row).reshape(-1)
    n = row.shape[0] // 2
    assert n == len(names)
    coords = np.stack([row[:n], row[n:]], axis=1)
    return LandmarkCollection(list(names), coords)


def resolve_eye_indices(model_landmarks: Sequence[str],
                        right_eye_ids: Sequence[str],
                        left_eye_ids: Sequence[str]
                        ) -> Tuple[Tuple[int, ...], Tuple[int, ...]]:
    """Resolve eye identifier names to static index tuples into the model
    landmark list. Raises if an identifier is missing (reference throws,
    helpers.hpp:144/153)."""
    index = {n: i for i, n in enumerate(model_landmarks)}
    try:
        right = tuple(index[n] for n in right_eye_ids)
        left = tuple(index[n] for n in left_eye_ids)
    except KeyError as e:
        raise ValueError(
            f"eye identifier {e} not present in model landmarks") from e
    return right, left


def ied_from_rows(rows: jnp.ndarray,
                  right_idx: Tuple[int, ...],
                  left_idx: Tuple[int, ...]) -> jnp.ndarray:
    """Inter-eye distance per row, jit-traceable.

    rows: (..., 2N) in the [x..., y...] layout. Eye centers are the means of
    the identified landmarks per eye; IED is their L2 distance
    (reference: helpers.hpp:136-160).

    Returns (...,) IED values.
    """
    n = rows.shape[-1] // 2
    xs, ys = rows[..., :n], rows[..., n:]
    ri = jnp.asarray(right_idx)
    li = jnp.asarray(left_idx)
    rx = jnp.mean(xs[..., ri], axis=-1)
    ry = jnp.mean(ys[..., ri], axis=-1)
    lx = jnp.mean(xs[..., li], axis=-1)
    ly = jnp.mean(ys[..., li], axis=-1)
    return jnp.sqrt((rx - lx) ** 2 + (ry - ly) ** 2)


def get_ied(landmarks: LandmarkCollection,
            right_eye_ids: Sequence[str],
            left_eye_ids: Sequence[str]) -> float:
    """Host-side IED from named landmarks (reference: helpers.hpp:136-160)."""
    right = np.mean([landmarks[n] for n in right_eye_ids], axis=0)
    left = np.mean([landmarks[n] for n in left_eye_ids], axis=0)
    return float(np.linalg.norm(right - left))


# ibug-68 left-right landmark correspondence under a horizontal flip
# (mirror pairs; midline ids 9, 28-31, 34, 52, 58, 63, 67 map to
# themselves). This is the landmark-level twin of the reference's HOG
# descriptor flip permutation (/root/reference/include/rcr/hog.c:233-268):
# the reference builds the feature-space permutation, we flip at the
# data level for training augmentation.
_IBUG68_MIRROR_PAIRS = (
    (1, 17), (2, 16), (3, 15), (4, 14), (5, 13), (6, 12), (7, 11), (8, 10),
    (18, 27), (19, 26), (20, 25), (21, 24), (22, 23),        # brows
    (32, 36), (33, 35),                                      # nose base
    (37, 46), (38, 45), (39, 44), (40, 43), (41, 48), (42, 47),  # eyes
    (49, 55), (50, 54), (51, 53),                            # outer mouth
    (61, 65), (62, 64), (60, 56), (59, 57), (68, 66),        # inner mouth
)


def mirror_permutation(model_landmarks: Sequence[str]) -> np.ndarray:
    """(L,) index map for horizontally flipped faces (ibug naming).

    In a flipped image, the landmark named ``model_landmarks[i]`` sits at
    the mirrored position of the ORIGINAL image's landmark
    ``model_landmarks[perm[i]]`` — so a flipped ground-truth row is
    ``x' = (W-1) - x[perm]``, ``y' = y[perm]``.

    Raises if the landmark set is not closed under the ibug-68 mirror
    map (a one-sided subset cannot be flip-augmented).
    """
    mirror = {}
    for a, b in _IBUG68_MIRROR_PAIRS:
        mirror[str(a)] = str(b)
        mirror[str(b)] = str(a)
    index = {n: i for i, n in enumerate(model_landmarks)}
    perm = []
    for n in model_landmarks:
        partner = mirror.get(n, n)
        if partner not in index:
            raise ValueError(
                f"landmark set is not mirror-closed: {n!r} needs its "
                f"flip partner {partner!r} (ibug-68 correspondence)")
        perm.append(index[partner])
    return np.asarray(perm, np.int64)


def check_face(detected_faces, groundtruth: LandmarkCollection) -> bool:
    """True-positive filter: ground-truth landmarks "37", "46", "58" must be
    inside the first detected facebox (reference: helpers.hpp:106-131).

    detected_faces: sequence of (x, y, w, h) boxes.
    """
    if len(detected_faces) == 0:
        return False
    x, y, w, h = detected_faces[0]
    for name in ("37", "46", "58"):
        if name in groundtruth.names:
            px, py = groundtruth[name]
            # cv::Rect::contains uses half-open [x, x+w) x [y, y+h);
            # the reference converts to integer cv::Point first.
            ipx, ipy = int(px), int(py)
            if not (x <= ipx < x + w and y <= ipy < y + h):
                return False
    return True
