"""Byte-exact reader/writer for the reference's cereal binary model format.

The reference persists trained RCR models with cereal::BinaryOutputArchive —
a raw little-endian concatenation with no field tags. The layout, derived
from the serialize() functions (SURVEY.md §5):

detection_model (/root/reference/include/rcr/model.hpp:178-182):
    SupervisedDescentOptimiser, mean: Mat, landmark_ids: vec<str>,
    hog_params: vec<HoGParam>, right_eye_ids: vec<str>, left_eye_ids: vec<str>

SupervisedDescentOptimiser (superviseddescent.hpp:356-360):
    regressors: vec<LinearRegressor>, normalisation: InterEyeDistanceNorm

LinearRegressor (regressors.hpp:395-399): x: Mat, Regulariser
Regulariser (regressors.hpp:164-168):
    int32 regularisation_type, float32 lambda, bool(1B) regularise_last_row
InterEyeDistanceNormalisation (model.hpp:111-115): 3 x vec<str>
HoGParam (adaptive_vlhog.hpp:55-59):
    int32 vlhog_variant, int32 num_cells, int32 cell_size, int32 num_bins,
    float32 relative_patch_size
cv::Mat (utils/mat_cerealisation.hpp:42-99):
    int32 rows, int32 cols, int32 type, bool(1B) continuous, raw bytes
vectors (cereal/types/vector.hpp): uint64 count, then elements
strings (cereal/types/string.hpp): uint64 size, then bytes

VlHogVariant enum (rcr/hog.h:72): DalalTriggs=0, Uoctti=1.
cv type codes: CV_32FC1 = 5.

The pretrained blobs are absent from the reference checkout
(.MISSING_LARGE_BLOBS), so correctness is established by round-trip tests
plus this documented layout.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import List

import numpy as np

# cv depth codes -> numpy dtypes (type = depth + (channels-1)*8)
_CV_DEPTH_TO_DTYPE = {
    0: np.uint8, 1: np.int8, 2: np.uint16, 3: np.int16,
    4: np.int32, 5: np.float32, 6: np.float64,
}
CV_32F = 5


@dataclass
class CerealHoGParam:
    vlhog_variant: int  # 0=DalalTriggs, 1=Uoctti
    num_cells: int
    cell_size: int
    num_bins: int
    relative_patch_size: float


@dataclass
class CerealRegressor:
    weights: np.ndarray          # (F, L) float32, the reference's `x`
    regularisation_type: int = 0  # 0=Manual, 1=MatrixNorm
    lambda_: float = 0.0
    regularise_last_row: bool = True


@dataclass
class CerealDetectionModel:
    """Python-side mirror of rcr::detection_model's serialized state."""
    regressors: List[CerealRegressor]
    # InterEyeDistanceNormalisation state:
    norm_model_landmarks: List[str]
    norm_right_eye_ids: List[str]
    norm_left_eye_ids: List[str]
    mean: np.ndarray             # (2N,) float32 row
    landmark_ids: List[str]
    hog_params: List[CerealHoGParam]
    right_eye_ids: List[str]
    left_eye_ids: List[str] = field(default_factory=list)


class _Writer:
    def __init__(self):
        self.parts = []

    def i32(self, v): self.parts.append(struct.pack("<i", int(v)))
    def u64(self, v): self.parts.append(struct.pack("<Q", int(v)))
    def f32(self, v): self.parts.append(struct.pack("<f", float(v)))
    def boolean(self, v): self.parts.append(struct.pack("<?", bool(v)))
    def raw(self, b): self.parts.append(bytes(b))

    def string(self, s: str):
        b = s.encode("utf-8")
        self.u64(len(b))
        self.raw(b)

    def string_vec(self, v):
        self.u64(len(v))
        for s in v:
            self.string(s)

    def mat(self, arr: np.ndarray):
        arr = np.ascontiguousarray(arr)
        if arr.ndim == 1:
            arr = arr[None, :]
        if arr.dtype != np.float32:
            raise ValueError("only CV_32FC1 matrices are written")
        self.i32(arr.shape[0])
        self.i32(arr.shape[1])
        self.i32(CV_32F)
        self.boolean(True)  # continuous
        self.raw(arr.tobytes())

    def getvalue(self):
        return b"".join(self.parts)


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def _take(self, n):
        if self.pos + n > len(self.data):
            raise ValueError("cereal archive truncated")
        b = self.data[self.pos:self.pos + n]
        self.pos += n
        return b

    def i32(self): return struct.unpack("<i", self._take(4))[0]
    def u64(self): return struct.unpack("<Q", self._take(8))[0]
    def f32(self): return struct.unpack("<f", self._take(4))[0]
    def boolean(self): return struct.unpack("<?", self._take(1))[0]

    def string(self):
        return self._take(self.u64()).decode("utf-8")

    def string_vec(self):
        return [self.string() for _ in range(self.u64())]

    def mat(self) -> np.ndarray:
        rows, cols, cvtype = self.i32(), self.i32(), self.i32()
        continuous = self.boolean()
        depth = cvtype & 7
        channels = (cvtype >> 3) + 1
        if channels != 1:
            raise ValueError(f"multi-channel Mat not supported: type {cvtype}")
        dtype = np.dtype(_CV_DEPTH_TO_DTYPE[depth])
        nbytes = rows * cols * dtype.itemsize
        # continuous or not, the writer emits the same rows*cols*elem bytes
        # (non-continuous mats are written row by row,
        #  mat_cerealisation.hpp:60-66)
        del continuous
        buf = self._take(nbytes)
        return np.frombuffer(buf, dtype=dtype).reshape(rows, cols).copy()


def _write_regressor(w: _Writer, r: CerealRegressor):
    w.mat(np.asarray(r.weights, np.float32))
    w.i32(r.regularisation_type)
    w.f32(r.lambda_)
    w.boolean(r.regularise_last_row)


def _read_regressor(r: _Reader) -> CerealRegressor:
    weights = r.mat()
    return CerealRegressor(
        weights=weights.astype(np.float32),
        regularisation_type=r.i32(),
        lambda_=r.f32(),
        regularise_last_row=r.boolean(),
    )


def save_detection_model(model: CerealDetectionModel, filename):
    """Write a reference-compatible model.bin
    (format of rcr::save_detection_model, model.hpp:207-219)."""
    w = _Writer()
    # SupervisedDescentOptimiser: vector<LinearRegressor>, normalisation
    w.u64(len(model.regressors))
    for reg in model.regressors:
        _write_regressor(w, reg)
    w.string_vec(model.norm_model_landmarks)
    w.string_vec(model.norm_right_eye_ids)
    w.string_vec(model.norm_left_eye_ids)
    # detection_model remainder
    w.mat(np.asarray(model.mean, np.float32))
    w.string_vec(model.landmark_ids)
    w.u64(len(model.hog_params))
    for hp in model.hog_params:
        w.i32(hp.vlhog_variant)
        w.i32(hp.num_cells)
        w.i32(hp.cell_size)
        w.i32(hp.num_bins)
        w.f32(hp.relative_patch_size)
    w.string_vec(model.right_eye_ids)
    w.string_vec(model.left_eye_ids)
    with open(filename, "wb") as f:
        f.write(w.getvalue())


def load_detection_model(filename) -> CerealDetectionModel:
    """Read a reference model.bin (format of rcr::load_detection_model)."""
    with open(filename, "rb") as f:
        data = f.read()
    r = _Reader(data)
    regressors = [_read_regressor(r) for _ in range(r.u64())]
    norm_model_landmarks = r.string_vec()
    norm_right = r.string_vec()
    norm_left = r.string_vec()
    mean = r.mat().reshape(-1)
    landmark_ids = r.string_vec()
    hog_params = []
    for _ in range(r.u64()):
        hog_params.append(CerealHoGParam(
            vlhog_variant=r.i32(),
            num_cells=r.i32(),
            cell_size=r.i32(),
            num_bins=r.i32(),
            relative_patch_size=r.f32(),
        ))
    right_eye_ids = r.string_vec()
    left_eye_ids = r.string_vec()
    if r.pos != len(data):
        raise ValueError(
            f"trailing bytes in model file: read {r.pos} of {len(data)}")
    return CerealDetectionModel(
        regressors=regressors,
        norm_model_landmarks=norm_model_landmarks,
        norm_right_eye_ids=norm_right,
        norm_left_eye_ids=norm_left,
        mean=mean.astype(np.float32),
        landmark_ids=landmark_ids,
        hog_params=hog_params,
        right_eye_ids=right_eye_ids,
        left_eye_ids=left_eye_ids,
    )
