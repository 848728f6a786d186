from superviseddescent_tpu.models.facedetect import (
    HaarCascadeDetector,
    group_rectangles,
)
from superviseddescent_tpu.models.pose import PoseProjection
from superviseddescent_tpu.models.rcr import (
    DetectionModel,
    HogParams,
    HogTransform,
    InterEyeDistanceNormalisation,
    RCR22_HOG_PARAMS,
    align_mean,
    gt_facebox,
)
from superviseddescent_tpu.models.rcr_training import (
    RcrTrainConfig,
    train_rcr,
    augment_initialisations,
    perturb_facebox,
    normalised_landmark_errors,
)

__all__ = [
    "HaarCascadeDetector",
    "group_rectangles",
    "PoseProjection",
    "DetectionModel",
    "HogParams",
    "HogTransform",
    "InterEyeDistanceNormalisation",
    "RCR22_HOG_PARAMS",
    "align_mean",
    "gt_facebox",
    "RcrTrainConfig",
    "train_rcr",
    "augment_initialisations",
    "perturb_facebox",
    "normalised_landmark_errors",
]
