from superviseddescent_tpu.utils.landmarks import (
    LandmarkCollection,
    to_row,
    to_landmark_collection,
    get_ied,
    check_face,
)

__all__ = [
    "LandmarkCollection",
    "to_row",
    "to_landmark_collection",
    "get_ied",
    "check_face",
]
