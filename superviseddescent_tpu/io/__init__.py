from superviseddescent_tpu.io.pts import read_pts_landmarks, write_pts_landmarks
from superviseddescent_tpu.io.meanshape import load_mean
from superviseddescent_tpu.io.infocfg import (
    parse_info,
    read_landmarks_list_to_train,
    read_ied_definition,
)
from superviseddescent_tpu.io.boost_mat import (
    dumps_mats,
    loads_mats,
    save_mats,
    load_mats,
)
from superviseddescent_tpu.io.cereal import (
    CerealDetectionModel,
    CerealRegressor,
    CerealHoGParam,
    save_detection_model,
    load_detection_model,
)

__all__ = [
    "read_pts_landmarks",
    "write_pts_landmarks",
    "load_mean",
    "parse_info",
    "read_landmarks_list_to_train",
    "read_ied_definition",
    "CerealDetectionModel",
    "CerealRegressor",
    "CerealHoGParam",
    "save_detection_model",
    "load_detection_model",
    "dumps_mats",
    "loads_mats",
    "save_mats",
    "load_mats",
]
