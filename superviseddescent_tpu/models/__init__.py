from superviseddescent_tpu.models.pose import PoseProjection

__all__ = ["PoseProjection"]
