from superviseddescent_tpu.parallel.mesh import (
    make_mesh, shard_batch, replicate,
)
from superviseddescent_tpu.parallel.dist import (
    distributed_train_level, make_sharded_fused_detector,
    sharded_detect, sharded_detect_fused,
)

__all__ = [
    "make_mesh", "shard_batch", "replicate",
    "distributed_train_level", "make_sharded_fused_detector",
    "sharded_detect", "sharded_detect_fused",
]
