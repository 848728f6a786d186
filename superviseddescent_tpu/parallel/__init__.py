from superviseddescent_tpu.parallel.mesh import (
    make_mesh, shard_batch, replicate,
)
from superviseddescent_tpu.parallel.dist import (
    distributed_train_level, sharded_detect,
)

__all__ = [
    "make_mesh", "shard_batch", "replicate",
    "distributed_train_level", "sharded_detect",
]
