from emr2a_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    create_mesh,
    default_mesh,
    local_device_count,
)
from emr2a_tpu.parallel.sharding import (
    batch_sharding,
    replicated,
    shard_batch,
    with_sharding,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "create_mesh",
    "default_mesh",
    "local_device_count",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "with_sharding",
]
