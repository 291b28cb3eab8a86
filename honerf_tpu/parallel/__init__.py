from honerf_tpu.parallel.mesh import (
    DATA_AXIS,
    data_sharding,
    make_mesh,
    pad_to_multiple,
    replicated_sharding,
    shard_ray_batch,
)

__all__ = [
    "DATA_AXIS",
    "data_sharding",
    "make_mesh",
    "pad_to_multiple",
    "replicated_sharding",
    "shard_ray_batch",
]
from honerf_tpu.parallel.shard_step import make_obj_train_step_shardmap

__all__.append("make_obj_train_step_shardmap")

from honerf_tpu.parallel.video_shard import (
    FRAME_AXIS,
    frame_batch_specs,
    make_video_fit_step_sharded,
)

__all__ += ["FRAME_AXIS", "frame_batch_specs", "make_video_fit_step_sharded"]
