from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    device_prefetch,
    host_to_device,
    make_mesh,
    make_mesh_2d,
    model_sharded_params,
    replicated,
    shard_batch,
)
