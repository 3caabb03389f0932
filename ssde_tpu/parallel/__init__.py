from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    host_to_device,
    make_mesh,
    make_mesh_2d,
    model_sharded_params,
    replicated,
    shard_batch,
)
