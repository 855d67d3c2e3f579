from gdn_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    fsdp_spec,
    model_size,
    param_mode,
    replicated,
    shard_batch,
    shard_state,
    spatial_size,
    tensor_parallel_spec,
    tree_shardings,
)
