from dig_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    fsdp_param_shardings,
    replicate,
    shard_batch,
)
