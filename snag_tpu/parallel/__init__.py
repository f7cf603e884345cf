from snag_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, entity_sharding, batch_sharding, replicated,
    shard_kg_arrays, make_sharded_train_step,
)
