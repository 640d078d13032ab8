from .mesh import (
    make_mesh, replicated, data_sharding, shard_batch, replicate,
    make_parallel_train_step, sharded_render_rays, initialize_multihost,
    pad_batch, padded_size,
)
