from .mesh import (  # noqa: F401
    batch_sharding,
    data_parallel_mesh,
    replicate_state,
    replicated_sharding,
    shard_batch_indices,
)
