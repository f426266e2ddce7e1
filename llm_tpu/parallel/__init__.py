from llm_tpu.parallel.sharding import (
    MeshConfig,
    make_mesh,
    shard_cache,
    shard_params,
    batched_forward_step,
)

__all__ = [
    "MeshConfig",
    "make_mesh",
    "shard_cache",
    "shard_params",
    "batched_forward_step",
]
