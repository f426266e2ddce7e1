from llm_tpu.parallel.sharding import (
    MeshConfig,
    make_mesh,
    shard_cache,
    shard_params,
    batched_forward_step,
)
from llm_tpu.parallel.pipeline import (
    make_pipeline_mesh,
    pipeline_forward_batched,
    pipeline_step,
    shard_cache_pipeline,
    shard_params_pipeline,
)

__all__ = [
    "MeshConfig",
    "make_mesh",
    "shard_cache",
    "shard_params",
    "batched_forward_step",
    "make_pipeline_mesh",
    "pipeline_forward_batched",
    "pipeline_step",
    "shard_cache_pipeline",
    "shard_params_pipeline",
]
