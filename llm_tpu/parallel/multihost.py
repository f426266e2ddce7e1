"""Multi-host (DCN) initialization and mesh construction.

The reference is strictly single-process (SURVEY.md §2.5); this module is
the TPU-native scale-out layer for multi-host slices:

- `initialize()` wraps jax.distributed.initialize — the JAX coordination
  service over DCN (one process per host; on Cloud TPU the coordinator and
  process ids are auto-detected from the environment).
- `multihost_mesh()` builds a global ("data", "model") mesh in which the
  tensor-parallel `model` axis stays WITHIN a host's ICI domain and the
  `data` axis (stream batches of the continuous-batching engine) spans
  hosts over DCN — collectives for TP ride ICI, only data-parallel traffic
  (none at inference steady state) crosses DCN.

Weights/caches placed with llm_tpu.parallel.shard_params/shard_cache work
unchanged on a multihost mesh: NamedSharding is global, and each process
addresses only its local shard. This cannot be exercised on the single-chip
CI environment; the driver's dryrun_multichip covers the SPMD partitioning
on a virtual device mesh.
"""

from __future__ import annotations

from typing import Optional

import jax

from llm_tpu.parallel.sharding import MeshConfig, make_mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the jax.distributed coordination service (call before any other
    JAX API in each host process)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def multihost_mesh(model_parallel: Optional[int] = None):
    """Global mesh: `model` within each host (ICI), `data` across hosts.

    model_parallel defaults to the local device count, which keeps every
    TP collective on ICI.
    """
    local = jax.local_device_count()
    total = jax.device_count()
    model_parallel = model_parallel or local
    assert total % model_parallel == 0, (total, model_parallel)
    return make_mesh(
        MeshConfig(data=total // model_parallel, model=model_parallel)
    )
