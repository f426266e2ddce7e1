"""Sharding tests on the virtual 8-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_tpu.ggml.types import GgmlType
from llm_tpu.loader import ModelParameters, load
from llm_tpu.models.forward import forward_step, init_cache
from llm_tpu.parallel import (
    MeshConfig,
    batched_forward_step,
    make_mesh,
    shard_cache,
    shard_params,
)
from llm_tpu.testing import make_tiny_file


@pytest.fixture(scope="module")
def qmodel(tmp_path_factory):
    path = tmp_path_factory.mktemp("sh") / "llama_q4.bin"
    make_tiny_file("llama", path, element_type=GgmlType.Q4_0)
    return load(path, "llama", params=ModelParameters(context_size=64))


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_tp_sharded_forward_matches_single_device(qmodel):
    mesh = make_mesh(MeshConfig(data=1, model=8))
    params = shard_params(qmodel.params, mesh)
    cache = shard_cache(init_cache(qmodel.spec, jnp.float32), mesh)

    ids = jnp.asarray([3, 17, 5, 9], jnp.int32)
    with mesh:
        logits, _, _ = forward_step(
            qmodel.spec, params, ids, jnp.int32(0), cache
        )
    ref, _, _ = forward_step(
        qmodel.spec, qmodel.params, ids, jnp.int32(0),
        init_cache(qmodel.spec, jnp.float32),
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


def test_dp_tp_batched_decode(qmodel):
    from llm_tpu.models.forward import init_cache_batched

    mesh = make_mesh(MeshConfig(data=2, model=4))
    params = shard_params(qmodel.params, mesh)
    B = 4
    batched = init_cache_batched(qmodel.spec, B, jnp.float32)
    batched = shard_cache(batched, mesh, batched=True)

    ids = jnp.asarray(
        [[3, 17, 5], [9, 22, 1], [8, 40, 2], [7, 6, 11]], jnp.int32
    )
    n_past = jnp.zeros(B, jnp.int32)
    with mesh:
        logits, _, cache2 = batched_forward_step(
            qmodel.spec, params, ids, n_past, batched
        )
    assert logits.shape == (B, 3, qmodel.spec.n_vocab)

    # stream 2 must equal an independent single-stream run
    ref, _, _ = forward_step(
        qmodel.spec, qmodel.params, ids[2], jnp.int32(0),
        init_cache(qmodel.spec, jnp.float32),
    )
    np.testing.assert_allclose(
        np.asarray(logits[2]), np.asarray(ref), rtol=1e-4, atol=1e-4
    )
