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


def test_params_actually_sharded_not_replicated(qmodel):
    """Regression guard for the divisibility fallback in sharding._put: at
    dims the mesh divides, the packed planes must land DISTRIBUTED — a
    silent fall back to full replication would still pass every equality
    test and the dryrun."""
    mesh = make_mesh(MeshConfig(data=1, model=8))
    params = shard_params(qmodel.params, mesh)
    wq = params.layers.wq  # stacked QuantTensor, planes [L, K/pw, R]
    for plane in (wq.lo, wq.scale):
        assert not plane.sharding.is_fully_replicated, plane.shape
        # R (lanes, last axis) split 8 ways
        assert plane.sharding.shard_shape(plane.shape)[-1] == plane.shape[-1] // 8
    # wo shards K (sublanes): second-to-last axis for lo, scale
    wo = params.layers.wo
    assert not wo.lo.sharding.is_fully_replicated
    assert wo.lo.sharding.shard_shape(wo.lo.shape)[1] == wo.lo.shape[1] // 8


def test_real_dim_planes_shard_fully():
    """7B-geometry plane (4096x4096 Q4_0) distributes over all 8 devices on
    both the R-split and K-split rules."""
    from llm_tpu.ggml.quant import quantize
    from llm_tpu.ops.packing import pack_ggml
    from llm_tpu.parallel.sharding import _put_weight

    rng = np.random.default_rng(0)
    w = rng.normal(size=(4096, 4096)).astype(np.float32)
    qt = pack_ggml(GgmlType.Q4_0, quantize(GgmlType.Q4_0, w), (4096, 4096))
    mesh = make_mesh(MeshConfig(data=1, model=8))

    r_split = _put_weight(qt, mesh, "model", True, False)
    k_split = _put_weight(qt, mesh, "model", False, False)
    for plane in (r_split.lo, r_split.scale):
        assert plane.sharding.shard_shape(plane.shape)[-1] == plane.shape[-1] // 8
    for plane in (k_split.lo, k_split.scale):
        assert plane.sharding.shard_shape(plane.shape)[0] == plane.shape[0] // 8
