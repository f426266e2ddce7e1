"""Pipeline parallelism (GPipe microbatching over the `pipe` mesh axis) on
the virtual 8-device CPU mesh. Correctness oracle: logits + updated cache
equal forward_batched's on a single device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_tpu.ggml.types import GgmlType
from llm_tpu.loader import ModelParameters, load
from llm_tpu.models.forward import forward_batched, init_cache_batched
from llm_tpu.parallel.pipeline import (
    make_pipeline_mesh,
    pipeline_forward_batched,
    pipeline_step,
    shard_cache_pipeline,
    shard_params_pipeline,
)
from llm_tpu.testing import make_tiny_file


@pytest.fixture(scope="module")
def qmodel(tmp_path_factory):
    path = tmp_path_factory.mktemp("pp") / "llama_pp.bin"
    # n_layer=4 so the stack splits into 2 or 4 stages
    make_tiny_file(
        "llama", path, element_type=GgmlType.Q4_0, n_layer=4
    )
    return load(path, "llama", params=ModelParameters(context_size=64))


def _ref(model, ids, n_past, kv_dtype=jnp.float32):
    cache = init_cache_batched(model.spec, ids.shape[0], kv_dtype)
    return forward_batched(model.spec, model.params, ids, n_past, cache)


def _run_pipeline(model, ids, n_past, pipe, data, M, kv_dtype=jnp.float32):
    mesh = make_pipeline_mesh(pipe=pipe, data=data)
    params = shard_params_pipeline(model.params, mesh)
    cache = init_cache_batched(model.spec, ids.shape[0], kv_dtype)
    cache = shard_cache_pipeline(cache, mesh)
    return pipeline_forward_batched(
        model.spec, params, ids, n_past, cache, mesh, M
    )


@pytest.mark.parametrize("pipe,data,M", [(2, 1, 2), (4, 1, 4), (4, 2, 2)])
def test_pipeline_matches_batched(qmodel, pipe, data, M):
    rng = np.random.default_rng(0)
    B, T = 4, 3
    ids = jnp.asarray(rng.integers(2, 90, size=(B, T)), jnp.int32)
    n_past = jnp.zeros(B, jnp.int32)

    logits, hidden, cache = _run_pipeline(qmodel, ids, n_past, pipe, data, M)
    ref_l, ref_h, ref_c = _ref(qmodel, ids, n_past)

    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_l), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(cache.k), np.asarray(ref_c.k), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(cache.v), np.asarray(ref_c.v), rtol=1e-4, atol=1e-4
    )


def test_pipeline_decode_continuation(qmodel):
    """Prefill then a decode step through the pipeline: cache threads."""
    rng = np.random.default_rng(1)
    B, T = 4, 3
    ids = jnp.asarray(rng.integers(2, 90, size=(B, T)), jnp.int32)
    n_past0 = jnp.zeros(B, jnp.int32)

    mesh = make_pipeline_mesh(pipe=2, data=2)
    params = shard_params_pipeline(qmodel.params, mesh)
    cache = init_cache_batched(qmodel.spec, B, jnp.float32)
    cache = shard_cache_pipeline(cache, mesh)

    _, _, cache = pipeline_forward_batched(
        qmodel.spec, params, ids, n_past0, cache, mesh, 2
    )
    ids2 = jnp.asarray(rng.integers(2, 90, size=(B, 1)), jnp.int32)
    logits, _, cache = pipeline_forward_batched(
        qmodel.spec, params, ids2, n_past0 + T, cache, mesh, 2
    )

    ref_cache = init_cache_batched(qmodel.spec, B, jnp.float32)
    _, _, ref_cache = forward_batched(
        qmodel.spec, qmodel.params, ids, n_past0, ref_cache
    )
    ref_l, _, _ = forward_batched(
        qmodel.spec, qmodel.params, ids2, n_past0 + T, ref_cache
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_l), rtol=1e-4, atol=1e-4
    )


def test_pipeline_int8_cache(qmodel):
    rng = np.random.default_rng(2)
    B, T = 4, 2
    ids = jnp.asarray(rng.integers(2, 90, size=(B, T)), jnp.int32)
    n_past = jnp.zeros(B, jnp.int32)

    logits, _, cache = _run_pipeline(
        qmodel, ids, n_past, pipe=2, data=1, M=2, kv_dtype="int8"
    )
    ref_l, _, ref_c = _ref(qmodel, ids, n_past, kv_dtype="int8")
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_l), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(cache.k), np.asarray(ref_c.k), atol=1
    )
    np.testing.assert_allclose(
        np.asarray(cache.k_scale), np.asarray(ref_c.k_scale),
        rtol=1e-4, atol=1e-6,
    )


def test_pipeline_write_mask(qmodel):
    """Masked streams leave the cache untouched through the pipeline."""
    rng = np.random.default_rng(3)
    B, T = 4, 2
    ids = jnp.asarray(rng.integers(2, 90, size=(B, T)), jnp.int32)
    n_past = jnp.zeros(B, jnp.int32)
    wm = jnp.asarray([True, False, True, False])

    mesh = make_pipeline_mesh(pipe=2, data=1)
    params = shard_params_pipeline(qmodel.params, mesh)
    cache = init_cache_batched(qmodel.spec, B, jnp.float32)
    cache = shard_cache_pipeline(cache, mesh)
    _, _, cache = pipeline_forward_batched(
        qmodel.spec, params, ids, n_past, cache, mesh, 2, write_mask=wm
    )
    k = np.asarray(cache.k)
    assert np.abs(k[:, 0]).max() > 0
    assert np.abs(k[:, 1]).max() == 0  # masked stream: no write
    assert np.abs(k[:, 3]).max() == 0


def test_pipeline_step_jit_donation(qmodel):
    """The jitted wrapper runs and the cache buffer is reusable."""
    rng = np.random.default_rng(4)
    B, T = 4, 2
    ids = jnp.asarray(rng.integers(2, 90, size=(B, T)), jnp.int32)
    n_past = jnp.zeros(B, jnp.int32)

    mesh = make_pipeline_mesh(pipe=2, data=1)
    params = shard_params_pipeline(qmodel.params, mesh)
    cache = init_cache_batched(qmodel.spec, B, jnp.float32)
    cache = shard_cache_pipeline(cache, mesh)
    logits, _, cache = pipeline_step(
        qmodel.spec, params, ids, n_past, cache, mesh, 2
    )
    logits2, _, cache = pipeline_step(
        qmodel.spec, params, ids, n_past + T, cache, mesh, 2
    )
    assert np.isfinite(np.asarray(logits2)).all()


def test_uneven_layers_rejected(qmodel):
    mesh = make_pipeline_mesh(pipe=4, data=1)  # n_layer=4 ok; build a 3-stage
    mesh3 = make_pipeline_mesh(pipe=3, data=1)
    with pytest.raises(AssertionError):
        shard_params_pipeline(qmodel.params, mesh3)
    del mesh
