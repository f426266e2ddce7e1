"""Ring-attention sequence-parallel prefill: logits and the resulting KV
cache must match the ordinary batched prefill, and decode must continue
identically from the ring-built cache."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_tpu.loader import ModelParameters, load
from llm_tpu.models.forward import forward_batched_step, init_cache_batched
from llm_tpu.parallel.ring import make_seq_mesh, ring_prefill
from llm_tpu.testing import make_tiny_file


def _seq_mesh(n=4):
    return make_seq_mesh(n)


def _load(tmp_path, arch, **kw):
    path = tmp_path / f"{arch}.bin"
    make_tiny_file(arch, path, **kw)
    return load(path, arch, params=ModelParameters(context_size=64))


def _dense_prefill(model, ids, kv_dtype):
    B, T = ids.shape
    cache = init_cache_batched(model.spec, B, kv_dtype)
    logits, _, cache = forward_batched_step(
        model.spec, model.params, jnp.asarray(ids), jnp.zeros(B, jnp.int32),
        cache,
    )
    return logits[:, -1, :], cache

def _decode_greedy(model, last, cache, n_past, steps=6):
    B = last.shape[0]
    toks = []
    np_arr = jnp.full((B,), n_past, jnp.int32)
    for _ in range(steps):
        t = jnp.argmax(last, axis=-1).astype(jnp.int32)
        toks.append(np.asarray(t))
        logits, _, cache = forward_batched_step(
            model.spec, model.params, t[:, None], np_arr, cache
        )
        last = logits[:, 0, :]
        np_arr = np_arr + 1
    return np.stack(toks)


@pytest.mark.parametrize("arch,kw", [
    ("llama", {}),            # RoPE mode 0, GQA=none
    ("mpt", {}),              # ALiBi, no positional embedding
    ("falcon", {"n_embd": 512}),  # MQA: n_head_kv=1, rep>1
])
def test_ring_prefill_matches_dense(tmp_path, arch, kw):
    model = _load(tmp_path, arch, **kw)
    mesh = _seq_mesh(4)
    rng = np.random.default_rng(0)
    ids = rng.integers(2, 90, size=(2, 16)).astype(np.int32)

    ring_last, ring_cache = ring_prefill(
        model.spec, model.params, jnp.asarray(ids), mesh,
        kv_dtype=jnp.float32,
    )
    dense_last, dense_cache = _dense_prefill(model, ids, jnp.float32)

    np.testing.assert_allclose(
        np.asarray(ring_last), np.asarray(dense_last), rtol=2e-4, atol=2e-4
    )
    # greedy decode from both caches must agree token-for-token
    rt = _decode_greedy(model, ring_last, ring_cache, 16)
    dt = _decode_greedy(model, dense_last, dense_cache, 16)
    np.testing.assert_array_equal(rt, dt)


def test_ring_prefill_int8_cache(tmp_path):
    model = _load(tmp_path, "llama")
    mesh = _seq_mesh(4)
    rng = np.random.default_rng(1)
    ids = rng.integers(2, 90, size=(1, 32)).astype(np.int32)

    ring_last, ring_cache = ring_prefill(
        model.spec, model.params, jnp.asarray(ids), mesh, kv_dtype="int8"
    )
    dense_last, dense_cache = _dense_prefill(model, ids, "int8")
    rt = _decode_greedy(model, ring_last, ring_cache, 32)
    dt = _decode_greedy(model, dense_last, dense_cache, 32)
    np.testing.assert_array_equal(rt, dt)


def test_ring_prefill_ring_of_one(tmp_path):
    """A 1-device seq axis degenerates to the plain local path."""
    model = _load(tmp_path, "llama")
    mesh = _seq_mesh(1)
    ids = np.asarray([[2, 3, 4, 5]], np.int32)
    ring_last, _ = ring_prefill(
        model.spec, model.params, jnp.asarray(ids), mesh,
        kv_dtype=jnp.float32,
    )
    dense_last, _ = _dense_prefill(model, ids, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(ring_last), np.asarray(dense_last), rtol=2e-4, atol=2e-4
    )
