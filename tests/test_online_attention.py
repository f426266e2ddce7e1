"""Online-softmax (flash-style) chunked attention equals the materialized
path exactly (same math, different association), across archs, int8 KV,
and ALiBi. The online path is what makes 8K-context prefill fit in HBM
(the materialized [T, H, S+T] f32 scores are ~0.5 GB/layer at ctx 8192,
chunk 512; reference contrast: op_flash_attn bound but unused,
/root/reference/crates/ggml/src/context.rs:614-625)."""

import jax.numpy as jnp
import numpy as np
import pytest

import llm_tpu.models.forward as fwd
from llm_tpu.loader import ModelParameters, load
from llm_tpu.models.forward import (
    forward_step,
    forward_batched_step,
    init_cache,
    init_cache_batched,
)
from llm_tpu.testing import make_tiny_file


@pytest.fixture()
def force_online(monkeypatch):
    monkeypatch.setattr(fwd, "_ONLINE_MIN_SCORE_BYTES", 0)
    monkeypatch.setattr(fwd, "_KV_BLOCK", 16)  # several blocks even at S=64


def _model(tmp_path, arch, **kw):
    path = tmp_path / f"{arch}.bin"
    make_tiny_file(arch, path, **kw)
    return load(path, arch, params=ModelParameters(context_size=64))


def _run(model, kv_dtype, ids, n_past):
    cache = init_cache(model.spec, kv_dtype)
    if n_past:
        warm = jnp.asarray(np.arange(2, 2 + n_past) % 50, jnp.int32)
        _, _, cache = forward_step(
            model.spec, model.params, warm, jnp.int32(0), cache
        )
    logits, _, _ = forward_step(
        model.spec, model.params, jnp.asarray(ids, jnp.int32),
        jnp.int32(n_past), cache,
    )
    return np.asarray(logits)


@pytest.mark.parametrize("arch", ["llama", "mpt"])
@pytest.mark.parametrize("kv", [jnp.float32, "int8"])
def test_online_matches_materialized(tmp_path, monkeypatch, arch, kv):
    model = _model(tmp_path, arch)
    ids = [3, 17, 5, 9, 11]
    ref = _run(model, kv, ids, n_past=37)  # n_past not a block multiple

    monkeypatch.setattr(fwd, "_ONLINE_MIN_SCORE_BYTES", 0)
    monkeypatch.setattr(fwd, "_KV_BLOCK", 16)
    got = _run(model, kv, ids, n_past=37)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_online_batched_matches_materialized(tmp_path, monkeypatch):
    model = _model(tmp_path, "llama")
    spec = model.spec
    B, T = 3, 4
    ids = jnp.asarray([[3, 17, 5, 9], [7, 2, 8, 4], [1, 1, 2, 3]], jnp.int32)
    n_past = jnp.asarray([0, 19, 33], jnp.int32)  # mixed, off-block offsets

    def run():
        cache = init_cache_batched(spec, B, jnp.float32)
        warm = jnp.asarray(
            np.arange(2, 2 + 33).reshape(1, -1).repeat(B, 0) % 50, jnp.int32
        )
        _, _, cache = forward_batched_step(
            spec, model.params, warm, jnp.zeros(B, jnp.int32), cache
        )
        logits, _, _ = forward_batched_step(
            spec, model.params, ids, n_past, cache
        )
        return np.asarray(logits)

    ref = run()
    monkeypatch.setattr(fwd, "_ONLINE_MIN_SCORE_BYTES", 0)
    monkeypatch.setattr(fwd, "_KV_BLOCK", 16)
    got = run()
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_online_kicks_in_automatically():
    """The static threshold actually routes big prefill to the online path."""
    ok, block = fwd._use_online(T=512, H=32, S=8192)
    assert ok and block == fwd._KV_BLOCK
    ok_small, _ = fwd._use_online(T=1, H=32, S=8192)
    assert not ok_small  # decode stays on the single-pass materialized read
