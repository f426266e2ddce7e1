"""INT8 KV cache: coherence, quality vs f32 cache, snapshots, engine."""

import jax.numpy as jnp
import numpy as np
import pytest

from llm_tpu.loader import ModelParameters, load
from llm_tpu.models.forward import forward_step, init_cache, window_bucket
from llm_tpu.samplers import GreedySampler
from llm_tpu.serve import Engine, GenerationRequest
from llm_tpu.session import (
    InferenceParameters,
    InferenceRequest,
    InferenceSession,
    InferenceSessionConfig,
    ModelKVMemoryType,
)
from llm_tpu.testing import make_tiny_file

IDS = np.array([3, 17, 5, 9, 22, 1, 8, 40], dtype=np.int32)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("i8") / "llama.bin"
    make_tiny_file("llama", path)
    return load(path, "llama", params=ModelParameters(context_size=64))


def _run(model, ids, kv_dtype, chunks):
    cache = init_cache(model.spec, kv_dtype)
    out, pos = [], 0
    for c in chunks:
        logits, _, cache = forward_step(
            model.spec, model.params, jnp.asarray(ids[pos : pos + c]),
            jnp.int32(pos), cache,
        )
        out.append(np.asarray(logits))
        pos += c
    return np.concatenate(out)


def test_int8_cache_chunk_consistency(model):
    full = _run(model, IDS, "int8", [len(IDS)])
    chunked = _run(model, IDS, "int8", [3, 4, 1])
    np.testing.assert_allclose(full, chunked, rtol=1e-4, atol=1e-4)


def test_int8_cache_close_to_f32(model):
    ref = _run(model, IDS, jnp.float32, [4, 4])
    got = _run(model, IDS, "int8", [4, 4])
    # int8 quantization error is small; rankings preserved
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.05
    assert (got.argmax(-1) == ref.argmax(-1)).mean() > 0.9


def test_int8_session_and_snapshot(model):
    cfg = InferenceSessionConfig(
        memory_k_type=ModelKVMemoryType.Int8,
        memory_v_type=ModelKVMemoryType.Int8,
    )
    session = InferenceSession(model, cfg)
    session.feed_prompt([5, 6, 7, 8])
    snap = session.get_snapshot()
    restored = InferenceSession.from_snapshot(snap, model)
    np.testing.assert_array_equal(session.last_logits, restored.last_logits)
    session.feed_prompt([9])
    restored.feed_prompt([9])
    np.testing.assert_allclose(
        session.last_logits, restored.last_logits, rtol=1e-5, atol=1e-5
    )


def test_bf16_snapshot_roundtrip(model):
    cfg = InferenceSessionConfig()  # default F16 -> bfloat16 storage
    session = InferenceSession(model, cfg)
    session.feed_prompt([5, 6, 7])
    snap = session.get_snapshot()
    restored = InferenceSession.from_snapshot(snap, model)
    np.testing.assert_array_equal(session.last_logits, restored.last_logits)


def test_int8_engine_matches_int8_session(model):
    cfg = InferenceSessionConfig(
        memory_k_type=ModelKVMemoryType.Int8,
        memory_v_type=ModelKVMemoryType.Int8,
    )
    session = InferenceSession(model, cfg)
    ref = []
    session.infer(
        InferenceRequest(
            prompt="<t2><t3>",
            parameters=InferenceParameters(sampler=GreedySampler()),
            maximum_token_count=6,
        ),
        rng=np.random.default_rng(0),
        callback=lambda r: ref.append(r.text) if r.kind == "inferred_token" else None,
    )

    engine = Engine(model, max_streams=2, kv_dtype="int8")
    texts = engine.generate_all(
        [GenerationRequest(prompt="<t2><t3>", max_tokens=6,
                           sampler=GreedySampler())]
    )
    assert texts[0] == "".join(ref)


def test_int8_session_file_snapshot(model, tmp_path):
    from llm_tpu import snapshot as snap_mod

    cfg = InferenceSessionConfig(
        memory_k_type=ModelKVMemoryType.Int8,
        memory_v_type=ModelKVMemoryType.Int8,
    )
    session = InferenceSession(model, cfg)
    session.feed_prompt([5, 6, 7, 8])
    path = tmp_path / "s.llm"
    snap_mod.write_session(session, path)
    restored = snap_mod.read_session(model, path)
    np.testing.assert_array_equal(session.last_logits, restored.last_logits)
    assert restored.cache.k_scale is not None
