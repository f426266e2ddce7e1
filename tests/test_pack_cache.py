"""Pre-packed plane cache: repeat loads skip transcode, stay bit-identical."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

import llm_tpu.loader as loader_mod
from llm_tpu.ggml.types import GgmlType
from llm_tpu.loader import ModelParameters, load
from llm_tpu.models import params as params_mod
from llm_tpu.models.pack_cache import (
    _load_node,
    _save_node,
    cache_key,
    load_packed_params,
    pack_path,
    save_packed_params,
)
from llm_tpu.testing import make_tiny_file


def _logits(model, toks=(1, 2, 3)):
    sess = model.start_session()
    sess.feed_prompt(list(toks))
    return np.asarray(sess.last_logits)


def _forbid_build(monkeypatch):
    def boom(ws, spec):
        raise AssertionError("build_params called despite a valid cache")

    monkeypatch.setattr(params_mod, "build_params", boom)
    monkeypatch.setattr(loader_mod, "build_params", boom)


@pytest.mark.parametrize("etype", [GgmlType.F32, GgmlType.Q4_0])
def test_pack_roundtrip_bit_identical(tmp_path, monkeypatch, etype):
    path = tmp_path / "m.bin"
    make_tiny_file("llama", path, etype)
    params = ModelParameters(context_size=32)

    cold = load(path, "llama", params=params)
    ref = _logits(cold)

    save_packed_params(cold.params, pack_path(path), cache_key(path))
    _forbid_build(monkeypatch)
    warm = load(path, "llama", params=params)
    np.testing.assert_array_equal(_logits(warm), ref)


def test_pack_cli_and_key_invalidation(tmp_path):
    from llm_tpu.cli import main

    path = tmp_path / "m.bin"
    make_tiny_file("gpt2", path, GgmlType.Q8_0)
    main(["pack", "-m", str(path), "-a", "gpt2"])
    pp = pack_path(path)
    assert (pp / "manifest.json").exists()
    assert load_packed_params(pp, cache_key(path)) is not None

    # touching the checkpoint invalidates the cache (stale planes must
    # never be trusted): the recomputed key no longer matches
    st = os.stat(path)
    os.utime(path, ns=(st.st_atime_ns, st.st_mtime_ns + 1))
    assert load_packed_params(pp, cache_key(path)) is None
    # and a full load still succeeds (falls back to transcode)
    model = load(path, "gpt2", params=ModelParameters(context_size=32))
    assert model.params is not None


def test_pack_corrupt_manifest_ignored(tmp_path):
    path = tmp_path / "m.bin"
    make_tiny_file("mpt", path, GgmlType.Q4_0)
    cold = load(path, "mpt", params=ModelParameters(context_size=32))
    ref = _logits(cold)
    pp = pack_path(path)
    save_packed_params(cold.params, pp, cache_key(path))
    (pp / "manifest.json").write_text("{not json")
    warm = load(path, "mpt", params=ModelParameters(context_size=32))
    np.testing.assert_array_equal(_logits(warm), ref)


def test_pack_bf16_leaf_roundtrip(tmp_path):
    a = jnp.arange(8, dtype=jnp.bfloat16) / 3
    arrays = []
    spec = _save_node(a, arrays, [0])
    for fname, arr in arrays:
        np.save(tmp_path / fname, arr)
    back = _load_node(spec, tmp_path)
    assert back.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(back), np.asarray(a))


def test_pack_lora_bypasses_cache(tmp_path):
    """A LoRA load must not use the (unpatched) cache."""
    from tests.test_lora import write_ggla

    path = tmp_path / "m.bin"
    make_tiny_file("llama", path)
    base = load(path, "llama", params=ModelParameters(context_size=32))
    save_packed_params(base.params, pack_path(path), cache_key(path))

    rng = np.random.default_rng(0)
    E, r = 64, 4
    lora = tmp_path / "adapter.ggla"
    write_ggla(
        lora, r, 8,
        [("layers.0.attention.wq.weight.loraA",
          rng.standard_normal((E, r)).astype(np.float32)),
         ("layers.0.attention.wq.weight.loraB",
          rng.standard_normal((E, r)).astype(np.float32))],
    )
    patched = load(
        path, "llama",
        params=ModelParameters(context_size=32, lora_adapters=[str(lora)]),
    )
    assert not np.array_equal(_logits(patched), _logits(base))


def test_pack_roundtrip_coalesced(tmp_path, monkeypatch):
    """quantc nodes (coalesced layout) serialize and reload bit-identically;
    the cache key invalidates when the layout env changes."""
    monkeypatch.setenv("LLM_TPU_COALESCE", "1")
    monkeypatch.setenv("LLM_TPU_COALESCE_MIN_K", "0")
    path = tmp_path / "m.bin"
    make_tiny_file("llama", path, element_type=GgmlType.Q4_0,
                   n_embd=512, n_head=8)
    m1 = load(path, "llama", params=ModelParameters(context_size=64))
    from llm_tpu.ops.packing import QuantTensorC

    assert isinstance(m1.params.layers.w_up, QuantTensorC) or isinstance(
        m1.params.layers.w_gate_up, QuantTensorC)
    ref = _logits(m1)

    key = cache_key(path)
    save_packed_params(m1.params, pack_path(path), key)
    loaded = load_packed_params(pack_path(path), key)
    assert loaded is not None
    w = (loaded.layers.w_gate_up if loaded.layers.w_gate_up is not None
         else loaded.layers.w_up)
    assert isinstance(w, QuantTensorC)
    _forbid_build(monkeypatch)
    m2 = load(path, "llama", params=ModelParameters(context_size=64))
    np.testing.assert_array_equal(_logits(m2), ref)

    # flipping the layout env must invalidate the key
    monkeypatch.setenv("LLM_TPU_COALESCE", "0")
    assert load_packed_params(pack_path(path), cache_key(path)) is None
