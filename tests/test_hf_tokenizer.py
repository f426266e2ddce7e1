"""HuggingFace tokenizer path: file/string sources, session integration."""

import json

import numpy as np
import pytest

tokenizers = pytest.importorskip("tokenizers")

from llm_tpu.loader import ModelParameters, load
from llm_tpu.samplers import GreedySampler
from llm_tpu.session import (
    InferenceParameters,
    InferenceRequest,
    InferenceSession,
    InferenceSessionConfig,
    ModelKVMemoryType,
)
from llm_tpu.testing import make_tiny_file
from llm_tpu.tokenizer import Tokenizer, TokenizerSource


def _make_tokenizer_json(tmp_path):
    """A tiny WordLevel tokenizer whose ids stay inside the 96-entry vocab."""
    vocab = {"<unk>": 0, "hello": 5, "world": 7, "again": 9, " ": 11}
    tok = tokenizers.Tokenizer(
        tokenizers.models.WordLevel(vocab, unk_token="<unk>")
    )
    tok.pre_tokenizer = tokenizers.pre_tokenizers.WhitespaceSplit()
    path = tmp_path / "tokenizer.json"
    path.write_text(tok.to_str())
    return path


def test_hf_tokenizer_file_source(tmp_path):
    path = _make_tokenizer_json(tmp_path)
    src = TokenizerSource.hf_tokenizer_file(path)
    tok = src.retrieve()
    assert tok is not None and not tok.is_embedded
    pairs = tok.tokenize("hello world", False)
    ids = [tid for _, tid in pairs]
    assert ids == [5, 7]
    assert b"hello" in tok.decode([5], True)


def test_hf_tokenizer_string_source(tmp_path):
    path = _make_tokenizer_json(tmp_path)
    src = TokenizerSource.hf_tokenizer_string(path.read_text())
    tok = src.retrieve()
    assert [tid for _, tid in tok.tokenize("world again", False)] == [7, 9]


def test_session_with_hf_tokenizer(tmp_path):
    tok_path = _make_tokenizer_json(tmp_path)
    model_path = tmp_path / "llama.bin"
    make_tiny_file("llama", model_path)
    model = load(
        model_path,
        "llama",
        tokenizer_source=TokenizerSource.hf_tokenizer_file(tok_path),
        params=ModelParameters(context_size=64),
    )
    assert not model.tokenizer.is_embedded

    session = InferenceSession(
        model,
        InferenceSessionConfig(
            memory_k_type=ModelKVMemoryType.Float32,
            memory_v_type=ModelKVMemoryType.Float32,
        ),
    )
    session.feed_prompt("hello world")
    assert session.tokens == [5, 7]
    # generation decodes through the HF incremental-diff path
    out = []
    session.infer(
        InferenceRequest(
            prompt=[],
            parameters=InferenceParameters(sampler=GreedySampler()),
            maximum_token_count=3,
        ),
        rng=np.random.default_rng(0),
        callback=lambda r: out.append(r.text),
    )
    assert len(session.tokens) >= 4


def test_hf_rewind_keeps_decoded_baseline_aligned(tmp_path):
    """rewind() under a diff-decoded tokenizer must leave decoded_tokens
    == decode(tokens): the reference truncates by standalone token()
    lengths, which misalign whenever the diff bytes differ (leading-space
    merges) and corrupt every later incremental slice (advisor r4;
    documented deviation from inference_session.rs:369-372)."""
    tok_path = _make_tokenizer_json(tmp_path)
    model_path = tmp_path / "llama.bin"
    make_tiny_file("llama", model_path)
    model = load(
        model_path, "llama",
        tokenizer_source=TokenizerSource.hf_tokenizer_file(tok_path),
        params=ModelParameters(context_size=64),
    )
    session = InferenceSession(
        model,
        InferenceSessionConfig(
            memory_k_type=ModelKVMemoryType.Float32,
            memory_v_type=ModelKVMemoryType.Float32,
        ),
    )
    session.feed_prompt("hello world again")
    assert bytes(session.decoded_tokens) == \
        model.tokenizer.decode(session.tokens, True)
    session.rewind(2)
    assert session.tokens == [5]
    assert bytes(session.decoded_tokens) == \
        model.tokenizer.decode(session.tokens, True)
    # the incremental diff still works after the rewind
    session.feed_prompt([9])
    assert bytes(session.decoded_tokens) == \
        model.tokenizer.decode(session.tokens, True)
