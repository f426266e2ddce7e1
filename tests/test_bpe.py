"""Byte-level BPE tokenizer (GGUF gpt2-family vocabs): parity with
transformers' GPT2Tokenizer built from the same vocab/merges, plus loader
integration (a GGUF file with tokenizer.ggml.model=gpt2 + merges gets the
BPE path, not the score-greedy one)."""

import json

import numpy as np
import pytest

from llm_tpu.tokenizer.bpe import BpeTokenizer, bytes_to_unicode


def _build_vocab():
    """256 byte tokens + a few learned merges (GPT-2 file format)."""
    b2u = bytes_to_unicode()
    tokens = [b2u[b] for b in range(256)]
    merges = [
        "Ġ h", "h e", "l l", "Ġh e", "ll o", "Ġhe llo",
        "Ġ w", "o r", "Ġw or", "l d", "Ġwor ld",
        "1 2", "12 3",
    ]
    for m in merges:
        tokens.append(m.replace(" ", ""))
    return tokens, merges


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    tokens, merges = _build_vocab()
    mine = BpeTokenizer([t.encode() for t in tokens], merges)

    from transformers import GPT2Tokenizer

    d = tmp_path_factory.mktemp("bpe")
    (d / "vocab.json").write_text(
        json.dumps({t: i for i, t in enumerate(tokens)})
    )
    (d / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(merges) + "\n"
    )
    hf = GPT2Tokenizer(str(d / "vocab.json"), str(d / "merges.txt"))
    return mine, hf


@pytest.mark.parametrize("text", [
    "hello world",
    " hello  world ",
    "hello, world! don't stop",
    "a_b __ c",
    "123 12 3",
    "tabs\tand\nnewlines",
    "héllo wörld",          # multibyte utf-8
    "x" * 40,
])
def test_bpe_matches_transformers(pair, text):
    mine, hf = pair
    got = [tid for _, tid in mine.tokenize(text, bos=False)]
    want = hf.encode(text)
    assert got == want, (text, got, want)
    # decode round-trips the exact bytes
    assert mine.decode(got, False) == text.encode("utf-8")


def test_bpe_token_bytes_surface(pair):
    mine, _ = pair
    assert mine.token(ord("!")) == b"!"  # printable bytes map to themselves
    assert mine.id(b"!") == ord("!")
    assert len(mine) == 256 + 13


def test_gguf_bpe_loader_integration(tmp_path):
    """A GGUF checkpoint with a gpt2 BPE vocab tokenizes via merges."""
    import struct

    from llm_tpu.ggml.gguf import GgufReader, GgufWriter, gguf_name_fn
    from llm_tpu.ggml.reader import GgmlReader
    from llm_tpu.loader import ModelParameters, load
    from llm_tpu.models.spec import get_arch
    from llm_tpu.testing import make_tiny_file

    ggjt = tmp_path / "gpt2.bin"
    make_tiny_file("gpt2", ggjt, n_vocab=269)
    src = GgmlReader(ggjt).load(
        lambda f: (lambda h: (h, h.n_vocab))(get_arch("gpt2").read_hparams(f))
    )
    tokens, merges = _build_vocab()
    assert len(tokens) == 269
    to_gguf = gguf_name_fn("gpt2")
    h = src.hyperparameters
    out = tmp_path / "gpt2.gguf"
    with open(out, "wb") as f:
        w = GgufWriter(f)
        w.add_metadata("general.architecture", "gpt2")
        w.add_metadata("gpt2.embedding_length", h.n_embd)
        w.add_metadata("gpt2.block_count", h.n_layer)
        w.add_metadata("gpt2.attention.head_count", h.n_head)
        w.add_metadata("gpt2.context_length", h.n_ctx)
        w.add_metadata("general.file_type", 0)
        w.add_metadata("tokenizer.ggml.model", "gpt2")
        w.add_metadata("tokenizer.ggml.tokens", tokens)
        w.add_metadata("tokenizer.ggml.merges", merges)
        for name, info in src.tensors.items():
            w.add_tensor(
                to_gguf(name), info.element_type, info.dims,
                bytes(src.fetch(name)),
            )
        w.finish()

    m = load(out, "gpt2", params=ModelParameters(context_size=64))
    from llm_tpu.tokenizer.bpe import BpeTokenizer as B

    assert isinstance(m.tokenizer.inner, B)
    ids = [tid for _, tid in m.tokenizer.tokenize(" hello world", False)]
    # " hello" and " world" merged into single learned tokens
    assert len(ids) == 2
    assert m.tokenizer.decode(ids, False) == b" hello world"
