"""Tokenizer tests: embedded DP segmentation, BOS handling, buffers, bias."""

import pytest

from llm_tpu.tokenizer import (
    Prompt,
    TokenBias,
    TokenUtf8Buffer,
    Tokenizer,
    InvalidTokenId,
)
from llm_tpu.tokenizer.embedded import EmbeddedTokenizer, EmbeddedTokenizerError


def make_vocab(tokens):
    t = EmbeddedTokenizer()
    for i, tok in enumerate(tokens):
        t.push_token(i, tok, 0.0)
    return t


def test_push_token_sequential_invariant():
    t = EmbeddedTokenizer()
    t.push_token(0, b"<unk>", 0.0)
    with pytest.raises(ValueError):
        t.push_token(2, b"x", 0.0)


def test_longest_match_wins():
    # score = len^2, so "hello" (25) beats "he"+"llo" (4+9)
    t = make_vocab([b"<unk>", b"<s>", b"he", b"llo", b"hello"])
    toks = t.tokenize("hello", bos=False)
    assert toks == [(b"hello", 4)]


def test_dp_prefers_best_split():
    # "abcd": "ab"+"cd" (4+4=8) vs "a"+"bcd" (1+9=10) -> the latter wins
    t = make_vocab([b"<unk>", b"<s>", b"a", b"b", b"ab", b"cd", b"bcd", b"d"])
    toks = t.tokenize("abcd", bos=False)
    assert [tok for tok, _ in toks] == [b"a", b"bcd"]


def test_bos_inserted_as_id_1():
    t = make_vocab([b"<unk>", b"<s>", b"hi"])
    toks = t.tokenize("hi", bos=True)
    assert toks[0] == (b"", 1)
    assert toks[1] == (b"hi", 2)


def test_unknown_text_fails():
    t = make_vocab([b"<unk>", b"<s>", b"a"])
    with pytest.raises(EmbeddedTokenizerError):
        t.tokenize("xyz", bos=False)


def test_decode_skips_token_1():
    t = make_vocab([b"<unk>", b"<s>", b"hi"])
    assert t.decode([1, 2], skip_special_tokens=True) == b"hi"
    assert t.decode([1, 2], skip_special_tokens=False) == b"<s>hi"


def test_prompt_tokens_validated():
    t = Tokenizer(make_vocab([b"<unk>", b"<s>", b"hi", b""]))
    assert Prompt.of("hi").to_tokens(t, False) == [2]
    assert Prompt.of([2, 2]).to_tokens(t, False) == [2, 2]
    with pytest.raises(InvalidTokenId):
        Prompt.of([3]).to_tokens(t, False)  # empty token -> invalid


def test_token_bias_parse():
    tb = TokenBias.from_str("1=-1.0, 2=-1.0")
    assert tb.get(1) == -1.0
    assert tb.get(2) == -1.0
    assert tb.get(3) is None
    with pytest.raises(ValueError):
        TokenBias.from_str("nonsense")


def test_utf8_buffer_multibyte():
    # U+00E9 (é) = 0xC3 0xA9 split across two tokens
    buf = TokenUtf8Buffer()
    assert buf.push(b"\xc3") is None
    assert buf.push(b"\xa9") == "é"
    assert buf.push(b"ok") == "ok"


def test_token_prompt_rejects_out_of_range_ids(tmp_path):
    """Negative / out-of-vocab token ids in a token prompt raise the
    typed InvalidTokenId (embedded vocab indexing used to raise a bare
    IndexError, and a NEGATIVE id silently wrapped to the vocab end)."""
    import pytest as _pytest

    from llm_tpu.loader import ModelParameters, load
    from llm_tpu.testing import make_tiny_file
    from llm_tpu.tokenizer import InvalidTokenId, Prompt

    path = tmp_path / "m.bin"
    make_tiny_file("llama", path)
    model = load(path, "llama", params=ModelParameters(context_size=32))
    tok = model.tokenizer
    n = len(tok)
    assert Prompt.of([2, 3]).to_tokens(tok, False) == [2, 3]
    with _pytest.raises(InvalidTokenId):
        Prompt.of([2, -1]).to_tokens(tok, False)
    with _pytest.raises(InvalidTokenId):
        Prompt.of([n]).to_tokens(tok, False)
