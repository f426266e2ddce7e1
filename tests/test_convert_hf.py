"""HF->GGML converter tests: convert a tiny random transformers model with
`llm_tpu.convert_hf`, load the result through the normal loader, and demand
logit parity with the torch forward — the same oracle as test_models, but
through the user-facing conversion path (the reference points users at
external llama.cpp scripts for this step; here it is built in)."""

import numpy as np
import jax.numpy as jnp
import pytest

from llm_tpu.loader import ModelParameters, load
from llm_tpu.models.forward import forward_step, init_cache

torch = pytest.importorskip("torch")

from llm_tpu.convert_hf import convert_hf  # noqa: E402

V, E, H, L, F = 96, 64, 4, 2, 128
IDS = np.array([3, 17, 5, 9, 22, 1, 8, 40], dtype=np.int32)


def _run(model, ids):
    spec = model.spec
    cache = init_cache(spec, jnp.float32)
    logits, _, _ = forward_step(
        spec, model.params, jnp.asarray(ids), jnp.int32(0), cache
    )
    return np.asarray(logits)


def _ref_logits(hf_model, ids):
    with torch.no_grad():
        return (
            hf_model(torch.tensor(ids[None].astype(np.int64)))
            .logits[0].float().numpy()
        )


def _assert_parity(path, arch, hf_model, atol=2e-3):
    m = load(path, arch, params=ModelParameters(context_size=64))
    np.testing.assert_allclose(
        _run(m, IDS), _ref_logits(hf_model, IDS), rtol=atol, atol=atol
    )


def _tiny_gpt2():
    from transformers import GPT2Config, GPT2LMHeadModel

    cfg = GPT2Config(
        vocab_size=V, n_positions=64, n_embd=E, n_layer=L, n_head=H,
        activation_function="gelu_new", resid_pdrop=0.0, embd_pdrop=0.0,
        attn_pdrop=0.0,
    )
    torch.manual_seed(0)
    return GPT2LMHeadModel(cfg).eval()


def test_convert_gpt2_f32(tmp_path):
    """Conv1D transpose + tied-head omission (gpt2/src/lib.rs:66-73)."""
    hf = _tiny_gpt2()
    path = tmp_path / "gpt2.bin"
    arch = convert_hf(hf, path, ftype="f32")
    assert arch == "gpt2"
    _assert_parity(path, "gpt2", hf)


def test_convert_gpt2_f16(tmp_path):
    """ftype=f16 stores 2-D quantizable weights as F16 (quantize.rs:332-335
    per-tensor rule); parity within f16 rounding."""
    hf = _tiny_gpt2()
    path = tmp_path / "gpt2_f16.bin"
    convert_hf(hf, path, ftype="f16")
    _assert_parity(path, "gpt2", hf, atol=2e-2)


def test_convert_llama_gqa_gguf(tmp_path):
    """Grouped-query llama (Mistral-style): q permutes with n_head, k with
    n_head_kv; GGUF carries attention.head_count_kv (classic GGML cannot
    store it — the reference needs --n-gqa there, llama/src/lib.rs:107-117)."""
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=V, hidden_size=E, intermediate_size=F,
        num_hidden_layers=L, num_attention_heads=H, num_key_value_heads=2,
        rms_norm_eps=5e-6, rope_theta=10000.0, attention_bias=False,
        mlp_bias=False, tie_word_embeddings=False,
        max_position_embeddings=64,
    )
    torch.manual_seed(0)
    hf = LlamaForCausalLM(cfg).eval()
    path = tmp_path / "llama_gqa.gguf"
    arch = convert_hf(hf, path, gguf=True, ftype="f32")
    assert arch == "llama"
    m = load(path, "llama", params=ModelParameters(context_size=64))
    assert m.spec.n_head_kv == 2
    np.testing.assert_allclose(
        _run(m, IDS), _ref_logits(hf, IDS), rtol=2e-3, atol=2e-3
    )


def test_convert_bloom_qkv_reorder(tmp_path):
    """HF bloom interleaves qkv rows per head; the graph expects contiguous
    thirds (bloom/src/lib.rs:167-185)."""
    from transformers import BloomConfig, BloomForCausalLM

    cfg = BloomConfig(
        vocab_size=V, hidden_size=E, n_layer=L, n_head=H,
        hidden_dropout=0.0, attention_dropout=0.0,
    )
    torch.manual_seed(0)
    hf = BloomForCausalLM(cfg).eval()
    path = tmp_path / "bloom.bin"
    assert convert_hf(hf, path, ftype="f32") == "bloom"
    _assert_parity(path, "bloom", hf)


def test_convert_falcon40_layout(tmp_path):
    """new_decoder_architecture: per-kv-group qkv packing -> contiguous
    [q x H, k x kv, v x kv] (falcon/src/lib.rs:220-241)."""
    from transformers import FalconConfig, FalconForCausalLM

    cfg = FalconConfig(
        vocab_size=V, hidden_size=E, num_hidden_layers=L,
        num_attention_heads=H, num_kv_heads=2, multi_query=False,
        new_decoder_architecture=True, parallel_attn=True, bias=False,
        alibi=False, hidden_dropout=0.0, attention_dropout=0.0,
    )
    torch.manual_seed(0)
    hf = FalconForCausalLM(cfg).eval()
    path = tmp_path / "falcon40.bin"
    assert convert_hf(hf, path, ftype="f32") == "falcon"
    _assert_parity(path, "falcon", hf)


def test_convert_llama_gqa_classic_raises(tmp_path):
    """GQA to the classic container (no --gguf) must be an explicit
    ConvertError: classic llama hparams cannot carry n_head_kv and the
    --n-gqa escape hatch only applies at n_layer >= 80, so the file would
    load with garbage logits."""
    from transformers import LlamaConfig, LlamaForCausalLM

    from llm_tpu.convert_hf import ConvertError

    cfg = LlamaConfig(
        vocab_size=V, hidden_size=E, intermediate_size=F,
        num_hidden_layers=L, num_attention_heads=H, num_key_value_heads=2,
        tie_word_embeddings=False, max_position_embeddings=64,
    )
    torch.manual_seed(0)
    hf = LlamaForCausalLM(cfg).eval()
    with pytest.raises(ConvertError, match="gguf"):
        convert_hf(hf, tmp_path / "llama_gqa.bin", ftype="f32")


def test_convert_falcon_old_arch_mha_raises(tmp_path):
    """Old-architecture non-MQA falcon (falcon-rw family): HF interleaves
    the fused qkv per head and the loader would pick the 40B residual — a
    silently-wrong conversion, so it must raise."""
    from transformers import FalconConfig, FalconForCausalLM

    from llm_tpu.convert_hf import ConvertError

    cfg = FalconConfig(
        vocab_size=V, hidden_size=E, num_hidden_layers=L,
        num_attention_heads=H, multi_query=False,
        new_decoder_architecture=False, parallel_attn=True, bias=False,
        alibi=False, hidden_dropout=0.0, attention_dropout=0.0,
    )
    torch.manual_seed(0)
    hf = FalconForCausalLM(cfg).eval()
    with pytest.raises(ConvertError, match="multi_query"):
        convert_hf(hf, tmp_path / "falcon_rw.bin", ftype="f32")


class _FakeTok:
    def __init__(self, vocab):
        self._v = vocab

    def get_vocab(self):
        return self._v


def test_vocab_byte_mapping_bpe():
    """Byte-level BPE surface forms map through the gpt2 byte-decoder for
    classic files ('Ġhello' -> b' hello'); surface=True keeps them (GGUF)."""
    from llm_tpu.convert_hf import vocab_from_tokenizer

    tok = _FakeTok({"Ġhello": 0, "hello": 1, "Ċ": 2, "<|endoftext|>": 3})
    vocab = vocab_from_tokenizer(tok, 5)
    assert vocab[0][0] == b" hello"
    assert vocab[1][0] == b"hello"
    assert vocab[2][0] == b"\n"
    assert vocab[3][0] == b"<|endoftext|>"  # special: outside the alphabet
    assert vocab[4][0] == b"<unused4>"
    surf = vocab_from_tokenizer(tok, 5, surface=True)
    assert surf[0][0] == "Ġhello".encode()


def test_vocab_byte_mapping_sentencepiece():
    """SentencePiece surface forms: '▁' -> space, '<0xNN>' -> single byte;
    latin-1-looking tokens must NOT run through the byte alphabet."""
    from llm_tpu.convert_hf import vocab_from_tokenizer

    tok = _FakeTok({"▁hello": 0, "<0x0A>": 1, "é": 2, "</s>": 3})
    vocab = vocab_from_tokenizer(tok, 4)
    assert vocab[0][0] == b" hello"
    assert vocab[1][0] == b"\n"
    assert vocab[2][0] == "é".encode("utf-8")
    assert vocab[3][0] == b"</s>"


def test_gguf_sp_vocab_decodes_to_text(tmp_path):
    """A GGUF file carrying SentencePiece surface forms (what llama.cpp
    writes) must tokenize/decode to clean text through the embedded
    tokenizer: the loader maps '▁'/'<0xNN>' at load time."""
    from llm_tpu.loader import _gguf_sp_token_bytes

    assert _gguf_sp_token_bytes("▁hello".encode()) == b" hello"
    assert _gguf_sp_token_bytes(b"<0x0A>") == b"\n"
    assert _gguf_sp_token_bytes(b"plain") == b"plain"


def test_convert_from_directory_cli(tmp_path):
    """Path-based entry (the CLI route): save_pretrained a tiny model, run
    `llm_tpu convert-hf <dir> <out>`, then quantize the result and infer."""
    from llm_tpu.cli import main

    hf = _tiny_gpt2()
    src = tmp_path / "hf_model"
    hf.save_pretrained(src)
    out = tmp_path / "gpt2_conv.bin"
    main(["convert-hf", str(src), str(out), "--ftype", "f32"])
    _assert_parity(out, "gpt2", hf)

    q = tmp_path / "gpt2_q8.bin"
    main(["quantize", "-a", "gpt2", str(out), str(q), "q8_0"])
    m = load(q, "gpt2", params=ModelParameters(context_size=64))
    np.testing.assert_allclose(
        _run(m, IDS), _ref_logits(hf, IDS), rtol=0.12, atol=0.12
    )
