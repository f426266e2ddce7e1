"""Export tiny random HuggingFace models to GGML files (test oracle support).

Replicates what the llama.cpp-family converter scripts do for each
architecture (weight orientation, llama rope permutation, bloom qkv
reordering), so that logits from `llm_tpu` can be compared bit-for-bit-ish
against `transformers` — the strongest numerical parity oracle available
without network access.

Conventions: a ggml tensor with dims (K, R) stores row-major data of shape
[R, K] (R rows of length K). torch Linear weights are [out, in] = [R, K]
already; GPT-2 Conv1D weights are [in, out] and must be transposed.
"""

from __future__ import annotations

import io

import numpy as np
import torch

from llm_tpu.ggml.types import ContainerType, FileType, FileTypeFormat, GgmlType
from llm_tpu.ggml.writer import GgmlWriter
from llm_tpu.models.spec import Hyperparameters

V, E, H, L, F = 96, 64, 4, 2, 128
HD = E // H


def _t(model, name):
    return model.state_dict()[name].detach().cpu().numpy().astype(np.float32)


def _write(path, hparams: Hyperparameters, tensors):
    hb = io.BytesIO()
    hparams.file_type = FileType(FileTypeFormat.F32, 0)
    hparams.write_ggml(hb)
    vocab = [(f"<t{i}>".encode(), float(len(f"<t{i}>") ** 2)) for i in range(V)]
    with open(path, "wb") as f:
        w = GgmlWriter(f, ContainerType("ggjt", 3))
        w.write_header(hb.getvalue(), vocab)
        for name, arr in tensors:
            arr = np.ascontiguousarray(arr.astype(np.float32))
            dims = tuple(reversed(arr.shape))  # [R, K] -> ggml (K, R)
            w.write_tensor(name, GgmlType.F32, dims, arr.tobytes())


def _llama_permute(w: np.ndarray, n_head: int) -> np.ndarray:
    """HF 'rotate_half' weight order -> interleaved-pairs order (the inverse
    of what llama.cpp convert.py does when importing HF checkpoints)."""
    out = w.shape[0]
    return (
        w.reshape(n_head, 2, out // n_head // 2, *w.shape[1:])
        .swapaxes(1, 2)
        .reshape(w.shape)
    )


def export_gpt2(path):
    from transformers import GPT2Config, GPT2LMHeadModel

    cfg = GPT2Config(
        vocab_size=V, n_positions=64, n_embd=E, n_layer=L, n_head=H,
        activation_function="gelu_new", resid_pdrop=0.0, embd_pdrop=0.0,
        attn_pdrop=0.0,
    )
    torch.manual_seed(0)
    model = GPT2LMHeadModel(cfg).eval()
    t = []
    t.append(("model/wte", _t(model, "transformer.wte.weight")))
    t.append(("model/wpe", _t(model, "transformer.wpe.weight")))
    t.append(("model/ln_f/g", _t(model, "transformer.ln_f.weight")))
    t.append(("model/ln_f/b", _t(model, "transformer.ln_f.bias")))
    for i in range(L):
        hf = f"transformer.h.{i}"
        g = f"model/h{i}"
        t += [
            (f"{g}/ln_1/g", _t(model, f"{hf}.ln_1.weight")),
            (f"{g}/ln_1/b", _t(model, f"{hf}.ln_1.bias")),
            (f"{g}/ln_2/g", _t(model, f"{hf}.ln_2.weight")),
            (f"{g}/ln_2/b", _t(model, f"{hf}.ln_2.bias")),
            (f"{g}/attn/c_attn/w", _t(model, f"{hf}.attn.c_attn.weight").T),
            (f"{g}/attn/c_attn/b", _t(model, f"{hf}.attn.c_attn.bias")),
            (f"{g}/attn/c_proj/w", _t(model, f"{hf}.attn.c_proj.weight").T),
            (f"{g}/attn/c_proj/b", _t(model, f"{hf}.attn.c_proj.bias")),
            (f"{g}/mlp/c_fc/w", _t(model, f"{hf}.mlp.c_fc.weight").T),
            (f"{g}/mlp/c_fc/b", _t(model, f"{hf}.mlp.c_fc.bias")),
            (f"{g}/mlp/c_proj/w", _t(model, f"{hf}.mlp.c_proj.weight").T),
            (f"{g}/mlp/c_proj/b", _t(model, f"{hf}.mlp.c_proj.bias")),
        ]
    h = Hyperparameters(arch="gpt2", n_vocab=V, n_ctx=64, n_embd=E, n_head=H,
                        n_layer=L)
    _write(path, h, t)
    return model


def export_llama(path):
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=V, hidden_size=E, intermediate_size=F,
        num_hidden_layers=L, num_attention_heads=H, num_key_value_heads=H,
        rms_norm_eps=5e-6, rope_theta=10000.0, attention_bias=False,
        mlp_bias=False, tie_word_embeddings=False, max_position_embeddings=64,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(cfg).eval()
    t = [
        ("tok_embeddings.weight", _t(model, "model.embed_tokens.weight")),
        ("norm.weight", _t(model, "model.norm.weight")),
        ("output.weight", _t(model, "lm_head.weight")),
    ]
    for i in range(L):
        hf = f"model.layers.{i}"
        g = f"layers.{i}"
        t += [
            (f"{g}.attention_norm.weight", _t(model, f"{hf}.input_layernorm.weight")),
            (f"{g}.attention.wq.weight",
             _llama_permute(_t(model, f"{hf}.self_attn.q_proj.weight"), H)),
            (f"{g}.attention.wk.weight",
             _llama_permute(_t(model, f"{hf}.self_attn.k_proj.weight"), H)),
            (f"{g}.attention.wv.weight", _t(model, f"{hf}.self_attn.v_proj.weight")),
            (f"{g}.attention.wo.weight", _t(model, f"{hf}.self_attn.o_proj.weight")),
            (f"{g}.ffn_norm.weight",
             _t(model, f"{hf}.post_attention_layernorm.weight")),
            (f"{g}.feed_forward.w1.weight", _t(model, f"{hf}.mlp.gate_proj.weight")),
            (f"{g}.feed_forward.w2.weight", _t(model, f"{hf}.mlp.down_proj.weight")),
            (f"{g}.feed_forward.w3.weight", _t(model, f"{hf}.mlp.up_proj.weight")),
        ]
    h = Hyperparameters(arch="llama", n_vocab=V, n_embd=E, n_mult=32, n_head=H,
                        n_layer=L, n_rot=HD)
    _write(path, h, t)
    return model


def export_gptj(path):
    from transformers import GPTJConfig, GPTJForCausalLM

    cfg = GPTJConfig(
        vocab_size=V, n_positions=64, n_embd=E, n_layer=L, n_head=H,
        rotary_dim=HD, n_inner=F, activation_function="gelu_new",
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    torch.manual_seed(0)
    model = GPTJForCausalLM(cfg).eval()
    t = [
        ("transformer.wte.weight", _t(model, "transformer.wte.weight")),
        ("transformer.ln_f.weight", _t(model, "transformer.ln_f.weight")),
        ("transformer.ln_f.bias", _t(model, "transformer.ln_f.bias")),
        ("lm_head.weight", _t(model, "lm_head.weight")),
        ("lm_head.bias", _t(model, "lm_head.bias")),
    ]
    for i in range(L):
        hf = f"transformer.h.{i}"
        t += [
            (f"{hf}.ln_1.weight", _t(model, f"{hf}.ln_1.weight")),
            (f"{hf}.ln_1.bias", _t(model, f"{hf}.ln_1.bias")),
            (f"{hf}.attn.q_proj.weight", _t(model, f"{hf}.attn.q_proj.weight")),
            (f"{hf}.attn.k_proj.weight", _t(model, f"{hf}.attn.k_proj.weight")),
            (f"{hf}.attn.v_proj.weight", _t(model, f"{hf}.attn.v_proj.weight")),
            (f"{hf}.attn.out_proj.weight", _t(model, f"{hf}.attn.out_proj.weight")),
            (f"{hf}.mlp.fc_in.weight", _t(model, f"{hf}.mlp.fc_in.weight")),
            (f"{hf}.mlp.fc_in.bias", _t(model, f"{hf}.mlp.fc_in.bias")),
            (f"{hf}.mlp.fc_out.weight", _t(model, f"{hf}.mlp.fc_out.weight")),
            (f"{hf}.mlp.fc_out.bias", _t(model, f"{hf}.mlp.fc_out.bias")),
        ]
    h = Hyperparameters(arch="gptj", n_vocab=V, n_ctx=64, n_embd=E, n_head=H,
                        n_layer=L, n_rot=HD)
    _write(path, h, t)
    return model


def export_gptneox(path, rotary_pct=0.5, parallel=True):
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

    cfg = GPTNeoXConfig(
        vocab_size=V, hidden_size=E, num_hidden_layers=L,
        num_attention_heads=H, intermediate_size=F, rotary_pct=rotary_pct,
        use_parallel_residual=parallel, max_position_embeddings=64,
        hidden_dropout=0.0, attention_dropout=0.0,
    )
    torch.manual_seed(0)
    model = GPTNeoXForCausalLM(cfg).eval()
    t = [
        ("gpt_neox.embed_in.weight", _t(model, "gpt_neox.embed_in.weight")),
        ("gpt_neox.final_layer_norm.weight",
         _t(model, "gpt_neox.final_layer_norm.weight")),
        ("gpt_neox.final_layer_norm.bias",
         _t(model, "gpt_neox.final_layer_norm.bias")),
        ("embed_out.weight", _t(model, "embed_out.weight")),
    ]
    for i in range(L):
        hf = f"gpt_neox.layers.{i}"
        for n in [
            "input_layernorm.weight", "input_layernorm.bias",
            "post_attention_layernorm.weight", "post_attention_layernorm.bias",
            "attention.query_key_value.weight", "attention.query_key_value.bias",
            "attention.dense.weight", "attention.dense.bias",
            "mlp.dense_h_to_4h.weight", "mlp.dense_h_to_4h.bias",
            "mlp.dense_4h_to_h.weight", "mlp.dense_4h_to_h.bias",
        ]:
            t.append((f"{hf}.{n}", _t(model, f"{hf}.{n}")))
    h = Hyperparameters(arch="gptneox", n_vocab=V, n_ctx=64, n_embd=E, n_head=H,
                        n_layer=L, n_rot=int(HD * rotary_pct),
                        use_parallel_residual=parallel)
    _write(path, h, t)
    return model


def _bloom_qkv_reorder(w: np.ndarray) -> np.ndarray:
    """HF bloom fused qkv rows are [H, 3, hd] interleaved; the ggml bloom
    graph expects contiguous thirds (bloom/src/lib.rs:167-185)."""
    x = w.reshape(H, 3, HD, *w.shape[1:])
    return np.concatenate([x[:, 0], x[:, 1], x[:, 2]], axis=0).reshape(w.shape)


def export_bloom(path):
    from transformers import BloomConfig, BloomForCausalLM

    cfg = BloomConfig(
        vocab_size=V, hidden_size=E, n_layer=L, n_head=H,
        hidden_dropout=0.0, attention_dropout=0.0,
    )
    torch.manual_seed(0)
    model = BloomForCausalLM(cfg).eval()
    t = [
        ("tok_embeddings.weight", _t(model, "transformer.word_embeddings.weight")),
        ("norm.weight", _t(model, "transformer.word_embeddings_layernorm.weight")),
        ("norm.bias", _t(model, "transformer.word_embeddings_layernorm.bias")),
        ("output_norm.weight", _t(model, "transformer.ln_f.weight")),
        ("output_norm.bias", _t(model, "transformer.ln_f.bias")),
        ("output.weight", _t(model, "transformer.word_embeddings.weight")),
    ]
    for i in range(L):
        hf = f"transformer.h.{i}"
        g = f"layers.{i}"
        t += [
            (f"{g}.attention_norm.weight", _t(model, f"{hf}.input_layernorm.weight")),
            (f"{g}.attention_norm.bias", _t(model, f"{hf}.input_layernorm.bias")),
            (f"{g}.attention.query_key_value.weight",
             _bloom_qkv_reorder(_t(model, f"{hf}.self_attention.query_key_value.weight"))),
            (f"{g}.attention.query_key_value.bias",
             _bloom_qkv_reorder(_t(model, f"{hf}.self_attention.query_key_value.bias"))),
            (f"{g}.attention.wo.weight", _t(model, f"{hf}.self_attention.dense.weight")),
            (f"{g}.attention.wo.bias", _t(model, f"{hf}.self_attention.dense.bias")),
            (f"{g}.ffn_norm.weight", _t(model, f"{hf}.post_attention_layernorm.weight")),
            (f"{g}.ffn_norm.bias", _t(model, f"{hf}.post_attention_layernorm.bias")),
            (f"{g}.feed_forward.w1.weight", _t(model, f"{hf}.mlp.dense_h_to_4h.weight")),
            (f"{g}.feed_forward.w1.bias", _t(model, f"{hf}.mlp.dense_h_to_4h.bias")),
            (f"{g}.feed_forward.w2.weight", _t(model, f"{hf}.mlp.dense_4h_to_h.weight")),
            (f"{g}.feed_forward.w2.bias", _t(model, f"{hf}.mlp.dense_4h_to_h.bias")),
        ]
    h = Hyperparameters(arch="bloom", n_vocab=V, n_embd=E, n_mult=32, n_head=H,
                        n_layer=L)
    _write(path, h, t)
    return model


def export_mpt(path):
    from transformers import MptConfig, MptForCausalLM
    from transformers.models.mpt.configuration_mpt import MptAttentionConfig

    cfg = MptConfig(
        vocab_size=V, d_model=E, n_heads=H, n_layers=L, expansion_ratio=2,
        max_seq_len=64, no_bias=True,
        attn_config=MptAttentionConfig(attn_impl="torch", alibi=True,
                                       alibi_bias_max=8, attn_pdrop=0.0),
        emb_pdrop=0.0, resid_pdrop=0.0,
    )
    torch.manual_seed(0)
    model = MptForCausalLM(cfg).eval()
    t = [
        ("transformer.wte.weight", _t(model, "transformer.wte.weight")),
        ("transformer.norm_f.weight", _t(model, "transformer.norm_f.weight")),
    ]
    for i in range(L):
        hf = f"transformer.blocks.{i}"
        t += [
            (f"{hf}.norm_1.weight", _t(model, f"{hf}.norm_1.weight")),
            (f"{hf}.attn.Wqkv.weight", _t(model, f"{hf}.attn.Wqkv.weight")),
            (f"{hf}.attn.out_proj.weight", _t(model, f"{hf}.attn.out_proj.weight")),
            (f"{hf}.norm_2.weight", _t(model, f"{hf}.norm_2.weight")),
            (f"{hf}.ffn.up_proj.weight", _t(model, f"{hf}.ffn.up_proj.weight")),
            (f"{hf}.ffn.down_proj.weight", _t(model, f"{hf}.ffn.down_proj.weight")),
        ]
    h = Hyperparameters(arch="mpt", n_vocab=V, n_embd=E, n_head=H, n_layer=L,
                        max_seq_len=64, alibi_bias_max=8.0, clip_kqv=0.0)
    _write(path, h, t)
    return model


def export_falcon(path):
    from transformers import FalconConfig, FalconForCausalLM

    cfg = FalconConfig(
        vocab_size=V, hidden_size=E, num_hidden_layers=L,
        num_attention_heads=H, multi_query=True,
        new_decoder_architecture=False, parallel_attn=True, bias=False,
        alibi=False, hidden_dropout=0.0, attention_dropout=0.0,
    )
    torch.manual_seed(0)
    model = FalconForCausalLM(cfg).eval()
    t = [
        ("transformer.word_embeddings.weight",
         _t(model, "transformer.word_embeddings.weight")),
        ("transformer.ln_f.weight", _t(model, "transformer.ln_f.weight")),
        ("transformer.ln_f.bias", _t(model, "transformer.ln_f.bias")),
        ("lm_head.weight", _t(model, "lm_head.weight")),
    ]
    for i in range(L):
        hf = f"transformer.h.{i}"
        t += [
            (f"{hf}.input_layernorm.weight",
             _t(model, f"{hf}.input_layernorm.weight")),
            (f"{hf}.input_layernorm.bias",
             _t(model, f"{hf}.input_layernorm.bias")),
            (f"{hf}.self_attention.query_key_value.weight",
             _t(model, f"{hf}.self_attention.query_key_value.weight")),
            (f"{hf}.self_attention.dense.weight",
             _t(model, f"{hf}.self_attention.dense.weight")),
            (f"{hf}.mlp.dense_h_to_4h.weight",
             _t(model, f"{hf}.mlp.dense_h_to_4h.weight")),
            (f"{hf}.mlp.dense_4h_to_h.weight",
             _t(model, f"{hf}.mlp.dense_4h_to_h.weight")),
        ]
    h = Hyperparameters(arch="falcon", n_vocab=V, n_embd=E, n_head=H,
                        n_head_kv=1, n_layer=L)
    _write(path, h, t)
    return model


def export_falcon40(path, kv=2):
    """Falcon 40B-style: new decoder architecture (ln_attn/ln_mlp, grouped
    kv heads). HF packs qkv per kv-group [q x H/kv, k, v]; the ggml falcon
    graph expects [q x H, k x kv, v x kv] contiguous (falcon/src/lib.rs:220-241)."""
    from transformers import FalconConfig, FalconForCausalLM

    cfg = FalconConfig(
        vocab_size=V, hidden_size=E, num_hidden_layers=L,
        num_attention_heads=H, num_kv_heads=kv, multi_query=False,
        new_decoder_architecture=True, parallel_attn=True, bias=False,
        alibi=False, hidden_dropout=0.0, attention_dropout=0.0,
    )
    torch.manual_seed(0)
    model = FalconForCausalLM(cfg).eval()

    def reorder(w):
        x = w.reshape(kv, H // kv + 2, HD, E)
        q = x[:, : H // kv].reshape(H * HD, E)
        k = x[:, H // kv].reshape(kv * HD, E)
        v = x[:, H // kv + 1].reshape(kv * HD, E)
        return np.concatenate([q, k, v], axis=0)

    t = [
        ("transformer.word_embeddings.weight",
         _t(model, "transformer.word_embeddings.weight")),
        ("transformer.ln_f.weight", _t(model, "transformer.ln_f.weight")),
        ("transformer.ln_f.bias", _t(model, "transformer.ln_f.bias")),
        ("lm_head.weight", _t(model, "lm_head.weight")),
    ]
    for i in range(L):
        hf = f"transformer.h.{i}"
        t += [
            (f"{hf}.ln_attn.weight", _t(model, f"{hf}.ln_attn.weight")),
            (f"{hf}.ln_attn.bias", _t(model, f"{hf}.ln_attn.bias")),
            (f"{hf}.ln_mlp.weight", _t(model, f"{hf}.ln_mlp.weight")),
            (f"{hf}.ln_mlp.bias", _t(model, f"{hf}.ln_mlp.bias")),
            (f"{hf}.self_attention.query_key_value.weight",
             reorder(_t(model, f"{hf}.self_attention.query_key_value.weight"))),
            (f"{hf}.self_attention.dense.weight",
             _t(model, f"{hf}.self_attention.dense.weight")),
            (f"{hf}.mlp.dense_h_to_4h.weight",
             _t(model, f"{hf}.mlp.dense_h_to_4h.weight")),
            (f"{hf}.mlp.dense_4h_to_h.weight",
             _t(model, f"{hf}.mlp.dense_4h_to_h.weight")),
        ]
    h = Hyperparameters(arch="falcon", n_vocab=V, n_embd=E, n_head=H,
                        n_head_kv=kv, n_layer=L)
    _write(path, h, t)
    return model


EXPORTERS = {
    "gpt2": export_gpt2,
    "llama": export_llama,
    "gptj": export_gptj,
    "gptneox": export_gptneox,
    "bloom": export_bloom,
    "mpt": export_mpt,
    "falcon": export_falcon,
}
