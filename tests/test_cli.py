"""CLI subcommand tests (in-process via main(argv))."""

import numpy as np
import pytest

from llm_tpu.cli import main
from llm_tpu.ggml.types import GgmlType
from llm_tpu.testing import make_tiny_file


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("cli") / "llama.bin"
    make_tiny_file("llama", path)
    return path


def test_info(model_path, capsys):
    main(["info", "-m", str(model_path), "-a", "llama", "-t"])
    out = capsys.readouterr().out
    assert "Hyperparameters" in out
    assert "tok_embeddings.weight" in out
    assert "Tokenizer vocabulary size: 96" in out


def test_prompt_tokens(model_path, capsys):
    main(
        ["prompt-tokens", "-m", str(model_path), "-a", "llama", "-p", "<t5><t7>"]
    )
    out = capsys.readouterr().out
    assert "5, 7" in out


def test_infer_deterministic(model_path, capsys):
    argv = [
        "infer", "-m", str(model_path), "-a", "llama",
        "-p", "<t2><t3>", "-n", "6", "--seed", "3", "--no-float16",
        "--stats",
    ]
    main(argv)
    out1 = capsys.readouterr().out
    main(argv)
    out2 = capsys.readouterr().out
    # identical generated text; stats lines carry wall-clock timings
    assert out1.splitlines()[0] == out2.splitlines()[0]
    assert "per_token_duration" in out1


def test_quantize_then_infer(model_path, tmp_path, capsys):
    qpath = tmp_path / "q5.bin"
    main(["quantize", "-a", "llama", str(model_path), str(qpath), "q5_1"])
    capsys.readouterr()
    from llm_tpu.ggml.reader import GgmlReader
    from llm_tpu.models.spec import get_arch

    arch = get_arch("llama")
    r = GgmlReader(qpath).load(
        lambda f: (lambda h: (h, h.n_vocab))(arch.read_hparams(f))
    )
    assert r.tensors["layers.0.attention.wq.weight"].element_type == GgmlType.Q5_1
    assert r.tensors["norm.weight"].element_type == GgmlType.F32
    assert r.hyperparameters.file_type.quantization_version == 2

    main([
        "infer", "-m", str(qpath), "-a", "llama", "-p", "<t2><t3>",
        "-n", "3", "--seed", "1",
    ])
    out = capsys.readouterr().out
    assert "<t2>" in out


def test_quantize_kquant_target_then_infer(tmp_path, capsys):
    """K-quant CLI targets (TPU extension beyond quantize.rs:224-244):
    rows divisible by QK_K quantize to the target; others fall back to
    Q8_0; the result loads and generates."""
    from llm_tpu.ggml.reader import GgmlReader
    from llm_tpu.models.spec import get_arch
    from llm_tpu.testing import make_tiny_file

    src = tmp_path / "f16.bin"
    make_tiny_file("llama", src, GgmlType.F16, n_embd=256)
    qpath = tmp_path / "q4k.bin"
    main(["quantize", "-a", "llama", str(src), str(qpath), "q4_k"])
    capsys.readouterr()

    arch = get_arch("llama")
    r = GgmlReader(qpath).load(
        lambda f: (lambda h: (h, h.n_vocab))(arch.read_hparams(f))
    )
    assert r.tensors["layers.0.attention.wq.weight"].element_type == GgmlType.Q4_K
    assert r.tensors["norm.weight"].element_type == GgmlType.F32
    ffn = r.tensors["layers.0.feed_forward.w2.weight"]
    expect = GgmlType.Q4_K if ffn.dims[0] % 256 == 0 else GgmlType.Q8_0
    assert ffn.element_type == expect

    main([
        "infer", "-m", str(qpath), "-a", "llama", "-p", "<t2><t3>",
        "-n", "3", "--seed", "1",
    ])
    out = capsys.readouterr().out
    assert "<t2>" in out


def test_session_persistence(model_path, tmp_path, capsys):
    sess = tmp_path / "sess.llm"
    main([
        "infer", "-m", str(model_path), "-a", "llama", "-p", "<t2><t3>",
        "-n", "4", "--seed", "3", "--no-float16", "--save-session", str(sess),
    ])
    capsys.readouterr()
    assert sess.exists()
    main([
        "infer", "-m", str(model_path), "-a", "llama", "-p", "<t4>",
        "-n", "4", "--seed", "3", "--no-float16", "--load-session", str(sess),
    ])
    out = capsys.readouterr().out
    assert "<t4>" in out


def test_perplexity(model_path, capsys):
    prompt = "<t5>" * 70
    main([
        "perplexity", "-m", str(model_path), "-a", "llama",
        "--num-ctx-tokens", "32", "-p", prompt,
    ])
    out = capsys.readouterr().out
    assert "Perplexity[0]:" in out
    assert "Perplexity[1]:" in out


def test_ignore_eos_and_sampler_dsl(model_path, capsys):
    main([
        "infer", "-m", str(model_path), "-a", "llama", "-p", "<t2>",
        "-n", "4", "--seed", "3", "--ignore-eos",
        "-s", "topk:k=4", "-s", "temperature:0.7",
    ])
    out = capsys.readouterr().out
    assert len(out.strip()) > 0


def test_batch_size_auto(tmp_path, capsys, monkeypatch):
    """--batch-size auto picks a backend-appropriate prefill chunk."""
    from llm_tpu.cli import main

    path = tmp_path / "llama.bin"
    make_tiny_file("llama", path)
    main([
        "infer", "-m", str(path), "-a", "llama", "-p", "<t2><t3>",
        "-n", "2", "--num-ctx-tokens", "64", "--batch-size", "auto",
        "--sampler", "topk:k=1",
    ])
    out = capsys.readouterr().out
    assert len(out) > 0
