"""Interactive CLI (repl/chat) and loader error-path tests."""

import io

import numpy as np
import pytest

from llm_tpu.cli import main
from llm_tpu.loader import MultipartNotSupported, load, ModelParameters
from llm_tpu.testing import make_tiny_file


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("icli") / "llama.bin"
    make_tiny_file("llama", path)
    return path


def test_repl(model_path, capsys, monkeypatch):
    monkeypatch.setattr("sys.stdin", io.StringIO("<t2><t3>\n"))
    main([
        "repl", "-m", str(model_path), "-a", "llama", "-n", "4",
        "--seed", "1", "--no-float16",
    ])
    out = capsys.readouterr().out
    assert ">> " in out
    assert "<t" in out


def test_repl_with_template(model_path, capsys, monkeypatch, tmp_path):
    template = tmp_path / "template.txt"
    template.write_text("<t5>{{PROMPT}}<t6>\n")
    monkeypatch.setattr("sys.stdin", io.StringIO("<t9>\n"))
    main([
        "repl", "-m", str(model_path), "-a", "llama", "-n", "3",
        "--seed", "1", "--no-float16", "-f", str(template),
    ])
    out = capsys.readouterr().out
    assert ">> " in out


def test_chat(model_path, capsys, monkeypatch, tmp_path):
    prelude = tmp_path / "prelude.txt"
    prelude.write_text("<t5><t6>")
    monkeypatch.setattr("sys.stdin", io.StringIO("<t9>\n"))
    main([
        "chat", "-m", str(model_path), "-a", "llama", "-n", "4",
        "--seed", "1", "--no-float16",
        "-f", str(prelude), "-p", "<t7>",
    ])
    out = capsys.readouterr().out
    assert ">> " in out


def test_multipart_rejected(tmp_path):
    path = tmp_path / "model.bin"
    make_tiny_file("llama", path)
    (tmp_path / "model.bin.1").write_bytes(b"x")
    with pytest.raises(MultipartNotSupported):
        load(path, "llama")


def test_wrong_architecture_fails(model_path):
    # reading llama hyperparameters as mpt produces nonsense dims or a
    # missing-tensor error — either way a clean exception, not garbage
    with pytest.raises(Exception):
        load(model_path, "mpt", params=ModelParameters(context_size=64))


def test_truncated_file(tmp_path, model_path):
    data = model_path.read_bytes()
    trunc = tmp_path / "trunc.bin"
    trunc.write_bytes(data[: len(data) // 2])
    with pytest.raises(Exception):
        load(trunc, "llama")


def test_repl_line_continuation(tmp_path, capsys, monkeypatch):
    """A trailing backslash continues the line (interactive.rs:209-220)."""
    import io

    from llm_tpu.cli import main

    path = tmp_path / "llama.bin"
    make_tiny_file("llama", path)
    monkeypatch.setattr(
        "sys.stdin", io.StringIO("<t2>\\\n<t3>\n<t5>\n")
    )
    main(["repl", "-m", str(path), "-a", "llama", "-n", "2",
          "--num-ctx-tokens", "64", "--sampler", "topk:k=1"])
    out = capsys.readouterr().out
    assert ".. " in out  # continuation prompt shown
    # the joined multi-line prompt isn't tokenizable by the tiny vocab
    # (no newline token) — the repl reports it and keeps serving the
    # next line instead of crashing
    assert out.count(">> ") >= 3
