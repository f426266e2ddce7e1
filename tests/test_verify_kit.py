"""Real-checkpoint verification kit (VERDICT r3 item 7): `cli verify`,
checksummed downloads, and the PPL parity gate — exercised with a synthetic
"real" checkpoint and file:// URLs (egress-free)."""

import hashlib
import json

import numpy as np
import pytest

from llm_tpu import harness
from llm_tpu.testing import make_tiny_file


@pytest.fixture()
def real_file(tmp_path):
    path = tmp_path / "real-llama.bin"
    make_tiny_file("llama", path)
    return path


def _config(tmp_path, real_file, **extra):
    cfg = {
        "architecture": "llama",
        "model_path": str(real_file),
        "context_size": 64,
        "test_cases": [
            {"Inference": {"input": "<t2><t3>", "maximum_token_count": 8}},
            {"Tokens": {"input": "<t5><t7>"}},
            {"Delete": {}},
        ],
        **extra,
    }
    p = tmp_path / "llama.json"
    p.write_text(json.dumps(cfg))
    return p


def test_cli_verify_passes_on_synthetic_real_file(tmp_path, real_file, capsys):
    from llm_tpu.cli import main

    cfg = _config(tmp_path, real_file)
    main(["verify", "--config", str(cfg)])
    out = capsys.readouterr().out
    assert "PASS" in out
    assert "Inference: passed" in out


def test_cli_verify_fails_on_wrong_golden(tmp_path, real_file, capsys):
    from llm_tpu.cli import main

    cfg = _config(tmp_path, real_file)
    body = json.loads(cfg.read_text())
    body["test_cases"][1]["Tokens"]["output"] = 1  # wrong argmax id
    cfg.write_text(json.dumps(body))
    with pytest.raises(SystemExit):
        main(["verify", "--config", str(cfg)])
    assert "Tokens: failed" in capsys.readouterr().out


def test_download_with_checksum(tmp_path, real_file, monkeypatch):
    monkeypatch.setattr(harness, "TEST_DIR", tmp_path / ".tests")
    sha = hashlib.sha256(real_file.read_bytes()).hexdigest()
    cfg = {"url": real_file.as_uri(), "filename": "dl.bin", "sha256": sha}
    p = harness._ensure_model(cfg, "llama")
    assert p.exists() and p.read_bytes() == real_file.read_bytes()
    # cached + matching checksum: no re-download even if the source dies
    p2 = harness._ensure_model(
        {**cfg, "url": "file:///nonexistent"}, "llama"
    )
    assert p2 == p


def test_download_rejects_bad_checksum(tmp_path, real_file, monkeypatch):
    monkeypatch.setattr(harness, "TEST_DIR", tmp_path / ".tests")
    cfg = {"url": real_file.as_uri(), "filename": "dl2.bin",
           "sha256": "0" * 64}
    with pytest.raises(RuntimeError, match="sha256"):
        harness._ensure_model(cfg, "llama")
    assert not (tmp_path / ".tests" / "models" / "dl2.bin").exists()


def test_stale_cache_redownloaded(tmp_path, real_file, monkeypatch):
    monkeypatch.setattr(harness, "TEST_DIR", tmp_path / ".tests")
    models = tmp_path / ".tests" / "models"
    models.mkdir(parents=True)
    (models / "dl3.bin").write_bytes(b"corrupt")
    sha = hashlib.sha256(real_file.read_bytes()).hexdigest()
    p = harness._ensure_model(
        {"url": real_file.as_uri(), "filename": "dl3.bin", "sha256": sha},
        "llama",
    )
    assert p.read_bytes() == real_file.read_bytes()


def test_record_then_replay(tmp_path, real_file, capsys):
    """`verify --record` closes the egress gap (VERDICT r4 item 2): it
    writes the observed goldens + sha256 into the config; a subsequent
    plain verify against the recorded config must then assert (and pass on)
    those goldens, and a corrupted golden must fail."""
    import hashlib

    from llm_tpu.cli import main

    corpus = tmp_path / "corpus.txt"
    corpus.write_text("<t2><t3><t4><t5>" * 80)

    cfg = _config(tmp_path, real_file)
    main(["verify", "--config", str(cfg), "--record",
          "--ppl-corpus", str(corpus)])
    out = capsys.readouterr().out
    assert "recorded goldens ->" in out and "PASS" in out

    rec = json.loads(cfg.read_text())
    assert rec["sha256"] == hashlib.sha256(
        real_file.read_bytes()).hexdigest()
    cases = {list(c)[0]: c[list(c)[0]] for c in rec["test_cases"]}
    assert isinstance(cases["Tokens"]["output"], int)
    assert cases["Tokens"]["output_backend"] == "cpu"
    assert isinstance(cases["Inference"]["output"], str)
    assert cases["Perplexity"]["expected"] > 0

    # replay: the recorded goldens are now asserted — and pass
    main(["verify", "--config", str(cfg)])
    out = capsys.readouterr().out
    assert "PASS" in out and "failed" not in out

    # a corrupted golden fails the replay
    rec["test_cases"][1]["Tokens"]["output"] += 1
    cfg.write_text(json.dumps(rec))
    import pytest as _pytest
    with _pytest.raises(SystemExit):
        main(["verify", "--config", str(cfg)])
    assert "Tokens: failed" in capsys.readouterr().out


def test_record_requires_local_model(tmp_path, capsys):
    from llm_tpu.cli import main

    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps({"architecture": "llama"}))
    with pytest.raises(SystemExit, match="record"):
        main(["verify", "--config", str(cfg), "--record"])


def test_record_keeps_url_canonical(tmp_path, real_file, capsys,
                                    monkeypatch):
    """Recording with -m against a url-pinned config must not bake the
    local override path into the shared config."""
    import hashlib

    from llm_tpu import harness
    from llm_tpu.cli import main

    monkeypatch.setattr(harness, "TEST_DIR", tmp_path / ".tests")
    cfg_path = tmp_path / "url.json"
    cfg_path.write_text(json.dumps({
        "architecture": "llama",
        "url": real_file.as_uri(),
        "filename": "url.bin",
        "sha256": None,
        "context_size": 64,
        "test_cases": [
            {"Tokens": {"input": "<t5><t7>"}},
        ],
    }))
    main(["verify", "--config", str(cfg_path), "-m", str(real_file),
          "--record"])
    capsys.readouterr()
    rec = json.loads(cfg_path.read_text())
    assert "model_path" not in rec
    assert rec["url"] == real_file.as_uri()
    assert rec["sha256"] == hashlib.sha256(
        real_file.read_bytes()).hexdigest()


def test_ppl_gate(tmp_path, real_file, capsys):
    """The perplexity case measures through session.perplexity and gates
    on expected + tolerance: the measured value passes against itself and
    fails against an impossibly low bar."""
    from llm_tpu.cli import main
    from llm_tpu.loader import ModelParameters, load
    from llm_tpu.session import InferenceSession

    corpus = tmp_path / "corpus.txt"
    corpus.write_text("<t2><t3><t4><t5>" * 80)

    model = load(real_file, "llama", params=ModelParameters(context_size=64))
    last = []
    InferenceSession(model).perplexity(
        corpus.read_text(), lambda i, p: last.append(p)
    )
    measured = last[-1]

    cfg = _config(tmp_path, real_file)
    main(["verify", "--config", str(cfg), "--ppl-corpus", str(corpus),
          "--ppl-expected", str(measured)])
    out = capsys.readouterr().out
    assert "Perplexity: passed" in out

    with pytest.raises(SystemExit):
        main(["verify", "--config", str(cfg), "--ppl-corpus", str(corpus),
              "--ppl-expected", str(measured / 2), "--ppl-tolerance", "0.1"])
    assert "Perplexity: failed" in capsys.readouterr().out
