"""The bench's on-chip smoke gate (reduced sweep, interpret mode): the
gate itself must keep working on CPU so a broken variant list or numeric
check is caught before the real chip run."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def test_run_smoke_reduced(monkeypatch, capsys):
    import bench
    from llm_tpu.ggml.types import GgmlType
    from llm_tpu.ops.packing import FORMATS

    reduced = {t: FORMATS[t] for t in (GgmlType.Q4_0, GgmlType.Q6_K)}
    import llm_tpu.ops.packing as packing

    monkeypatch.setattr(packing, "FORMATS", reduced)
    emitted = []
    monkeypatch.setattr(bench, "emit", lambda *a, **k: emitted.append(a))
    n = bench.run_smoke()
    # 2 formats x {flat, stacked, coalesced} + 3 dense-attention
    # geometries + 2 paged-attention pools (int8, int4)
    assert n == 2 * 3 + 3 + 2
    assert emitted and emitted[0][0] == "smoke"


def test_run_smoke_names_failing_variant(monkeypatch):
    import bench
    from llm_tpu.ggml.types import GgmlType
    from llm_tpu.ops.packing import FORMATS

    import importlib

    import llm_tpu.ops.packing as packing

    # llm_tpu.ops re-exports the qmatmul FUNCTION, shadowing the submodule
    # attribute — resolve the module itself
    qm = importlib.import_module("llm_tpu.ops.qmatmul")
    monkeypatch.setattr(packing, "FORMATS",
                        {GgmlType.Q4_0: FORMATS[GgmlType.Q4_0]})
    monkeypatch.setattr(bench, "emit", lambda *a, **k: None)

    def broken(*a, **k):
        raise RuntimeError("mosaic lowering exploded")

    monkeypatch.setattr(qm, "qmatmul", broken)
    with pytest.raises(SystemExit, match="q4_0/flat"):
        bench.run_smoke()
