"""Unit tests for the HLO collective parser behind the zero-DCN audit
(llm_tpu/parallel/collectives_audit.py): replica-group formats (explicit
and iota), source-target pairs, shape-byte accounting, and mesh-axis
classification."""

import numpy as np

from llm_tpu.parallel.collectives_audit import (
    _parse_groups,
    _shape_bytes,
    audit_hlo,
    classify_groups,
)


class _FakeMesh:
    def __init__(self, shape, names):
        self.devices = np.arange(int(np.prod(shape))).reshape(shape)
        self.axis_names = names


MESH = _FakeMesh((2, 4), ("data", "model"))


def test_parse_explicit_groups():
    line = "replica_groups={{0,1,2,3},{4,5,6,7}}, use_global_device_ids=true"
    assert _parse_groups(line) == [[0, 1, 2, 3], [4, 5, 6, 7]]


def test_parse_iota_groups():
    # [4,2]<=[2,4]T(1,0): transpose the 2x4 id grid -> columns
    line = "replica_groups=[4,2]<=[2,4]T(1,0), dimensions={1}"
    assert _parse_groups(line) == [[0, 4], [1, 5], [2, 6], [3, 7]]


def test_parse_iota_groups_no_perm():
    line = "replica_groups=[2,4]<=[8]"
    assert _parse_groups(line) == [[0, 1, 2, 3], [4, 5, 6, 7]]


def test_parse_source_target_pairs():
    line = "source_target_pairs={{4,0},{5,1}}"
    assert _parse_groups(line) == [[4, 0], [5, 1]]


def test_shape_bytes():
    assert _shape_bytes("f32[8,128]") == 8 * 128 * 4
    assert _shape_bytes("(f32[4,4]{1,0}, bf16[2,8]{1,0})") == 64 + 32
    assert _shape_bytes("pred[16]") == 16


def test_classify_axes():
    assert classify_groups([[0, 1, 2, 3], [4, 5, 6, 7]], MESH) == "model"
    assert classify_groups([[0, 4], [1, 5]], MESH) == "data"
    assert classify_groups([[0, 5]], MESH) == "mixed"
    assert classify_groups([[2], [6]], MESH) == "replicated"


def test_audit_hlo_end_to_end():
    hlo = """
  %x = f32[8,64]{1,0} parameter(0)
  %ar = f32[8,64]{1,0} all-reduce(%x), channel_id=1, replica_groups={{0,1,2,3},{4,5,6,7}}, to_apply=%add
  %ag = f32[2,8,64]{2,1,0} all-gather(%x), channel_id=2, replica_groups=[4,2]<=[2,4]T(1,0), dimensions={0}
  %cp = f32[8,64]{1,0} collective-permute(%x), channel_id=3, source_target_pairs={{0,1},{1,2},{2,3},{3,0}}
"""
    res = audit_hlo(hlo, MESH)
    by_op = {o.op: o for o in res.ops}
    assert by_op["all-reduce"].axis == "model"
    assert by_op["all-reduce"].bytes == 8 * 64 * 4
    assert by_op["all-gather"].axis == "data"
    assert by_op["collective-permute"].axis == "model"
    assert res.bytes_by_axis["data"] == 2 * 8 * 64 * 4
    assert "model" in res.table()


def test_async_start_done_counted_once():
    hlo = """
  %s = f32[8,64]{1,0} all-reduce-start(%x), channel_id=1, replica_groups={{0,4}}
  %d = f32[8,64]{1,0} all-reduce-done(%s)
"""
    res = audit_hlo(hlo, MESH)
    assert len(res.ops) == 1 and res.ops[0].axis == "data"
