"""Compiled-HLO collective audit: which mesh axis does each collective
cross, and how many bytes per step ride each axis?

This turns the zero-DCN design claim of the multi-host engine
(llm_tpu/parallel/multihost.py: "at decode steady state no collective
crosses DCN") into something checkable: lower + compile a step function on
a ("data", "model") mesh, parse every collective op out of the HLO, map its
replica groups onto mesh axes (partition ids follow mesh.devices.flat
order under jit), and bucket the op's payload bytes by the crossed axis.
On a real pod the `model` axis is ICI-local within a host and `data` spans
hosts over DCN, so `bytes_by_axis["data"] == bytes_by_axis["mixed"] == 0`
IS the zero-DCN invariant; tests/test_multihost.py asserts it and
docs/architecture.md carries the derived 2-host scaling bound.

The reference has no distributed layer to mirror (SURVEY.md §2.5); this is
new TPU-native design surface.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

_COLLECTIVES = (
    "all-reduce", "all-gather", "reduce-scatter", "all-to-all",
    "collective-permute", "collective-broadcast",
)

_OP_RE = re.compile(
    r"=\s*(?P<shape>\([^=]*?\)|[a-z0-9]+\[[0-9,]*\][^\s]*)\s+"
    r"(?P<op>" + "|".join(_COLLECTIVES) + r")(?:-start|-done)?\(",
)
_GROUPS_RE = re.compile(r"replica_groups=\{(?P<groups>[0-9,{} ]*)\}")
_IOTA_RE = re.compile(
    r"replica_groups=\[(?P<ng>\d+),(?P<gs>\d+)\]<=\[(?P<dims>[0-9,]+)\]"
    r"(?:T\((?P<perm>[0-9,]+)\))?"
)
_PAIRS_RE = re.compile(r"source_target_pairs=\{(?P<pairs>[0-9,{} ]*)\}")
_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")


def _shape_bytes(shape_str: str) -> int:
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_str):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def _parse_groups(line: str) -> "list[list[int]] | None":
    m = _GROUPS_RE.search(line)
    if m:
        inner = m.group("groups")
        groups = re.findall(r"\{([0-9, ]*)\}", "{" + inner + "}")
        if not groups and inner.strip():
            groups = [inner]
        return [
            [int(x) for x in g.replace(" ", "").split(",") if x]
            for g in groups
        ]
    m = _IOTA_RE.search(line)
    if m:
        ng, gs = int(m.group("ng")), int(m.group("gs"))
        dims = [int(x) for x in m.group("dims").split(",")]
        ids = np.arange(int(np.prod(dims))).reshape(dims)
        if m.group("perm"):
            perm = [int(x) for x in m.group("perm").split(",")]
            ids = ids.transpose(perm)
        return ids.reshape(ng, gs).tolist()
    m = _PAIRS_RE.search(line)
    if m:
        pairs = re.findall(r"\{(\d+),\s*(\d+)\}", m.group("pairs"))
        return [[int(a), int(b)] for a, b in pairs]
    return None


@dataclass
class CollectiveOp:
    op: str
    axis: str  # "model" | "data" | "mixed" | "replicated"
    bytes: int
    groups: list
    line: str


@dataclass
class AuditResult:
    ops: list = field(default_factory=list)

    @property
    def bytes_by_axis(self) -> dict:
        out: dict = {}
        for o in self.ops:
            out[o.axis] = out.get(o.axis, 0) + o.bytes
        return out

    def table(self) -> str:
        lines = ["axis        ops   bytes/step"]
        per_axis: dict = {}
        for o in self.ops:
            per_axis.setdefault(o.axis, []).append(o)
        for axis in ("model", "data", "mixed", "replicated"):
            ops = per_axis.get(axis, [])
            lines.append(
                f"{axis:10} {len(ops):4}   {sum(o.bytes for o in ops)}"
            )
        return "\n".join(lines)


def classify_groups(groups: "list[list[int]]", mesh) -> str:
    """Which mesh axis a collective's partition groups span. Partition ids
    index mesh.devices.flat (jit's device-assignment order)."""
    shape = mesh.devices.shape
    names = list(mesh.axis_names)
    coords = {
        i: np.unravel_index(i, shape) for i in range(mesh.devices.size)
    }
    crossed = set()
    for g in groups:
        if len(g) < 2:
            continue
        cs = [coords[p] for p in g]
        for ax in range(len(shape)):
            if len({c[ax] for c in cs}) > 1:
                crossed.add(names[ax])
    if not crossed:
        return "replicated"
    if len(crossed) == 1:
        return next(iter(crossed))
    return "mixed"


def audit_hlo(hlo_text: str, mesh) -> AuditResult:
    """Find every collective in a compiled HLO module and classify the mesh
    axis it communicates over."""
    res = AuditResult()
    for line in hlo_text.splitlines():
        m = _OP_RE.search(line)
        if not m:
            continue
        if "-done(" in line:
            continue  # the -start op carries shape+groups; done is a wait
        groups = _parse_groups(line)
        if groups is None:
            # a collective with no groups communicates over ALL partitions
            axis = "mixed" if len(mesh.axis_names) > 1 else mesh.axis_names[0]
        else:
            axis = classify_groups(groups, mesh)
        res.ops.append(
            CollectiveOp(m.group("op"), axis, _shape_bytes(m.group("shape")),
                         groups or [], line.strip())
        )
    return res


def audit_compiled(compiled, mesh) -> AuditResult:
    """Audit a jax compiled object (lowered.compile())."""
    return audit_hlo(compiled.as_text(), mesh)
