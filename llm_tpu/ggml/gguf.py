"""GGUF v2/v3 container support (the GGML successor format).

Out of the reference's scope (rustformers/llm predates GGUF) but most real
checkpoints now ship as GGUF, so the loader accepts it: `GgufReader` parses
the metadata KV store and tensor index and presents the SAME surface as
`GgmlReader` (container/vocabulary/tensors/hyperparameters/fetch), with
GGUF tensor names translated to the classic GGML names at index time so the
spec-driven parameter builder works unchanged.

Format (little-endian):
    magic "GGUF" | u32 version (2|3) | u64 n_tensors | u64 n_kv
    n_kv x { string key | u32 type | value }      (types below)
    n_tensors x { string name | u32 n_dims | u64 dims[n_dims]
                  | u32 ggml_type | u64 offset }  (offset is relative to
                                                   the aligned data start)
    pad to `general.alignment` (default 32) | tensor data

Value types: 0 u8, 1 i8, 2 u16, 3 i16, 4 u32, 5 i32, 6 f32, 7 bool,
8 string (u64 len + bytes), 9 array (u32 elem type + u64 count + elems),
10 u64, 11 i64, 12 f64. GGUF v1 (u32 counts) is rejected.
"""

from __future__ import annotations

import struct
from pathlib import Path
from typing import Any, BinaryIO, Optional

import numpy as np

from llm_tpu.ggml.reader import FormatError, TensorInfo, Vocabulary
from llm_tpu.ggml.types import ContainerType, FileType, GgmlType

GGUF_MAGIC = b"GGUF"

_SCALARS = {
    0: ("<B", 1), 1: ("<b", 1), 2: ("<H", 2), 3: ("<h", 2),
    4: ("<I", 4), 5: ("<i", 4), 6: ("<f", 4), 7: ("<B", 1),
    10: ("<Q", 8), 11: ("<q", 8), 12: ("<d", 8),
}
_T_STRING = 8
_T_ARRAY = 9


def is_gguf(path) -> bool:
    with open(path, "rb") as f:
        return f.read(4) == GGUF_MAGIC


def _read(f: BinaryIO, fmt: str, size: int):
    b = f.read(size)
    if len(b) != size:
        raise FormatError("unexpected end of GGUF file")
    return struct.unpack(fmt, b)[0]


def _read_string(f: BinaryIO) -> bytes:
    n = _read(f, "<Q", 8)
    b = f.read(n)
    if len(b) != n:
        raise FormatError("unexpected end of GGUF string")
    return b


def _read_value(f: BinaryIO, t: int) -> Any:
    if t in _SCALARS:
        fmt, size = _SCALARS[t]
        v = _read(f, fmt, size)
        return bool(v) if t == 7 else v
    if t == _T_STRING:
        return _read_string(f)
    if t == _T_ARRAY:
        et = _read(f, "<I", 4)
        n = _read(f, "<Q", 8)
        if et in _SCALARS:
            fmt, size = _SCALARS[et]
            raw = f.read(n * size)
            if len(raw) != n * size:
                raise FormatError("unexpected end of GGUF array")
            vals = list(struct.unpack(f"<{n}{fmt[-1]}", raw))
            return [bool(v) for v in vals] if et == 7 else vals
        if et == _T_STRING:
            return [_read_string(f) for _ in range(n)]
        raise FormatError(f"unsupported GGUF array element type {et}")
    raise FormatError(f"unsupported GGUF value type {t}")


# GGUF -> classic GGML tensor names, per architecture. Layer index rides
# the {} placeholder. Unmapped names pass through unchanged.
_NAME_MAPS = {
    "llama": {
        "token_embd.weight": "tok_embeddings.weight",
        "output_norm.weight": "norm.weight",
        "output.weight": "output.weight",
        "blk.{}.attn_norm.weight": "layers.{}.attention_norm.weight",
        "blk.{}.attn_q.weight": "layers.{}.attention.wq.weight",
        "blk.{}.attn_k.weight": "layers.{}.attention.wk.weight",
        "blk.{}.attn_v.weight": "layers.{}.attention.wv.weight",
        "blk.{}.attn_output.weight": "layers.{}.attention.wo.weight",
        "blk.{}.ffn_norm.weight": "layers.{}.ffn_norm.weight",
        "blk.{}.ffn_gate.weight": "layers.{}.feed_forward.w1.weight",
        "blk.{}.ffn_down.weight": "layers.{}.feed_forward.w2.weight",
        "blk.{}.ffn_up.weight": "layers.{}.feed_forward.w3.weight",
    },
}


def _translate_name(arch: str, name: str) -> str:
    table = _NAME_MAPS.get(arch, {})
    if name in table:
        return table[name]
    parts = name.split(".")
    if len(parts) > 2 and parts[0] == "blk" and parts[1].isdigit():
        pattern = f"blk.{{}}.{'.'.join(parts[2:])}"
        if pattern in table:
            return table[pattern].format(parts[1])
    return name


class GgufReader:
    """GGUF parser with the GgmlReader post-load surface."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.container: Optional[ContainerType] = None
        self.vocabulary = Vocabulary()
        self.tensors: dict[str, TensorInfo] = {}
        self.hyperparameters = None
        self.metadata: dict[str, Any] = {}
        self._mmap: Optional[np.ndarray] = None

    def load(self, architecture: Optional[str] = None) -> "GgufReader":
        with open(self.path, "rb") as f:
            if f.read(4) != GGUF_MAGIC:
                raise FormatError("not a GGUF file")
            version = _read(f, "<I", 4)
            if version not in (2, 3):
                raise FormatError(
                    f"unsupported GGUF version {version} (v2/v3 only)"
                )
            self.container = ContainerType("gguf", version)
            n_tensors = _read(f, "<Q", 8)
            n_kv = _read(f, "<Q", 8)

            for _ in range(n_kv):
                key = _read_string(f).decode("utf-8")
                t = _read(f, "<I", 4)
                self.metadata[key] = _read_value(f, t)

            arch = architecture or (
                self.metadata.get("general.architecture", b"llama").decode()
                if isinstance(self.metadata.get("general.architecture"), bytes)
                else self.metadata.get("general.architecture", "llama")
            )
            self.arch = arch

            infos = []
            for _ in range(n_tensors):
                name = _read_string(f).decode("utf-8")
                n_dims = _read(f, "<I", 4)
                dims = [int(_read(f, "<Q", 8)) for _ in range(n_dims)]
                ftype_raw = _read(f, "<I", 4)
                offset = _read(f, "<Q", 8)
                try:
                    element_type = GgmlType(ftype_raw)
                except ValueError:
                    raise FormatError(
                        f"unsupported tensor type {ftype_raw} for {name}"
                    ) from None
                infos.append((name, n_dims, dims, element_type, offset))

            align = int(self.metadata.get("general.alignment", 32))
            data_start = (f.tell() + align - 1) // align * align

            for name, n_dims, dims, element_type, offset in infos:
                gname = _translate_name(arch, name)
                self.tensors[gname] = TensorInfo(
                    name=gname,
                    n_dims=n_dims,
                    dims=tuple(dims) if dims else (1,),
                    element_type=element_type,
                    start_offset=data_start + offset,
                )

        self._build_vocab()
        self._build_hparams(arch)
        return self

    # -- metadata -> classic structures ----------------------------------

    def _build_vocab(self) -> None:
        toks = self.metadata.get("tokenizer.ggml.tokens")
        if not toks:
            return
        scores = self.metadata.get("tokenizer.ggml.scores") or [0.0] * len(toks)
        if len(scores) < len(toks):  # malformed: pad rather than truncate
            scores = list(scores) + [0.0] * (len(toks) - len(scores))
        for t, s in zip(toks, scores):
            self.vocabulary.tokens.append(
                t if isinstance(t, bytes) else str(t).encode()
            )
            self.vocabulary.scores.append(float(s))

    def _build_hparams(self, arch: str):
        from llm_tpu.models.spec import Hyperparameters

        md = self.metadata

        def get(key: str, default=0):
            return md.get(f"{arch}.{key}", default)

        h = Hyperparameters(arch=arch)
        h.n_vocab = len(self.vocabulary.tokens) or int(get("vocab_size", 0))
        h.n_embd = int(get("embedding_length"))
        h.n_layer = int(get("block_count"))
        h.n_head = int(get("attention.head_count"))
        h.n_head_kv = int(get("attention.head_count_kv", h.n_head) or h.n_head)
        h.n_ctx = int(get("context_length"))
        h.max_seq_len = h.n_ctx
        h.n_rot = int(
            get("rope.dimension_count",
                h.n_embd // h.n_head if h.n_head else 0)
        )
        ft = md.get("general.file_type")
        if ft is not None:
            # GGUF file_type is the bare ftype enum (no QNT_VERSION_FACTOR);
            # GGUF always stores current-revision quant blocks
            h.file_type = FileType.from_i32(int(ft))
        quantized = any(
            t.element_type.is_quantized for t in self.tensors.values()
        )
        if quantized:
            h.file_type = FileType(
                format=h.file_type.format, quantization_version=2
            )
        self.hyperparameters = h

    # -- data access (same surface as GgmlReader) -------------------------

    def fetch(self, name: str) -> np.ndarray:
        info = self.tensors[name]
        if self._mmap is None:
            self._mmap = np.memmap(self.path, dtype=np.uint8, mode="r")
        return self._mmap[info.start_offset : info.start_offset + info.calc_size()]

    def fetch_f32(self, name: str) -> np.ndarray:
        info = self.tensors[name]
        from llm_tpu.ggml.quant import dequantize

        flat = dequantize(
            info.element_type, self.fetch(name), int(np.prod(info.dims))
        )
        return flat.reshape(tuple(reversed(info.dims)))


# ---------------------------------------------------------------------------
# writer (tests + conversion)


def _w_string(f: BinaryIO, s: bytes) -> None:
    f.write(struct.pack("<Q", len(s)))
    f.write(s)


def _w_value(f: BinaryIO, v: Any) -> None:
    if isinstance(v, bool):
        f.write(struct.pack("<I", 7))
        f.write(struct.pack("<B", int(v)))
    elif isinstance(v, int):
        f.write(struct.pack("<I", 4 if 0 <= v < 2**32 else 11))
        f.write(struct.pack("<I" if 0 <= v < 2**32 else "<q", v))
    elif isinstance(v, float):
        f.write(struct.pack("<I", 6))
        f.write(struct.pack("<f", v))
    elif isinstance(v, (bytes, str)):
        f.write(struct.pack("<I", _T_STRING))
        _w_string(f, v.encode() if isinstance(v, str) else v)
    elif isinstance(v, (list, tuple)):
        f.write(struct.pack("<I", _T_ARRAY))
        if not v or isinstance(v[0], (bytes, str)):
            f.write(struct.pack("<IQ", _T_STRING, len(v)))
            for s in v:
                _w_string(f, s.encode() if isinstance(s, str) else s)
        elif isinstance(v[0], float):
            f.write(struct.pack("<IQ", 6, len(v)))
            f.write(struct.pack(f"<{len(v)}f", *v))
        elif isinstance(v[0], int):
            f.write(struct.pack("<IQ", 5, len(v)))
            f.write(struct.pack(f"<{len(v)}i", *v))
        else:
            raise ValueError(f"unsupported array element {type(v[0])}")
    else:
        raise ValueError(f"unsupported metadata value {type(v)}")


class GgufWriter:
    """Minimal GGUF v3 writer (round-trip tests; GGML->GGUF conversion)."""

    ALIGN = 32

    def __init__(self, f: BinaryIO):
        self.f = f
        self._tensors: list[tuple[str, tuple, GgmlType, bytes]] = []
        self._metadata: dict[str, Any] = {}

    def add_metadata(self, key: str, value: Any) -> None:
        self._metadata[key] = value

    def add_tensor(
        self, name: str, t: GgmlType, dims: tuple, data: bytes
    ) -> None:
        self._tensors.append((name, tuple(dims), t, data))

    def finish(self) -> None:
        f = self.f
        f.write(GGUF_MAGIC)
        md = dict(self._metadata)
        md.setdefault("general.alignment", self.ALIGN)
        f.write(struct.pack("<IQQ", 3, len(self._tensors), len(md)))
        for k, v in md.items():
            _w_string(f, k.encode())
            _w_value(f, v)
        offset = 0
        for name, dims, t, data in self._tensors:
            _w_string(f, name.encode())
            f.write(struct.pack("<I", len(dims)))
            for d in dims:
                f.write(struct.pack("<Q", d))
            f.write(struct.pack("<IQ", int(t), offset))
            offset += (len(data) + self.ALIGN - 1) // self.ALIGN * self.ALIGN
        pad = (-f.tell()) % self.ALIGN
        f.write(b"\x00" * pad)
        for _, _, _, data in self._tensors:
            f.write(data)
            f.write(b"\x00" * ((-len(data)) % self.ALIGN))


def convert_ggml_to_gguf(
    src: str | Path, dst: str | Path, architecture: str = "llama"
) -> None:
    """Convert a classic GGML/GGJT checkpoint into GGUF v3 (llama mapping)."""
    from llm_tpu.ggml.reader import GgmlReader
    from llm_tpu.models.spec import get_arch

    arch_info = get_arch(architecture)
    reader = GgmlReader(src).load(
        lambda f: (lambda h: (h, h.n_vocab))(arch_info.read_hparams(f))
    )
    h = reader.hyperparameters
    reverse = {v: k for k, v in _NAME_MAPS.get(architecture, {}).items()}

    def to_gguf_name(name: str) -> str:
        if name in reverse:
            return reverse[name]
        parts = name.split(".")
        if len(parts) > 2 and parts[0] == "layers" and parts[1].isdigit():
            pattern = f"layers.{{}}.{'.'.join(parts[2:])}"
            if pattern in reverse:
                return reverse[pattern].format(parts[1])
        return name

    with open(dst, "wb") as f:
        w = GgufWriter(f)
        w.add_metadata("general.architecture", architecture)
        w.add_metadata(f"{architecture}.embedding_length", h.n_embd)
        w.add_metadata(f"{architecture}.block_count", h.n_layer)
        w.add_metadata(f"{architecture}.attention.head_count", h.n_head)
        w.add_metadata(
            f"{architecture}.attention.head_count_kv",
            h.n_head_kv or h.n_head,
        )
        w.add_metadata(f"{architecture}.rope.dimension_count", h.n_rot)
        w.add_metadata(f"{architecture}.context_length", h.n_ctx or 2048)
        w.add_metadata("general.file_type", int(h.file_type.format))
        w.add_metadata(
            "tokenizer.ggml.tokens", list(reader.vocabulary.tokens)
        )
        w.add_metadata(
            "tokenizer.ggml.scores",
            [float(s) for s in reader.vocabulary.scores],
        )
        for name, info in reader.tensors.items():
            w.add_tensor(
                to_gguf_name(name),
                info.element_type,
                info.dims,
                bytes(reader.fetch(name)),
            )
        w.finish()
