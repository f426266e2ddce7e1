"""Pre-packed checkpoint cache: skip transcode on repeat loads.

`load()` spends most of its time decoding GGML blocks and re-packing them
into the kernel's K-major device planes (native/codecs.cpp + ops/packing) —
~40 s for a 7B checkpoint. The result is a pure function of (file, packing
knobs), so it can be written to disk ONCE and subsequent loads become
read + host->HBM transfer.

On-disk layout (`<model>.tpupack/` next to the checkpoint):

    manifest.json   version, validity key, recursive tree spec
    a<NNN>.npy      one per array leaf (np.save; mmap-read on load, so
                    bytes stream file -> page cache -> device without an
                    intermediate full-host copy)

The validity key ties the cache to the source file (size + mtime) and every
knob that changes the packed layout (scale packing, launch fusion, GQA
regrouping). A mismatched or corrupt cache is ignored, never trusted.
LoRA-patched loads bypass the cache entirely (patched planes differ).

No reference analog: ggml mmaps its own container directly
(/root/reference/crates/llm-base/src/loader.rs:487) because its compute
format IS the file format; the TPU planes are not, so the cache is the
TPU-native way to get the same load-time economics.
"""

from __future__ import annotations

import json
import os
from dataclasses import fields
from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np

from llm_tpu.models.params import (LayerParams, ModelParams,
                                   _fuse_enabled)
from llm_tpu.ops.packing import QuantTensor, QuantTensorC

VERSION = 2  # v2: signed-nibble q4_0 lo planes
_NODE_TYPES = {"ModelParams": ModelParams, "LayerParams": LayerParams}


def pack_path(model_path) -> Path:
    p = Path(model_path)
    return p.with_name(p.name + ".tpupack")


def cache_key(model_path, n_gqa=None) -> dict:
    st = os.stat(model_path)
    return {
        "version": VERSION,
        "size": st.st_size,
        "mtime_ns": st.st_mtime_ns,
        "scale_pack": os.environ.get("LLM_TPU_SCALE_PACK", ""),
        "fuse": "1" if _fuse_enabled() else "0",
        "coalesce": os.environ.get("LLM_TPU_COALESCE", "1"),
        "coalesce_min_k": os.environ.get("LLM_TPU_COALESCE_MIN_K", ""),
        "n_gqa": n_gqa,
    }


def _save_node(obj, arrays: list, counter: list) -> dict:
    if obj is None:
        return {"t": "none"}
    if isinstance(obj, QuantTensor):
        return {
            "t": "quant",
            "fmt": obj.fmt_name,
            "k": obj.k,
            "r": obj.r,
            "splits": obj.splits,
            "planes": {
                n: _save_node(getattr(obj, n), arrays, counter)
                for n in ("lo", "hi", "scale", "bias")
            },
        }
    if isinstance(obj, QuantTensorC):
        return {
            "t": "quantc",
            "fmt": obj.fmt_name,
            "k": obj.k,
            "r": obj.r,
            "kp": obj.kp,
            "rp": obj.rp,
            "tile_k": obj.tile_k,
            "tile_r": obj.tile_r,
            "scale_packed": obj.scale_packed,
            "splits": obj.splits,
            "buf": _save_node(obj.buf, arrays, counter),
        }
    if isinstance(obj, (ModelParams, LayerParams)):
        return {
            "t": type(obj).__name__,
            "fields": {
                f.name: _save_node(getattr(obj, f.name), arrays, counter)
                for f in fields(obj)
            },
        }
    # array leaf; bfloat16 has no numpy wire format, store its bits
    a = np.asarray(obj)
    spec = {"t": "array", "file": f"a{counter[0]:03d}.npy"}
    counter[0] += 1
    if a.dtype == jnp.bfloat16:
        spec["view"] = "bfloat16"
        a = a.view(np.uint16)
    arrays.append((spec["file"], a))
    return spec


def _array_specs(spec: dict, out: list) -> None:
    """Collect array-leaf specs in manifest (load) order."""
    t = spec["t"]
    if t == "array":
        out.append(spec)
    elif t == "quant":
        for s in spec["planes"].values():
            _array_specs(s, out)
    elif t == "quantc":
        _array_specs(spec["buf"], out)
    elif t in _NODE_TYPES:
        for s in spec["fields"].values():
            _array_specs(s, out)


def _read_leaf(spec: dict, base: Path) -> np.ndarray:
    # Eager read (not mmap): feeding a lazily-faulting memmap to
    # jnp.asarray interleaves 4 KiB page faults with the host->device
    # transfer — measured 89 s for a 3.9 GB pack vs ~31 s for the
    # full COLD load. A sequential np.load hits disk readahead at
    # full rate and hands the transfer a contiguous buffer.
    # LLM_TPU_PACK_MMAP=1 restores the lazy path (memory-constrained
    # hosts).
    mm = "r" if os.environ.get("LLM_TPU_PACK_MMAP") == "1" else None
    a = np.load(base / spec["file"], mmap_mode=mm)
    if spec.get("view") == "bfloat16":
        a = a.view(jnp.bfloat16)
    return a


def _load_node(spec: dict, base: Path, devices: Optional[dict] = None):
    t = spec["t"]
    if t == "none":
        return None
    if t == "array":
        if devices is not None and spec["file"] in devices:
            return devices[spec["file"]]
        return jnp.asarray(_read_leaf(spec, base))
    if t == "quant":
        planes = {
            n: _load_node(s, base, devices)
            for n, s in spec["planes"].items()
        }
        splits = spec["splits"]
        if splits is not None:
            splits = tuple(tuple(s) for s in splits)
        return QuantTensor(spec["fmt"], spec["k"], spec["r"],
                           splits=splits, **planes)
    if t == "quantc":
        splits = spec["splits"]
        if splits is not None:
            splits = tuple(tuple(s) for s in splits)
        return QuantTensorC(
            spec["fmt"], spec["k"], spec["r"], spec["kp"], spec["rp"],
            spec["tile_k"], spec["tile_r"], spec["scale_packed"],
            _load_node(spec["buf"], base, devices), splits,
        )
    cls = _NODE_TYPES[t]
    return cls(**{
        n: _load_node(s, base, devices) for n, s in spec["fields"].items()
    })


def save_packed_params(params: ModelParams, path, key: dict) -> None:
    """Write the packed parameter pytree to `path` (a .tpupack dir).

    The manifest is removed FIRST and re-created (atomically) LAST: an
    interrupted re-pack must leave a manifest-less (= ignored) directory,
    never an old manifest pointing at partially rewritten arrays."""
    base = Path(path)
    base.mkdir(parents=True, exist_ok=True)
    (base / "manifest.json").unlink(missing_ok=True)
    arrays: list = []
    tree = _save_node(params, arrays, [0])
    for fname, a in arrays:
        np.save(base / fname, a)
    manifest = {"version": VERSION, "key": key, "tree": tree}
    tmp = base / "manifest.json.tmp"
    tmp.write_text(json.dumps(manifest))
    tmp.replace(base / "manifest.json")  # atomic: readers see all-or-nothing


def load_packed_params(path, expected_key: dict) -> Optional[ModelParams]:
    """Load the cache if present AND its key matches; None otherwise.

    Disk reads and host->device transfers are PIPELINED: a reader thread
    np.loads the next leaves (bounded queue) while the main thread
    uploads the current one, so wall time approaches
    max(disk read, device transfer) instead of their sum — on the slow
    access tunnel (~90 MB/s uploads) the serial version measured 33 s
    read + 44 s transfer = 77 s for a 3.8 GB pack vs a 64 s cold load
    (BENCH round 3's load_packed regression). LLM_TPU_PACK_PIPELINE=0
    restores the serial path."""
    import queue
    import threading

    base = Path(path)
    try:
        manifest = json.loads((base / "manifest.json").read_text())
        if manifest.get("version") != VERSION:
            return None
        if manifest.get("key") != expected_key:
            return None
        if (os.environ.get("LLM_TPU_PACK_PIPELINE", "1") == "0"
                or os.environ.get("LLM_TPU_PACK_MMAP") == "1"):
            return _load_node(manifest["tree"], base)

        specs: list = []
        _array_specs(manifest["tree"], specs)
        q: "queue.Queue" = queue.Queue(maxsize=2)
        stop = threading.Event()

        def reader():
            try:
                for sp in specs:
                    if stop.is_set():
                        return
                    q.put((sp["file"], _read_leaf(sp, base), None))
            except Exception as e:  # noqa: BLE001 - surfaced by consumer
                q.put((None, None, e))

        th = threading.Thread(target=reader, daemon=True)
        th.start()
        devices: dict = {}
        try:
            for _ in specs:
                fname, host, err = q.get()
                if err is not None:
                    raise err
                devices[fname] = jnp.asarray(host)
        finally:
            # a consumer failure (e.g. device OOM mid-upload) must not
            # leave the reader blocked on the bounded queue pinning
            # GB-scale host buffers and streaming the rest of the pack
            stop.set()
            while not q.empty():
                try:
                    q.get_nowait()
                except queue.Empty:  # racing reader; nothing left
                    break
            th.join(timeout=30)
        return _load_node(manifest["tree"], base, devices)
    except (OSError, ValueError, KeyError, TypeError):
        # any malformed cache (unreadable, bad JSON, structurally wrong
        # tree, missing arrays) falls back to the transcode path
        return None
