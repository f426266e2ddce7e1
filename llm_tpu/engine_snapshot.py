"""Serving-engine checkpoint/resume: pause a continuous-batching engine
mid-flight and restore it, KV state and all, in a new process.

The reference persists single-session inference state (tokens + raw KV
bytes, binaries/llm-cli/src/snapshot.rs:15,47-62); llm_tpu/snapshot.py is
that surface. This module extends the idea to the SERVING layer — the
aux-subsystem SURVEY §5 names for the TPU build ("serialize sharded paged
KV + stream state per host"): the whole Engine/PagedEngine — page pool or
dense slot cache, page tables, allocator free list, prefix cache, every
in-flight stream's tokens / sampler state (mirostat mu included) / RNG /
UTF-8 buffer / chunked-prefill cursor, and the pending queue — round-trips
through one file. Draining is NOT required: a stream checkpointed halfway
through its prompt resumes at the same chunk boundary.

Format mirrors the session snapshot: MAGIC + version + JSON header +
concatenated raw array bytes, zstd/zlib-compressed (pickle-free — the
header is inspectable and the format has no code-execution surface).

Callbacks (`GenerationRequest.on_token`) are process-local and are NOT
serialized; `read_engine(..., on_token=...)` re-attaches one.
Engines under a TP mesh restore through `jax.device_put` onto the fresh
engine's shardings, so a checkpoint taken on one mesh layout can resume
on another (pages are host-gathered into the file either way).

Multi-host engines (MultiHostEngine / MultiHostPagedEngine) checkpoint
PER HOST: every process calls `write_engine` with its own path and saves
exactly its addressable slice of the global KV (its `data`-shard rows /
its local page pool) plus its host-local streams, tables, and allocator
— no collective, no cross-host traffic. Restore runs on the same process
layout (same process_count/index, global_streams, TP head split): each
host reads its own file and the global arrays are reassembled with
`jax.make_array_from_callback` from purely local blocks.
"""

from __future__ import annotations

import dataclasses
import json
import struct
from pathlib import Path
from typing import Callable, Optional

import numpy as np

from llm_tpu.session import SnapshotError


def _decompress(data: bytes, codec: str) -> bytes:
    """Streaming-frame decompress (the writer uses compressobj, whose zstd
    frames carry no content-size header, so the one-shot decompressor in
    snapshot.py cannot read them)."""
    if codec == "zstd":
        import zstandard

        return zstandard.ZstdDecompressor().decompressobj().decompress(data)
    import zlib

    return zlib.decompress(data)

MAGIC = b"LTEN"
VERSION = 1


# ---------------------------------------------------------------------------
# sampler (de)serialization — the built-in samplers are flat dataclasses
# (including mutable state like mirostat's mu), so a name + field dict
# round-trips them exactly; custom classes are rejected with a clear error.


def _sampler_spec(s) -> Optional[dict]:
    import llm_tpu.samplers as S
    from llm_tpu.ops.sampling import BatchedDeviceSampler, DeviceSampler

    if s is None:
        return None
    if isinstance(s, S.SamplerChain):
        return {
            "kind": "chain",
            "transforms": [_sampler_spec(t) for t in s.transforms],
            "terminal": _sampler_spec(s.terminal),
        }
    if isinstance(s, (S.GreedySampler, S.DeterministicSampler)):
        return {"kind": "host", "cls": type(s).__name__, "kw": {}}
    if isinstance(s, DeviceSampler):
        return {"kind": "device", "kw": dataclasses.asdict(s)}
    if isinstance(s, BatchedDeviceSampler):
        raise SnapshotError(
            "BatchedDeviceSampler is derived per-dispatch; checkpoint the "
            "per-stream DeviceSamplers instead"
        )
    # identity, not name: a user-defined dataclass that happens to shadow a
    # built-in's name must be REJECTED, not silently restored as the
    # built-in with different semantics
    if dataclasses.is_dataclass(s) and type(s) is getattr(
        S, type(s).__name__, None
    ):
        return {"kind": "host", "cls": type(s).__name__,
                "kw": dataclasses.asdict(s)}
    raise SnapshotError(
        f"sampler {type(s).__name__} is not checkpointable (not a built-in "
        "sampler dataclass); retire the stream or swap its sampler first"
    )


def _sampler_from(spec: Optional[dict]):
    import llm_tpu.samplers as S
    from llm_tpu.ops.sampling import DeviceSampler

    if spec is None:
        return None
    if spec["kind"] == "chain":
        return S.SamplerChain(
            [_sampler_from(t) for t in spec["transforms"]],
            _sampler_from(spec["terminal"]),
        )
    if spec["kind"] == "device":
        kw = dict(spec["kw"])
        kw["bias"] = tuple((int(t), float(b)) for t, b in kw.get("bias", ()))
        if "top_a" in kw:  # JSON round-trips tuples as lists; must rehash
            kw["top_a"] = tuple(float(a) for a in kw["top_a"])
        return DeviceSampler(**kw)
    cls = getattr(S, spec["cls"])
    return cls(**spec["kw"])


# ---------------------------------------------------------------------------
# stream (de)serialization


def _dump_prompt(p):
    from llm_tpu.tokenizer import Prompt

    if isinstance(p, str):
        return {"text": p}
    if isinstance(p, Prompt):
        return {"text": p.text} if p.text is not None else {
            "tokens": [int(t) for t in (p.tokens or [])]
        }
    return {"tokens": [int(t) for t in p]}


def _load_prompt(d):
    return d["text"] if "text" in d else d["tokens"]


def _dump_stream(s, slot: Optional[int], arrays: dict) -> dict:
    req = s.request
    d = {
        "slot": slot,
        "request_id": s.request_id,
        "prompt": _dump_prompt(req.prompt),
        "max_tokens": req.max_tokens,
        "seed": req.seed,
        "logprobs": req.logprobs,
        "sampler": _sampler_spec(s.sampler),
        "device_sampler": _sampler_spec(req.device_sampler),
        "rng": s.rng.bit_generator.state,
        "tokens": [int(t) for t in s.tokens],
        "generated": s.generated,
        "n_past": s.n_past,
        "utf8": s.utf8.buffer.hex(),
        "decoded_len": s.decoded_len,
        "text": list(s.text),
        "logprob_data": s.logprob_data,
        "prefilling": s.prefilling,
        "prefill_pos": s.prefill_pos,
        "prefill_queue": (
            [int(t) for t in s.prefill_queue]
            if s.prefill_queue is not None
            else None
        ),
        "kv_wait": s.kv_wait,
        # device-mirostat mu carry (the one piece of device-sampler state
        # not reconstructible from token history)
        "mirostat_mu": s.mirostat_mu,
    }
    if s.last_logits is not None:
        arrays[f"stream{s.request_id}.last_logits"] = np.asarray(
            s.last_logits, np.float32
        )
        d["has_logits"] = True
    return d


def _load_stream(d: dict, arrays: dict, on_token):
    from llm_tpu.serve import GenerationRequest, _Stream
    from llm_tpu.tokenizer import TokenUtf8Buffer

    req = GenerationRequest(
        prompt=_load_prompt(d["prompt"]),
        max_tokens=d["max_tokens"],
        sampler=None,  # the live (possibly stateful) copy sits on the stream
        seed=d["seed"],
        on_token=on_token,
        device_sampler=_sampler_from(d["device_sampler"]),
        logprobs=d["logprobs"],
    )
    rng = np.random.default_rng(d["seed"])
    rng.bit_generator.state = d["rng"]
    s = _Stream(
        request_id=d["request_id"],
        request=req,
        sampler=_sampler_from(d["sampler"]),
        rng=rng,
        tokens=list(d["tokens"]),
        generated=d["generated"],
        n_past=d["n_past"],
        last_logits=(
            # copy: frombuffer views of the payload are read-only
            arrays[f"stream{d['request_id']}.last_logits"].copy()
            if d.get("has_logits")
            else None
        ),
        utf8=TokenUtf8Buffer(bytearray(bytes.fromhex(d["utf8"]))),
        decoded_len=d["decoded_len"],
        text=list(d["text"]),
        logprob_data=list(d["logprob_data"]),
        prefilling=d["prefilling"],
        prefill_pos=d["prefill_pos"],
        prefill_queue=(
            list(d["prefill_queue"]) if d["prefill_queue"] is not None else None
        ),
        kv_wait=d["kv_wait"],
        mirostat_mu=d.get("mirostat_mu"),  # absent in pre-r4 checkpoints
    )
    req.sampler = s.sampler
    return s


# ---------------------------------------------------------------------------
# engine (de)serialization


def _kv_arrays(engine) -> dict:
    from llm_tpu.paged import PagedEngine

    out = {}
    if isinstance(engine, PagedEngine) or _is_mh_paged(engine):
        pool = engine.pool
        out["pool.k"], out["pool.v"] = pool.k, pool.v
        if pool.quantized:
            out["pool.k_scale"], out["pool.v_scale"] = (
                pool.k_scale, pool.v_scale,
            )
    else:
        c = engine.cache
        out["cache.k"], out["cache.v"] = c.k, c.v
        if c.k_scale is not None:
            out["cache.k_scale"], out["cache.v_scale"] = c.k_scale, c.v_scale
    d = getattr(engine, "d_cache", None)  # speculative engines: draft KV
    if d is not None:
        out["d_cache.k"], out["d_cache.v"] = d.k, d.v
        if d.k_scale is not None:
            out["d_cache.k_scale"], out["d_cache.v_scale"] = (
                d.k_scale, d.v_scale,
            )
    return out


def _is_mh(engine) -> bool:
    from llm_tpu.parallel.multihost import MultiHostEngine

    return isinstance(engine, MultiHostEngine)


def _is_mh_paged(engine) -> bool:
    from llm_tpu.parallel.multihost import MultiHostPagedEngine

    return isinstance(engine, MultiHostPagedEngine)


# -- multi-host local-block plumbing: each host saves/restores exactly its
# addressable slice of the global KV along the `data`-sharded axis (axis 1
# for both the batched dense cache [L, B, S, H, D] and the page pool
# [L, P, H, page, D]). Other axes may be TP-sharded over `model`, which is
# intra-host, so the host's shards cover them fully.

_MH_AXIS = 1


def _addressable_extent(arr) -> tuple[int, int]:
    starts, stops = [], []
    for sh in arr.addressable_shards:
        s = sh.index[_MH_AXIS]
        starts.append(s.start or 0)
        stops.append(s.stop if s.stop is not None else arr.shape[_MH_AXIS])
    return min(starts), max(stops) - min(starts)


def _local_block(arr) -> "np.ndarray":
    """Assemble this host's contiguous addressable block along _MH_AXIS."""
    start, size = _addressable_extent(arr)
    shape = list(arr.shape)
    shape[_MH_AXIS] = size
    out = np.zeros(shape, arr.dtype)
    covered = np.zeros(size, bool)
    for sh in arr.addressable_shards:
        idx = list(sh.index)
        s = idx[_MH_AXIS]
        s0 = s.start or 0
        s1 = s.stop if s.stop is not None else arr.shape[_MH_AXIS]
        idx[_MH_AXIS] = slice(s0 - start, s1 - start)
        out[tuple(idx)] = np.asarray(sh.data)
        covered[s0 - start: s1 - start] = True
    if not covered.all():
        raise SnapshotError("non-contiguous addressable KV shards")
    return out


def _make_global(target, block: "np.ndarray"):
    """Rebuild a global array shaped/sharded like `target` from this host's
    local block (every host calls this with its own block; the callback is
    only consulted for locally-addressable shards)."""
    import jax

    start, size = _addressable_extent(target)
    if block.shape[_MH_AXIS] != size or str(block.dtype) != str(target.dtype):
        raise SnapshotError(
            f"checkpoint block {block.dtype}{list(block.shape)} does not "
            f"match engine shard {target.dtype} extent {size}"
        )

    def cb(index):
        idx = list(index)
        s = idx[_MH_AXIS]
        s0 = s.start or 0
        s1 = s.stop if s.stop is not None else target.shape[_MH_AXIS]
        idx[_MH_AXIS] = slice(s0 - start, s1 - start)
        return block[tuple(idx)]

    return jax.make_array_from_callback(target.shape, target.sharding, cb)


def _spec_fingerprint(spec) -> dict:
    return {
        "arch": spec.arch,
        "n_vocab": spec.n_vocab,
        "n_embd": spec.n_embd,
        "n_head": spec.n_head,
        "n_head_kv": spec.n_head_kv,
        "n_layer": spec.n_layer,
        "n_ctx": spec.n_ctx,
    }


_SPEC_ENGINES = (
    "SpeculativeEngine", "SampledSpeculativeEngine",
    "PagedSpeculativeEngine", "PagedSampledSpeculativeEngine",
)


def _engine_kind(engine) -> str:
    from llm_tpu.paged import PagedEngine

    if type(engine).__name__ in _SPEC_ENGINES:
        return type(engine).__name__
    if _is_mh_paged(engine):
        return "MultiHostPagedEngine"
    if _is_mh(engine):
        return "MultiHostEngine"
    if isinstance(engine, PagedEngine):
        return "PagedEngine"
    return "Engine"


def write_engine(engine, path: str | Path) -> None:
    """Checkpoint a (quiesced) engine: call between step()s. Multi-host
    engines checkpoint per host — every process calls this with its OWN
    path (no collective)."""
    from llm_tpu.paged import PagedEngine
    from llm_tpu.serve import Engine

    if not isinstance(engine, (Engine, PagedEngine)):
        raise SnapshotError(f"cannot checkpoint {type(engine).__name__}")
    if engine._retired_events:
        raise SnapshotError(
            "undrained retirement events; finish the current step first"
        )

    multihost = _is_mh(engine)
    raw = _kv_arrays(engine)
    arrays = (
        {n: _local_block(a) for n, a in raw.items()} if multihost else raw
    )
    streams = []
    for slot, s in enumerate(engine.slots):
        if s is not None:
            streams.append(_dump_stream(s, slot, arrays))
    for s in engine.pending:
        streams.append(_dump_stream(s, None, arrays))

    header = {
        "engine": _engine_kind(engine),
        "spec": _spec_fingerprint(engine.spec),
        "max_streams": engine.max_streams,
        "n_batch": engine.n_batch,
        "next_id": engine._next_id,
        "streams": streams,
    }
    loop_key = getattr(engine, "_loop_key", None)
    if loop_key is not None:
        header["loop_key"] = np.asarray(loop_key).tolist()
    if hasattr(engine, "d_cache"):  # speculative family
        sp = {
            "k": engine.k,
            "draft_spec": _spec_fingerprint(engine.draft.spec),
            "accepted": engine.accepted,
            "drafted": engine.drafted,
        }
        if getattr(engine, "_key", None) is not None:
            sp["key"] = np.asarray(engine._key).tolist()
        header["speculative"] = sp
    if multihost:
        import jax

        header["multihost"] = {
            "process_index": jax.process_index(),
            "process_count": jax.process_count(),
            "row0": engine._row0,
            "global_streams": engine.global_streams,
            "steps": engine._steps,
        }
    if _is_mh_paged(engine):
        header["paged"] = {
            "page_size": engine.page_size,
            "n_pages": engine.pool.n_pages,
            "tables": engine.tables.tolist(),
            "stream_pages": [
                [int(p) for p in pages] for pages in engine.stream_pages
            ],
            "free": list(engine.allocator.free),
            "prefix": None,
        }
    elif isinstance(engine, PagedEngine):
        pc = engine.prefix_cache
        header["paged"] = {
            "page_size": engine.page_size,
            "n_pages": engine.pool.n_pages,
            "tables": engine.tables.tolist(),
            "stream_pages": [
                [int(p) for p in pages] for pages in engine.stream_pages
            ],
            "free": list(engine.allocator.free),
            "prefix": (
                {
                    "by_key": [
                        [k.hex(), pid] for k, pid in pc.by_key.items()
                    ],
                    "refs": {str(pid): n for pid, n in pc.refs.items()},
                    "lru": list(pc.lru),
                    # exact-hit logits rows ride the binary payload (V
                    # floats each); order in the list IS the LRU order
                    "logits_keys": [k.hex() for k in pc.logits_by_key],
                }
                if pc is not None
                else None
            ),
        }
        if pc is not None:
            for k, row in pc.logits_by_key.items():
                arrays[f"prefix_logits.{k.hex()}"] = np.asarray(
                    row, np.float32
                )

    names = sorted(arrays)
    header["arrays"] = [
        {"name": n, "dtype": str(arrays[n].dtype),
         "shape": list(arrays[n].shape)}
        for n in names
    ]
    hb = json.dumps(header).encode()

    # Atomic + streaming: write into a sibling temp file and os.replace()
    # so a crash mid-write never destroys the previous good checkpoint,
    # and compress one array at a time so peak host memory is one plane
    # (not the whole pool twice).
    import os
    import zlib

    try:
        import zstandard

        comp = zstandard.ZstdCompressor(level=1).compressobj()
        codec_byte = 1
    except ImportError:
        comp = zlib.compressobj(1)
        codec_byte = 0
    tmp = f"{path}.tmp.{os.getpid()}"
    try:
        with open(tmp, "wb") as f:
            f.write(MAGIC)
            f.write(struct.pack("<I", VERSION))
            f.write(struct.pack("<B", codec_byte))
            f.write(struct.pack("<I", len(hb)))
            f.write(hb)
            for n in names:
                a = np.ascontiguousarray(np.asarray(arrays[n]))
                out = comp.compress(a.reshape(-1).view(np.uint8).data)
                if out:
                    f.write(out)
                del a
            f.write(comp.flush())
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def read_engine(
    engine,
    path: str | Path,
    on_token: Optional[Callable[[int, str], None]] = None,
) -> None:
    """Restore a checkpoint INTO a freshly constructed compatible engine
    (same model geometry, engine class, max_streams, and — for paged —
    page_size/n_pages). `on_token` is re-attached to every restored stream
    (callbacks are process-local and never serialized).

    EVERY malformed-checkpoint failure surfaces as SnapshotError: a
    header that parses as JSON but lacks an expected field (older build,
    hand edit) used to raise raw KeyError past LlmServer's quarantine
    try and brick startup instead of serving fresh."""
    try:
        return _read_engine_impl(engine, path, on_token)
    except SnapshotError:
        raise
    except (KeyError, IndexError, TypeError, ValueError) as e:
        raise SnapshotError(
            f"malformed engine checkpoint {path}: "
            f"{type(e).__name__}: {e}"
        ) from e


def _read_engine_impl(
    engine,
    path: str | Path,
    on_token: Optional[Callable[[int, str], None]] = None,
) -> None:
    import jax

    from llm_tpu.paged import PagedEngine, PagedKVCache
    from llm_tpu.serve import KVCache

    try:
        with open(path, "rb") as f:
            if f.read(4) != MAGIC:
                raise SnapshotError(f"{path} is not an engine checkpoint")
            (version,) = struct.unpack("<I", f.read(4))
            if version != VERSION:
                raise SnapshotError(
                    f"unsupported engine checkpoint v{version}"
                )
            (codec_byte,) = struct.unpack("<B", f.read(1))
            (hlen,) = struct.unpack("<I", f.read(4))
            header = json.loads(f.read(hlen))
            payload = _decompress(f.read(), "zstd" if codec_byte else "zlib")
    except SnapshotError:
        raise
    except Exception as e:  # truncated/corrupt file: struct, json, zstd/
        # zlib errors all mean the same thing to the caller
        raise SnapshotError(f"corrupt engine checkpoint {path}: {e}") from e

    want_cls = header["engine"]
    is_paged = isinstance(engine, PagedEngine) or _is_mh_paged(engine)
    multihost = _is_mh(engine)
    if _engine_kind(engine) != want_cls:
        raise SnapshotError(
            f"checkpoint is for {want_cls}, got {type(engine).__name__}"
        )
    if multihost:
        mh = header["multihost"]
        got = {
            "process_index": jax.process_index(),
            "process_count": jax.process_count(),
            "row0": engine._row0,
            "global_streams": engine.global_streams,
        }
        want = {k: mh[k] for k in got}
        if got != want:
            raise SnapshotError(
                f"process layout mismatch: checkpoint {want}, engine {got}"
            )
    if _spec_fingerprint(engine.spec) != header["spec"]:
        raise SnapshotError(
            f"model geometry mismatch: checkpoint {header['spec']}, "
            f"engine {_spec_fingerprint(engine.spec)}"
        )
    if engine.max_streams != header["max_streams"]:
        raise SnapshotError(
            f"max_streams mismatch: checkpoint {header['max_streams']}, "
            f"engine {engine.max_streams}"
        )

    arrays = {}
    off = 0
    for meta in header["arrays"]:
        a = np.frombuffer(
            payload, dtype=np.dtype(meta["dtype"]), offset=off,
            count=int(np.prod(meta["shape"], dtype=np.int64)),
        ).reshape(meta["shape"])
        off += a.nbytes
        arrays[meta["name"]] = a

    def put(name: str, target):
        a = arrays[name]
        if multihost:
            # per-host file: `a` is this host's local block of the global
            # array; reassemble in place from purely local data
            return _make_global(target, a)
        if a.shape != target.shape or str(a.dtype) != str(target.dtype):
            raise SnapshotError(
                f"{name}: checkpoint {a.dtype}{list(a.shape)} does not match "
                f"engine {target.dtype}{list(target.shape)}"
            )
        return jax.device_put(a, target.sharding)

    # ---- phase 1: validate everything and BUILD all new state without
    # touching the engine, so a SnapshotError leaves it exactly as
    # constructed (no half-restored allocator/pool/stream mix)
    import jax.numpy as jnp

    new: dict = {}
    if "loop_key" in header:
        new["_loop_key"] = jnp.asarray(header["loop_key"], jnp.uint32)

    if "speculative" in header:
        sp = header["speculative"]
        if sp["draft_spec"] != _spec_fingerprint(engine.draft.spec):
            raise SnapshotError(
                f"draft geometry mismatch: checkpoint {sp['draft_spec']}, "
                f"engine {_spec_fingerprint(engine.draft.spec)}"
            )
        if sp["k"] != engine.k:
            raise SnapshotError(
                f"draft k mismatch: checkpoint {sp['k']}, engine {engine.k}"
            )
        quant = "d_cache.k_scale" in arrays
        if quant != (engine.d_cache.k_scale is not None):
            raise SnapshotError("draft KV dtype mismatch")
        new["d_cache"] = KVCache(
            put("d_cache.k", engine.d_cache.k),
            put("d_cache.v", engine.d_cache.v),
            put("d_cache.k_scale", engine.d_cache.k_scale) if quant else None,
            put("d_cache.v_scale", engine.d_cache.v_scale) if quant else None,
        )
        new["accepted"] = sp["accepted"]
        new["drafted"] = sp["drafted"]
        if "key" in sp:
            new["_key"] = jnp.asarray(sp["key"], jnp.uint32)

    prefix_state = None
    if is_paged:
        p = header["paged"]
        if (engine.page_size, engine.pool.n_pages) != (
            p["page_size"], p["n_pages"],
        ):
            raise SnapshotError(
                f"page geometry mismatch: checkpoint "
                f"{p['page_size']}x{p['n_pages']}, engine "
                f"{engine.page_size}x{engine.pool.n_pages}"
            )
        quant = "pool.k_scale" in arrays
        if quant != engine.pool.quantized:
            raise SnapshotError("KV dtype mismatch (int8 vs dense pool)")
        if p["prefix"] is not None and engine.prefix_cache is None:
            raise SnapshotError(
                "checkpoint has a prefix cache; construct the engine "
                "with prefix_cache=True"
            )
        new["pool"] = PagedKVCache(
            put("pool.k", engine.pool.k),
            put("pool.v", engine.pool.v),
            put("pool.k_scale", engine.pool.k_scale) if quant else None,
            put("pool.v_scale", engine.pool.v_scale) if quant else None,
        )
        new["tables"] = np.asarray(p["tables"], np.int32)
        new["stream_pages"] = [list(x) for x in p["stream_pages"]]
        if p["prefix"] is not None:
            prefix_state = {
                "by_key": {
                    bytes.fromhex(k): pid for k, pid in p["prefix"]["by_key"]
                },
                "refs": {
                    int(pid): n for pid, n in p["prefix"]["refs"].items()
                },
                "lru": {int(pid): None for pid in p["prefix"]["lru"]},
                # list order restores the LRU order (insertion-ordered)
                "logits": {
                    bytes.fromhex(k): arrays[f"prefix_logits.{k}"].copy()
                    for k in p["prefix"].get("logits_keys", ())
                },
            }
    else:
        quant = "cache.k_scale" in arrays
        if quant != (engine.cache.k_scale is not None):
            raise SnapshotError("KV dtype mismatch (int8 vs dense cache)")
        new["cache"] = KVCache(
            put("cache.k", engine.cache.k),
            put("cache.v", engine.cache.v),
            put("cache.k_scale", engine.cache.k_scale) if quant else None,
            put("cache.v_scale", engine.cache.v_scale) if quant else None,
        )

    slots = [None] * engine.max_streams
    pending = []
    for d in header["streams"]:
        s = _load_stream(d, arrays, on_token)
        if d["slot"] is None:
            pending.append(s)
        else:
            slots[d["slot"]] = s

    # ---- phase 2: commit
    if multihost:
        engine._steps = header["multihost"]["steps"]
    for attr, val in new.items():
        setattr(engine, attr, val)
    if is_paged:
        engine.allocator.free = list(header["paged"]["free"])
        if prefix_state is not None:
            pc = engine.prefix_cache
            pc.by_key = prefix_state["by_key"]
            pc.key_of = {pid: k for k, pid in pc.by_key.items()}
            pc.refs = prefix_state["refs"]
            pc.lru = prefix_state["lru"]
            pc.logits_by_key = prefix_state["logits"]
        elif getattr(engine, "prefix_cache", None) is not None:
            # checkpoint carries no prefix state: leave nothing stale
            engine.prefix_cache = type(engine.prefix_cache)()

    engine.slots = slots
    engine.pending = pending
    engine.finished = {}
    engine._retired_events = []
    engine._next_id = header["next_id"]
