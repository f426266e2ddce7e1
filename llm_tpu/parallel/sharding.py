"""Tensor/data parallelism over a jax.sharding.Mesh.

The reference has NO distributed layer (SURVEY.md §2.5): its only scale
mechanism is a CPU thread pool and a vestigial multi-GPU row-split hook
(crates/ggml/src/accelerator/mod.rs:68-77, hardcoded split=1.0). This module
is the TPU-native replacement, designed per the scaling-book recipe: pick a
mesh, annotate weight shardings with NamedSharding, and let XLA's SPMD
partitioner insert the all-gather/reduce-scatter collectives over ICI.

Mesh axes:
    data  — replicates weights, shards the stream batch (continuous batching)
    model — tensor parallelism: attention heads + FFN hidden dim

Sharding rules (Megatron-style, one all-reduce per block):
    wq/wk/wv, w_up/w_gate : output features (R lanes)   -> heads/ffn split
    wo, w_down            : input features (K sublanes) -> partial sums,
                            XLA inserts the psum on the residual add
    lm_head               : vocab (R) split -> logits all-gathered
    norms, biases of reduced outputs : replicated
    KV cache              : sharded over kv heads

QuantTensor planes co-shard: lo/hi/scale/bias all carry R in the last axis
and K-grouped rows in the leading axes, so one PartitionSpec per logical
axis maps onto every plane.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from llm_tpu.models.forward import KVCache, forward_batched
from llm_tpu.models.params import (
    LayerParams,
    ModelParams,
    unfuse_layer_weights,
)
from llm_tpu.ops.packing import QuantTensor


@dataclass(frozen=True)
class MeshConfig:
    data: int = 1
    model: int = 1


def make_mesh(config: Optional[MeshConfig] = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if config is None:
        config = MeshConfig(data=1, model=len(devices))
    n = config.data * config.model
    assert n <= len(devices), (config, len(devices))
    dm = mesh_utils.create_device_mesh(
        (config.data, config.model), devices=devices[:n]
    )
    return Mesh(dm, axis_names=("data", "model"))


def _put(x, mesh: Mesh, spec: P):
    """device_put with per-dimension divisibility fallback: an axis whose
    mesh size does not divide the dim is dropped (replicated) — keeps tiny
    test models working while real shapes shard fully.

    On a multi-process (multi-host) mesh, device_put cannot target
    non-addressable devices; each process instead provides its local shards
    from its own full host copy via make_array_from_callback (every host
    loads the same checkpoint)."""
    if x is None:
        return None
    entries = list(spec) + [None] * (x.ndim - len(spec))
    fixed = []
    for dim, axis in zip(x.shape, entries):
        if axis is not None and dim % mesh.shape[axis] != 0:
            axis = None
        fixed.append(axis)
    ns = NamedSharding(mesh, P(*fixed))
    if jax.process_count() > 1:
        import numpy as np

        host = np.asarray(x)
        return jax.make_array_from_callback(host.shape, ns, lambda idx: host[idx])
    return jax.device_put(x, ns)


def _put_weight(w, mesh: Mesh, axis: Optional[str], shard_r: bool, stacked: bool):
    """Shard a (possibly stacked) weight on its R (lanes) or K (rows) axis.

    Plane layouts (packing.py): lo/hi [.., K/pw, R], scale/bias [.., K/g, R].
    """
    lead = (None,) if stacked else ()

    if w is None:
        return None
    from llm_tpu.ops.packing import QuantTensorC, uncoalesce_qt

    if isinstance(w, QuantTensorC):
        # TP slices planes per head/ffn shard; the coalesced buffer
        # interleaves R tiles, so convert back to the plane layout first
        # (the coalesced form is the single-chip fast path)
        w = uncoalesce_qt(w)
    if isinstance(w, QuantTensor):
        if axis is None:
            spec = P(*lead, None, None)
        elif shard_r:
            spec = P(*lead, None, axis)
        else:
            spec = P(*lead, axis, None)
        return QuantTensor(
            w.fmt_name,
            w.k,
            w.r,
            _put(w.lo, mesh, spec),
            _put(w.hi, mesh, spec),
            _put(w.scale, mesh, spec),
            _put(w.bias, mesh, spec),
        )
    # dense [.., K, R]
    if axis is None:
        spec = P(*lead, None, None)
    elif shard_r:
        spec = P(*lead, None, axis)
    else:
        spec = P(*lead, axis, None)
    return _put(w, mesh, spec)


def _put_vec(v, mesh: Mesh, axis: Optional[str], stacked: bool):
    if v is None:
        return None
    lead = (None,) if stacked else ()
    return _put(v, mesh, P(*lead, axis))


def shard_params(params: ModelParams, mesh: Mesh) -> ModelParams:
    """Apply TP shardings to a loaded parameter pytree (weights move to the
    mesh; XLA SPMD later partitions the compute to match)."""
    ax = "model"
    # TP shards heads / ffn lanes contiguously per device, so the launch-
    # fused q|k|v / gate|up tensors (whose R axis interleaves projections)
    # are split back first (exact plane slicing, fused copies dropped).
    L = unfuse_layer_weights(params.layers)

    layers = LayerParams(
        ln1_w=_put_vec(L.ln1_w, mesh, None, True),
        ln1_b=_put_vec(L.ln1_b, mesh, None, True),
        ln2_w=_put_vec(L.ln2_w, mesh, None, True),
        ln2_b=_put_vec(L.ln2_b, mesh, None, True),
        wq=_put_weight(L.wq, mesh, ax, True, True),
        bq=_put_vec(L.bq, mesh, ax, True),
        wk=_put_weight(L.wk, mesh, ax, True, True),
        bk=_put_vec(L.bk, mesh, ax, True),
        wv=_put_weight(L.wv, mesh, ax, True, True),
        bv=_put_vec(L.bv, mesh, ax, True),
        wo=_put_weight(L.wo, mesh, ax, False, True),
        bo=_put_vec(L.bo, mesh, None, True),
        w_gate=_put_weight(L.w_gate, mesh, ax, True, True),
        w_up=_put_weight(L.w_up, mesh, ax, True, True),
        b_up=_put_vec(L.b_up, mesh, ax, True),
        w_down=_put_weight(L.w_down, mesh, ax, False, True),
        b_down=_put_vec(L.b_down, mesh, None, True),
    )
    return ModelParams(
        wte=_put_weight(params.wte, mesh, None, True, False),
        wpe=_put_weight(params.wpe, mesh, None, True, False),
        emb_norm_w=_put_vec(params.emb_norm_w, mesh, None, False),
        emb_norm_b=_put_vec(params.emb_norm_b, mesh, None, False),
        final_norm_w=_put_vec(params.final_norm_w, mesh, None, False),
        final_norm_b=_put_vec(params.final_norm_b, mesh, None, False),
        lm_head=_put_weight(params.lm_head, mesh, ax, True, False),
        lm_head_b=_put_vec(params.lm_head_b, mesh, ax, False),
        layers=layers,
    )


def shard_cache(cache: KVCache, mesh: Mesh, batched: bool = False) -> KVCache:
    """KV cache sharded over kv heads (TP). Batched caches are layer-major
    HEAD-MAJOR [L, B, H_kv, S, D] (models/forward.py init_cache_batched);
    the stream batch axis rides `data`."""
    if batched:
        spec = P(None, "data", "model", None, None)
        sspec = P(None, "data", "model", None)
    else:
        spec = P(None, None, "model", None)
        sspec = P(None, None, "model")
    return KVCache(
        k=_put(cache.k, mesh, spec),
        v=_put(cache.v, mesh, spec),
        k_scale=_put(cache.k_scale, mesh, sspec),
        v_scale=_put(cache.v_scale, mesh, sspec),
    )


@partial(jax.jit, static_argnums=(0,), donate_argnums=(4,))
def batched_forward_step(spec, params, ids, n_past, cache):
    """Data-parallel decode over (ids [B, T], n_past [B], cache [B, ...]).

    Uses the natively-batched forward (projections as single [B*T, E]
    matmuls — NOT a vmap over the Pallas kernel); weights stay replicated
    over `data` and TP-sharded over `model`, the batch rides `data`.
    """
    return forward_batched(spec, params, ids, n_past, cache)
