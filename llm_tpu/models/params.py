"""Canonical model parameters: one weight layout for all seven architectures.

The reference keeps each architecture's idiosyncratic tensor layout (fused vs
split QKV, interleaved heads, etc.) and encodes the difference in each crate's
`evaluate()` graph builder. TPU-first we instead normalize *at load time*:
fused QKV tensors are split into canonical q/k/v by logical-row selection on
the decoded quant blocks (quant blocks span only the K axis, so row selection
is exact — no requantization), and every model becomes the same pytree:

    ModelParams
      wte [E, V]  (quantized or dense, K-major)
      wpe (gpt2), emb_norm (bloom), final_norm, lm_head (None = tied to wte)
      layers: LayerParams stacked along a leading n_layer axis (lax.scan-able)

QKV packing evidence per arch:
- gpt2/bloom/mpt: contiguous thirds (gpt2/src/lib.rs:192-195,
  bloom/src/lib.rs:167-185, mpt/src/lib.rs:135-137)
- gptneox: per-head interleave [q k v] x n_head, stride 3*head_dim
  (gptneox/src/lib.rs:206-223)
- falcon: [q x n_head, k x n_head_kv, v x n_head_kv] contiguous
  (falcon/src/lib.rs:220-241)
- llama/gptj: already split (llama/src/lib.rs:69-76, gptj/src/lib.rs:79-87)
"""

from __future__ import annotations

from dataclasses import dataclass, fields
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from llm_tpu.ggml.quant import dequantize
from llm_tpu.ggml.reader import GgmlReader, TensorInfo
from llm_tpu.models.spec import ModelSpec
from llm_tpu.ops.packing import QuantTensor, pack_ggml

Weight = Union[QuantTensor, jnp.ndarray]


def _register(cls):
    """Register a dataclass whose every field is a child (possibly None)."""

    def flatten(obj):
        names = [f.name for f in fields(obj)]
        return tuple(getattr(obj, n) for n in names), tuple(names)

    def unflatten(aux, children):
        return cls(**dict(zip(aux, children)))

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@_register
@dataclass
class LayerParams:
    """One decoder layer, canonical form. All matrices K-major [in, out]."""

    ln1_w: jnp.ndarray
    ln1_b: Optional[jnp.ndarray]
    ln2_w: Optional[jnp.ndarray]  # None: parallel_shared_ln archs
    ln2_b: Optional[jnp.ndarray]
    wq: Weight
    bq: Optional[jnp.ndarray]
    wk: Weight
    bk: Optional[jnp.ndarray]
    wv: Weight
    bv: Optional[jnp.ndarray]
    wo: Weight
    bo: Optional[jnp.ndarray]
    w_gate: Optional[Weight]  # swiglu only (llama w1)
    w_up: Weight  # llama w3 / c_fc / dense_h_to_4h / up_proj
    b_up: Optional[jnp.ndarray]
    w_down: Weight
    b_down: Optional[jnp.ndarray]
    # Launch-fused duplicates built by fuse_layer_weights (decode runs one
    # kernel for q|k|v and one for gate|up). None when formats don't fuse,
    # when fusion is disabled, or after shard_params (TP keeps split weights
    # so head/ffn shardings stay contiguous per device).
    w_qkv: Optional[Weight] = None
    w_gate_up: Optional[Weight] = None


@_register
@dataclass
class ModelParams:
    wte: Weight  # [E, V]
    wpe: Optional[Weight]  # [E, n_ctx_train] (gpt2)
    emb_norm_w: Optional[jnp.ndarray]  # bloom post-embedding LN
    emb_norm_b: Optional[jnp.ndarray]
    final_norm_w: jnp.ndarray
    final_norm_b: Optional[jnp.ndarray]
    lm_head: Optional[Weight]  # None => tied to wte
    lm_head_b: Optional[jnp.ndarray]  # gptj
    layers: LayerParams  # stacked: every leaf has leading n_layer axis


def fuse_layer_weights(layers: LayerParams) -> LayerParams:
    """Replace q/k/v (and gate/up) with launch-fused tensors: one Pallas
    call computes all three projections, which matters most on small models
    where per-launch overhead — not HBM bandwidth — bounds decode. The
    split tensors are DROPPED (not duplicated in HBM); shard_params
    reconstructs them exactly via unfuse_quant when TP needs the per-head
    layout. No reference analog: ggml pays per-op graph-node overhead
    either way; this is a TPU kernel-launch economy."""
    import dataclasses

    from llm_tpu.ops.packing import fuse_quant

    kw = {}
    qkv = fuse_quant([layers.wq, layers.wk, layers.wv])
    if qkv is not None:
        kw.update(w_qkv=qkv, wq=None, wk=None, wv=None)
    if layers.w_gate is not None:
        gate_up = fuse_quant([layers.w_gate, layers.w_up])
        if gate_up is not None:
            kw.update(w_gate_up=gate_up, w_gate=None, w_up=None)
    if not kw:
        return layers
    return dataclasses.replace(layers, **kw)


def unfuse_layer_weights(layers: LayerParams) -> LayerParams:
    """Undo fuse_layer_weights (exact plane slicing)."""
    import dataclasses

    from llm_tpu.ops.packing import unfuse_quant

    kw = {}
    if layers.w_qkv is not None:
        wq, wk, wv = unfuse_quant(layers.w_qkv)
        kw.update(wq=wq, wk=wk, wv=wv, w_qkv=None)
    if layers.w_gate_up is not None:
        w_gate, w_up = unfuse_quant(layers.w_gate_up)
        kw.update(w_gate=w_gate, w_up=w_up, w_gate_up=None)
    if not kw:
        return layers
    return dataclasses.replace(layers, **kw)


_W_FIELDS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
             "w_qkv", "w_gate_up")


def _dense_upcast_max_bytes() -> int:
    """Size gate for the small-model dense-upcast path, in packed bytes.

    LLM_TPU_DENSE_UPCAST: "0" (default) off, "1" always, "auto" —
    upcast models whose total packed weight bytes fit under
    LLM_TPU_DENSE_UPCAST_MAX_MB (default 256).

    Default OFF: the round-5 chip A/B (scripts/probe_gpt2_dense.py,
    docs/probes/round5/gpt2_dense_upcast.log) measured dense-upcast
    EQUAL to the quantized kernel at GPT-2 117M geometry (1367 vs 1370
    tok/s) — per-kernel dispatch (~11 us x ~50 sequential ops/step on
    this virtualized chip) binds small-model decode identically on both
    paths, so doubling HBM bytes buys nothing here. The knob stays for
    hardware where the per-op:bandwidth ratio differs."""
    import os

    v = os.environ.get("LLM_TPU_DENSE_UPCAST", "0")
    if v == "0":
        return 0
    if v == "1":
        return 1 << 62
    return int(os.environ.get("LLM_TPU_DENSE_UPCAST_MAX_MB", "256")) << 20


def _packed_bytes(w) -> int:
    if isinstance(w, QuantTensor):
        n = w.lo.nbytes + w.scale.nbytes
        if w.hi is not None:
            n += w.hi.nbytes
        if w.bias is not None:
            n += w.bias.nbytes
        return n
    if hasattr(w, "buf"):  # QuantTensorC
        return w.buf.nbytes
    return getattr(w, "nbytes", 0)


def _upcast_weight(w, dtype):
    """One quantized weight (possibly layer-stacked) -> dense [L?, K, R]."""
    import dataclasses as _dc

    from llm_tpu.ops.packing import QuantTensorC, dequant_c_jnp, dequant_jnp

    if isinstance(w, QuantTensorC):
        if w.buf.ndim == 3:  # stacked [L, ...]
            return jnp.stack([
                dequant_c_jnp(w, dtype, buf=w.buf[i])
                for i in range(w.buf.shape[0])
            ])
        return dequant_c_jnp(w, dtype)
    if isinstance(w, QuantTensor):
        stacked = w.scale.ndim == 3
        if not stacked:
            return dequant_jnp(w, dtype)
        layers = []
        for i in range(w.scale.shape[0]):
            sl = QuantTensor(
                w.fmt_name, w.k, w.r, w.lo[i],
                w.hi[i] if w.hi is not None else None,
                w.scale[i],
                w.bias[i] if w.bias is not None else None,
            )
            layers.append(dequant_jnp(sl, dtype))
        return jnp.stack(layers)
    return w


def upcast_model_weights(params: "ModelParams",
                         dtype=jnp.bfloat16) -> "ModelParams":
    """Hold a quantized model's weights DENSE on chip (load format
    unchanged: q8_0 file in, bf16 HBM residency out — the trade ggml
    makes per-op in its f16 compute buffers
    (/root/reference/crates/ggml/src/lib.rs context compute types), made
    once at load where TPU HBM capacity allows it). Fused launch tensors
    are unfused first (dense XLA ops carry no splits metadata and have
    no launch economy to win).

    Measured OFF-by-default (see _dense_upcast_max_bytes): on this chip
    it exactly ties the quantized kernel at small geometry — both paths
    are per-kernel-dispatch-bound, so doubling HBM bytes buys nothing —
    and at large geometry it loses on bytes outright. It becomes the
    right lever only where dense streaming outruns the quantized kernel
    by more than the 2x byte inflation (not the case here: 683 vs ~350
    GB/s marginal)."""
    import dataclasses as _dc

    layers = unfuse_layer_weights(params.layers)
    lk = {}
    for f in _W_FIELDS:
        w = getattr(layers, f)
        if w is not None and not isinstance(w, jnp.ndarray):
            lk[f] = _upcast_weight(w, dtype)
    if lk:
        layers = _dc.replace(layers, **lk)
    pk = {"layers": layers}
    for f in ("wte", "wpe", "lm_head"):
        w = getattr(params, f)
        if w is not None and not isinstance(w, jnp.ndarray):
            pk[f] = _upcast_weight(w, dtype)
    return _dc.replace(params, **pk)


def maybe_upcast_dense(params: "ModelParams") -> "ModelParams":
    """Apply the dense-upcast gate (see _dense_upcast_max_bytes)."""
    total = sum(
        _packed_bytes(w)
        for w in [getattr(params.layers, f) for f in _W_FIELDS]
        + [params.wte, params.lm_head]
        if w is not None
    )
    if total <= _dense_upcast_max_bytes():
        return upcast_model_weights(params)
    return params


def _coalesce_enabled() -> bool:
    # Default ON since round 5: +13% decode at 7B (67.6 -> 77.2 tok/s,
    # chip A/B scripts/probe_coalesce_model.py); small-K weights are
    # size-gated in coalesce_auto, so small models keep the plane layout.
    import os

    return os.environ.get("LLM_TPU_COALESCE", "1") == "1"


def _fuse_enabled() -> bool:
    """Launch fusion default: ON when coalescing (fused q|k|v and
    gate|up widths are already 512-multiples, so the wide-lane layout
    needs no R padding AND saves kernel launches — 7B decode 77.3 ->
    79.3 tok/s measured); OFF on the plane path (measured -1% on bulk
    decode there). LLM_TPU_FUSE overrides either way."""
    import os

    v = os.environ.get("LLM_TPU_FUSE")
    if v is not None:
        return v == "1"
    return _coalesce_enabled()


def coalesce_layer_weights(layer: LayerParams,
                           to_device: bool = False) -> LayerParams:
    """Rewrite one (unstacked) layer's matmul weights into the coalesced
    single-DMA-per-block layout (ops/packing.QuantTensorC): all planes of
    each (R-tile, K-tile) weight block interleave into one linear HBM span,
    so the decode kernel issues one large contiguous DMA per grid step and
    runs at bigger lane tiles (round-5 chip A/B: 276 -> 348 GB/s marginal
    at 7B FFN geometry). Host-side transform (numpy planes in, numpy buf
    out) so stack_layers still uploads each stacked tensor once."""
    import dataclasses

    from llm_tpu.ops.packing import QuantTensor
    from llm_tpu.ops.qmatmul import coalesce_auto

    kw = {}
    for f in _W_FIELDS:
        w = getattr(layer, f)
        if isinstance(w, QuantTensor):
            c = coalesce_auto(w, to_device=to_device)
            if c is not None:
                kw[f] = c
    return dataclasses.replace(layer, **kw) if kw else layer


def stack_layers(layers: list[LayerParams]) -> LayerParams:
    """Stack per-layer pytrees along a new leading axis for lax.scan.

    With LLM_TPU_COALESCE=1 each layer's quantized matmul weights are first
    re-tiled into the coalesced layout (see coalesce_layer_weights) —
    before stacking, so the transform runs on host planes. Launch fusion
    (LLM_TPU_FUSE=1) composes: fused tensors coalesce too.

    Requires homogeneous layers (same quant formats / shapes / bias
    presence) — true for every real GGML checkpoint, where the quantizer
    applies one target type to all matching 2-D tensors.

    Host (numpy) leaves — the default load path — stack with np.stack and
    upload in ONE transfer per stacked tensor; stacking device arrays
    instead would hold every unstacked plane AND its stacked copy on
    device at once (~2x param bytes transient: what OOM'd LLaMA-13B on a
    memory-constrained chip slice). The host-side np.stack of the NEXT
    tensor runs on a worker thread while the current one uploads (same
    bounded-queue pattern as the pack-cache loader), so the stacking
    memcpy hides under the transfer.
    """
    import os
    import queue
    import threading

    if _coalesce_enabled() and layers and isinstance(layers[0], LayerParams):
        if _fuse_enabled():
            layers = [fuse_layer_weights(l) for l in layers]
        layers = [coalesce_layer_weights(l) for l in layers]

    flats = [jax.tree_util.tree_flatten(l) for l in layers]
    treedef = flats[0][1]
    if any(f[1] != treedef for f in flats[1:]):
        raise ValueError(
            "model layers are not homogeneous (mixed quant formats or "
            "bias presence across layers); cannot build scan-stacked params"
        )
    # leaves[i] = the i-th leaf across all layers, stacking order = tree order
    leaves = list(zip(*(f[0] for f in flats)))
    q: "queue.Queue" = queue.Queue(maxsize=2)
    stop = threading.Event()

    def stacker():
        try:
            for i, xs in enumerate(leaves):
                if stop.is_set():
                    return
                if isinstance(xs[0], np.ndarray):
                    q.put((i, np.stack(xs), None))
                else:
                    q.put((i, None, None))  # device leaves stack inline
        except Exception as e:  # noqa: BLE001 - surfaced by consumer
            q.put((None, None, e))

    th = threading.Thread(target=stacker, daemon=True)
    th.start()
    out: list = [None] * len(leaves)
    try:
        for _ in leaves:
            i, stacked, err = q.get()
            if err is not None:
                if isinstance(err, ValueError):  # np.stack shape mismatch
                    raise ValueError(
                        "model layers are not homogeneous (mixed quant "
                        "formats or shapes across layers); cannot build "
                        f"scan-stacked params: {err}"
                    ) from err
                raise err
            if stacked is not None:
                out[i] = jnp.asarray(stacked)
            else:
                try:  # device leaves stack inline
                    out[i] = jnp.stack(leaves[i])
                except (ValueError, TypeError) as e:  # shape mismatch
                    raise ValueError(
                        "model layers are not homogeneous (mixed quant "
                        "formats or shapes across layers); cannot build "
                        f"scan-stacked params: {e}"
                    ) from e
    finally:
        stop.set()
        while not q.empty():
            try:
                q.get_nowait()
            except queue.Empty:
                break
        th.join(timeout=30)
    return jax.tree_util.tree_unflatten(treedef, out)


class WeightSource:
    """Fetch-and-pack adapter over a GgmlReader (+ optional LoRA patches).

    The analog of MmapCompatibleLoader/FileContext::get_tensor
    (/root/reference/crates/llm-base/src/loader.rs:641-756), producing packed
    device tensors instead of arena copies.
    """

    def __init__(self, reader: GgmlReader, progress=None, lora_adapters=None,
                 to_device: bool = False):
        # host-side packing by default: build_params stacks layers with
        # numpy and uploads each stacked tensor ONCE, capping the device
        # transient at ~1x the param bytes (see pack_ggml to_device)
        self.reader = reader
        self.progress = progress
        self.lora_adapters = lora_adapters or []
        self.to_device = to_device
        self._loaded = 0

    def has(self, name: str) -> bool:
        return name in self.reader.tensors

    def _raw(self, name: str) -> tuple[TensorInfo, np.ndarray]:
        # one-entry memo: fused QKV tensors are fetched three times in a
        # row (rows=q|k|v); without it every call re-applies the full
        # LoRA patch and triple-counts the progress callback
        memo = getattr(self, "_raw_memo", None)
        if memo is not None and memo[0] == name:
            return memo[1], memo[2]
        info = self.reader.tensors[name]
        data = self.reader.fetch(name)
        for lora in self.lora_adapters:
            patched = lora.patch(name, info, data)
            if patched is not None:
                info, data = patched
        self._raw_memo = (name, info, data)
        self._loaded += 1
        if self.progress is not None:
            self.progress(name, self._loaded, len(self.reader.tensors))
        return info, data

    def matrix(self, name: str, rows: Optional[np.ndarray] = None) -> Weight:
        info, data = self._raw(name)
        return pack_ggml(info.element_type, data, info.dims, rows=rows,
                         to_device=self.to_device)

    def vec(self, name: str, rows: Optional[np.ndarray] = None) -> jnp.ndarray:
        """1-D tensor (norm weight / bias) as f32 (host in the default
        load path; _params_to_device uploads with everything else)."""
        info, data = self._raw(name)
        v = dequantize(info.element_type, data, info.n_elements)
        if rows is not None:
            v = v[rows]
        if self.to_device:
            return jnp.asarray(v, dtype=jnp.float32)
        return np.asarray(v, np.float32)

    def maybe_matrix(self, name: str) -> Optional[Weight]:
        return self.matrix(name) if self.has(name) else None


# ---------------------------------------------------------------------------
# fused-QKV row index helpers


def _thirds(n_embd: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    i = np.arange(n_embd)
    return i, n_embd + i, 2 * n_embd + i


def _neox_interleaved(n_head: int, head_dim: int):
    base = np.arange(n_head)[:, None] * 3 * head_dim + np.arange(head_dim)[None, :]
    return base.ravel(), (base + head_dim).ravel(), (base + 2 * head_dim).ravel()


def _falcon_rows(n_head: int, n_head_kv: int, head_dim: int):
    q = np.arange(n_head * head_dim)
    k = n_head * head_dim + np.arange(n_head_kv * head_dim)
    v = (n_head + n_head_kv) * head_dim + np.arange(n_head_kv * head_dim)
    return q, k, v


# ---------------------------------------------------------------------------
# per-arch parameter builders


def _build_llama(ws: WeightSource, spec: ModelSpec) -> ModelParams:
    layers = []
    for i in range(spec.n_layer):
        p = f"layers.{i}"
        layers.append(
            LayerParams(
                ln1_w=ws.vec(f"{p}.attention_norm.weight"),
                ln1_b=None,
                ln2_w=ws.vec(f"{p}.ffn_norm.weight"),
                ln2_b=None,
                wq=ws.matrix(f"{p}.attention.wq.weight"),
                bq=None,
                wk=ws.matrix(f"{p}.attention.wk.weight"),
                bk=None,
                wv=ws.matrix(f"{p}.attention.wv.weight"),
                bv=None,
                wo=ws.matrix(f"{p}.attention.wo.weight"),
                bo=None,
                w_gate=ws.matrix(f"{p}.feed_forward.w1.weight"),
                w_up=ws.matrix(f"{p}.feed_forward.w3.weight"),
                b_up=None,
                w_down=ws.matrix(f"{p}.feed_forward.w2.weight"),
                b_down=None,
            )
        )
    return ModelParams(
        wte=ws.matrix("tok_embeddings.weight"),
        wpe=None,
        emb_norm_w=None,
        emb_norm_b=None,
        final_norm_w=ws.vec("norm.weight"),
        final_norm_b=None,
        lm_head=ws.matrix("output.weight"),
        lm_head_b=None,
        layers=stack_layers(layers),
    )


def _build_gpt2(ws: WeightSource, spec: ModelSpec) -> ModelParams:
    q, k, v = _thirds(spec.n_embd)
    layers = []
    for i in range(spec.n_layer):
        p = f"model/h{i}"
        layers.append(
            LayerParams(
                ln1_w=ws.vec(f"{p}/ln_1/g"),
                ln1_b=ws.vec(f"{p}/ln_1/b"),
                ln2_w=ws.vec(f"{p}/ln_2/g"),
                ln2_b=ws.vec(f"{p}/ln_2/b"),
                wq=ws.matrix(f"{p}/attn/c_attn/w", rows=q),
                bq=ws.vec(f"{p}/attn/c_attn/b", rows=q),
                wk=ws.matrix(f"{p}/attn/c_attn/w", rows=k),
                bk=ws.vec(f"{p}/attn/c_attn/b", rows=k),
                wv=ws.matrix(f"{p}/attn/c_attn/w", rows=v),
                bv=ws.vec(f"{p}/attn/c_attn/b", rows=v),
                wo=ws.matrix(f"{p}/attn/c_proj/w"),
                bo=ws.vec(f"{p}/attn/c_proj/b"),
                w_gate=None,
                w_up=ws.matrix(f"{p}/mlp/c_fc/w"),
                b_up=ws.vec(f"{p}/mlp/c_fc/b"),
                w_down=ws.matrix(f"{p}/mlp/c_proj/w"),
                b_down=ws.vec(f"{p}/mlp/c_proj/b"),
            )
        )
    return ModelParams(
        wte=ws.matrix("model/wte"),
        wpe=ws.matrix("model/wpe"),
        emb_norm_w=None,
        emb_norm_b=None,
        final_norm_w=ws.vec("model/ln_f/g"),
        final_norm_b=ws.vec("model/ln_f/b"),
        lm_head=ws.maybe_matrix("model/lm_head"),
        lm_head_b=None,
        layers=stack_layers(layers),
    )


def _build_gptj(ws: WeightSource, spec: ModelSpec) -> ModelParams:
    layers = []
    for i in range(spec.n_layer):
        p = f"transformer.h.{i}"
        layers.append(
            LayerParams(
                ln1_w=ws.vec(f"{p}.ln_1.weight"),
                ln1_b=ws.vec(f"{p}.ln_1.bias"),
                ln2_w=None,
                ln2_b=None,
                wq=ws.matrix(f"{p}.attn.q_proj.weight"),
                bq=None,
                wk=ws.matrix(f"{p}.attn.k_proj.weight"),
                bk=None,
                wv=ws.matrix(f"{p}.attn.v_proj.weight"),
                bv=None,
                wo=ws.matrix(f"{p}.attn.out_proj.weight"),
                bo=None,
                w_gate=None,
                w_up=ws.matrix(f"{p}.mlp.fc_in.weight"),
                b_up=ws.vec(f"{p}.mlp.fc_in.bias"),
                w_down=ws.matrix(f"{p}.mlp.fc_out.weight"),
                b_down=ws.vec(f"{p}.mlp.fc_out.bias"),
            )
        )
    return ModelParams(
        wte=ws.matrix("transformer.wte.weight"),
        wpe=None,
        emb_norm_w=None,
        emb_norm_b=None,
        final_norm_w=ws.vec("transformer.ln_f.weight"),
        final_norm_b=ws.vec("transformer.ln_f.bias"),
        lm_head=ws.matrix("lm_head.weight"),
        lm_head_b=ws.vec("lm_head.bias"),
        layers=stack_layers(layers),
    )


def _build_gptneox(ws: WeightSource, spec: ModelSpec) -> ModelParams:
    q, k, v = _neox_interleaved(spec.n_head, spec.head_dim)
    layers = []
    for i in range(spec.n_layer):
        p = f"gpt_neox.layers.{i}"
        layers.append(
            LayerParams(
                ln1_w=ws.vec(f"{p}.input_layernorm.weight"),
                ln1_b=ws.vec(f"{p}.input_layernorm.bias"),
                ln2_w=ws.vec(f"{p}.post_attention_layernorm.weight"),
                ln2_b=ws.vec(f"{p}.post_attention_layernorm.bias"),
                wq=ws.matrix(f"{p}.attention.query_key_value.weight", rows=q),
                bq=ws.vec(f"{p}.attention.query_key_value.bias", rows=q),
                wk=ws.matrix(f"{p}.attention.query_key_value.weight", rows=k),
                bk=ws.vec(f"{p}.attention.query_key_value.bias", rows=k),
                wv=ws.matrix(f"{p}.attention.query_key_value.weight", rows=v),
                bv=ws.vec(f"{p}.attention.query_key_value.bias", rows=v),
                wo=ws.matrix(f"{p}.attention.dense.weight"),
                bo=ws.vec(f"{p}.attention.dense.bias"),
                w_gate=None,
                w_up=ws.matrix(f"{p}.mlp.dense_h_to_4h.weight"),
                b_up=ws.vec(f"{p}.mlp.dense_h_to_4h.bias"),
                w_down=ws.matrix(f"{p}.mlp.dense_4h_to_h.weight"),
                b_down=ws.vec(f"{p}.mlp.dense_4h_to_h.bias"),
            )
        )
    return ModelParams(
        wte=ws.matrix("gpt_neox.embed_in.weight"),
        wpe=None,
        emb_norm_w=None,
        emb_norm_b=None,
        final_norm_w=ws.vec("gpt_neox.final_layer_norm.weight"),
        final_norm_b=ws.vec("gpt_neox.final_layer_norm.bias"),
        lm_head=ws.matrix("embed_out.weight"),
        lm_head_b=None,
        layers=stack_layers(layers),
    )


def _build_bloom(ws: WeightSource, spec: ModelSpec) -> ModelParams:
    q, k, v = _thirds(spec.n_embd)
    layers = []
    for i in range(spec.n_layer):
        p = f"layers.{i}"
        layers.append(
            LayerParams(
                ln1_w=ws.vec(f"{p}.attention_norm.weight"),
                ln1_b=ws.vec(f"{p}.attention_norm.bias"),
                ln2_w=ws.vec(f"{p}.ffn_norm.weight"),
                ln2_b=ws.vec(f"{p}.ffn_norm.bias"),
                wq=ws.matrix(f"{p}.attention.query_key_value.weight", rows=q),
                bq=ws.vec(f"{p}.attention.query_key_value.bias", rows=q),
                wk=ws.matrix(f"{p}.attention.query_key_value.weight", rows=k),
                bk=ws.vec(f"{p}.attention.query_key_value.bias", rows=k),
                wv=ws.matrix(f"{p}.attention.query_key_value.weight", rows=v),
                bv=ws.vec(f"{p}.attention.query_key_value.bias", rows=v),
                wo=ws.matrix(f"{p}.attention.wo.weight"),
                bo=ws.vec(f"{p}.attention.wo.bias"),
                w_gate=None,
                w_up=ws.matrix(f"{p}.feed_forward.w1.weight"),
                b_up=ws.vec(f"{p}.feed_forward.w1.bias"),
                w_down=ws.matrix(f"{p}.feed_forward.w2.weight"),
                b_down=ws.vec(f"{p}.feed_forward.w2.bias"),
            )
        )
    return ModelParams(
        wte=ws.matrix("tok_embeddings.weight"),
        wpe=None,
        emb_norm_w=ws.vec("norm.weight"),
        emb_norm_b=ws.vec("norm.bias"),
        final_norm_w=ws.vec("output_norm.weight"),
        final_norm_b=ws.vec("output_norm.bias"),
        lm_head=ws.matrix("output.weight"),
        lm_head_b=None,
        layers=stack_layers(layers),
    )


def _build_mpt(ws: WeightSource, spec: ModelSpec) -> ModelParams:
    q, k, v = _thirds(spec.n_embd)
    layers = []
    for i in range(spec.n_layer):
        p = f"transformer.blocks.{i}"
        layers.append(
            LayerParams(
                ln1_w=ws.vec(f"{p}.norm_1.weight"),
                ln1_b=None,
                ln2_w=ws.vec(f"{p}.norm_2.weight"),
                ln2_b=None,
                wq=ws.matrix(f"{p}.attn.Wqkv.weight", rows=q),
                bq=None,
                wk=ws.matrix(f"{p}.attn.Wqkv.weight", rows=k),
                bk=None,
                wv=ws.matrix(f"{p}.attn.Wqkv.weight", rows=v),
                bv=None,
                wo=ws.matrix(f"{p}.attn.out_proj.weight"),
                bo=None,
                w_gate=None,
                w_up=ws.matrix(f"{p}.ffn.up_proj.weight"),
                b_up=None,
                w_down=ws.matrix(f"{p}.ffn.down_proj.weight"),
                b_down=None,
            )
        )
    return ModelParams(
        wte=ws.matrix("transformer.wte.weight"),
        wpe=None,
        emb_norm_w=None,
        emb_norm_b=None,
        final_norm_w=ws.vec("transformer.norm_f.weight"),
        final_norm_b=None,
        lm_head=None,  # tied (mpt/src/lib.rs:243-244)
        lm_head_b=None,
        layers=stack_layers(layers),
    )


def _build_falcon(ws: WeightSource, spec: ModelSpec) -> ModelParams:
    q, k, v = _falcon_rows(spec.n_head, spec.n_head_kv, spec.head_dim)
    layers = []
    for i in range(spec.n_layer):
        p = f"transformer.h.{i}"
        if spec.n_head_kv == 1:  # falcon 7B: single shared LN
            ln1_w = ws.vec(f"{p}.input_layernorm.weight")
            ln1_b = ws.vec(f"{p}.input_layernorm.bias")
            ln2_w = ln2_b = None
        else:  # falcon 40B: ln_attn feeds attention, ln_mlp feeds the FFN
            ln1_w = ws.vec(f"{p}.ln_attn.weight")
            ln1_b = ws.vec(f"{p}.ln_attn.bias")
            ln2_w = ws.vec(f"{p}.ln_mlp.weight")
            ln2_b = ws.vec(f"{p}.ln_mlp.bias")
        layers.append(
            LayerParams(
                ln1_w=ln1_w,
                ln1_b=ln1_b,
                ln2_w=ln2_w,
                ln2_b=ln2_b,
                wq=ws.matrix(f"{p}.self_attention.query_key_value.weight", rows=q),
                bq=None,
                wk=ws.matrix(f"{p}.self_attention.query_key_value.weight", rows=k),
                bk=None,
                wv=ws.matrix(f"{p}.self_attention.query_key_value.weight", rows=v),
                bv=None,
                wo=ws.matrix(f"{p}.self_attention.dense.weight"),
                bo=None,
                w_gate=None,
                w_up=ws.matrix(f"{p}.mlp.dense_h_to_4h.weight"),
                b_up=None,
                w_down=ws.matrix(f"{p}.mlp.dense_4h_to_h.weight"),
                b_down=None,
            )
        )
    return ModelParams(
        wte=ws.matrix("transformer.word_embeddings.weight"),
        wpe=None,
        emb_norm_w=None,
        emb_norm_b=None,
        final_norm_w=ws.vec("transformer.ln_f.weight"),
        final_norm_b=ws.vec("transformer.ln_f.bias"),
        lm_head=ws.matrix("lm_head.weight"),
        lm_head_b=None,
        layers=stack_layers(layers),
    )


_BUILDERS = {
    "llama": _build_llama,
    "gpt2": _build_gpt2,
    "gptj": _build_gptj,
    "gptneox": _build_gptneox,
    "bloom": _build_bloom,
    "mpt": _build_mpt,
    "falcon": _build_falcon,
}


def _params_to_device(params: ModelParams) -> ModelParams:
    """Upload any remaining host (numpy) leaves — non-layer tensors when
    the WeightSource packed host-side. Stacked layers are already device
    arrays (stack_layers uploads per stacked tensor)."""

    def up(a):
        if isinstance(a, np.ndarray):
            return jnp.asarray(a)
        return a

    return jax.tree_util.tree_map(up, params)


def build_params(ws: WeightSource, spec: ModelSpec) -> ModelParams:
    import dataclasses
    import os

    params = _BUILDERS[spec.arch](ws, spec)
    # Launch fusion is opt-in: on the bench chip it wins ~7% on small-model
    # SHORT-block decode (per-token interactive sessions) but costs ~1% on
    # 64-token bulk decode blocks, where DMA streams already pipeline.
    # (With coalescing, fusion already happened per-layer inside
    # stack_layers; this post-stack pass then no-ops.)
    if _fuse_enabled():
        params = dataclasses.replace(
            params, layers=fuse_layer_weights(params.layers)
        )
    if _coalesce_enabled():
        # The head matmul streams the biggest single tensor every decode
        # step; coalesce it too. For tied heads this stores a SEPARATE
        # coalesced copy (wte must stay planar for embedding row gathers)
        # — costing one packed head of HBM for the faster stream.
        from llm_tpu.ops.packing import QuantTensor
        from llm_tpu.ops.qmatmul import coalesce_auto

        head = params.lm_head if params.lm_head is not None else params.wte
        if isinstance(head, QuantTensor):
            c = coalesce_auto(head)
            if c is not None:
                params = dataclasses.replace(params, lm_head=c)
    return maybe_upcast_dense(_params_to_device(params))
