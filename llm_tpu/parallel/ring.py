"""Ring-attention sequence-parallel prefill (context parallelism).

Long-prompt prefill sharded over a `seq` mesh axis: each device holds a
contiguous shard of the prompt's tokens, computes its own Q/K/V, and the
K/V blocks rotate around the ring via `lax.ppermute` while every device
accumulates online-softmax state for its local queries — attention over a
T-token prompt runs with O(T/S) activation memory per device and only
neighbor-to-neighbor (ICI-friendly) communication, never an all-to-all.

Causality falls out of absolute positions: a block arriving from a
later-ranked device masks to nothing (finite NEG_INF masking keeps the
online-softmax state NaN-free), and each device's intra-block causal term
is the ordinary in-chunk path of `_attention_batched` — the ring pass
plugs into its `online_pass` hook (marked `wants_kv` so the hook receives
the local K/V blocks to rotate).

The reference has NO long-context mechanism at all — context overflow is
an error (/root/reference/crates/llm-base/src/inference_session.rs:311-313)
and its flash-attention binding is never used
(/root/reference/crates/ggml/src/context.rs:614-625). This is TPU-native
scale-out design, not a port; see also docs/architecture.md.

Composition: the `seq` axis is manual (shard_map); weights are replicated
across it. v1 does not compose with a tensor-parallel `model` axis inside
the same dispatch (the fused qmatmul kernel is not SPMD-partitioned) —
shard long-prompt prefill over `seq`, then decode on the usual mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from llm_tpu.models.forward import (
    KVCache,
    _layer_batched,
    _LayerView,
    _quant_kv,
    embed_batched,
    head_batched,
    init_cache_batched,
    write_cache_batched,
)
from llm_tpu.models.spec import ModelSpec
from llm_tpu.ops.layers import alibi_slopes

NEG_INF = -1e30


def make_seq_mesh(n: int | None = None, devices=None, axis: str = "seq"):
    """1-D mesh whose only axis is the sequence-parallel ring."""
    import numpy as np

    from jax.sharding import Mesh

    devices = list(devices) if devices is not None else jax.devices()
    n = n or len(devices)
    return Mesh(np.array(devices[:n]), axis_names=(axis,))


def _ring_pass(spec: ModelSpec, axis: str, n_ring: int, tl: int):
    """online_pass hook: rotate (kf, vf) around `axis` n_ring-1 times,
    accumulating online-softmax state of the local queries against every
    other device's block. Local-block attention stays in the caller."""
    slopes = (
        alibi_slopes(spec.n_head, spec.alibi_bias_max).reshape(
            spec.n_head_kv, spec.n_head // spec.n_head_kv
        )
        if spec.alibi_bias_max > 0.0
        else None
    )
    perm = [(i, (i + 1) % n_ring) for i in range(n_ring)]

    def ring(qf, kf, vf):
        # qf [B, Tl, Hkv, rep, D] f32; kf/vf [B, Tl, Hkv, D] f32
        B, Tl, Hkv, rep, D = qf.shape
        my = lax.axis_index(axis)
        q_pos = my * tl + jnp.arange(tl, dtype=jnp.int32)  # [Tl]

        init = (
            jnp.full((B, Tl, Hkv, rep), NEG_INF, jnp.float32),
            jnp.zeros((B, Tl, Hkv, rep), jnp.float32),
            jnp.zeros((B, Tl, Hkv, rep, D), jnp.float32),
            kf,
            vf,
        )

        def body(carry, s):
            m, l, acc, kb, vb = carry
            kb = lax.ppermute(kb, axis, perm)
            vb = lax.ppermute(vb, axis, perm)
            src = jnp.mod(my - s, n_ring)
            k_pos = src * tl + jnp.arange(tl, dtype=jnp.int32)  # [Tl]
            sn = (
                jnp.einsum(
                    "bthrd,buhd->bthru", qf, kb,
                    preferred_element_type=jnp.float32,
                )
                * spec.kq_scale
            )
            if slopes is not None:
                sn = sn + (
                    slopes[None, None, :, :, None]
                    * k_pos.astype(jnp.float32)[None, None, None, None, :]
                )
            valid = k_pos[None, :] <= q_pos[:, None]  # [Tl, Tl] causal
            cv = valid[None, :, None, None, :]
            sn = jnp.where(cv, sn, NEG_INF)
            m2 = jnp.maximum(m, sn.max(axis=-1))
            p = jnp.where(cv, jnp.exp(sn - m2[..., None]), 0.0)
            corr = jnp.exp(m - m2)
            l2 = l * corr + p.sum(axis=-1)
            acc2 = acc * corr[..., None] + jnp.einsum(
                "bthru,buhd->bthrd", p, vb,
                preferred_element_type=jnp.float32,
            )
            return (m2, l2, acc2, kb, vb), None

        (m, l, acc, _, _), _ = lax.scan(
            body, init, jnp.arange(1, n_ring, dtype=jnp.int32)
        )
        return m, l, acc

    ring.wants_kv = True
    return ring


@partial(jax.jit, static_argnums=(0, 3, 4))
def _ring_prefill_jit(spec, params, ids, mesh, axis):
    n_ring = mesh.shape[axis]
    B, T = ids.shape
    tl = T // n_ring

    def inner(p, ids_local):
        my = lax.axis_index(axis)
        positions = (
            my * tl + jnp.arange(tl, dtype=jnp.int32)
        )[None, :] + jnp.zeros((B, 1), jnp.int32)  # [B, Tl]
        base = positions[:, 0]  # [B] this shard's first position
        h = embed_batched(spec, p, ids_local, positions)
        ring = _ring_pass(spec, axis, n_ring, tl)

        def body(carry, l):
            layer = _LayerView(p.layers, l)
            hh, k_new, v_new = _layer_batched(
                spec, carry, layer, positions, base, (None, None),
                (None, None), online_pass=ring, quantize_kv=False,
            )
            return hh, (k_new, v_new)

        h, (k_news, v_news) = lax.scan(
            body, h, jnp.arange(spec.n_layer, dtype=jnp.int32)
        )
        return h, k_news, v_news

    fn = _shard_map(
        inner,
        mesh=mesh,
        axis_names={axis},
        in_specs=(P(), P(None, axis)),
        out_specs=(
            P(None, axis, None),  # h [B, T, E]
            P(None, None, axis, None, None),  # k_news [L, B, T, Hkv, D]
            P(None, None, axis, None, None),
        ),
        check_vma=False,
    )
    return fn(params, ids)


def ring_prefill(
    spec: ModelSpec,
    params,
    ids: jnp.ndarray,  # [B, T]; T divisible by the seq-axis size
    mesh,
    axis: str = "seq",
    kv_dtype=jnp.bfloat16,
):
    """Whole-prompt sequence-parallel prefill. Returns (last_logits [B, V],
    cache) with all T positions written — decode continues on the regular
    (batched) path with n_past = T."""
    B, T = ids.shape
    n_ring = mesh.shape[axis]
    assert T % n_ring == 0, (T, n_ring)
    assert T <= spec.n_ctx, (T, spec.n_ctx)
    assert set(mesh.axis_names) == {axis}, (
        "v1 ring prefill shards only the seq axis; run TP/DP decode on a "
        "separate mesh"
    )

    h, k_news, v_news = _ring_prefill_jit(spec, params, ids, mesh, axis)
    logits, _ = head_batched(spec, params, h[:, -1:, :])

    cache = init_cache_batched(spec, B, kv_dtype)
    if cache.k_scale is not None:
        k_news = _quant_kv(k_news)
        v_news = _quant_kv(v_news)
    cache = write_cache_batched(
        cache, k_news, v_news, jnp.zeros((B,), jnp.int32), None
    )
    return logits[:, 0, :], cache
