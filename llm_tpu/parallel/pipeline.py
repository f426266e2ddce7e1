"""Pipeline parallelism: GPipe-style microbatching over a `pipe` mesh axis.

For models whose layer stack exceeds one host's HBM, the stacked-layer
pytree (models/params.py: every LayerParams leaf leads with n_layer) makes
stage splitting mechanical: shard the leading L axis over `pipe` and each
device holds a contiguous run of L/S layers plus that run's slice of the
KV cache. Nothing like this exists in the reference — it is single-process
CPU inference (SURVEY.md §2.5); this is the from-scratch design the TPU
build adds on top of the same forward math.

Schedule (classic GPipe, inference-only so no backward/stash):

    the global batch B splits into M microbatches of B/M streams; over
    S + M - 1 steps, stage i processes microbatch (t - i) at step t and
    ships its activations to stage i+1 with a ring `ppermute`. Stages idle
    in the (S-1)-step fill/drain bubbles; utilization is M/(M+S-1), so M
    should be a few multiples of S.

Implementation notes:
  - `shard_map` gives each stage its LOCAL weight/cache shards; the layer
    scan reuses models/forward.scan_layers_batched, whose layer count comes
    from the cache's leading axis — the whole forward math is shared with
    the single-stage path (equality-tested against forward_batched).
  - bubbles COMPUTE on garbage activations but never write: the KV write
    mask is `valid & caller_mask`, riding write_cache_batched's predicated
    per-stream DUS. Reads during bubbles hit a real microbatch's rows
    (index clamped) — harmless.
  - embedding and the LM head run OUTSIDE shard_map under plain GSPMD
    (they are batch-parallel, not layer-parallel); only the layer stack is
    pipelined.
  - inside shard_map the per-device compute is ordinary single-device
    code, so the fused dequant-matmul Pallas kernel runs AS-IS on each
    stage (manual mode) — no GSPMD-of-pallas_call limitation, unlike the
    automatic TP path which must fall back to the jnp dequant (see
    paged.py:188).
  - an optional `data` mesh axis composes: batch rows shard over `data`
    (each data-group runs an independent pipeline over the same stages);
    the ring and the result broadcast stay `pipe`-only.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from llm_tpu.models.forward import (
    KVCache,
    embed_batched,
    head_batched,
    scan_layers_batched,
    write_cache_batched,
)


def make_pipeline_mesh(pipe: int, data: int = 1, devices=None) -> Mesh:
    """A ("data", "pipe") mesh; `pipe` is the number of stages."""
    devices = devices if devices is not None else jax.devices()
    n = data * pipe
    assert n <= len(devices), (data, pipe, len(devices))
    dm = mesh_utils.create_device_mesh((data, pipe), devices=devices[:n])
    return Mesh(dm, axis_names=("data", "pipe"))


def _stages(mesh: Mesh) -> int:
    return mesh.shape["pipe"]


def shard_params_pipeline(params, mesh: Mesh):
    """Stage-shard the stacked layers (leading L axis over `pipe`);
    embedding/head/final-norm leaves replicate (they run outside the
    pipelined region)."""
    S = _stages(mesh)
    L = params.layers.ln1_w.shape[0]
    assert L % S == 0, (
        f"n_layer={L} must divide evenly into {S} pipeline stages"
    )
    repl = NamedSharding(mesh, P())
    staged = NamedSharding(mesh, P("pipe"))

    out = {}
    for f in params.__dataclass_fields__:
        sh = staged if f == "layers" else repl
        out[f] = jax.tree_util.tree_map(
            lambda x, sh=sh: jax.device_put(x, sh), getattr(params, f)
        )
    return type(params)(**out)


def shard_cache_pipeline(cache: KVCache, mesh: Mesh) -> KVCache:
    """[L, B, H_kv, S, D] head-major cache: layers over `pipe`, batch over `data`."""
    ns = NamedSharding(mesh, P("pipe", "data"))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, ns), cache)


def pipeline_forward_batched(
    spec,
    params,
    ids: jnp.ndarray,  # [B, T] int32
    n_past: jnp.ndarray,  # [B] int32
    cache: KVCache,  # [L, B, H_kv, S, D] head-major, L sharded over `pipe`
    mesh: Mesh,
    n_microbatches: int,
    window: Optional[int] = None,
    write_mask: Optional[jnp.ndarray] = None,  # [B] bool
):
    """forward_batched semantics, pipelined over `pipe` stages.

    Returns (logits [B, T, V] f32, hidden [B, T, E] f32, new cache) equal
    to forward_batched's (up to matmul reduction order)."""
    B, T = ids.shape
    M = n_microbatches
    S = _stages(mesh)
    L = spec.n_layer
    assert B % M == 0, f"batch {B} must divide into {M} microbatches"
    assert L % S == 0, f"n_layer {L} must divide into {S} stages"
    data = mesh.shape.get("data", 1)
    mb = B // M
    assert mb % data == 0, (
        f"microbatch size {mb} must divide over data={data}"
    )

    positions = n_past[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
    h = embed_batched(spec, params, ids, positions)  # [B, T, E]
    W = cache.k.shape[3] if window is None else min(window, cache.k.shape[3])

    wm = (
        jnp.ones((B,), jnp.bool_)
        if write_mask is None
        else jnp.asarray(write_mask)
    )
    E = h.shape[-1]

    # Microbatch m must cover, WITHIN each data shard, the local cache rows
    # [m*mbl, (m+1)*mbl) — the cache is block-partitioned [B] over `data`
    # while the microbatch axis is replicated. So view B as [data, M, mbl]
    # and put M outermost; a plain reshape(M, mb) would hand data-shard d
    # a strided set of streams that mismatches its cache block.
    mbl = mb // data

    def to_mb(x):
        y = x.reshape((data, M, mbl) + x.shape[1:])
        return jnp.swapaxes(y, 0, 1).reshape((M, mb) + x.shape[1:])

    h_mb = to_mb(h)
    pos_mb = to_mb(positions)
    past_mb = to_mb(n_past)
    wm_mb = to_mb(wm)

    def stage_fn(layers, cache_l, h_all, pos_all, past_all, wm_all):
        # local shapes: layers [L/S, ...], cache_l [L/S, B/data, ...],
        # h_all [M, mb/data, T, E]
        i = lax.axis_index("pipe")
        mbl = h_all.shape[1]
        h_buf = jnp.zeros((mbl, T, E), h_all.dtype)
        outs = jnp.zeros((M, mbl, T, E), h_all.dtype)

        def step(t, carry):
            h_buf, cache_l, outs = carry
            m = t - i
            valid = (m >= 0) & (m < M)
            m_c = jnp.clip(m, 0, M - 1)

            inj = lax.dynamic_index_in_dim(
                h_all, jnp.clip(t, 0, M - 1), 0, keepdims=False
            )
            h_in = jnp.where(i == 0, inj, h_buf)
            mpos = lax.dynamic_index_in_dim(pos_all, m_c, 0, keepdims=False)
            mpast = lax.dynamic_index_in_dim(past_all, m_c, 0, keepdims=False)
            mwm = (
                lax.dynamic_index_in_dim(wm_all, m_c, 0, keepdims=False)
                & valid
            )

            cache_mb = jax.tree_util.tree_map(
                lambda a: lax.dynamic_slice_in_dim(a, m_c * mbl, mbl, 1),
                cache_l,
            )
            h_out, (k_news, v_news) = scan_layers_batched(
                spec, layers, h_in, mpos, mpast, cache_mb, W
            )
            cache_mb = write_cache_batched(
                cache_mb, k_news, v_news, mpast, mwm
            )
            cache_l = jax.tree_util.tree_map(
                lambda full, part: lax.dynamic_update_slice_in_dim(
                    full, part, m_c * mbl, 1
                ),
                cache_l,
                cache_mb,
            )

            sel = valid & (i == S - 1)
            cur = lax.dynamic_index_in_dim(outs, m_c, 0, keepdims=False)
            outs = lax.dynamic_update_index_in_dim(
                outs, jnp.where(sel, h_out, cur), m_c, 0
            )
            h_next = lax.ppermute(
                h_out, "pipe", [(j, (j + 1) % S) for j in range(S)]
            )
            return h_next, cache_l, outs

        h_buf, cache_l, outs = lax.fori_loop(
            0, S + M - 1, step, (h_buf, cache_l, outs)
        )
        # only the last stage holds real outputs; broadcast over the ring
        outs = lax.psum(
            jnp.where(i == S - 1, outs, jnp.zeros_like(outs)), "pipe"
        )
        return outs, cache_l

    outs, new_cache = shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(
            P("pipe"),  # layers: leading L axis
            P("pipe", "data"),  # cache: (layer, batch)
            P(None, "data"),  # h_mb [M, mb, T, E]
            P(None, "data"),
            P(None, "data"),
            P(None, "data"),
        ),
        out_specs=(P(None, "data"), P("pipe", "data")),
        check_vma=False,
    )(params.layers, cache, h_mb, pos_mb, past_mb, wm_mb)

    # inverse of to_mb on the leading two dims: [M, mb, T, E] -> [B, T, E]
    outs = jnp.swapaxes(
        outs.reshape(M, data, mbl, T, E), 0, 1
    ).reshape(B, T, E)
    logits, hidden = head_batched(spec, params, outs)
    return logits, hidden, new_cache


@partial(jax.jit, static_argnums=(0, 5, 6, 7), donate_argnums=(4,))
def pipeline_step(
    spec, params, ids, n_past, cache, mesh, n_microbatches, window=None
):
    """Jitted pipeline forward; cache donated (in-place update)."""
    from llm_tpu.models.forward import _check_window

    _check_window(window, n_past, extra=ids.shape[1])
    return pipeline_forward_batched(
        spec, params, ids, n_past, cache, mesh, n_microbatches, window
    )
