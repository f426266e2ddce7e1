"""Paged KV cache: a shared page pool with per-stream page tables.

The reference's only long-context behavior is failing (ContextFull,
inference_session.rs:311-313); BASELINE.md's staged configs require an
"8K paged KV" mode. This module decouples KV memory from
max_streams x n_ctx: streams allocate fixed-size pages from a shared pool
as their context grows and release them when they finish, so total memory
tracks the TOKENS IN FLIGHT, not the worst case.

Layout (layer-major, like the dense cache):

    pool.k/v          [L, n_pages, page, H_kv, D]
    page_table        [B, P] int32 physical page ids (logical order)
    n_past            [B]

Attention gathers each stream's pages in logical order, so positions,
masks, RoPE and ALiBi are identical to the dense path — correctness is
checked by equality against the dense engine. The gather materializes the
windowed K/V per layer (one extra copy vs the dense read); a Pallas
paged-attention kernel with scalar-prefetched page tables is the planned
fast path.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from llm_tpu.models.params import _register
from llm_tpu.models.forward import (
    _LayerView,
    _layer_batched,
    _norm,
    layer_norm,
)
from llm_tpu.models.spec import ModelSpec
from llm_tpu.ops.qmatmul import qmatmul, quant_rows_lookup


@_register
@dataclass
class PagedKVCache:
    k: jnp.ndarray  # [L, n_pages, page, H_kv, D]
    v: jnp.ndarray

    @property
    def page_size(self) -> int:
        return self.k.shape[2]

    @property
    def n_pages(self) -> int:
        return self.k.shape[1]


def init_paged_cache(
    spec: ModelSpec, n_pages: int, page_size: int = 256, dtype=jnp.bfloat16
) -> PagedKVCache:
    shape = (spec.n_layer, n_pages, page_size, spec.n_head_kv, spec.head_dim)
    return PagedKVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


class PageAllocator:
    """Host-side free-list allocator over the physical pages.

    Physical page 0 is RESERVED as the trash page: unallocated page-table
    entries point at it, so dummy writes from inactive/boundary streams land
    somewhere harmless and gathers of unallocated entries read masked
    garbage."""

    TRASH = 0

    def __init__(self, n_pages: int):
        assert n_pages >= 2, "need at least one real page beside the trash page"
        self.free = list(range(n_pages - 1, 0, -1))

    def alloc(self, n: int = 1) -> list[int]:
        if len(self.free) < n:
            raise MemoryError("KV page pool exhausted")
        return [self.free.pop() for _ in range(n)]

    def release(self, pages) -> None:
        self.free.extend(int(p) for p in pages if int(p) != self.TRASH)

    @property
    def available(self) -> int:
        return len(self.free)


def _gather_stream_kv(pool_l, tables, n_logical_pages):
    """pool_l [NP, page, H, D], tables [B, P] -> [B, W, H, D] with
    W = n_logical_pages * page (gathered in logical order)."""
    sel = tables[:, :n_logical_pages]  # [B, Wp]
    g = pool_l[sel]  # [B, Wp, page, H, D]
    B, Wp, page, Hh, D = g.shape
    return g.reshape(B, Wp * page, Hh, D)


def paged_forward_batched(
    spec: ModelSpec,
    params,
    ids: jnp.ndarray,  # [B, T]
    n_past: jnp.ndarray,  # [B]
    tables: jnp.ndarray,  # [B, P] physical page ids
    cache: PagedKVCache,
    window_pages: int,  # static: logical pages covered by attention reads
):
    """Batched forward over paged caches. Returns (logits, hidden, cache).

    Requirement: window_pages * page_size >= max(n_past) + T is NOT needed
    for the cached part (only < n_past is read), but every (n_past + t)
    write position must fall inside an allocated page of `tables`.
    """
    B, T = ids.shape
    page = cache.page_size
    positions = n_past[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]

    h = quant_rows_lookup(params.wte, ids.reshape(-1)).reshape(B, T, -1)
    if spec.post_embed_norm:
        h = layer_norm(h, params.emb_norm_w, params.emb_norm_b)
    if spec.learned_pos:
        h = h + quant_rows_lookup(params.wpe, positions.reshape(-1)).reshape(
            B, T, -1
        )

    def body(carry, xs):
        l, pk_l, pv_l = xs
        layer = _LayerView(params.layers, l)
        kc = (_gather_stream_kv(pk_l, tables, window_pages), None)
        vc = (_gather_stream_kv(pv_l, tables, window_pages), None)
        hh, k_new, v_new = _layer_batched(
            spec, carry, layer, positions, n_past, kc, vc
        )
        return hh, (k_new, v_new)

    h, (k_news, v_news) = lax.scan(
        body, h, (jnp.arange(spec.n_layer, dtype=jnp.int32), cache.k, cache.v)
    )
    # k_news [L, B, T, H, D]: scatter each token into its physical slot.
    # Positions whose logical page is beyond the table (dummy writes of
    # inactive/boundary streams) are redirected to the TRASH page — without
    # this, take_along_axis would clamp to the stream's LAST allocated page
    # and corrupt live entries.
    logical = positions  # [B, T]
    page_idx = (logical // page).astype(jnp.int32)
    P = tables.shape[1]
    in_range = page_idx < P
    phys_pages = jnp.where(
        in_range,
        jnp.take_along_axis(tables, jnp.minimum(page_idx, P - 1), axis=1),
        PageAllocator.TRASH,
    )  # [B, T]
    offsets = logical % page  # [B, T]

    pp = phys_pages.reshape(-1)  # [B*T]
    oo = offsets.reshape(-1)

    def scatter(pool, new):
        # pool [L, NP, page, H, D]; new [L, B, T, H, D].
        # pool[:, pp, oo] has shape [L, B*T, H, D] (advanced indices are
        # adjacent), so this is a single scatter — no pool transpose.
        L, Bn, Tn, Hh, D = new.shape
        flat_new = new.reshape(L, Bn * Tn, Hh, D)
        return pool.at[:, pp, oo].set(flat_new.astype(pool.dtype))

    new_k = scatter(cache.k, k_news)
    new_v = scatter(cache.v, v_news)

    E = h.shape[-1]
    h = _norm(spec, h, params.final_norm_w, params.final_norm_b)
    head = params.lm_head if params.lm_head is not None else params.wte
    logits = qmatmul(h.reshape(B * T, E), head)
    if params.lm_head_b is not None:
        logits = logits + params.lm_head_b
    return (
        logits.reshape(B, T, -1).astype(jnp.float32),
        h.astype(jnp.float32),
        PagedKVCache(new_k, new_v),
    )


@partial(jax.jit, static_argnums=(0, 6), donate_argnums=(5,))
def paged_step(spec, params, ids, n_past, tables, cache, window_pages):
    return paged_forward_batched(
        spec, params, ids, n_past, tables, cache, window_pages
    )


# ---------------------------------------------------------------------------
# paged continuous-batching engine


from llm_tpu.serve import Engine  # noqa: E402  (host-side plumbing shared)


class PagedEngine(Engine):
    """Continuous batching over a shared page pool.

    Same host contract as serve.Engine (submit/step/generate_all, sampler
    chains, retirement events), but KV memory is pooled: total pages bound
    the TOKENS in flight rather than max_streams x n_ctx — what makes
    long-context (e.g. 8K) multi-stream serving fit in HBM.
    """

    def __init__(
        self,
        model,
        max_streams: int = 8,
        page_size: int = 256,
        n_pages: Optional[int] = None,
        kv_dtype=jnp.bfloat16,
        n_batch: int = 64,
    ):
        self.page_size = page_size
        self._n_pages_requested = n_pages
        super().__init__(model, max_streams, kv_dtype, n_batch, mesh=None)

    def _init_device_state(self, kv_dtype, mesh) -> None:
        assert mesh is None, "PagedEngine does not support meshes yet"
        assert kv_dtype not in (jnp.int8, "int8"), (
            "paged int8 KV is not implemented yet"
        )
        self.pages_per_stream = -(-self.spec.n_ctx // self.page_size)
        n_pages = self._n_pages_requested
        if n_pages is None:
            # default: every stream can reach full context (+1 trash page)
            n_pages = 1 + self.max_streams * self.pages_per_stream
        self.pool = init_paged_cache(self.spec, n_pages, self.page_size, kv_dtype)
        self.allocator = PageAllocator(n_pages)
        self.tables = np.full(
            (self.max_streams, self.pages_per_stream),
            PageAllocator.TRASH,
            np.int32,
        )
        self.stream_pages: list[list[int]] = [
            [] for _ in range(self.max_streams)
        ]

    # -- paging -------------------------------------------------------------

    def _ensure_pages(self, slot: int, upto_logical: int) -> None:
        """Allocate pages so logical positions [0, upto_logical] are backed."""
        need = upto_logical // self.page_size
        for j in range(need + 1):
            if self.tables[slot, j] == PageAllocator.TRASH:
                (p,) = self.allocator.alloc(1)
                self.tables[slot, j] = p
                self.stream_pages[slot].append(p)

    def _on_slot_released(self, slot: int) -> None:
        self.allocator.release(self.stream_pages[slot])
        self.stream_pages[slot] = []
        self.tables[slot, :] = PageAllocator.TRASH

    def _window_pages(self) -> int:
        max_past = max(
            (s.n_past for s in self.slots if s is not None), default=0
        )
        return max(1, -(-(max_past + 1) // self.page_size))

    def _admit(self) -> None:
        from llm_tpu.serve import ContextFull

        for slot in range(self.max_streams):
            if self.slots[slot] is not None or not self.pending:
                continue
            stream = self.pending.pop(0)
            try:
                self._prefill(stream, slot)
                self.slots[slot] = stream
            except ContextFull:
                self._on_slot_released(slot)
                self._retire(stream, "context_full")
            except MemoryError:
                self._on_slot_released(slot)
                # If the stream could NEVER fit (its prompt needs more pages
                # than the whole pool) or nothing else holds pages that could
                # free up, requeuing would busy-loop generate_all() forever:
                # retire with kv_oom instead.
                need = -(-len(stream.tokens or [1]) // self.page_size)
                pool_capacity = self.pool.n_pages - 1  # minus trash page
                others_hold_pages = any(
                    self.stream_pages[s2]
                    for s2 in range(self.max_streams)
                    if s2 != slot
                )
                if need > pool_capacity or not others_hold_pages:
                    self._retire(stream, "kv_oom")
                    continue
                # pool exhausted transiently: requeue and wait for pages
                self.pending.insert(0, stream)
                break

    # -- prefill / decode ---------------------------------------------------

    def _prefill(self, stream, slot: int) -> None:
        from llm_tpu.serve import ContextFull
        from llm_tpu.tokenizer import Prompt

        spec = self.spec
        prompt_tokens = Prompt.of(stream.request.prompt).to_tokens(
            self.model.tokenizer, True
        )
        if len(prompt_tokens) >= spec.n_ctx:
            raise ContextFull()
        stream.tokens = list(prompt_tokens)
        if not self.model.tokenizer.is_embedded:
            stream.decoded_len = len(
                self.model.tokenizer.decode(stream.tokens, True)
            )
        n_past_vec = np.zeros(self.max_streams, np.int32)
        for s2, st in enumerate(self.slots):
            if st is not None:
                n_past_vec[s2] = st.n_past

        pos = 0
        for start in range(0, len(prompt_tokens), self.n_batch):
            chunk = prompt_tokens[start : start + self.n_batch]
            self._ensure_pages(slot, pos + len(chunk) - 1)
            ids = np.zeros((self.max_streams, self.n_batch), np.int32)
            ids[slot, : len(chunk)] = chunk
            n_past_vec[slot] = pos
            wp = max(
                self._window_pages(),
                -(-(pos + len(chunk)) // self.page_size),
            )
            logits, _, self.pool = paged_step(
                spec, self.params, jnp.asarray(ids),
                jnp.asarray(n_past_vec), jnp.asarray(self.tables),
                self.pool, wp,
            )
            pos += len(chunk)
            stream.last_logits = np.asarray(logits)[slot, len(chunk) - 1]
        stream.n_past = pos

    def step(self):
        """One decode step across active streams (host-side sampling)."""
        from llm_tpu.samplers import sample_token

        self._admit()
        events = self._drain_retired()
        if self.active == 0:
            return events
        spec = self.spec
        ids = np.zeros((self.max_streams, 1), np.int32)
        n_past = np.zeros(self.max_streams, np.int32)
        sampled = {}
        for slot, stream in enumerate(self.slots):
            if stream is None:
                continue
            tok = sample_token(
                stream.sampler, stream.rng, stream.tokens, stream.last_logits
            )
            try:
                self._ensure_pages(slot, stream.n_past)
            except MemoryError:
                # no page for the next token: retire the stream
                self._retire(stream, "kv_oom", slot=slot)
                continue
            sampled[slot] = tok
            ids[slot, 0] = tok
            n_past[slot] = stream.n_past

        events += self._drain_retired()
        if not sampled:
            return events
        wp = self._window_pages()
        logits, _, self.pool = paged_step(
            spec, self.params, jnp.asarray(ids), jnp.asarray(n_past),
            jnp.asarray(self.tables), self.pool, wp,
        )
        logits = np.asarray(logits)[:, 0, :]

        for slot, tok in sampled.items():
            events.append(
                self._finish_token(slot, self.slots[slot], tok, logits[slot])
            )
        return events

    def step_multi(self, n_steps: int = 16):
        """Multi-step on-device decode is not paged yet; fall back to
        single steps (page allocation must interleave with generation)."""
        return self.step()
