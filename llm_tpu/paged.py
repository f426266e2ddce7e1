"""Paged KV cache: a shared page pool with per-stream page tables.

The reference's only long-context behavior is failing (ContextFull,
inference_session.rs:311-313); BASELINE.md's staged configs require an
"8K paged KV" mode. This module decouples KV memory from
max_streams x n_ctx: streams allocate fixed-size pages from a shared pool
as their context grows and release them when they finish, so total memory
tracks the TOKENS IN FLIGHT, not the worst case.

Layout (layer-major; heads ABOVE positions so the Pallas kernel's
per-(stream, head) page blocks are contiguous page*D runs):

    pool.k/v          [L, n_pages, H_kv, page, D]   (bf16/f32 or int8)
    pool.k/v_scale    [L, n_pages, H_kv, page] f32  (int8 pools only)
    page_table        [B, P] int32 physical page ids (logical order)
    n_past            [B]

Attention streams pages in LOGICAL order with an online softmax (the
`online_pass` hook of models/forward._attention_batched): each page is
looked up through the table and folded into running (max, denom, acc)
state, so the windowed K/V is never materialized as a contiguous copy
and positions/masks/RoPE/ALiBi are identical to the dense path —
correctness is checked by equality against the dense engine. On TPU the
per-layer pass is a Pallas kernel with the page table as a
scalar-prefetch operand (ops/paged_attention.py), reading pages directly
from HBM; elsewhere a lax.scan over pages provides the same math.
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
from llm_tpu.ops.layers import alibi_slopes
from llm_tpu.ops.qmatmul import qmatmul, quant_rows_lookup

NEG_INF = -1e30


@_register
@dataclass
class PagedKVCache:
    k: jnp.ndarray  # [L, n_pages, H_kv, page, D]
    v: jnp.ndarray
    k_scale: Optional[jnp.ndarray] = None  # [L, n_pages, H_kv, page] f32
    v_scale: Optional[jnp.ndarray] = None

    @property
    def page_size(self) -> int:
        return self.k.shape[3]

    @property
    def n_pages(self) -> int:
        return self.k.shape[1]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def bits(self) -> Optional[int]:
        """Quantized pool width: 8 (int8 codes), 4 (planar nibble-packed
        uint8, ops/packing.pack_int4_rows layout), None (bf16/f32)."""
        if self.k_scale is None:
            return None
        return 4 if self.k.dtype == jnp.uint8 else 8

    @property
    def qmax(self) -> Optional[float]:
        """Code range of the quantized pool (scale = amax / qmax)."""
        bits = self.bits
        return None if bits is None else (7.0 if bits == 4 else 127.0)


def init_paged_cache(
    spec: ModelSpec, n_pages: int, page_size: int = 256, dtype=jnp.bfloat16
) -> PagedKVCache:
    shape = (spec.n_layer, n_pages, spec.n_head_kv, page_size, spec.head_dim)
    if dtype == "int4":
        # planar nibble packing halves the page bytes vs int8 — at 64-
        # stream 7B serving the KV page reads are ~55% of step traffic,
        # so this is the big serving-throughput lever (scales stay f32
        # per row: their traffic is D/2-fold smaller than the codes)
        assert spec.head_dim % 2 == 0
        packed = shape[:-1] + (spec.head_dim // 2,)
        return PagedKVCache(
            k=jnp.zeros(packed, jnp.uint8),
            v=jnp.zeros(packed, jnp.uint8),
            k_scale=jnp.zeros(shape[:-1], jnp.float32),
            v_scale=jnp.zeros(shape[:-1], jnp.float32),
        )
    if dtype in (jnp.int8, "int8"):
        return PagedKVCache(
            k=jnp.zeros(shape, jnp.int8),
            v=jnp.zeros(shape, jnp.int8),
            k_scale=jnp.zeros(shape[:-1], jnp.float32),
            v_scale=jnp.zeros(shape[:-1], jnp.float32),
        )
    return PagedKVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


class PageAllocator:
    """Host-side free-list allocator over the physical pages.

    Physical page 0 is RESERVED as the trash page: unallocated page-table
    entries point at it, so dummy writes from inactive/boundary streams land
    somewhere harmless and reads of unallocated entries see masked
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


class PrefixCache:
    """Prompt-prefix KV reuse at page granularity.

    The KV rows of position p depend only on tokens[0..p] (causal attention;
    RoPE/ALiBi are functions of absolute position), so a FULL page whose
    covering token prefix matches a new request's prompt can be shared
    verbatim — no copy, no recompute. Full prompt pages are registered here,
    content-addressed by a ROLLING SHA-256 over the token prefix (one
    linear hashing pass per prompt instead of O(prompt^2) byte keys;
    collision odds ~2^-128, i.e. reuse is exact for all practical
    purposes); admission borrows the longest registered chain and starts
    prefill at the matched page boundary.

    Pages are refcounted by the number of page-table rows pointing at them;
    at refcount 0 they stay cached (LRU) and are evicted back to the free
    list only under pool pressure. Shared pages are never written: a borrow
    is a whole-page-aligned prefix no longer than the prompt, so every
    write position of the borrowing stream lands in pages past the
    borrowed chain — a strict-prefix borrow prefills its tail into owned
    pages, and an EXACT borrow (all pages + cached final logits) starts
    decoding at position len(prompt), i.e. the next page (decode overshoot
    in step_multi only writes at positions >= n_past, past every full
    page).

    No reference analog (the reference is single-stream); this is the
    standard production-serving optimization for repeated system prompts.
    """

    #: bound on cached last-token logits rows (host RAM: ~V floats each).
    LOGITS_CAP = 32

    def __init__(self):
        self.by_key: dict[bytes, int] = {}  # prefix digest -> page id
        self.key_of: dict[int, bytes] = {}
        self.refs: dict[int, int] = {}  # page id -> #table rows using it
        self.lru: dict[int, None] = {}  # refcount-0 pages, insertion-ordered
        # full-prompt digest -> last-token logits row (np [V]), LRU-bounded.
        # Lets an EXACT page-aligned repeat skip prefill entirely: the
        # borrowed pages already hold every KV row of the prompt, and the
        # only other thing admission needs is the logits of the final
        # prompt position — a pure function of the tokens, so it is as
        # content-addressable as the pages are.
        self.logits_by_key: dict[bytes, np.ndarray] = {}

    @staticmethod
    def digests(tokens, page_size: int, n_pages: int) -> list[bytes]:
        """Rolling per-page-boundary digests: digests[j] covers
        tokens[: (j+1)*page_size]. One linear pass."""
        import hashlib

        h = hashlib.sha256()
        out = []
        arr = np.asarray(tokens[: n_pages * page_size], np.int32)
        for j in range(n_pages):
            h.update(arr[j * page_size : (j + 1) * page_size].tobytes())
            out.append(h.digest())
        return out

    def register(self, digest: bytes, pid: int) -> None:
        """Register physical page `pid` under its covering-prefix digest.
        The registering stream holds the first reference. First
        registration wins (a racing duplicate stays an ordinary owned page
        and is freed on release)."""
        if digest in self.by_key or pid in self.refs:
            return
        self.by_key[digest] = pid
        self.key_of[pid] = digest
        self.refs[pid] = 1

    def match(self, tokens, page_size: int) -> list[int]:
        """Longest registered chain of full pages covering a strict prefix
        of `tokens` (at least one token is always left to prefill, so the
        borrower never writes into a shared page). Takes references."""
        limit = (len(tokens) - 1) // page_size
        return self.match_digests(self.digests(tokens, page_size, limit))

    def match_digests(self, digests) -> list[int]:
        """match() on a precomputed digest chain (admission hashes the
        prompt ONCE and feeds every lookup from the same list)."""
        chain: list[int] = []
        for d in digests:
            pid = self.by_key.get(d)
            if pid is None:
                break  # a chain with a hole is unusable past the hole
            chain.append(pid)
        for pid in chain:
            self.acquire(pid)
        return chain

    def register_logits(self, digest: bytes, row) -> None:
        """Cache the last-token logits of an exactly page-aligned prompt
        under its full-prompt digest (LRU-bounded at LOGITS_CAP rows)."""
        self.logits_by_key.pop(digest, None)
        self.logits_by_key[digest] = np.array(row, np.float32)
        while len(self.logits_by_key) > self.LOGITS_CAP:
            del self.logits_by_key[next(iter(self.logits_by_key))]

    def match_logits(self, digest: bytes):
        """Cached last-token logits for this exact prompt, or None. A hit
        refreshes LRU order; the caller gets a private copy."""
        row = self.logits_by_key.pop(digest, None)
        if row is None:
            return None
        self.logits_by_key[digest] = row
        return np.array(row)

    def acquire(self, pid: int) -> None:
        self.refs[pid] += 1
        self.lru.pop(pid, None)

    def dec(self, pid: int) -> None:
        """Drop one reference; at zero the page becomes evictable but stays
        cached until the allocator needs it."""
        self.refs[pid] -= 1
        if self.refs[pid] == 0:
            self.lru[pid] = None

    def evict(self, n: int) -> list[int]:
        """Drop up to n least-recently-released refcount-0 pages from the
        cache, returning them for the free list."""
        out = []
        while self.lru and len(out) < n:
            pid = next(iter(self.lru))
            del self.lru[pid]
            del self.by_key[self.key_of.pop(pid)]
            del self.refs[pid]
            out.append(pid)
        return out

    @property
    def evictable(self) -> int:
        return len(self.lru)


def _paged_online_pass(
    spec: ModelSpec,
    qf: jnp.ndarray,  # [B, T, Hkv, rep, D] f32
    *,
    pool_k,  # [L, NP, Hkv, page, D] the FULL pool (gathered per page —
    pool_v,  # no per-layer slice copy)
    ks,  # [L, NP, Hkv, page] f32 | None
    vs,
    layer,  # scalar int32
    tables: jnp.ndarray,  # [B, P]
    n_past: jnp.ndarray,  # [B]
    slopes,  # [Hkv, rep] | None
    window_pages: int,
):
    """lax.scan over logical pages with an online softmax: page j of every
    stream is looked up through its table, dequantized (int8 pools) and
    folded into running (m, l, acc). Peak extra memory is ONE page per
    stream instead of the whole window."""
    B, T, Hkv, rep, D = qf.shape
    page = pool_k.shape[3]

    packed = pool_k.dtype == jnp.uint8  # int4 pool (planar nibbles)

    def body(carry, j):
        m, l, acc = carry
        sel = jnp.take(tables, j, axis=1)  # [B] physical page ids
        if packed:
            from llm_tpu.ops.packing import unpack_int4_rows

            kf = unpack_int4_rows(pool_k[layer, sel])  # [B, Hkv, page, D]
            vf = unpack_int4_rows(pool_v[layer, sel])
        else:
            kf = pool_k[layer, sel].astype(jnp.float32)  # [B, Hkv, page, D]
            vf = pool_v[layer, sel].astype(jnp.float32)
        if ks is not None:
            kf = kf * ks[layer, sel][..., None]
            vf = vf * vs[layer, sel][..., None]
        pos = j * page + jnp.arange(page, dtype=jnp.int32)
        s = (
            jnp.einsum("bthrd,bhsd->bthrs", qf, kf,
                       preferred_element_type=jnp.float32)
            * spec.kq_scale
        )
        if slopes is not None:
            s = s + (
                slopes[None, None, :, :, None]
                * pos.astype(jnp.float32)[None, None, None, None, :]
            )
        valid = pos[None, :] < n_past[:, None]  # [B, page]
        valid = jnp.broadcast_to(valid[:, None, :], (B, T, page))
        valid = valid[:, :, None, None, :]
        s = jnp.where(valid, s, NEG_INF)
        m_new = jnp.maximum(m, s.max(axis=-1))
        p = jnp.where(valid, jnp.exp(s - m_new[..., None]), 0.0)
        corr = jnp.exp(m - m_new)
        l = l * corr + p.sum(axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "bthrs,bhsd->bthrd", p, vf, preferred_element_type=jnp.float32
        )
        return (m_new, l, acc), None

    init = (
        jnp.full((B, T, Hkv, rep), NEG_INF, jnp.float32),
        jnp.zeros((B, T, Hkv, rep), jnp.float32),
        jnp.zeros((B, T, Hkv, rep, D), jnp.float32),
    )
    (m, l, acc), _ = lax.scan(
        body, init, jnp.arange(window_pages, dtype=jnp.int32)
    )
    return m, l, acc


def _fold_block_rows(
    spec,
    blk_k,  # [S', L, B, Hkv, D] step-major block-local rows
    blk_v,
    blk_ks,  # [S', L, B, Hkv] | None
    blk_vs,
    base_past,  # [B] block-start positions (row j is global base+j)
    n_past,  # [B] current positions (rows [0, n_past-base) are live)
    layer,  # scalar int32
    slopes,
    qf,  # [B, T, Hkv, rep, D]
    m, l, acc,
):
    """Fold the block-local decode rows into a running online-softmax
    state — the second fold of the block-buffered decode loop (the pool
    pass covers positions < base_past; rows written this block live here
    until the end-of-block scatter)."""
    Sp = blk_k.shape[0]
    kf = blk_k[:, layer].astype(jnp.float32)  # [S', B, H, D]
    vf = blk_v[:, layer].astype(jnp.float32)
    if blk_ks is not None:
        kf = kf * blk_ks[:, layer][..., None]
        vf = vf * blk_vs[:, layer][..., None]
    s = (
        jnp.einsum("bthrd,sbhd->bthrs", qf, kf,
                   preferred_element_type=jnp.float32)
        * spec.kq_scale
    )
    pos = base_past[:, None] + jnp.arange(Sp, dtype=jnp.int32)[None, :]
    if slopes is not None:
        s = s + (
            slopes[None, None, :, :, None]
            * pos.astype(jnp.float32)[:, None, None, None, :]
        )
    valid = pos < n_past[:, None]  # [B, S']
    v5 = valid[:, None, None, None, :]
    s = jnp.where(v5, s, NEG_INF)
    m_new = jnp.maximum(m, s.max(axis=-1))
    p = jnp.where(v5, jnp.exp(s - m_new[..., None]), 0.0)
    corr = jnp.exp(m - m_new)
    l = l * corr + p.sum(axis=-1)
    acc = acc * corr[..., None] + jnp.einsum(
        "bthrs,sbhd->bthrd", p, vf, preferred_element_type=jnp.float32
    )
    return m_new, l, acc


def paged_forward_batched(
    spec: ModelSpec,
    params,
    ids: jnp.ndarray,  # [B, T]
    n_past: jnp.ndarray,  # [B]
    tables: jnp.ndarray,  # [B, P] physical page ids
    cache: PagedKVCache,
    window_pages: int,  # static: logical pages covered by attention reads
    allow_kernel: bool = True,  # False under a mesh: the Pallas kernel is
    #                             not SPMD-partitioned; the jnp page scan is
    block_kv=None,  # (blk_k, blk_v, blk_ks, blk_vs, base_past): block-
    #                 buffered decode — the pool pass masks at base_past and
    #                 rows [base, n_past) fold from this step-major buffer
    return_rows: bool = False,  # skip the pool scatter; return the new rows
):
    """Batched forward over paged caches. Returns (logits, hidden, cache)
    — or (logits, hidden, (k_news, v_news)) with `return_rows` (the block-
    buffered decode loop scatters once per block instead).

    Every (n_past + t) write position must fall inside an allocated page of
    `tables`; reads only touch positions < n_past, so `window_pages` just
    needs to cover max(n_past) + T.
    """
    B, T = ids.shape
    page = cache.page_size
    quantized = cache.quantized
    positions = n_past[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
    pool_past = n_past if block_kv is None else block_kv[4]
    slopes = (
        alibi_slopes(spec.n_head, spec.alibi_bias_max).reshape(
            spec.n_head_kv, spec.n_head // spec.n_head_kv
        )
        if spec.alibi_bias_max > 0.0
        else None
    )

    h = quant_rows_lookup(params.wte, ids.reshape(-1)).reshape(B, T, -1)
    if spec.post_embed_norm:
        h = layer_norm(h, params.emb_norm_w, params.emb_norm_b)
    if spec.learned_pos:
        h = h + quant_rows_lookup(params.wpe, positions.reshape(-1)).reshape(
            B, T, -1
        )

    from llm_tpu.ops.paged_attention import paged_attention_pass, kernel_ok

    use_kernel = allow_kernel and kernel_ok(spec, T, page)

    def body(carry, l):
        layer = _LayerView(params.layers, l)
        if use_kernel:
            pool_pass = partial(
                paged_attention_pass,
                spec, cache.k, cache.v, cache.k_scale, cache.v_scale,
                tables, pool_past, slopes, window_pages, l,
            )
        else:
            pool_pass = partial(
                _paged_online_pass,
                spec,
                pool_k=cache.k, pool_v=cache.v,
                ks=cache.k_scale, vs=cache.v_scale, layer=l,
                tables=tables, n_past=pool_past, slopes=slopes,
                window_pages=window_pages,
            )
        if block_kv is None:
            online = pool_pass
        else:
            blk_k, blk_v, blk_ks, blk_vs, base_past = block_kv

            def online(qf):
                m, l_, acc = pool_pass(qf)
                return _fold_block_rows(
                    spec, blk_k, blk_v, blk_ks, blk_vs, base_past, n_past,
                    l, slopes, qf, m, l_, acc,
                )
        hh, k_new, v_new = _layer_batched(
            spec, carry, layer, positions, n_past, (None, None), (None, None),
            online_pass=online,
            # int4 pools quantize in-flight rows at qmax=7 so the scores
            # seen this step bit-match the codes the pool will hold
            quantize_kv=(cache.qmax if quantized else False),
        )
        return hh, (k_new, v_new)

    h, (k_news, v_news) = lax.scan(
        body, h, jnp.arange(spec.n_layer, dtype=jnp.int32)
    )
    if return_rows:
        logits2, h2, _ = _paged_head(spec, params, h, B, T, None)
        return logits2, h2, (k_news, v_news)
    new_cache = scatter_rows(cache, k_news, v_news, positions, tables)
    return _paged_head(spec, params, h, B, T, new_cache)


def scatter_rows(cache, k_news, v_news, positions, tables):
    """Scatter new rows (k_news [L, B, T, H, D] — or (codes, scales) tuples
    for int8 pools) into their physical page slots at `positions` [B, T].

    Positions whose logical page is beyond the table (dummy writes of
    inactive/boundary streams) are redirected to the TRASH page — without
    this, take_along_axis would clamp to the stream's LAST allocated page
    and corrupt live entries."""
    page = cache.page_size
    quantized = cache.quantized
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
    # one flat destination index per (token, head): (page*Hkv + h)*page_sz
    # + offset over the pool flattened to [L, NP*Hkv*page(, D)] — a SINGLE
    # adjacent-advanced-index scatter (a [:, pp, :, oo] form with the page
    # and offset axes apart would make XLA materialize a transposed copy
    # of the whole multi-GB pool and OOM at 7B scale)
    Hkv = cache.k.shape[2]
    # destination (page*Hkv + h) rows over the pool's fused (NP, Hkv) axes
    # plus the page offset — TWO ADJACENT advanced indices, so XLA emits a
    # plain scatter with the batch dims in place (a non-adjacent [:, pp, :,
    # oo] form would transpose a copy of the whole multi-GB pool and OOM)
    rows = pp[:, None] * Hkv + jnp.arange(Hkv, dtype=jnp.int32)[None, :]
    offs = jnp.broadcast_to(oo[:, None], rows.shape)  # [B*T, Hkv]

    def scatter(pool, new):
        # pool [L, NP, Hkv, page(, D)]; new [L, B, T, H(, D)]
        L = new.shape[0]
        tail = pool.shape[4:]  # (D,) or ()
        flat_pool = pool.reshape((L, -1, page) + tail)  # [L, NP*Hkv, page(,D)]
        flat_new = new.reshape((L, -1, Hkv) + tail)  # [L, BT, H(, D)]
        out = flat_pool.at[:, rows, offs].set(flat_new.astype(pool.dtype))
        return out.reshape(pool.shape)

    if quantized:
        kq, ks = k_news  # attention already emits (codes, scales)
        vq, vs = v_news
        if cache.bits == 4:  # planar-pack rows to the pool's nibble layout
            from llm_tpu.ops.packing import pack_int4_rows

            kq, vq = pack_int4_rows(kq), pack_int4_rows(vq)
        return PagedKVCache(
            scatter(cache.k, kq),
            scatter(cache.v, vq),
            scatter(cache.k_scale, ks),
            scatter(cache.v_scale, vs),
        )
    return PagedKVCache(
        scatter(cache.k, k_news), scatter(cache.v, v_news)
    )


def _paged_head(spec, params, h, B, T, new_cache):
    """Final norm + lm_head, shared by the scatter and return_rows paths."""
    E = h.shape[-1]
    h = _norm(spec, h, params.final_norm_w, params.final_norm_b)
    head = params.lm_head if params.lm_head is not None else params.wte
    logits = qmatmul(h.reshape(B * T, E), head)
    if params.lm_head_b is not None:
        logits = logits + params.lm_head_b
    return (
        logits.reshape(B, T, -1).astype(jnp.float32),
        h.astype(jnp.float32),
        new_cache,
    )


@partial(jax.jit, static_argnums=(0, 6, 7), donate_argnums=(5,))
def paged_step(spec, params, ids, n_past, tables, cache, window_pages,
               allow_kernel=True):
    return paged_forward_batched(
        spec, params, ids, n_past, tables, cache, window_pages, allow_kernel
    )


@partial(jax.jit, static_argnums=(0, 6, 7, 8, 11, 13, 14),
         donate_argnums=(5,))
def paged_decode_loop(
    spec,
    params,
    last_logits,  # [B, V] f32
    n_past,  # [B] int32
    tables,  # [B, P]
    cache,  # PagedKVCache (donated)
    n_steps: int,
    window_pages: int,
    sampler=None,
    key=None,
    sampler_values=None,  # traced per-stream values (BatchedDeviceSampler)
    allow_kernel: bool = True,
    penalty_state=None,  # sampler state pytree (penalties / mirostat mu)
    logprobs_n: Optional[int] = None,  # static: top-N alternatives per step
    return_state: bool = False,  # static: append the final sampler state
):
    """Multi-token paged decode fully on device: B streams x n_steps tokens
    per dispatch (sample-then-evaluate per step, like decode_loop_batched).
    The host pre-allocates pages covering n_past + n_steps for every active
    stream, so the tables are static for the whole block; EoT overshoot is
    rewound host-side (positions beyond n_past stay masked). With
    `logprobs_n` a fifth return element carries per-step sampled-token
    logprobs (+ top-N values/ids)."""
    from llm_tpu.ops.sampling import DeviceSampler, device_sample_step

    sampler = sampler or DeviceSampler.greedy()
    key = key if key is not None else jax.random.PRNGKey(0)

    # Block-local KV buffer, STEP-MAJOR [n_steps, L, B, Hkv, D]: each
    # step's new rows land as ONE contiguous dynamic_update_slice, and the
    # pool is written ONCE per block. Scattering every step instead costs
    # L*B*Hkv separate 128-byte runs per step — ablated on chip at 7B
    # B=64: 1526 -> 2485 tok/s aggregate with the per-step scatter removed.
    # During the block the pool pass masks at the BLOCK-START positions
    # (pool rows past base are stale) and _fold_block_rows covers
    # [base, n_past).
    L = spec.n_layer
    B = n_past.shape[0]
    Hkv, D = spec.n_head_kv, spec.head_dim
    quantized = cache.quantized
    # int4 pools keep block-local rows as UNPACKED int8 codes (the block
    # buffer is small); only the end-of-block scatter packs nibbles
    kdt = jnp.int8 if cache.bits == 4 else cache.k.dtype
    blk_shape = (n_steps, L, B, Hkv, D)
    blk0 = (
        jnp.zeros(blk_shape, kdt),
        jnp.zeros(blk_shape, kdt),
        jnp.zeros(blk_shape[:-1], jnp.float32) if quantized else None,
        jnp.zeros(blk_shape[:-1], jnp.float32) if quantized else None,
    )
    base = n_past

    has_mu = (return_state and isinstance(penalty_state, dict)
              and "mu" in penalty_state)  # per-step mu (see decode_loop)

    def step(carry, i):
        logits, npast, blk, k, pst = carry
        k, sub = jax.random.split(k)
        toks, pst = device_sample_step(logits, sub, sampler,
                                       sampler_values, pst)
        out = toks
        if logprobs_n is not None:
            logz = jax.nn.log_softmax(logits, axis=-1)
            lp = jnp.take_along_axis(logz, toks[:, None], axis=1)[:, 0]
            topv, topi = lax.top_k(logz, max(logprobs_n, 1))
            out = (toks, lp, topv, topi)
        if has_mu:
            out = (out, pst["mu"])
        new_logits, _, (k_new, v_new) = paged_forward_batched(
            spec, params, toks[:, None], npast, tables, cache, window_pages,
            allow_kernel, block_kv=blk + (base,), return_rows=True,
        )
        bk, bv, bks, bvs = blk
        if quantized:
            (kq, ksc), (vq, vsc) = k_new, v_new  # codes [L,B,1,H,D]
            bk = lax.dynamic_update_slice(
                bk, kq[:, :, 0][None], (i, 0, 0, 0, 0))
            bv = lax.dynamic_update_slice(
                bv, vq[:, :, 0][None], (i, 0, 0, 0, 0))
            bks = lax.dynamic_update_slice(
                bks, ksc[:, :, 0][None], (i, 0, 0, 0))
            bvs = lax.dynamic_update_slice(
                bvs, vsc[:, :, 0][None], (i, 0, 0, 0))
        else:
            bk = lax.dynamic_update_slice(
                bk, k_new[:, :, 0][None].astype(kdt), (i, 0, 0, 0, 0))
            bv = lax.dynamic_update_slice(
                bv, v_new[:, :, 0][None].astype(kdt), (i, 0, 0, 0, 0))
        return (new_logits[:, 0, :], npast + 1, (bk, bv, bks, bvs), k,
                pst), out

    (logits, npast, blk, _, pst), ys = lax.scan(
        step,
        (jnp.asarray(last_logits, jnp.float32), n_past, blk0, key,
         penalty_state),
        jnp.arange(n_steps, dtype=jnp.int32),
    )
    # end-of-block flush: ONE scatter of all n_steps rows per stream
    bk, bv, bks, bvs = blk
    positions = base[:, None] + jnp.arange(n_steps, dtype=jnp.int32)[None, :]
    to_lbt = lambda a: jnp.moveaxis(a, 0, 2)  # [S',L,B,..] -> [L,B,S',..]
    if quantized:
        cache = scatter_rows(
            cache, (to_lbt(bk), to_lbt(bks)), (to_lbt(bv), to_lbt(bvs)),
            positions, tables,
        )
    else:
        cache = scatter_rows(cache, to_lbt(bk), to_lbt(bv), positions,
                             tables)
    if has_mu:
        ys, mus = ys
        pst = dict(pst, mu_steps=mus)  # [n_steps, B]: mu AFTER step i
    extras = (pst,) if return_state else ()
    if logprobs_n is not None:
        all_toks, lp, topv, topi = ys
        return (all_toks, logits, npast, cache) + extras + ((lp, topv, topi),)
    return (ys, logits, npast, cache) + extras if extras else (
        ys, logits, npast, cache
    )


# ---------------------------------------------------------------------------
# paged continuous-batching engine


from llm_tpu.serve import Engine  # noqa: E402  (host-side plumbing shared)


@partial(jax.jit, donate_argnums=(0,))
def _copy_page_jit(pool: PagedKVCache, src, dst) -> PagedKVCache:
    """Copy one physical page's rows (all layers, K+V+scales) src -> dst
    in place on the donated pool — the prefix cache's copy-on-write tail."""

    def cp(a):
        if a is None:
            return None
        return lax.dynamic_update_index_in_dim(
            a, lax.dynamic_index_in_dim(a, src, 1, keepdims=False), dst, 1
        )

    return PagedKVCache(cp(pool.k), cp(pool.v), cp(pool.k_scale),
                        cp(pool.v_scale))


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
        mesh=None,
        prefix_cache: bool = False,
    ):
        self.page_size = page_size
        self._n_pages_requested = n_pages
        self.prefix_cache = PrefixCache() if prefix_cache else None
        super().__init__(model, max_streams, kv_dtype, n_batch, mesh=mesh)

    def _init_device_state(self, kv_dtype, mesh) -> None:
        # Under a TP mesh the page pool shards over kv heads and the jnp
        # page-scan pass runs under GSPMD (the Pallas kernel is not
        # SPMD-partitioned; single-chip keeps the kernel).
        self._allow_kernel = mesh is None
        if mesh is not None:
            from llm_tpu.parallel import shard_params

            self.params = shard_params(self.model.params, mesh)
        self.pages_per_stream = -(-self.spec.n_ctx // self.page_size)
        n_pages = self._n_pages_requested
        if n_pages is None:
            # default: every stream can reach full context (+1 trash page)
            n_pages = 1 + self.max_streams * self.pages_per_stream
        self.pool = init_paged_cache(self.spec, n_pages, self.page_size, kv_dtype)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from llm_tpu.parallel.sharding import _put

            spec_kv = P(None, None, "model", None, None)
            spec_sc = P(None, None, "model", None)
            self.pool = PagedKVCache(
                _put(self.pool.k, mesh, spec_kv),
                _put(self.pool.v, mesh, spec_kv),
                _put(self.pool.k_scale, mesh, spec_sc),
                _put(self.pool.v_scale, mesh, spec_sc),
            )
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

    def _alloc(self, n: int = 1) -> list[int]:
        """Allocate from the free list, evicting refcount-0 prefix-cache
        pages under pressure."""
        if self.prefix_cache is not None:
            short = n - self.allocator.available
            if short > 0:
                self.allocator.release(self.prefix_cache.evict(short))
        return self.allocator.alloc(n)

    def _ensure_pages(self, slot: int, upto_logical: int) -> None:
        """Allocate pages so logical positions [0, upto_logical] are backed."""
        need = upto_logical // self.page_size
        for j in range(need + 1):
            if self.tables[slot, j] == PageAllocator.TRASH:
                (p,) = self._alloc(1)
                self.tables[slot, j] = p
                self.stream_pages[slot].append(p)

    def _on_slot_released(self, slot: int) -> None:
        cache = self.prefix_cache
        if cache is None:
            self.allocator.release(self.stream_pages[slot])
        else:
            # registered pages (owned-and-published or borrowed) drop one
            # reference and stay cached; unregistered owned pages free
            for pid in {int(p) for p in self.tables[slot]}:
                if pid == PageAllocator.TRASH:
                    continue
                if pid in cache.refs:
                    cache.dec(pid)
                else:
                    self.allocator.release([pid])
        self.stream_pages[slot] = []
        self.tables[slot, :] = PageAllocator.TRASH

    def _begin_prefill(self, stream, slot: int) -> None:
        super()._begin_prefill(stream, slot)
        cache = self.prefix_cache
        if cache is None:
            return
        q = stream.prefill_queue
        ps = self.page_size
        # ONE hashing pass feeds every lookup below (exact-hit, strict
        # borrow, and CoW previously each re-digested the whole prompt on
        # this TTFT-critical path — advisor r4)
        aligned = len(q) >= ps and len(q) % ps == 0
        digs = cache.digests(q, ps, len(q) // ps)
        # EXACT-hit fast path (round 4): a page-aligned prompt whose every
        # page AND final-position logits are cached needs no forward pass
        # at all. The pages are borrowed read-only (decode writes start at
        # position len(q), i.e. the next page), and last_logits comes from
        # the logits cache — admission to first sampled token is ONE
        # decode dispatch. Pages are checked FIRST: without them the
        # logits row is useless, and a miss then skips the row copy +
        # LRU churn.
        if aligned and all(d in cache.by_key for d in digs):
            row = cache.match_logits(digs[-1])
            if row is not None:
                pids = [cache.by_key[d] for d in digs]
                for pid in pids:
                    cache.acquire(pid)
                for j, pid in enumerate(pids):
                    self.tables[slot, j] = pid
                stream.prefill_pos = len(q)
                stream.n_past = len(q)
                stream.last_logits = row
                stream.prefilling = False
                return
        chain = cache.match_digests(digs[: (len(q) - 1) // ps])
        # FULL-prefix hit, copy-on-write tail (round-4, VERDICT r3 item 6)
        # — the fallback when the pages survived but the logits row was
        # evicted: a strict-prefix borrow would re-prefill a whole page
        # (~half the 2-page bench prompt -> warm TTFT barely beat cold).
        # Instead COPY that cached page into a privately owned page and
        # re-evaluate only the LAST prompt token (its write lands in the
        # copy; last_logits comes from that real forward).
        cow = None
        if aligned and len(chain) == len(q) // ps - 1:
            src = cache.by_key.get(digs[-1])
            if src is not None:
                cache.acquire(src)  # pin across the alloc (eviction safety)
                try:
                    (dst,) = self._alloc(1)
                except MemoryError:
                    dst = None  # pool too tight; fall back to the chunk tail
                if dst is not None:
                    self.pool = _copy_page_jit(
                        self.pool, jnp.int32(src), jnp.int32(dst)
                    )
                    cow = dst
                cache.dec(src)
        if not chain and cow is None:
            return
        for j, pid in enumerate(chain):
            self.tables[slot, j] = pid
        if cow is not None:
            self.tables[slot, len(chain)] = cow
            self.stream_pages[slot].append(cow)  # owned, freed on release
            stream.prefill_pos = len(q) - 1
        else:
            # prefill resumes at the matched boundary; >=1 token remains
            # (match covers a strict prefix), so last_logits still comes
            # from a real forward over this stream's tail
            stream.prefill_pos = len(chain) * ps
        stream.n_past = stream.prefill_pos

    def _register_prompt_pages(self, stream, slot: int) -> list:
        """Publish this stream's freshly-filled FULL prompt pages (their
        covering token prefix is final once written). Returns the digest
        chain so completion can reuse it (one hashing pass)."""
        cache = self.prefix_cache
        if cache is None:
            return []
        full = stream.prefill_pos // self.page_size
        digests = cache.digests(stream.prefill_queue, self.page_size, full)
        for j in range(full):
            pid = int(self.tables[slot, j])
            if pid != PageAllocator.TRASH:
                cache.register(digests[j], pid)
        return digests

    def _window_pages(self, extra: int = 1) -> int:
        max_past = max(
            (s.n_past for s in self.slots if s is not None), default=0
        )
        wp = max(1, -(-(max_past + extra) // self.page_size))
        # never beyond the table width: positions >= n_ctx cannot exist,
        # and the kernel's scalar-prefetch tbl[b, j] must stay in bounds
        return min(wp, self.pages_per_stream)

    # -- prefill / decode ---------------------------------------------------

    def _prefill_chunk(self, stream, slot: int) -> None:
        """One prompt chunk through a B=1 paged forward — O(1) FLOPs in
        max_streams (the pool and this stream's table row are all the state
        a single-stream prefill touches). Raises MemoryError when the pool
        has no page for the chunk (the scheduler waits or retires)."""
        spec = self.spec
        toks = stream.prefill_queue
        pos = stream.prefill_pos
        chunk = toks[pos : pos + self.n_batch]
        self._ensure_pages(slot, pos + len(chunk) - 1)
        from llm_tpu.serve import _chunk_bucket

        bucket = _chunk_bucket(len(chunk), self.n_batch)
        ids = np.zeros((1, bucket), np.int32)
        ids[0, : len(chunk)] = chunk
        wp = -(-(pos + len(chunk)) // self.page_size)
        logits, _, self.pool = paged_step(
            spec, self.params, jnp.asarray(ids),
            jnp.asarray([pos], np.int32),
            jnp.asarray(self.tables[slot : slot + 1]),
            self.pool, wp, self._allow_kernel,
        )
        stream.prefill_pos = pos + len(chunk)
        stream.n_past = stream.prefill_pos
        # device-side row select (the full [1, chunk, V] logits are ~65 MB
        # at 7B/512; fetching them to use one row measured ~1.4 s per
        # prefill chunk on the axon tunnel)
        stream.last_logits = np.asarray(logits[0, len(chunk) - 1])
        digests = self._register_prompt_pages(stream, slot)
        if stream.prefill_pos >= len(toks):
            stream.prefilling = False
            cache = self.prefix_cache
            if (cache is not None and digests
                    and len(toks) % self.page_size == 0):
                # page-aligned completion: cache the final-position logits
                # so an exact repeat skips prefill entirely (digests[-1]
                # covers the whole prompt exactly here: prefill_pos ==
                # len(toks) and both are page-multiples)
                cache.register_logits(digests[-1], stream.last_logits)

    def step(self):
        """One decode step across decode-ready streams (host sampling);
        prefilling streams advance one chunk first."""

        self._admit()
        self._advance_prefills()
        events = self._drain_retired()
        decodable = self._decodable()
        if not decodable:
            return events
        spec = self.spec
        ids = np.zeros((self.max_streams, 1), np.int32)
        n_past = np.zeros(self.max_streams, np.int32)
        # dummy writes of prefilling slots land at their frontier (next
        # chunk overwrites) or on the trash page
        for slot, s in enumerate(self.slots):
            if s is not None and s.prefilling:
                n_past[slot] = s.prefill_pos
        sampled = {}
        for slot, stream in decodable:
            tok = self._host_sample(stream)
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
        wp = max(1, -(-(int(n_past.max()) + 1) // self.page_size))
        logits_dev, _, self.pool = paged_step(
            spec, self.params, jnp.asarray(ids), jnp.asarray(n_past),
            jnp.asarray(self.tables), self.pool, wp, self._allow_kernel,
        )
        # async-dispatch overlap (see Engine.step): the sampled tokens'
        # events fire while the device computes the NEXT logits — the
        # warm-prefix TTFT drops from one full tunnel round-trip to host
        # time. The tables were captured at dispatch, so a retirement
        # inside _finish_token cannot free a page this step still writes.
        emitted = []
        for slot, tok in sampled.items():
            stream = self.slots[slot]
            emitted.append((slot, stream))
            events.append(
                self._finish_token(slot, stream, tok, stream.last_logits)
            )
        logits = np.asarray(logits_dev)[:, 0, :]
        for slot, stream in emitted:
            stream.last_logits = logits[slot]
        return events

    # -- multi-step on-device decode ----------------------------------------

    def _plan_multi(self, active, n_steps: int) -> int:
        """Pre-allocate pages so every active stream can decode n_steps
        tokens without host intervention. Returns the n_steps that fits
        (0 = fall back to single stepping)."""
        while n_steps > 1:
            need = 0
            for slot, s in active:
                last = min(s.n_past + n_steps, self.spec.n_ctx) - 1
                have = sum(
                    1 for j in range(last // self.page_size + 1)
                    if self.tables[slot, j] != PageAllocator.TRASH
                )
                need += last // self.page_size + 1 - have
            avail = self.allocator.available + (
                self.prefix_cache.evictable if self.prefix_cache else 0
            )
            if need <= avail:
                break
            n_steps //= 2
        else:
            return 0
        try:
            for slot, s in active:
                self._ensure_pages(
                    slot, min(s.n_past + n_steps, self.spec.n_ctx) - 1
                )
        except MemoryError:  # raced estimate; be safe
            return 0
        return n_steps

    def _dispatch_multi(self, logits, n_past, n_steps, sampler, key,
                        values=None, write_mask=None, penalty_state=None,
                        logprobs_n=None, return_state=False):
        # the paged forward has no write mask: EMPTY slots' writes land on
        # the trash page (all-TRASH tables), but a PREFILLING slot's table
        # already maps page 0 to a real — possibly SHARED prefix — page,
        # so its dummy rows must park at the prefill frontier (the next
        # real chunk overwrites them), exactly like the per-token step
        n_past = np.array(n_past)
        for slot, s in enumerate(self.slots):
            if s is not None and s.prefilling:
                n_past[slot] = s.prefill_pos
        active = self._decodable()
        n_steps = self._plan_multi(active, n_steps)
        if n_steps == 0:
            return None
        wp = self._window_pages(extra=n_steps)
        out = list(paged_decode_loop(
            self.spec, self.params, jnp.asarray(logits),
            jnp.asarray(n_past), jnp.asarray(self.tables), self.pool,
            n_steps, wp, sampler, key, values, self._allow_kernel,
            penalty_state, logprobs_n, return_state,
        ))
        from llm_tpu.models.forward import unpack_decode_out

        toks, last_logits, _, self.pool, fstate, lp = unpack_decode_out(
            out, return_state, logprobs_n
        )
        if lp is not None:
            lp = tuple(np.asarray(a) for a in lp)
        return np.asarray(toks), np.asarray(last_logits), n_steps, lp, fstate
