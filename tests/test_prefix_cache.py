"""Prompt-prefix KV reuse at page granularity (PagedEngine prefix_cache).

Correctness oracle: outputs must equal the non-cached engine exactly (the
borrowed pages hold bit-identical KV — position-dependent terms are
functions of absolute position, which matches by construction)."""

import jax.numpy as jnp
import numpy as np
import pytest

from llm_tpu.loader import ModelParameters, load
from llm_tpu.paged import PageAllocator, PagedEngine, PrefixCache
from llm_tpu.samplers import DeterministicSampler
from llm_tpu.serve import GenerationRequest
from llm_tpu.testing import make_tiny_file


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("pc") / "llama.bin"
    make_tiny_file("llama", path)
    return load(path, "llama", params=ModelParameters(context_size=64))


PROMPT = "".join(f"<t{i}>" for i in range(2, 21))  # 19 toks + BOS = 20


def _run(engine, prompts, n=6):
    texts = engine.generate_all(
        [
            GenerationRequest(
                prompt=p, max_tokens=n, sampler=DeterministicSampler()
            )
            for p in prompts
        ]
    )
    return [texts[i] for i in sorted(texts)]


def _count_prefill_chunks(engine):
    calls = []
    orig = engine._prefill_chunk

    def counting(stream, slot):
        calls.append(stream.prefill_pos)
        return orig(stream, slot)

    engine._prefill_chunk = counting
    return calls


def test_prefix_reuse_exact_and_skips_prefill(model):
    ref = _run(
        PagedEngine(model, max_streams=1, page_size=8, kv_dtype=jnp.float32),
        [PROMPT],
    )[0]

    engine = PagedEngine(
        model, max_streams=1, page_size=8, kv_dtype=jnp.float32,
        n_batch=8, prefix_cache=True,
    )
    calls = _count_prefill_chunks(engine)
    first = _run(engine, [PROMPT])[0]
    assert first == ref
    cold_chunks = len(calls)
    assert cold_chunks >= 3  # 20 tokens / n_batch 8

    # 20-token prompt, page 8: pages 0 and 1 are full and now cached
    assert engine.prefix_cache.evictable == 2

    calls.clear()
    second = _run(engine, [PROMPT])[0]
    assert second == ref
    # warm start: prefill resumed at the 2-page boundary (position 16)
    assert len(calls) < cold_chunks
    assert calls[0] == 16


def test_prefix_reuse_concurrent_with_other_streams(model):
    prompts = [PROMPT, "<t9><t4><t5>", PROMPT]
    base = PagedEngine(
        model, max_streams=3, page_size=8, kv_dtype=jnp.float32
    )
    refs = _run(base, prompts)

    engine = PagedEngine(
        model, max_streams=3, page_size=8, kv_dtype=jnp.float32,
        prefix_cache=True,
    )
    # warm the cache, then run the mixed batch
    _run(engine, [PROMPT])
    assert _run(engine, prompts) == refs


def test_prefix_cache_eviction_under_pressure(model):
    """A pool too small to keep cached pages around must evict them for new
    allocations instead of reporting OOM, and stay correct."""
    prompts = [
        "".join(f"<t{i}>" for i in range(start, start + 19))
        for start in (2, 30, 60)
    ]
    refs = [
        _run(
            PagedEngine(model, max_streams=1, page_size=8,
                        kv_dtype=jnp.float32),
            [p],
        )[0]
        for p in prompts
    ]
    # 1 stream needs ceil(64/8)=8 pages worst case; give 9 (8 usable): the
    # cache from one request must be evicted to serve the next
    engine = PagedEngine(
        model, max_streams=1, page_size=8, n_pages=9, kv_dtype=jnp.float32,
        prefix_cache=True,
    )
    for p, r in zip(prompts, refs):
        assert _run(engine, [p])[0] == r


def test_prefix_cache_int8_pool(model):
    """int8 pools share the scale planes through the same page ids."""
    engine_cold = PagedEngine(
        model, max_streams=1, page_size=8, kv_dtype="int8"
    )
    ref = _run(engine_cold, [PROMPT])[0]

    engine = PagedEngine(
        model, max_streams=1, page_size=8, kv_dtype="int8",
        prefix_cache=True,
    )
    assert _run(engine, [PROMPT])[0] == ref
    assert _run(engine, [PROMPT])[0] == ref


def test_prefix_cache_refcounts_balance(model):
    engine = PagedEngine(
        model, max_streams=2, page_size=8, kv_dtype=jnp.float32,
        prefix_cache=True,
    )
    _run(engine, [PROMPT, PROMPT])
    cache = engine.prefix_cache
    # every registered page is back to refcount 0 and evictable
    assert all(v == 0 for v in cache.refs.values())
    assert cache.evictable == len(cache.refs)
    # and pool accounting is consistent: free + cached = all real pages
    assert (
        engine.allocator.available + cache.evictable
        == engine.pool.n_pages - 1
    )


def test_prefix_cache_step_multi(model):
    """Borrowed pages compose with the on-device multi-step decode path."""
    from llm_tpu.ops.sampling import DeviceSampler

    def run(engine):
        texts = engine.generate_all(
            [
                GenerationRequest(
                    prompt=PROMPT, max_tokens=6,
                    sampler=DeterministicSampler(),
                    device_sampler=DeviceSampler.greedy(),
                )
            ],
            n_steps=4,
        )
        return texts[min(texts)]

    ref = run(
        PagedEngine(model, max_streams=1, page_size=8, kv_dtype=jnp.float32)
    )
    engine = PagedEngine(
        model, max_streams=1, page_size=8, kv_dtype=jnp.float32,
        prefix_cache=True,
    )
    assert run(engine) == ref
    assert run(engine) == ref


def test_prefix_cache_unit():
    c = PrefixCache()
    toks = list(range(1, 40))
    d = PrefixCache.digests(toks, 8, 2)
    c.register(d[0], 5)
    c.register(d[1], 6)
    # strict-prefix cap: a 9-token prompt can only borrow page 0 (one token
    # must remain to prefill); 17 tokens reach both pages
    assert c.match(toks[:9], 8) == [5]
    c.dec(5)
    assert c.match(toks[:17], 8) == [5, 6]
    c.dec(5)
    c.dec(6)
    # duplicate registration of a taken key is a no-op
    c.register(d[0], 9)
    assert c.by_key[d[0]] == 5
    # divergent prompt: no match
    other = [99] + toks[1:]
    assert c.match(other, 8) == []
    # digests are ROLLING: identical page-1 tokens under a different
    # page-0 prefix must NOT match page 1
    other2 = [99] + toks[1:8] + toks[8:]
    assert PrefixCache.digests(other2, 8, 2)[1] != d[1]
    # eviction order is release order
    assert c.refs == {5: 1, 6: 1}
    c.dec(5)
    c.dec(6)
    assert c.evict(1) == [5]
    assert c.match(toks, 8) == []  # chain broken at page 0


def test_step_multi_block_never_writes_prefilling_slots_pages(model):
    """Regression: the paged BLOCK decode path has no write mask, so a
    mid-prefill slot's dummy rows must park at its frontier — previously
    they wrote garbage at positions 0..n_steps-1 into the slot's real
    page 0 (and, with prefix caching, into a borrowed SHARED page)."""
    from llm_tpu.ops.sampling import DeviceSampler

    def run(interleaved: bool):
        # n_batch=2: B's 4-token tail after the borrow takes TWO chunks,
        # so at least one block dispatch runs while B is mid-prefill
        engine = PagedEngine(
            model, max_streams=2, page_size=8, kv_dtype=jnp.float32,
            n_batch=2, prefix_cache=True,
        )
        # warm the prefix cache so admission borrows pages 0-1
        engine.generate_all(
            [GenerationRequest(prompt=PROMPT, max_tokens=2,
                               sampler=DeterministicSampler(),
                               device_sampler=DeviceSampler.greedy())],
            n_steps=4,
        )
        reqs = []
        if interleaved:
            # A decodes blocks while B borrows + prefills
            a = engine.submit(GenerationRequest(
                prompt="<t9><t4>", max_tokens=16,
                sampler=DeterministicSampler(),
                device_sampler=DeviceSampler.greedy()))
            engine.step_multi(4)
            engine.step_multi(4)
        b = engine.submit(GenerationRequest(
            prompt=PROMPT, max_tokens=8,
            sampler=DeterministicSampler(),
            device_sampler=DeviceSampler.greedy()))
        while engine.has_work():
            engine.step_multi(4)
        return "".join(engine.finished[b].text)

    # reference: B alone (no decodable stream -> no block runs while B
    # prefills, so its pages stay clean by construction)
    assert run(True) == run(False)


def test_full_prefix_exact_hit_skips_all_prefill(model):
    """A PAGE-ALIGNED prompt whose every page AND final logits row are
    cached skips prefill entirely (round 4): admission borrows all pages
    read-only, restores last_logits from the logits cache, and the first
    generated token comes from a single decode dispatch — with output
    exactly matching a cold engine."""
    # 15 tokens + BOS = 16 = exactly 2 pages of 8
    prompt = "".join(f"<t{i}>" for i in range(2, 17))
    ref = _run(
        PagedEngine(model, max_streams=1, page_size=8,
                    kv_dtype=jnp.float32),
        [prompt],
    )[0]

    engine = PagedEngine(
        model, max_streams=1, page_size=8, kv_dtype=jnp.float32,
        n_batch=8, prefix_cache=True,
    )
    first = _run(engine, [prompt])[0]
    assert first == ref
    assert len(engine.prefix_cache.logits_by_key) == 1

    calls = _count_prefill_chunks(engine)
    warm = _run(engine, [prompt])[0]
    assert warm == ref
    assert calls == [], calls  # ZERO prefill dispatches
    # accounting: all pages back to refcount 0, none leaked
    cache = engine.prefix_cache
    assert all(v == 0 for v in cache.refs.values())
    assert (
        engine.allocator.available + cache.evictable
        == engine.pool.n_pages - 1
    )


def test_full_prefix_cow_tail(model):
    """When the final page is cached but its logits row was evicted, the
    copy-on-write fallback copies that page into an owned page and
    re-evaluates ONLY the last prompt token, matching a cold engine."""
    prompt = "".join(f"<t{i}>" for i in range(2, 17))
    ref = _run(
        PagedEngine(model, max_streams=1, page_size=8,
                    kv_dtype=jnp.float32),
        [prompt],
    )[0]

    engine = PagedEngine(
        model, max_streams=1, page_size=8, kv_dtype=jnp.float32,
        n_batch=8, prefix_cache=True,
    )
    first = _run(engine, [prompt])[0]
    assert first == ref

    engine.prefix_cache.logits_by_key.clear()  # simulate LRU eviction
    calls = _count_prefill_chunks(engine)
    warm = _run(engine, [prompt])[0]
    assert warm == ref
    # COW admission resumed at len-1: exactly one 1-token tail chunk
    assert calls == [15], calls
    # ... which re-registered the logits row: the NEXT repeat is exact-hit
    calls.clear()
    assert _run(engine, [prompt])[0] == ref
    assert calls == [], calls


def test_full_prefix_cow_int8(model):
    prompt = "".join(f"<t{i}>" for i in range(2, 17))
    ref = _run(
        PagedEngine(model, max_streams=1, page_size=8, kv_dtype="int8"),
        [prompt],
    )[0]
    engine = PagedEngine(
        model, max_streams=1, page_size=8, kv_dtype="int8",
        n_batch=8, prefix_cache=True,
    )
    assert _run(engine, [prompt])[0] == ref
    engine.prefix_cache.logits_by_key.clear()
    calls = _count_prefill_chunks(engine)
    assert _run(engine, [prompt])[0] == ref
    assert calls == [15], calls


def test_full_prefix_exact_hit_int8(model):
    prompt = "".join(f"<t{i}>" for i in range(2, 17))
    ref = _run(
        PagedEngine(model, max_streams=1, page_size=8, kv_dtype="int8"),
        [prompt],
    )[0]
    engine = PagedEngine(
        model, max_streams=1, page_size=8, kv_dtype="int8",
        n_batch=8, prefix_cache=True,
    )
    assert _run(engine, [prompt])[0] == ref
    calls = _count_prefill_chunks(engine)
    assert _run(engine, [prompt])[0] == ref
    assert calls == [], calls


def test_full_prefix_cow_alloc_failure_falls_back(model):
    """When no page can be allocated for the COW copy, admission falls
    back to the strict-prefix borrow (page-boundary chunked tail) and the
    output stays exact."""
    prompt = "".join(f"<t{i}>" for i in range(2, 17))
    ref = _run(
        PagedEngine(model, max_streams=1, page_size=8,
                    kv_dtype=jnp.float32),
        [prompt],
    )[0]
    engine = PagedEngine(
        model, max_streams=1, page_size=8, kv_dtype=jnp.float32,
        n_batch=8, prefix_cache=True,
    )
    assert _run(engine, [prompt])[0] == ref  # populate the cache
    engine.prefix_cache.logits_by_key.clear()  # force the COW path

    orig = engine._alloc
    state = {"failed": False}

    def failing(n=1):
        if not state["failed"]:
            state["failed"] = True
            raise MemoryError("no page for the COW copy")
        return orig(n)

    engine._alloc = failing
    calls = _count_prefill_chunks(engine)
    assert _run(engine, [prompt])[0] == ref
    assert state["failed"]
    assert calls[0] == 8, calls  # strict borrow: tail starts at page 1


def test_prefix_cache_logits_unit():
    c = PrefixCache()
    c.LOGITS_CAP = 3
    rows = {i: np.full(4, float(i), np.float32) for i in range(5)}
    for i in range(4):
        c.register_logits(bytes([i]), rows[i])
    # cap 3: oldest (0) evicted
    assert c.match_logits(bytes([0])) is None
    got = c.match_logits(bytes([1]))
    assert got is not None and got[0] == 1.0
    # a hit returns a PRIVATE copy (mutation must not poison the cache)
    got[:] = -1
    again = c.match_logits(bytes([1]))
    assert again is not None and again[0] == 1.0
    # hit refreshed LRU order: inserting one more evicts 2, not 1
    c.register_logits(bytes([4]), rows[4])
    assert c.match_logits(bytes([2])) is None
    assert c.match_logits(bytes([1])) is not None
