"""Paged KV cache: equality with the dense engine, pooling, page reuse."""

import jax.numpy as jnp
import numpy as np
import pytest

from llm_tpu.loader import ModelParameters, load
from llm_tpu.paged import PageAllocator, PagedEngine
from llm_tpu.samplers import DeterministicSampler, GreedySampler
from llm_tpu.serve import Engine, GenerationRequest
from llm_tpu.testing import make_tiny_file


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("pg") / "llama.bin"
    make_tiny_file("llama", path)
    return load(path, "llama", params=ModelParameters(context_size=64))


def _dense_reference(model, prompts, n):
    engine = Engine(model, max_streams=len(prompts), kv_dtype=jnp.float32)
    texts = engine.generate_all(
        [
            GenerationRequest(prompt=p, max_tokens=n, sampler=DeterministicSampler())
            for p in prompts
        ]
    )
    return [texts[i] for i in range(len(prompts))]


def test_paged_matches_dense(model):
    prompts = ["<t2><t3>", "<t9><t4><t5>", "<t7>"]
    refs = _dense_reference(model, prompts, 8)

    engine = PagedEngine(
        model, max_streams=3, page_size=16, kv_dtype=jnp.float32
    )
    texts = engine.generate_all(
        [
            GenerationRequest(prompt=p, max_tokens=8, sampler=DeterministicSampler())
            for p in prompts
        ]
    )
    assert [texts[i] for i in range(3)] == refs


def test_paged_page_boundary_crossing(model):
    """Generation crossing several 16-token pages stays coherent."""
    ref = _dense_reference(model, ["<t2><t3>"], 40)[0]
    engine = PagedEngine(
        model, max_streams=1, page_size=16, kv_dtype=jnp.float32
    )
    texts = engine.generate_all(
        [GenerationRequest(prompt="<t2><t3>", max_tokens=40,
                           sampler=DeterministicSampler())]
    )
    assert texts[0] == ref


def test_paged_pool_smaller_than_worst_case(model):
    """More requests than the pool can hold at once: admission defers and
    pages are recycled across streams."""
    prompts = [f"<t{i}><t{i+1}>" for i in range(2, 10)]
    refs = _dense_reference(model, prompts, 6)

    # 4 pages/stream worst case, 8 streams -> worst case 32 pages; give 9
    engine = PagedEngine(
        model, max_streams=4, page_size=16, n_pages=9, kv_dtype=jnp.float32
    )
    texts = engine.generate_all(
        [
            GenerationRequest(prompt=p, max_tokens=6, sampler=DeterministicSampler())
            for p in prompts
        ]
    )
    assert [texts[i] for i in range(8)] == refs
    # all pages returned to the pool at the end
    assert engine.allocator.available == 8


def test_page_allocator():
    a = PageAllocator(5)
    assert a.available == 4  # page 0 reserved
    pages = a.alloc(4)
    assert PageAllocator.TRASH not in pages
    with pytest.raises(MemoryError):
        a.alloc(1)
    a.release(pages)
    assert a.available == 4


def test_paged_mpt_alibi(tmp_path):
    """The BASELINE 'MPT ALiBi paged KV' shape: ALiBi positions must stay
    correct through the page gather (absolute key indexing)."""
    path = tmp_path / "mpt.bin"
    make_tiny_file("mpt", path)
    model = load(path, "mpt", params=ModelParameters(context_size=64))
    ref = _dense_reference(model, ["<t2><t3><t4>"], 12)[0]
    engine = PagedEngine(model, max_streams=2, page_size=16,
                         kv_dtype=jnp.float32)
    texts = engine.generate_all(
        [GenerationRequest(prompt="<t2><t3><t4>", max_tokens=12,
                           sampler=DeterministicSampler())]
    )
    assert texts[0] == ref


def test_paged_prefill_near_context_boundary(model):
    """Regression: while stream A sits near full context, admitting stream B
    must not corrupt A's live pages (dummy writes past A's page table used
    to clamp onto its last allocated page)."""
    engine = PagedEngine(model, max_streams=2, page_size=16,
                         kv_dtype=jnp.float32, n_batch=8)
    # A: long prompt, then step until close to the 64-token context
    a = engine.submit(GenerationRequest(prompt=["<t2>"] * 0 or [2] * 40,
                                        max_tokens=18,
                                        sampler=DeterministicSampler()))
    for _ in range(14):
        engine.step()
    sa = engine.slots[0]
    assert sa is not None and sa.n_past >= 50
    before = sa.last_logits.copy()

    # B admitted now: its prefill runs dummy chunks for A at A's n_past
    b = engine.submit(GenerationRequest(prompt=[5, 6, 7], max_tokens=4,
                                        sampler=DeterministicSampler()))
    engine.step()
    # A's continuation must match an uninterrupted dense reference
    ref = _dense_reference(model, [[2] * 40], 18)[0]
    while engine.has_work():
        engine.step()
    assert "".join(engine.finished[a].text) == ref


def test_paged_retired_events_emitted(model):
    """Streams retired at admission (context_full) must still produce a
    done event from step()."""
    engine = PagedEngine(model, max_streams=1, page_size=16,
                         kv_dtype=jnp.float32)
    rid = engine.submit(GenerationRequest(prompt=[2] * 70, max_tokens=4))
    events = engine.step()
    assert (rid, "", True) in events
    assert engine.finished[rid].finish_reason == "context_full"


def test_paged_mpt_q4k_alibi_baseline_config(tmp_path):
    """BASELINE.md staged config: MPT + Q4_K + ALiBi + paged KV, all in one
    path (QK_K=256 geometry)."""
    from llm_tpu.ggml.types import GgmlType

    path = tmp_path / "mpt_q4k.bin"
    make_tiny_file("mpt", path, element_type=GgmlType.Q4_K, n_embd=256)
    model = load(path, "mpt", params=ModelParameters(context_size=64))
    assert model.spec.alibi_bias_max > 0

    ref = _dense_reference(model, ["<t2><t3>"], 10)[0]
    engine = PagedEngine(model, max_streams=2, page_size=16,
                         kv_dtype=jnp.float32)
    texts = engine.generate_all(
        [GenerationRequest(prompt="<t2><t3>", max_tokens=10,
                           sampler=DeterministicSampler())]
    )
    assert texts[0] == ref


def test_paged_oversize_prompt_retires_not_loops(model):
    """A prompt needing more pages than the whole pool must retire with
    kv_oom instead of busy-looping generate_all() forever (the pool can
    never free enough pages for it)."""
    # pool: 3 pages total -> 2 usable; page_size 16 -> max 32 prompt tokens
    engine = PagedEngine(model, max_streams=2, page_size=16, n_pages=3,
                         kv_dtype=jnp.float32)
    rid = engine.submit(GenerationRequest(prompt=[2] * 50, max_tokens=4))
    steps = 0
    while engine.has_work():
        engine.step()
        steps += 1
        assert steps < 50, "engine busy-looped on an unsatisfiable prompt"
    assert engine.finished[rid].finish_reason == "kv_oom"


def test_paged_oom_with_no_other_pages_retires(model):
    """If allocation fails while no other stream holds pages, nothing can
    ever free up: the stream must retire rather than requeue."""
    engine = PagedEngine(model, max_streams=1, page_size=4, n_pages=3,
                         kv_dtype=jnp.float32)
    # prompt fits (8 tokens = 2 pages = whole pool), but there is no
    # headroom for generated tokens -> kv_oom at decode, engine drains
    rid = engine.submit(GenerationRequest(prompt=[2] * 8, max_tokens=16))
    steps = 0
    while engine.has_work():
        engine.step()
        steps += 1
        assert steps < 60
    assert engine.finished[rid].finish_reason == "kv_oom"


def test_paged_int8_matches_dense_int8(model):
    """int8 page pools: quantization is per (position, kv-head) row, so
    paged int8 must equal the dense int8 engine token-for-token."""
    prompts = ["<t2><t3>", "<t9><t4><t5>", "<t7>"]
    dense = Engine(model, max_streams=3, kv_dtype="int8")
    refs = dense.generate_all(
        [GenerationRequest(prompt=p, max_tokens=8, sampler=DeterministicSampler())
         for p in prompts]
    )
    engine = PagedEngine(model, max_streams=3, page_size=16, kv_dtype="int8")
    texts = engine.generate_all(
        [GenerationRequest(prompt=p, max_tokens=8, sampler=DeterministicSampler())
         for p in prompts]
    )
    assert [texts[i] for i in range(3)] == [refs[i] for i in range(3)]


def test_paged_step_multi_matches_single_step(model):
    """On-device multi-token paged decode (pages pre-allocated per block)
    equals the per-token paged path."""
    from llm_tpu.ops.sampling import DeviceSampler

    prompts = ["<t2><t3>", "<t9><t4>"]
    ref_engine = PagedEngine(model, max_streams=2, page_size=16,
                             kv_dtype=jnp.float32)
    refs = ref_engine.generate_all(
        [GenerationRequest(prompt=p, max_tokens=10, sampler=GreedySampler())
         for p in prompts]
    )
    engine = PagedEngine(model, max_streams=2, page_size=16,
                         kv_dtype=jnp.float32)
    texts = engine.generate_all(
        [GenerationRequest(prompt=p, max_tokens=10,
                           device_sampler=DeviceSampler.greedy())
         for p in prompts],
        n_steps=4,
    )
    assert [texts[i] for i in range(2)] == [refs[i] for i in range(2)]


def test_paged_step_multi_int8_tight_pool(model):
    """Multi-step with a pool too small for full blocks: the planner shrinks
    the block or falls back to single steps, and results still match."""
    from llm_tpu.ops.sampling import DeviceSampler

    ref_engine = PagedEngine(model, max_streams=2, page_size=16,
                             kv_dtype="int8")
    refs = ref_engine.generate_all(
        [GenerationRequest(prompt="<t2><t3>", max_tokens=12,
                           sampler=GreedySampler())]
    )
    engine = PagedEngine(model, max_streams=2, page_size=16, n_pages=4,
                         kv_dtype="int8")
    texts = engine.generate_all(
        [GenerationRequest(prompt="<t2><t3>", max_tokens=12,
                           device_sampler=DeviceSampler.greedy())],
        n_steps=8,
    )
    assert texts[0] == refs[0]


def test_paged_kernel_interpret_matches_xla(tmp_path, monkeypatch):
    """The Pallas paged-attention kernel (interpret mode) must reproduce the
    jnp page-scan pass exactly on kernel-eligible geometry (D=128)."""
    import llm_tpu.ops.qmatmul as qm

    path = tmp_path / "llama128.bin"
    make_tiny_file("llama", path, n_embd=512)  # 4 heads -> D = 128
    model = load(path, "llama", params=ModelParameters(context_size=64))
    assert model.spec.head_dim == 128

    def run():
        engine = PagedEngine(model, max_streams=2, page_size=16,
                             kv_dtype=jnp.float32)
        return engine.generate_all(
            [GenerationRequest(prompt="<t2><t3>", max_tokens=8,
                               sampler=DeterministicSampler())]
        )[0]

    monkeypatch.setenv("LLM_TPU_KERNELS", "xla")
    ref = run()
    monkeypatch.setenv("LLM_TPU_KERNELS", "interpret")
    got = run()
    assert got == ref


def test_paged_kernel_interpret_int8_alibi(tmp_path, monkeypatch):
    """Kernel path with int8 pool + ALiBi (MPT geometry, D=128)."""
    path = tmp_path / "mpt128.bin"
    make_tiny_file("mpt", path, n_embd=512)
    model = load(path, "mpt", params=ModelParameters(context_size=64))
    assert model.spec.head_dim == 128 and model.spec.alibi_bias_max > 0

    def run():
        engine = PagedEngine(model, max_streams=2, page_size=16,
                             kv_dtype="int8")
        return engine.generate_all(
            [GenerationRequest(prompt="<t2><t3><t4>", max_tokens=8,
                               sampler=DeterministicSampler())]
        )[0]

    monkeypatch.setenv("LLM_TPU_KERNELS", "xla")
    ref = run()
    monkeypatch.setenv("LLM_TPU_KERNELS", "interpret")
    got = run()
    assert got == ref


def test_paged_kernel_pages_per_step_remainder(tmp_path, monkeypatch):
    """pages-per-step batching with a window that does NOT divide evenly:
    the clamped duplicate page in the last group must mask out (pinned
    LLM_TPU_PAGED_PPS=2 with a 3-page window)."""
    path = tmp_path / "mpt128.bin"
    make_tiny_file("mpt", path, n_embd=512)
    model = load(path, "mpt", params=ModelParameters(context_size=64))

    # 35 prompt tokens + decode, page 16 -> window grows to 3 pages
    def run():
        engine = PagedEngine(model, max_streams=1, page_size=16,
                             kv_dtype="int8", n_batch=8)
        return engine.generate_all(
            [GenerationRequest(prompt=[2, 3, 4] * 12, max_tokens=8,
                               sampler=DeterministicSampler())]
        )[0]

    monkeypatch.setenv("LLM_TPU_KERNELS", "xla")
    ref = run()
    monkeypatch.setenv("LLM_TPU_KERNELS", "interpret")
    monkeypatch.setenv("LLM_TPU_PAGED_PPS", "2")
    got = run()
    assert got == ref


def test_paged_kernel_head_chunked_matches_xla(tmp_path, monkeypatch):
    """The kv-head-chunked kernel body (hc < Hkv, the bounded-VMEM path big
    pages engage at MPT-8K geometry) must match the jnp page-scan pass —
    pinned to hc=1 and hc=3 (ragged final chunk on 4 kv heads), int8+ALiBi
    so the quantized scale slices are exercised too."""
    path = tmp_path / "mpt128.bin"
    make_tiny_file("mpt", path, n_embd=512)  # 4 heads -> D = 128
    model = load(path, "mpt", params=ModelParameters(context_size=64))

    def run():
        engine = PagedEngine(model, max_streams=2, page_size=16,
                             kv_dtype="int8", n_batch=8)
        return engine.generate_all(
            [GenerationRequest(prompt=[2, 3, 4] * 12, max_tokens=8,
                               sampler=DeterministicSampler())]
        )[0]

    monkeypatch.setenv("LLM_TPU_KERNELS", "xla")
    ref = run()
    monkeypatch.setenv("LLM_TPU_KERNELS", "interpret")
    for hc in ("1", "3"):
        monkeypatch.setenv("LLM_TPU_PAGED_HC", hc)
        assert run() == ref, f"hc={hc}"
    monkeypatch.delenv("LLM_TPU_PAGED_HC")


def test_paged_admission_interleaves_with_decode(model):
    """Paged: chunked admission interleaves with decode and the B=1 prefill
    leaves the running stream's pages intact."""
    engine = PagedEngine(model, max_streams=2, page_size=16,
                         kv_dtype=jnp.float32, n_batch=4)
    a = engine.submit(GenerationRequest(prompt=[2, 3], max_tokens=24,
                                        sampler=DeterministicSampler()))
    engine.step()
    b = engine.submit(GenerationRequest(prompt=[5] * 16, max_tokens=4,
                                        sampler=DeterministicSampler()))
    for i in range(4):
        events = engine.step()
        assert any(rid == a for rid, _, _ in events), f"step {i}: A stalled"
    while engine.has_work():
        engine.step()
    ref = _dense_reference(model, [[2, 3], [5] * 16], 24)
    assert "".join(engine.finished[a].text) == ref[0]
    ref4 = _dense_reference(model, [[5] * 16], 4)
    assert "".join(engine.finished[b].text) == ref4[0]


def test_paged_kernel_interpret_mqa_falcon(tmp_path, monkeypatch):
    """Kernel path with multi-query attention (falcon-7B: Hkv=1, rep=H) —
    exercises rep>1 all-heads blocks in the (streams, page-groups) grid."""
    path = tmp_path / "falcon128.bin"
    make_tiny_file("falcon", path, n_embd=512)
    model = load(path, "falcon", params=ModelParameters(context_size=64))
    assert model.spec.head_dim == 128 and model.spec.n_head_kv == 1

    def run():
        engine = PagedEngine(model, max_streams=2, page_size=16,
                             kv_dtype="int8")
        return engine.generate_all(
            [GenerationRequest(prompt=[2, 3, 4], max_tokens=8,
                               sampler=DeterministicSampler())]
        )[0]

    monkeypatch.setenv("LLM_TPU_KERNELS", "xla")
    ref = run()
    monkeypatch.setenv("LLM_TPU_KERNELS", "interpret")
    got = run()
    assert got == ref


def test_paged_kernel_interpret_gqa(tmp_path, monkeypatch):
    """Kernel path with grouped-query attention (falcon-40B style: Hkv=2,
    rep=2) — both dims of the [Hkv, rep] online-softmax state exceed 1."""
    path = tmp_path / "falcon_gqa128.bin"
    make_tiny_file("falcon", path, n_embd=512, n_head_kv=2)
    model = load(path, "falcon", params=ModelParameters(context_size=64))
    assert model.spec.head_dim == 128 and model.spec.n_head_kv == 2

    def run():
        engine = PagedEngine(model, max_streams=2, page_size=16,
                             kv_dtype="int8")
        return engine.generate_all(
            [GenerationRequest(prompt=[2, 3, 4], max_tokens=8,
                               sampler=DeterministicSampler())]
        )[0]

    monkeypatch.setenv("LLM_TPU_KERNELS", "xla")
    ref = run()
    monkeypatch.setenv("LLM_TPU_KERNELS", "interpret")
    got = run()
    assert got == ref


def test_paged_engine_tp_mesh_matches_single_device(model):
    """Paged serving over a TP mesh: pool sharded over kv heads, weights
    Megatron-sharded, jnp page-scan under GSPMD — equals the meshless
    engine token-for-token."""
    from llm_tpu.parallel import MeshConfig, make_mesh

    prompts = ["<t2><t3>", "<t9><t4><t5>"]
    ref = PagedEngine(model, max_streams=2, page_size=16,
                      kv_dtype=jnp.float32).generate_all(
        [GenerationRequest(prompt=p, max_tokens=8,
                           sampler=DeterministicSampler())
         for p in prompts]
    )
    mesh = make_mesh(MeshConfig(data=1, model=4))
    with mesh:
        engine = PagedEngine(model, max_streams=2, page_size=16,
                             kv_dtype=jnp.float32, mesh=mesh)
        texts = engine.generate_all(
            [GenerationRequest(prompt=p, max_tokens=8,
                               sampler=DeterministicSampler())
             for p in prompts]
        )
    assert [texts[i] for i in sorted(texts)] == [ref[0], ref[1]]


def test_paged_engine_tp_mesh_int8(model):
    from llm_tpu.parallel import MeshConfig, make_mesh

    ref = PagedEngine(model, max_streams=1, page_size=16,
                      kv_dtype="int8").generate_all(
        [GenerationRequest(prompt=[2, 3], max_tokens=8,
                           sampler=DeterministicSampler())]
    )
    mesh = make_mesh(MeshConfig(data=1, model=4))
    with mesh:
        engine = PagedEngine(model, max_streams=1, page_size=16,
                             kv_dtype="int8", mesh=mesh)
        texts = engine.generate_all(
            [GenerationRequest(prompt=[2, 3], max_tokens=8,
                               sampler=DeterministicSampler())]
        )
    assert texts[0] == ref[0]
