"""Engine checkpoint/resume: a serving engine checkpointed mid-flight and
restored in a fresh engine must produce EXACTLY the generations the
original would have (tokens, text, finish reasons, logprobs, RNG state,
sampler state, chunked-prefill cursors, page tables)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from llm_tpu.engine_snapshot import read_engine, write_engine
from llm_tpu.loader import ModelParameters, load
from llm_tpu.paged import PagedEngine
from llm_tpu.samplers import (
    DeterministicSampler,
    Mirostat2,
    SamplerChain,
    Temperature,
    TopK,
)
from llm_tpu.serve import Engine, GenerationRequest
from llm_tpu.session import SnapshotError
from llm_tpu.testing import make_tiny_file


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("esnap") / "llama.bin"
    make_tiny_file("llama", path)
    return load(path, "llama", params=ModelParameters(context_size=64))


def _finished(engine):
    return {
        rid: (list(s.tokens), "".join(s.text), s.finish_reason)
        for rid, s in engine.finished.items()
    }


def _run_to_completion(engine, max_iters=200):
    for _ in range(max_iters):
        if not engine.has_work():
            return
        engine.step()
    raise AssertionError("engine did not drain")


def _requests():
    # stream 0: deterministic; stream 1: stateful stochastic chain
    # (mirostat mu + RNG state must survive the checkpoint); stream 2:
    # long prompt so the checkpoint lands mid-prefill (n_batch=4);
    # stream 3: stays in the pending queue at checkpoint time
    long_prompt = "".join(f"<t{i}>" for i in range(2, 22))
    return [
        GenerationRequest(prompt="<t2><t3>", max_tokens=8,
                          sampler=DeterministicSampler(), logprobs=2),
        GenerationRequest(
            prompt="<t9><t4>", max_tokens=8, seed=7,
            sampler=SamplerChain([TopK(k=5), Temperature(temperature=0.7)],
                                 Mirostat2(tau=3.0, eta=0.3)),
        ),
        GenerationRequest(prompt=long_prompt, max_tokens=5,
                          sampler=DeterministicSampler()),
        GenerationRequest(prompt="<t7><t8>", max_tokens=6,
                          sampler=DeterministicSampler()),
    ]


def _checkpoint_equivalence(make_engine, tmp_path, steps=3):
    a = make_engine()
    for r in _requests():
        a.submit(r)
    for _ in range(steps):
        a.step()
    path = tmp_path / "engine.ckpt"
    write_engine(a, path)

    # restored engine must be byte-equivalent in behavior
    b = make_engine()
    read_engine(b, path)
    assert b._next_id == a._next_id
    _run_to_completion(a)
    _run_to_completion(b)
    assert _finished(b) == _finished(a)
    # logprob records survive too
    la = [s.logprob_data for s in a.finished.values() if s.logprob_data]
    lb = [s.logprob_data for s in b.finished.values() if s.logprob_data]
    assert la == lb


def test_dense_engine_roundtrip(model, tmp_path):
    _checkpoint_equivalence(
        lambda: Engine(model, max_streams=3, kv_dtype=jnp.float32, n_batch=4),
        tmp_path,
    )


def test_paged_engine_roundtrip(model, tmp_path):
    _checkpoint_equivalence(
        lambda: PagedEngine(
            model, max_streams=3, page_size=16, kv_dtype="int8", n_batch=4,
            prefix_cache=True,
        ),
        tmp_path,
    )


def test_paged_state_restored_exactly(model, tmp_path):
    eng = PagedEngine(model, max_streams=2, page_size=16, kv_dtype="int8",
                      n_batch=4, prefix_cache=True)
    for r in _requests()[:2]:
        eng.submit(r)
    for _ in range(4):
        eng.step()
    path = tmp_path / "paged.ckpt"
    write_engine(eng, path)

    fresh = PagedEngine(model, max_streams=2, page_size=16, kv_dtype="int8",
                        n_batch=4, prefix_cache=True)
    read_engine(fresh, path)
    assert np.array_equal(fresh.tables, eng.tables)
    assert fresh.stream_pages == eng.stream_pages
    assert fresh.allocator.free == eng.allocator.free
    assert fresh.prefix_cache.by_key == eng.prefix_cache.by_key
    assert fresh.prefix_cache.refs == eng.prefix_cache.refs
    assert np.array_equal(np.asarray(fresh.pool.k), np.asarray(eng.pool.k))
    assert np.array_equal(
        np.asarray(fresh.pool.k_scale), np.asarray(eng.pool.k_scale)
    )


def test_prefix_logits_cache_roundtrip(model, tmp_path):
    """The exact-hit logits rows survive checkpoint/restore (and a
    restore of a logits-free checkpoint clears any stale rows)."""
    from llm_tpu.samplers import DeterministicSampler
    from llm_tpu.serve import GenerationRequest

    def aligned_req():
        # 15 tokens + BOS = 16 = exactly one page of 16
        return GenerationRequest(
            prompt="".join(f"<t{i}>" for i in range(2, 17)),
            max_tokens=2, sampler=DeterministicSampler(),
        )

    eng = PagedEngine(model, max_streams=2, page_size=16, kv_dtype="int8",
                      n_batch=16, prefix_cache=True)
    eng.generate_all([aligned_req()])
    assert len(eng.prefix_cache.logits_by_key) == 1
    path = tmp_path / "pl.ckpt"
    write_engine(eng, path)

    fresh = PagedEngine(model, max_streams=2, page_size=16, kv_dtype="int8",
                        n_batch=16, prefix_cache=True)
    read_engine(fresh, path)
    assert set(fresh.prefix_cache.logits_by_key) == \
        set(eng.prefix_cache.logits_by_key)
    for k, row in eng.prefix_cache.logits_by_key.items():
        assert np.array_equal(fresh.prefix_cache.logits_by_key[k], row)
    # the restored engine takes the exact-hit path: zero prefill chunks
    calls = []
    orig = fresh._prefill_chunk
    fresh._prefill_chunk = lambda s, sl: (calls.append(1), orig(s, sl))
    out = fresh.generate_all([aligned_req()])
    assert calls == []
    ref = eng.generate_all([aligned_req()])
    assert sorted(out.values()) == sorted(ref.values())

    # restoring a checkpoint with NO prefix state resets stale rows
    plain = PagedEngine(model, max_streams=2, page_size=16, kv_dtype="int8",
                        n_batch=16)
    write_engine(plain, path2 := tmp_path / "noprefix.ckpt")
    stale = PagedEngine(model, max_streams=2, page_size=16, kv_dtype="int8",
                        n_batch=16, prefix_cache=True)
    stale.generate_all([aligned_req()])
    assert stale.prefix_cache.logits_by_key
    read_engine(stale, path2)
    assert not stale.prefix_cache.logits_by_key
    assert not stale.prefix_cache.by_key


def test_geometry_mismatch_rejected(model, tmp_path):
    eng = PagedEngine(model, max_streams=2, page_size=16, kv_dtype="int8")
    path = tmp_path / "geom.ckpt"
    write_engine(eng, path)

    with pytest.raises(SnapshotError, match="page geometry"):
        read_engine(
            PagedEngine(model, max_streams=2, page_size=32, kv_dtype="int8"),
            path,
        )
    with pytest.raises(SnapshotError, match="max_streams"):
        read_engine(
            PagedEngine(model, max_streams=4, page_size=16, kv_dtype="int8"),
            path,
        )
    with pytest.raises(SnapshotError, match="checkpoint is for"):
        read_engine(Engine(model, max_streams=2), path)


def test_on_token_reattached(model, tmp_path):
    eng = Engine(model, max_streams=2, kv_dtype=jnp.float32)
    eng.submit(GenerationRequest(prompt="<t2><t3>", max_tokens=6,
                                 sampler=DeterministicSampler()))
    eng.step()
    path = tmp_path / "cb.ckpt"
    write_engine(eng, path)

    got = []
    fresh = Engine(model, max_streams=2, kv_dtype=jnp.float32)
    read_engine(fresh, path, on_token=lambda rid, txt: got.append((rid, txt)))
    _run_to_completion(fresh)
    text = "".join(fresh.finished[0].text)
    # callback saw every fragment emitted AFTER the restore point
    assert "".join(t for _, t in got) != ""
    assert text.endswith("".join(t for _, t in got))


def test_multihost_dense_roundtrip(model, tmp_path):
    """Per-host checkpoint of the cross-host engine (single-process 2x4
    mesh: the host owns every `data` row, so the local block is the whole
    cache — the same code path 2-process hosts take with partial rows;
    tests/mh/worker.py phase 5 covers the genuinely-distributed case)."""
    from llm_tpu.parallel.multihost import MultiHostEngine
    from llm_tpu.parallel.sharding import MeshConfig, make_mesh

    mesh = make_mesh(MeshConfig(data=2, model=4))
    _checkpoint_equivalence(
        lambda: MultiHostEngine(model, mesh, global_streams=4,
                                kv_dtype=jnp.float32, n_batch=4),
        tmp_path,
    )


def test_multihost_paged_roundtrip(model, tmp_path):
    from llm_tpu.parallel.multihost import MultiHostPagedEngine
    from llm_tpu.parallel.sharding import MeshConfig, make_mesh

    mesh = make_mesh(MeshConfig(data=2, model=1))
    _checkpoint_equivalence(
        lambda: MultiHostPagedEngine(model, mesh, global_streams=4,
                                     kv_dtype="int8", n_batch=4, page_size=8),
        tmp_path,
    )


def test_loop_key_survives_for_stochastic_step_multi(model, tmp_path):
    """The block-decode PRNG chain (Engine._loop_key) is engine state: a
    restored engine must draw the SAME keys the original would have, so
    stochastic on-device multi-token decode reproduces exactly."""
    from llm_tpu.ops.sampling import DeviceSampler

    def make():
        return Engine(model, max_streams=2, kv_dtype=jnp.float32, n_batch=4)

    def submit(e):
        for p in ("<t2><t3>", "<t9><t4>"):
            e.submit(GenerationRequest(
                prompt=p, max_tokens=12,
                device_sampler=DeviceSampler.top_k_temperature(5, 0.7),
            ))

    a = make()
    submit(a)
    a.step_multi(4)  # advances _loop_key past PRNGKey(0)
    path = tmp_path / "lk.ckpt"
    write_engine(a, path)

    b = make()
    read_engine(b, path)
    while a.has_work():
        a.step_multi(4)
    while b.has_work():
        b.step_multi(4)
    assert _finished(b) == _finished(a)


def test_speculative_engine_roundtrip(model, tmp_path, tmp_path_factory):
    """Speculative engines carry EXTRA device state (the draft's [L, B]
    cache, acceptance counters, and — sampled — the proposal PRNG chain);
    a checkpoint must carry it so the restored engine resumes with the
    same acceptance behavior, and cross-class restores are rejected."""
    from llm_tpu.ops.sampling import DeviceSampler
    from llm_tpu.speculative import (
        SampledSpeculativeEngine,
        SpeculativeEngine,
    )

    dr = tmp_path_factory.mktemp("esnap_draft") / "draft.bin"
    make_tiny_file("llama", dr, seed=7, n_layer=1)
    draft = load(dr, "llama", params=ModelParameters(context_size=64))

    def make():
        return SpeculativeEngine(model, draft, k=3, max_streams=2,
                                 kv_dtype=jnp.float32, n_batch=4)

    a = make()
    for p in ("<t2><t3>", "<t9><t4>"):
        a.submit(GenerationRequest(prompt=p, max_tokens=10))
    for _ in range(3):
        a.step()
    path = tmp_path / "spec.ckpt"
    write_engine(a, path)

    b = make()
    read_engine(b, path)
    assert (b.accepted, b.drafted) == (a.accepted, a.drafted)
    assert np.array_equal(np.asarray(b.d_cache.k), np.asarray(a.d_cache.k))
    _run_to_completion(a)
    _run_to_completion(b)
    assert _finished(b) == _finished(a)

    # a speculative checkpoint must not restore into a plain Engine
    with pytest.raises(SnapshotError, match="checkpoint is for"):
        read_engine(Engine(model, max_streams=2, kv_dtype=jnp.float32,
                           n_batch=4), path)

    # sampled variant: the proposal PRNG chain (_key) must survive
    def make_s():
        return SampledSpeculativeEngine(model, draft, k=3, max_streams=2,
                                        kv_dtype=jnp.float32, n_batch=4)

    sa = make_s()
    for p in ("<t2><t3>", "<t9><t4>"):
        sa.submit(GenerationRequest(
            prompt=p, max_tokens=10,
            device_sampler=DeviceSampler.top_k_temperature(5, 0.7),
        ))
    for _ in range(3):
        sa.step()
    spath = tmp_path / "sspec.ckpt"
    write_engine(sa, spath)
    sb = make_s()
    read_engine(sb, spath)
    _run_to_completion(sa)
    _run_to_completion(sb)
    assert _finished(sb) == _finished(sa)


def test_paged_speculative_engine_roundtrip(model, tmp_path,
                                            tmp_path_factory):
    """Paged speculative composes both checkpoint branches: target page
    pool + tables/allocator AND the draft's dense cache."""
    from llm_tpu.speculative import PagedSpeculativeEngine

    dr = tmp_path_factory.mktemp("esnap_pdraft") / "draft.bin"
    make_tiny_file("llama", dr, seed=7, n_layer=1)
    draft = load(dr, "llama", params=ModelParameters(context_size=64))

    def make():
        return PagedSpeculativeEngine(
            model, draft, k=3, max_streams=2, kv_dtype="int8",
            page_size=16, n_batch=4,
        )

    a = make()
    for p in ("<t2><t3>", "<t9><t4>"):
        a.submit(GenerationRequest(prompt=p, max_tokens=10))
    for _ in range(3):
        a.step()
    path = tmp_path / "pspec.ckpt"
    write_engine(a, path)
    b = make()
    read_engine(b, path)
    assert np.array_equal(b.tables, a.tables)
    _run_to_completion(a)
    _run_to_completion(b)
    assert _finished(b) == _finished(a)


def test_custom_sampler_rejected(model, tmp_path):
    class Weird:
        def sample(self, logits, prev, rng):
            return 2

    eng = Engine(model, max_streams=1, kv_dtype=jnp.float32)
    eng.submit(GenerationRequest(prompt="<t2>", max_tokens=4, sampler=Weird()))
    eng.step()
    with pytest.raises(SnapshotError, match="not checkpointable"):
        write_engine(eng, tmp_path / "weird.ckpt")
    # a failed write must not leave a partial file behind (atomic temp +
    # rename), nor clobber an existing good checkpoint
    assert not (tmp_path / "weird.ckpt").exists()


def test_shadowing_sampler_dataclass_rejected(model, tmp_path):
    """A user-defined dataclass that shadows a built-in sampler's NAME must
    be rejected, not silently restored as the built-in (identity check,
    not name lookup)."""

    @dataclasses.dataclass
    class TopK:  # same name as llm_tpu.samplers.TopK, different semantics
        k: int = 5

        def sample(self, logits, prev, rng):
            return 2

        def apply(self, logits, prev, rng):
            return logits

    eng = Engine(model, max_streams=1, kv_dtype=jnp.float32)
    eng.submit(GenerationRequest(prompt="<t2>", max_tokens=4, sampler=TopK()))
    eng.step()
    with pytest.raises(SnapshotError, match="not checkpointable"):
        write_engine(eng, tmp_path / "shadow.ckpt")


def test_failed_restore_leaves_engine_intact(model, tmp_path):
    """read_engine validates and builds everything BEFORE mutating the
    target: a rejected restore (prefix-cache checkpoint into a cache-less
    engine) must leave the fresh engine fully functional — allocator,
    tables, and pool untouched."""
    src = PagedEngine(model, max_streams=2, page_size=16, kv_dtype="int8",
                      n_batch=4, prefix_cache=True)
    rid = src.submit(GenerationRequest(prompt="<t2><t3>" * 8, max_tokens=4,
                                       sampler=DeterministicSampler()))
    while src.has_work():
        src.step()
    path = tmp_path / "pfx.ckpt"
    write_engine(src, path)

    eng = PagedEngine(model, max_streams=2, page_size=16, kv_dtype="int8",
                      n_batch=4)  # no prefix cache
    free_before = list(eng.allocator.free)
    tables_before = eng.tables.copy()
    with pytest.raises(SnapshotError, match="prefix cache"):
        read_engine(eng, path)
    assert eng.allocator.free == free_before
    assert np.array_equal(eng.tables, tables_before)
    # and the engine still serves
    out = eng.generate_all([GenerationRequest(
        prompt="<t5>", max_tokens=4, sampler=DeterministicSampler())])
    assert out[0]


def test_mirostat_mu_survives_checkpoint(model, tmp_path):
    """The device-mirostat mu carry persists through write/read_engine
    (round-4 review finding: it is the one piece of device-sampler state
    not reconstructible from token history)."""
    from llm_tpu.ops.sampling import DeviceSampler

    engine = Engine(model, max_streams=2, kv_dtype=jnp.float32)
    engine.submit(GenerationRequest(
        prompt=[2, 3], max_tokens=20,
        device_sampler=DeviceSampler(kind="sample", temperature=0.9,
                                     mirostat=2, mirostat_tau=4.0),
    ))
    for _ in range(3):
        engine.step_multi(3)
    live = [s for s in engine.slots if s is not None]
    assert live and live[0].mirostat_mu is not None
    mu = live[0].mirostat_mu

    path = tmp_path / "miro.ckpt"
    write_engine(engine, path)
    fresh = Engine(model, max_streams=2, kv_dtype=jnp.float32)
    read_engine(fresh, path)
    restored = [s for s in fresh.slots if s is not None]
    assert restored and restored[0].mirostat_mu == mu
