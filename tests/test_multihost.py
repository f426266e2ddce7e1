"""Multi-host continuous batching: a REAL 2-process test (separate OS
processes, jax.distributed over a local coordinator, 4 virtual CPU devices
each forming a global 2x4 data-model mesh), plus single-process MultiHostEngine
equivalence on the 8-device mesh."""

import json
import os
import socket
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from llm_tpu.loader import ModelParameters, load
from llm_tpu.parallel.sharding import MeshConfig, make_mesh
from llm_tpu.parallel.multihost import MultiHostEngine
from llm_tpu.samplers import DeterministicSampler
from llm_tpu.serve import Engine, GenerationRequest
from llm_tpu.testing import make_tiny_file


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("mh") / "llama.bin"
    make_tiny_file("llama", path)
    return load(path, "llama", params=ModelParameters(context_size=64))


def _reference(model, prompts, n=8):
    engine = Engine(model, max_streams=len(prompts), kv_dtype=jnp.float32)
    out = engine.generate_all(
        [GenerationRequest(prompt=p, max_tokens=n,
                           sampler=DeterministicSampler())
         for p in prompts]
    )
    return [out[i] for i in sorted(out)]


def test_multihost_engine_single_process(model):
    """MultiHostEngine on a single-process 2x4 mesh equals the dense
    engine (the coordination layer collapses to local no-ops)."""
    mesh = make_mesh(MeshConfig(data=2, model=4))
    engine = MultiHostEngine(model, mesh, global_streams=4,
                             kv_dtype=jnp.float32, n_batch=4)
    prompts = [[2, 3], [9, 4, 5], [7, 8], [5, 6] * 8]
    texts = engine.generate_all(
        [GenerationRequest(prompt=p, max_tokens=8,
                           sampler=DeterministicSampler())
         for p in prompts]
    )
    refs = _reference(model, prompts)
    assert [texts[k] for k in sorted(texts)] == refs


def test_decode_zero_dcn_bytes(model):
    """The zero-DCN invariant (multihost.py design note), asserted on the
    compiled HLO: at decode steady state no collective crosses the `data`
    axis (= DCN on a real pod); every collective stays within a `model`
    (ICI) group. Also emits the bytes-per-step-per-axis table the 2-host
    scaling bound in docs/architecture.md is derived from."""
    from llm_tpu.parallel.collectives_audit import audit_compiled

    mesh = make_mesh(MeshConfig(data=2, model=4))
    engine = MultiHostEngine(model, mesh, global_streams=4,
                             kv_dtype=jnp.float32, n_batch=4)
    B = engine.max_streams
    ids = np.zeros((B, 1), np.int32)
    n_past = np.arange(B, dtype=np.int32)
    mask = np.ones(B, bool)
    g_np, g_mask = engine._replicated_rows(n_past, mask)
    lowered = engine._step_jit.lower(
        engine.spec, engine.params,
        engine._to_global(ids, ("data",)),
        g_np, engine.cache, 64, g_mask,
    )
    res = audit_compiled(lowered.compile(), mesh)
    by = res.bytes_by_axis
    # TP all-reduces must exist (the model axis is real communication)...
    assert any(o.axis == "model" for o in res.ops), res.table()
    # ...and nothing may cross `data` (DCN on a real deployment)
    assert by.get("data", 0) == 0 and by.get("mixed", 0) == 0, (
        "decode step has DCN-crossing collectives:\n" + res.table() + "\n"
        + "\n".join(o.line for o in res.ops if o.axis in ("data", "mixed"))
    )


def test_step_multi_zero_dcn_bytes(model):
    """Same invariant for the on-device multi-token decode block — the
    production steady-state path of step_multi (forward + in-block greedy
    sampling over n_steps tokens, one dispatch)."""
    import jax

    from llm_tpu.models.forward import (
        _decode_loop_batched_jit,
        window_bucket,
    )
    from llm_tpu.ops.sampling import (
        DeviceSampler,
        batched_sampler,
        ensure_value_keys,
    )
    from llm_tpu.parallel.collectives_audit import audit_compiled

    mesh = make_mesh(MeshConfig(data=2, model=4))
    engine = MultiHostEngine(model, mesh, global_streams=4,
                             kv_dtype=jnp.float32, n_batch=4)
    B = engine.max_streams
    cfg, values = batched_sampler([DeviceSampler.greedy()] * B, B)
    values = ensure_value_keys(values, cfg, B)
    logits = np.zeros((B, engine.spec.n_vocab), np.float32)
    n_past = np.ones(B, np.int32)
    mask = np.ones(B, bool)
    n_steps = 4
    g_np, g_mask = engine._replicated_rows(n_past, mask)
    lowered = _decode_loop_batched_jit.lower(
        engine.spec,
        engine.params,
        engine._to_global(logits, ("data",)),
        g_np,
        engine.cache,
        n_steps,
        window_bucket(1 + n_steps, engine.spec.n_ctx),
        cfg,
        jax.random.PRNGKey(0),
        engine._to_global(
            {k: np.asarray(v) for k, v in values.items()}, ("data",)
        ),
        g_mask,
        None,
        None,
        False,
        mesh,
        engine._h_ax,
    )
    res = audit_compiled(lowered.compile(), mesh)
    by = res.bytes_by_axis
    assert any(o.axis == "model" for o in res.ops), res.table()
    assert by.get("data", 0) == 0 and by.get("mixed", 0) == 0, (
        "step_multi block has DCN-crossing collectives:\n" + res.table()
        + "\n" + "\n".join(
            o.line for o in res.ops if o.axis in ("data", "mixed"))
    )


def test_paged_decode_zero_dcn_bytes(model):
    """Zero-DCN invariant for the PAGED multi-host dispatch (the
    production serving config): its manual-`data` shard_map must keep
    every collective off the `data` axis."""
    import jax

    from llm_tpu.parallel.collectives_audit import audit_compiled
    from llm_tpu.parallel.multihost import (
        MultiHostPagedEngine,
        _mh_paged_step,
    )

    mesh = make_mesh(MeshConfig(data=2, model=4))
    engine = MultiHostPagedEngine(
        model, mesh, global_streams=4, kv_dtype=jnp.bfloat16, n_batch=4,
        page_size=8,
    )
    B = engine.max_streams
    ids = np.zeros((B, 1), np.int32)
    n_past = np.zeros(B, np.int32)
    jitted = jax.jit(_mh_paged_step, static_argnums=(0, 6, 7, 8))
    lowered = jitted.lower(
        engine.spec, engine.params,
        engine._to_global(ids, ("data",)),
        engine._to_global(n_past, ("data",)),
        engine._to_global(engine.tables, ("data",)),
        engine.pool, 2, engine._allow_kernel, engine.mesh,
    )
    res = audit_compiled(lowered.compile(), mesh)
    by = res.bytes_by_axis
    assert by.get("data", 0) == 0 and by.get("mixed", 0) == 0, (
        "paged decode step has DCN-crossing collectives:\n" + res.table()
        + "\n" + "\n".join(
            o.line for o in res.ops if o.axis in ("data", "mixed"))
    )


def test_multihost_engine_int8_single_process(model):
    mesh = make_mesh(MeshConfig(data=2, model=4))
    engine = MultiHostEngine(model, mesh, global_streams=2,
                             kv_dtype="int8", n_batch=4)
    ref_engine = Engine(model, max_streams=1, kv_dtype="int8")
    ref = ref_engine.generate_all(
        [GenerationRequest(prompt=[2, 3], max_tokens=8,
                           sampler=DeterministicSampler())]
    )
    texts = engine.generate_all(
        [GenerationRequest(prompt=[2, 3], max_tokens=8,
                           sampler=DeterministicSampler())]
    )
    assert list(texts.values()) == [ref[0]]


def test_multihost_two_processes(model, tmp_path):
    """TWO separate host processes coordinate a global mesh and serve
    disjoint streams; every stream's output must equal the single-process
    engine's (cross-host TP-sharded weights + data-sharded KV, interleaved
    chunked prefill included)."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "mh", "worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env.pop("JAX_PLATFORM_NAME", None)
    env["PYTHONPATH"] = "/root/repo"
    outs = [tmp_path / f"out{i}.json" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port), str(outs[i])],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for i in range(2)
    ]
    for p in procs:
        try:
            p.wait(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
    for p in procs:
        assert p.returncode == 0, p.stderr.read().decode()[-3000:]

    results = [json.loads(outs[i].read_text()) for i in range(2)]
    host_prompts = {0: [[2, 3], [9, 4, 5]], 1: [[7, 8], [5, 6] * 8]}
    for pid in range(2):
        refs = _reference(model, host_prompts[pid])
        got = [results[pid]["texts"][str(i)] for i in range(2)]
        assert got == refs, f"host {pid}: {got} != {refs}"
        # the greedy step_multi phase must match the same references
        # (host sampling chain default == greedy on these prompts? no —
        # compare against explicit greedy refs)
        from llm_tpu.samplers import GreedySampler

        greedy_engine = Engine(model, max_streams=2, kv_dtype=jnp.float32)
        grefs = greedy_engine.generate_all(
            [GenerationRequest(prompt=p, max_tokens=8,
                               sampler=GreedySampler())
             for p in host_prompts[pid]]
        )
        gmulti = [results[pid]["multi"][str(i)] for i in range(2)]
        assert gmulti == [grefs[0], grefs[1]], f"host {pid} multi: {gmulti}"
        # the paged phase (host-local page pools, bf16) must match the
        # dense bf16 engine
        paged_engine = Engine(model, max_streams=2, kv_dtype=jnp.bfloat16)
        prefs = paged_engine.generate_all(
            [GenerationRequest(prompt=p, max_tokens=8,
                               sampler=DeterministicSampler())
             for p in host_prompts[pid]]
        )
        gpaged = [results[pid]["paged"][str(i)] for i in range(2)]
        assert gpaged == [prefs[0], prefs[1]], f"host {pid} paged: {gpaged}"
        # the checkpoint/resume phase (per-host files carrying PARTIAL
        # global-pool rows, restored mid-flight) must also match
        gckpt = [results[pid]["ckpt"][str(i)] for i in range(2)]
        assert gckpt == [prefs[0], prefs[1]], f"host {pid} ckpt: {gckpt}"
        # the HTTP phase (per-host LlmServer over the cross-host engine,
        # temperature=0 -> argmax) must match the greedy references
        ghttp = [results[pid]["http"][str(i)] for i in range(2)]
        assert ghttp == [grefs[0], grefs[1]], f"host {pid} http: {ghttp}"


def test_multihost_step_multi_single_process(model):
    """On-device multi-token decode across the coordinated global batch
    (single-process mesh): greedy output equals the dense engine."""
    from llm_tpu.ops.sampling import DeviceSampler

    ref_engine = Engine(model, max_streams=2, kv_dtype=jnp.float32)
    from llm_tpu.samplers import GreedySampler
    refs = ref_engine.generate_all(
        [GenerationRequest(prompt=p, max_tokens=8, sampler=GreedySampler())
         for p in [[2, 3], [9, 4, 5]]]
    )

    mesh = make_mesh(MeshConfig(data=2, model=4))
    engine = MultiHostEngine(model, mesh, global_streams=2,
                             kv_dtype=jnp.float32, n_batch=4)
    ids = [
        engine.submit(GenerationRequest(
            prompt=p, max_tokens=8, device_sampler=DeviceSampler.greedy()))
        for p in [[2, 3], [9, 4, 5]]
    ]
    while engine.has_work_global():
        engine.step_multi(4)
    got = ["".join(engine.finished[i].text) for i in ids]
    assert got == [refs[0], refs[1]]


def test_multihost_admission_near_context_boundary(model):
    """Regression (round-2 review finding): the global prefill chunk's
    n_batch-wide dummy rows used to clamp in dynamic_update_slice near the
    context limit and overwrite LIVE cache of decoding streams; write_mask
    now suppresses dummy writes entirely."""
    from llm_tpu.samplers import GreedySampler

    mesh = make_mesh(MeshConfig(data=2, model=4))
    engine = MultiHostEngine(model, mesh, global_streams=2,
                             kv_dtype=jnp.float32, n_batch=8)
    # stream A: long prompt, decode until close to n_ctx=64
    a = engine.submit(GenerationRequest(prompt=[2] * 41, max_tokens=20,
                                        sampler=GreedySampler()))
    for _ in range(21):
        engine.step()
    sa = engine.slots[0]
    # prefill (6 chunked steps) + decodes -> past 56 -> next dummy row spans [57, 65) > n_ctx, the
    # exact pre-fix clamp trigger
    assert sa is not None and sa.n_past >= 56
    # admit B now: its 8-wide prefill dispatch gives A a dummy row whose
    # clamped write would have corrupted A's positions < n_past
    engine.submit(GenerationRequest(prompt=[5, 6, 7], max_tokens=2,
                                    sampler=GreedySampler()))
    while engine.has_work_global():
        engine.step()
    ref_engine = Engine(model, max_streams=1, kv_dtype=jnp.float32)
    ref = ref_engine.generate_all(
        [GenerationRequest(prompt=[2] * 41, max_tokens=20,
                           sampler=GreedySampler())]
    )
    assert "".join(engine.finished[a].text) == ref[0]


def test_multihost_paged_single_process(model):
    """MultiHostPagedEngine (host-local page pools, manual-`data`
    shard_map, auto `model` TP) equals the dense engine on a single-process
    2x4 mesh — including a prompt long enough to interleave chunked
    prefill with running decodes."""
    from llm_tpu.parallel.multihost import MultiHostPagedEngine

    mesh = make_mesh(MeshConfig(data=2, model=4))
    engine = MultiHostPagedEngine(
        model, mesh, global_streams=4, kv_dtype=jnp.bfloat16, n_batch=4,
        page_size=8,
    )
    prompts = [[2, 3], [9, 4, 5], [7, 8], [5, 6] * 8]
    texts = engine.generate_all(
        [GenerationRequest(prompt=p, max_tokens=8,
                           sampler=DeterministicSampler())
         for p in prompts]
    )
    ref_engine = Engine(model, max_streams=4, kv_dtype=jnp.bfloat16)
    refs = ref_engine.generate_all(
        [GenerationRequest(prompt=p, max_tokens=8,
                           sampler=DeterministicSampler())
         for p in prompts]
    )
    assert [texts[k] for k in sorted(texts)] == [refs[i] for i in sorted(refs)]


def test_multihost_paged_int8(model):
    from llm_tpu.parallel.multihost import MultiHostPagedEngine
    from llm_tpu.paged import PagedEngine

    mesh = make_mesh(MeshConfig(data=2, model=4))
    engine = MultiHostPagedEngine(
        model, mesh, global_streams=2, kv_dtype="int8", n_batch=4,
        page_size=8,
    )
    ref_engine = PagedEngine(
        model, max_streams=1, kv_dtype="int8", n_batch=4, page_size=8
    )
    req = lambda: GenerationRequest(
        prompt=[2, 3, 4], max_tokens=8, sampler=DeterministicSampler()
    )
    refs = ref_engine.generate_all([req()])
    texts = engine.generate_all([req()])
    assert list(texts.values()) == [refs[0]]


def test_multihost_paged_int4(model):
    """Nibble-packed pools under the manual-`data` shard_map + `model`-TP
    jnp page-scan path (the Pallas kernel is gated off on a mesh)."""
    from llm_tpu.parallel.multihost import MultiHostPagedEngine
    from llm_tpu.paged import PagedEngine

    mesh = make_mesh(MeshConfig(data=2, model=4))
    engine = MultiHostPagedEngine(
        model, mesh, global_streams=2, kv_dtype="int4", n_batch=4,
        page_size=8,
    )
    ref_engine = PagedEngine(
        model, max_streams=1, kv_dtype="int4", n_batch=4, page_size=8
    )
    req = lambda: GenerationRequest(
        prompt=[2, 3, 4], max_tokens=8, sampler=DeterministicSampler()
    )
    refs = ref_engine.generate_all([req()])
    texts = engine.generate_all([req()])
    assert list(texts.values()) == [refs[0]]


def test_multihost_paged_kv_oom_retires(model):
    """A pool too small for the prompt retires the stream with kv_oom
    instead of deadlocking the global lockstep."""
    from llm_tpu.parallel.multihost import MultiHostPagedEngine

    mesh = make_mesh(MeshConfig(data=2, model=4))
    # 2 local pages (1 real beside trash) of 8 positions; prompt needs 3
    engine = MultiHostPagedEngine(
        model, mesh, global_streams=2, kv_dtype=jnp.bfloat16, n_batch=4,
        page_size=8, n_pages=2,
    )
    rid = engine.submit(
        GenerationRequest(prompt=[2] * 20, max_tokens=4,
                          sampler=DeterministicSampler())
    )
    for _ in range(30):
        if not engine.has_work_global():
            break
        engine.step()
    assert engine.finished[rid].finish_reason == "kv_oom"


def test_multihost_paged_step_multi(model):
    """Paged on-device multi-token decode across the coordinated global
    batch: greedy output equals the dense engine, page allocation covers
    whole blocks, and a long prompt's chunked prefill interleaves."""
    from llm_tpu.ops.sampling import DeviceSampler
    from llm_tpu.parallel.multihost import MultiHostPagedEngine
    from llm_tpu.samplers import GreedySampler

    prompts = [[2, 3], [9, 4, 5], [5, 6] * 8]
    ref_engine = Engine(model, max_streams=4, kv_dtype=jnp.bfloat16)
    refs = ref_engine.generate_all(
        [GenerationRequest(prompt=p, max_tokens=9, sampler=GreedySampler())
         for p in prompts]
    )

    mesh = make_mesh(MeshConfig(data=2, model=4))
    engine = MultiHostPagedEngine(
        model, mesh, global_streams=4, kv_dtype=jnp.bfloat16, n_batch=4,
        page_size=8,
    )
    ids = [
        engine.submit(
            GenerationRequest(prompt=p, max_tokens=9,
                              device_sampler=DeviceSampler.greedy())
        )
        for p in prompts
    ]
    for _ in range(64):
        if not engine.has_work_global():
            break
        engine.step_multi(4)
    got = ["".join(engine.finished[r].text) for r in ids]
    assert got == [refs[i] for i in sorted(refs)]


def test_multihost_paged_step_multi_pool_pressure(model):
    """A pool too small for a whole block falls back to per-token steps
    (global agreement on the fallback) and still completes correctly."""
    from llm_tpu.ops.sampling import DeviceSampler
    from llm_tpu.parallel.multihost import MultiHostPagedEngine
    from llm_tpu.samplers import GreedySampler

    ref_engine = Engine(model, max_streams=1, kv_dtype=jnp.bfloat16)
    refs = ref_engine.generate_all(
        [GenerationRequest(prompt=[2, 3], max_tokens=8,
                           sampler=GreedySampler())]
    )

    mesh = make_mesh(MeshConfig(data=2, model=4))
    # 3 local pages (2 real) of 8 positions: a 16-step block never fits
    engine = MultiHostPagedEngine(
        model, mesh, global_streams=2, kv_dtype=jnp.bfloat16, n_batch=4,
        page_size=8, n_pages=3,
    )
    rid = engine.submit(
        GenerationRequest(prompt=[2, 3], max_tokens=8,
                          device_sampler=DeviceSampler.greedy())
    )
    for _ in range(64):
        if not engine.has_work_global():
            break
        engine.step_multi(16)
    assert "".join(engine.finished[rid].text) == refs[0]


def test_multihost_step_multi_device_logprobs(model):
    """logprob requests ride the coordinated block path: entries match the
    dense engine's host-side recording."""
    from llm_tpu.ops.sampling import DeviceSampler
    from llm_tpu.samplers import GreedySampler

    ref_engine = Engine(model, max_streams=1, kv_dtype=jnp.float32)
    rid = ref_engine.submit(GenerationRequest(
        prompt=[2, 3], max_tokens=6, logprobs=2, sampler=GreedySampler()))
    while ref_engine.has_work():
        ref_engine.step()
    ref = ref_engine.finished[rid].logprob_data

    mesh = make_mesh(MeshConfig(data=2, model=4))
    engine = MultiHostEngine(model, mesh, global_streams=2,
                             kv_dtype=jnp.float32, n_batch=4)
    ids = [
        engine.submit(GenerationRequest(
            prompt=[2, 3], max_tokens=6, logprobs=2,
            device_sampler=DeviceSampler.greedy())),
        engine.submit(GenerationRequest(
            prompt=[9, 4], max_tokens=6,
            device_sampler=DeviceSampler.greedy())),
    ]
    while engine.has_work_global():
        engine.step_multi(4)
    got = engine.finished[ids[0]].logprob_data
    assert len(got) == len(ref) == 6
    for h, d in zip(ref, got):
        assert h["token"] == d["token"]
        assert abs(h["logprob"] - d["logprob"]) < 1e-3
        assert set(h["top_logprobs"]) == set(d["top_logprobs"])


def test_multihost_paged_step_multi_logprobs(model):
    """Same through the paged shard_map loop (host-local pools)."""
    from llm_tpu.ops.sampling import DeviceSampler
    from llm_tpu.parallel.multihost import MultiHostPagedEngine

    mesh = make_mesh(MeshConfig(data=2, model=4))
    engine = MultiHostPagedEngine(model, mesh, global_streams=2,
                                  kv_dtype=jnp.float32, page_size=16,
                                  n_batch=16)
    rid = engine.submit(GenerationRequest(
        prompt=[2, 3], max_tokens=5, logprobs=2,
        device_sampler=DeviceSampler.greedy()))
    while engine.has_work_global():
        engine.step_multi(4)
    data = engine.finished[rid].logprob_data
    assert len(data) == 5
    for e in data:
        assert len(e["top_logprobs"]) == 2
        assert abs(max(e["top_logprobs"].values()) - e["logprob"]) < 1e-5


def test_multihost_step_multi_penalties(model):
    """Windowed repetition penalties through the coordinated dense block
    path: equals the single-host engine's device-penalized greedy."""
    from llm_tpu.ops.sampling import DeviceSampler

    ds = DeviceSampler(kind="greedy", repeat_penalty=1.4, penalty_last_n=8)
    ref_engine = Engine(model, max_streams=1, kv_dtype=jnp.float32)
    ref = ref_engine.generate_all(
        [GenerationRequest(prompt=[2, 3], max_tokens=10, device_sampler=ds)],
        n_steps=4,
    )[0]

    mesh = make_mesh(MeshConfig(data=2, model=4))
    engine = MultiHostEngine(model, mesh, global_streams=2,
                             kv_dtype=jnp.float32, n_batch=4)
    ids = [
        engine.submit(GenerationRequest(
            prompt=[2, 3], max_tokens=10, device_sampler=ds)),
        engine.submit(GenerationRequest(
            prompt=[9, 4], max_tokens=10,
            device_sampler=DeviceSampler.greedy())),
    ]
    while engine.has_work_global():
        engine.step_multi(4)
    assert "".join(engine.finished[ids[0]].text) == ref


def test_multihost_paged_step_multi_penalties(model):
    """Penalty state rides the paged shard_map loop (data-sharded dict)."""
    from llm_tpu.ops.sampling import DeviceSampler
    from llm_tpu.paged import PagedEngine
    from llm_tpu.parallel.multihost import MultiHostPagedEngine

    ds = DeviceSampler(kind="greedy", repeat_penalty=1.4, penalty_last_n=8)
    ref_engine = PagedEngine(model, max_streams=1, page_size=16,
                             kv_dtype=jnp.float32)
    ref = ref_engine.generate_all(
        [GenerationRequest(prompt=[2, 3], max_tokens=10, device_sampler=ds)],
        n_steps=4,
    )[0]

    mesh = make_mesh(MeshConfig(data=2, model=4))
    engine = MultiHostPagedEngine(model, mesh, global_streams=2,
                                  kv_dtype=jnp.float32, page_size=16,
                                  n_batch=16)
    rid = engine.submit(GenerationRequest(
        prompt=[2, 3], max_tokens=10, device_sampler=ds))
    while engine.has_work_global():
        engine.step_multi(4)
    assert "".join(engine.finished[rid].text) == ref


def test_multihost_step_multi_mirostat(model):
    """Mirostat streams ride the multi-host block path (round 4): the mu
    carry threads through the globally-coordinated decode and persists on
    the stream; a greedy batchmate still matches the dense reference."""
    from llm_tpu.ops.sampling import DeviceSampler, mirostat_mu_init
    from llm_tpu.samplers import GreedySampler

    ref_engine = Engine(model, max_streams=1, kv_dtype=jnp.float32)
    ref = ref_engine.generate_all(
        [GenerationRequest(prompt=[2, 3], max_tokens=8,
                           sampler=GreedySampler())]
    )[0]

    mesh = make_mesh(MeshConfig(data=2, model=4))
    engine = MultiHostEngine(model, mesh, global_streams=2,
                             kv_dtype=jnp.float32, n_batch=4)
    ms = DeviceSampler(kind="sample", temperature=0.9, mirostat=2,
                       mirostat_tau=4.0)
    g = engine.submit(GenerationRequest(
        prompt=[2, 3], max_tokens=8, device_sampler=DeviceSampler.greedy()))
    m = engine.submit(GenerationRequest(
        prompt=[9, 4, 5], max_tokens=8, device_sampler=ms))
    mus = []
    while engine.has_work_global():
        engine.step_multi(4)
        for s in engine.slots:
            if s is not None and s.request.device_sampler.mirostat:
                mus.append(s.mirostat_mu)
    assert "".join(engine.finished[g].text) == ref
    assert len("".join(engine.finished[m].text)) > 0
    assert mus and any(x != mirostat_mu_init(ms) for x in mus), mus


def test_multihost_paged_step_multi_mirostat(model):
    from llm_tpu.ops.sampling import DeviceSampler
    from llm_tpu.parallel.multihost import MultiHostPagedEngine
    from llm_tpu.samplers import GreedySampler

    ref_engine = Engine(model, max_streams=1, kv_dtype=jnp.float32)
    ref = ref_engine.generate_all(
        [GenerationRequest(prompt=[2, 3], max_tokens=6,
                           sampler=GreedySampler())]
    )[0]

    mesh = make_mesh(MeshConfig(data=2, model=4))
    engine = MultiHostPagedEngine(model, mesh, global_streams=2,
                                  kv_dtype="int8", n_batch=4, page_size=8)
    g = engine.submit(GenerationRequest(
        prompt=[2, 3], max_tokens=6, device_sampler=DeviceSampler.greedy()))
    m = engine.submit(GenerationRequest(
        prompt=[9, 4, 5], max_tokens=6,
        device_sampler=DeviceSampler(kind="sample", temperature=0.9,
                                     mirostat=1)))
    while engine.has_work_global():
        engine.step_multi(4)
    assert "".join(engine.finished[g].text) == ref
    assert len("".join(engine.finished[m].text)) > 0
