"""Speculative decoding: output must be EXACTLY the target's greedy
generation, for any draft model (the draft changes speed, never text)."""

import jax.numpy as jnp
import numpy as np
import pytest

from llm_tpu.loader import ModelParameters, load
from llm_tpu.models.forward import forward_step, init_cache
from llm_tpu.speculative import SpeculativeSession
from llm_tpu.testing import make_tiny_file


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    d = tmp_path_factory.mktemp("spec")
    t = d / "target.bin"
    dr = d / "draft.bin"
    make_tiny_file("llama", t, seed=0)
    # draft: same vocab, different weights and depth (a REAL mismatched
    # draft — most proposals will be wrong)
    make_tiny_file("llama", dr, seed=7, n_layer=1)
    target = load(t, "llama", params=ModelParameters(context_size=64))
    draft = load(dr, "llama", params=ModelParameters(context_size=64))
    return target, draft


def _greedy_reference(model, prompt, n):
    cache = init_cache(model.spec, jnp.bfloat16)
    logits, _, cache = forward_step(
        model.spec, model.params, jnp.asarray(prompt, jnp.int32),
        jnp.int32(0), cache,
    )
    last = np.asarray(logits)[-1]
    n_past = len(prompt)
    out = []
    eot = model.eot_token_id()
    for _ in range(n):
        tok = int(np.argmax(last))
        out.append(tok)
        if tok == eot:
            break
        logits, _, cache = forward_step(
            model.spec, model.params, jnp.asarray([tok], jnp.int32),
            jnp.int32(n_past), cache,
        )
        last = np.asarray(logits)[0]
        n_past += 1
    return out


@pytest.mark.parametrize("k", [1, 3, 4])
def test_speculative_equals_greedy_mismatched_draft(models, k):
    target, draft = models
    prompt = [2, 9, 4]
    ref = _greedy_reference(target, prompt, 16)

    s = SpeculativeSession(target, draft, k=k, kv_dtype=jnp.bfloat16)
    s.feed_prompt(prompt)
    out = s.generate(16)
    assert out == ref, (out, ref, s.acceptance_rate)


def test_speculative_selfdraft_accepts_everything(models):
    """Draft == target: every proposal must be accepted and the output
    still equals plain greedy."""
    target, _ = models
    prompt = [2, 9]
    ref = _greedy_reference(target, prompt, 12)
    s = SpeculativeSession(target, target, k=4)
    s.feed_prompt(prompt)
    out = s.generate(12)
    assert out == ref
    assert s.acceptance_rate > 0.95, s.acceptance_rate


def test_cli_draft_model_matches_plain_greedy(tmp_path, capsys):
    from llm_tpu.cli import main

    t = tmp_path / "t.bin"
    dr = tmp_path / "d.bin"
    make_tiny_file("llama", t, seed=0)
    make_tiny_file("llama", dr, seed=7, n_layer=1)
    base = ["-m", str(t), "-a", "llama", "-p", "<t2><t3>", "-n", "8",
            "--num-ctx-tokens", "64"]
    main(["infer"] + base + ["--sampler", "topk:k=1"])
    plain = capsys.readouterr().out
    main(["infer"] + base + ["--draft-model", str(dr)])
    spec = capsys.readouterr().out
    # the paths render BOS (<t1>) differently (per-token echo vs
    # whole-sequence decode which skips id 1); the generated text must match
    norm = lambda s: s.strip().replace("<t1>", "")
    assert norm(spec) == norm(plain)


def test_rejection_sampling_identity():
    """The accept/resample procedure must reproduce the TARGET distribution
    exactly for arbitrary (p, q) — the core speculative-sampling identity,
    checked empirically on analytic distributions."""
    rng = np.random.default_rng(0)
    V = 8
    p = rng.random(V); p /= p.sum()
    q = rng.random(V); q /= q.sum()

    N = 200_000
    counts = np.zeros(V)
    for _ in range(N):
        x = rng.choice(V, p=q)
        if rng.random() < min(1.0, p[x] / q[x]):
            counts[x] += 1
        else:
            resid = np.maximum(p - q, 0.0)
            counts[rng.choice(V, p=resid / resid.sum())] += 1
    emp = counts / N
    np.testing.assert_allclose(emp, p, atol=0.01)


def test_sampled_speculative_runs_and_is_seeded(models):
    """Sampled speculative decoding: deterministic per seed, plausible
    acceptance, different seeds diverge."""
    from llm_tpu.speculative import SampledSpeculativeSession

    target, draft = models

    def run(seed):
        s = SampledSpeculativeSession(target, draft, k=3, temperature=0.9,
                                      top_k=20)
        s.feed_prompt([2, 9, 4])
        return s.generate(12, seed=seed), s.acceptance_rate

    o1, acc = run(3)
    o2, _ = run(3)
    o3, _ = run(4)
    assert o1 == o2
    assert 0.0 <= acc <= 1.0
    assert len(o1) > 0
    assert o1 != o3 or len(o1) < 3  # different seeds diverge (overwhelmingly)


def test_sampled_speculative_selfdraft_high_acceptance(models):
    """Draft == target: p == q so min(1, p/q) == 1 and everything accepts."""
    from llm_tpu.speculative import SampledSpeculativeSession

    target, _ = models
    s = SampledSpeculativeSession(target, target, k=4, temperature=0.8)
    s.feed_prompt([2, 9])
    s.generate(12, seed=1)
    assert s.acceptance_rate > 0.95, s.acceptance_rate


# ---------------------------------------------------------------------------
# SpeculativeEngine: speculative decoding under continuous batching


def _plain_engine_greedy(target, prompts, n):
    from llm_tpu.samplers import GreedySampler
    from llm_tpu.serve import Engine, GenerationRequest

    engine = Engine(target, max_streams=len(prompts),
                    kv_dtype=jnp.float32, n_batch=8)
    out = engine.generate_all(
        [GenerationRequest(prompt=p, max_tokens=n, sampler=GreedySampler())
         for p in prompts]
    )
    return [out[i] for i in sorted(out)]


def test_speculative_engine_matches_plain_engine(models):
    """Batched speculative serving equals the plain engine's greedy output
    for every stream (f32 CPU path: bit-identical argmax)."""
    from llm_tpu.serve import GenerationRequest
    from llm_tpu.speculative import SpeculativeEngine

    target, draft = models
    prompts = [[2, 3], [9, 4, 5], [7, 8, 2, 11]]
    refs = _plain_engine_greedy(target, prompts, 12)

    engine = SpeculativeEngine(target, draft, k=4, max_streams=3,
                               kv_dtype=jnp.float32, n_batch=8)
    texts = engine.generate_all(
        [GenerationRequest(prompt=p, max_tokens=12) for p in prompts]
    )
    assert [texts[i] for i in sorted(texts)] == refs
    assert engine.drafted > 0  # the speculative path actually ran


def test_speculative_engine_interleaved_admission(models):
    """A stream admitted mid-flight (chunked prefill) joins the batched
    speculative rounds and still matches the plain engine."""
    from llm_tpu.serve import GenerationRequest
    from llm_tpu.speculative import SpeculativeEngine

    target, draft = models
    engine = SpeculativeEngine(target, draft, k=3, max_streams=2,
                               kv_dtype=jnp.float32, n_batch=4)
    a = engine.submit(GenerationRequest(prompt=[2, 3], max_tokens=10))
    engine.step()
    engine.step()
    b = engine.submit(GenerationRequest(prompt=[5, 6] * 6, max_tokens=6))
    while engine.has_work():
        engine.step()
    refs = _plain_engine_greedy(target, [[2, 3], [5, 6] * 6], 10)
    refs6 = _plain_engine_greedy(target, [[5, 6] * 6], 6)
    assert "".join(engine.finished[a].text) == refs[0]
    assert "".join(engine.finished[b].text) == refs6[0]


def test_speculative_engine_self_draft_accepts_everything(models):
    """With the target as its own draft every proposal is accepted."""
    from llm_tpu.serve import GenerationRequest
    from llm_tpu.speculative import SpeculativeEngine

    target, _ = models
    engine = SpeculativeEngine(target, target, k=4, max_streams=1,
                               kv_dtype=jnp.float32, n_batch=8)
    engine.generate_all([GenerationRequest(prompt=[2, 3], max_tokens=8)])
    assert engine.acceptance_rate > 0.9


def test_speculative_engine_rejects_nongreedy(models):
    from llm_tpu.samplers import default_samplers
    from llm_tpu.serve import GenerationRequest
    from llm_tpu.speculative import SpeculativeEngine

    target, draft = models
    engine = SpeculativeEngine(target, draft, max_streams=1,
                               kv_dtype=jnp.float32)
    with pytest.raises(ValueError):
        engine.submit(GenerationRequest(prompt=[2], max_tokens=2,
                                        sampler=default_samplers()))


def test_sampled_speculative_engine(models):
    """Batched rejection-sampling serving: deterministic per seed,
    self-draft accepts ~everything, different request seeds diverge."""
    from llm_tpu.ops.sampling import DeviceSampler
    from llm_tpu.serve import GenerationRequest
    from llm_tpu.speculative import SampledSpeculativeEngine

    target, draft = models

    def run(seed, d=None):
        engine = SampledSpeculativeEngine(
            target, d or draft, k=3, max_streams=2,
            kv_dtype=jnp.float32, n_batch=8,
        )
        out = engine.generate_all([
            GenerationRequest(
                prompt=[2, 9, 4], max_tokens=10, seed=seed,
                device_sampler=DeviceSampler(kind="sample",
                                             temperature=0.9, top_k=20),
            ),
            GenerationRequest(
                prompt=[7, 8], max_tokens=10, seed=seed + 1,
                device_sampler=DeviceSampler(kind="sample",
                                             temperature=0.7, top_k=8),
            ),
        ])
        return [out[i] for i in sorted(out)], engine.acceptance_rate

    o1, acc = run(3)
    o2, _ = run(3)
    o3, _ = run(11)
    assert o1 == o2  # deterministic per seed
    assert 0.0 <= acc <= 1.0
    assert all(len(t) > 0 for t in o1)
    assert o1 != o3  # different seeds diverge (overwhelmingly)

    _, acc_self = run(5, d=models[0])  # draft == target: p == q
    assert acc_self > 0.9, acc_self


def test_sampled_speculative_engine_rejects_host_sampler(models):
    from llm_tpu.serve import GenerationRequest
    from llm_tpu.speculative import SampledSpeculativeEngine

    target, draft = models
    engine = SampledSpeculativeEngine(target, draft, max_streams=1,
                                      kv_dtype=jnp.float32)
    with pytest.raises(ValueError):
        engine.submit(GenerationRequest(prompt=[2], max_tokens=2))


def test_paged_speculative_matches_plain_paged(models):
    """Speculative decoding over a PAGED target pool equals the plain
    paged engine's greedy output for every stream."""
    from llm_tpu.paged import PagedEngine
    from llm_tpu.serve import GenerationRequest
    from llm_tpu.speculative import PagedSpeculativeEngine

    target, draft = models
    prompts = [[2, 3], [9, 4, 5], [7, 8, 2, 11]]
    from llm_tpu.samplers import GreedySampler

    plain = PagedEngine(target, max_streams=3, page_size=16,
                        kv_dtype=jnp.float32)
    ref_texts = plain.generate_all(
        [GenerationRequest(prompt=p, max_tokens=12, sampler=GreedySampler())
         for p in prompts]
    )
    refs = [ref_texts[i] for i in sorted(ref_texts)]

    engine = PagedSpeculativeEngine(target, draft, k=4, max_streams=3,
                                    page_size=16, kv_dtype=jnp.float32,
                                    n_batch=8)
    texts = engine.generate_all(
        [GenerationRequest(prompt=p, max_tokens=12) for p in prompts]
    )
    assert [texts[i] for i in sorted(texts)] == refs
    assert engine.drafted > 0
    # pages all returned when the streams retire
    assert engine.allocator.available == engine.pool.n_pages - 1


def test_paged_speculative_int8_pool(models):
    from llm_tpu.paged import PagedEngine
    from llm_tpu.serve import GenerationRequest
    from llm_tpu.speculative import PagedSpeculativeEngine

    target, draft = models
    from llm_tpu.samplers import GreedySampler

    plain = PagedEngine(target, max_streams=1, page_size=16, kv_dtype="int8")
    ref = plain.generate_all(
        [GenerationRequest(prompt=[2, 3], max_tokens=10,
                           sampler=GreedySampler())]
    )[0]
    engine = PagedSpeculativeEngine(target, draft, k=3, max_streams=1,
                                    page_size=16, kv_dtype="int8")
    got = engine.generate_all(
        [GenerationRequest(prompt=[2, 3], max_tokens=10)]
    )[0]
    assert got == ref


def test_paged_speculative_with_prefix_cache(models):
    """Prefix reuse composes with paged speculative rounds: borrowed
    prompt pages are never written by verify overshoot."""
    from llm_tpu.serve import GenerationRequest
    from llm_tpu.speculative import PagedSpeculativeEngine

    target, draft = models
    prompt = list(range(2, 21))
    engine = PagedSpeculativeEngine(target, draft, k=3, max_streams=1,
                                    page_size=8, kv_dtype=jnp.float32,
                                    prefix_cache=True)
    first = engine.generate_all(
        [GenerationRequest(prompt=prompt, max_tokens=8)]
    )
    second = engine.generate_all(
        [GenerationRequest(prompt=prompt, max_tokens=8)]
    )
    assert list(first.values())[0] == list(second.values())[0]


def test_paged_speculative_tight_pool_falls_back(models):
    """A pool too small for k-token rounds still completes correctly via
    the per-token paged fallback."""
    from llm_tpu.paged import PagedEngine
    from llm_tpu.serve import GenerationRequest
    from llm_tpu.speculative import PagedSpeculativeEngine

    target, draft = models
    from llm_tpu.samplers import GreedySampler

    plain = PagedEngine(target, max_streams=1, page_size=16,
                        kv_dtype=jnp.float32)
    ref = plain.generate_all(
        [GenerationRequest(prompt=[2, 3], max_tokens=10,
                           sampler=GreedySampler())]
    )[0]
    engine = PagedSpeculativeEngine(target, draft, k=4, max_streams=1,
                                    page_size=16, n_pages=3,
                                    kv_dtype=jnp.float32)
    got = engine.generate_all(
        [GenerationRequest(prompt=[2, 3], max_tokens=10)]
    )[0]
    assert got == ref


def test_paged_speculative_self_draft_accepts_everything(models):
    from llm_tpu.serve import GenerationRequest
    from llm_tpu.speculative import PagedSpeculativeEngine

    target, _ = models
    engine = PagedSpeculativeEngine(target, target, k=4, max_streams=1,
                                    page_size=16, kv_dtype=jnp.float32)
    engine.generate_all([GenerationRequest(prompt=[2, 3], max_tokens=12)])
    assert engine.acceptance_rate > 0.9


def test_paged_sampled_speculative_engine(models):
    """Rejection-sampling speculative over a paged pool: deterministic per
    seed, correct page accounting, high self-draft acceptance."""
    from llm_tpu.ops.sampling import DeviceSampler
    from llm_tpu.serve import GenerationRequest
    from llm_tpu.speculative import PagedSampledSpeculativeEngine

    target, draft = models

    def run(seed, d=None, **kw):
        engine = PagedSampledSpeculativeEngine(
            target, d or draft, k=3, max_streams=2, page_size=16,
            kv_dtype=jnp.float32, n_batch=8, **kw,
        )
        out = engine.generate_all([
            GenerationRequest(
                prompt=[2, 9, 4], max_tokens=10, seed=seed,
                device_sampler=DeviceSampler(kind="sample",
                                             temperature=0.9, top_k=20),
            ),
            GenerationRequest(
                prompt=[7, 8], max_tokens=10, seed=seed + 1,
                device_sampler=DeviceSampler(kind="sample",
                                             temperature=0.7, top_k=8),
            ),
        ])
        return [out[i] for i in sorted(out)], engine

    o1, e1 = run(3)
    o2, _ = run(3)
    assert o1 == o2  # deterministic per seed
    assert all(len(t) > 0 for t in o1)
    # pages all returned
    assert e1.allocator.available == e1.pool.n_pages - 1

    _, e_self = run(5, d=target)
    assert e_self.acceptance_rate > 0.9

    # tight pool: rounds fall back to per-token but still complete
    o_tight, _ = run(3, n_pages=3)
    assert all(len(t) > 0 for t in o_tight)


def test_paged_sampled_speculative_int8(models):
    from llm_tpu.ops.sampling import DeviceSampler
    from llm_tpu.serve import GenerationRequest
    from llm_tpu.speculative import PagedSampledSpeculativeEngine

    target, draft = models
    engine = PagedSampledSpeculativeEngine(
        target, draft, k=3, max_streams=1, page_size=16, kv_dtype="int8",
    )
    out = engine.generate_all([
        GenerationRequest(
            prompt=[2, 3], max_tokens=8, seed=1,
            device_sampler=DeviceSampler(kind="sample", temperature=0.8,
                                         top_k=10),
        )
    ])
    assert len(list(out.values())[0]) > 0


def test_paged_speculative_prefix_borrow_prefills_draft(models):
    """Borrowed target pages skip TARGET prefill, but the dense draft
    cache must still be prefilled over the skipped region (stale draft KV
    would silently degrade proposals and determinism)."""
    import jax

    from llm_tpu.serve import GenerationRequest
    from llm_tpu.speculative import PagedSpeculativeEngine

    target, draft = models
    prompt = list(range(2, 21))  # 19 toks + BOS = 20 -> 2 full pages of 8
    engine = PagedSpeculativeEngine(target, draft, k=3, max_streams=1,
                                    page_size=8, kv_dtype=jnp.float32,
                                    n_batch=8, prefix_cache=True)
    engine.generate_all([GenerationRequest(prompt=prompt, max_tokens=4)])
    assert engine.prefix_cache.evictable == 2  # pages registered

    # wipe the draft cache, then admit the same prompt: the borrow jumps
    # prefill_pos to 16, and the draft must be re-prefilled over [0, 16)
    engine.d_cache = jax.tree.map(jnp.zeros_like, engine.d_cache)
    rid = engine.submit(GenerationRequest(prompt=prompt, max_tokens=4))
    engine._admit()
    stream = engine.slots[0]
    assert stream is not None and stream.prefill_pos == 16  # borrowed
    k_slice = np.asarray(engine.d_cache.k[:, 0, :16])
    assert np.abs(k_slice).sum() > 0, "draft cache not prefilled over the borrow"
    while engine.has_work():
        engine.step()
    assert len("".join(engine.finished[rid].text)) > 0


def test_speculative_engine_tp_mesh_matches_single_device(models):
    """Speculative serving under a TP(+DP) mesh: target and draft both
    shard; greedy output equals the unsharded engine."""
    from llm_tpu.parallel.sharding import MeshConfig, make_mesh
    from llm_tpu.serve import GenerationRequest
    from llm_tpu.speculative import SpeculativeEngine

    target, draft = models
    prompts = [[2, 3], [9, 4, 5]]
    base = SpeculativeEngine(target, draft, k=3, max_streams=2,
                             kv_dtype=jnp.float32, n_batch=8)
    refs = base.generate_all(
        [GenerationRequest(prompt=p, max_tokens=10) for p in prompts]
    )

    mesh = make_mesh(MeshConfig(data=2, model=4))
    engine = SpeculativeEngine(target, draft, k=3, max_streams=2,
                               kv_dtype=jnp.float32, n_batch=8, mesh=mesh)
    texts = engine.generate_all(
        [GenerationRequest(prompt=p, max_tokens=10) for p in prompts]
    )
    assert [texts[i] for i in sorted(texts)] == [refs[i] for i in sorted(refs)]
    assert engine.drafted > 0


def test_paged_speculative_engine_tp_mesh(models):
    from llm_tpu.parallel.sharding import MeshConfig, make_mesh
    from llm_tpu.serve import GenerationRequest
    from llm_tpu.speculative import PagedSpeculativeEngine

    target, draft = models
    base = PagedSpeculativeEngine(target, draft, k=3, max_streams=1,
                                  page_size=16, kv_dtype=jnp.float32)
    ref = base.generate_all(
        [GenerationRequest(prompt=[2, 3], max_tokens=10)]
    )
    mesh = make_mesh(MeshConfig(data=1, model=8))
    engine = PagedSpeculativeEngine(target, draft, k=3, max_streams=1,
                                    page_size=16, kv_dtype=jnp.float32,
                                    mesh=mesh)
    got = engine.generate_all(
        [GenerationRequest(prompt=[2, 3], max_tokens=10)]
    )
    assert list(got.values()) == list(ref.values())


def test_sampled_speculative_greedy_conversion_matches_plain(models):
    """kind=greedy converts to sample(top-k 1): acceptance degenerates to
    the greedy comparison, so output equals plain greedy text."""
    from llm_tpu.ops.sampling import DeviceSampler
    from llm_tpu.serve import GenerationRequest
    from llm_tpu.speculative import SampledSpeculativeEngine

    target, draft = models
    ref = _plain_engine_greedy(target, [[2, 3]], 10)[0]
    engine = SampledSpeculativeEngine(target, draft, k=3, max_streams=1,
                                      kv_dtype=jnp.float32, n_batch=8)
    out = engine.generate_all([
        GenerationRequest(prompt=[2, 3], max_tokens=10, seed=0,
                          device_sampler=DeviceSampler.greedy())
    ])
    assert list(out.values())[0] == ref


def test_sampled_speculative_top_p_exact_q(models):
    """With top_p set, the host acceptance q must equal the device
    proposal distribution — self-draft then accepts ~everything (p == q
    requires the transforms to match exactly)."""
    from llm_tpu.ops.sampling import DeviceSampler
    from llm_tpu.serve import GenerationRequest
    from llm_tpu.speculative import SampledSpeculativeEngine

    target, _ = models
    engine = SampledSpeculativeEngine(target, target, k=4, max_streams=1,
                                      kv_dtype=jnp.float32, n_batch=8)
    engine.generate_all([
        GenerationRequest(
            prompt=[2, 3], max_tokens=12, seed=2,
            device_sampler=DeviceSampler(kind="sample", temperature=0.9,
                                         top_k=30, top_p=0.7, min_p=0.02),
        )
    ])
    assert engine.acceptance_rate > 0.9, engine.acceptance_rate


def test_sampling_probs_matches_device_transform():
    """Host q (numpy, float64) keeps the same SUPPORT as the device
    transform for top-k/top-p/min-p/bias combinations."""
    import jax

    from llm_tpu.ops.sampling import DeviceSampler, device_sample
    from llm_tpu.speculative import _sampling_probs

    rng = np.random.default_rng(8)
    for trial in range(5):
        row = rng.normal(size=97).astype(np.float32) * 2
        ds = DeviceSampler(kind="sample", temperature=0.9, top_k=25,
                           top_p=0.8, min_p=0.05, bias=((3, 2.5),))
        q = _sampling_probs(row, ds.temperature, ds.top_k, ds.top_p,
                            ds.min_p, ds.bias)
        support = set(np.nonzero(q > 0)[0])
        keys = jax.random.split(jax.random.PRNGKey(trial), 60)
        toks = np.asarray(jax.vmap(
            lambda k: device_sample(jnp.asarray(row), k, ds)
        )(keys))
        assert set(int(t) for t in toks) <= support, trial


def test_speculative_session_context_full(models):
    from llm_tpu.session import ContextFull

    target, draft = models
    s = SpeculativeSession(target, draft, k=4)
    with pytest.raises(ContextFull):
        s.feed_prompt([2] * 64)  # n_ctx = 64: silent KV clobber before


def test_fallback_step_repairs_draft_cache(models):
    """After a per-token fallback (no speculative round ran), the emitted
    token must be evaluated into the DRAFT cache too: with draft==target
    the acceptance rate stays 100% — a stale draft row at the fallback
    position would diverge later proposals (advisor r4)."""
    from llm_tpu.samplers import GreedySampler
    from llm_tpu.serve import GenerationRequest
    from llm_tpu.speculative import SpeculativeEngine

    target, _ = models
    ref = _greedy_reference(target, [2, 9], 12)

    engine = SpeculativeEngine(target, target, k=4, max_streams=2)
    forced = {"n": 2}
    orig = engine._reserve_round

    def deny_twice(decodable, k):
        if forced["n"] > 0:
            forced["n"] -= 1
            return False  # forces _fallback_step (target-only progress)
        return orig(decodable, k)

    engine._reserve_round = deny_twice
    rid = engine.submit(GenerationRequest(
        prompt=[2, 9], max_tokens=12, sampler=GreedySampler()))
    rounds = []
    prev = (0, 0)
    while engine.has_work():
        engine.step()
        d, a = engine.drafted - prev[0], engine.accepted - prev[1]
        prev = (engine.drafted, engine.accepted)
        if d:
            rounds.append((d, a))
    toks = engine.finished[rid].tokens[2:]  # strip the prompt
    assert toks == ref[: len(toks)]
    assert forced["n"] == 0  # both fallbacks actually happened
    # self-draft: every speculative round fully accepts, except the
    # TERMINAL one (EoT / max_tokens legitimately stop mid-round). A
    # stale draft row at a fallback position would under-accept the
    # first post-fallback round.
    assert rounds, "no speculative round ran"
    for d, a in rounds[:-1]:
        assert a == d, rounds
