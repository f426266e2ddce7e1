"""On-device multi-step decode must match host-side greedy decoding."""

import jax.numpy as jnp
import numpy as np
import pytest

from llm_tpu.loader import ModelParameters, load
from llm_tpu.ops.sampling import DeviceSampler
from llm_tpu.samplers import GreedySampler
from llm_tpu.serve import Engine, GenerationRequest
from llm_tpu.session import (
    InferenceParameters,
    InferenceRequest,
    InferenceSession,
    InferenceSessionConfig,
    ModelKVMemoryType,
)
from llm_tpu.testing import make_tiny_file


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("dev") / "llama.bin"
    make_tiny_file("llama", path)
    return load(path, "llama", params=ModelParameters(context_size=64))


def _cfg():
    return InferenceSessionConfig(
        memory_k_type=ModelKVMemoryType.Float32,
        memory_v_type=ModelKVMemoryType.Float32,
    )


def _host_greedy(model, prompt, n):
    session = InferenceSession(model, _cfg())
    out = []
    session.infer(
        InferenceRequest(
            prompt=prompt,
            parameters=InferenceParameters(sampler=GreedySampler()),
            maximum_token_count=n,
        ),
        rng=np.random.default_rng(0),
        callback=lambda r: out.append(r.text) if r.kind == "inferred_token" else None,
    )
    return "".join(out), list(session.tokens)


def test_infer_device_greedy_matches_host(model):
    ref_text, ref_tokens = _host_greedy(model, "<t2><t3>", 12)

    session = InferenceSession(model, _cfg())
    produced = []
    session.infer_device(
        "<t2><t3>", 12, sampler=DeviceSampler.greedy(), n_steps=5,
        callback=lambda t: produced.append(t),
    )
    assert "".join(produced) == ref_text
    assert session.tokens[: len(ref_tokens)] == ref_tokens


def test_engine_step_multi_greedy_matches_host(model):
    prompts = ["<t2><t3>", "<t9><t4><t5>", "<t7>"]
    refs = [_host_greedy(model, p, 8)[0] for p in prompts]

    engine = Engine(model, max_streams=3, kv_dtype=jnp.float32)
    texts = engine.generate_all(
        [
            GenerationRequest(
                prompt=p, max_tokens=8, device_sampler=DeviceSampler.greedy()
            )
            for p in prompts
        ],
        n_steps=4,
    )
    assert [texts[i] for i in range(3)] == refs


def test_device_sampler_topk_reproducible(model):
    session1 = InferenceSession(model, _cfg())
    session2 = InferenceSession(model, _cfg())
    s = DeviceSampler.top_k_temperature(k=10, temperature=0.9)
    out1, out2 = [], []
    session1.infer_device("<t2>", 10, sampler=s, seed=7,
                          callback=lambda t: out1.append(t))
    session2.infer_device("<t2>", 10, sampler=s, seed=7,
                          callback=lambda t: out2.append(t))
    assert out1 == out2


def test_batched_sampler_unit():
    """Per-stream (heterogeneous) device sampling: greedy rows are exact
    argmax, sampled rows stay inside their own top-k set, bias applies per
    stream."""
    import jax

    from llm_tpu.ops.sampling import batched_sampler, device_sample

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(4, 50)), jnp.float32)
    samplers = [
        DeviceSampler.greedy(),
        DeviceSampler(kind="sample", temperature=0.7, top_k=5),
        DeviceSampler(kind="sample", temperature=1.2, top_k=2),
        DeviceSampler(kind="greedy", bias=((7, float("inf")),)),
    ]
    cfg, values = batched_sampler(samplers, 4)
    assert cfg.sample and cfg.top_k_max == 5 and cfg.bias_tokens == (7,)

    for seed in range(5):
        toks = np.asarray(
            device_sample(logits, jax.random.PRNGKey(seed), cfg, values)
        )
        assert toks[0] == int(np.argmax(np.asarray(logits)[0]))
        top5 = set(np.argsort(np.asarray(logits)[1])[-5:])
        top2 = set(np.argsort(np.asarray(logits)[2])[-2:])
        assert int(toks[1]) in top5
        assert int(toks[2]) in top2
        assert toks[3] == 7  # +inf bias wins


def test_engine_step_multi_heterogeneous_samplers(model):
    """Streams with DIFFERENT DeviceSamplers share one multi-step dispatch;
    the greedy stream's text equals the host greedy reference."""
    ref = _host_greedy(model, "<t2><t3>", 8)[0]

    engine = Engine(model, max_streams=2, kv_dtype=jnp.float32)
    texts = engine.generate_all(
        [
            GenerationRequest(
                prompt="<t2><t3>", max_tokens=8,
                device_sampler=DeviceSampler.greedy(),
            ),
            GenerationRequest(
                prompt="<t7>", max_tokens=8,
                device_sampler=DeviceSampler.top_k_temperature(5, 0.9),
            ),
        ],
        n_steps=4,
    )
    assert texts[0] == ref
    assert len(texts[1]) > 0


def _nucleus(row: np.ndarray, p: float) -> set:
    """Sort-based top-p reference: smallest top set with mass >= p (ties at
    the boundary value included, matching the bisection kernel)."""
    probs = np.exp(row - row.max())
    probs /= probs.sum()
    order = np.argsort(probs)[::-1]
    csum = np.cumsum(probs[order])
    n = int(np.searchsorted(csum, p) + 1)
    cutoff = probs[order[n - 1]]
    return set(np.nonzero(probs >= cutoff)[0])


def test_top_p_truncate_matches_sorted_reference():
    """Bisection cutoff == sort-based nucleus across random rows/ps."""
    from llm_tpu.ops.sampling import _top_p_truncate

    rng = np.random.default_rng(1)
    logits = rng.normal(size=(16, 257)).astype(np.float32) * 3
    for p in (0.1, 0.5, 0.9, 0.99):
        out = np.asarray(_top_p_truncate(jnp.asarray(logits), p))
        for b in range(16):
            kept = set(np.nonzero(np.isfinite(out[b]))[0])
            assert kept == _nucleus(logits[b], p), (b, p)


def test_top_p_one_keeps_all():
    from llm_tpu.ops.sampling import _top_p_truncate

    logits = jnp.asarray(np.random.default_rng(2).normal(size=(3, 64)),
                         jnp.float32)
    out = np.asarray(_top_p_truncate(logits, 1.0))
    assert np.isfinite(out).all()


def test_device_sampler_top_p_stays_in_nucleus():
    import jax

    from llm_tpu.ops.sampling import device_sample

    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(50,)), jnp.float32)
    cfg = DeviceSampler(kind="sample", temperature=1.3, top_p=0.6)
    allowed = _nucleus(np.asarray(logits), 0.6)
    assert 1 < len(allowed) < 50  # the test is vacuous otherwise
    seen = set()
    for seed in range(40):
        tok = int(device_sample(logits, jax.random.PRNGKey(seed), cfg))
        assert tok in allowed
        seen.add(tok)
    assert len(seen) > 1  # actually sampling, not collapsed to argmax


def test_batched_sampler_per_stream_top_p():
    import jax

    from llm_tpu.ops.sampling import batched_sampler, device_sample

    rng = np.random.default_rng(4)
    logits = jnp.asarray(rng.normal(size=(3, 80)) * 2, jnp.float32)
    samplers = [
        DeviceSampler.greedy(),
        DeviceSampler(kind="sample", temperature=1.0, top_p=0.3),
        DeviceSampler(kind="sample", temperature=1.0, top_k=7, top_p=0.95),
    ]
    cfg, values = batched_sampler(samplers, 3)
    assert cfg.any_top_p
    row1 = _nucleus(np.asarray(logits)[1], 0.3)
    # top-k then top-p: nucleus computed within the top-7 set
    r2 = np.asarray(logits)[2]
    top7 = np.argsort(r2)[-7:]
    masked = np.full_like(r2, -np.inf)
    masked[top7] = r2[top7]
    row2 = _nucleus(masked, 0.95)
    for seed in range(30):
        toks = np.asarray(
            device_sample(logits, jax.random.PRNGKey(seed), cfg, values)
        )
        assert toks[0] == int(np.argmax(np.asarray(logits)[0]))
        assert int(toks[1]) in row1
        assert int(toks[2]) in row2


def test_engine_step_multi_top_p(model):
    """A top-p request rides the multi-step on-device path end-to-end."""
    engine = Engine(model, max_streams=2, kv_dtype=jnp.float32)
    ref = _host_greedy(model, "<t2><t3>", 8)[0]
    texts = engine.generate_all(
        [
            GenerationRequest(
                prompt="<t2><t3>", max_tokens=8,
                device_sampler=DeviceSampler.greedy(),
            ),
            GenerationRequest(
                prompt="<t7>", max_tokens=8, seed=1,
                device_sampler=DeviceSampler(
                    kind="sample", temperature=0.9, top_p=0.8
                ),
            ),
        ],
        n_steps=4,
    )
    assert texts[0] == ref
    assert len(texts[1]) > 0


def test_min_p_truncate_matches_reference():
    from llm_tpu.ops.sampling import _min_p_truncate

    rng = np.random.default_rng(5)
    logits = rng.normal(size=(8, 101)).astype(np.float32) * 2
    for mp in (0.05, 0.2, 0.5):
        out = np.asarray(_min_p_truncate(jnp.asarray(logits), mp))
        for b in range(8):
            probs = np.exp(logits[b] - logits[b].max())
            probs /= probs.sum()
            expect = set(np.nonzero(probs >= mp * probs.max())[0])
            assert set(np.nonzero(np.isfinite(out[b]))[0]) == expect


def test_batched_sampler_per_stream_min_p():
    import jax

    from llm_tpu.ops.sampling import batched_sampler, device_sample

    rng = np.random.default_rng(6)
    logits = jnp.asarray(rng.normal(size=(2, 60)), jnp.float32)
    samplers = [
        DeviceSampler(kind="sample", temperature=1.0, min_p=0.3),
        DeviceSampler.greedy(),
    ]
    cfg, values = batched_sampler(samplers, 2)
    assert cfg.any_min_p
    row = np.asarray(logits)[0]
    probs = np.exp(row - row.max()); probs /= probs.sum()
    allowed = set(np.nonzero(probs >= 0.3 * probs.max())[0])
    assert 1 < len(allowed) < 60
    for seed in range(25):
        toks = np.asarray(
            device_sample(logits, jax.random.PRNGKey(seed), cfg, values)
        )
        assert int(toks[0]) in allowed
        assert toks[1] == int(np.argmax(np.asarray(logits)[1]))


def _host_chain(model, prompt, n, chain_args):
    from llm_tpu.samplers import build_sampler_chain

    session = InferenceSession(model, _cfg())
    out = []
    session.infer(
        InferenceRequest(
            prompt=prompt,
            parameters=InferenceParameters(
                sampler=build_sampler_chain(
                    chain_args, n_vocab=model.spec.n_vocab
                )
            ),
            maximum_token_count=n,
        ),
        rng=np.random.default_rng(0),
        callback=lambda r: out.append(r.text)
        if r.kind == "inferred_token" else None,
    )
    return "".join(out)


def test_device_repetition_penalty_matches_host(model):
    """Penalized GREEDY decode is deterministic: the device block path
    (windowed counts updated in-loop, including expiry with last_n=4 over
    a 16-token run) must equal the host Repetition+argmax chain
    token-for-token."""
    ref = _host_chain(
        model, "<t2><t3>", 16,
        ["repetition:penalty=1.5:last_n=4", "topk:k=1", "temperature:1.0"],
    )
    session = InferenceSession(model, _cfg())
    out = []
    session.infer_device(
        "<t2><t3>", 16,
        sampler=DeviceSampler(kind="greedy", repeat_penalty=1.5,
                              penalty_last_n=4),
        n_steps=5,  # blocks of 5: state crosses dispatch boundaries too
        callback=lambda t: out.append(t),
    )
    assert "".join(out) == ref


def test_device_freq_presence_matches_host(model):
    # build_sampler_chain CONFIGURES the default chain, so the default
    # repetition penalty (1.3) must be explicitly neutralized to isolate
    # the freq/presence math
    ref = _host_chain(
        model, "<t4><t5>", 12,
        ["repetition:penalty=1.0",
         "freqpresence:frequency=0.7:presence=0.4:last_n=8",
         "topk:k=1", "temperature:1.0"],
    )
    session = InferenceSession(model, _cfg())
    out = []
    session.infer_device(
        "<t4><t5>", 12,
        sampler=DeviceSampler(kind="greedy", frequency_penalty=0.7,
                              presence_penalty=0.4, penalty_last_n=8),
        n_steps=4,
        callback=lambda t: out.append(t),
    )
    assert "".join(out) == ref


def test_engine_step_multi_penalties_match_host(model):
    """Penalized greedy streams ride step_multi batched (heterogeneous
    with a plain greedy stream) and equal their host references."""
    ref_pen = _host_chain(
        model, "<t2><t3>", 10,
        ["repetition:penalty=1.4:last_n=64", "topk:k=1", "temperature:1.0"],
    )
    ref_plain = _host_greedy(model, "<t7>", 10)[0]

    engine = Engine(model, max_streams=2, kv_dtype=jnp.float32)
    texts = engine.generate_all(
        [
            GenerationRequest(
                prompt="<t2><t3>", max_tokens=10,
                device_sampler=DeviceSampler(kind="greedy",
                                             repeat_penalty=1.4),
            ),
            GenerationRequest(
                prompt="<t7>", max_tokens=10,
                device_sampler=DeviceSampler.greedy(),
            ),
        ],
        n_steps=4,
    )
    assert texts[0] == ref_pen
    assert texts[1] == ref_plain


def test_paged_step_multi_penalties_match_dense(model):
    """The paged block path threads the same penalty state."""
    from llm_tpu.paged import PagedEngine

    def run(engine):
        texts = engine.generate_all(
            [
                GenerationRequest(
                    prompt="<t2><t3>", max_tokens=10,
                    device_sampler=DeviceSampler(kind="greedy",
                                                 repeat_penalty=1.4),
                )
            ],
            n_steps=4,
        )
        return texts[min(texts)]

    dense = run(Engine(model, max_streams=1, kv_dtype=jnp.float32))
    paged = run(
        PagedEngine(model, max_streams=1, page_size=8, kv_dtype=jnp.float32)
    )
    assert dense == paged
    ref = _host_chain(
        model, "<t2><t3>", 10,
        ["repetition:penalty=1.4:last_n=64", "topk:k=1", "temperature:1.0"],
    )
    assert dense == ref


def test_penalty_state_unit():
    import jax

    from llm_tpu.ops.sampling import penalty_state, update_penalty_state

    st = penalty_state([[5, 5, 9], []], last_n=3, n_vocab=12)
    c = np.asarray(st["counts"])
    assert c[0, 5] == 2 and c[0, 9] == 1 and c[1].sum() == 0
    # append 7 to both: window [5,5,9] is full so 5 (oldest) expires in row 0
    st = jax.jit(update_penalty_state)(st, jnp.asarray([7, 7], jnp.int32))
    c = np.asarray(st["counts"])
    assert c[0, 5] == 1 and c[0, 9] == 1 and c[0, 7] == 1
    assert c[1, 7] == 1 and c[1].sum() == 1
    # two more appends: 5 then 9 expire in row 0
    st = update_penalty_state(st, jnp.asarray([7, 7], jnp.int32))
    st = update_penalty_state(st, jnp.asarray([7, 7], jnp.int32))
    c = np.asarray(st["counts"])
    assert c[0, 5] == 0 and c[0, 9] == 0 and c[0, 7] == 3
    assert c[1, 7] == 3


def test_step_multi_device_logprobs_match_host(model):
    """logprobs ride the block path: values/top-N equal the host per-token
    recording (same pre-update-row definition) for a greedy stream."""

    def run(use_device):
        engine = Engine(model, max_streams=2, kv_dtype=jnp.float32)
        reqs = [
            GenerationRequest(
                prompt="<t2><t3>", max_tokens=6, logprobs=3,
                sampler=GreedySampler(),
                device_sampler=DeviceSampler.greedy() if use_device else None,
            ),
            GenerationRequest(
                prompt="<t7>", max_tokens=6,
                sampler=GreedySampler(),
                device_sampler=DeviceSampler.greedy() if use_device else None,
            ),
        ]
        ids = [engine.submit(r) for r in reqs]
        while engine.has_work():
            if use_device:
                engine.step_multi(4)
            else:
                engine.step()
        return engine.finished[ids[0]]

    host = run(False)
    dev = run(True)
    assert len(dev.logprob_data) == len(host.logprob_data) == 6
    for h, d in zip(host.logprob_data, dev.logprob_data):
        assert h["token"] == d["token"]
        assert abs(h["logprob"] - d["logprob"]) < 1e-4
        assert set(h["top_logprobs"]) == set(d["top_logprobs"])
        for k in h["top_logprobs"]:
            assert abs(h["top_logprobs"][k] - d["top_logprobs"][k]) < 1e-4


def test_paged_step_multi_device_logprobs(model):
    from llm_tpu.paged import PagedEngine

    engine = PagedEngine(model, max_streams=1, page_size=8,
                         kv_dtype=jnp.float32)
    rid = engine.submit(
        GenerationRequest(
            prompt="<t2><t3>", max_tokens=5, logprobs=2,
            sampler=GreedySampler(),
            device_sampler=DeviceSampler.greedy(),
        )
    )
    while engine.has_work():
        engine.step_multi(4)
    data = engine.finished[rid].logprob_data
    assert len(data) == 5
    for e in data:
        assert e["logprob"] <= 0.0
        assert len(e["top_logprobs"]) == 2
        # the sampled (greedy) token IS the top-1 alternative: present in
        # the top list with a logprob equal to the sampled token's
        assert e["token"] in e["top_logprobs"]
        assert abs(e["top_logprobs"][e["token"]] - e["logprob"]) < 1e-5
        assert abs(max(e["top_logprobs"].values()) - e["logprob"]) < 1e-5


# ---------------------------------------------------------------------------
# round-4: tail-free / locally-typical / top-a truncations + mirostat
# terminals on device (VERDICT r3 item 9)


def _rand_logits(b, v, seed=0):
    return np.random.default_rng(seed).normal(size=(b, v)).astype(np.float32) * 3


def test_tail_free_truncate_matches_host():
    from llm_tpu.ops.sampling import _tail_free_truncate
    from llm_tpu.samplers import TailFree

    logits = _rand_logits(4, 64, seed=3)
    for z in (0.3, 0.8, 0.95):
        out = np.asarray(_tail_free_truncate(jnp.asarray(logits), z))
        for b in range(4):
            want = TailFree(z=z).apply(logits[b].copy(), [], None)
            got_kept = set(np.nonzero(np.isfinite(out[b]))[0])
            want_kept = set(np.nonzero(np.isfinite(want))[0])
            assert got_kept == want_kept, (b, z)
    # z >= 1 keeps everything
    out = np.asarray(_tail_free_truncate(jnp.asarray(logits), 1.0))
    assert np.isfinite(out).all()


def test_typical_truncate_matches_host():
    from llm_tpu.ops.sampling import _typical_truncate
    from llm_tpu.samplers import LocallyTypical

    logits = _rand_logits(4, 64, seed=4)
    for p in (0.2, 0.7, 0.95):
        out = np.asarray(_typical_truncate(jnp.asarray(logits), p))
        for b in range(4):
            want = LocallyTypical(p=p).apply(logits[b].copy(), [], None)
            got_kept = set(np.nonzero(np.isfinite(out[b]))[0])
            want_kept = set(np.nonzero(np.isfinite(want))[0])
            assert got_kept == want_kept, (b, p)


def test_top_a_truncate_matches_host():
    from llm_tpu.ops.sampling import _top_a_truncate
    from llm_tpu.samplers import TopA

    logits = _rand_logits(4, 64, seed=5)
    for a1, a2 in ((0.2, 2.0), (0.05, 1.0), (0.0, 0.0)):
        out = np.asarray(_top_a_truncate(jnp.asarray(logits), a1, a2))
        for b in range(4):
            want = TopA(a1=a1, a2=a2).apply(logits[b].copy(), [], None)
            got_kept = set(np.nonzero(np.isfinite(out[b]))[0])
            want_kept = set(np.nonzero(np.isfinite(want))[0])
            assert got_kept == want_kept, (b, a1, a2)


def _full_probs(row):
    e = np.exp(row - row.max())
    return e / e.sum()


def test_mirostat2_device_matches_host_math():
    """Device mirostat2: sampled token lies in the host's keep set
    (surprise <= mu) and the mu update equals the host arithmetic for the
    token actually sampled."""
    import jax

    from llm_tpu.ops.sampling import _mirostat_sample

    logits = jnp.asarray(_rand_logits(3, 64, seed=6))
    mu0 = jnp.asarray([10.0, 3.0, 0.05], jnp.float32)
    tau, eta = 5.0, 0.1
    tok, mu1 = _mirostat_sample(
        logits, jax.random.PRNGKey(1), mu0, tau, eta, kind=2, m=100
    )
    tok, mu1 = np.asarray(tok), np.asarray(mu1)
    for b in range(3):
        row = np.asarray(logits[b])
        probs = _full_probs(row)
        surp = -np.log2(probs)
        keep = set(np.nonzero(surp <= float(mu0[b]))[0])
        if not keep:
            keep = {int(np.argmax(probs))}
        assert int(tok[b]) in keep, b
        want_mu = float(mu0[b]) - eta * (surp[tok[b]] - tau)
        np.testing.assert_allclose(mu1[b], want_mu, rtol=1e-5)


def test_mirostat1_device_matches_host_math():
    """Device mirostat1: the truncation k and mu update replicate the host
    Zipf-estimate formula (samplers.py Mirostat1)."""
    import math

    import jax

    from llm_tpu.ops.sampling import _mirostat_sample

    V, m = 64, 20
    logits = jnp.asarray(_rand_logits(2, V, seed=7))
    mu0 = jnp.asarray([10.0, 4.0], jnp.float32)
    tau, eta = 5.0, 0.1
    tok, mu1 = _mirostat_sample(
        logits, jax.random.PRNGKey(2), mu0, tau, eta, kind=1, m=m
    )
    tok, mu1 = np.asarray(tok), np.asarray(mu1)
    for b in range(2):
        row = np.asarray(logits[b])
        order = np.argsort(-row, kind="stable")
        probs = _full_probs(row)[order]
        mm = min(m, V - 1)
        num = den = 0.0
        for i in range(mm - 1):
            t_i = math.log((i + 2) / (i + 1))
            b_i = math.log(probs[i] / probs[i + 1]) if probs[i + 1] > 0 else 0.0
            num += t_i * b_i
            den += t_i * t_i
        s_hat = num / den
        eps = s_hat - 1.0
        k = ((eps * (2.0 ** float(mu0[b]))) / (1.0 - float(V) ** (-eps))) ** (
            1.0 / s_hat
        )
        k = int(max(1, min(round(k), V)))
        assert int(tok[b]) in set(order[:k].tolist()), (b, k)
        surp = -np.log2(_full_probs(row)[tok[b]])
        np.testing.assert_allclose(
            mu1[b], float(mu0[b]) - eta * (surp - tau), rtol=1e-4
        )


def test_engine_step_multi_mirostat(model):
    """Mirostat streams ride the step_multi block path: tokens are
    produced, mu persists on the stream across blocks, and a greedy
    batchmate still matches the pure-greedy reference."""
    from llm_tpu.ops.sampling import mirostat_mu_init

    ref, _ = _host_greedy(model, "<t2><t3>", 8)

    engine = Engine(model, max_streams=2, kv_dtype=jnp.float32)
    g = engine.submit(GenerationRequest(
        prompt="<t2><t3>", max_tokens=8,
        device_sampler=DeviceSampler.greedy(),
    ))
    ms = DeviceSampler(kind="sample", temperature=0.9, mirostat=2,
                       mirostat_tau=4.0)
    mrid = engine.submit(GenerationRequest(
        prompt="<t5><t6>", max_tokens=12, device_sampler=ms,
    ))
    mus = []
    while engine.has_work():
        engine.step_multi(n_steps=4)
        for s in engine.slots:
            if s is not None and s.request.device_sampler.mirostat:
                mus.append(s.mirostat_mu)
    texts = {rid: "".join(s.text) for rid, s in engine.finished.items()}
    assert texts[g] == ref
    assert len(texts[mrid]) > 0
    assert mus and any(m != mirostat_mu_init(ms) for m in mus), mus


def test_infer_device_mirostat_runs(model):
    session = InferenceSession(model, _cfg())
    out = []
    session.infer_device(
        "<t2><t3>", 10,
        sampler=DeviceSampler(kind="sample", temperature=0.9, mirostat=2),
        n_steps=4, callback=out.append,
    )
    assert session._mirostat_mu is not None
    assert session._mirostat_mu != 2.0 * 5.0  # mu moved
    assert session.n_past > 2


def test_engine_step_multi_tail_free_typical(model):
    """tail-free / typical / top-a streams ride step_multi (stateless
    truncations; heterogeneous batch shares one compiled block)."""
    engine = Engine(model, max_streams=3, kv_dtype=jnp.float32)
    rids = [
        engine.submit(GenerationRequest(
            prompt="<t2><t3>", max_tokens=6,
            device_sampler=DeviceSampler(kind="sample", temperature=0.8,
                                         tail_free_z=0.9),
        )),
        engine.submit(GenerationRequest(
            prompt="<t4><t5>", max_tokens=6,
            device_sampler=DeviceSampler(kind="sample", temperature=0.8,
                                         typical_p=0.8),
        )),
        engine.submit(GenerationRequest(
            prompt="<t6><t7>", max_tokens=6,
            device_sampler=DeviceSampler(kind="sample", temperature=0.8,
                                         top_a=(0.1, 1.5)),
        )),
    ]
    while engine.has_work():
        engine.step_multi(n_steps=3)
    for rid in rids:
        assert len("".join(engine.finished[rid].text)) > 0


def test_mirostat_incompatible_with_truncations():
    with pytest.raises(ValueError):
        DeviceSampler(kind="sample", mirostat=2, top_k=40)
    with pytest.raises(ValueError):
        DeviceSampler(kind="sample", mirostat=1, tail_free_z=0.9)


def test_mixed_mirostat_kinds_fall_back_not_wedge(model):
    """A batch mixing mirostat-1 and mirostat-2 streams cannot share one
    decode block; step_multi must fall back to per-token host sampling
    for that step instead of raising out of the engine loop forever
    (round-4 review finding)."""
    from llm_tpu.samplers import GreedySampler

    engine = Engine(model, max_streams=2, kv_dtype=jnp.float32)
    ids = [
        engine.submit(GenerationRequest(
            prompt=[2, 3], max_tokens=5, sampler=GreedySampler(),
            device_sampler=DeviceSampler(kind="sample", temperature=0.9,
                                         mirostat=1),
        )),
        engine.submit(GenerationRequest(
            prompt=[5, 6], max_tokens=5, sampler=GreedySampler(),
            device_sampler=DeviceSampler(kind="sample", temperature=0.9,
                                         mirostat=2),
        )),
    ]
    for _ in range(40):
        if not engine.has_work():
            break
        engine.step_multi(4)  # must not raise
    assert not engine.has_work()
    for rid in ids:
        assert len("".join(engine.finished[rid].text)) > 0


def test_store_mu_trajectory_truncation():
    """store_mu with a per-step trajectory persists the mu AT each
    stream's truncation point, not the block-final value (overshoot
    surprises must not pollute the carry)."""
    from types import SimpleNamespace

    from llm_tpu.ops.sampling import store_mu

    def stream():
        return SimpleNamespace(
            request=SimpleNamespace(
                device_sampler=DeviceSampler(kind="sample", mirostat=2)
            ),
            mirostat_mu=None,
        )

    a, b = stream(), stream()
    traj = np.array([[10.0, 9.0], [8.0, 7.0], [6.0, 5.0]], np.float32)
    store_mu([(0, a), (1, b)], traj, {0: 2, 1: 3})
    assert a.mirostat_mu == 8.0  # truncated after step 2
    assert b.mirostat_mu == 5.0  # kept the whole block
    # final-row fallback (no keeps given) and 1-D compatibility
    store_mu([(0, a)], traj)
    assert a.mirostat_mu == 6.0
    store_mu([(1, b)], np.array([1.5, 2.5], np.float32))
    assert b.mirostat_mu == 2.5


def test_mirostat1_per_stream_m_matches_static():
    """Per-stream mirostat_m via m_vals: rows whose m equals the static
    config must sample and update mu IDENTICALLY to the m_vals=None path
    (the mask reduces to the full estimate)."""
    import jax

    from llm_tpu.ops.sampling import _mirostat_sample

    V, m = 64, 20
    logits = jnp.asarray(_rand_logits(2, V, seed=11))
    mu0 = jnp.asarray([9.0, 5.0], jnp.float32)
    key = jax.random.PRNGKey(3)
    tok_a, mu_a = _mirostat_sample(logits, key, mu0, 5.0, 0.1, kind=1, m=m)
    tok_b, mu_b = _mirostat_sample(
        logits, key, mu0, 5.0, 0.1, kind=1, m=m,
        m_vals=jnp.asarray([m, m], jnp.int32),
    )
    assert np.array_equal(np.asarray(tok_a), np.asarray(tok_b))
    np.testing.assert_allclose(np.asarray(mu_a), np.asarray(mu_b))
    # differing per-stream m changes the estimate (and hence k) for that
    # row only — it must not crash or produce NaN
    tok_c, mu_c = _mirostat_sample(
        logits, key, mu0, 5.0, 0.1, kind=1, m=m,
        m_vals=jnp.asarray([m, 5], jnp.int32),
    )
    assert np.isfinite(np.asarray(mu_c)).all()
    assert np.array_equal(np.asarray(tok_c)[:1], np.asarray(tok_a)[:1])


def test_mirostat1_m1_no_nan():
    """m=1 (or V=2) leaves no Zipf-estimate terms: den=0 must take the
    host's s_hat=1 guard (keep full vocab), never NaN."""
    import jax

    from llm_tpu.ops.sampling import _mirostat_sample

    logits = jnp.asarray(_rand_logits(1, 16, seed=5))
    tok, mu1 = _mirostat_sample(
        logits, jax.random.PRNGKey(0), jnp.asarray([8.0], jnp.float32),
        5.0, 0.1, kind=1, m=1,
    )
    assert np.isfinite(np.asarray(mu1)).all()
    assert 0 <= int(np.asarray(tok)[0]) < 16


def test_host_fallback_syncs_mirostat_mu(model):
    """A mirostat stream sampled through the per-token HOST path (engine
    fallbacks) must read and write the same mu carry the device blocks
    use (stream.mirostat_mu), not a private chain-internal mu."""
    from llm_tpu.samplers import Mirostat2, SamplerChain

    engine = Engine(model, max_streams=1, kv_dtype=jnp.float32)
    chain = SamplerChain([], Mirostat2(tau=4.0, eta=0.5))
    rid = engine.submit(GenerationRequest(
        prompt="<t2><t3>", max_tokens=4, sampler=chain,
        device_sampler=DeviceSampler(kind="sample", temperature=0.9,
                                     mirostat=2, mirostat_tau=4.0,
                                     mirostat_eta=0.5),
    ))
    # per-token host path (engine.step, not step_multi)
    while engine.has_work():
        engine.step()
    s = engine.finished[rid]
    assert s.mirostat_mu is not None  # host updates flowed into the carry
    assert s.mirostat_mu != 2.0 * 4.0  # and mu moved from its init
    assert chain.terminal.mu == s.mirostat_mu  # both views agree


def test_penalty_state_unbounded_floor_shapes_agree():
    """Unbounded penalty windows (last_n <= 0 / the 1<<30 sentinel) must
    size the ring from the allgathered floor, not each caller's local
    longest history — multihost SPMD needs identical state shapes on
    every host (advisor r4)."""
    from llm_tpu.ops.sampling import penalty_state

    host_a = penalty_state([[1] * 100], 0, 32, unbounded_floor=1200)
    host_b = penalty_state([[1] * 1200], 0, 32, unbounded_floor=1200)
    assert host_a["ring"].shape == host_b["ring"].shape
    # sentinel form agrees with the <=0 form
    host_c = penalty_state([[1] * 100], 1 << 30, 32, unbounded_floor=1200)
    assert host_c["ring"].shape == host_a["ring"].shape
    # single-host behavior (no floor) unchanged: sized from local longest
    local = penalty_state([[1] * 100], 0, 32)
    assert local["ring"].shape[1] >= 100
    assert local["ring"].shape[1] < host_a["ring"].shape[1]
