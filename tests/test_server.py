"""HTTP serving front-end: OpenAI-style completions over the
continuous-batching engine (llm_tpu/server.py). Greedy requests must
reproduce the single-stream session's output byte-for-byte through the
whole HTTP round-trip, streamed or not."""

import json
import threading
import urllib.request

import jax.numpy as jnp
import pytest

from llm_tpu.loader import ModelParameters, load
from llm_tpu.samplers import DeterministicSampler
from llm_tpu.serve import Engine, GenerationRequest
from llm_tpu.server import LlmServer, _StopScanner, sampler_from_params
from llm_tpu.testing import make_tiny_file


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("httpsrv") / "llama.bin"
    make_tiny_file("llama", path)
    return load(path, "llama", params=ModelParameters(context_size=64))


@pytest.fixture(scope="module")
def server(model):
    engine = Engine(model, max_streams=2, kv_dtype=jnp.float32, n_batch=8)
    srv = LlmServer(model, engine, host="127.0.0.1", port=0)
    srv.start()
    yield srv
    srv.httpd.shutdown()
    srv.loop.shutdown()
    srv.loop.join(timeout=60)


def _url(server, path):
    host, port = server.address
    return f"http://{host}:{port}{path}"


def _post(server, body, path="/v1/completions"):
    req = urllib.request.Request(
        _url(server, path), data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        return resp.status, json.loads(resp.read())


def _engine_reference(model, prompt, max_tokens):
    """Direct-engine run with the server's temperature=0 mapping (pure
    argmax; NOT DeterministicSampler, whose llm-test semantics bias out
    previously seen tokens)."""
    engine = Engine(model, max_streams=1, kv_dtype=jnp.float32, n_batch=8)
    rid = engine.submit(GenerationRequest(
        prompt=prompt, max_tokens=max_tokens,
        sampler=sampler_from_params({"temperature": 0},
                                    n_vocab=model.spec.n_vocab),
    ))
    while engine.has_work():
        engine.step()
    return "".join(engine.finished[rid].text)


def test_health_and_models(server):
    with urllib.request.urlopen(_url(server, "/health"), timeout=30) as r:
        assert json.loads(r.read())["status"] == "ok"
    with urllib.request.urlopen(_url(server, "/v1/models"), timeout=30) as r:
        data = json.loads(r.read())
    assert data["data"][0]["object"] == "model"


def test_completion_greedy_matches_engine(server, model):
    # temperature=0 -> topk:k=1, which equals DeterministicSampler's argmax
    ref = _engine_reference(model, "<t5><t7>", 8)
    status, body = _post(server, {
        "prompt": "<t5><t7>", "max_tokens": 8, "temperature": 0,
    })
    assert status == 200
    choice = body["choices"][0]
    assert choice["text"] == ref
    assert choice["finish_reason"] in ("length", "stop")


def test_completion_streaming_sse(server, model):
    ref = _engine_reference(model, "<t5><t7>", 8)
    req = urllib.request.Request(
        _url(server, "/v1/completions"),
        data=json.dumps({"prompt": "<t5><t7>", "max_tokens": 8,
                         "temperature": 0, "stream": True}).encode(),
        headers={"Content-Type": "application/json"},
    )
    parts, finish = [], None
    with urllib.request.urlopen(req, timeout=120) as resp:
        assert resp.headers["Content-Type"].startswith("text/event-stream")
        for raw in resp:
            line = raw.decode().strip()
            if not line.startswith("data: "):
                continue
            payload = line[len("data: "):]
            if payload == "[DONE]":
                break
            chunk = json.loads(payload)
            c = chunk["choices"][0]
            parts.append(c["text"])
            if c["finish_reason"]:
                finish = c["finish_reason"]
    assert "".join(parts) == ref
    assert finish in ("length", "stop")


def test_concurrent_requests_batch(server, model):
    """Two concurrent requests share the 2-slot engine and both match."""
    prompts = ["<t5><t7>", "<t9><t4><t5>"]
    refs = [_engine_reference(model, p, 6) for p in prompts]
    out = [None, None]

    def go(i):
        _, body = _post(server, {"prompt": prompts[i], "max_tokens": 6,
                                 "temperature": 0})
        out[i] = body["choices"][0]["text"]

    threads = [threading.Thread(target=go, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert out == refs


def test_stop_sequence(server, model):
    ref = _engine_reference(model, "<t5><t7>", 8)
    stop = ref[2:6]  # a substring the greedy output certainly contains
    status, body = _post(server, {
        "prompt": "<t5><t7>", "max_tokens": 8, "temperature": 0,
        "stop": [stop],
    })
    assert status == 200
    choice = body["choices"][0]
    assert choice["finish_reason"] == "stop"
    assert choice["text"] == ref[:2]
    assert stop not in choice["text"]


def test_bad_json_and_unknown_sampler(server):
    req = urllib.request.Request(
        _url(server, "/v1/completions"), data=b"{nope",
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, {"prompt": "<t5>", "sampler": "bogus:k=1"})
    assert e.value.code == 400


def test_stop_scanner_split_across_fragments():
    s = _StopScanner(["STOP"])
    assert s.push("abcST") == "abc"  # "ST" held back
    assert s.push("OPxyz") == ""  # match -> excised
    assert s.hit


def test_stop_scanner_false_prefix_releases():
    s = _StopScanner(["STOP"])
    assert s.push("xST") == "x"
    assert s.push("Qy") == "STQy"  # prefix disambiguated, released
    assert not s.hit
    assert s.flush() == ""


def test_server_paged_engine(model):
    """The HTTP layer is engine-agnostic: paged pool underneath."""
    from llm_tpu.paged import PagedEngine

    engine = PagedEngine(model, max_streams=2, page_size=16,
                         kv_dtype=jnp.float32, n_batch=8)
    srv = LlmServer(model, engine, host="127.0.0.1", port=0)
    srv.start()
    try:
        ref = _engine_reference(model, "<t5><t7>", 6)
        _, body = _post(srv, {"prompt": "<t5><t7>", "max_tokens": 6,
                              "temperature": 0})
        assert body["choices"][0]["text"] == ref
    finally:
        srv.httpd.shutdown()
        srv.loop.shutdown()
        srv.loop.join(timeout=60)


def test_server_multi_step_device_sampling(model):
    """multi_step servers decode blocks on device when requests map to
    DeviceSamplers (greedy here) — output must equal the host path."""
    engine = Engine(model, max_streams=2, kv_dtype=jnp.float32, n_batch=8)
    srv = LlmServer(model, engine, host="127.0.0.1", port=0, multi_step=4)
    srv.start()
    try:
        ref = _engine_reference(model, "<t5><t7>", 6)
        _, body = _post(srv, {"prompt": "<t5><t7>", "max_tokens": 6,
                              "temperature": 0})
        assert body["choices"][0]["text"] == ref
    finally:
        srv.httpd.shutdown()
        srv.loop.shutdown()
        srv.loop.join(timeout=60)


# vicuna-style role prefixes rendered with the tiny synthetic vocab's
# tokens (the default "### Human: " prefixes aren't tokenizable by it)
TINY_TEMPLATE = {
    "system": "{content}",
    "user": "<t11>{content}",
    "assistant": "<t12>{content}",
    "generation_prefix": "<t12>",
    "stop": "<t11>",
}


def test_chat_completions(server, model):
    """Chat endpoint: messages render through the role template; the user
    prefix is an implicit stop sequence."""
    from llm_tpu.server import render_chat

    messages = [{"role": "system", "content": "<t3>"},
                {"role": "user", "content": "<t5><t7>"}]
    prompt, stop = render_chat(messages, TINY_TEMPLATE)
    assert prompt == "<t3><t11><t5><t7><t12>" and stop == "<t11>"
    assert render_chat(messages)[1] == "### Human:"  # default template
    ref = _engine_reference(model, prompt, 6)
    status, body = _post(server, {
        "messages": messages, "max_tokens": 6, "temperature": 0,
        "chat_template": TINY_TEMPLATE,
    }, path="/v1/chat/completions")
    assert status == 200
    choice = body["choices"][0]
    assert body["object"] == "chat.completion"
    assert choice["message"]["role"] == "assistant"
    assert choice["message"]["content"] == ref.rstrip()


def test_chat_completions_stream_delta(server):
    req = urllib.request.Request(
        _url(server, "/v1/chat/completions"),
        data=json.dumps({
            "messages": [{"role": "user", "content": "<t5>"}],
            "max_tokens": 4, "temperature": 0, "stream": True,
            "chat_template": TINY_TEMPLATE,
        }).encode(),
        headers={"Content-Type": "application/json"},
    )
    deltas, finish = [], None
    with urllib.request.urlopen(req, timeout=120) as resp:
        for raw in resp:
            line = raw.decode().strip()
            if not line.startswith("data: "):
                continue
            payload = line[len("data: "):]
            if payload == "[DONE]":
                break
            chunk = json.loads(payload)
            assert chunk["object"] == "chat.completion.chunk"
            c = chunk["choices"][0]
            deltas.append(c["delta"].get("content", ""))
            if c["finish_reason"]:
                finish = c["finish_reason"]
    assert "".join(deltas)
    assert finish in ("length", "stop")


def test_untokenizable_prompt_fails_cleanly(server):
    """A prompt the embedded tokenizer can't encode must retire with an
    error reason — not kill the engine thread and hang every client."""
    status, body = _post(server, {"prompt": "not in vocab!",
                                  "max_tokens": 4, "temperature": 0})
    assert status == 200
    assert body["choices"][0]["finish_reason"].startswith("error")
    # the engine thread survived: a normal request still works
    _, body = _post(server, {"prompt": "<t5>", "max_tokens": 2,
                             "temperature": 0})
    assert body["choices"][0]["text"]


def test_server_multihost_engine_single_process(model):
    """LlmServer auto-selects the collective per-host loop for a
    MultiHostEngine (single process, 2x4 virtual mesh) and reaches the
    consensus-stop exit."""
    from llm_tpu.parallel.multihost import MultiHostEngine
    from llm_tpu.parallel.sharding import MeshConfig, make_mesh

    mesh = make_mesh(MeshConfig(data=2, model=4))
    engine = MultiHostEngine(model, mesh, global_streams=2,
                             kv_dtype=jnp.float32, n_batch=8)
    srv = LlmServer(model, engine, host="127.0.0.1", port=0)
    assert type(srv.loop).__name__ == "_MultiHostEngineLoop"
    srv.start()
    try:
        ref = _engine_reference(model, "<t5><t7>", 6)
        _, body = _post(srv, {"prompt": "<t5><t7>", "max_tokens": 6,
                              "temperature": 0})
        assert body["choices"][0]["text"] == ref
    finally:
        srv.loop.shutdown()
        srv.loop.join(timeout=60)
        assert not srv.loop.is_alive()
        srv.httpd.shutdown()


def test_completion_logprobs(server, model):
    """logprobs=N: model logprob of each sampled token + top-N; greedy
    sampling means the chosen token is the top-1 alternative."""
    import math

    status, body = _post(server, {
        "prompt": "<t5><t7>", "max_tokens": 4, "temperature": 0,
        "logprobs": 3,
    })
    assert status == 200
    choice = body["choices"][0]
    lp = choice["logprobs"]
    assert len(lp["tokens"]) == 4 and len(lp["token_logprobs"]) == 4
    for tok, logprob, top in zip(lp["tokens"], lp["token_logprobs"],
                                 lp["top_logprobs"]):
        assert logprob <= 0.0 and math.isfinite(logprob)
        assert len(top) == 3
        # greedy: the sampled token is the argmax -> the best alternative
        assert max(top, key=top.get) == tok
        assert abs(top[tok] - logprob) < 1e-5


def test_metrics_endpoint(model):
    """Fresh server: warmup compiles but doesn't count; one request does."""
    engine = Engine(model, max_streams=2, kv_dtype=jnp.float32, n_batch=8)
    srv = LlmServer(model, engine, host="127.0.0.1", port=0)
    srv.start()
    try:
        srv.warmup()
        with urllib.request.urlopen(_url(srv, "/metrics"), timeout=30) as r:
            m0 = json.loads(r.read())
        assert m0["requests_completed"] == 0
        _post(srv, {"prompt": "<t5>", "max_tokens": 3, "temperature": 0})
        with urllib.request.urlopen(_url(srv, "/metrics"), timeout=30) as r:
            m1 = json.loads(r.read())
        assert m1["requests_completed"] == 1
        assert m1["tokens_generated"] >= 3
        assert m1["ttft_ms_p50"] is not None
    finally:
        srv.httpd.shutdown()
        srv.loop.shutdown()
        srv.loop.join(timeout=60)


def test_embeddings_endpoint(server, model):
    """/v1/embeddings: final-token hidden state, equal to the library
    extraction path (examples/embeddings.py)."""
    import numpy as np

    from llm_tpu.session import (
        InferenceSession, InferenceSessionConfig, OutputRequest,
    )

    status, body = _post(server, {"input": ["<t5><t7>", "<t9>"]},
                         path="/v1/embeddings")
    assert status == 200
    assert len(body["data"]) == 2
    vec = np.asarray(body["data"][0]["embedding"], np.float32)
    assert vec.shape == (model.spec.n_embd,)

    session = InferenceSession(model, InferenceSessionConfig())
    req = OutputRequest(embeddings=[])
    session.feed_prompt("<t5><t7>", output_request=req)
    ref = np.asarray(req.embeddings, np.float32).reshape(
        -1, model.spec.n_embd
    )[-1]
    np.testing.assert_allclose(vec, ref, rtol=2e-5, atol=2e-5)

    # untokenizable input -> 400, engine unaffected
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, {"input": "zzz"}, path="/v1/embeddings")
    assert e.value.code == 400


def test_client_disconnect_cancels_stream(model):
    """Closing the socket mid-stream frees the slot (Engine.cancel via
    GeneratorExit) instead of decoding into a dead connection."""
    import socket
    import time as _time

    engine = Engine(model, max_streams=1, kv_dtype=jnp.float32, n_batch=8)
    srv = LlmServer(model, engine, host="127.0.0.1", port=0)
    srv.start()
    try:
        host, port = srv.address
        body = json.dumps({"prompt": "<t5>", "max_tokens": 10_000,
                           "temperature": 0, "stream": True}).encode()
        s = socket.create_connection((host, port), timeout=30)
        s.sendall(
            b"POST /v1/completions HTTP/1.1\r\nHost: x\r\n"
            b"Content-Type: application/json\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
            + body
        )
        s.recv(1024)  # first bytes arrived -> stream is live
        s.close()  # client disconnects

        deadline = _time.monotonic() + 60
        while _time.monotonic() < deadline:
            if engine.finished and any(
                st.finish_reason == "cancelled"
                for st in engine.finished.values()
            ):
                break
            _time.sleep(0.2)
        else:
            raise AssertionError("stream was not cancelled on disconnect")
        assert engine.active == 0
    finally:
        srv.httpd.shutdown()
        srv.loop.shutdown()
        srv.loop.join(timeout=60)


def test_server_speculative_engine(model, tmp_path):
    """HTTP over SpeculativeEngine: greedy requests match the plain
    engine; a sampled request fails per-request (engine survives)."""
    from llm_tpu.loader import ModelParameters, load
    from llm_tpu.speculative import SpeculativeEngine
    from llm_tpu.testing import make_tiny_file

    dpath = tmp_path / "draft.bin"
    make_tiny_file("llama", dpath, seed=9, n_layer=1)
    draft = load(dpath, "llama", params=ModelParameters(context_size=64))

    engine = SpeculativeEngine(model, draft, k=3, max_streams=2,
                               kv_dtype=jnp.float32, n_batch=8)
    srv = LlmServer(model, engine, host="127.0.0.1", port=0)
    srv.start()
    try:
        srv.warmup()
        ref = _engine_reference(model, "<t5><t7>", 8)
        _, body = _post(srv, {"prompt": "<t5><t7>", "max_tokens": 8,
                              "temperature": 0})
        assert body["choices"][0]["text"] == ref
        assert engine.drafted > 0
        # a sampled request is refused per-request, not loop-fatally
        _, body = _post(srv, {"prompt": "<t5>", "max_tokens": 2,
                              "temperature": 0.8, "top_p": 0.9})
        assert body["choices"][0]["finish_reason"].startswith("error")
        _, body = _post(srv, {"prompt": "<t5>", "max_tokens": 2,
                              "temperature": 0})
        assert body["choices"][0]["text"]
    finally:
        srv.httpd.shutdown()
        srv.loop.shutdown()
        srv.loop.join(timeout=60)


def test_cli_serve_multihost_single_process(tmp_path):
    """`cli serve --multihost` wiring: a single-process 'cluster' (its own
    coordinator) builds the global mesh, warms up, serves one request."""
    import os
    import socket
    import subprocess
    import sys
    import time as _time

    from llm_tpu.testing import make_tiny_file

    mpath = tmp_path / "llama.bin"
    make_tiny_file("llama", mpath)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        coord = s.getsockname()[1]
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        http_port = s.getsockname()[1]

    env = dict(os.environ, LLM_TPU_PLATFORM="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4",
               PYTHONPATH="/root/repo")
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.Popen(
        [sys.executable, "-m", "llm_tpu.cli", "serve",
         "-m", str(mpath), "-a", "llama",
         "--multihost", "--coordinator", f"127.0.0.1:{coord}",
         "--num-processes", "1", "--process-id", "0",
         "--port", str(http_port), "--max-streams", "2"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
    )
    try:
        deadline = _time.monotonic() + 120
        body = None
        while _time.monotonic() < deadline:
            if proc.poll() is not None:
                raise AssertionError(
                    proc.stderr.read().decode()[-2000:]
                )
            try:
                req = urllib.request.Request(
                    f"http://127.0.0.1:{http_port}/v1/completions",
                    data=json.dumps({"prompt": "<t5>", "max_tokens": 3,
                                     "temperature": 0}).encode(),
                    headers={"Content-Type": "application/json"},
                )
                with urllib.request.urlopen(req, timeout=60) as r:
                    body = json.loads(r.read())
                break
            except (urllib.error.URLError, ConnectionError):
                _time.sleep(1.0)
        assert body is not None, "server never came up"
        assert body["choices"][0]["text"]
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=15)
        except subprocess.TimeoutExpired:
            proc.kill()  # distributed runtime can swallow SIGTERM
            proc.wait(timeout=15)


def test_sampler_from_params_paths(model):
    n = model.spec.n_vocab
    greedy = sampler_from_params({"temperature": 0}, n_vocab=n)
    chain = sampler_from_params(
        {"temperature": 0.7, "top_k": 12, "top_p": 0.9,
         "repeat_penalty": 1.2}, n_vocab=n,
    )
    default = sampler_from_params({}, n_vocab=n)
    dsl = sampler_from_params({"sampler": "topk:k=3"}, n_vocab=n)
    for s in (greedy, chain, default, dsl):
        assert s is not None


def test_logit_bias_bans_and_forces(server, model):
    """OpenAI logit_bias: +100-ish bias forces a token; -100 bans it."""
    tid = model.tokenizer.id(b"<t9>")
    status, data = _post(server, {
        "prompt": "<t5><t7>", "max_tokens": 4, "temperature": 0,
        "logit_bias": {str(tid): 1000},
    })
    assert status == 200
    assert data["choices"][0]["text"] == "<t9>" * 4

    ref = _engine_reference(model, "<t5><t7>", 1)
    banned = model.tokenizer.id(ref.encode())
    status, data = _post(server, {
        "prompt": "<t5><t7>", "max_tokens": 1, "temperature": 0,
        "logit_bias": {str(banned): -100},
    })
    assert status == 200
    assert data["choices"][0]["text"] != ref


def test_logit_bias_device_path(model):
    """logit_bias rides the multi-step device path (DeviceSampler bias)."""
    engine = Engine(model, max_streams=2, kv_dtype=jnp.float32, n_batch=8)
    srv = LlmServer(model, engine, host="127.0.0.1", port=0, multi_step=4)
    srv.start()
    try:
        tid = model.tokenizer.id(b"<t9>")
        status, data = _post(srv, {
            "prompt": "<t5><t7>", "max_tokens": 4, "temperature": 0,
            "logit_bias": {str(tid): 1000},
        })
        assert status == 200
        assert data["choices"][0]["text"] == "<t9>" * 4
    finally:
        srv.httpd.shutdown()
        srv.loop.shutdown()
        srv.loop.join(timeout=60)


def test_chat_template_jinja_render():
    from llm_tpu.server import render_chat

    jinja = (
        "{% for m in messages %}<|{{ m.role }}|>{{ m.content }}<|end|>"
        "{% endfor %}{% if add_generation_prompt %}<|assistant|>{% endif %}"
    )
    prompt, stop = render_chat(
        [{"role": "system", "content": "be brief"},
         {"role": "user", "content": "hi"}],
        None, jinja,
    )
    assert prompt == "<|system|>be brief<|end|><|user|>hi<|end|><|assistant|>"
    assert stop == ""
    # a per-request dict template takes precedence over the jinja one
    prompt2, _ = render_chat(
        [{"role": "user", "content": "hi"}],
        {"user": "U:{content}\n", "generation_prefix": "A:", "stop": "U:"},
        jinja,
    )
    assert prompt2 == "U:hi\nA:"
    # raise_exception surfaces as ValueError (handler maps it to HTTP 400)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="nope"):
        render_chat([{"role": "user", "content": "x"}], None,
                    "{{ raise_exception('nope') }}")


def test_gguf_chat_template_loads(tmp_path):
    """A GGUF checkpoint's tokenizer.chat_template lands on the Model and
    drives the chat endpoint."""
    from llm_tpu.ggml.gguf import convert_ggml_to_gguf

    src = tmp_path / "m.bin"
    make_tiny_file("llama", src)
    dst = tmp_path / "m.gguf"
    convert_ggml_to_gguf(src, dst, "llama")
    # splice the template key in by rewriting through the reader/writer is
    # heavy; instead load + set as the loader would, then drive the server
    m = load(dst, "llama", params=ModelParameters(context_size=64))
    assert m.chat_template is None  # converter doesn't invent one
    # template text must stay within the tiny synthetic vocabulary
    m.chat_template = (
        "{% for m in messages %}<t2>{{ m.content }}"
        "{% endfor %}{% if add_generation_prompt %}<t3>{% endif %}"
    )
    engine = Engine(m, max_streams=1, kv_dtype=jnp.float32, n_batch=8)
    srv = LlmServer(m, engine, host="127.0.0.1", port=0)
    srv.start()
    try:
        status, data = _post(srv, {
            "messages": [{"role": "user", "content": "<t5>"}],
            "max_tokens": 2, "temperature": 0,
        }, path="/v1/chat/completions")
        assert status == 200
        assert data["choices"][0]["message"]["content"]
    finally:
        srv.httpd.shutdown()
        srv.loop.shutdown()
        srv.loop.join(timeout=60)


def test_engine_snapshot_lifecycle(model, tmp_path):
    """serve --engine-snapshot: live /admin/checkpoint, final checkpoint
    on loop shutdown, restore at startup with headless completion of the
    in-flight streams."""
    import os

    path = str(tmp_path / "serve.ckpt")

    engine = Engine(model, max_streams=2, kv_dtype=jnp.float32, n_batch=8)
    srv = LlmServer(model, engine, host="127.0.0.1", port=0,
                    engine_snapshot=path)
    srv.start()
    try:
        status, body = _post(srv, {
            "prompt": "<t5><t7>", "max_tokens": 6, "temperature": 0,
        })
        assert status == 200
        # zero-downtime checkpoint from a handler thread
        status, body = _post(srv, {}, path="/admin/checkpoint")
        assert status == 200 and body["status"] == "ok"
        assert os.path.exists(path)
        os.remove(path)
    finally:
        srv.httpd.shutdown()
        srv.loop.shutdown()
        srv.loop.join(timeout=120)
    # the loop wrote a final checkpoint on shutdown
    assert os.path.exists(path)

    # seed a checkpoint with work in flight, then start a server on it:
    # the restored streams complete headless (their clients are gone)
    from llm_tpu.engine_snapshot import write_engine

    eng2 = Engine(model, max_streams=2, kv_dtype=jnp.float32, n_batch=8)
    rid = eng2.submit(GenerationRequest(prompt="<t2><t3>", max_tokens=6,
                                        sampler=DeterministicSampler()))
    eng2.step()
    write_engine(eng2, path)
    while eng2.has_work():
        eng2.step()
    expect = "".join(eng2.finished[rid].text)

    eng3 = Engine(model, max_streams=2, kv_dtype=jnp.float32, n_batch=8)
    srv2 = LlmServer(model, eng3, host="127.0.0.1", port=0,
                     engine_snapshot=path)
    assert eng3.active == 1  # restored before the loop starts
    srv2.start()
    try:
        for _ in range(200):
            if rid in eng3.finished:
                break
            import time

            time.sleep(0.05)
        assert "".join(eng3.finished[rid].text) == expect
        # and the server still serves new requests normally
        status, body = _post(srv2, {
            "prompt": "<t5>", "max_tokens": 4, "temperature": 0,
        })
        assert status == 200
    finally:
        srv2.httpd.shutdown()
        srv2.loop.shutdown()
        srv2.loop.join(timeout=120)


def test_corrupt_engine_snapshot_quarantined(model, tmp_path):
    """A corrupt/truncated checkpoint must not brick startup: it is moved
    to PATH.corrupt (evidence kept) and the server boots fresh."""
    import os
    import random

    from llm_tpu.engine_snapshot import write_engine

    path = str(tmp_path / "corrupt.ckpt")
    eng = Engine(model, max_streams=2, kv_dtype=jnp.float32, n_batch=8)
    eng.submit(GenerationRequest(prompt="<t2>", max_tokens=4,
                                 sampler=DeterministicSampler()))
    eng.step()
    write_engine(eng, path)
    data = bytearray(open(path, "rb").read())
    rng = random.Random(3)
    for _ in range(64):  # trash the payload
        data[rng.randrange(9, len(data))] = rng.randrange(256)
    open(path, "wb").write(bytes(data[: len(data) * 2 // 3]))

    fresh = Engine(model, max_streams=2, kv_dtype=jnp.float32, n_batch=8)
    srv = LlmServer(model, fresh, host="127.0.0.1", port=0,
                    engine_snapshot=path)
    assert not os.path.exists(path)
    assert os.path.exists(path + ".corrupt")
    assert fresh.active == 0
    srv.start()
    try:
        status, body = _post(srv, {
            "prompt": "<t5>", "max_tokens": 4, "temperature": 0,
        })
        assert status == 200
    finally:
        srv.httpd.shutdown()
        srv.loop.shutdown()
        srv.loop.join(timeout=120)


def test_n_choices(server, model):
    """OpenAI `n`: one engine stream per choice. Greedy choices are
    identical and equal to the single-stream reference; indices are
    0..n-1."""
    ref = _engine_reference(model, "<t3><t4>", 6)
    status, body = _post(server, {
        "prompt": "<t3><t4>", "max_tokens": 6, "temperature": 0, "n": 3,
    })
    assert status == 200
    assert [c["index"] for c in body["choices"]] == [0, 1, 2]
    assert [c["text"] for c in body["choices"]] == [ref] * 3
    assert all(c["finish_reason"] in ("stop", "length")
               for c in body["choices"])


def test_n_choices_seeded_sampling_differ(server):
    """Sampled choices derive per-choice seeds from an explicit seed
    (seed+i), so they are reproducible but not clones."""
    status, body = _post(server, {
        "prompt": "<t3><t4>", "max_tokens": 8, "temperature": 1.0,
        "top_k": 50, "seed": 7, "n": 2,
    })
    assert status == 200
    texts = [c["text"] for c in body["choices"]]
    status2, body2 = _post(server, {
        "prompt": "<t3><t4>", "max_tokens": 8, "temperature": 1.0,
        "top_k": 50, "seed": 7, "n": 2,
    })
    assert [c["text"] for c in body2["choices"]] == texts  # reproducible
    assert texts[0] != texts[1]  # per-choice seeds differ


def test_n_choices_stream(server, model):
    """Streaming with n>1: chunks carry their choice index and every
    choice finishes."""
    ref = _engine_reference(model, "<t5>", 4)
    req = urllib.request.Request(
        _url(server, "/v1/completions"),
        data=json.dumps({"prompt": "<t5>", "max_tokens": 4,
                         "temperature": 0, "stream": True, "n": 2}).encode(),
        headers={"Content-Type": "application/json"},
    )
    texts = {0: [], 1: []}
    finished = set()
    with urllib.request.urlopen(req, timeout=120) as resp:
        for line in resp:
            line = line.strip()
            if not line.startswith(b"data: ") or line == b"data: [DONE]":
                continue
            obj = json.loads(line[6:])
            ch = obj["choices"][0]
            if ch["finish_reason"]:
                finished.add(ch["index"])
            elif ch.get("text"):
                texts[ch["index"]].append(ch["text"])
    assert finished == {0, 1}
    assert "".join(texts[0]) == ref and "".join(texts[1]) == ref


def test_n_choices_validation(server):
    status, body = _post_raw(server, {"prompt": "<t3>", "n": 0})
    assert status == 400
    status, body = _post_raw(server, {"prompt": "<t3>", "n": "x"})
    assert status == 400


def _post_raw(server, body, path="/v1/completions"):
    """POST that returns (status, json) without raising on 4xx."""
    import urllib.error

    req = urllib.request.Request(
        _url(server, path), data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}")


def test_client_disconnect_cancels_all_n_choices(model):
    """With n>1, a disconnect while choice 0 streams must ALSO cancel the
    not-yet-drained choices (their engine streams are already in flight;
    an unstarted generator's close() alone would skip the cancel)."""
    import socket
    import time as _time

    engine = Engine(model, max_streams=3, kv_dtype=jnp.float32, n_batch=8)
    srv = LlmServer(model, engine, host="127.0.0.1", port=0)
    srv.start()
    try:
        host, port = srv.address
        body = json.dumps({"prompt": "<t5>", "max_tokens": 10_000,
                           "temperature": 0, "stream": True, "n": 3}).encode()
        s = socket.create_connection((host, port), timeout=30)
        s.sendall(
            b"POST /v1/completions HTTP/1.1\r\nHost: x\r\n"
            b"Content-Type: application/json\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
            + body
        )
        s.recv(1024)
        s.close()

        deadline = _time.monotonic() + 90
        while _time.monotonic() < deadline:
            cancelled = sum(
                1 for st in engine.finished.values()
                if st.finish_reason == "cancelled"
            )
            if cancelled == 3 and engine.active == 0:
                break
            _time.sleep(0.2)
        else:
            raise AssertionError(
                f"expected all 3 choices cancelled; finished="
                f"{[st.finish_reason for st in engine.finished.values()]} "
                f"active={engine.active}"
            )
    finally:
        srv.httpd.shutdown()
        srv.loop.shutdown()
        srv.loop.join(timeout=60)


def test_device_sampler_extension_params(model):
    """llama.cpp-server-style extension params (tfs_z, typical_p,
    mirostat) map onto the on-device block sampler (round 4)."""
    from llm_tpu.server import device_sampler_from_params

    ds = device_sampler_from_params(
        {"temperature": 0.8, "tfs_z": 0.9, "typical_p": 0.7})
    assert ds is not None and ds.tail_free_z == 0.9 and ds.typical_p == 0.7

    ms = device_sampler_from_params(
        {"temperature": 0.9, "mirostat": 2, "mirostat_tau": 4.0})
    assert ms is not None and ms.mirostat == 2 and ms.mirostat_tau == 4.0


def test_stop_scanner_earliest_match_wins():
    """With multiple stop strings in one fragment, the EARLIEST occurrence
    truncates (list-order matching leaked text past an earlier stop)."""
    s = _StopScanner(["###", "\n"])
    assert s.push("foo\nbar###") == "foo"
    assert s.hit
    # and in the reverse declaration order
    s2 = _StopScanner(["\n", "###"])
    assert s2.push("foo###bar\n") == "foo"
    assert s2.hit


def test_empty_token_prompt_retires_with_error(model):
    """A [] token prompt must retire as an error event, not sample a
    whole completion from all-padding garbage logits."""
    from llm_tpu.serve import Engine, GenerationRequest

    engine = Engine(model, max_streams=1, kv_dtype="int8")
    rid = engine.submit(GenerationRequest(prompt=[], max_tokens=4))
    while engine.has_work():
        engine.step()
    assert engine.finished[rid].finish_reason.startswith("error")
    assert not engine.finished[rid].text
