"""HTTP serving front-end over the continuous-batching engine.

A production-serving surface with no reference analog (rustformers/llm is
a library + CLI only; its closest surface is the `llm` CLI,
binaries/llm-cli/src/main.rs:27-35): an OpenAI-style REST API on the
stdlib `http.server`, so it adds no dependencies.

  POST /v1/completions   {"prompt", "max_tokens", "temperature", "top_k",
                          "top_p", "seed", "stop", "stream", "n", ...}
                         non-stream -> one JSON body; "stream": true ->
                         server-sent events, one data: line per UTF-8
                         fragment, closing with data: [DONE]
  GET  /v1/models        model listing (id = checkpoint path stem)
  GET  /health           liveness + engine occupancy

Threading model: ONE background thread owns the Engine — submissions,
cancellations and `step()` all happen there (the Engine itself is
single-threaded by contract, like InferenceSession). HTTP handler threads
(ThreadingHTTPServer) talk to it through queues: a submission carries its
own reply queue, and every engine event for that request id is forwarded
to it. Client disconnects cancel the stream so its slot (and pages, for a
paged engine) free immediately instead of decoding into a dead socket.

Stop sequences are scanned server-side with a holdback buffer: text that
could still be a prefix of a stop string is withheld until disambiguated,
so a stop string split across token fragments never leaks to the client.
"""

from __future__ import annotations

import json
import os
import queue
import threading
import time
import uuid
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from llm_tpu.samplers import (
    SamplerConfigurationError,
    build_sampler_chain,
    default_samplers,
)
from llm_tpu.serve import Engine, GenerationRequest

__all__ = ["LlmServer", "sampler_from_params", "serve_forever"]


def _logit_bias(params: dict) -> tuple:
    """OpenAI `logit_bias` {token_id: additive bias}; -100 bans a token
    outright (the API's documented semantics), mapped to -inf."""
    raw = params.get("logit_bias") or {}
    return tuple(
        (int(k), float("-inf") if float(v) <= -100.0 else float(v))
        for k, v in raw.items()
    )


def sampler_from_params(params: dict, n_vocab: int = 0):
    """Map OpenAI-style sampling params onto the sampler-chain DSL.

    temperature=0 means greedy (top-k 1). Unknown keys are ignored (the
    API surface is a superset across clients); explicit `sampler` strings
    pass straight through to the reference DSL (samplers.rs:238-285)."""
    bias = _logit_bias(params)
    if params.get("sampler"):
        raw = params["sampler"]
        args = raw if isinstance(raw, list) else [raw]
        return build_sampler_chain(args, n_vocab=n_vocab, bias=bias)
    args = []
    temp = params.get("temperature")
    if temp is not None and float(temp) <= 0.0:
        return build_sampler_chain(["topk:k=1", "temperature:1.0"],
                                   n_vocab=n_vocab, bias=bias)
    if params.get("repeat_penalty") is not None:
        args.append(f"repetition:penalty={float(params['repeat_penalty'])}")
    if params.get("frequency_penalty") is not None or \
            params.get("presence_penalty") is not None:
        fp = float(params.get("frequency_penalty") or 0.0)
        pp = float(params.get("presence_penalty") or 0.0)
        args.append(f"freqpresence:frequency={fp}:presence={pp}")
    miro = int(params.get("mirostat") or 0)
    if miro:
        # mirostat excludes the truncation samplers (host DSL validation)
        tau = float(params.get("mirostat_tau") or 5.0)
        eta = float(params.get("mirostat_eta") or 0.1)
        args.append(f"mirostat{miro}:tau={tau}:eta={eta}")
    else:
        if params.get("top_k") is not None:
            args.append(f"topk:k={int(params['top_k'])}")
        if params.get("top_p") is not None:
            args.append(f"topp:p={float(params['top_p'])}")
        if params.get("min_p") is not None:
            args.append(f"minp:p={float(params['min_p'])}")
        if params.get("tfs_z") is not None:
            args.append(f"tailfree:z={float(params['tfs_z'])}")
        if params.get("typical_p") is not None:
            args.append(f"locallytypical:p={float(params['typical_p'])}")
    if temp is not None:
        args.append(f"temperature:{float(temp)}")
    if not args and not bias:
        return default_samplers()
    return build_sampler_chain(args, n_vocab=n_vocab, bias=bias)


def device_sampler_from_params(params: dict, allow_logprobs: bool = False,
                               allow_bias: bool = True):
    """A DeviceSampler for requests expressible on device (greedy or
    temperature, with optional top-k / top-p / min-p and windowed
    repetition / frequency / presence penalties) — lets a multi-step
    server decode whole blocks per dispatch. None when the request needs
    the host chain (explicit DSL, or the full default chain). Logprob
    requests stay on the host path unless the engine's block dispatch
    gathers them on device (`allow_logprobs`)."""
    from llm_tpu.ops.sampling import DeviceSampler

    if params.get("sampler") is not None:
        return None
    if params.get("logprobs") is not None and not allow_logprobs:
        return None
    if params.get("logit_bias") and not allow_bias:
        # multi-host block dispatch would need a cross-host agreement on
        # the biased-token union; those requests sample host-side instead
        return None
    temp = params.get("temperature")
    if temp is None:
        return None
    def _f(key, default):
        v = params.get(key)  # explicit None checks: 0 and 0.0 are real
        return default if v is None else float(v)  # values (0 ≠ unset)

    penalties = {
        "repeat_penalty": _f("repeat_penalty", 1.0),
        "frequency_penalty": _f("frequency_penalty", 0.0),
        "presence_penalty": _f("presence_penalty", 0.0),
        "bias": _logit_bias(params),
    }
    if float(temp) <= 0.0:
        return DeviceSampler(kind="greedy", **penalties)
    # llama.cpp-server-style extension params (not in the OpenAI schema but
    # the de-facto ecosystem surface): tfs_z, typical_p, mirostat/
    # mirostat_tau/mirostat_eta — all ride the on-device block path
    miro = int(_f("mirostat", 0))
    if miro:
        return DeviceSampler(kind="sample", temperature=float(temp),
                             mirostat=miro,
                             mirostat_tau=_f("mirostat_tau", 5.0),
                             mirostat_eta=_f("mirostat_eta", 0.1),
                             **penalties)
    return DeviceSampler(kind="sample", temperature=float(temp),
                         top_k=int(_f("top_k", 0)),
                         top_p=_f("top_p", 1.0),
                         min_p=_f("min_p", 0.0),
                         tail_free_z=_f("tfs_z", 1.0),
                         typical_p=_f("typical_p", 1.0),
                         **penalties)


DEFAULT_CHAT_TEMPLATE = {
    # the vicuna-chat convention (crates/llm/examples/vicuna-chat.rs via
    # examples/vicuna_chat.py): role prefixes, user prefix doubles as the
    # stop sequence
    "system": "{content}\n\n",
    "user": "### Human: {content}\n",
    "assistant": "### Assistant: {content}\n",
    "generation_prefix": "### Assistant: ",
    "stop": "### Human:",
}


def render_chat(messages, template=None, jinja=None) -> tuple[str, str]:
    """[{role, content}] -> (prompt, stop sequence).

    Precedence: a per-request `chat_template` dict (role-format strings),
    then the checkpoint's own HF-convention JINJA template (GGUF
    `tokenizer.chat_template`, rendered with add_generation_prompt), then
    the built-in vicuna-style default. Unknown roles render with the user
    prefix."""
    if template is None and jinja:
        # ANY template failure (syntax error, undefined variable, the
        # template's own raise_exception, jinja2 missing) maps to
        # ValueError, which the handler returns as HTTP 400 — a broken
        # embedded template must never 500 the endpoint
        try:
            import jinja2
        except ImportError:
            raise ValueError(
                "this checkpoint's chat template needs jinja2, which is "
                "not installed; pass a chat_template dict instead"
            )
        compiled = _JINJA_CACHE.get(jinja)
        try:
            if compiled is None:
                env = jinja2.Environment()  # noqa: S701 — text templating
                env.globals["raise_exception"] = _jinja_raise
                compiled = env.from_string(jinja)
                _JINJA_CACHE.clear() if len(_JINJA_CACHE) > 8 else None
                _JINJA_CACHE[jinja] = compiled
            prompt = compiled.render(
                messages=list(messages),
                add_generation_prompt=True,
                bos_token="",
                eos_token="",
            )
        except jinja2.TemplateError as e:
            raise ValueError(f"chat template error: {e}") from e
        # generation halts at the model's own EoT; no textual stop needed
        return prompt, ""
    t = dict(DEFAULT_CHAT_TEMPLATE)
    if template:
        t.update(template)
    parts = []
    for m in messages:
        role = m.get("role", "user")
        fmt = t.get(role) or t["user"]
        parts.append(fmt.format(content=m.get("content", "")))
    parts.append(t["generation_prefix"])
    return "".join(parts), t["stop"]


_JINJA_CACHE: dict = {}  # compiled template per source text


def _jinja_raise(message):
    """HF chat templates call raise_exception() for unsupported inputs."""
    raise ValueError(message)


class _StopScanner:
    """Holdback scanner: emit only text that cannot still become a stop
    string; report a match exactly once, with the match excised."""

    def __init__(self, stops):
        self.stops = [s for s in (stops or []) if s]
        self.buf = ""
        self.hit = False

    def push(self, text: str) -> str:
        if not self.stops:
            return text
        self.buf += text
        # EARLIEST occurrence across all stop strings wins (list-order
        # matching leaked text past an earlier-occurring stop)
        best = min(
            (i for i in (self.buf.find(s) for s in self.stops) if i >= 0),
            default=-1,
        )
        if best >= 0:
            out, self.buf = self.buf[:best], ""
            self.hit = True
            return out
        # longest tail that is a proper prefix of some stop string
        hold = 0
        for s in self.stops:
            for k in range(min(len(s) - 1, len(self.buf)), 0, -1):
                if self.buf.endswith(s[:k]):
                    hold = max(hold, k)
                    break
        out = self.buf[: len(self.buf) - hold]
        self.buf = self.buf[len(self.buf) - hold :]
        return out

    def flush(self) -> str:
        out, self.buf = self.buf, ""
        return out


@dataclass
class _Ticket:
    request: GenerationRequest
    events: "queue.Queue" = field(default_factory=queue.Queue)
    request_id: Optional[int] = None
    ready: threading.Event = field(default_factory=threading.Event)
    t_submit: float = field(default_factory=time.monotonic)
    t_first: Optional[float] = None  # first token event (TTFT)


class _EngineLoop(threading.Thread):
    """The single thread that owns the Engine."""

    def __init__(self, engine: Engine, multi_step: int = 0,
                 snapshot_path=None):
        super().__init__(daemon=True, name="llm-tpu-engine")
        self.engine = engine
        self.multi_step = multi_step
        self.snapshot_path = snapshot_path  # final checkpoint on shutdown
        self.inbox: "queue.Queue" = queue.Queue()
        self.tickets: dict[int, _Ticket] = {}
        self.stopping = False
        self.stats = {
            "requests_completed": 0,
            "tokens_generated": 0,
            "started_at": time.monotonic(),
        }
        self._ttft_ms: list[float] = []  # last 1024 samples

    def submit(self, ticket: _Ticket) -> int:
        self.inbox.put(("submit", ticket))
        ticket.ready.wait()
        return ticket.request_id

    def cancel(self, request_id: int) -> None:
        self.inbox.put(("cancel", request_id))

    def shutdown(self) -> None:
        self.inbox.put(("stop", None))

    def _drain_inbox(self, block: bool) -> None:
        while True:
            try:
                kind, payload = self.inbox.get(block=block, timeout=0.2)
            except queue.Empty:
                return
            block = False
            if kind == "submit":
                if self.stopping:
                    # a submit racing shutdown must fail fast, not hang
                    # its handler on a loop that will never step again
                    payload.request_id = -1
                    payload.events.put(("", True, "error: server stopping",
                                        None))
                    payload.ready.set()
                    continue
                try:
                    payload.request_id = self.engine.submit(payload.request)
                    self.tickets[payload.request_id] = payload
                except Exception as e:  # noqa: BLE001 — e.g. an engine
                    # that restricts sampling (SpeculativeEngine): fail
                    # THIS request, not the loop
                    payload.request_id = -1
                    payload.events.put(("", True, f"error: {e}", None))
                payload.ready.set()
            elif kind == "cancel":
                self.engine.cancel(payload)
            elif kind == "embed":
                inputs, out_q = payload
                try:
                    out_q.put(("ok", self._embed(inputs)))
                except Exception as e:  # noqa: BLE001
                    out_q.put(("error", str(e)))
            elif kind == "checkpoint":
                path, out_q = payload
                out_q.put(self._checkpoint(path, client=True))
            elif kind == "stop":
                # keep draining: a checkpoint/submit racing shutdown must
                # still get an answer instead of dangling in the queue
                self.stopping = True

    def _checkpoint(self, path, client: bool = False) -> tuple[str, str]:
        """Write an engine checkpoint between steps (we ARE the engine
        thread, so the engine is quiesced by construction). `client`
        marks HTTP-supplied paths, which are confined to the configured
        snapshot's directory — /admin/checkpoint must not be an
        arbitrary-path file-write primitive."""
        import os as _os

        from llm_tpu.engine_snapshot import write_engine

        if not self.snapshot_path:
            return ("error", "no snapshot path configured")
        if path and client:
            want_dir = _os.path.dirname(
                _os.path.abspath(self.snapshot_path)
            )
            if _os.path.dirname(_os.path.abspath(path)) != want_dir:
                return (
                    "error",
                    f"path must live in the configured snapshot "
                    f"directory {want_dir}",
                )
        path = path or self.snapshot_path
        try:
            self._dispatch(self.engine._drain_retired())
            write_engine(self.engine, path)
            return ("ok", str(path))
        except Exception as e:  # noqa: BLE001 — e.g. a custom sampler
            return ("error", str(e))

    def checkpoint(self, path=None, timeout: float = 600.0):
        """Called from handler threads: checkpoint without downtime."""
        out_q: "queue.Queue" = queue.Queue()
        self.inbox.put(("checkpoint", (path, out_q)))
        try:
            return out_q.get(timeout=timeout)
        except queue.Empty:
            return ("error", "engine loop did not respond (shutting down?)")

    def _embed(self, inputs):
        """Final-token hidden-state embeddings (the embeddings.rs analog),
        computed on the engine thread through a dedicated session so the
        device never sees interleaved dispatches from two threads."""
        from llm_tpu.session import (
            InferenceSession, InferenceSessionConfig, OutputRequest,
        )

        model = self.engine.model
        out = []
        for text in inputs:
            session = InferenceSession(model, InferenceSessionConfig())
            req = OutputRequest(embeddings=[])
            session.feed_prompt(text, output_request=req)
            import numpy as np

            emb = np.asarray(req.embeddings, np.float32).reshape(
                -1, model.spec.n_embd
            )
            out.append([float(x) for x in emb[-1]])
        return out

    def embed(self, inputs, timeout: float = 600.0):
        out_q: "queue.Queue" = queue.Queue()
        self.inbox.put(("embed", (inputs, out_q)))
        status, result = out_q.get(timeout=timeout)
        if status == "error":
            raise RuntimeError(result)
        return result

    def _dispatch(self, events) -> None:
        for rid, text, done in events:
            ticket = self.tickets.get(rid)
            if ticket is None:
                continue
            if text and ticket.t_first is None:
                ticket.t_first = time.monotonic()
                self._ttft_ms.append((ticket.t_first - ticket.t_submit) * 1e3)
                del self._ttft_ms[:-1024]
            reason, info = "", None
            if done:
                fin = self.engine.finished.get(rid)
                reason = fin.finish_reason if fin else "done"
                if fin is not None and fin.logprob_data:
                    info = {"logprobs": fin.logprob_data}
                self.stats["requests_completed"] += 1
                self.stats["tokens_generated"] += fin.generated if fin else 0
                del self.tickets[rid]
            ticket.events.put((text, done, reason, info))

    def metrics(self) -> dict:
        ttft = sorted(self._ttft_ms)
        pick = (lambda q: round(ttft[min(len(ttft) - 1,
                                         int(q * len(ttft)))], 2)) \
            if ttft else (lambda q: None)
        return {
            **{k: v for k, v in self.stats.items() if k != "started_at"},
            "uptime_s": round(time.monotonic() - self.stats["started_at"], 1),
            "active_streams": self.engine.active,
            "pending": len(self.engine.pending),
            "ttft_ms_p50": pick(0.50),
            "ttft_ms_p95": pick(0.95),
        }

    def _should_exit(self) -> bool:
        return self.stopping

    def run(self) -> None:
        while not self._should_exit():
            try:
                self._tick()
            except Exception:  # noqa: BLE001 — an engine failure must not
                # strand waiting handlers on a dead thread: fail their
                # requests and keep serving
                import traceback

                traceback.print_exc()
                tickets, self.tickets = self.tickets, {}
                for t in tickets.values():
                    t.events.put(("", True, "error: engine step failed", None))
        if self.snapshot_path:
            status, info = self._checkpoint(self.snapshot_path)
            print(f"engine checkpoint on shutdown: {status} {info}",
                  flush=True)

    def _tick(self) -> None:
        self._drain_inbox(block=not self.engine.has_work())
        # cancellations (and admission failures) retire streams without a
        # step(): flush their done-events now or a waiting handler
        # deadlocks on an idle engine
        self._dispatch(self.engine._drain_retired())
        if self.stopping or not self.engine.has_work():
            return
        if self.multi_step > 1 and not self.engine.pending and all(
            s is None or (not s.prefilling
                          and s.request.device_sampler is not None)
            for s in self.engine.slots
        ):
            self._dispatch(self.engine.step_multi(self.multi_step))
        else:
            self._dispatch(self.engine.step())


class _MultiHostEngineLoop(_EngineLoop):
    """Per-host loop over a MultiHostEngine: serving across host
    processes, each with its own HTTP endpoint and local streams.

    Every engine operation on a MultiHostEngine is COLLECTIVE (step,
    has_work_global), so all hosts must make the same calls in the same
    order. This loop achieves that with one allgather per iteration —
    [has_local_work, stop_requested] — whose blocking nature also
    rate-matches the hosts' loops. All hosts then see identical
    (work, all_stop) and take the same branch: everyone steps, everyone
    idles, or everyone exits. A host whose own streams finished keeps
    stepping until the GLOBAL queue drains, and shutdown only completes
    when every host has requested it, so no host ever abandons a peer
    mid-collective.

    multi_step is ignored here: per-host step/step_multi choices could
    diverge, which would misalign the collectives.
    """

    def _should_exit(self) -> bool:
        return getattr(self, "_exit_agreed", False)

    def _checkpoint(self, path, client: bool = False) -> tuple[str, str]:
        if client:
            # a live checkpoint triggered on ONE host would write a torn
            # set: the other hosts' files would be stale or from different
            # collective steps (the PRNG chain seeds from the synchronized
            # step counter). Only the coordinated shutdown checkpoint —
            # all hosts exit after consensus at the same step — is safe.
            return (
                "error",
                "live /admin/checkpoint is not supported on multi-host "
                "serving; stop all hosts gracefully for a consistent "
                "per-host checkpoint set",
            )
        return super()._checkpoint(path, client=client)

    def _tick(self) -> None:
        import jax
        import numpy as np

        self._drain_inbox(block=False)
        self._dispatch(self.engine._drain_retired())
        local = np.array([1 if self.engine.has_work() else 0,
                          1 if self.stopping else 0], np.int64)
        if jax.process_count() == 1:
            g = local[None]
        else:
            from jax.experimental import multihost_utils

            g = np.asarray(multihost_utils.process_allgather(local))
        work = int(g[:, 0].sum()) > 0
        if bool(g[:, 1].all()) and not work:
            self._exit_agreed = True
            return
        if not work:
            time.sleep(0.05)
            return
        self._dispatch(self.engine.step())


class LlmServer:
    """Bind an Engine (dense, paged, or multi-host) to an HTTP address.
    Multi-host engines get the collective per-host loop (one LlmServer —
    one port — per host process)."""

    def __init__(self, model, engine: Engine, host: str = "127.0.0.1",
                 port: int = 8080, multi_step: int = 0,
                 default_max_tokens: int = 256, engine_snapshot=None):
        """`engine_snapshot`: path for engine checkpoint/resume — restored
        at construction if the file exists (in-flight streams resume and
        complete headless: their HTTP clients died with the old process,
        but their work and KV/prefix-cache state are preserved), written
        on graceful shutdown, and exposed at POST /admin/checkpoint for
        zero-downtime snapshots. Multi-host engines with >1 process get a
        `.host<N>` suffix automatically (per-host files)."""
        self.model = model
        self.model_id = getattr(model, "name", None) or "llm-tpu"
        if engine_snapshot is not None and hasattr(engine, "global_streams"):
            import jax

            if jax.process_count() > 1:
                engine_snapshot = (
                    f"{engine_snapshot}.host{jax.process_index()}"
                )
        self.engine_snapshot = engine_snapshot
        if engine_snapshot is not None and os.path.exists(engine_snapshot):
            from llm_tpu.engine_snapshot import read_engine
            from llm_tpu.session import SnapshotError

            try:
                read_engine(engine, engine_snapshot)
                print(f"restored engine state from {engine_snapshot} "
                      f"({engine.active} streams in flight, "
                      f"{len(engine.pending)} pending)", flush=True)
            except SnapshotError as e:
                # a corrupt/incompatible checkpoint must not brick the
                # server: quarantine it (keep the evidence) and serve
                # fresh — loudly, since in-flight state is being dropped
                quarantine = f"{engine_snapshot}.corrupt"
                os.replace(engine_snapshot, quarantine)
                print(f"WARNING: engine checkpoint rejected ({e}); moved "
                      f"to {quarantine}, serving with a fresh engine",
                      flush=True)
        loop_cls = (_MultiHostEngineLoop if hasattr(engine, "has_work_global")
                    else _EngineLoop)
        self.loop = loop_cls(engine, multi_step=multi_step,
                             snapshot_path=engine_snapshot)
        self.default_max_tokens = default_max_tokens
        handler = _make_handler(self)
        self.httpd = ThreadingHTTPServer((host, port), handler)
        self.httpd.daemon_threads = True

    @property
    def address(self) -> tuple[str, int]:
        return self.httpd.server_address[:2]

    def start(self) -> None:
        self.loop.start()
        threading.Thread(
            target=self.httpd.serve_forever, daemon=True,
            name="llm-tpu-http",
        ).start()

    def serve_forever(self) -> None:
        self.loop.start()
        self.httpd.serve_forever()

    def shutdown(self) -> None:
        self.httpd.shutdown()
        self.loop.shutdown()

    def warmup(self) -> None:
        """Run one tiny request end-to-end so the prefill/decode compiles
        (~20-40 s on a cold TPU) happen before the first client arrives.
        Requires the engine loop to be running."""
        # sampler=None: every engine accepts its own default (the plain
        # Engine uses the default chain; SpeculativeEngine forces greedy).
        # requires_device_sampler engines (sampled speculative) reject a
        # request without one — warmup must attach it or the submit fails
        # silently and the first real client pays the cold compile
        dev = None
        if getattr(self.loop.engine, "requires_device_sampler", False):
            from llm_tpu.ops.sampling import DeviceSampler

            dev = DeviceSampler(kind="sample", temperature=1.0)
        gen = self._events(
            GenerationRequest(prompt=[min(2, self.model.spec.n_vocab - 1)],
                              max_tokens=2, device_sampler=dev),
            _StopScanner(None),
        )
        for _ in gen:
            pass
        # warmup shouldn't pollute the serving metrics
        self.loop.stats["requests_completed"] = 0
        self.loop.stats["tokens_generated"] = 0
        self.loop._ttft_ms.clear()

    # -- request plumbing (called from handler threads) ----------------------

    def completion(self, body: dict):
        """Build + validate the request EAGERLY (sampler errors must reach
        the caller as exceptions, not escape a half-started generator),
        then return the (fragment, done, reason) iterator."""
        prompt = body.get("prompt", "")
        if getattr(self.loop.engine, "requires_device_sampler", False) \
                and body.get("temperature") is None \
                and not body.get("sampler"):
            # sampled speculative engines need a device sampler for every
            # request; an omitted temperature means the OpenAI default 1.0
            body = dict(body, temperature=1.0)
        temp = body.get("temperature")
        if getattr(self.loop.engine, "greedy_only", False) and \
                temp is not None and float(temp) <= 0.0 and \
                not body.get("sampler"):
            # greedy-only engines (SpeculativeEngine) force their own
            # greedy sampler; an equivalent topk:k=1 chain would be
            # rejected by their submit() guard
            sampler = None
        else:
            sampler = sampler_from_params(body,
                                          n_vocab=self.model.spec.n_vocab)
        max_tokens = body.get("max_tokens", self.default_max_tokens)
        req = GenerationRequest(
            prompt=prompt,
            max_tokens=None if max_tokens in (None, -1) else int(max_tokens),
            sampler=sampler,
            seed=body.get("seed"),
            # multi-step servers decode whole blocks on device when every
            # active request's sampling is device-expressible; sampled
            # speculative engines consume the device sampler per round
            device_sampler=(
                device_sampler_from_params(
                    body,
                    allow_logprobs=getattr(
                        self.loop.engine, "supports_device_logprobs", False
                    ),
                    allow_bias=getattr(
                        self.loop.engine, "supports_device_bias", True
                    ),
                )
                if self.loop.multi_step > 1 or getattr(
                    self.loop.engine, "requires_device_sampler", False
                ) else None
            ),
            logprobs=(int(body["logprobs"])
                      if body.get("logprobs") is not None else None),
        )
        stops = body.get("stop")
        if isinstance(stops, str):
            stops = [stops]
        return self._events(req, _StopScanner(stops))

    def _events(self, req: GenerationRequest, scan: "_StopScanner"):
        # submit EAGERLY (not at first next()): the handler may build n
        # generators for one request (OpenAI `n`), and the engine can only
        # batch choices whose streams are all in flight
        ticket = _Ticket(request=req)
        rid = self.loop.submit(ticket)
        return _Completion(self.loop, rid, self._drain(ticket, rid, scan))

    def _drain(self, ticket: "_Ticket", rid: int, scan: "_StopScanner"):
        try:
            while True:
                text, done, reason, info = ticket.events.get()
                out = scan.push(text)
                if scan.hit:
                    if out:
                        yield out, False, "", None
                    self.loop.cancel(rid)
                    # drain the queue until the cancel's done-event arrives
                    while not done:
                        _, done, reason, info = ticket.events.get()
                    yield "", True, "stop", info
                    return
                if done:
                    tail = out + scan.flush()  # the done event carries the
                    if tail:                   # final token's text
                        yield tail, False, "", None
                    yield "", True, reason, info
                    return
                if out:
                    yield out, False, "", None
        except GeneratorExit:
            # client went away mid-stream: free the slot
            self.loop.cancel(rid)
            raise


class _Completion:
    """An in-flight completion: iterate for (text, done, reason, info)
    events; close() cancels the ENGINE stream even if iteration never
    started (generator.close() on an unstarted generator skips its body,
    so it alone cannot cancel — with OpenAI `n`, a disconnect during
    choice 0 must still free choices 1..n-1's slots)."""

    __slots__ = ("_loop", "_rid", "_gen")

    def __init__(self, loop, rid, gen):
        self._loop = loop
        self._rid = rid
        self._gen = gen

    def __iter__(self):
        return self._gen

    def close(self) -> None:
        self._loop.cancel(self._rid)
        self._gen.close()


def _finish_name(reason: str) -> str:
    return {
        "eot": "stop", "stop": "stop", "max_tokens": "length",
        "context_full": "length", "cancelled": "cancelled",
    }.get(reason, reason or "stop")


def _make_handler(server: LlmServer):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _json(self, code: int, obj: dict) -> None:
            payload = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def do_GET(self):  # noqa: N802
            if self.path == "/health":
                eng = server.loop.engine
                self._json(200, {
                    "status": "ok",
                    "active_streams": eng.active,
                    "pending": len(eng.pending),
                })
            elif self.path == "/metrics":
                self._json(200, server.loop.metrics())
            elif self.path == "/v1/models":
                self._json(200, {
                    "object": "list",
                    "data": [{"id": server.model_id, "object": "model",
                              "owned_by": "llm-tpu"}],
                })
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):  # noqa: N802
            if self.path == "/admin/checkpoint":
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    body = json.loads(self.rfile.read(n) or b"{}")
                except (ValueError, json.JSONDecodeError):
                    self._json(400, {"error": "invalid JSON body"})
                    return
                if not isinstance(body, dict):
                    self._json(400, {"error": "body must be a JSON object"})
                    return
                status, info = server.loop.checkpoint(body.get("path"))
                code = 200 if status == "ok" else 409
                self._json(code, {"status": status,
                                  ("path" if status == "ok" else "error"):
                                  info})
                return
            chat = self.path in ("/v1/chat/completions", "/chat/completions")
            embed = self.path in ("/v1/embeddings", "/embeddings")
            if not (chat or embed) and self.path not in ("/v1/completions",
                                                         "/completions"):
                self._json(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
            except (ValueError, json.JSONDecodeError):
                self._json(400, {"error": "invalid JSON body"})
                return
            if not isinstance(body, dict):
                self._json(400, {"error": "body must be a JSON object"})
                return
            if embed:
                inputs = body.get("input", [])
                if isinstance(inputs, str):
                    inputs = [inputs]
                try:
                    vecs = server.loop.embed(inputs)
                except RuntimeError as e:
                    self._json(400, {"error": str(e)})
                    return
                self._json(200, {
                    "object": "list", "model": server.model_id,
                    "data": [{"object": "embedding", "index": i,
                              "embedding": v} for i, v in enumerate(vecs)],
                })
                return
            if chat:
                # render messages -> prompt; the user prefix joins the
                # stop set (the CLI chat convention, interactive.rs:66-114)
                try:
                    prompt, stop = render_chat(
                        body.get("messages", ()),
                        body.get("chat_template"),
                        getattr(server.model, "chat_template", None),
                    )
                except ValueError as e:  # template raise_exception()
                    self._json(400, {"error": str(e)})
                    return
                stops = body.get("stop") or []
                if isinstance(stops, str):
                    stops = [stops]
                body = dict(body, prompt=prompt, stop=[*stops, stop])
            try:
                n_raw = body.get("n")
                n_choices = 1 if n_raw is None else int(n_raw)
            except (TypeError, ValueError):
                self._json(400, {"error": "n must be an integer"})
                return
            if not 1 <= n_choices <= 64:
                self._json(400, {"error": "n must be in [1, 64]"})
                return
            try:
                # one engine stream per choice, all submitted up front so
                # the engine batches them; an explicit seed derives per-
                # choice seeds (identical seeds would clone every choice)
                gens = []
                for i in range(n_choices):
                    b = body
                    if n_choices > 1 and body.get("seed") is not None:
                        b = dict(body, seed=int(body["seed"]) + i)
                    gens.append(server.completion(b))
            except (SamplerConfigurationError, ValueError, TypeError) as e:
                # SamplerConfigurationError: bad sampler combination;
                # ValueError/TypeError: malformed numerics anywhere in the
                # body ({"temperature": "hot"}, a string seed, ...) — all
                # client errors, all 400s (a traceback-and-hangup here
                # closed the connection with no response)
                for g in gens:  # free any already-submitted choices
                    g.close()
                self._json(400, {"error": str(e)})
                return
            cid = f"{'chatcmpl' if chat else 'cmpl'}-{uuid.uuid4().hex[:24]}"
            if body.get("stream"):
                self._stream(cid, gens, chat)
            else:
                choices = []
                for idx, gen in enumerate(gens):
                    parts, reason, info = [], "", None
                    for text, done, r, inf in gen:
                        if done:
                            reason, info = r, inf
                        elif text:
                            parts.append(text)
                    whole = "".join(parts)
                    if chat:
                        choice = {
                            "index": idx,
                            "message": {"role": "assistant",
                                        "content": whole.rstrip()},
                            "finish_reason": _finish_name(reason),
                        }
                    else:
                        choice = {"index": idx, "text": whole,
                                  "finish_reason": _finish_name(reason)}
                    if info and info.get("logprobs"):
                        lp = info["logprobs"]
                        choice["logprobs"] = {
                            "tokens": [e["token"] for e in lp],
                            "token_logprobs": [e["logprob"] for e in lp],
                            "top_logprobs": [e.get("top_logprobs")
                                             for e in lp],
                        }
                    choices.append(choice)
                self._json(200, {
                    "id": cid,
                    "object": ("chat.completion" if chat
                               else "text_completion"),
                    "model": server.model_id,
                    "choices": choices,
                })

        def _chunk(self, cid, chat, text, reason, index=0) -> bytes:
            if chat:
                choice = {
                    "index": index,
                    "delta": ({"content": text} if reason is None else {}),
                    "finish_reason": reason,
                }
                obj = "chat.completion.chunk"
            else:
                choice = {"index": index, "text": text,
                          "finish_reason": reason}
                obj = "text_completion"
            return b"data: " + json.dumps({
                "id": cid, "object": obj, "model": server.model_id,
                "choices": [choice],
            }).encode() + b"\n\n"

        def _stream(self, cid: str, gens, chat: bool = False) -> None:
            if not isinstance(gens, (list, tuple)):
                gens = [gens]
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.send_header("Connection", "close")
            self.end_headers()
            try:
                # choices stream one after another (each chunk carries its
                # choice index; all n engine streams are already in flight,
                # so draining them in order loses no decode concurrency)
                for idx, gen in enumerate(gens):
                    for text, done, reason, _info in gen:
                        if done:
                            self.wfile.write(self._chunk(
                                cid, chat, "", _finish_name(reason), idx
                            ))
                            break
                        if not text:
                            continue
                        self.wfile.write(
                            self._chunk(cid, chat, text, None, idx)
                        )
                        self.wfile.flush()
                self.wfile.write(b"data: [DONE]\n\n")
            except (BrokenPipeError, ConnectionResetError):
                for g in gens:  # cancel EVERY choice's engine stream
                    g.close()  # GeneratorExit -> loop.cancel(rid)

    return Handler


def serve_forever(model, host="127.0.0.1", port=8080, max_streams=8,
                  kv_dtype=None, n_batch=64, paged=False, page_size=256,
                  n_pages=None, multi_step=0, warmup=True,
                  draft=None, draft_k=4, draft_sampled=False,
                  multihost=False, model_parallel=None,
                  prefix_cache=False, engine_snapshot=None) -> None:
    """CLI entry: build the engine and serve until interrupted."""
    import jax.numpy as jnp

    kv_dtype = kv_dtype if kv_dtype is not None else jnp.bfloat16
    if prefix_cache and (multihost or not paged):
        raise ValueError("--prefix-cache requires --paged (single-host)")
    if multihost:
        # one server (and port) per host process over the global mesh;
        # max_streams counts GLOBAL slots (split evenly across hosts)
        from llm_tpu.parallel.multihost import (
            MultiHostEngine, MultiHostPagedEngine, multihost_mesh,
        )

        if draft is not None:
            raise ValueError("--draft-model with --multihost: not yet")
        mesh = multihost_mesh(model_parallel)
        cls = MultiHostPagedEngine if paged else MultiHostEngine
        kwargs = {"page_size": page_size} if paged else {}
        if paged and n_pages is not None:
            kwargs["n_pages"] = n_pages
        engine = cls(model, mesh, global_streams=max_streams,
                     kv_dtype=kv_dtype, n_batch=n_batch, **kwargs)
    elif draft is not None:
        from llm_tpu.speculative import (
            PagedSampledSpeculativeEngine,
            PagedSpeculativeEngine,
            SampledSpeculativeEngine,
            SpeculativeEngine,
        )

        if paged:
            cls = (PagedSampledSpeculativeEngine if draft_sampled
                   else PagedSpeculativeEngine)
            kwargs = {} if n_pages is None else {"n_pages": n_pages}
            engine = cls(
                model, draft, k=draft_k, max_streams=max_streams,
                kv_dtype=kv_dtype, n_batch=n_batch, page_size=page_size,
                prefix_cache=prefix_cache, **kwargs)
        else:
            cls = (SampledSpeculativeEngine if draft_sampled
                   else SpeculativeEngine)
            engine = cls(model, draft, k=draft_k,
                         max_streams=max_streams,
                         kv_dtype=kv_dtype, n_batch=n_batch)
    elif paged:
        from llm_tpu.paged import PagedEngine

        kwargs = {} if n_pages is None else {"n_pages": n_pages}
        engine = PagedEngine(model, max_streams=max_streams,
                             kv_dtype=kv_dtype, page_size=page_size,
                             n_batch=n_batch, prefix_cache=prefix_cache,
                             **kwargs)
    else:
        engine = Engine(model, max_streams=max_streams, kv_dtype=kv_dtype,
                        n_batch=n_batch)
    srv = LlmServer(model, engine, host=host, port=port,
                    multi_step=multi_step, engine_snapshot=engine_snapshot)
    srv.loop.start()
    if warmup:
        print("warming up (compiling prefill/decode)...", flush=True)
        t0 = time.monotonic()
        srv.warmup()
        print(f"warmup done in {time.monotonic() - t0:.1f}s", flush=True)
    print(f"llm-tpu serving {srv.model_id} on http://{host}:{port} "
          f"({'paged' if paged else 'dense'} KV, {max_streams} streams)")
    try:
        srv.httpd.serve_forever()
    finally:
        if engine_snapshot is not None:
            # graceful exit (SIGINT): drain the loop so the final engine
            # checkpoint lands before the process dies
            srv.loop.shutdown()
            srv.loop.join(timeout=600)
