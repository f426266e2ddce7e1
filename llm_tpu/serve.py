"""Continuous-batching inference engine: many streams, one batched decode.

Nothing like this exists in the reference — it is single-stream by design
(InferenceSession is Send+!Sync, one thread at a time; SURVEY.md §2.5) — but
BASELINE.md's scaling target (64-stream continuous batching) requires it, and
it is the TPU-idiomatic way to use the MXU during decode: a batch of B
streams turns B matvecs into one [B, E] x [E, R] matmul over the same
streamed weights, multiplying tokens/s/chip at roughly constant HBM traffic.

Design (slot-based, static shapes):
- `max_streams` cache slots, each a full [L, S, H_kv, D] ring; a request is
  assigned a free slot, prefilled (chunked, same bucketing as
  InferenceSession), then joins the batched decode step.
- one jitted decode: vmap'd forward over (ids [B,1], n_past [B], cache [B,...])
  — inactive slots run a dummy token and are masked host-side; their cache
  garbage is overwritten when the slot is reused.
- sampling stays host-side per stream (own sampler chain + rng), exactly as
  the reference samples from last_logits.
- works unsharded on one chip or DPxTP-sharded via llm_tpu.parallel
  (cache slots ride the `data` axis, weights the `model` axis).

Paged KV (decoupling memory from max_streams x n_ctx) is the planned next
step; the engine API is paging-agnostic.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from llm_tpu.models.forward import (
    KVCache,
    forward,
    forward_batched,
    init_cache_batched,
    window_bucket,
)
from llm_tpu.samplers import default_samplers, sample_token
from llm_tpu.session import ContextFull
from llm_tpu.tokenizer import Prompt, TokenUtf8Buffer


@dataclass
class GenerationRequest:
    prompt: Union[str, Sequence[int], Prompt]
    max_tokens: Optional[int] = None
    sampler: Optional[object] = None  # defaults to the default chain
    seed: Optional[int] = None
    # callback(stream_id, text) per decoded UTF-8 fragment
    on_token: Optional[Callable[[int, str], None]] = None
    # ops.sampling.DeviceSampler: enables the multi-token on-device decode
    # path (Engine.step_multi) when every active stream carries one
    device_sampler: Optional[object] = None
    # record per-generated-token logprobs (+ top-N alternatives when > 0);
    # host-sampling path only (the logits row never leaves the device in
    # step_multi blocks)
    logprobs: Optional[int] = None


@dataclass
class _Stream:
    request_id: int
    request: GenerationRequest
    sampler: object
    rng: np.random.Generator
    tokens: list = field(default_factory=list)
    generated: int = 0
    n_past: int = 0
    last_logits: Optional[np.ndarray] = None
    utf8: TokenUtf8Buffer = field(default_factory=TokenUtf8Buffer)
    decoded_len: int = 0
    text: list = field(default_factory=list)
    logprob_data: list = field(default_factory=list)
    done: bool = False
    finish_reason: str = ""
    # chunked-prefill state: admission assigns a slot immediately and the
    # prompt advances ONE n_batch chunk per engine step, interleaved with
    # decode of running streams (a long prompt never stalls the batch)
    prefilling: bool = False
    prefill_pos: int = 0
    prefill_queue: Optional[list] = None
    kv_wait: bool = False  # paged: last prefill chunk hit an empty pool
    # mirostat terminal: per-stream mu carried ACROSS decode blocks (the
    # one piece of sampler state not reconstructible from token history)
    mirostat_mu: Optional[float] = None


def _chunk_bucket(n: int, n_batch: int) -> int:
    """Pad a prompt tail chunk to the next power-of-two bucket (<= n_batch)
    instead of always the full n_batch: a prefix-cache hit that leaves a
    short tail then prefills ~tail tokens, not a full padded chunk (at
    most log2(n_batch) compiled shapes)."""
    b = 8
    while b < min(n, n_batch):
        b *= 2
    return min(b, n_batch)


@partial(jax.jit, static_argnums=(0, 6), donate_argnums=(5,))
def _prefill_slot(spec, params, ids, n_past, slot, cache, window=None):
    """Run a prompt chunk for one slot of the batched head-major
    [L, B, H_kv, S, D] cache: a B=1 batched forward over the slot's slice
    (the batched attention/write paths natively speak this layout), then
    DUS the updated slice back at the slot index."""
    quantized = cache.k_scale is not None
    slot_cache = KVCache(
        lax.dynamic_slice_in_dim(cache.k, slot, 1, axis=1),
        lax.dynamic_slice_in_dim(cache.v, slot, 1, axis=1),
        lax.dynamic_slice_in_dim(cache.k_scale, slot, 1, axis=1)
        if quantized else None,
        lax.dynamic_slice_in_dim(cache.v_scale, slot, 1, axis=1)
        if quantized else None,
    )
    logits, _, updated = forward_batched(
        spec, params, ids[None], n_past[None], slot_cache, window
    )
    logits = logits[0]
    new_k = lax.dynamic_update_slice(
        cache.k, updated.k, (0, slot, 0, 0, 0)
    )
    new_v = lax.dynamic_update_slice(
        cache.v, updated.v, (0, slot, 0, 0, 0)
    )
    if quantized:
        new_ks = lax.dynamic_update_slice(
            cache.k_scale, updated.k_scale, (0, slot, 0, 0)
        )
        new_vs = lax.dynamic_update_slice(
            cache.v_scale, updated.v_scale, (0, slot, 0, 0)
        )
        return logits, KVCache(new_k, new_v, new_ks, new_vs)
    return logits, KVCache(new_k, new_v)


@partial(jax.jit, static_argnums=(0, 4), donate_argnums=(5,))
def _decode_all(spec, params, ids, n_past, window, cache, write_mask):
    """One batched decode step: ids [B], n_past [B], cache [L, B, ...];
    dummy slots (write_mask False) never touch the cache."""
    logits, _, new_cache = forward_batched(
        spec, params, ids[:, None], n_past, cache, window, write_mask
    )
    return logits[:, 0, :], new_cache


class Engine:
    """Multi-stream decode engine over a shared immutable model."""

    # step_multi can gather sampled-token logprobs (+ top-N) on device, so
    # logprob requests ride the block path; engines whose multi-step
    # dispatch lacks the extra outputs override this with False
    supports_device_logprobs = True

    def __init__(
        self,
        model,
        max_streams: int = 8,
        kv_dtype=jnp.bfloat16,
        n_batch: int = 64,  # prefill chunk; TPU prefill scales ~linearly to 512
        mesh=None,
    ):
        self.model = model
        self.spec = model.spec
        self.max_streams = max_streams
        self.n_batch = n_batch
        self.mesh = mesh
        self.params = model.params
        self._init_device_state(kv_dtype, mesh)

        self.slots: list[Optional[_Stream]] = [None] * max_streams
        self.pending: list[_Stream] = []
        self.finished: dict[int, _Stream] = {}
        self._retired_events: list = []
        self._next_id = 0
        self._eot = model.eot_token_id()

    def _init_device_state(self, kv_dtype, mesh) -> None:
        """Allocate the KV store (dense slots here; PagedEngine overrides)."""
        cache = init_cache_batched(self.spec, self.max_streams, kv_dtype)
        if mesh is not None:
            from llm_tpu.parallel import shard_cache, shard_params

            self.params = shard_params(self.model.params, mesh)
            cache = shard_cache(cache, mesh, batched=True)
        self.cache = cache

    # -- submission ---------------------------------------------------------

    def submit(self, request: GenerationRequest) -> int:
        rid = self._next_id
        self._next_id += 1
        stream = _Stream(
            request_id=rid,
            request=request,
            sampler=request.sampler or default_samplers(),
            rng=np.random.default_rng(request.seed),
        )
        self.pending.append(stream)
        return rid

    def cancel(self, request_id: int) -> bool:
        """Abort a stream (client disconnect / server-side stop sequence):
        pending requests drop; slotted streams retire with reason
        "cancelled" and free their slot (and pages, for paged engines)."""
        for i, s in enumerate(self.pending):
            if s.request_id == request_id:
                self.pending.pop(i)
                self._retire(s, "cancelled")
                return True
        for slot, s in enumerate(self.slots):
            if s is not None and s.request_id == request_id:
                self._retire(s, "cancelled", slot=slot)
                return True
        return False

    @property
    def active(self) -> int:
        return sum(s is not None for s in self.slots)

    def _piece(self, stream: _Stream, tok: int) -> bytes:
        """Token bytes for callbacks; HF tokenizers re-decode and diff
        (the session's incremental rule, inference_session.rs:667-681)."""
        tokenizer = self.model.tokenizer
        if tokenizer.is_embedded:
            return tokenizer.token(tok)
        decoded = tokenizer.decode(stream.tokens, True)
        text = decoded.decode("utf-8", errors="replace")
        if text.endswith("�"):
            return b""
        out = decoded[stream.decoded_len :]
        stream.decoded_len = len(decoded)
        return out

    def has_work(self) -> bool:
        return bool(self.pending) or self.active > 0

    def _retire(self, stream: _Stream, reason: str, slot=None) -> None:
        """Finish a stream and queue its done-event for the next step()."""
        stream.done = True
        stream.finish_reason = reason
        self.finished[stream.request_id] = stream
        if slot is not None:
            self.slots[slot] = None
            self._on_slot_released(slot)
        self._retired_events.append((stream.request_id, "", True))

    def _on_slot_released(self, slot: int) -> None:
        pass  # PagedEngine releases the slot's pages here

    def _drain_retired(self) -> list:
        ev, self._retired_events = self._retired_events, []
        return ev

    def _host_sample(self, stream: _Stream) -> int:
        """Host-chain sampling for one stream, with the mirostat mu carry
        SYNCED both ways: a stream that usually decodes in device blocks
        (mu in stream.mirostat_mu) must not restart the surprise
        controller from scratch when a single-step fallback (tight pool /
        mixed batch / context boundary) routes one token through the host
        chain — and the host-updated mu must flow back so the next device
        block resumes from it."""
        from llm_tpu.samplers import Mirostat1, Mirostat2, SamplerChain

        t = (stream.sampler.terminal
             if isinstance(stream.sampler, SamplerChain) else stream.sampler)
        miro = t if isinstance(t, (Mirostat1, Mirostat2)) else None
        if miro is not None and stream.mirostat_mu is not None:
            miro.mu = stream.mirostat_mu
        tok = sample_token(
            stream.sampler, stream.rng, stream.tokens, stream.last_logits
        )
        if miro is not None and miro.mu is not None:
            stream.mirostat_mu = float(miro.mu)
        return tok

    def _record_logprob(self, stream: _Stream, tok: int) -> None:
        """Model logprob of the sampled token (from the PRE-update logits
        row it was sampled from) + optional top-N alternatives."""
        row = np.asarray(stream.last_logits, np.float32)
        m = float(row.max())
        logz = row - (m + np.log(np.exp(row - m).sum()))

        def tstr(t: int) -> str:
            return self.model.tokenizer.token(t).decode("utf-8",
                                                        errors="replace")

        entry = {"token": tstr(tok), "logprob": float(logz[tok])}
        n = stream.request.logprobs
        if n:
            top = np.argpartition(logz, -n)[-n:]
            top = top[np.argsort(logz[top])[::-1]]
            entry["top_logprobs"] = {
                tstr(int(t)): float(logz[int(t)]) for t in top
            }
        stream.logprob_data.append(entry)

    def _finish_token(self, slot: int, stream: _Stream, tok: int, logits_row):
        """Shared per-token postprocess: bookkeeping, EoT / max_tokens /
        context-full retirement. Returns the (request_id, text, done) event."""
        if stream.request.logprobs is not None and \
                stream.last_logits is not None:
            self._record_logprob(stream, tok)
        stream.tokens.append(tok)
        stream.n_past += 1
        stream.generated += 1
        stream.last_logits = logits_row

        text = ""
        done = False
        if tok == self._eot:
            done = True
            stream.finish_reason = "eot"
        else:
            out = stream.utf8.push(self._piece(stream, tok))
            if out:
                text = out
                stream.text.append(out)
                if stream.request.on_token:
                    stream.request.on_token(stream.request_id, out)
        limit = stream.request.max_tokens
        if not done and limit is not None and stream.generated >= limit:
            done = True
            stream.finish_reason = "max_tokens"
        if not done and stream.n_past + 1 >= self.spec.n_ctx:
            done = True
            stream.finish_reason = "context_full"
        if done:
            stream.done = True
            self.finished[stream.request_id] = stream
            self.slots[slot] = None
            self._on_slot_released(slot)
        return (stream.request_id, text, done)

    # -- scheduling ---------------------------------------------------------

    def _admit(self) -> None:
        """Assign pending requests to free slots (tokenize + validate only;
        the prompt itself advances chunk-by-chunk in _advance_prefills so a
        long admission never stalls running streams)."""
        for slot in range(self.max_streams):
            if self.slots[slot] is not None or not self.pending:
                continue
            stream = self.pending.pop(0)
            try:
                self._begin_prefill(stream, slot)
                self.slots[slot] = stream
            except ContextFull:
                self._on_slot_released(slot)
                self._retire(stream, "context_full")
            except Exception as e:  # noqa: BLE001 — e.g. untokenizable
                # prompt: a bad request must retire, not crash the engine
                # (and with it every other stream's server thread)
                self._on_slot_released(slot)
                self._retire(stream, f"error: {e}")

    def _begin_prefill(self, stream: _Stream, slot: int) -> None:
        prompt_tokens = Prompt.of(stream.request.prompt).to_tokens(
            self.model.tokenizer, True
        )
        if not prompt_tokens:
            # an empty TOKEN-list prompt gets no BOS from to_tokens; the
            # prefill would run an all-padding dummy chunk and the stream
            # would sample from garbage logits — retire it instead
            # (_admit converts this to an error event)
            raise ValueError("empty prompt")
        if len(prompt_tokens) >= self.spec.n_ctx:
            raise ContextFull()
        stream.tokens = list(prompt_tokens)
        if not self.model.tokenizer.is_embedded:
            # baseline for the incremental decode diff: the decoded prompt
            stream.decoded_len = len(
                self.model.tokenizer.decode(stream.tokens, True)
            )
        stream.prefill_queue = prompt_tokens
        stream.prefill_pos = 0
        stream.prefilling = True
        stream.n_past = 0

    def _advance_prefills(self) -> None:
        """Run ONE prompt chunk for every prefilling stream. A paged chunk
        that cannot get pages waits — unless every other slotted stream is
        also waiting (nobody will ever free pages), which would deadlock:
        then the stream retires with kv_oom."""
        for slot, stream in enumerate(self.slots):
            if stream is None or not stream.prefilling:
                continue
            try:
                self._prefill_chunk(stream, slot)
                stream.kv_wait = False
            except MemoryError:
                stream.kv_wait = True
                others = [
                    s for s2, s in enumerate(self.slots)
                    if s is not None and s2 != slot
                ]
                if not others or all(o.kv_wait for o in others):
                    self._retire(stream, "kv_oom", slot=slot)

    def _prefill_chunk(self, stream: _Stream, slot: int) -> None:
        spec = self.spec
        toks = stream.prefill_queue
        pos = stream.prefill_pos
        chunk = toks[pos : pos + self.n_batch]
        bucket = _chunk_bucket(len(chunk), self.n_batch)
        if pos + bucket > spec.n_ctx:  # context boundary: exact shape
            bucket = len(chunk)
        ids = np.zeros(bucket, np.int32)
        ids[: len(chunk)] = chunk
        logits, self.cache = _prefill_slot(
            spec, self.params, jnp.asarray(ids), jnp.int32(pos),
            slot, self.cache, window_bucket(pos, spec.n_ctx),
        )
        stream.prefill_pos = pos + len(chunk)
        stream.n_past = stream.prefill_pos
        # device-side row select: the full [chunk, V] logits are ~65 MB at
        # 7B/512 — one row is all the next sample needs
        stream.last_logits = np.asarray(logits[len(chunk) - 1])
        if stream.prefill_pos >= len(toks):
            stream.prefilling = False

    def _decodable(self) -> list[tuple[int, "_Stream"]]:
        return [
            (slot, s)
            for slot, s in enumerate(self.slots)
            if s is not None and not s.prefilling
        ]

    # -- decode -------------------------------------------------------------

    def step(self) -> list[tuple[int, str, bool]]:
        """Admit pending streams, advance prefills one chunk, run ONE
        batched decode step over the decode-ready streams, sample.

        Returns a list of (request_id, new_text, done).
        """
        self._admit()
        self._advance_prefills()
        events = self._drain_retired()
        decodable = self._decodable()
        if not decodable:
            return events

        spec = self.spec
        ids = np.zeros(self.max_streams, np.int32)
        n_past = np.zeros(self.max_streams, np.int32)
        # dummy rows (empty / mid-prefill slots) run with write_mask False:
        # they never touch the cache, so their n_past can stay 0
        mask = np.zeros(self.max_streams, bool)
        sampled: dict[int, int] = {}
        for slot, stream in decodable:
            tok = self._host_sample(stream)
            sampled[slot] = tok
            ids[slot] = tok
            n_past[slot] = stream.n_past
            mask[slot] = True

        max_past = int(n_past.max())
        logits_dev, self.cache = _decode_all(
            spec, self.params, jnp.asarray(ids), jnp.asarray(n_past),
            window_bucket(max_past, spec.n_ctx), self.cache,
            jnp.asarray(mask),
        )
        # jax dispatch is async: fire the sampled tokens' events BEFORE
        # forcing the result. The tokens were sampled from last_logits and
        # do not depend on this forward (it computes the NEXT step's
        # logits), so streaming clients receive token t while the device
        # is busy with t+1 — on a tunneled chip this removes a full
        # round-trip from TTFT (the warm-prefix path's dominant term).
        emitted = []
        for slot, tok in sampled.items():
            stream = self.slots[slot]
            emitted.append((slot, stream))
            events.append(
                self._finish_token(slot, stream, tok, stream.last_logits)
            )
        logits = np.asarray(logits_dev)
        for slot, stream in emitted:
            stream.last_logits = logits[slot]
        return events

    def step_multi(self, n_steps: int = 16) -> list[tuple[int, str, bool]]:
        """Run n_steps batched decode steps in ONE dispatch with on-device
        sampling (every active stream must carry a device_sampler; inactive
        slots decode garbage that is truncated on slot reuse).

        Host-side postprocessing truncates each stream at EoT / max_tokens /
        context boundary and rewinds its n_past (stale cache is masked).
        """
        self._admit()
        self._advance_prefills()
        retired = self._drain_retired()
        active = self._decodable()
        if not active:
            return retired
        spec = self.spec
        assert all(
            s.request.device_sampler is not None for _, s in active
        ), "step_multi requires device_sampler on every active stream"
        sampler = active[0][1].request.device_sampler
        if all(s.request.device_sampler == sampler for _, s in active):
            values = None  # one shared static config
        else:
            # heterogeneous per-stream sampling: static STRUCTURE + traced
            # per-slot values share one compiled loop (ops/sampling.py)
            from llm_tpu.ops.sampling import batched_sampler

            per_slot = [None] * self.max_streams
            for slot, s in active:
                per_slot[slot] = s.request.device_sampler
            try:
                sampler, values = batched_sampler(per_slot, self.max_streams)
            except ValueError:
                # a batch mixing mirostat 1 and 2 cannot share one block:
                # fall back to per-token sampling via each stream's HOST
                # chain for this step instead of wedging the engine loop
                # (the server always builds the matching host chain; direct
                # Engine users supply `sampler` alongside device_sampler)
                return retired + self.step()

        max_past = max(s.n_past for _, s in active)
        n_steps = min(n_steps, spec.n_ctx - 1 - max_past)
        if n_steps <= 0:
            # context-full streams are retired by the per-token path
            return retired + self.step()

        logits = np.zeros((self.max_streams, spec.n_vocab), np.float32)
        n_past = np.zeros(self.max_streams, np.int32)
        mask = np.zeros(self.max_streams, bool)
        for slot, s in active:
            logits[slot] = s.last_logits
            n_past[slot] = s.n_past
            mask[slot] = True

        # windowed penalties (repetition / freq / presence): state is
        # rebuilt from each stream's token history per dispatch and updated
        # on device inside the block
        pstate = None
        if any(s.request.device_sampler.has_penalties for _, s in active):
            from llm_tpu.ops.sampling import penalty_state

            hist = [[] for _ in range(self.max_streams)]
            for slot, s in active:
                hist[slot] = s.tokens
            pstate = penalty_state(
                hist, sampler.penalty_last_n, spec.n_vocab
            )

        # mirostat streams: thread the per-stream mu carry through the
        # block and persist it on the stream between blocks
        miro = any(s.request.device_sampler.mirostat for _, s in active)
        if miro:
            from llm_tpu.ops.sampling import collect_mu

            pstate = {
                **(pstate or {}),
                "mu": jnp.asarray(collect_mu(active, self.max_streams)),
            }

        # logprob requests: top-N gathered on device per step (the full
        # [B, V] rows never cross to the host)
        lp_reqs = [
            s.request.logprobs for _, s in active
            if s.request.logprobs is not None
        ]
        lpn = max(lp_reqs) if lp_reqs else None

        self._loop_key = jax.random.split(getattr(self, "_loop_key", jax.random.PRNGKey(0)))[0]
        dispatched = self._dispatch_multi(
            logits, n_past, n_steps, sampler, self._loop_key, values, mask,
            pstate, lpn, miro,
        )
        if dispatched is None:  # backend can't run a block now (e.g. paged
            return retired + self.step()  # pool too tight): single-step
        toks, last_logits, n_steps, lp, fstate = dispatched
        if fstate is not None:
            from llm_tpu.ops.sampling import store_mu

            store_mu(active, np.asarray(fstate["mu_steps"]),
                     self._block_keeps(active, toks))
        return retired + self._postprocess_multi(
            active, toks, last_logits, n_steps, lp
        )

    def _block_keeps(self, active, toks) -> dict:
        """Per-slot kept-token count for a decode block — the same
        truncation rule _postprocess_multi applies (EoT first, then the
        max_tokens budget); used to persist sampler carries (mirostat mu)
        at the truncation point rather than the block end."""
        keeps = {}
        n_steps = toks.shape[0]
        for slot, stream in active:
            col = toks[:, slot]
            hit = np.nonzero(col == self._eot)[0]
            n_keep = int(hit[0]) + 1 if hit.size else n_steps
            limit = stream.request.max_tokens
            if limit is not None:
                n_keep = min(n_keep, max(limit - stream.generated, 1))
            keeps[slot] = n_keep
        return keeps

    def _postprocess_multi(self, active, toks, last_logits, n_steps,
                           lp=None) -> list:
        """Host-side bookkeeping after an n_steps on-device decode block:
        per-stream truncation at EoT / max_tokens / context boundary,
        UTF-8 assembly, retirement, logprob records (when the block carried
        them). Shared with MultiHostEngine."""
        spec = self.spec

        def tstr(t: int) -> str:
            return self.model.tokenizer.token(t).decode(
                "utf-8", errors="replace"
            )

        events = []
        for slot, stream in active:
            col = toks[:, slot]
            hit = np.nonzero(col == self._eot)[0]
            limit = stream.request.max_tokens
            budget = (
                limit - stream.generated if limit is not None else n_steps
            )
            n_keep = int(hit[0]) + 1 if hit.size else n_steps
            done = False
            if hit.size and n_keep <= budget:
                done = True
                stream.finish_reason = "eot"
            if n_keep > budget:
                n_keep = budget
                done = True
                stream.finish_reason = "max_tokens"

            text_parts = []
            for i, t in enumerate(col[:n_keep]):
                t = int(t)
                if lp is not None and stream.request.logprobs is not None:
                    lpv, topv, topi = lp
                    entry = {"token": tstr(t),
                             "logprob": float(lpv[i, slot])}
                    n = stream.request.logprobs
                    if n:
                        entry["top_logprobs"] = {
                            tstr(int(topi[i, slot, j])):
                                float(topv[i, slot, j])
                            for j in range(n)
                        }
                    stream.logprob_data.append(entry)
                stream.tokens.append(t)
                stream.generated += 1
                if t != self._eot:
                    out = stream.utf8.push(self._piece(stream, t))
                    if out:
                        text_parts.append(out)
                        stream.text.append(out)
                        if stream.request.on_token:
                            stream.request.on_token(stream.request_id, out)
            stream.n_past += n_keep  # overshoot beyond n_keep stays masked
            stream.last_logits = last_logits[slot]
            if not done and stream.n_past + 1 >= spec.n_ctx:
                done = True
                stream.finish_reason = "context_full"
            if done:
                stream.done = True
                self.finished[stream.request_id] = stream
                self.slots[slot] = None
                self._on_slot_released(slot)
            events.append((stream.request_id, "".join(text_parts), done))
        return events

    def _dispatch_multi(self, logits, n_past, n_steps, sampler, key,
                        values=None, write_mask=None, penalty_state=None,
                        logprobs_n=None, return_state=False):
        """Run the n_steps on-device decode block; returns (toks [n_steps, B]
        np, last_logits [B, V] np, n_steps, logprob arrays or None, final
        sampler state or None) or None to fall back to single-stepping.
        Overridden by PagedEngine (page pre-allocation + paged loop)."""
        from llm_tpu.models.forward import decode_loop_batched

        spec = self.spec
        max_past = int(n_past.max())
        out = list(decode_loop_batched(
            spec,
            self.params,
            jnp.asarray(logits),
            jnp.asarray(n_past),
            self.cache,
            n_steps,
            window_bucket(max_past + n_steps, spec.n_ctx),
            sampler,
            key,
            values,
            jnp.asarray(write_mask) if write_mask is not None else None,
            penalty_state,
            logprobs_n,
            return_state,
        ))
        from llm_tpu.models.forward import unpack_decode_out

        toks, last_logits, _, self.cache, fstate, lp = unpack_decode_out(
            out, return_state, logprobs_n
        )
        if lp is not None:
            lp = tuple(np.asarray(a) for a in lp)
        return np.asarray(toks), np.asarray(last_logits), n_steps, lp, fstate

    # -- convenience --------------------------------------------------------

    def generate_all(
        self, requests: Sequence[GenerationRequest], n_steps: int = 1
    ) -> dict[int, str]:
        """Submit everything, run to completion, return id -> text.

        n_steps > 1 uses the multi-token on-device decode path (all requests
        need a shared device_sampler)."""
        ids = [self.submit(r) for r in requests]
        while self.has_work():
            if n_steps > 1:
                self.step_multi(n_steps)
            else:
                self.step()
        return {rid: "".join(self.finished[rid].text) for rid in ids}


def throughput_stats(engine: Engine, requests):
    """Run `requests` to completion, returning (texts, tokens/s aggregate over
    exactly these requests)."""
    t0 = time.monotonic()
    before = set(engine.finished)
    texts = engine.generate_all(requests)
    dt = time.monotonic() - t0
    total = sum(
        s.generated for rid, s in engine.finished.items() if rid not in before
    )
    return texts, total / dt if dt > 0 else 0.0
