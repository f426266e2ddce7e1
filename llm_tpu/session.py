"""InferenceSession: KV cache + decode loop + perplexity + snapshots.

The runtime contract of the reference's InferenceSession
(/root/reference/crates/llm-base/src/inference_session.rs), rebuilt around
two jitted entry points (chunked prefill and single-token decode,
models/forward.py) instead of a per-token graph rebuild:

- feed_prompt: chunks of n_batch (=8 default), ContextFull guard
  (inference_session.rs:298-350); chunks are padded up to the n_batch bucket
  so the whole prompt runs in ONE compiled shape (padding beyond n_past is
  masked and later overwritten, so it is invisible).
- infer_next_token: sample -> push -> evaluate -> EndOfText on EoT
  (inference_session.rs:381-424).
- rewind: pop tokens + decrement n_past; the cache needs no invalidation
  because entries are indexed by absolute position (inference_session.rs:353-377).
- perplexity: chunked NLL, BOS-substituted first token, scores positions
  >= min(512, ctx/2) (inference_session.rs:519-589). Unlike the reference—
  which keeps accumulating n_past across chunks—each chunk correctly
  restarts the context window at 0, matching the llama.cpp perplexity
  example the reference cites.
- snapshot get/restore with KV byte-size validation
  (inference_session.rs:599-646).
"""

from __future__ import annotations

import enum
import time
from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence, Union

import jax.numpy as jnp
import numpy as np

from llm_tpu.models.forward import (
    KVCache,
    forward_step,
    init_cache,
    window_bucket,
)
from llm_tpu.samplers import SamplerChain, default_samplers, sample_token
from llm_tpu.tokenizer import Prompt, TokenUtf8Buffer
from llm_tpu import trace

TokenId = int


# ---------------------------------------------------------------------------
# errors (inference_session.rs:683-731)


class InferenceError(Exception):
    pass


class ContextFull(InferenceError):
    def __init__(self):
        super().__init__("the context window is full")


class EndOfText(InferenceError):
    def __init__(self):
        super().__init__("reached end of text")


class UserCallbackError(InferenceError):
    pass


class RewindError(Exception):
    pass


class UnsupportedArchitecture(RewindError):
    def __init__(self):
        super().__init__(
            "this model architecture does not support rewinding"
        )


class NotEnoughTokens(RewindError):
    def __init__(self):
        super().__init__("cannot rewind more tokens than have been processed")


class SnapshotError(Exception):
    pass


# ---------------------------------------------------------------------------
# configs (inference_session.rs:799-922)


class ModelKVMemoryType(enum.Enum):
    """F16 maps to bfloat16 on TPU (the hardware-native 16-bit float);
    Int8 is a TPU-native extension: per-(position, head) amax-scaled int8
    codes, halving cache memory and HBM traffic."""

    Float16 = "f16"
    Float32 = "f32"
    Int8 = "q8"

    @property
    def dtype(self):
        if self is ModelKVMemoryType.Float16:
            return jnp.bfloat16
        if self is ModelKVMemoryType.Int8:
            return "int8"
        return jnp.float32


@dataclass
class InferenceSessionConfig:
    memory_k_type: ModelKVMemoryType = ModelKVMemoryType.Float16
    memory_v_type: ModelKVMemoryType = ModelKVMemoryType.Float16
    n_batch: int = 8
    n_threads: int = 8  # accepted for parity; XLA owns intra-chip parallelism


@dataclass
class InferenceParameters:
    sampler: SamplerChain = field(default_factory=default_samplers)


@dataclass
class InferenceRequest:
    prompt: Union[str, Sequence[TokenId], Prompt]
    parameters: Optional[InferenceParameters] = None
    play_back_previous_tokens: bool = False
    maximum_token_count: Optional[int] = None


@dataclass
class OutputRequest:
    """(model/mod.rs:256-266)"""

    all_logits: Optional[list] = None
    embeddings: Optional[list] = None


@dataclass
class InferenceStats:
    feed_prompt_duration: float = 0.0  # seconds
    prompt_tokens: int = 0
    predict_duration: float = 0.0
    predict_tokens: int = 0

    def __str__(self) -> str:
        per_token = (
            self.predict_duration * 1000.0 / self.predict_tokens
            if self.predict_tokens
            else 0.0
        )
        return (
            f"feed_prompt_duration: {int(self.feed_prompt_duration * 1000)}ms\n"
            f"prompt_tokens: {self.prompt_tokens}\n"
            f"predict_duration: {int(self.predict_duration * 1000)}ms\n"
            f"predict_tokens: {self.predict_tokens}\n"
            f"per_token_duration: {per_token:.3f}ms"
        )


class InferenceFeedback(enum.Enum):
    Continue = 0
    Halt = 1


@dataclass
class InferenceResponse:
    """kind in {prompt_token, inferred_token, snapshot_token, eot_token}."""

    kind: str
    text: str = ""


@dataclass
class InferenceSnapshot:
    """(inference_session.rs:741-792): n_past + config + tokens +
    last_logits + raw KV bytes."""

    npast: int
    config: InferenceSessionConfig
    tokens: list
    last_logits: np.ndarray
    memory_k: bytes
    memory_v: bytes
    k_shape: tuple
    v_shape: tuple
    k_dtype: str
    v_dtype: str
    # int8 KV caches carry per-(position, head) scales
    memory_k_scale: Optional[bytes] = None
    memory_v_scale: Optional[bytes] = None
    scale_shape: Optional[tuple] = None


# ---------------------------------------------------------------------------


class InferenceSession:
    """Single-stream decode session. Like the reference's (Send, !Sync):
    one thread at a time; any number of sessions may share one Model."""

    def __init__(self, model, config: Optional[InferenceSessionConfig] = None):
        self.model = model
        self.config = config or InferenceSessionConfig()
        kv_dtype = self.config.memory_k_type.dtype
        self.cache: KVCache = init_cache(model.spec, kv_dtype)
        self.n_past: int = 0
        self.tokens: list[TokenId] = []
        self.decoded_tokens: bytearray = bytearray()
        self.last_logits: np.ndarray = np.zeros(model.spec.n_vocab, np.float32)

    # -- evaluation ---------------------------------------------------------

    def _evaluate(
        self, batch: Sequence[TokenId], output_request: Optional[OutputRequest]
    ) -> None:
        """Run `batch` through the model at n_past; update logits/cache.

        Pads to the n_batch bucket so every prompt chunk reuses one compiled
        shape; an exact-shape fallback is used near the context boundary
        (padding there would make dynamic_update_slice clamp the write start
        and clobber live cache entries).
        """
        spec = self.model.spec
        n = len(batch)
        _span = trace.span(f"evaluate[{n}]", level=2)
        _span.__enter__()
        bucket = 1 if n == 1 else self.config.n_batch
        if n > bucket:
            bucket = n
        if self.n_past + bucket > spec.n_ctx:
            bucket = n
        ids = np.zeros(bucket, dtype=np.int32)
        ids[:n] = np.asarray(batch, dtype=np.int32)

        logits, hidden, self.cache = forward_step(
            spec,
            self.model.params,
            jnp.asarray(ids),
            jnp.int32(self.n_past),
            self.cache,
            window_bucket(self.n_past, spec.n_ctx),
        )
        # fetch only what the caller needs: the full [bucket, V] logits of
        # a prompt chunk are ~65 MB at 7B/512 — pulling them through the
        # host link to use one row measured ~1.4 s per chunk on the axon
        # tunnel (the device compute itself is ~110 ms)
        want_all = output_request is not None and (
            output_request.all_logits is not None
        )
        if want_all:
            logits = np.asarray(logits)[:n]
            self.last_logits = logits[-1]
        else:
            self.last_logits = np.asarray(logits[n - 1])
        _span.__exit__(None, None, None)
        self.n_past += n
        if output_request is not None:
            if want_all:
                output_request.all_logits.extend(logits.reshape(-1).tolist())
            if output_request.embeddings is not None:
                output_request.embeddings.extend(
                    np.asarray(hidden[:n]).reshape(-1).tolist()
                )

    # -- the reference API --------------------------------------------------

    def feed_prompt(
        self,
        prompt: Union[str, Sequence[TokenId], Prompt],
        output_request: Optional[OutputRequest] = None,
        callback: Optional[Callable[[bytes], Optional[InferenceFeedback]]] = None,
    ) -> None:
        model = self.model
        beginning_of_sentence = self.n_past == 0
        prompt_tokens = Prompt.of(prompt).to_tokens(
            model.tokenizer, beginning_of_sentence
        )

        if self.n_past + len(prompt_tokens) >= model.context_size:
            raise ContextFull()

        bot = model.bot_token_id()
        halted = False
        for start in range(0, len(prompt_tokens), self.config.n_batch):
            if halted:
                break
            chunk = prompt_tokens[start : start + self.config.n_batch]
            self._evaluate(chunk, output_request)
            for tk in chunk:
                token = self._decode_incremental(tk)
                if callback is not None and tk != bot:
                    fb = callback(bytes(token))
                    if fb is InferenceFeedback.Halt:
                        halted = True
                        break
                self.tokens.append(tk)
                self.decoded_tokens.extend(token)

    def _decode_incremental(self, tk: TokenId) -> bytes:
        """Token bytes for callbacks BEFORE tk is appended to self.tokens;
        HF tokenizers re-decode the whole sequence and diff
        (inference_session.rs:667-681, U+FFFD guard). ONE implementation
        of the diff rule: _decode_token_bytes is the already-appended
        variant."""
        return self._diff_decode([*self.tokens, tk], tk)

    def _diff_decode(self, all_ids, tk: TokenId) -> bytes:
        tokenizer = self.model.tokenizer
        if tokenizer.is_embedded:
            return tokenizer.token(tk)
        all_tokens = tokenizer.decode(all_ids, True)
        text = all_tokens.decode("utf-8", errors="replace")
        if text.endswith("�"):
            return b""
        return all_tokens[len(self.decoded_tokens) :]

    def rewind(self, num: int) -> list[TokenId]:
        if not self.model.supports_rewind:
            raise UnsupportedArchitecture()
        if num >= self.n_past:
            raise NotEnoughTokens()
        deleted = self.tokens[len(self.tokens) - num :]
        del self.tokens[len(self.tokens) - num :]
        tokenizer = self.model.tokenizer
        if tokenizer.is_embedded:
            # decoded_tokens was built from token() bytes: the sum is exact
            # (this is the reference's rule, inference_session.rs:369-372)
            removed_len = sum(len(tokenizer.token(t)) for t in deleted)
            del self.decoded_tokens[len(self.decoded_tokens) - removed_len :]
        else:
            # diff-decoded (HF/BPE) baselines: standalone token() lengths
            # do NOT equal the appended diff bytes (leading-space merges,
            # U+FFFD holdbacks), so the reference's sum would misalign the
            # incremental decode forever — recompute the baseline instead
            # (documented deviation; the reference only exercises rewind
            # with embedded tokenizers in its Delete tests)
            self.decoded_tokens = bytearray(tokenizer.decode(self.tokens, True))
        self.n_past -= num
        return deleted

    def infer_next_token(
        self,
        rng: np.random.Generator,
        params: Optional[InferenceParameters] = None,
        output_request: Optional[OutputRequest] = None,
    ) -> bytes:
        model = self.model
        if self.n_past + 1 >= model.context_size:
            raise ContextFull()
        sampler = (params or InferenceParameters()).sampler
        next_token = sample_token(sampler, rng, self.tokens, self.last_logits)

        self.tokens.append(next_token)
        self._evaluate([next_token], output_request)

        if next_token == model.eot_token_id():
            raise EndOfText()
        res = self._decode_token_bytes(next_token)
        self.decoded_tokens.extend(res)
        return bytes(res)

    def _decode_token_bytes(self, tk: TokenId) -> bytes:
        """Variant of _decode_incremental for a token ALREADY appended to
        self.tokens."""
        return self._diff_decode(self.tokens, tk)

    def infer(
        self,
        request: InferenceRequest,
        rng: Optional[np.random.Generator] = None,
        callback: Optional[
            Callable[[InferenceResponse], Optional[InferenceFeedback]]
        ] = None,
        output_request: Optional[OutputRequest] = None,
    ) -> InferenceStats:
        rng = rng or np.random.default_rng()
        callback = callback or (lambda r: InferenceFeedback.Continue)
        maximum_token_count = (
            request.maximum_token_count
            if request.maximum_token_count is not None
            else 2**63
        )

        if request.play_back_previous_tokens:
            buf = TokenUtf8Buffer()
            for tid in self.tokens:
                text = buf.push(self.model.tokenizer.token(tid))
                if text is not None:
                    if callback(
                        InferenceResponse("snapshot_token", text)
                    ) is InferenceFeedback.Halt:
                        break

        stats = InferenceStats()
        start_at = time.monotonic()
        params = request.parameters or InferenceParameters()

        prompt = Prompt.of(request.prompt)
        if not prompt.is_empty():
            def feed_cb(token_bytes: bytes):
                buf_text = token_bytes.decode("utf-8", errors="replace")
                return callback(InferenceResponse("prompt_token", buf_text))

            # a Halt during prompt feeding stops the FEED only; generation
            # still proceeds, exactly like the reference (feed_prompt
            # returns Ok on `break 'outer`, inference_session.rs:337-339,
            # and infer() continues into the decode loop at :481)
            self.feed_prompt(prompt, output_request, feed_cb)

        stats.feed_prompt_duration = time.monotonic() - start_at
        stats.prompt_tokens = self.n_past

        tokens_processed = 0
        buf = TokenUtf8Buffer()
        while tokens_processed < maximum_token_count:
            try:
                token = self.infer_next_token(rng, params)
            except EndOfText:
                break
            text = buf.push(token)
            if text is not None:
                if callback(
                    InferenceResponse("inferred_token", text)
                ) is InferenceFeedback.Halt:
                    break
            tokens_processed += 1

        stats.predict_duration = time.monotonic() - start_at
        stats.predict_tokens = self.n_past
        return stats

    def infer_device(
        self,
        prompt: Union[str, Sequence[TokenId], Prompt],
        maximum_token_count: int,
        sampler=None,  # ops.sampling.DeviceSampler; None = greedy
        n_steps: int = 32,
        seed: int = 0,
        callback: Optional[Callable[[str], None]] = None,
        halt_on_eot: bool = True,
    ) -> InferenceStats:
        """Generate with ON-DEVICE sampling: n_steps tokens per dispatch.

        2x+ faster than `infer` on high-latency links (one host round trip
        per n_steps tokens instead of per token). Covers the full default
        chain on device: greedy / temperature / top-k / top-p / min-p /
        tail-free / locally-typical / top-a / flat-bias, the windowed
        repetition / frequency / presence penalties, and the mirostat 1/2
        terminals (mu persists on the session across blocks). `infer`
        remains for custom host sampler chains (e.g. SeqRepetition).

        `halt_on_eot=False` keeps generating through EoT tokens — the CLI
        sets it when --ignore-eos (or a -inf EoT bias) is in effect, matching
        the host path where the bias makes EoT unsampleable.
        """
        import jax

        from llm_tpu.models.forward import decode_loop, window_bucket

        model = self.model
        spec = model.spec
        stats = InferenceStats()
        start_at = time.monotonic()

        p = Prompt.of(prompt)
        if not p.is_empty():
            self.feed_prompt(p)
        stats.feed_prompt_duration = time.monotonic() - start_at
        stats.prompt_tokens = self.n_past

        eot = model.eot_token_id()
        key = jax.random.PRNGKey(seed)
        buf = TokenUtf8Buffer()
        remaining = maximum_token_count
        while remaining > 0:
            steps = min(n_steps, remaining, spec.n_ctx - 1 - self.n_past)
            if steps <= 0:
                break
            window = window_bucket(self.n_past + steps, spec.n_ctx)
            key, sub = jax.random.split(key)
            pstate = None
            if sampler is not None and sampler.has_penalties:
                # windowed repetition/freq/presence penalties: per-block
                # state from the session history, updated on device
                from llm_tpu.ops.sampling import penalty_state

                st = penalty_state(
                    [self.tokens], sampler.penalty_last_n, spec.n_vocab
                )
                pstate = jax.tree.map(lambda a: a[0], st)
            miro = sampler is not None and sampler.mirostat != 0
            if miro:
                # mirostat terminal: mu persists on the session across
                # blocks and calls WITH THE SAME SAMPLER (like the host
                # Mirostat dataclasses); a different sampler starts fresh
                # at 2*tau rather than inheriting a stale carry
                from llm_tpu.ops.sampling import mirostat_mu_init

                if (getattr(self, "_mirostat_mu", None) is None
                        or getattr(self, "_mirostat_sampler", None)
                        != sampler):
                    self._mirostat_mu = mirostat_mu_init(sampler)
                    self._mirostat_sampler = sampler
                pstate = {
                    **(pstate or {}),
                    "mu": jnp.float32(self._mirostat_mu),
                }
            out = decode_loop(
                spec,
                model.params,
                jnp.asarray(self.last_logits),
                jnp.int32(self.n_past),
                self.cache,
                steps,
                window,
                sampler,
                sub,
                pstate,
                return_state=miro,
            )
            if miro:
                toks, logits, _, self.cache, fstate = out
            else:
                toks, logits, _, self.cache = out
            toks = np.asarray(toks)
            hit = np.nonzero(toks == eot)[0] if halt_on_eot else np.array([])
            n_keep = int(hit[0]) + 1 if hit.size else steps
            if miro:
                # persist mu AT THE TRUNCATION POINT: the block-final mu
                # folds in surprises of discarded overshoot tokens, which
                # would permanently skew the carry (advisor r4)
                self._mirostat_mu = float(
                    np.asarray(fstate["mu_steps"])[n_keep - 1]
                )
            for t in toks[:n_keep]:
                t = int(t)
                self.tokens.append(t)
                # same incremental rule as infer(): HF tokenizers re-decode
                # the whole sequence and diff (inference_session.rs:667-681)
                piece = self._decode_token_bytes(t)
                self.decoded_tokens.extend(piece)
                if t != eot:
                    text = buf.push(piece)
                    if text and callback:
                        callback(text)
            self.n_past += n_keep
            remaining -= n_keep
            if hit.size and n_keep < steps:
                # EoT mid-block: decode_loop's final logits are for the end
                # of the block, not the truncation point — recompute them by
                # re-evaluating the last kept token (cache rewrite of the
                # same values; entries beyond n_past stay masked).
                self.n_past -= 1
                self._evaluate([int(toks[n_keep - 1])], None)
                break
            self.last_logits = np.asarray(logits)
            if hit.size:
                break

        stats.predict_duration = time.monotonic() - start_at
        stats.predict_tokens = self.n_past
        return stats

    def perplexity(
        self,
        prompt: Union[str, Sequence[TokenId], Prompt],
        callback: Callable[[int, float], None],
    ) -> None:
        from llm_tpu.models.forward import nll_step

        model = self.model
        spec = model.spec
        tokens = np.asarray(
            Prompt.of(prompt).to_tokens(model.tokenizer, True), np.int32
        )

        context_size = model.context_size
        n_chunk = len(tokens) // context_size
        first = min(512, context_size // 2)  # first scored position
        # Device sub-chunk length: large enough to amortize dispatch and
        # keep the MXU busy, small enough to bound the materialized
        # attention scores/logits (wikitext-2 at 7B was minutes of pure
        # Python with the old host-softmax path; see VERDICT round 1).
        C = min(512, context_size)
        bot = model.bot_token_id()
        bos = bot if bot is not None else 1

        count = 0
        nll = 0.0

        for i in range(n_chunk):
            start = i * context_size
            chunk = tokens[start : start + context_size].copy()
            chunk[0] = bos  # BOS substitution (inference_session.rs:561)
            # logit row j predicts tokens[start + j + 1]; the final row has
            # no target inside the chunk (never scored: j <= ctx - 2)
            targets = np.zeros(context_size, np.int32)
            targets[:-1] = tokens[start + 1 : start + context_size]

            self.n_past = 0  # each chunk restarts the context window
            chunk_nll = []
            for p in range(0, context_size, C):
                c = min(C, context_size - p)
                pos = p + np.arange(c)
                valid = (pos >= first) & (pos <= context_size - 2)
                # fixed full-context window: ONE compilation for the whole
                # corpus (window buckets would compile len(ctx)/512 variants
                # of the T=512 graph — minutes each at 7B on this chip;
                # the extra masked cache reads are negligible next to the
                # weight stream)
                s, self.cache = nll_step(
                    spec,
                    model.params,
                    jnp.asarray(chunk[p : p + c]),
                    jnp.asarray(targets[p : p + c]),
                    jnp.asarray(valid),
                    jnp.int32(self.n_past),
                    self.cache,
                    spec.n_ctx,
                )
                chunk_nll.append(s)
                self.n_past += c

            nll += float(sum(chunk_nll))  # one scalar transfer per chunk
            count += context_size - 1 - first
            callback(i, float(np.exp(nll / count)))

    # -- snapshots ----------------------------------------------------------

    def get_snapshot(self) -> InferenceSnapshot:
        k = np.asarray(self.cache.k)
        v = np.asarray(self.cache.v)
        ks = (
            np.asarray(self.cache.k_scale)
            if self.cache.k_scale is not None
            else None
        )
        vs = (
            np.asarray(self.cache.v_scale)
            if self.cache.v_scale is not None
            else None
        )
        return InferenceSnapshot(
            npast=self.n_past,
            config=self.config,
            tokens=list(self.tokens),
            last_logits=self.last_logits.copy(),
            memory_k=k.tobytes(),
            memory_v=v.tobytes(),
            k_shape=k.shape,
            v_shape=v.shape,
            k_dtype=str(k.dtype),
            v_dtype=str(v.dtype),
            memory_k_scale=ks.tobytes() if ks is not None else None,
            memory_v_scale=vs.tobytes() if vs is not None else None,
            scale_shape=ks.shape if ks is not None else None,
        )

    @classmethod
    def from_snapshot(cls, snapshot: InferenceSnapshot, model) -> "InferenceSession":
        session = cls(model, snapshot.config)
        k = np.asarray(session.cache.k)
        if len(snapshot.memory_k) != k.nbytes or len(snapshot.memory_v) != np.asarray(
            session.cache.v
        ).nbytes:
            raise SnapshotError(
                "snapshot KV memory size does not match this model/config"
            )
        if tuple(snapshot.k_shape) != tuple(k.shape):
            # same byte count but a different layout (e.g. a pre-round-4
            # position-major [L, S, H, D] snapshot): reshaping would silently
            # transpose the cache — reject instead
            raise SnapshotError(
                f"snapshot KV layout {tuple(snapshot.k_shape)} does not match "
                f"this build's cache layout {tuple(k.shape)}"
            )
        kk = np.frombuffer(snapshot.memory_k, dtype=snapshot.k_dtype).reshape(
            snapshot.k_shape
        )
        vv = np.frombuffer(snapshot.memory_v, dtype=snapshot.v_dtype).reshape(
            snapshot.v_shape
        )
        ks = vs = None
        if snapshot.memory_k_scale is not None:
            ks = jnp.asarray(
                np.frombuffer(snapshot.memory_k_scale, np.float32).reshape(
                    snapshot.scale_shape
                )
            )
            vs = jnp.asarray(
                np.frombuffer(snapshot.memory_v_scale, np.float32).reshape(
                    snapshot.scale_shape
                )
            )
        session.cache = KVCache(jnp.asarray(kk), jnp.asarray(vv), ks, vs)
        session.n_past = snapshot.npast
        session.tokens = list(snapshot.tokens)
        session.last_logits = np.asarray(snapshot.last_logits, np.float32)
        session.decoded_tokens = bytearray(
            b"".join(model.tokenizer.token(t) for t in session.tokens)
            if model.tokenizer.is_embedded
            else model.tokenizer.decode(session.tokens, True)
        )
        return session


# ---------------------------------------------------------------------------
# callback helpers (inference_session.rs:948-993)


def feed_prompt_callback(callback):
    """Adapt an InferenceResponse callback for feed_prompt."""

    def inner(token_bytes: bytes):
        text = token_bytes.decode("utf-8", errors="replace")
        return callback(InferenceResponse("prompt_token", text))

    return inner


def conversation_inference_callback(stop_sequence: str, on_token):
    """Stream tokens until the stop sequence (message prefix) appears."""
    buf = [""]

    def inner(resp: InferenceResponse):
        if resp.kind != "inferred_token":
            return InferenceFeedback.Continue
        text = buf[0] + resp.text
        if text.startswith(stop_sequence):
            buf[0] = ""
            return InferenceFeedback.Halt
        if stop_sequence.startswith(text):
            buf[0] = text
            return InferenceFeedback.Continue
        buf[0] = ""
        on_token(text)
        return InferenceFeedback.Continue

    return inner
