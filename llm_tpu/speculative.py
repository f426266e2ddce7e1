"""Speculative decoding: a small draft model proposes, the target verifies.

Nothing like this exists in the reference (single model, token-at-a-time —
inference_session.rs:381-424), but it maps perfectly onto this framework's
two-jit design and the masked-overshoot property of the KV cache:

- the DRAFT model runs k cheap decode steps on device (`decode_loop`),
- the TARGET model scores all k proposals in ONE T=k forward (prefill-
  shaped — the MXU-efficient shape, instead of k bandwidth-bound T=1
  steps),
- the longest matching prefix is accepted plus one bonus token from the
  target's own distribution, and both caches "rewind" for free: entries
  beyond n_past are masked, so rejected positions are simply overwritten
  by the next iteration (the same property the reference's rewind relies
  on, inference_session.rs:353-377).

Two modes, both distribution-exact:
- `SpeculativeSession` (greedy): acceptance compares argmax, so the
  output is the target model's greedy generation (tested with an
  arbitrary draft) — the draft only changes the speed, never the text.
  Caveat: "greedy-equal" is exact at the argmax level; on TPU the T=k
  verify forward reduces bf16 matmuls in a different order than a T=1
  step, so logits that are within rounding of a tie CAN flip argmax
  relative to plain token-at-a-time decoding (the f32 CPU path is
  bit-identical and is what the equality test pins).
- `SampledSpeculativeSession` (temperature/top-k): proposals are
  accepted with probability min(1, p/q) and rejections resample from
  normalize(max(p - q, 0)) — the rejection-sampling identity makes the
  output distribution exactly the target's sampling distribution.

Per accepted token the target streams its weights 1/(n_accepted+1)
times instead of once.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from llm_tpu.models.forward import (
    forward_step,
    init_cache,
    window_bucket,
)


class SpeculativeSession:
    """Greedy speculative decoding over a (target, draft) model pair.

    Both models must share a tokenizer/vocabulary (the usual setup: a
    quantized small model of the same family as the target).
    """

    def __init__(self, target, draft, k: int = 4, kv_dtype=jnp.bfloat16,
                 n_batch: int = 512):
        assert target.spec.n_vocab == draft.spec.n_vocab, (
            "draft and target must share a vocabulary"
        )
        self.target = target
        self.draft = draft
        self.k = k
        self.n_batch = n_batch
        self.t_cache = init_cache(target.spec, kv_dtype)
        self.d_cache = init_cache(draft.spec, kv_dtype)
        self.n_past = 0
        self.tokens: list[int] = []
        self.last_logits: Optional[np.ndarray] = None  # target's, at head
        self.accepted = 0  # drafted tokens accepted (telemetry)
        self.drafted = 0

    def _window(self, extra: int) -> int:
        return window_bucket(self.n_past + extra, self.target.spec.n_ctx)

    def feed_prompt(self, tokens) -> None:
        """Feed the prompt in fixed n_batch-bucketed chunks (the same
        scheme as session._evaluate) so every prompt length reuses one
        compiled (T=n_batch) graph per model instead of compiling a fresh
        T=len(prompt) graph — and the attention scores stay chunk-sized."""
        toks = [int(t) for t in tokens]
        spec_t, spec_d = self.target.spec, self.draft.spec
        ctx = min(spec_t.n_ctx, spec_d.n_ctx)
        if self.n_past + len(toks) >= ctx:
            # same guard as InferenceSession.feed_prompt
            # (inference_session.rs:311-313): without it the clamped
            # dynamic_update_slice writes would silently clobber live KV
            from llm_tpu.session import ContextFull

            raise ContextFull()
        for start in range(0, len(toks), self.n_batch):
            chunk = toks[start : start + self.n_batch]
            n = len(chunk)
            # pad to the bucket, except near the context boundary where
            # dynamic_update_slice would clamp and clobber live entries
            bucket = 1 if n == 1 else self.n_batch
            if self.n_past + bucket > ctx:
                bucket = n
            ids = np.zeros(bucket, np.int32)
            ids[:n] = chunk
            ids_j = jnp.asarray(ids)
            tl, _, self.t_cache = forward_step(
                spec_t, self.target.params, ids_j,
                jnp.int32(self.n_past), self.t_cache,
                window_bucket(self.n_past, spec_t.n_ctx),
            )
            dl, _, self.d_cache = forward_step(
                spec_d, self.draft.params, ids_j,
                jnp.int32(self.n_past), self.d_cache,
                window_bucket(self.n_past, spec_d.n_ctx),
            )
            self.n_past += n
            self.tokens.extend(chunk)
            self.last_logits = np.asarray(tl)[n - 1]
            self._draft_logits = np.asarray(dl)[n - 1]

    def generate(
        self,
        max_tokens: int,
        callback: Optional[Callable[[int], None]] = None,
    ) -> list[int]:
        """Greedy-generate up to max_tokens (stops at the target's EoT).
        Returns the generated token ids; output matches plain greedy
        decoding of the target model (exactly, up to argmax ties under
        bf16 reduction-order differences — see module docstring)."""
        from llm_tpu.models.forward import decode_loop
        from llm_tpu.ops.sampling import DeviceSampler

        spec_t, spec_d = self.target.spec, self.draft.spec
        eot = self.target.eot_token_id()
        out: list[int] = []

        while len(out) < max_tokens:
            k = min(self.k, max_tokens - len(out),
                    spec_t.n_ctx - 1 - self.n_past)
            if k <= 0:
                break
            w = self._window(k + 1)
            # 1. draft proposes k tokens (chained from the TARGET's current
            # logits, so proposal 0 is the draft's guess at the target's
            # next token)
            toks, d_logits, _, self.d_cache = decode_loop(
                spec_d, self.draft.params,
                jnp.asarray(self.last_logits, jnp.float32),
                jnp.int32(self.n_past), self.d_cache, k, w,
                DeviceSampler.greedy(),
            )
            proposals = np.asarray(toks)  # [k]

            # 2. target scores all k proposals in one T=k forward
            t_logits, _, self.t_cache = forward_step(
                spec_t, self.target.params, jnp.asarray(proposals),
                jnp.int32(self.n_past), self.t_cache, w,
            )
            t_logits = np.asarray(t_logits)  # [k, V]

            # 3. accept the longest prefix where the target agrees.
            # target's prediction for position i is argmax of logits BEFORE
            # consuming proposal i: last_logits for i=0, t_logits[i-1] after
            prev = self.last_logits
            n_acc = 0
            for i in range(k):
                want = int(np.argmax(prev))
                if int(proposals[i]) != want:
                    break
                n_acc += 1
                prev = t_logits[i]
                if want == eot:
                    break
            self.drafted += k
            self.accepted += n_acc

            # 4. emit accepted tokens + one bonus/correction token from the
            # target's own logits at the divergence point
            emitted = [int(p) for p in proposals[:n_acc]]
            hit_eot = bool(emitted and emitted[-1] == eot)
            if not hit_eot and len(out) + n_acc < max_tokens:
                bonus = int(np.argmax(prev))
                emitted.append(bonus)
                hit_eot = bonus == eot
            if not emitted:
                break

            # 5. advance both caches: positions beyond n_past stay masked,
            # so the rejected tail needs no cleanup — but the BONUS token
            # (and any correction) was never evaluated; re-evaluate it so
            # last_logits reflects the full emitted sequence
            n_keep = len(emitted)
            self.n_past += n_acc
            self.tokens.extend(emitted)
            out.extend(emitted)
            if callback:
                for t in emitted:
                    callback(t)
            if hit_eot:
                break
            if n_keep > n_acc:  # bonus token: evaluate it in both models
                ids = jnp.asarray([emitted[-1]], jnp.int32)
                tl, _, self.t_cache = forward_step(
                    spec_t, self.target.params, ids,
                    jnp.int32(self.n_past), self.t_cache, w,
                )
                dl, _, self.d_cache = forward_step(
                    spec_d, self.draft.params, ids,
                    jnp.int32(self.n_past), self.d_cache, w,
                )
                self.n_past += 1
                self.last_logits = np.asarray(tl)[-1]
            else:
                # all k accepted, no bonus (budget): target logits at the
                # last accepted position are the new head
                self.last_logits = prev
        return out

    @property
    def acceptance_rate(self) -> float:
        return self.accepted / self.drafted if self.drafted else 0.0


# ---------------------------------------------------------------------------
# sampled speculative decoding (rejection sampling; Leviathan et al. 2022)


def _softmax64(x: np.ndarray) -> np.ndarray:
    z = x - x[np.isfinite(x)].max()
    p = np.exp(z)
    return p / p.sum()


def _sampling_probs(logits: np.ndarray, temperature: float, top_k: int,
                    top_p: float = 1.0, min_p: float = 0.0, bias=()):
    """The target/draft sampling transform as probabilities, mirroring
    ops/sampling.device_sample's 'sample' kind EXACTLY (the acceptance
    identity requires q to be the distribution proposals were actually
    drawn from): flat bias, then truncations on the raw logits (top-k,
    then top-p on the truncated softmax with boundary ties included, then
    min-p), then temperature."""
    x = logits.astype(np.float64).copy()
    for tid, b in bias:
        x[tid] += b
    if top_k and top_k < x.shape[-1]:
        kth = np.partition(x, -top_k)[-top_k]
        x = np.where(x < kth, -np.inf, x)
    if top_p < 1.0:
        probs = _softmax64(x)
        order = np.argsort(probs)[::-1]
        csum = np.cumsum(probs[order])
        cutoff = probs[order[int(np.searchsorted(csum, top_p))
                            if csum[-1] > top_p else len(order) - 1]]
        x = np.where(probs >= cutoff, x, -np.inf)
    if min_p > 0.0:
        probs = _softmax64(x)
        x = np.where(probs >= min_p * probs.max(), x, -np.inf)
    x = x / max(temperature, 1e-6)
    x = x - x[np.isfinite(x)].max()
    p = np.exp(x)
    return p / p.sum()


class SampledSpeculativeSession(SpeculativeSession):
    """Speculative decoding with SAMPLED generation: proposals x_i ~ q_i
    from the draft are accepted with probability min(1, p_i(x_i)/q_i(x_i))
    and rejections resample from normalize(max(p_i - q_i, 0)) — the output
    distribution is EXACTLY the target model's sampling distribution
    (rejection-sampling identity), for any draft."""

    def __init__(self, target, draft, k: int = 4, temperature: float = 0.8,
                 top_k: int = 0, kv_dtype=jnp.bfloat16):
        super().__init__(target, draft, k=k, kv_dtype=kv_dtype)
        self.temperature = temperature
        self.top_k = top_k

    def _draft_propose(self, k: int, w: int, rng: np.random.Generator):
        """k draft samples + the pre-sample draft logits of each step
        (host loop over the draft's T=1 forward; the draft is small)."""
        spec_d = self.draft.spec
        proposals = np.zeros(k, np.int32)
        q_logits = np.zeros((k, spec_d.n_vocab), np.float32)
        logits = self._draft_logits
        for i in range(k):
            q_logits[i] = logits
            q = _sampling_probs(logits, self.temperature, self.top_k)
            proposals[i] = rng.choice(len(q), p=q)
            dl, _, self.d_cache = forward_step(
                spec_d, self.draft.params,
                jnp.asarray([proposals[i]], jnp.int32),
                jnp.int32(self.n_past + i), self.d_cache, w,
            )
            logits = np.asarray(dl)[0]
        return proposals, q_logits, logits

    def generate(
        self,
        max_tokens: int,
        seed: int = 0,
        callback: Optional[Callable[[int], None]] = None,
    ) -> list[int]:
        rng = np.random.default_rng(seed)
        spec_t = self.target.spec
        eot = self.target.eot_token_id()
        out: list[int] = []

        while len(out) < max_tokens:
            k = min(self.k, max_tokens - len(out),
                    spec_t.n_ctx - 1 - self.n_past)
            if k <= 0:
                break
            w = self._window(k + 1)
            proposals, q_logits, d_head = self._draft_propose(k, w, rng)
            t_logits, _, self.t_cache = forward_step(
                spec_t, self.target.params, jnp.asarray(proposals),
                jnp.int32(self.n_past), self.t_cache, w,
            )
            t_logits = np.asarray(t_logits)

            target_heads = [self.last_logits] + [t_logits[i] for i in range(k)]
            emitted: list[int] = []
            n_acc = 0
            corrected = False
            for i in range(k):
                p = _sampling_probs(target_heads[i], self.temperature,
                                    self.top_k)
                q = _sampling_probs(q_logits[i], self.temperature, self.top_k)
                x = int(proposals[i])
                self.drafted += 1
                if rng.random() < min(1.0, p[x] / max(q[x], 1e-30)):
                    emitted.append(x)
                    n_acc += 1
                    self.accepted += 1
                    if x == eot:
                        break
                else:
                    resid = np.maximum(p - q, 0.0)
                    tot = resid.sum()
                    tok = (
                        int(rng.choice(len(p), p=resid / tot))
                        if tot > 0
                        else int(rng.choice(len(p), p=p))
                    )
                    emitted.append(tok)
                    corrected = True
                    break
            hit_eot = bool(emitted and emitted[-1] == eot)
            if (not corrected and not hit_eot
                    and len(out) + len(emitted) < max_tokens):
                p = _sampling_probs(target_heads[n_acc], self.temperature,
                                    self.top_k)
                bonus = int(rng.choice(len(p), p=p))
                emitted.append(bonus)
                corrected = True  # bonus also needs (re-)evaluation
                hit_eot = bonus == eot
            if not emitted:
                break

            self.n_past += n_acc
            self.tokens.extend(emitted)
            out.extend(emitted)
            if callback:
                for t in emitted:
                    callback(t)
            if hit_eot:
                break
            if corrected:  # last emitted token was never evaluated
                ids = jnp.asarray([emitted[-1]], jnp.int32)
                tl, _, self.t_cache = forward_step(
                    spec_t, self.target.params, ids,
                    jnp.int32(self.n_past), self.t_cache, w,
                )
                dl, _, self.d_cache = forward_step(
                    self.draft.spec, self.draft.params, ids,
                    jnp.int32(self.n_past), self.d_cache, w,
                )
                self.n_past += 1
                self.last_logits = np.asarray(tl)[0]
                self._draft_logits = np.asarray(dl)[0]
            else:
                self.last_logits = target_heads[n_acc]
                self._draft_logits = d_head
        return out


# ---------------------------------------------------------------------------
# speculative decoding UNDER continuous batching

import jax
from functools import partial

from llm_tpu.models.forward import (
    decode_loop_batched,
    forward_batched,
    init_cache_batched,
)
from llm_tpu.samplers import GreedySampler
from llm_tpu.serve import Engine, _prefill_slot


@partial(jax.jit, static_argnums=(0, 5), donate_argnums=(4,))
def _verify(spec, params, ids, n_past, cache, window, write_mask):
    """Batched T=k target forward scoring every stream's proposals."""
    logits, _, cache = forward_batched(
        spec, params, ids, n_past, cache, window, write_mask
    )
    return logits, cache


class SpeculativeEngine(Engine):
    """Continuous batching with speculative decoding (greedy streams).

    Each engine step runs ONE batched draft block that proposes k tokens
    for every decode-ready stream (decode_loop_batched over the draft's
    own [L, B] cache), then ONE batched T=k target forward that verifies
    all streams' proposals together, then per-stream host acceptance of
    the longest agreeing prefix. Guaranteed >= 1 token per stream per
    round: proposal 0 is the argmax of the target's own head logits, so
    it always matches. Neither cache ever rewinds — positions beyond a
    stream's n_past are masked and overwritten by later writes (the same
    property the reference's rewind relies on,
    inference_session.rs:353-377, batched).

    Greedy only: a request's sampler must be None (forced greedy) or a
    GreedySampler; the output equals the plain Engine's greedy generation
    (exactly on the f32 CPU path; argmax ties under bf16 reduction-order
    differences can flip on TPU — module docstring)."""

    greedy_only = True  # the server routes temperature=0 as sampler=None
    supports_device_logprobs = False  # custom step(): no logprob outputs

    def __init__(self, model, draft, k: int = 4, **kw):
        assert model.spec.n_vocab == draft.spec.n_vocab, (
            "draft and target must share a vocabulary"
        )
        assert model.spec.n_ctx == draft.spec.n_ctx, (
            "batched speculative requires equal context windows"
        )
        self.draft = draft
        self.k = k
        super().__init__(model, **kw)
        # the small draft keeps a DENSE cache; an int4 target pool pairs
        # it with int8 (int4 is a paged-pool-only format)
        d_kv = kw.get("kv_dtype", jnp.bfloat16)
        self.d_cache = init_cache_batched(
            draft.spec, self.max_streams, "int8" if d_kv == "int4" else d_kv
        )
        self.d_params = draft.params
        mesh = kw.get("mesh")
        if mesh is not None:
            # TP: the draft shards exactly like the target (the verify and
            # draft dispatches are ordinary jits — GSPMD partitions them)
            from llm_tpu.parallel import shard_cache, shard_params

            self.d_params = shard_params(draft.params, mesh)
            self.d_cache = shard_cache(self.d_cache, mesh, batched=True)
        self.accepted = 0
        self.drafted = 0

    @property
    def acceptance_rate(self) -> float:
        return self.accepted / self.drafted if self.drafted else 0.0

    def submit(self, request):
        if request.sampler is None:
            request.sampler = GreedySampler()
        elif not isinstance(request.sampler, GreedySampler):
            raise ValueError("SpeculativeEngine serves greedy streams only")
        return super().submit(request)

    def _draft_prefill_chunk(self, slot: int, toks, pos: int) -> int:
        """One n_batch chunk of DRAFT prefill for a slot; returns the new
        position. The single copy of the chunk/bucket/window recipe shared
        by lockstep prefill and the borrow-region replay."""
        spec_d = self.draft.spec
        chunk = toks[pos : pos + self.n_batch]
        bucket = (
            self.n_batch if pos + self.n_batch <= spec_d.n_ctx else len(chunk)
        )
        ids = np.zeros(bucket, np.int32)
        ids[: len(chunk)] = chunk
        _, self.d_cache = _prefill_slot(
            spec_d, self.d_params, jnp.asarray(ids), jnp.int32(pos),
            slot, self.d_cache, window_bucket(pos, spec_d.n_ctx),
        )
        return pos + len(chunk)

    def _prefill_chunk(self, stream, slot):
        # the draft cache prefills in lockstep with the target's
        self._draft_prefill_chunk(slot, stream.prefill_queue,
                                  stream.prefill_pos)
        super()._prefill_chunk(stream, slot)

    def step_multi(self, n_steps: int = 16):
        # a speculative round is already multi-token per dispatch; block
        # mode would bypass verification
        return self.step()

    def _reserve_round(self, decodable, k: int) -> bool:
        """Reserve room for a k-token verify per stream; dense slot caches
        always have it (PagedSpeculativeEngine pre-allocates pages)."""
        return True

    def _verify_batch(self, proposals, n_past, mask, max_past, k,
                      extra: int = 0):
        """One batched T=k target forward over all streams' proposals;
        returns [B, k, V] logits (dense cache here; paged override).
        `extra` widens the window bucket (the sampled variant shares one
        compiled window with its T=1 tail eval)."""
        window = window_bucket(max_past + k + extra, self.spec.n_ctx)
        t_logits, self.cache = _verify(
            self.spec, self.params, jnp.asarray(proposals),
            jnp.asarray(n_past), self.cache, window, jnp.asarray(mask),
        )
        return np.asarray(t_logits)

    def _fallback_step(self):
        """Per-token progress when a speculative round cannot run (context
        boundary / page pool too tight / argmax tie)."""
        events = super().step()
        self._draft_catchup()
        return events

    def _draft_catchup(self):
        """A fallback step advanced streams through the TARGET only; the
        emitted token must also be evaluated into the dense DRAFT cache,
        or the next round's proposals would condition on whatever stale
        row the last draft block wrote at that position (its rejected
        proposal). The sampled engines' tail eval performs the same
        repair for their correction/bonus token; re-evaluating an
        already-consistent row (fresh prefill) writes identical KV."""
        B = self.max_streams
        ids = np.zeros(B, np.int32)
        pos = np.zeros(B, np.int32)
        mask = np.zeros(B, bool)
        n_any = 0
        for slot, s in enumerate(self.slots):
            if (s is not None and not s.prefilling and s.tokens
                    and s.n_past > 0):
                ids[slot] = s.tokens[-1]
                pos[slot] = s.n_past - 1
                mask[slot] = True
                n_any += 1
        if not n_any:
            return
        window = window_bucket(int(pos.max()) + 1, self.draft.spec.n_ctx)
        _, self.d_cache = _tail_eval(
            self.draft.spec, self.d_params, jnp.asarray(ids),
            jnp.asarray(pos), self.d_cache, window, jnp.asarray(mask),
        )

    def step(self):
        self._admit()
        self._advance_prefills()
        events = self._drain_retired()
        decodable = self._decodable()
        if not decodable:
            return events

        spec = self.spec
        B = self.max_streams
        ll = np.zeros((B, spec.n_vocab), np.float32)
        n_past = np.zeros(B, np.int32)
        mask = np.zeros(B, bool)
        for slot, s in decodable:
            ll[slot] = s.last_logits
            n_past[slot] = s.n_past
            mask[slot] = True
        max_past = int(n_past.max())
        k = min(self.k, spec.n_ctx - 1 - max_past)
        if k <= 0 or not self._reserve_round(decodable, k):
            # at the context boundary (or a page pool too tight for the
            # round) the plain path makes progress / retires cleanly
            return events + self._fallback_step()
        window = window_bucket(max_past + k, spec.n_ctx)

        # 1. draft proposes k tokens per stream (proposal 0 chains from
        # the TARGET's head logits, so it is that stream's own argmax)
        toks, _, _, self.d_cache = decode_loop_batched(
            self.draft.spec, self.d_params, jnp.asarray(ll),
            jnp.asarray(n_past), self.d_cache, k, window,
            write_mask=jnp.asarray(mask),
        )
        proposals = np.asarray(toks).T  # [B, k]

        # 2. target verifies all proposals in one batched T=k forward
        t_logits = self._verify_batch(proposals, n_past, mask, max_past, k)

        # 3. per-stream host acceptance of the longest agreeing prefix
        eot = self._eot
        accepted = {}
        for slot, stream in decodable:
            prev = np.asarray(stream.last_logits)
            n_acc = 0
            for i in range(k):
                want = int(np.argmax(prev))
                if int(proposals[slot, i]) != want:
                    break
                n_acc += 1
                prev = t_logits[slot, i]
                if want == eot:
                    break
            self.drafted += k
            self.accepted += n_acc
            accepted[slot] = n_acc
        if min(accepted.values()) == 0:
            # argmax-tie flip under bf16 reduction order (TPU-only
            # possibility): make progress with one plain step instead
            return events + self._fallback_step()

        for slot, stream in decodable:
            for i in range(accepted[slot]):
                if stream.done:
                    break
                events.append(self._finish_token(
                    slot, stream, int(proposals[slot, i]),
                    t_logits[slot, i],
                ))
        return events


@partial(jax.jit, static_argnums=(0, 5, 7, 8), donate_argnums=(4,))
def _draft_propose_batched(spec, params, last_logits, n_past, cache, k,
                           key, window, sampler, sampler_values, write_mask):
    """Batched draft loop that ALSO returns the per-step draft logits
    ([k, B, V]) — the q distributions the acceptance test needs."""
    from llm_tpu.models.forward import forward_batched
    from llm_tpu.ops.sampling import device_sample

    def step(carry, _):
        logits, npast, c, ky = carry
        ky, sub = jax.random.split(ky)
        toks = device_sample(logits, sub, sampler, sampler_values)
        new_logits, _, c = forward_batched(
            spec, params, toks[:, None], npast, c, window, write_mask
        )
        return (new_logits[:, 0, :], npast + 1, c, ky), (toks, logits)

    (_, _, cache, _), (toks, q_logits) = jax.lax.scan(
        step,
        (jnp.asarray(last_logits, jnp.float32), n_past, cache, key),
        None,
        length=k,
    )
    return toks, q_logits, cache


@partial(jax.jit, static_argnums=(0, 5), donate_argnums=(4,))
def _tail_eval(spec, params, ids, n_past, cache, window, write_mask):
    """Masked batched T=1 forward: evaluate correction/bonus tokens that
    were emitted from host-side resampling without a forward pass."""
    logits, _, cache = forward_batched(
        spec, params, ids[:, None], n_past, cache, window, write_mask
    )
    return logits[:, 0, :], cache


class SampledSpeculativeEngine(SpeculativeEngine):
    """Rejection-sampling speculative decoding under continuous batching.

    Each request carries a DeviceSampler(kind="sample", temperature,
    top_k); the draft SAMPLES its proposals on device under each stream's
    own parameters (BatchedDeviceSampler), the target verifies in one
    batched T=k forward, and acceptance follows the exact identity:
    accept x with min(1, p(x)/q(x)), resample rejections from
    normalize(max(p - q, 0)) — so every stream's output distribution is
    exactly the target's sampling distribution (Leviathan et al.;
    SampledSpeculativeSession proves the math single-stream). Correction
    and bonus tokens are emitted immediately and evaluated by ONE masked
    batched T=1 forward pair before the next round.

    Per-stream np rngs (request.seed) drive the host acceptance;
    the device-side proposal sampling uses an engine-level key advanced
    per round, so runs are deterministic per engine instance."""

    greedy_only = False
    requires_device_sampler = True  # the server always builds one

    def submit(self, request):
        import dataclasses

        ds = request.device_sampler
        if ds is not None and getattr(ds, "kind", None) == "greedy":
            # greedy is the degenerate sample: top-k 1 makes the sampling
            # distribution a point mass at the argmax, so acceptance
            # reduces exactly to the greedy engine's comparison
            ds = dataclasses.replace(ds, kind="sample", temperature=1.0,
                                     top_k=1, top_p=1.0, min_p=0.0)
            request.device_sampler = ds
        if ds is None or getattr(ds, "kind", None) != "sample":
            raise ValueError(
                "SampledSpeculativeEngine requests need a "
                'DeviceSampler(kind="sample", ...) as device_sampler'
            )
        if getattr(ds, "has_penalties", False):
            # acceptance compares DRAFT vs TARGET distributions; windowed
            # penalties would have to be applied identically to both per
            # position, which the one-shot T=k verify cannot do
            raise ValueError(
                "speculative serving does not support repetition/"
                "frequency/presence penalties; use the non-speculative "
                "engine for penalized requests"
            )
        if getattr(ds, "mirostat", 0):
            # min(1, p/q) acceptance needs a FIXED per-position proposal
            # distribution; mirostat's mu feedback changes it per sampled
            # token, which the one-shot T=k verify cannot replay
            raise ValueError(
                "speculative serving does not support mirostat; use the "
                "non-speculative engine for mirostat requests"
            )
        if (getattr(ds, "tail_free_z", 1.0) < 1.0
                or getattr(ds, "typical_p", 1.0) < 1.0
                or getattr(ds, "top_a", (0.0, 0.0)) != (0.0, 0.0)):
            # the acceptance math (_sampling_probs) reconstructs q from
            # temperature/top-k/top-p/min-p/bias only; a proposal drawn
            # under additional truncations would no longer match the q it
            # is scored against, silently breaking the exactness identity
            raise ValueError(
                "speculative serving does not support tail-free/"
                "locally-typical/top-a truncations; use the "
                "non-speculative engine for those requests"
            )
        # bypass SpeculativeEngine's greedy guard; Engine.submit defaults
        # the (unused) host sampler chain
        return Engine.submit(self, request)

    def step(self):
        from llm_tpu.ops.sampling import batched_sampler

        self._admit()
        self._advance_prefills()
        events = self._drain_retired()
        decodable = self._decodable()
        if not decodable:
            return events

        spec = self.spec
        B = self.max_streams
        ll = np.zeros((B, spec.n_vocab), np.float32)
        n_past = np.zeros(B, np.int32)
        mask = np.zeros(B, bool)
        for slot, s in decodable:
            ll[slot] = s.last_logits
            n_past[slot] = s.n_past
            mask[slot] = True
        max_past = int(n_past.max())
        # +1 below the greedy clamp: a bonus token may extend past k
        k = min(self.k, spec.n_ctx - 2 - max_past)
        if k <= 0 or not self._reserve_round(decodable, k + 1):
            return events + self._fallback_step()
        window = window_bucket(max_past + k + 1, spec.n_ctx)

        per_slot = [None] * B
        for slot, s in decodable:
            per_slot[slot] = s.request.device_sampler
        sampler, values = batched_sampler(per_slot, B)

        self._key = jax.random.split(
            getattr(self, "_key", jax.random.PRNGKey(0))
        )[0]
        toks, q_logits, self.d_cache = _draft_propose_batched(
            self.draft.spec, self.d_params, jnp.asarray(ll),
            jnp.asarray(n_past), self.d_cache, k, self._key, window,
            sampler, values, jnp.asarray(mask),
        )
        proposals = np.asarray(toks).T  # [B, k]
        q_logits = np.asarray(q_logits)  # [k, B, V]

        t_logits = self._verify_batch(
            proposals, n_past, mask, max_past, k, extra=1
        )  # [B, k, V]

        eot = self._eot
        tail_ids = np.zeros(B, np.int32)
        tail_mask = np.zeros(B, bool)
        tail_streams = []
        for slot, stream in decodable:
            ds = stream.request.device_sampler
            tr = dict(temperature=ds.temperature, top_k=ds.top_k,
                      top_p=ds.top_p, min_p=ds.min_p, bias=ds.bias)
            rng = stream.rng
            heads = [np.asarray(stream.last_logits)] + [
                t_logits[slot, i] for i in range(k)
            ]
            n_acc = 0
            tail = None  # correction/bonus token, unevaluated
            for i in range(k):
                p = _sampling_probs(heads[i], **tr)
                q = _sampling_probs(q_logits[i, slot], **tr)
                x = int(proposals[slot, i])
                self.drafted += 1
                if rng.random() < min(1.0, p[x] / max(q[x], 1e-30)):
                    n_acc += 1
                    self.accepted += 1
                    if x == eot:
                        break
                else:
                    resid = np.maximum(p - q, 0.0)
                    tot = resid.sum()
                    tail = (
                        int(rng.choice(len(p), p=resid / tot))
                        if tot > 0
                        else int(rng.choice(len(p), p=p))
                    )
                    break
            accepted_eot = n_acc and int(proposals[slot, n_acc - 1]) == eot
            if tail is None and not accepted_eot:
                # bonus token from the target head at the frontier
                p = _sampling_probs(heads[n_acc], **tr)
                tail = int(rng.choice(len(p), p=p))

            for i in range(n_acc):
                if stream.done:
                    break
                events.append(self._finish_token(
                    slot, stream, int(proposals[slot, i]), t_logits[slot, i]
                ))
            if tail is not None and not stream.done:
                # emit now; its post-logits come from the tail eval below
                events.append(self._finish_token(
                    slot, stream, tail, heads[n_acc]
                ))
                if not stream.done:
                    tail_ids[slot] = tail
                    tail_mask[slot] = True
                    tail_streams.append((slot, stream))

        if tail_mask.any():
            pos = np.zeros(B, np.int32)
            for slot, stream in tail_streams:
                pos[slot] = stream.n_past - 1  # the tail token's position
            tl = self._tail_eval_target(tail_ids, pos, tail_mask, window)
            _, self.d_cache = _tail_eval(
                self.draft.spec, self.d_params, jnp.asarray(tail_ids),
                jnp.asarray(pos), self.d_cache, window,
                jnp.asarray(tail_mask),
            )
            for slot, stream in tail_streams:
                stream.last_logits = tl[slot]
        return events

    def _tail_eval_target(self, tail_ids, pos, tail_mask, window):
        """Masked T=1 target eval of the emitted correction/bonus tokens
        (dense cache here; paged override)."""
        tl, self.cache = _tail_eval(
            self.spec, self.params, jnp.asarray(tail_ids),
            jnp.asarray(pos), self.cache, window, jnp.asarray(tail_mask),
        )
        return np.asarray(tl)


from llm_tpu.paged import PagedEngine  # noqa: E402


class _PagedSpeculativeMixin:
    """Paged-target plumbing shared by the greedy and sampled paged
    speculative engines: page reservation per round, the T=k verify and
    T=1 tail eval through the paged forward, and the per-token paged
    fallback. Verify overshoot is safe for the same reason as dense:
    unaccepted positions stay masked (reads touch pos < n_past only) and
    live in the stream's OWN pages — a borrowed prefix ends at the prompt
    boundary, strictly below any verify position, so shared pages are
    never written."""

    def _reserve_round(self, decodable, k: int) -> bool:
        try:
            for slot, s in decodable:
                self._ensure_pages(
                    slot, min(s.n_past + k, self.spec.n_ctx) - 1
                )
        except MemoryError:
            return False
        return True

    def _fallback_step(self):
        events = PagedEngine.step(self)
        self._draft_catchup()  # dense draft cache: same repair as dense
        return events

    def _begin_prefill(self, stream, slot: int) -> None:
        super()._begin_prefill(stream, slot)
        # a borrowed prompt-prefix page chain (prefix_cache) skips TARGET
        # prefill for those positions, but the dense DRAFT cache has no
        # such reuse — prefill the draft over the skipped region now, or
        # its attention would read a previous occupant's stale KV there
        # (outputs stay correct via verification, but draft quality and
        # per-engine determinism would silently degrade)
        pos = 0
        while pos < stream.prefill_pos:
            pos = self._draft_prefill_chunk(slot, stream.prefill_queue, pos)

    def _adjusted_n_past(self, n_past):
        """Dummy rows have no write_mask in the paged forward: park a
        prefilling slot's writes at its frontier (the next real chunk
        overwrites them) — empty slots' page-0 entries are TRASH already."""
        n_past = np.array(n_past)
        for slot, s in enumerate(self.slots):
            if s is not None and s.prefilling:
                n_past[slot] = s.prefill_pos
        return n_past

    def _verify_batch(self, proposals, n_past, mask, max_past, k,
                      extra: int = 0):
        from llm_tpu.paged import paged_step

        wp = min(
            -(-(max_past + k + extra) // self.page_size),
            self.pages_per_stream,
        )
        t_logits, _, self.pool = paged_step(
            self.spec, self.params, jnp.asarray(proposals),
            jnp.asarray(self._adjusted_n_past(n_past)),
            jnp.asarray(self.tables), self.pool, wp, self._allow_kernel,
        )
        return np.asarray(t_logits)

    def _tail_eval_target(self, tail_ids, pos, tail_mask, window):
        from llm_tpu.paged import paged_step

        # rows outside tail_mask: every surviving decodable stream IS a
        # tail stream (non-tail ones retired), so the only dummy rows are
        # prefilling (frontier-parked) or empty (TRASH page 0) slots
        pos = np.array(pos)
        for slot, s in enumerate(self.slots):
            if s is not None and s.prefilling:
                pos[slot] = s.prefill_pos
        wp = min(
            max(1, -(-(int(pos.max()) + 1) // self.page_size)),
            self.pages_per_stream,
        )
        tl, _, self.pool = paged_step(
            self.spec, self.params, jnp.asarray(tail_ids)[:, None],
            jnp.asarray(pos), jnp.asarray(self.tables), self.pool,
            wp, self._allow_kernel,
        )
        return np.asarray(tl)[:, 0, :]


class PagedSpeculativeEngine(
    _PagedSpeculativeMixin, SpeculativeEngine, PagedEngine
):
    """Speculative decoding over a PAGED target KV pool (greedy streams).

    Long-context serving composed with draft acceleration: the target's
    KV rides PagedEngine's shared page pool (bf16/f32/int8, optional
    prompt-prefix cache), while the small draft keeps a dense [L, B]
    cache. Each round pre-allocates pages for the k verify positions; a
    pool too tight for the round falls back to the plain paged per-token
    step (and its kv_oom retirement rules).

    MRO: the mixin supplies the paged verify/reserve/fallback,
    SpeculativeEngine the round logic (draft block -> verify ->
    longest-agreeing-prefix acceptance), PagedEngine the device state
    (pool/tables/allocator, paged prefill)."""


class PagedSampledSpeculativeEngine(
    _PagedSpeculativeMixin, SampledSpeculativeEngine, PagedEngine
):
    """Rejection-sampling speculative decoding over a PAGED target pool.

    The sampled round reserves k+1 positions (the correction/bonus tail
    extends one past the proposals) and its T=1 tail eval runs through
    the paged forward; everything else is SampledSpeculativeEngine's
    exact-acceptance machinery over PagedEngine state."""
