"""On-device token sampling for multi-step decode loops.

The reference samples on the host from `last_logits` every token
(samplers.rs), which costs one host<->device round trip per token. These
device-side samplers let `decode_loop` (models/forward.py) generate N tokens
per dispatch — the full host sampler chain remains available for anything
the device path doesn't cover (mirostat, repetition windows, DSL chains).

Covered on device: greedy, temperature, top-k, flat bias — via the Gumbel
trick (argmax(logits/T + G) ~ softmax(logits/T) sampling), which avoids a
full-vocab sort.
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
    bias: Tuple[Tuple[int, float], ...] = ()  # (token_id, additive bias)

    @classmethod
    def greedy(cls) -> "DeviceSampler":
        return cls(kind="greedy")

    @classmethod
    def top_k_temperature(cls, k: int = 40, temperature: float = 0.8):
        return cls(kind="sample", temperature=temperature, top_k=k)


def device_sample(
    logits: jnp.ndarray,  # [..., V] f32
    key: jnp.ndarray,
    cfg: DeviceSampler,
) -> jnp.ndarray:
    """Sample token ids [...] from logits under the static config."""
    for tid, b in cfg.bias:
        logits = logits.at[..., tid].add(b)

    if cfg.kind == "greedy":
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    x = logits / jnp.maximum(cfg.temperature, 1e-6)
    if cfg.top_k > 0 and cfg.top_k < logits.shape[-1]:
        kth = jax.lax.top_k(x, cfg.top_k)[0][..., -1:]
        x = jnp.where(x < kth, -jnp.inf, x)
    gumbel = -jnp.log(
        -jnp.log(jax.random.uniform(key, x.shape, minval=1e-20, maxval=1.0))
    )
    return jnp.argmax(x + gumbel, axis=-1).astype(jnp.int32)
