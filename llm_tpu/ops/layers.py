"""Functional building blocks of the decoder graph (jnp, fused by XLA).

Numerics mirror the ggml CPU ops the reference builds its graphs from
(/root/reference/crates/ggml/src/context.rs op_* wrappers over ggml.c):

- layer_norm:  ggml_norm, eps = 1e-5 (hardcoded in ggml.c)
- rms_norm:    ggml_rms_norm, eps = LLAMA_DEFAULT_RMS_EPS = 5e-6
               (crates/ggml/src/lib.rs:132, context.rs:296-300)
- gelu:        ggml_gelu — tanh approximation
- silu:        ggml_silu
- rope:        ggml_rope_(custom_)inplace modes 0 (GPT interleaved pairs) and
               2 (NeoX half-rotation), with frequency base/scale overrides
               (context.rs:558-590); theta_j = scale * pos * base^(-2j/n_dims)
- alibi_slopes: ggml_alibi's per-head slopes — n_head rounded down to a
               power of two; bias = slope * absolute key index (inlined
               at each attention site)

These are deliberately plain jnp: XLA fuses all of them into neighbouring
matmuls; only the dequant-matmul (ops/qmatmul.py) needs a hand-written
Pallas kernel because its input is bit-packed.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp

LN_EPS = 1e-5  # ggml_norm eps
RMS_EPS = 5e-6  # LLAMA_DEFAULT_RMS_EPS


def rms_norm(x: jnp.ndarray, w: jnp.ndarray, eps: float = RMS_EPS) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jnp.reciprocal(jnp.sqrt(ms + eps)) * w).astype(x.dtype)


def layer_norm(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray],
    eps: float = LN_EPS,
) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jnp.reciprocal(jnp.sqrt(var + eps)) * w
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """ggml_gelu: tanh approximation."""
    xf = x.astype(jnp.float32)
    return (
        0.5 * xf * (1.0 + jnp.tanh(0.7978845608028654 * (xf + 0.044715 * xf**3)))
    ).astype(x.dtype)


def silu(x: jnp.ndarray) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    return (xf * (1.0 / (1.0 + jnp.exp(-xf)))).astype(x.dtype)


def rope(
    x: jnp.ndarray,
    positions: jnp.ndarray,
    n_rot: int,
    mode: int,
    freq_base: float = 10000.0,
    freq_scale: float = 1.0,
) -> jnp.ndarray:
    """Rotary position embedding over the first `n_rot` dims of each head.

    x: [..., H, D]; positions: [...] absolute token positions (same leading
    shape as x minus the head/dim axes).
    mode 0 = GPT/LLaMA interleaved pairs (2j, 2j+1);
    mode 2 = NeoX pairs (j, j + n_rot/2).
    theta_j(p) = freq_scale * p * freq_base^(-2j/n_rot), j in [0, n_rot/2).
    """
    *lead, H, D = x.shape
    half = n_rot // 2
    xf = x.astype(jnp.float32)

    inv_freq = freq_base ** (-jnp.arange(0, half, dtype=jnp.float32) * 2.0 / n_rot)
    theta = (
        freq_scale * positions.astype(jnp.float32)
    )[..., None] * inv_freq  # [..., half]
    cos = jnp.cos(theta)[..., None, :]  # [..., 1, half]
    sin = jnp.sin(theta)[..., None, :]

    if mode == 0:
        xr = xf[..., :n_rot].reshape(*lead, H, half, 2)
        x0, x1 = xr[..., 0], xr[..., 1]
        r0 = x0 * cos - x1 * sin
        r1 = x0 * sin + x1 * cos
        rot = jnp.stack([r0, r1], axis=-1).reshape(*lead, H, n_rot)
    elif mode == 2:
        x0 = xf[..., :half]
        x1 = xf[..., half:n_rot]
        r0 = x0 * cos - x1 * sin
        r1 = x0 * sin + x1 * cos
        rot = jnp.concatenate([r0, r1], axis=-1)
    else:
        raise ValueError(f"unsupported rope mode {mode}")

    if n_rot == D:
        return rot.astype(x.dtype)
    return jnp.concatenate([rot, xf[..., n_rot:]], axis=-1).astype(x.dtype)


def alibi_slopes(n_head: int, bias_max: float) -> jnp.ndarray:
    """Per-head ALiBi slopes, ggml_alibi convention (ggml.c).

    n_heads_log2_floor = 2^floor(log2(n_head));
    heads below it: m0^(h+1) with m0 = 2^(-bias_max / floor);
    heads above:    m1^(2(h-floor)+1) with m1 = 2^(-bias_max/2 / floor).
    """
    floor2 = 1 << int(math.floor(math.log2(n_head)))
    m0 = 2.0 ** (-bias_max / floor2)
    m1 = 2.0 ** (-(bias_max / 2.0) / floor2)
    slopes = []
    for h in range(n_head):
        if h < floor2:
            slopes.append(m0 ** (h + 1))
        else:
            slopes.append(m1 ** (2 * (h - floor2) + 1))
    return jnp.asarray(slopes, dtype=jnp.float32)


# (the slopes-times-key-position product is inlined at each attention
# site — forward._attention_batched, ring._ring_pass, the paged passes —
# where the broadcasting shapes differ; alibi_slopes above is the single
# shared piece)
