"""Pallas decode-attention kernel over the DENSE batched KV cache.

The batched serving engine keeps KV in a dense head-major [L, B, Hkv, S, D] cache
(llm_tpu/models/forward.py:init_cache_batched). The jnp attention paths
materialize HBM intermediates in front of the score/value contractions —
the int8 path a full f32 dequant of the windowed cache, the bf16 path an
astype(f32) copy — measured on chip at +19 ms (int8) / +32 ms (bf16) per
B=8 decode step at window 1024 on LLaMA-7B, several times the cost of the
underlying reads. This kernel streams cache blocks HBM->VMEM exactly once,
dequantizes in registers, and folds them into an online softmax, the same
structure as the paged-pool kernel (llm_tpu/ops/paged_attention.py) minus
the page-table indirection:

- grid (B, W/block): streams are independent (parallel); blocks advance
  the per-stream online-softmax state held in VMEM scratch (arbitrary).
- the layer index arrives via scalar prefetch and selects the layer slice
  of the FULL stacked cache inside the BlockSpec index map — under the
  lax.scan over layers this avoids the per-iteration cache-slice copy XLA
  materializes in front of an opaque kernel call (same trick as the
  stacked qmatmul, llm_tpu/ops/qmatmul.py:_qmatmul_pallas_stacked).
- a K/V block is [Hkv, block, D] — contiguous in the cache's head-major
  layout and already in the kernel's score orientation, so the
  contractions lower to MXU batched dots with no VMEM relayout.
- int8 dequant is folded AROUND the dot: K scales multiply the scores per
  key position, V scales the probabilities (bit-identical to dequantizing
  first, since scales are per (position, head)).
- kv heads are chunked so the per-chunk f32 operands/products ([hc,
  block, D] blocks, [hc, rep, block] scores) stay ~1 MiB (same
  scoped-VMEM bound as the paged kernel's head chunks).

Decode-shaped (T=1) only; prefill keeps the jnp paths (MXU-bound there).
Reference contrast: ggml's decode attention is a per-token graph over
views of a contiguous KV region (/root/reference/crates/models/llama/src/
lib.rs:248-307); batching across streams does not exist there.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def pick_block(W: int, hkv: int, d: int, itemsize: int) -> int:
    """Largest power-of-two block <= 512 dividing W with a K+V DMA of at
    most ~2 MiB per grid step (env LLM_TPU_DENSE_BLOCK overrides).

    Swept on chip at 7B B=8 W=1024 int8: block 512 (4 MiB steps, hc=4)
    runs 23 ms; block 256 (2 MiB, hc=8) runs 10.6 ms; block 128 11.5 ms.
    The pure-DMA ceiling of this grid measures 4.3 ms (499 GB/s) — the
    gap is the f32 relayout of each block into heads-major orientation."""
    env = os.environ.get("LLM_TPU_DENSE_BLOCK")
    if env:
        try:
            b = int(env)
            if b > 0 and W % b == 0:
                return b
        except ValueError:
            pass
    b = 512
    while b > 8 and (W % b != 0 or 2 * b * hkv * d * itemsize > (2 << 20)):
        b //= 2
    return b if W % b == 0 else 0


def _head_chunk(block: int, hkv: int, rep: int, d: int) -> int:
    """kv-heads per body iteration: cap the per-chunk f32 block operands
    ([hc, block, D]) at ~1 MiB (env LLM_TPU_DENSE_HC overrides)."""
    env = os.environ.get("LLM_TPU_DENSE_HC")
    if env:
        try:
            return max(1, min(int(env), hkv))
        except ValueError:
            pass
    return max(1, min(hkv, (1 << 20) // (block * rep * d * 4)))


def kernel_ok(spec, T: int, W: int, S: int) -> bool:
    """Static gate: decode shape on TPU-friendly geometry.

    D (the lane dim of every block) may be any multiple of 8 >= 64:
    Mosaic pads sub-128 lane tiles, so D=64 (GPT-2, Falcon-7B) and D=80
    (StableLM/NeoX family) lower fine — verified by the interpret parity
    tests (tests/test_ops.py) and the on-chip smoke gate (bench --smoke).
    Sub-64 D (tiny test models) stays on the jnp path: relative padding
    waste is highest exactly where the kernel has nothing to win."""
    from llm_tpu.ops.qmatmul import _use_pallas

    return (
        _use_pallas()
        and T == 1
        and spec.head_dim % 8 == 0
        and spec.head_dim >= 64
        and W >= 128
        and pick_block(W, spec.n_head_kv, spec.head_dim, 1) >= 128
    )


def _make_kernel(nw: int, kq_scale: float, quantized: bool,
                 has_alibi: bool, block: int, hc: int):
    def kernel(*refs):
        npast_ref, _layer_ref = refs[0], refs[1]
        i = 2
        q_ref = refs[i]; i += 1            # [1, Hkv, rep, D]
        k_ref = refs[i]; i += 1            # [1, 1, Hkv, block, D]
        v_ref = refs[i]; i += 1
        ks_ref = vs_ref = None
        if quantized:
            ks_ref = refs[i]; i += 1       # [1, 1, Hkv, block]
            vs_ref = refs[i]; i += 1
        slopes_ref = None
        if has_alibi:
            slopes_ref = refs[i]; i += 1   # [Hkv, rep]
        m_out, l_out, acc_out = refs[i], refs[i + 1], refs[i + 2]
        m_s, l_s, acc_s = refs[i + 3], refs[i + 4], refs[i + 5]

        b = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            m_s[...] = jnp.full(m_s.shape, NEG_INF, m_s.dtype)
            l_s[...] = jnp.zeros(l_s.shape, l_s.dtype)
            acc_s[...] = jnp.zeros(acc_s.shape, acc_s.dtype)

        npv = npast_ref[b]
        hkv = q_ref.shape[1]

        # Scores are heads-major [hc, rep, block] (block in lanes). The
        # head-major cache delivers blocks in exactly this orientation, so
        # the contractions run as MXU batched dot_generals with batch dims
        # in EQUAL positions (Mosaic's requirement) and zero relayouts.
        # Measured on chip (7B B=8 W=1024 int8, all-layers decode pass):
        # 4.8 ms — at the 4.3 ms pure-DMA ceiling of this grid (499 GB/s).
        # Alternatives: position-major blocks + f32 swapaxes 10.6 ms;
        # + VPU broadcast-reduce (no dots) 9.0 ms; int8-domain swap
        # 20.9 ms; jnp fallback (HBM intermediates) 23+ ms.
        pos = j * block + lax.broadcasted_iota(jnp.int32, (1, 1, block), 2)
        ok = pos < npv  # [1, 1, block]

        for h0 in range(0, hkv, hc):
            h1 = min(h0 + hc, hkv)
            qh = q_ref[0, h0:h1].astype(jnp.float32)        # [hc, rep, D]
            kb = k_ref[0, 0, h0:h1].astype(jnp.float32)     # [hc, block, D]
            s = lax.dot_general(
                qh, kb, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * kq_scale
            if quantized:  # s [hc, rep, block]
                s = s * ks_ref[0, 0, h0:h1][:, None, :]
            if has_alibi:
                s = s + (
                    slopes_ref[h0:h1][:, :, None] * pos.astype(jnp.float32)
                )
            s = jnp.where(ok, s, NEG_INF)

            m_prev = m_s[h0:h1]                        # [hc, rep, 1]
            m_new = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
            p = jnp.where(ok, jnp.exp(s - m_new), 0.0)  # [hc, rep, block]
            corr = jnp.exp(m_prev - m_new)
            m_s[h0:h1] = m_new
            l_s[h0:h1] = l_s[h0:h1] * corr + p.sum(axis=-1, keepdims=True)

            vb = v_ref[0, 0, h0:h1].astype(jnp.float32)     # [hc, block, D]
            if quantized:
                p = p * vs_ref[0, 0, h0:h1][:, None, :]
            pv = lax.dot_general(
                p, vb, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [hc, rep, D]
            acc_s[h0:h1] = acc_s[h0:h1] * corr + pv

        @pl.when(j == nw - 1)
        def _():
            m_out[0] = m_s[...]
            l_out[0] = l_s[...]
            acc_out[0] = acc_s[...]

    return kernel


@partial(
    jax.jit,
    static_argnames=(
        "window", "kq_scale", "interpret", "hkv", "rep", "d", "block", "hc",
    ),
)
def _dense_attention_call(
    cache_k, cache_v, ks, vs, n_past, slopes, layer, q,
    *, window, kq_scale, interpret, hkv, rep, d, block, hc,
):
    B = q.shape[0]
    quantized = ks is not None
    has_alibi = slopes is not None
    nw = window // block

    kernel = _make_kernel(nw, kq_scale, quantized, has_alibi, block, hc)

    in_specs = [
        pl.BlockSpec((1, hkv, rep, d), lambda b, j, npst, lyr: (b, 0, 0, 0)),
        pl.BlockSpec(
            (1, 1, hkv, block, d),
            lambda b, j, npst, lyr: (lyr[0], b, 0, j, 0),
        ),
        pl.BlockSpec(
            (1, 1, hkv, block, d),
            lambda b, j, npst, lyr: (lyr[0], b, 0, j, 0),
        ),
    ]
    operands = [q, cache_k, cache_v]
    if quantized:
        in_specs += [
            pl.BlockSpec(
                (1, 1, hkv, block),
                lambda b, j, npst, lyr: (lyr[0], b, 0, j),
            )
        ] * 2
        operands += [ks, vs]
    if has_alibi:
        in_specs.append(
            pl.BlockSpec((hkv, rep), lambda b, j, npst, lyr: (0, 0))
        )
        operands.append(slopes)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, nw),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(
                (1, hkv, rep, 1), lambda b, j, npst, lyr: (b, 0, 0, 0)
            ),
            pl.BlockSpec(
                (1, hkv, rep, 1), lambda b, j, npst, lyr: (b, 0, 0, 0)
            ),
            pl.BlockSpec(
                (1, hkv, rep, d), lambda b, j, npst, lyr: (b, 0, 0, 0)
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((hkv, rep, 1), jnp.float32),
            pltpu.VMEM((hkv, rep, 1), jnp.float32),
            pltpu.VMEM((hkv, rep, d), jnp.float32),
        ],
    )
    itemsize = cache_k.dtype.itemsize
    bytes_accessed = (
        B * window * hkv * d * 2 * itemsize
        + (B * window * hkv * 2 * 4 if quantized else 0)
        + q.size * 4
        + B * hkv * rep * (d + 2) * 4
    )
    m, l, acc = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, hkv, rep, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, hkv, rep, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, hkv, rep, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * window * hkv * rep * d * 2,
            bytes_accessed=bytes_accessed,
            transcendentals=B * window * hkv * rep,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        jnp.asarray(n_past, jnp.int32),
        jnp.asarray(layer, jnp.int32).reshape(1),
        *operands,
    )
    return m[..., 0], l[..., 0], acc


def dense_attention_pass(
    spec, cache_k, cache_v, ks, vs, n_past, window, layer, qf, slopes=None,
):
    """online_pass hook (models/forward._attention_batched): qf
    [B, 1, Hkv, rep, D] -> (m, l, acc) over the dense batched head-major
    cache [L, B, Hkv, S, D], reading only the first `window` positions.
    Shapes match _online_cache_pass_batched exactly."""
    from llm_tpu.ops.qmatmul import _backend_mode

    B, T, Hkv, rep, D = qf.shape
    assert T == 1, "kernel path is decode-shaped (T=1)"
    q = qf[:, 0].astype(jnp.float32)
    block = pick_block(window, Hkv, D, cache_k.dtype.itemsize)
    m, l, acc = _dense_attention_call(
        cache_k, cache_v, ks, vs, n_past, slopes, layer, q,
        window=window,
        kq_scale=float(spec.kq_scale),
        interpret=(_backend_mode() == "interpret"),
        hkv=Hkv, rep=rep, d=D, block=block,
        hc=_head_chunk(block, Hkv, rep, D),
    )
    return m[:, None], l[:, None], acc[:, None]
