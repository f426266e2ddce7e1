"""Pallas paged-attention decode kernel: page tables as scalar prefetch.

The TPU-native replacement for gather-then-attend paged KV reads: the
kernel's grid is (streams, logical pages, kv-heads) and the BlockSpec index
map for the K/V pool operands looks the physical page id up in the
scalar-prefetched page table, so pages stream DIRECTLY from HBM into VMEM
in logical order — each page is read exactly once, with no windowed-KV
gather copy in front of attention.

Layout/grid rationale:
- pool [L, NP, Hkv, page, D]: a (head, page) block is one contiguous
  page*D run, and the block's minor dims (page, D) satisfy Mosaic's
  sublane/lane tiling rules.
- heads INNERMOST: the per-page scale block's index map ignores the head,
  so consecutive grid steps fetch the identical block and Mosaic elides
  the DMA — scales are read once per page, not once per head. (A
  per-head scale block would either violate the minor-dim tiling rules
  or pad lanes 128x and OOM at 7B scale.)
- the online-softmax state lives in VMEM scratch for ALL heads
  ([Hkv, rep(, D)]), indexed by the head program id; pages advance in the
  middle grid dim, so the state threads correctly per (stream, head).
- one dot pair per block — no per-head python unroll (at 64 streams the
  unrolled variant spent ~2.5 ms/layer on instruction overhead).

Decode-shaped (T=1) only: prefill chunks use the jnp page-scan pass
(llm_tpu/paged.py:_paged_online_pass), whose math this kernel reproduces
exactly (equality-tested in interpret mode and on chip).

Reference contrast: ggml has no paged KV at all — context overflow is an
error (/root/reference/crates/llm-base/src/inference_session.rs:311-313).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def kernel_ok(spec, T: int, page: int) -> bool:
    """Static gate: the kernel covers the decode shape (T=1) on TPU-friendly
    geometry; everything else uses the jnp page-scan pass."""
    from llm_tpu.ops.qmatmul import _use_pallas

    return (
        _use_pallas()
        and T == 1
        and spec.head_dim % 128 == 0
        and page % 8 == 0
    )


def _make_kernel(
    nw: int, kq_scale: float, quantized: bool, has_alibi: bool, pps: int
):
    def kernel(*refs):
        # scalar prefetch: tables [B, P], n_past [B], layer [1]
        tbl_ref, npast_ref, _layer_ref = refs[0], refs[1], refs[2]
        i = 3
        q_ref = refs[i]; i += 1          # [1, 1, rep, D]
        k_refs = refs[i : i + pps]; i += pps  # pps x [1, 1, 1, page, D]
        v_refs = refs[i : i + pps]; i += pps
        ks_refs = vs_refs = None
        if quantized:
            ks_refs = refs[i : i + pps]; i += pps  # pps x [1, 1, Hkv, page]
            vs_refs = refs[i : i + pps]; i += pps
        slopes_ref = None
        if has_alibi:
            slopes_ref = refs[i]; i += 1  # [Hkv, rep]
        m_out, l_out, acc_out = refs[i], refs[i + 1], refs[i + 2]
        m_s, l_s, acc_s = refs[i + 3], refs[i + 4], refs[i + 5]

        b = pl.program_id(0)
        j = pl.program_id(1)
        h = pl.program_id(2)

        hs = pl.ds(h, 1)  # dynamic head slice into scratch/scale refs

        @pl.when(j == 0)
        def _():
            # head h's state initializes on its first page visit
            m_s[hs] = jnp.full((1,) + m_s.shape[1:], NEG_INF, m_s.dtype)
            l_s[hs] = jnp.zeros((1,) + l_s.shape[1:], l_s.dtype)
            acc_s[hs] = jnp.zeros((1,) + acc_s.shape[1:], acc_s.dtype)

        npv = npast_ref[b]
        page = k_refs[0].shape[3]
        span = pps * page  # keys covered per grid step
        pos = j * span + lax.broadcasted_iota(jnp.int32, (1, span), 1)
        valid = pos < npv  # [1, span]; clamped duplicate pages mask out here

        def cat(rs, pick, axis=0):
            parts = [pick(r).astype(jnp.float32) for r in rs]
            return parts[0] if pps == 1 else jnp.concatenate(parts, axis=axis)

        qh = q_ref[0, 0]  # [rep, D]
        kh = cat(k_refs, lambda r: r[0, 0, 0])  # [span, D]
        vh = cat(v_refs, lambda r: r[0, 0, 0])
        s = (
            lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * kq_scale
        )  # [rep, span]
        if quantized:
            # dequant folded around the dots: k scale scales the SCORES
            # per key position; v scale scales the probabilities
            ks_row = cat(ks_refs, lambda r: r[0, 0, hs, :], axis=1)  # [1, span]
            s = s * ks_row
        if has_alibi:
            slope = jnp.transpose(slopes_ref[hs, :])  # [rep, 1]
            s = s + slope * pos.astype(jnp.float32)
        s = jnp.where(valid, s, NEG_INF)

        m_prev = m_s[hs][0]  # [rep, 1]
        m_new = jnp.maximum(m_prev, s.max(axis=1, keepdims=True))
        p = jnp.where(valid, jnp.exp(s - m_new), 0.0)
        corr = jnp.exp(m_prev - m_new)
        m_s[hs] = m_new[None]
        l_s[hs] = (l_s[hs][0] * corr + p.sum(axis=1, keepdims=True))[None]
        if quantized:
            vs_row = cat(vs_refs, lambda r: r[0, 0, hs, :], axis=1)  # [1, span]
            p = p * vs_row
        acc_s[hs] = (
            acc_s[hs][0] * corr
            + lax.dot_general(
                p, vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )[None]

        @pl.when(j == nw - 1)
        def _():
            m_out[0, 0] = m_s[hs][0]
            l_out[0, 0] = l_s[hs][0]
            acc_out[0, 0] = acc_s[hs][0]

    return kernel


@partial(
    jax.jit,
    static_argnames=(
        "window_pages", "kq_scale", "interpret", "hkv", "rep", "d", "pps"
    ),
)
def _paged_attention_call(
    pool_k, pool_v, ks, vs, tables, n_past, slopes, layer, q,
    *, window_pages, kq_scale, interpret, hkv, rep, d, pps=1,
):
    B = q.shape[0]
    page = pool_k.shape[3]
    quantized = ks is not None
    has_alibi = slopes is not None
    nw = -(-window_pages // pps)  # page-GROUPS in the grid's middle dim

    kernel = _make_kernel(nw, kq_scale, quantized, has_alibi, pps)

    P = tables.shape[1]

    def im_q(b, j, h, tbl, npst, lyr):
        return (b, h, 0, 0)

    def im_pool(off):
        # off-th page of the group; indices past the window clamp to the
        # last table column (its keys mask out via pos >= n_past)
        def im(b, j, h, tbl, npst, lyr):
            return (lyr[0], tbl[b, jnp.minimum(j * pps + off, P - 1)], h, 0, 0)

        return im

    def im_scale(off):
        # head-independent: consecutive h steps fetch the identical block,
        # which Mosaic's pipelining elides (one scale DMA per page)
        def im(b, j, h, tbl, npst, lyr):
            return (lyr[0], tbl[b, jnp.minimum(j * pps + off, P - 1)], 0, 0)

        return im

    in_specs = [pl.BlockSpec((1, 1, rep, d), im_q)]
    operands = [q]
    in_specs += [
        pl.BlockSpec((1, 1, 1, page, d), im_pool(i)) for i in range(pps)
    ]
    operands += [pool_k] * pps
    in_specs += [
        pl.BlockSpec((1, 1, 1, page, d), im_pool(i)) for i in range(pps)
    ]
    operands += [pool_v] * pps
    if quantized:
        in_specs += [
            pl.BlockSpec((1, 1, hkv, page), im_scale(i)) for i in range(pps)
        ]
        operands += [ks] * pps
        in_specs += [
            pl.BlockSpec((1, 1, hkv, page), im_scale(i)) for i in range(pps)
        ]
        operands += [vs] * pps
    if has_alibi:
        in_specs.append(
            pl.BlockSpec((hkv, rep), lambda b, j, h, tbl, npst, lyr: (0, 0))
        )
        operands.append(slopes)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, nw, hkv),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(
                (1, 1, rep, 1), lambda b, j, h, tbl, npst, lyr: (b, h, 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, rep, 1), lambda b, j, h, tbl, npst, lyr: (b, h, 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, rep, d), lambda b, j, h, tbl, npst, lyr: (b, h, 0, 0)
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((hkv, rep, 1), jnp.float32),
            pltpu.VMEM((hkv, rep, 1), jnp.float32),
            pltpu.VMEM((hkv, rep, d), jnp.float32),
        ],
    )
    itemsize = pool_k.dtype.itemsize
    bytes_accessed = (
        B * window_pages * page * hkv * d * 2 * itemsize
        + (B * window_pages * page * hkv * 2 * 4 if quantized else 0)
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
            flops=2 * B * window_pages * page * hkv * rep * d * 2,
            bytes_accessed=bytes_accessed,
            transcendentals=B * window_pages * page * hkv * rep,
        ),
        compiler_params=pltpu.CompilerParams(
            # streams are independent; pages thread the online-softmax
            # scratch; heads share the page's scale block
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        jnp.asarray(tables, jnp.int32),
        jnp.asarray(n_past, jnp.int32),
        jnp.asarray(layer, jnp.int32).reshape(1),
        *operands,
    )
    return m[..., 0], l[..., 0], acc


def paged_attention_pass(
    spec, pool_k, pool_v, ks, vs, tables, n_past, slopes, window_pages,
    layer, qf,
):
    """online_pass hook (models/forward._attention_batched): qf
    [B, 1, Hkv, rep, D] -> (m, l, acc) over the paged cached keys, computed
    by the Pallas kernel. Shapes match _paged_online_pass exactly."""
    import os

    from llm_tpu.ops.qmatmul import _backend_mode

    B, T, Hkv, rep, D = qf.shape
    assert T == 1, "kernel path is decode-shaped (T=1)"
    q = qf[:, 0].astype(jnp.float32)
    m, l, acc = _paged_attention_call(
        pool_k, pool_v, ks, vs, tables, n_past, slopes, layer, q,
        window_pages=window_pages,
        kq_scale=float(spec.kq_scale),
        interpret=(_backend_mode() == "interpret"),
        hkv=Hkv, rep=rep, d=D,
        pps=_pages_per_step(pool_k, pool_v, window_pages),
    )
    return m[:, None], l[:, None], acc[:, None]


def _pages_per_step(pool_k, pool_v, window_pages: int) -> int:
    """Pages batched into one grid step (one concat + one wider dot).

    Deep windows at small batch are dominated by per-step grid overhead
    (65k steps/decode at MPT-8K B=2 with one page per step); batching
    pages amortizes it. Budget ~1 MiB of K+V per step (x2 double-buffered
    in VMEM), capped at 8 operand replicas to bound BlockSpec count."""
    import os

    env = os.environ.get("LLM_TPU_PAGED_PPS")
    if env:
        return max(1, min(int(env), window_pages))
    page, d = pool_k.shape[3], pool_k.shape[4]
    per_page = page * d * (pool_k.dtype.itemsize + pool_v.dtype.itemsize)
    return max(1, min(window_pages, (1 << 20) // per_page, 8))
