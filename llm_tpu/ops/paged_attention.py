"""Pallas paged-attention decode kernel: page tables as scalar prefetch.

The TPU-native replacement for gather-then-attend paged KV reads: the
kernel's grid is (streams, logical page groups) and the BlockSpec index
map for the K/V pool operands looks the physical page id up in the
scalar-prefetched page table, so pages stream DIRECTLY from HBM into VMEM
in logical order — each page is read exactly once, with no windowed-KV
gather copy in front of attention.

Layout/grid rationale:
- pool [L, NP, Hkv, page, D]: an ALL-HEADS page block [1, 1, Hkv, page, D]
  is one contiguous Hkv*page*D run, and the block's minor dims (page, D)
  satisfy Mosaic's sublane/lane tiling rules.
- heads are batched INSIDE one grid step, not spread over a grid dim. A
  per-head grid ((streams, pages, heads), one 64 KB DMA + one 1-row MXU
  dot per step) spends ~1 us of grid/DMA overhead per TINY step: at 64
  streams x 32 heads that was 2048 steps/layer and the whole decode ran
  at ~2 ms/layer of pure overhead. One [Hkv, page, D] block per step is
  a single ~1 MB DMA (amortized) and 32x fewer steps.
- the per-head dots are VPU broadcast-multiply-reduce, not MXU calls: at
  decode (rep=1 for MHA) an MXU dot has one useful row out of 8+ sublane
  rows, and 32 unrolled tiny dots per step measured ~2.5 ms/layer of
  instruction overhead; the elementwise form is ~2 M VPU MACs per step
  (~1-2 us), well under the DMA time.
- the online-softmax state lives in VMEM scratch ([Hkv, rep(, D)], whole
  blocks); pages advance in the minor grid dim, so the state threads
  correctly per stream.

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
    nw: int, kq_scale: float, quantized: bool, has_alibi: bool, pps: int,
    hc: int, packed: bool = False,
):
    def halves(block):
        """packed uint8 [.., dp] -> (lo, hi) f32 [.., dp] D-halves.

        One bitcast + int8->f32 convert, then pure f32 arithmetic: Mosaic
        legalizes neither 8-bit vector shifts (arith.shli on
        vector<..xi8>) nor a direct uint8->f32 cast, and the int32-widen
        + lane-concat form measured SLOWER than int8 on chip. On the
        SIGNED byte value v, floor(v/16) IS the arithmetic >>4, so the
        high nibble needs no fold; the low nibble is v mod 16 folded
        once. The callers dot each half against the matching half of q /
        accumulate output halves separately, so the full-D f32 block
        never materializes."""
        vf = jax.lax.bitcast_convert_type(block, jnp.int8).astype(
            jnp.float32)  # signed byte value, exact in f32
        hi = jnp.floor(vf * (1.0 / 16.0))  # == arithmetic v >> 4: signed
        lo = vf - hi * 16.0  # v mod 16: 0..15
        lo = lo - jnp.where(lo >= 8.0, 16.0, 0.0)  # two's-complement fold
        return lo, hi

    def kernel(*refs):
        # scalar prefetch: tables [B, P], n_past [B], layer [1]
        tbl_ref, npast_ref, _layer_ref = refs[0], refs[1], refs[2]
        i = 3
        q_ref = refs[i]; i += 1          # [1, Hkv, rep, D]
        k_refs = refs[i : i + pps]; i += pps  # pps x [1, 1, Hkv, page, D]
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

        @pl.when(j == 0)
        def _():
            m_s[...] = jnp.full(m_s.shape, NEG_INF, m_s.dtype)
            l_s[...] = jnp.zeros(l_s.shape, l_s.dtype)
            acc_s[...] = jnp.zeros(acc_s.shape, acc_s.dtype)

        npv = npast_ref[b]
        page = k_refs[0].shape[3]
        hkv = q_ref.shape[1]

        # per-page position masks are head-independent: compute once
        pos_ok = []
        for o in range(pps):
            pos = (j * pps + o) * page + lax.broadcasted_iota(
                jnp.int32, (1, 1, page), 2
            )
            pos_ok.append((pos, pos < npv))  # clamped dup pages mask out

        # The per-page f32 intermediates (pool block converted to f32 plus
        # the broadcast q*k / p*v products) are [heads, page, D] buffers —
        # at big-page geometries (MPT 8K: 32 heads x 256 x 128 = 4 MB each)
        # several live at once and blow the ~16 MB scoped-VMEM stack. The
        # online-softmax state is independent per head, so the body chunks
        # the kv heads: every intermediate is capped at [hc, page, D].
        for h0 in range(0, hkv, hc):
            h1 = min(h0 + hc, hkv)
            qh = q_ref[0, h0:h1].astype(jnp.float32)  # [hc, rep, D]

            s_parts, valid_parts = [], []
            for o in range(pps):
                # MXU batched dot (batch dims in equal positions — Mosaic's
                # requirement): measured 2x the VPU broadcast-reduce form
                # on the dense-cache kernel at 7B decode shapes
                if packed:
                    dh = k_refs[o].shape[4]
                    klo, khi = halves(k_refs[o][0, 0, h0:h1])
                    so = lax.dot_general(
                        qh[:, :, :dh], klo, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    ) + lax.dot_general(
                        qh[:, :, dh:], khi, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    )
                    so = so * kq_scale
                else:
                    ko = k_refs[o][0, 0, h0:h1].astype(jnp.float32)
                    so = lax.dot_general(
                        qh, ko, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    ) * kq_scale
                if quantized:
                    # dequant folded around the dot: k scale scales the
                    # SCORES per key position; v scale the probabilities
                    so = so * ks_refs[o][0, 0, h0:h1][:, None, :]
                pos, ok = pos_ok[o]
                if has_alibi:
                    so = so + (slopes_ref[h0:h1][:, :, None]
                               * pos.astype(jnp.float32))
                s_parts.append(jnp.where(ok, so, NEG_INF))
                valid_parts.append(ok)
            s = s_parts[0] if pps == 1 else jnp.concatenate(s_parts, axis=-1)
            valid = (
                valid_parts[0] if pps == 1
                else jnp.concatenate(valid_parts, axis=-1)
            )  # [1, 1, span]

            m_prev = m_s[h0:h1]  # [hc, rep, 1]
            m_new = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
            p = jnp.where(valid, jnp.exp(s - m_new), 0.0)  # [hc, rep, span]
            corr = jnp.exp(m_prev - m_new)
            m_s[h0:h1] = m_new
            l_s[h0:h1] = l_s[h0:h1] * corr + p.sum(axis=-1, keepdims=True)

            pv = None
            for o in range(pps):
                po = p[:, :, o * page : (o + 1) * page]
                if quantized:
                    po = po * vs_refs[o][0, 0, h0:h1][:, None, :]
                if packed:
                    vlo, vhi = halves(v_refs[o][0, 0, h0:h1])
                    part = jnp.concatenate(
                        [
                            lax.dot_general(
                                po, vlo, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32,
                            ),
                            lax.dot_general(
                                po, vhi, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32,
                            ),
                        ],
                        axis=-1,
                    )  # [hc, rep, D]: tiny (rep rows), cheap concat
                else:
                    vh = v_refs[o][0, 0, h0:h1].astype(jnp.float32)
                    part = lax.dot_general(
                        po, vh, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    )
                pv = part if pv is None else pv + part
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
        "window_pages", "kq_scale", "interpret", "hkv", "rep", "d", "pps",
        "hc",
    ),
)
def _paged_attention_call(
    pool_k, pool_v, ks, vs, tables, n_past, slopes, layer, q,
    *, window_pages, kq_scale, interpret, hkv, rep, d, pps=1, hc=None,
):
    B = q.shape[0]
    page = pool_k.shape[3]
    quantized = ks is not None
    has_alibi = slopes is not None
    packed = pool_k.dtype == jnp.uint8  # int4 pool: blocks are d//2 wide
    dp = pool_k.shape[4]
    nw = -(-window_pages // pps)  # page-GROUPS in the grid's minor dim

    # hc is static so callers (and the LLM_TPU_PAGED_HC override, resolved
    # OUTSIDE jit in paged_attention_pass) retrigger compilation on change.
    kernel = _make_kernel(nw, kq_scale, quantized, has_alibi, pps,
                          hc if hc is not None else _head_chunk(hkv, page, d),
                          packed)

    P = tables.shape[1]

    def im_q(b, j, tbl, npst, lyr):
        return (b, 0, 0, 0)

    def im_pool(off):
        # off-th page of the group; indices past the window clamp to the
        # last table column (its keys mask out via pos >= n_past)
        def im(b, j, tbl, npst, lyr):
            return (lyr[0], tbl[b, jnp.minimum(j * pps + off, P - 1)], 0, 0, 0)

        return im

    def im_scale(off):
        def im(b, j, tbl, npst, lyr):
            return (lyr[0], tbl[b, jnp.minimum(j * pps + off, P - 1)], 0, 0)

        return im

    in_specs = [pl.BlockSpec((1, hkv, rep, d), im_q)]
    operands = [q]
    in_specs += [
        pl.BlockSpec((1, 1, hkv, page, dp), im_pool(i)) for i in range(pps)
    ]
    operands += [pool_k] * pps
    in_specs += [
        pl.BlockSpec((1, 1, hkv, page, dp), im_pool(i)) for i in range(pps)
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
            pl.BlockSpec((hkv, rep), lambda b, j, tbl, npst, lyr: (0, 0))
        )
        operands.append(slopes)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, nw),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(
                (1, hkv, rep, 1), lambda b, j, tbl, npst, lyr: (b, 0, 0, 0)
            ),
            pl.BlockSpec(
                (1, hkv, rep, 1), lambda b, j, tbl, npst, lyr: (b, 0, 0, 0)
            ),
            pl.BlockSpec(
                (1, hkv, rep, d), lambda b, j, tbl, npst, lyr: (b, 0, 0, 0)
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((hkv, rep, 1), jnp.float32),
            pltpu.VMEM((hkv, rep, 1), jnp.float32),
            pltpu.VMEM((hkv, rep, d), jnp.float32),
        ],
    )
    bytes_accessed = (
        B * window_pages * page * hkv * dp * 2 * pool_k.dtype.itemsize
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
            # scratch
            dimension_semantics=("parallel", "arbitrary"),
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
        hc=_head_chunk(Hkv, pool_k.shape[3], D),
    )
    return m[:, None], l[:, None], acc[:, None]


def _head_chunk(hkv: int, page: int, d: int) -> int:
    """kv-heads processed per body iteration: cap each [hc, page, D] f32
    intermediate at ~1 MiB so the kernel's scoped-VMEM stack stays bounded
    at big-page geometries (env LLM_TPU_PAGED_HC overrides). Small pages
    (7B llama serve: 16-32 rows) keep hc=hkv — a single unchunked pass."""
    import os

    env = os.environ.get("LLM_TPU_PAGED_HC")
    if env:
        try:
            return max(1, min(int(env), hkv))
        except ValueError:
            pass  # malformed override: fall through to the computed default
    return max(1, min(hkv, (1 << 20) // (page * d * 4)))


def _pages_per_step(pool_k, pool_v, window_pages: int) -> int:
    """Pages batched into one grid step (one concat + wider online fold).

    A page group is an ALL-HEADS block, so one page of K+V is already
    Hkv*page*D*2 bytes (~2 MB at 7B geometry) — one well-amortized DMA.
    Batching more pages per step still helps deep windows (fewer grid
    steps); budget ~4 MiB of K+V per step (x2 double-buffered in VMEM),
    capped at 8 operand replicas to bound BlockSpec count."""
    import os

    env = os.environ.get("LLM_TPU_PAGED_PPS")
    if env:
        try:
            return max(1, min(int(env), window_pages))
        except ValueError:
            pass
    hkv, page, d = pool_k.shape[2], pool_k.shape[3], pool_k.shape[4]
    if page < 128:
        # grouping concatenates per-page score parts along lanes; with
        # sub-128 pages Mosaic fails the relayout ("invalid vector
        # register cast", measured on chip at page 16 and 64 with pps=2;
        # page 128 and 256 lower fine). One page per step is correct at
        # any page size.
        return 1
    per_page = hkv * page * d * (pool_k.dtype.itemsize + pool_v.dtype.itemsize)
    return max(1, min(window_pages, (4 << 20) // per_page, 8))
