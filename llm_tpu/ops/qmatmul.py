"""Fused dequantize->matmul — the hot kernel of the framework.

TPU analog of ggml's per-qtype fused `vec_dot` mul_mat kernels
(/root/reference/crates/ggml/sys/src/lib.rs:2900-2974, type-traits table):
weights stream from HBM *bit-packed*, are unpacked and dequantized in VMEM
tiles, and feed the MXU as bf16 with f32 accumulation. HBM traffic is the
packed size (e.g. 4.5 bits/weight for Q4_0), which is the roofline that
matters for decode.

Two paths:
- Pallas kernel (TPU): grid (R_tiles, K_tiles), K innermost so the f32
  accumulator tile stays resident in VMEM; per-tile unpack is a shift/mask
  on uint32 lanes and a no-op reshape thanks to the K-major plane layout
  (see llm_tpu/ops/packing.py).
- XLA fallback (CPU / debugging): dequantize whole matrix, one jnp.dot.

Backend selection: env LLM_TPU_KERNELS in {auto, pallas, xla, interpret}.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llm_tpu.ops.packing import (
    QuantTensor,
    QuantTensorC,
    QFormat,
    dequant_jnp,
    dequant_c_jnp,
    expand_f16x2,
    unpack_plane,
    _expand_groups,
)


def _backend_mode() -> str:
    return os.environ.get("LLM_TPU_KERNELS", "auto")


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def _use_pallas() -> bool:
    mode = _backend_mode()
    if mode == "pallas":
        return True
    if mode in ("xla",):
        return False
    if mode == "interpret":
        return True
    return _on_tpu()


# ---------------------------------------------------------------------------
# Pallas kernel


from llm_tpu.ops.packing import _round_up  # noqa: E402  (shared helper)


def _tile_prefs(Mp: int, tile_r: Optional[int], tile_k: Optional[int]):
    """Preferred tile sizes. Decode-shaped calls (few rows) want BIG tiles:
    on chip the kernel streams 141 GB/s at (512, 256) but 235 GB/s at
    (2048, 512) — fewer grid steps means less per-step overhead and longer
    DMA bursts. Prefill-shaped calls keep the x tile [Mp, tile_k] and the
    dequant intermediate within VMEM with the smaller classic tiles (they
    are MXU-bound anyway). Env LLM_TPU_TILE_K / LLM_TPU_TILE_R override."""
    ek = os.environ.get("LLM_TPU_TILE_K")
    er = os.environ.get("LLM_TPU_TILE_R")
    if Mp <= 64:  # decode blocks: 141 -> 235 GB/s
        dk, dr = 2048, 512
    elif Mp <= 512:  # prefill chunks: +7% measured; x tile 4 MB fits
        dk, dr = 2048, 256
    else:  # large-M calls: keep the x tile and intermediates small
        dk, dr = 512, 256
    if tile_k is None:
        tile_k = int(ek) if ek else dk
    if tile_r is None:
        tile_r = int(er) if er else dr
    return tile_r, tile_k


def _pick_tile(n: int, pref: int, step: int) -> int:
    """Largest multiple of `step` that divides n and is <= pref (n itself
    as fallback when n has no such divisor)."""
    t = min(pref, n)
    t = (t // step) * step
    while t >= step:
        if n % t == 0:
            return t
        t -= step
    return n


def _k_step(fmt: QFormat, packed: bool, Kp: int) -> int:
    """K-tile granularity: every plane's SUBLANE block (tile_k divided by
    that plane's per-row packing width) must be a multiple of 8, or the
    tile must span the whole (padded) K — a Mosaic tiling requirement that
    real geometries hit (e.g. GPT-2 E=768 picked tile_k=384 -> 12 scale
    rows and failed to lower). So tile_k must be a multiple of 8x the
    COARSEST plane width; _pick_tile falls back to full-K when no such
    divisor exists (full blocks are always legal)."""
    widths = [fmt.gsize * (2 if packed else 1)]
    if fmt.lo_bits < 8:
        widths.append(32 // fmt.lo_bits)
    if fmt.hi_bits:
        widths.append(32 // fmt.hi_bits)
    step = 8 * max(widths)
    return step if step <= Kp else Kp


def _x_resident(Mp: int, Kp: int) -> bool:
    """Whether to keep the WHOLE activation block VMEM-resident.

    With the default per-k-tile x BlockSpec the x block index changes every
    grid step, so Mosaic re-streams the full [Mp, Kp] activation from HBM
    once per R tile — at decode shapes that is 13-25% of the kernel's HBM
    traffic on top of the packed planes (e.g. M=8, K=4096, R=11008,
    tile_r=512: 22 r-tiles x 64 KB). Passing x as [n_k, Mp, tile_k] under a
    CONSTANT index map makes the copy happen once (consecutive equal block
    indices are elided) and the kernel selects the k-slice in VMEM.
    Gated by a VMEM budget (~16 MB/core total): 2 MB covers every
    decode/serve shape (M<=64 at K<=11008 is 1.4 MB) and leaves prefill
    (M=512: 4.2-11.3 MB) on the streaming path. LLM_TPU_X_RES_MB overrides
    (0 disables). Default OFF until the in-kernel dynamic leading-dim
    slice is Mosaic-verified on chip (interpret mode proves semantics,
    not lowering; flip the default to "2" once the A/B runs)."""
    budget = float(os.environ.get("LLM_TPU_X_RES_MB", "0")) * 1e6
    return Mp * Kp * 2 <= budget


def _make_kernel(
    fmt: QFormat,
    n_k: int,
    out_dtype,
    stacked: bool = False,
    scale_packed: bool = False,
    x_resident: bool = False,
    sub_slices: int = 1,
):
    """Build the kernel body for a given static format.

    `stacked`: weight refs carry a leading layer-block dim of 1 (the layer is
    selected by the scalar-prefetch index map), and the first ref is the
    scalar layer index (unused in the body).
    `scale_packed`: scale/bias planes hold two f16 values per uint32 lane;
    expanded in-register with integer ops (Mosaic has no f16).
    `x_resident`: the x ref is the whole [n_k, Mp, tile_k] activation under
    a constant index map (one HBM copy total); the body indexes out the
    current k-block instead of receiving a per-step streamed tile.
    `sub_slices`: unpack/dequant/dot the K tile in this many sequential
    sub-slices, so the int32/f32/bf16 dequant intermediates occupy
    tile_k/sub_slices rows of VMEM while the DMA block (and grid-step
    count) stays sized by the FULL tile — on chip the measured kernel
    rate is grid-step-bound (141→235 GB/s from 344→44 steps at fixed
    work), and VMEM intermediates are what capped tile_k growth.
    """

    def kernel(*refs):
        i = 0
        if stacked:
            i += 1  # scalar-prefetch layer index (consumed by index maps)
        x_ref = refs[i]
        lo_ref = refs[i + 1]
        i += 2
        hi_ref = None
        if fmt.hi_bits:
            hi_ref = refs[i]
            i += 1
        scale_ref = refs[i]
        i += 1
        bias_ref = None
        if fmt.has_bias:
            bias_ref = refs[i]
            i += 1
        out_ref = refs[i]
        acc_ref = refs[i + 1]

        def W(ref):
            return ref[0] if stacked else ref[:]

        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        def sub(a, s):
            """Rows of sub-slice s (static slice; a's leading dim divides
            evenly by construction in the caller)."""
            rows = a.shape[0] // sub_slices
            return a[s * rows: (s + 1) * rows] if sub_slices > 1 else a

        def S(ref):
            x = W(ref)
            return expand_f16x2(x) if scale_packed else x.astype(jnp.float32)

        lo = W(lo_ref)
        hi = W(hi_ref) if hi_ref is not None else None
        scale = S(scale_ref)
        bias = S(bias_ref) if bias_ref is not None else None
        xk = x_ref[k] if x_resident else x_ref[:]
        sub_k = xk.shape[-1] // sub_slices

        acc = jnp.zeros_like(acc_ref)
        for s in range(sub_slices):
            if fmt.lo_bits == 8:
                q = sub(lo, s).astype(jnp.int32)
            else:
                q = unpack_plane(sub(lo, s), fmt.lo_bits,
                                 signed=fmt.signed_lo)
                if hi is not None:
                    q = q | (unpack_plane(sub(hi, s), fmt.hi_bits)
                             << fmt.lo_bits)

            # Dequant stays in f32 lanes; two measured NEGATIVE results on
            # chip keep it this way (do not re-try without new Mosaic
            # evidence):
            # - bf16-lane dequant (int->bf16 cvt + bf16 mul): 206 vs 235
            #   GB/s — Mosaic does not 2x-pack bf16 VPU ops, and it rounds
            #   f16 scales.
            # - group-blocked dot (scale mul hoisted out of the hot loop
            #   into a [G,M,R] contraction, batched K=32 MXU dots): 230
            #   GB/s / 58.9 tok/s vs 234 / 62.8 — the batched small-K dots
            #   cost more than the saved per-element multiply+cast.
            zero = 0 if fmt.signed_lo else fmt.zero
            w = (q - zero if zero else q).astype(jnp.float32) * _expand_groups(
                sub(scale, s), fmt.gsize
            )
            if bias is not None:
                w = w + _expand_groups(sub(bias, s), fmt.gsize)
            w = w.astype(jnp.bfloat16)

            x = xk[:, s * sub_k: (s + 1) * sub_k].astype(jnp.bfloat16)
            acc = acc + jnp.dot(x, w, preferred_element_type=jnp.float32)
        acc_ref[:] += acc

        @pl.when(k == n_k - 1)
        def _():
            out_ref[:] = acc_ref[:].astype(out_dtype)

    return kernel


# ---------------------------------------------------------------------------
# coalesced-layout kernel: one contiguous DMA per grid step
#
# The plane kernel above issues one block DMA per plane per grid step, and
# each of those blocks is a strided gather of tile_r*4-byte row fragments
# out of an R-wide plane in HBM. The coalesced layout (packing.QuantTensorC)
# stores each (r, k) weight block — lo rows, hi rows, scale rows, bias rows —
# as ONE linear span, so the whole block arrives in a single unbroken DMA
# burst. This is the round-5 experiment against the packed-plane DMA-pattern
# hypothesis (the fused kernel sustained ~235-288 GB/s vs ~360-415 dense).


def _make_kernel_c(fmt, n_k, out_dtype, segs, stacked, scale_packed,
                   sub_slices):
    lo_r, hi_r, sc_r, b_r = segs

    def kernel(*refs):
        i = 1 if stacked else 0
        x_ref, buf_ref, out_ref, acc_ref = refs[i], refs[i + 1], refs[i + 2], refs[i + 3]
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        buf = buf_ref[0] if stacked else buf_ref[:]
        o = lo_r
        lo = buf[:lo_r]
        hi = None
        if hi_r:
            hi = buf[o : o + hi_r]
            o += hi_r
        scw = buf[o : o + sc_r]
        o += sc_r
        bw = buf[o : o + b_r] if b_r else None

        def S(w):
            if scale_packed:
                return expand_f16x2(w)
            return jax.lax.bitcast_convert_type(w, jnp.float32)

        def sub(a, s):
            if a is None or sub_slices == 1:
                return a
            rows = a.shape[0] // sub_slices
            return a[s * rows : (s + 1) * rows]

        xk = x_ref[:]
        sub_k = xk.shape[-1] // sub_slices
        acc = jnp.zeros_like(acc_ref)
        for s in range(sub_slices):
            if fmt.lo_bits == 8:
                q = unpack_plane(sub(lo, s), 8, signed=True)
            else:
                q = unpack_plane(sub(lo, s), fmt.lo_bits,
                                 signed=fmt.signed_lo)
                if hi is not None:
                    q = q | (unpack_plane(sub(hi, s), fmt.hi_bits)
                             << fmt.lo_bits)
            zero = 0 if (fmt.signed_lo or fmt.lo_bits == 8) else fmt.zero
            w = (q - zero if zero else q).astype(jnp.float32) * _expand_groups(
                S(sub(scw, s)), fmt.gsize
            )
            if bw is not None:
                w = w + _expand_groups(S(sub(bw, s)), fmt.gsize)
            w = w.astype(jnp.bfloat16)
            x = xk[:, s * sub_k : (s + 1) * sub_k].astype(jnp.bfloat16)
            acc = acc + jnp.dot(x, w, preferred_element_type=jnp.float32)
        acc_ref[:] += acc

        @pl.when(k == n_k - 1)
        def _():
            out_ref[:] = acc_ref[:].astype(out_dtype)

    return kernel


def _pick_sub_c(segs, tile_k: int, target: int) -> int:
    """Sub-slice count for the coalesced kernel: every non-empty segment's
    sliced row count must stay a multiple of 8 (static VMEM slicing at
    sublane granularity) and tile_k must divide evenly."""
    if target <= 0 or tile_k <= target:
        return 1
    for n in range(tile_k // target, 1, -1):
        if tile_k % n:
            continue
        if all(s % n == 0 and (s // n) % 8 == 0 for s in segs if s):
            return n
    return 1


def _sub_target_c(tile_r: int) -> int:
    """Default K elements per dequant sub-slice: bound the int32/f32/bf16
    dequant intermediates to ~2M elements (8 MB int32) regardless of
    tile_r, so wide-R tiles stay within VMEM. LLM_TPU_SUB_K overrides."""
    env = _sub_k_target()
    if env:
        return env
    return max(512, (2048 * 256) // max(tile_r, 1))


def coalesce_tiles(fmt: QFormat, Kp: int, Rp: int, packed: bool,
                   sub_target: Optional[int] = None) -> tuple[int, int, int]:
    """Default (tile_k, tile_r, sub_slices) for coalescing a weight,
    decode-optimized (round-5 chip A/B: fewer, bigger grid steps win —
    276 -> 348 GB/s marginal): whole-K in one grid step when a bounded
    sub-slicing keeps the dequant intermediates VMEM-sized, else the
    largest legal tile_k <= 2048. tile_r <= 512 (lane-dim divisor of Rp;
    callers pad R via pad_r_qt to make 512 available)."""
    from llm_tpu.ops.packing import coalesced_seg_rows

    tile_r = _pick_tile(Rp, 512, 128)
    if sub_target is None:
        sub_target = _sub_target_c(tile_r)

    def legal(tk):
        segs = coalesced_seg_rows(fmt, tk, packed)
        return Kp % tk == 0 and all(s % 8 == 0 for s in segs if s)

    if legal(Kp):
        segs = coalesced_seg_rows(fmt, Kp, packed)
        n = _pick_sub_c(segs, Kp, sub_target)
        if Kp <= max(2048, sub_target) or (
            n > 1 and Kp // n <= max(2048, sub_target)
        ):
            return Kp, tile_r, n
    for tk in range(min(2048, Kp), 63, -64):
        if legal(tk):
            segs = coalesced_seg_rows(fmt, tk, packed)
            return tk, tile_r, _pick_sub_c(segs, tk, sub_target)
    raise ValueError(
        f"no legal coalesce tile_k for {fmt.name} Kp={Kp}"
    )


def coalesce_auto(qt, to_device: bool = False,
                  min_k: Optional[int] = None):
    """QuantTensorC for `qt` under the best legal tiling, or None when the
    layout would not pay (caller keeps the plane layout).

    Size gate (chip-measured): the coalesced win comes from long DMA
    bursts over big K tiles — at 7B geometry it lifts decode 67.6 -> 77.2
    tok/s (+13%), but on small-K weights (gpt2's K=768: 2-grid-step
    kernels, R padded 768 -> 1024 = +33% bytes) the model-level A/B
    measured 0.556x. So: only coalesce when Kp >= 2048 and the wide-lane
    R padding wastes <= 5% of the bytes.

    Tries the f16-packed scale layout first; falls back to lossless
    f32-expanded scales (a few % more scale bytes) for K values whose
    packed-scale segment rows cannot hit the 8-sublane granularity."""
    from llm_tpu.ops.packing import (
        _round_up as _ru,
        coalesce_qt,
        pad_r_qt,
        unpack_scales_qt,
    )

    if min_k is None:
        min_k = int(os.environ.get("LLM_TPU_COALESCE_MIN_K", "2048") or 0)
    if qt.k_padded < min_k:
        return None
    # widest lane-tile padding whose byte waste stays <= 5% (padded
    # columns dequant to 0; r_padded is already a 128-multiple, so the
    # loop always terminates)
    for mult in (512, 256, 128):
        if (_ru(qt.r_padded, mult) - qt.r_padded) * 20 <= qt.r_padded:
            qt = pad_r_qt(qt, mult)
            break
    cands = (qt, unpack_scales_qt(qt)) if qt.scale_packed else (qt,)
    for cand in cands:
        try:
            tk, tr, _ = coalesce_tiles(cand.fmt, cand.k_padded,
                                       cand.r_padded, cand.scale_packed)
        except ValueError:
            continue
        return coalesce_qt(cand, tk, tr, to_device=to_device)
    return None


@partial(jax.jit, static_argnames=("interpret",))
def _qmatmul_pallas_c(x, qtc, *, interpret=False):
    """x [M, K] @ dequant(coalesced qtc) [K, R] -> [M, R]."""
    fmt = qtc.fmt
    Kp, Rp = qtc.kp, qtc.rp
    tile_k, tile_r = qtc.tile_k, qtc.tile_r
    segs = qtc.seg_rows
    rows = sum(segs)
    n_r, n_k = Rp // tile_r, Kp // tile_k
    n_sub = _pick_sub_c(segs, tile_k, _sub_target_c(tile_r))
    M = x.shape[0]
    Mp = _round_up(max(M, 8), 8)
    if x.shape != (Mp, Kp):
        x = jnp.pad(x, ((0, Mp - M), (0, Kp - x.shape[1])))
    x = x.astype(jnp.bfloat16)

    in_specs = [
        pl.BlockSpec((Mp, tile_k), lambda r, k: (0, k)),
        pl.BlockSpec((rows, tile_r), lambda r, k: (r * n_k + k, 0)),
    ]
    kernel = _make_kernel_c(fmt, n_k, jnp.float32, segs, False,
                            qtc.scale_packed, n_sub)
    y = pl.pallas_call(
        kernel,
        grid=(n_r, n_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Mp, tile_r), lambda r, k: (0, r)),
        out_shape=jax.ShapeDtypeStruct((Mp, Rp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Mp, tile_r), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Kp * Rp,
            bytes_accessed=qtc.buf.size * 4 + x.size * 2 * n_r + Mp * Rp * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, qtc.buf)
    return y[:M, : qtc.r]


@partial(jax.jit, static_argnames=("interpret",))
def _qmatmul_pallas_c_stacked(x, qtc, layer, *, interpret=False):
    """x [M, K] @ dequant(coalesced qtc[layer]) [K, R] -> [M, R]; the layer
    is selected by scalar-prefetch index maps (no slice copy)."""
    fmt = qtc.fmt
    Kp, Rp = qtc.kp, qtc.rp
    tile_k, tile_r = qtc.tile_k, qtc.tile_r
    segs = qtc.seg_rows
    rows = sum(segs)
    n_r, n_k = Rp // tile_r, Kp // tile_k
    n_sub = _pick_sub_c(segs, tile_k, _sub_target_c(tile_r))
    M = x.shape[0]
    Mp = _round_up(max(M, 8), 8)
    if x.shape != (Mp, Kp):
        x = jnp.pad(x, ((0, Mp - M), (0, Kp - x.shape[1])))
    x = x.astype(jnp.bfloat16)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_r, n_k),
        in_specs=[
            pl.BlockSpec((Mp, tile_k), lambda r, k, l: (0, k)),
            pl.BlockSpec((1, rows, tile_r),
                         lambda r, k, l: (l[0], r * n_k + k, 0)),
        ],
        out_specs=pl.BlockSpec((Mp, tile_r), lambda r, k, l: (0, r)),
        scratch_shapes=[pltpu.VMEM((Mp, tile_r), jnp.float32)],
    )
    kernel = _make_kernel_c(fmt, n_k, jnp.float32, segs, True,
                            qtc.scale_packed, n_sub)
    y = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, Rp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Kp * Rp,
            bytes_accessed=qtc.buf.size // qtc.buf.shape[0] * 4
            + x.size * 2 * n_r + Mp * Rp * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), x, qtc.buf)
    return y[:M, : qtc.r]


def _sub_k_target() -> int:
    return int(os.environ.get("LLM_TPU_SUB_K", "0") or 0)


def _pick_sub_slices(fmt: QFormat, packed: bool, tile_k: int,
                     g_rows: int) -> int:
    """Number of K sub-slices for the kernel body (env LLM_TPU_SUB_K =
    target elements per slice; 0/unset = off). Every plane's sliced row
    count must stay a whole multiple of the 8-sublane granularity, so the
    slice count is walked down until tile_k/n respects the same k_step
    rule as the tile itself and g_rows divides evenly."""
    target = _sub_k_target()
    if target <= 0 or tile_k <= target:
        return 1
    step = _k_step(fmt, packed, tile_k)
    for n in range(tile_k // target, 1, -1):
        if tile_k % n == 0 and (tile_k // n) % step == 0 and g_rows % n == 0:
            return n
    return 1


def _maybe_full_k(fmt: QFormat, packed: bool, Kp: int, Mp: int,
                  tile_k: int) -> tuple[int, int]:
    """(tile_k, sub_slices): upgrade a decode-shaped call to a whole-K
    tile ONLY when the sub-sliced body actually engages there with a
    bounded slice (<= max(2048, target) elements) — otherwise a lone
    whole-K slice would materialize the exact VMEM-sized intermediates
    the tile caps exist to avoid (e.g. Kp=11008 with step=512 admits no
    legal slicing). Prefill shapes keep their tiles: their [Mp, tile_k]
    x block is the VMEM constraint, not the dequant intermediates."""
    target = _sub_k_target()
    if target > 0 and Mp <= 64 and Kp > tile_k:
        g_rows_full = Kp // fmt.gsize // (2 if packed else 1)
        n = _pick_sub_slices(fmt, packed, Kp, g_rows_full)
        if n > 1 and Kp // n <= max(2048, target):
            return Kp, n
    g_rows = tile_k // fmt.gsize // (2 if packed else 1)
    return tile_k, _pick_sub_slices(fmt, packed, tile_k, g_rows)


@partial(jax.jit, static_argnames=("tile_r", "tile_k", "interpret"))
def _qmatmul_pallas(
    x: jnp.ndarray,
    qt: QuantTensor,
    *,
    tile_r: Optional[int] = None,
    tile_k: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """x [M, K] @ dequant(qt) [K, R] -> [M, R] (padded dims trimmed)."""
    fmt = qt.fmt
    Kp, Rp = qt.k_padded, qt.r_padded
    packed = qt.scale_packed
    k_step = _k_step(fmt, packed, Kp)
    M = x.shape[0]
    Mp = _round_up(max(M, 8), 8)
    tile_r, tile_k = _tile_prefs(Mp, tile_r, tile_k)
    tile_r = _pick_tile(Rp, tile_r, 128)
    tile_k = _pick_tile(Kp, tile_k, k_step)
    tile_k, n_sub = _maybe_full_k(fmt, packed, Kp, Mp, tile_k)
    assert Rp % tile_r == 0 and Kp % tile_k == 0, (Rp, tile_r, Kp, tile_k)
    g_rows = tile_k // fmt.gsize // (2 if packed else 1)
    if x.shape != (Mp, Kp):
        x = jnp.pad(x, ((0, Mp - M), (0, Kp - x.shape[1])))
    # the kernel feeds the MXU in bf16 either way; casting the operand
    # outside halves x HBM traffic with bit-identical results
    x = x.astype(jnp.bfloat16)

    n_r, n_k = Rp // tile_r, Kp // tile_k
    g = fmt.gsize

    x_res = _x_resident(Mp, Kp)
    if x_res:
        # [n_k, Mp, tile_k] under a constant index map: one HBM copy total,
        # the kernel indexes the k-block in VMEM
        in_specs = [
            pl.BlockSpec((n_k, Mp, tile_k), lambda r, k: (0, 0, 0)),
        ]
        operands = [x.reshape(Mp, n_k, tile_k).swapaxes(0, 1)]
    else:
        in_specs = [
            pl.BlockSpec((Mp, tile_k), lambda r, k: (0, k)),  # x
        ]
        operands = [x]
    if fmt.lo_bits == 8:
        in_specs.append(pl.BlockSpec((tile_k, tile_r), lambda r, k: (k, r)))
    else:
        pw = 32 // fmt.lo_bits
        in_specs.append(pl.BlockSpec((tile_k // pw, tile_r), lambda r, k: (k, r)))
    operands.append(qt.lo)
    if fmt.hi_bits:
        pwh = 32 // fmt.hi_bits
        in_specs.append(pl.BlockSpec((tile_k // pwh, tile_r), lambda r, k: (k, r)))
        operands.append(qt.hi)
    in_specs.append(pl.BlockSpec((g_rows, tile_r), lambda r, k: (k, r)))
    operands.append(qt.scale)
    if fmt.has_bias:
        in_specs.append(pl.BlockSpec((g_rows, tile_r), lambda r, k: (k, r)))
        operands.append(qt.bias)

    out_dtype = jnp.float32
    kernel = _make_kernel(
        fmt, n_k, out_dtype, scale_packed=packed, x_resident=x_res,
        sub_slices=n_sub,
    )

    flops = 2 * Mp * Kp * Rp
    bytes_accessed = (
        qt.lo.size * qt.lo.dtype.itemsize
        + (qt.hi.size * 4 if qt.hi is not None else 0)
        + qt.scale.size * qt.scale.dtype.itemsize
        + (qt.bias.size * qt.bias.dtype.itemsize if qt.bias is not None else 0)
        + x.size * 2 * (1 if x_res else n_r)
        + Mp * Rp * 4
    )

    y = pl.pallas_call(
        kernel,
        grid=(n_r, n_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Mp, tile_r), lambda r, k: (0, r)),
        out_shape=jax.ShapeDtypeStruct((Mp, Rp), out_dtype),
        scratch_shapes=[pltpu.VMEM((Mp, tile_r), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(*operands)
    return y[:M, : qt.r]


@partial(jax.jit, static_argnames=("tile_r", "tile_k", "interpret"))
def _qmatmul_pallas_stacked(
    x: jnp.ndarray,
    qt: QuantTensor,  # planes stacked with a leading n_layer axis
    layer: jnp.ndarray,  # scalar int32 layer index
    *,
    tile_r: Optional[int] = None,
    tile_k: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """x [M, K] @ dequant(qt[layer]) [K, R] -> [M, R].

    The layer is selected via PrefetchScalarGridSpec index maps, so the
    kernel streams tiles DIRECTLY from the stacked [L, ., R] planes in HBM —
    under a lax.scan over layers this avoids the per-iteration weight-slice
    copy XLA would otherwise materialize in front of an opaque kernel call
    (measured 4-5x decode overhead on a 7B model).
    """
    fmt = qt.fmt
    g = fmt.gsize
    packed = qt.scale.dtype == jnp.uint32
    Kp = qt.scale.shape[-2] * g * (2 if packed else 1)
    Rp = qt.scale.shape[-1]
    k_step = _k_step(fmt, packed, Kp)
    M = x.shape[0]
    Mp = _round_up(max(M, 8), 8)
    tile_r, tile_k = _tile_prefs(Mp, tile_r, tile_k)
    tile_r = _pick_tile(Rp, tile_r, 128)
    tile_k = _pick_tile(Kp, tile_k, k_step)
    tile_k, n_sub = _maybe_full_k(fmt, packed, Kp, Mp, tile_k)
    g_rows = tile_k // g // (2 if packed else 1)
    if x.shape != (Mp, Kp):
        x = jnp.pad(x, ((0, Mp - M), (0, Kp - x.shape[1])))
    x = x.astype(jnp.bfloat16)  # the kernel dots in bf16 either way

    n_r, n_k = Rp // tile_r, Kp // tile_k

    x_res = _x_resident(Mp, Kp)
    # index maps receive the scalar-prefetch ref first
    if x_res:
        in_specs = [
            pl.BlockSpec((n_k, Mp, tile_k), lambda r, k, l: (0, 0, 0)),
        ]
        operands = [x.reshape(Mp, n_k, tile_k).swapaxes(0, 1)]
    else:
        in_specs = [
            pl.BlockSpec((Mp, tile_k), lambda r, k, l: (0, k)),  # x
        ]
        operands = [x]
    if fmt.lo_bits == 8:
        in_specs.append(
            pl.BlockSpec((1, tile_k, tile_r), lambda r, k, l: (l[0], k, r))
        )
    else:
        pw = 32 // fmt.lo_bits
        in_specs.append(
            pl.BlockSpec((1, tile_k // pw, tile_r), lambda r, k, l: (l[0], k, r))
        )
    operands.append(qt.lo)
    if fmt.hi_bits:
        pwh = 32 // fmt.hi_bits
        in_specs.append(
            pl.BlockSpec((1, tile_k // pwh, tile_r), lambda r, k, l: (l[0], k, r))
        )
        operands.append(qt.hi)
    in_specs.append(
        pl.BlockSpec((1, g_rows, tile_r), lambda r, k, l: (l[0], k, r))
    )
    operands.append(qt.scale)
    if fmt.has_bias:
        in_specs.append(
            pl.BlockSpec((1, g_rows, tile_r), lambda r, k, l: (l[0], k, r))
        )
        operands.append(qt.bias)

    out_dtype = jnp.float32
    kernel = _make_kernel(
        fmt, n_k, out_dtype, stacked=True, scale_packed=packed,
        x_resident=x_res, sub_slices=n_sub,
    )

    flops = 2 * Mp * Kp * Rp
    bytes_accessed = (
        qt.lo.size // qt.lo.shape[0] * qt.lo.dtype.itemsize
        + qt.scale.size // qt.scale.shape[0] * qt.scale.dtype.itemsize
        + x.size * 2 * (1 if x_res else n_r)
        + Mp * Rp * 4
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_r, n_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Mp, tile_r), lambda r, k, l: (0, r)),
        scratch_shapes=[pltpu.VMEM((Mp, tile_r), jnp.float32)],
    )
    y = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, Rp), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), *operands)
    return y[:M, : qt.r]


# ---------------------------------------------------------------------------
# public API


class BoundWeight:
    """A layer-stacked weight bound to a (traced) layer index: qmatmul on it
    selects the layer inside the kernel via scalar prefetch instead of
    slicing (which would copy in front of the opaque kernel call)."""

    __slots__ = ("w", "layer")

    def __init__(self, w, layer):
        self.w = w
        self.layer = layer


def qmatmul(x: jnp.ndarray, w, layer=None) -> jnp.ndarray:
    if isinstance(w, BoundWeight):
        w, layer = w.w, w.layer
    """y = x @ W for dense ([K, R] array) or quantized (QuantTensor) weights.

    x: [..., K] float; returns [..., R] float32.
    `layer`: when W's planes are stacked with a leading n_layer axis (scan
    over layers), selects the layer inside the kernel via scalar prefetch —
    no weight-slice copy.
    """
    if isinstance(w, QuantTensorC):
        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        mode = _backend_mode()
        if layer is not None:
            if _use_pallas():
                y = _qmatmul_pallas_c_stacked(
                    x2, w, layer, interpret=(mode == "interpret")
                )
            else:
                y = x2 @ dequant_c_jnp(w, jnp.float32, buf=w.buf[layer])
        elif _use_pallas():
            y = _qmatmul_pallas_c(x2, w, interpret=(mode == "interpret"))
        else:
            y = x2 @ dequant_c_jnp(w, jnp.float32)
        return y.reshape(*lead, w.r)
    if isinstance(w, QuantTensor):
        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        mode = _backend_mode()
        if layer is not None:
            if _use_pallas():
                y = _qmatmul_pallas_stacked(
                    x2, w, layer, interpret=(mode == "interpret")
                )
            else:
                sliced = QuantTensor(
                    w.fmt_name, w.k, w.r,
                    w.lo[layer],
                    w.hi[layer] if w.hi is not None else None,
                    w.scale[layer],
                    w.bias[layer] if w.bias is not None else None,
                )
                y = x2 @ dequant_jnp(sliced, jnp.float32)
            return y.reshape(*lead, w.r)
        if _use_pallas():
            y = _qmatmul_pallas(x2, w, interpret=(mode == "interpret"))
        else:
            y = x2 @ dequant_jnp(w, jnp.float32)
        return y.reshape(*lead, w.r)
    if layer is not None:
        w = w[layer]  # dense stacked [L, K, R]
    # dense: bf16 feeds the MXU with f32 accumulation on TPU; plain f32 on
    # CPU (bf16 there is emulated and only loses precision). Override with
    # LLM_TPU_MATMUL_DTYPE=float32|bfloat16.
    md = os.environ.get("LLM_TPU_MATMUL_DTYPE")
    dt = jnp.dtype(md) if md else (jnp.bfloat16 if _on_tpu() else jnp.float32)
    return jax.lax.dot_general(
        x.astype(dt),
        w.astype(dt),
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def quant_rows_lookup(w, ids: jnp.ndarray) -> jnp.ndarray:
    """Embedding lookup: dequantize the selected logical rows.

    ggml get_rows analog: for a table stored K-major ([K-planes, R=vocab]),
    gather columns `ids` then dequantize. Returns [len(ids), K] float32.
    """
    if isinstance(w, QuantTensor):
        fmt = w.fmt
        lo = w.lo[:, ids]
        hi = w.hi[:, ids] if w.hi is not None else None
        scale = w.scale[:, ids]
        bias = w.bias[:, ids] if w.bias is not None else None
        sub = QuantTensor(w.fmt_name, w.k, ids.shape[0], lo, hi, scale, bias)
        return dequant_jnp(sub, jnp.float32).T
    return w[:, ids].astype(jnp.float32).T
