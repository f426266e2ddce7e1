"""Packed on-device representation of block-quantized weights.

Every GGML quant format canonicalizes (llm_tpu/ggml/quant.py:decode_blocks) to

    value[k, r] = (q[k, r] - zero) * scale[k // g, r] + bias[k // g, r]

so on device a quantized matrix is at most three planes, all laid out
**K-major** (reduction dim in sublanes, output dim in lanes) so that a Pallas
kernel's bit-unpack `[K/pw, pw, R] -> [K, R]` reshape is a no-op view and the
dequantized tile feeds the MXU without a transpose:

    lo     uint32 [K/pw_lo, R]   pw = 32 // lo_bits   (int8 [K, R] for q8_0)
    hi     uint32 [K/pw_hi, R]   optional extra high bits (5/3/6-bit formats)
    scale  f32    [K/g, R]
    bias   f32    [K/g, R]       optional (formats with per-group mins)

This replaces the reference's per-qtype fused `ggml_vec_dot_*` type-traits
table (/root/reference/crates/ggml/sys/src/lib.rs:2900-2974) — the TPU analog
keeps weights packed until VMEM instead of dequantizing rows on the fly per
dot product.

K and R are padded up to hardware-friendly multiples at pack time; the
logical (in_features, out_features) are kept as static metadata and padding
regions carry scale 0 so they contribute nothing.
"""

from __future__ import annotations

import os

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from llm_tpu.ggml.quant import decode_blocks
from llm_tpu.ggml.types import GgmlType


@dataclass(frozen=True)
class QFormat:
    """Static descriptor of a canonical quant layout."""

    name: str
    lo_bits: int  # 2, 4 or 8
    hi_bits: int  # 0, 1 or 2
    zero: int
    gsize: int  # elements per scale group
    has_bias: bool
    # lo plane stores (q - zero) as a two's-complement field (q XOR zero at
    # pack time for power-of-two zeros): unpack sign-extends with two
    # shifts instead of shift+mask+subtract — one fewer VPU op per weight
    # on the decode hot path (chip-measured +6% kernel stream rate).
    # Only formats whose value is a SINGLE field qualify (no hi plane).
    signed_lo: bool = False

    @property
    def bits(self) -> int:
        return self.lo_bits + self.hi_bits


FORMATS: dict[GgmlType, QFormat] = {
    GgmlType.Q4_0: QFormat("q4_0", 4, 0, 8, 32, False, signed_lo=True),
    GgmlType.Q4_1: QFormat("q4_1", 4, 0, 0, 32, True),
    GgmlType.Q5_0: QFormat("q5_0", 4, 1, 16, 32, False),
    GgmlType.Q5_1: QFormat("q5_1", 4, 1, 0, 32, True),
    GgmlType.Q8_0: QFormat("q8_0", 8, 0, 0, 32, False),
    GgmlType.Q2_K: QFormat("q2_k", 2, 0, 0, 16, True),
    GgmlType.Q3_K: QFormat("q3_k", 2, 1, 4, 16, False),
    GgmlType.Q4_K: QFormat("q4_k", 4, 0, 0, 32, True),
    GgmlType.Q5_K: QFormat("q5_k", 4, 1, 0, 32, True),
    GgmlType.Q6_K: QFormat("q6_k", 4, 2, 32, 16, False),
}

_BY_NAME = {f.name: (t, f) for t, f in FORMATS.items()}


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_pytree_node_class
@dataclass
class QuantTensor:
    """A block-quantized matrix on device, logical shape (in_features, out_features).

    `lo`/`hi`/`scale`/`bias` are the packed planes described in the module
    docstring; `k`/`r` are the logical (unpadded) dims.
    """

    fmt_name: str  # static
    k: int  # static, logical in_features
    r: int  # static, logical out_features
    lo: jnp.ndarray
    hi: Optional[jnp.ndarray]
    scale: jnp.ndarray
    bias: Optional[jnp.ndarray]
    # static; set by fuse_quant: ((r_i, r_padded_i), ...) per fused member —
    # output columns of member i live at [sum of r_padded_<i>, +r_i)
    splits: Optional[tuple] = None

    @property
    def fmt(self) -> QFormat:
        return _BY_NAME[self.fmt_name][1]

    @property
    def shape(self) -> tuple[int, int]:
        return (self.k, self.r)

    @property
    def scale_packed(self) -> bool:
        """uint32 scale plane = two f16 scales per lane (exact vs the file's
        f16 scales; Mosaic has no f16 type, so the kernel expands the bits
        with integer ops)."""
        return self.scale.dtype == jnp.uint32

    @property
    def k_padded(self) -> int:
        # shape[-2]/[-1] so layer-stacked planes ([L, K/g, R]) report the
        # same padded dims as unstacked ones
        g = self.fmt.gsize
        return self.scale.shape[-2] * g * (2 if self.scale_packed else 1)

    @property
    def r_padded(self) -> int:
        return self.scale.shape[-1]

    def tree_flatten(self):
        children = (self.lo, self.hi, self.scale, self.bias)
        aux = (self.fmt_name, self.k, self.r, self.splits)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        lo, hi, scale, bias = children
        fmt_name, k, r, splits = aux
        return cls(fmt_name, k, r, lo, hi, scale, bias, splits)


def fuse_quant(qts: "list[QuantTensor]") -> Optional[QuantTensor]:
    """Concatenate same-format QuantTensors along the output (R) axis so a
    single kernel launch computes all of them (e.g. one fused QKV matmul per
    layer instead of three — the per-launch overhead dominates decode on
    small models). Works on stacked ([L, ...]) and unstacked planes alike.

    Returns None when the tensors cannot fuse (mixed formats, mismatched K,
    different plane dtypes/presence) — callers fall back to split weights.
    Member i's output columns sit at [sum(r_padded_<i>), +r_i); see
    `split_fused`.
    """
    if not all(isinstance(q, QuantTensor) for q in qts) or len(qts) < 2:
        return None
    q0 = qts[0]
    for q in qts[1:]:
        if (
            q.fmt_name != q0.fmt_name
            or q.k != q0.k
            or q.k_padded != q0.k_padded
            or q.scale.dtype != q0.scale.dtype
            or (q.hi is None) != (q0.hi is None)
            or (q.bias is None) != (q0.bias is None)
            or q.lo.shape[:-1] != q0.lo.shape[:-1]
        ):
            return None

    def cat(name):
        planes = [getattr(q, name) for q in qts]
        if planes[0] is None:
            return None
        if isinstance(planes[0], np.ndarray):  # host-mode load path
            return np.concatenate(planes, axis=-1)
        return jnp.concatenate(planes, axis=-1)

    splits = tuple((q.r, q.r_padded) for q in qts)
    r = sum(rp for _, rp in splits[:-1]) + splits[-1][0]
    return QuantTensor(
        q0.fmt_name, q0.k, r, cat("lo"), cat("hi"), cat("scale"),
        cat("bias"), splits,
    )


def split_fused(y: jnp.ndarray, splits: tuple) -> "list[jnp.ndarray]":
    """Slice a fused qmatmul output [..., r_fused] back into the member
    outputs ([..., r_i] each), skipping intra-fusion R padding."""
    outs, off = [], 0
    for r, rp in splits:
        outs.append(y[..., off : off + r])
        off += rp
    return outs


def unfuse_quant(qt) -> "Optional[list[QuantTensor]]":
    """Invert fuse_quant by slicing the planes at the padded column offsets
    (exact — blocks only span K). Used by shard_params, which needs the
    split weights so per-device head/ffn shards stay contiguous. Coalesced
    tensors are first converted back to the plane layout."""
    if isinstance(qt, QuantTensorC):
        qt = uncoalesce_qt(qt)
    if qt.splits is None:
        return None
    outs, off = [], 0

    def sl(p, off, rp):
        return None if p is None else p[..., off : off + rp]

    for r, rp in qt.splits:
        outs.append(
            QuantTensor(
                qt.fmt_name, qt.k, r,
                sl(qt.lo, off, rp), sl(qt.hi, off, rp),
                sl(qt.scale, off, rp), sl(qt.bias, off, rp),
            )
        )
        off += rp
    return outs


def _pack_f16x2_np(a: np.ndarray) -> np.ndarray:
    """f32 [Kg, R] (values exactly representable in f16) -> uint32 [Kg/2, R]:
    group 2w in the low 16 bits of word w, group 2w+1 in the high 16."""
    kg, r = a.shape
    assert kg % 2 == 0
    bits = a.astype(np.float16).view(np.uint16).astype(np.uint32)
    return (bits[0::2] | (bits[1::2] << 16)).astype(np.uint32)


def expand_f16x2(words: jnp.ndarray) -> jnp.ndarray:
    """uint32 [Kw, R] of packed f16 pairs -> f32 [2*Kw, R].

    Integer f16->f32 expansion (exact for all finite f16, incl. denormals);
    usable both in jnp and inside Pallas kernels (no f16 dtype touched).
    """
    h = unpack_plane(words, 16)  # [2*Kw, R] int32 of u16 bit patterns
    mag = h & 0x7FFF
    normal = jax.lax.bitcast_convert_type(
        ((mag + (112 << 10)) << 13).astype(jnp.int32), jnp.float32
    )
    denorm = mag.astype(jnp.float32) * jnp.float32(2.0**-24)
    val = jnp.where(mag >= 0x0400, normal, denorm)
    return jnp.where((h & 0x8000) != 0, -val, val)


def _pack_bits_np(q: np.ndarray, bits: int) -> np.ndarray:
    """[K, R] small ints -> uint32 [K/(32//bits), R], element e at bit (e%pw)*bits."""
    pw = 32 // bits
    k, r = q.shape
    assert k % pw == 0
    q = q.astype(np.uint32).reshape(k // pw, pw, r)
    shifts = (np.arange(pw, dtype=np.uint32) * bits).reshape(1, pw, 1)
    return (q << shifts).sum(axis=1, dtype=np.uint32)


def pack_ggml(
    t: GgmlType,
    data: bytes | np.ndarray,
    dims: tuple[int, ...],
    *,
    rows: Optional[np.ndarray] = None,
    r_multiple: int = 128,
    k_multiple: int = 0,
    scale_dtype=None,
    to_device: bool = True,
) -> "QuantTensor | jnp.ndarray":
    """Transcode raw GGML tensor bytes into the on-device representation.

    `dims` is in ggml order: dims[0] = K (row length, quantized axis),
    dims[1] = R (number of rows). Dense (F16/F32) tensors return a plain
    [K, R] jnp array in their storage dtype.

    `rows` optionally selects a subset/permutation of the R logical rows
    (output features) before packing — this is how fused QKV tensors are
    split into canonical q/k/v at load time (quant blocks span K only, so
    row selection never crosses a block boundary).

    `to_device=False` keeps the planes as HOST numpy arrays (same layout):
    the loader stacks layers host-side and uploads each stacked tensor
    ONCE, so the device-transient peak during a big load is ~1x the param
    bytes instead of ~2x (the unstacked planes + stacked copies that
    killed LLaMA-13B on a memory-constrained chip slice).
    """
    dev = jnp.asarray if to_device else np.ascontiguousarray
    K = dims[0]
    R = dims[1] if len(dims) > 1 else 1

    if t in (GgmlType.F32, GgmlType.F16):
        dt = np.float32 if t == GgmlType.F32 else np.float16
        w = np.frombuffer(data, dtype=dt, count=K * R).reshape(R, K)
        if rows is not None:
            w = w[rows]
        return dev(np.ascontiguousarray(w.T))

    fmt = FORMATS[t]
    g = fmt.gsize

    # scale storage: the 32-block formats carry f16 scales/mins on disk, so
    # two-f16-per-uint32 packing is LOSSLESS and halves scale-plane traffic;
    # the kernel expands the bits with integer ops (Mosaic has no f16 type).
    # K-quants keep f32 (their flattened d*int6 products need the range).
    pack_f16 = (
        scale_dtype is None
        and not fmt.name.endswith("_k")
        and os.environ.get("LLM_TPU_SCALE_PACK", "1") != "0"
    )
    if scale_dtype is None:
        scale_dtype = jnp.float32

    def _finish_scales(scale_np, bias_np):
        if not pack_f16:
            cast = (lambda a: jnp.asarray(a, dtype=scale_dtype)) if to_device \
                else (lambda a: np.asarray(a, np.dtype(scale_dtype)))
            s = cast(np.asarray(scale_np, np.float32))
            b = (cast(np.asarray(bias_np, np.float32))
                 if bias_np is not None else None)
            return s, b
        s = dev(_pack_f16x2_np(np.asarray(scale_np, np.float32)))
        b = (
            dev(_pack_f16x2_np(np.asarray(bias_np, np.float32)))
            if bias_np is not None
            else None
        )
        return s, b

    # fast path: single-pass native transcode (llm_tpu/native/codecs.cpp)
    k_granule = max(g, 32 // fmt.lo_bits if fmt.lo_bits < 8 else 1)
    if pack_f16:
        k_granule = max(k_granule, 2 * g)  # scale rows must pair up
        if K > 8 * 2 * g:
            # Mosaic block constraint: the packed-scale sublane block must
            # be a multiple of 8 (or the full dim), so K must be divisible
            # by a 16g tile (tile_k = 16*g -> 8 packed scale rows).
            # Padding cost <= 0.25% extra lo bytes on real shapes.
            k_granule = max(k_granule, 16 * g)
    n_out = len(rows) if rows is not None else R
    Rp_n = _round_up(n_out, r_multiple) if r_multiple else n_out
    Kp_n = _round_up(K, k_multiple) if k_multiple else K
    Kp_n = _round_up(Kp_n, k_granule)
    from llm_tpu import native

    res = native.transcode(
        int(t),
        data,
        K,
        np.asarray(rows, dtype=np.int64) if rows is not None else None,
        n_out,
        Kp_n,
        Rp_n,
        fmt.lo_bits,
        fmt.hi_bits,
        fmt.gsize,
        fmt.has_bias,
    )
    if res is not None:
        lo_np, hi_np, scale_np, bias_np = res
        if fmt.signed_lo:  # in place: the lo plane is ~2 GB at 7B
            np.bitwise_xor(lo_np, _signed_xor_word(fmt), out=lo_np)
        s, b = _finish_scales(scale_np, bias_np)
        return QuantTensor(
            fmt_name=fmt.name,
            k=K,
            r=n_out,
            lo=dev(lo_np),
            hi=dev(hi_np) if hi_np is not None else None,
            scale=s,
            bias=b,
        )

    dec = decode_blocks(t, data, K * R)

    q2 = dec.q.reshape(R, K)
    scale2 = dec.scale.reshape(R, K // g)
    bias2 = dec.bias.reshape(R, K // g) if dec.bias is not None else None
    if rows is not None:
        q2, scale2 = q2[rows], scale2[rows]
        if bias2 is not None:
            bias2 = bias2[rows]
        R = len(rows)

    q = np.ascontiguousarray(q2.T)  # [K, R]
    scale = np.ascontiguousarray(scale2.T)  # [K/g, R]
    bias = np.ascontiguousarray(bias2.T) if bias2 is not None else None

    # pad R to a lane multiple, K to a requested multiple (both with zeros;
    # padded scale stays 0 so padded K contributes nothing to dots)
    Rp = _round_up(R, r_multiple) if r_multiple else R
    Kp = _round_up(K, k_multiple) if k_multiple else K
    Kp = _round_up(Kp, k_granule)
    if Rp != R or Kp != K:
        q = np.pad(q, ((0, Kp - K), (0, Rp - R)))
        scale = np.pad(scale, ((0, Kp // g - K // g), (0, Rp - R)))
        if bias is not None:
            bias = np.pad(bias, ((0, Kp // g - K // g), (0, Rp - R)))

    if fmt.lo_bits == 8:
        lo = dev(q.astype(np.int8))
        hi = None
    else:
        lo_mask = (1 << fmt.lo_bits) - 1
        lo_vals = q & lo_mask
        if fmt.signed_lo:
            lo_vals = lo_vals ^ fmt.zero  # store q - zero, two's complement
        lo = dev(_pack_bits_np(lo_vals, fmt.lo_bits))
        hi = (
            dev(_pack_bits_np(q >> fmt.lo_bits, fmt.hi_bits))
            if fmt.hi_bits
            else None
        )

    s, b = _finish_scales(scale, bias)
    return QuantTensor(
        fmt_name=fmt.name,
        k=K,
        r=R,
        lo=lo,
        hi=hi,
        scale=s,
        bias=b,
    )


def pack_dense(w: np.ndarray, rows: Optional[np.ndarray] = None) -> jnp.ndarray:
    """Dense weight [R, K] (row-major, ggml orientation) -> [K, R] device array."""
    w = np.asarray(w)
    if rows is not None:
        w = w[rows]
    return jnp.asarray(np.ascontiguousarray(w.T))


# ---------------------------------------------------------------------------
# device-side unpack / dequant (jnp; also used inside the Pallas kernels)


def _signed_xor_word(fmt: QFormat) -> np.uint32:
    """uint32 word XORing every lo field by fmt.zero (pack-side transform
    for signed_lo formats; q4_0: 0x88888888)."""
    w = 0
    for i in range(32 // fmt.lo_bits):
        w |= fmt.zero << (i * fmt.lo_bits)
    return np.uint32(w)


def unpack_plane(words: jnp.ndarray, bits: int,
                 signed: bool = False) -> jnp.ndarray:
    """uint32 [Kw, R] -> int32 [Kw * (32//bits), R] (no-op reshape layout).

    `signed`: fields are two's-complement — sign-extend with two shifts
    (one fewer VPU op than shift+mask, and the caller skips the zero
    subtraction entirely)."""
    pw = 32 // bits
    if signed:
        shifts = (32 - bits - jnp.arange(pw, dtype=jnp.int32) * bits)[
            None, :, None
        ]
        vals = (words.astype(jnp.int32)[:, None, :] << shifts) >> (32 - bits)
        kw, _, r = vals.shape
        return vals.reshape(kw * pw, r)
    shifts = (jnp.arange(pw, dtype=jnp.uint32) * bits)[None, :, None]
    vals = (words[:, None, :] >> shifts) & ((1 << bits) - 1)
    kw, _, r = vals.shape
    return vals.reshape(kw * pw, r).astype(jnp.int32)


def unpack_q(
    fmt: QFormat, lo: jnp.ndarray, hi: Optional[jnp.ndarray]
) -> jnp.ndarray:
    """Combine planes into integer q [K, R] (int32; int8 passthrough
    widened). signed_lo formats come out ALREADY centered (use
    effective_zero, not fmt.zero, downstream)."""
    if fmt.lo_bits == 8:
        return lo.astype(jnp.int32)
    q = unpack_plane(lo, fmt.lo_bits, signed=fmt.signed_lo)
    if fmt.hi_bits:
        q = q | (unpack_plane(hi, fmt.hi_bits) << fmt.lo_bits)
    return q


def effective_zero(fmt: QFormat) -> int:
    """The zero point still to subtract after unpack_q (0 for signed_lo:
    the sign extension already centered the values)."""
    return 0 if fmt.signed_lo else fmt.zero


def _expand_groups(a: jnp.ndarray, g: int) -> jnp.ndarray:
    """[K/g, R] -> [K, R] by repeating each group row g times (no-op reshape)."""
    kg, r = a.shape
    return jnp.broadcast_to(a[:, None, :], (kg, g, r)).reshape(kg * g, r)


def scale_plane_f32(plane: jnp.ndarray) -> jnp.ndarray:
    """Scale/bias plane -> f32 rows (expanding packed-f16 uint32 planes)."""
    if plane.dtype == jnp.uint32:
        return expand_f16x2(plane)
    return plane.astype(jnp.float32)


def dequant_jnp(qt: QuantTensor, dtype=jnp.float32, trim: bool = True) -> jnp.ndarray:
    """Reference dequantization: QuantTensor -> dense [K, R] array.

    Used by the XLA fallback matmul path and as the oracle for kernel tests.
    """
    fmt = qt.fmt
    q = unpack_q(fmt, qt.lo, qt.hi)
    zero = effective_zero(fmt)
    w = (q - zero if zero else q).astype(jnp.float32) * _expand_groups(
        scale_plane_f32(qt.scale), fmt.gsize
    )
    if qt.bias is not None:
        w = w + _expand_groups(scale_plane_f32(qt.bias), fmt.gsize)
    if trim:
        w = w[: qt.k, : qt.r]
    return w.astype(dtype)


# ---------------------------------------------------------------------------
# coalesced layout: one contiguous DMA burst per kernel grid step
#
# The plane layout above issues 2-4 separate block DMAs per (r, k) grid step
# (lo / hi / scale / bias), each a STRIDED gather of tile_r*4-byte row
# fragments out of an R-wide plane. The coalesced layout re-tiles all planes
# at pack time into a single uint32 buffer ordered so that the whole
# (r, k) weight block is one linear span of HBM:
#
#     buf[(L,) n_r * n_k * rows_tile, tile_r]      rows_tile = lo|hi|scale|bias
#
# i.e. for each output tile r and reduction tile k, the lo rows, then hi
# rows, then scale rows, then bias rows of that block sit consecutively.
# The kernel reads ONE (rows_tile, tile_r) block per step — a single
# contiguous DMA — and slices the segments apart in VMEM (static offsets).
# f32 scale planes are bitcast to uint32; q8_0's int8 plane is byte-packed
# into uint32 words (two's complement, sign-extending unpack).


def coalesced_seg_rows(fmt: QFormat, tile_k: int,
                       scale_packed: bool) -> tuple[int, int, int, int]:
    """uint32 rows of each segment (lo, hi, scale, bias) per k-tile."""
    lo = tile_k // (32 // fmt.lo_bits) if fmt.lo_bits < 8 else tile_k // 4
    hi = tile_k // (32 // fmt.hi_bits) if fmt.hi_bits else 0
    sc = tile_k // fmt.gsize // (2 if scale_packed else 1)
    return lo, hi, sc, (sc if fmt.has_bias else 0)


def _bytes_pack_np(a: np.ndarray) -> np.ndarray:
    """int8 [..., K, R] -> uint32 [..., K/4, R], element e of each word in
    bits [8e, 8e+8) as a two's-complement byte (unpack sign-extends)."""
    b = a.view(np.uint8).astype(np.uint32)
    K, R = b.shape[-2], b.shape[-1]
    b = b.reshape(*b.shape[:-2], K // 4, 4, R)
    shifts = (np.arange(4, dtype=np.uint32) * 8).reshape(1, 4, 1)
    return (b << shifts).sum(axis=-2, dtype=np.uint32)


@jax.tree_util.register_pytree_node_class
@dataclass
class QuantTensorC:
    """Coalesced block-quantized matrix (see module comment above).

    `buf` is uint32 [(L,) n_r*n_k*rows_tile, tile_r]; all other fields are
    static. kp/rp are the padded dims the tiling was built over."""

    fmt_name: str
    k: int
    r: int
    kp: int
    rp: int
    tile_k: int
    tile_r: int
    scale_packed: bool
    buf: jnp.ndarray
    splits: Optional[tuple] = None

    @property
    def fmt(self) -> QFormat:
        return _BY_NAME[self.fmt_name][1]

    @property
    def shape(self) -> tuple[int, int]:
        return (self.k, self.r)

    @property
    def k_padded(self) -> int:
        return self.kp

    @property
    def r_padded(self) -> int:
        return self.rp

    @property
    def seg_rows(self) -> tuple[int, int, int, int]:
        return coalesced_seg_rows(self.fmt, self.tile_k, self.scale_packed)

    def tree_flatten(self):
        aux = (self.fmt_name, self.k, self.r, self.kp, self.rp,
               self.tile_k, self.tile_r, self.scale_packed, self.splits)
        return (self.buf,), aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        (buf,) = children
        f, k, r, kp, rp, tk, tr, sp, splits = aux
        return cls(f, k, r, kp, rp, tk, tr, sp, buf, splits)


def _expand_f16x2_np(words: np.ndarray) -> np.ndarray:
    """Host inverse of _pack_f16x2_np: uint32 [.., Kg/2, R] packed f16
    pairs -> exact f32 [.., Kg, R]."""
    lo = (words & 0xFFFF).astype(np.uint16)
    hi = (words >> 16).astype(np.uint16)
    st = np.stack([lo, hi], axis=-2)  # [.., Kg/2, 2, R]
    out = st.reshape(*words.shape[:-2], words.shape[-2] * 2,
                     words.shape[-1])
    return out.view(np.float16).astype(np.float32)


def unpack_scales_qt(qt: QuantTensor) -> QuantTensor:
    """Copy of `qt` with f16-packed scale/bias planes expanded to f32
    (lossless). Fallback for coalescing at K values whose packed-scale
    segment rows cannot hit the 8-sublane granularity (e.g. K=768)."""
    if not qt.scale_packed:
        return qt

    def ex(p):
        return None if p is None else _expand_f16x2_np(np.asarray(p))

    return QuantTensor(qt.fmt_name, qt.k, qt.r, qt.lo, qt.hi,
                       ex(qt.scale), ex(qt.bias), qt.splits)


def pad_r_qt(qt: QuantTensor, mult: int) -> QuantTensor:
    """Pad the R (lanes) axis of every plane up to a multiple of `mult`
    with zeros (padded scale bits are 0, so padded columns dequantize to 0
    and the kernels trim them). Lets the coalesced layout use wide lane
    tiles (tile_r 512) on R values packed at the default 128 multiple."""
    Rp = qt.r_padded
    new = _round_up(Rp, mult)
    if new == Rp:
        return qt

    def pad(p):
        if p is None:
            return None
        a = np.asarray(p)
        width = [(0, 0)] * (a.ndim - 1) + [(0, new - Rp)]
        return np.pad(a, width)

    return QuantTensor(qt.fmt_name, qt.k, qt.r, pad(qt.lo), pad(qt.hi),
                       pad(qt.scale), pad(qt.bias), qt.splits)


def coalesce_qt(qt: QuantTensor, tile_k: int, tile_r: int,
                to_device: bool = True) -> QuantTensorC:
    """Re-tile a QuantTensor's planes (host numpy or device; stacked [L,...]
    or flat) into the coalesced single-buffer layout. Host-side transform."""
    fmt = qt.fmt
    packed = qt.scale_packed
    Kp, Rp = qt.k_padded, qt.r_padded
    assert Kp % tile_k == 0 and Rp % tile_r == 0, (Kp, tile_k, Rp, tile_r)
    n_k, n_r = Kp // tile_k, Rp // tile_r
    segs = coalesced_seg_rows(fmt, tile_k, packed)
    assert all(s % 8 == 0 for s in segs if s), (
        f"coalesce tile_k={tile_k} gives non-8-multiple segment rows {segs} "
        f"for {fmt.name}"
    )

    def words(p, kind):
        if p is None:
            return None
        a = np.asarray(p)
        if kind == "lo" and fmt.lo_bits == 8:
            a = _bytes_pack_np(a)
        elif a.dtype == np.float32:
            a = a.view(np.uint32)
        return a

    def arrange(p, seg):
        # [..., n_k*seg, n_r*tile_r] -> [..., n_r, n_k, seg, tile_r]
        lead = p.shape[:-2]
        p = p.reshape(*lead, n_k, seg, n_r, tile_r)
        return np.moveaxis(p, -2, -4)

    parts = []
    for plane, kind, seg in (
        (qt.lo, "lo", segs[0]), (qt.hi, "hi", segs[1]),
        (qt.scale, "scale", segs[2]), (qt.bias, "bias", segs[3]),
    ):
        if seg:
            parts.append(arrange(words(plane, kind), seg))
    buf = np.concatenate(parts, axis=-2)
    lead = buf.shape[:-4]
    buf = np.ascontiguousarray(
        buf.reshape(*lead, n_r * n_k * sum(segs), tile_r)
    )
    return QuantTensorC(
        fmt.name, qt.k, qt.r, Kp, Rp, tile_k, tile_r, packed,
        jnp.asarray(buf) if to_device else buf, qt.splits,
    )


def _unpack_bytes_jnp(words: jnp.ndarray) -> jnp.ndarray:
    """uint32 [Kw, R] of packed two's-complement bytes -> int32 [4*Kw, R]."""
    return unpack_plane(words, 8, signed=True)


def uncoalesce_qt(qtc: QuantTensorC) -> QuantTensor:
    """Exact inverse of coalesce_qt, back to the plane layout (host-side
    numpy). Used by TP sharding, which slices planes per head/ffn shard —
    the coalesced buffer interleaves R tiles and cannot be column-sliced."""
    fmt = qtc.fmt
    segs = qtc.seg_rows
    n_k = qtc.kp // qtc.tile_k
    n_r = qtc.rp // qtc.tile_r
    rows = sum(segs)
    buf = np.asarray(qtc.buf)
    stacked = buf.ndim == 3

    def inv(b):
        b4 = b.reshape(n_r, n_k, rows, qtc.tile_r)
        b4 = np.moveaxis(b4, 0, 2)  # [n_k, rows, n_r, tile_r]
        out, off = [], 0
        for seg in segs:
            if not seg:
                out.append(None)
                continue
            p = b4[:, off : off + seg]
            off += seg
            out.append(
                np.ascontiguousarray(p.reshape(n_k * seg, n_r * qtc.tile_r))
            )
        return out

    if stacked:
        per = [inv(b) for b in buf]
        planes = [
            (np.stack([p[i] for p in per]) if per[0][i] is not None else None)
            for i in range(4)
        ]
    else:
        planes = inv(buf)
    lo, hi, sc, bias = planes

    if fmt.lo_bits == 8:
        # packed two's-complement bytes -> int8 [.., K, R]
        shifts = (np.arange(4, dtype=np.uint32) * 8)[:, None]
        b = lo[..., :, None, :] >> shifts.reshape(1, 4, 1)
        lo = (b & 0xFF).astype(np.uint8).view(np.int8).reshape(
            *lo.shape[:-2], lo.shape[-2] * 4, lo.shape[-1]
        )
    if not qtc.scale_packed:
        sc = sc.view(np.float32)
        if bias is not None:
            bias = bias.view(np.float32)
    return QuantTensor(
        qtc.fmt_name, qtc.k, qtc.r,
        jnp.asarray(lo),
        jnp.asarray(hi) if hi is not None else None,
        jnp.asarray(sc),
        jnp.asarray(bias) if bias is not None else None,
        qtc.splits,
    )


def uncoalesce_planes(qtc: QuantTensorC, buf: Optional[jnp.ndarray] = None):
    """Traceable inverse of coalesce_qt's arrangement: the (lo, hi, scale,
    bias) plane views of a FLAT (2D) coalesced buffer (scale/bias back in
    f32 when they were bitcast; q8_0's lo back to int8 VALUES as int32).
    Stacked callers pass one layer's slice via `buf`."""
    fmt = qtc.fmt
    segs = qtc.seg_rows
    n_k = qtc.kp // qtc.tile_k
    n_r = qtc.rp // qtc.tile_r
    rows = sum(segs)
    b = qtc.buf if buf is None else buf
    assert b.ndim == 2, "uncoalesce_planes wants a flat buffer"
    b = b.reshape(n_r, n_k, rows, qtc.tile_r)
    b = jnp.moveaxis(b, 0, 2)  # [n_k, rows, n_r, tile_r]

    out, off = [], 0
    for seg in segs:
        if not seg:
            out.append(None)
            continue
        p = b[:, off : off + seg, :, :]
        off += seg
        out.append(p.reshape(n_k * seg, n_r * qtc.tile_r))
    lo, hi, sc, bias = out
    if fmt.lo_bits == 8:
        lo = _unpack_bytes_jnp(lo)
    if not qtc.scale_packed:
        sc = jax.lax.bitcast_convert_type(sc, jnp.float32)
        if bias is not None:
            bias = jax.lax.bitcast_convert_type(bias, jnp.float32)
    return lo, hi, sc, bias


def dequant_c_jnp(qtc: QuantTensorC, dtype=jnp.float32, trim: bool = True,
                  buf: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Reference dequantization of the coalesced layout (XLA fallback path
    and the oracle for coalesced-kernel tests). `buf` overrides qtc.buf
    (one layer's slice of a stacked tensor)."""
    fmt = qtc.fmt
    lo, hi, sc, bias = uncoalesce_planes(qtc, buf)
    if fmt.lo_bits == 8:
        q = lo  # already int32 values
    else:
        q = unpack_plane(lo, fmt.lo_bits, signed=fmt.signed_lo)
        if hi is not None:
            q = q | (unpack_plane(hi, fmt.hi_bits) << fmt.lo_bits)
    zero = effective_zero(fmt)
    sc_f = expand_f16x2(sc) if qtc.scale_packed else sc
    w = (q - zero if zero else q).astype(jnp.float32) * _expand_groups(
        sc_f, fmt.gsize
    )
    if bias is not None:
        b_f = expand_f16x2(bias) if qtc.scale_packed else bias
        w = w + _expand_groups(b_f, fmt.gsize)
    if trim:
        w = w[: qtc.k, : qtc.r]
    return w.astype(dtype)


# ---------------------------------------------------------------------------
# int4 KV packing (paged pools)


def pack_int4_rows(q: jnp.ndarray) -> jnp.ndarray:
    """int8 codes in [-7, 7] [..., D] -> planar-packed uint8 [..., D//2].

    Byte j holds element j in its low nibble and element j + D/2 in its
    high nibble (PLANAR, not interleaved: unpack is two sign-extending
    shifts plus ONE lane-dim concatenate — the same idiom as the q4_0
    signed-nibble weight planes in qmatmul, proven to lower on Mosaic).
    Packing along D (not along the page/position axis) keeps KV writes
    row-granular: one position's row is D//2 contiguous bytes, so the
    scatter path never read-modify-writes a byte shared by two positions.
    """
    D = q.shape[-1]
    lo = q[..., : D // 2].astype(jnp.int32) & 0xF
    hi = (q[..., D // 2 :].astype(jnp.int32) & 0xF) << 4
    return (lo | hi).astype(jnp.uint8)  # 0..255: in-range, defined convert


def unpack_int4_rows(b: jnp.ndarray) -> jnp.ndarray:
    """planar-packed uint8 [..., D//2] -> f32 codes [..., D] in [-7, 7].

    Two arithmetic-shift sign extensions per nibble; the halves concatenate
    on the minor (lane) dim, restoring original element order."""
    x = b.astype(jnp.int32)
    lo = (x << 28) >> 28
    hi = (x << 24) >> 28
    return jnp.concatenate([lo, hi], axis=-1).astype(jnp.float32)
