"""Block-quantization codecs for the GGML interchange formats (numpy, host-side).

These are the ground-truth encoders/decoders for every quantized element type
the reference supports. They are deliberately *vectorized numpy* — they run at
load/save time on the host; the TPU compute path never touches these byte
layouts (weights are transcoded once into packed device planes, see
llm_tpu/ops/packing.py).

Every format decodes to a single canonical integer form:

    value[e] = (q[e] - zero) * scale[e // gsize] + bias[e // gsize]

where q is an unsigned (or, for Q8_0, signed) integer of small bit-width and
scale/bias are per-group floats (K-quant two-level scales are flattened into
per-group effective scales at decode time). Float dequantization and the
packed on-device layout are both derived from this one decoding.

Layouts follow the ggml C structs captured in the reference's bindgen output
(/root/reference/crates/ggml/sys/src/lib.rs:2779-3516):

* Q4_0: {f16 d;  u8 qs[16]}                      x = (q4 - 8) * d
* Q4_1: {f16 d; f16 m; u8 qs[16]}                x = q4 * d + m
* Q5_0: {f16 d; u32 qh; u8 qs[16]}               x = (q5 - 16) * d
* Q5_1: {f16 d; f16 m; u32 qh; u8 qs[16]}        x = q5 * d + m
* Q8_0: {f16 d; i8 qs[32]}                       x = q * d
* Q2_K: {u8 scales[16]; u8 qs[64]; f16 d,dmin}   x = d*sc*q2 - dmin*mn
* Q3_K: {u8 hmask[32]; u8 qs[64]; u8 scales[12]; f16 d}
* Q4_K: {f16 d,dmin; u8 scales[12]; u8 qs[128]}
* Q5_K: {f16 d,dmin; u8 scales[12]; u8 qh[32]; u8 qs[128]}
* Q6_K: {u8 ql[128]; u8 qh[64]; i8 scales[16]; f16 d}

The nibble split within a 32-block is low-nibbles = elements 0..15,
high-nibbles = elements 16..31 (ggml dequantize_row_* convention).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from llm_tpu.ggml.types import GgmlType, QK_K, block_size, type_size

# ---------------------------------------------------------------------------
# helpers


def _f16(x: np.ndarray) -> np.ndarray:
    return x.astype(np.float32)


def _scale_f16(b: np.ndarray, lo: int) -> np.ndarray:
    """Read a f16 field at byte offset lo of each block -> f32 [nb, 1]."""
    return _f16(b[:, lo : lo + 2].copy().view("<f2"))


def _as_blocks(data: bytes | np.ndarray, t: GgmlType, n_elements: int) -> np.ndarray:
    """View raw bytes as [n_blocks, type_size] uint8."""
    bs, ts = block_size(t), type_size(t)
    if n_elements % bs != 0:
        raise ValueError(f"{n_elements} not a multiple of block size {bs} for {t}")
    nb = n_elements // bs
    buf = np.frombuffer(data, dtype=np.uint8, count=nb * ts)
    return buf.reshape(nb, ts)


def _nibbles(qs: np.ndarray) -> np.ndarray:
    """[..., 16] bytes -> [..., 32] nibble values in ggml order (low then high)."""
    lo = qs & 0x0F
    hi = qs >> 4
    return np.concatenate([lo, hi], axis=-1)


def _pack_nibbles(vals: np.ndarray) -> np.ndarray:
    """[..., 32] nibble values -> [..., 16] bytes, ggml order."""
    lo = vals[..., :16]
    hi = vals[..., 16:]
    return (lo | (hi << 4)).astype(np.uint8)


# ---------------------------------------------------------------------------
# canonical integer decoding


@dataclass
class Decoded:
    """Canonical integer decoding of a run of blocks.

    value[i, e] = (q[i, e] - zero) * scale[i, e // gsize] + bias[i, e // gsize]
    """

    q: np.ndarray  # int32 [nb, block]
    scale: np.ndarray  # f32 [nb, block // gsize]
    bias: np.ndarray | None  # f32 [nb, block // gsize] (additive, already signed)
    zero: int
    gsize: int
    bits: int  # significant bits in q (8 for Q8_0, signed)

    def to_float(self) -> np.ndarray:
        nb, blk = self.q.shape
        g = self.gsize
        s = np.repeat(self.scale, g, axis=1)
        y = (self.q - self.zero) * s
        if self.bias is not None:
            y = y + np.repeat(self.bias, g, axis=1)
        return y.astype(np.float32)


def decode_blocks(t: GgmlType, data: bytes | np.ndarray, n_elements: int) -> Decoded:
    fn = _DECODE.get(t)
    if fn is None:
        raise NotImplementedError(f"decode for {t}")
    return fn(_as_blocks(data, t, n_elements))


def _dec_q4_0(b: np.ndarray) -> Decoded:
    d = _scale_f16(b, 0)
    q = _nibbles(b[:, 2:18]).astype(np.int32)
    return Decoded(q, d, None, zero=8, gsize=32, bits=4)


def _dec_q4_1(b: np.ndarray) -> Decoded:
    d = _scale_f16(b, 0)
    m = _scale_f16(b, 2)
    q = _nibbles(b[:, 4:20]).astype(np.int32)
    return Decoded(q, d, m, zero=0, gsize=32, bits=4)


def _q5_high_bits(qh_bytes: np.ndarray) -> np.ndarray:
    """[nb, 4] bytes of the u32 qh -> [nb, 32] fifth-bit values (0/16).

    Bit j of qh is the high bit of element j (low-nibble half) and bit j+16
    of element j+16 (high-nibble half) — matching dequantize_row_q5_0.
    """
    qh = qh_bytes.copy().view("<u4").astype(np.uint32)  # [nb, 1]
    shifts = np.arange(32, dtype=np.uint32)[None, :]
    return (((qh >> shifts) & 1) << 4).astype(np.int32)


def _dec_q5_0(b: np.ndarray) -> Decoded:
    d = _scale_f16(b, 0)
    q = _nibbles(b[:, 6:22]).astype(np.int32) | _q5_high_bits(b[:, 2:6])
    return Decoded(q, d, None, zero=16, gsize=32, bits=5)


def _dec_q5_1(b: np.ndarray) -> Decoded:
    d = _scale_f16(b, 0)
    m = _scale_f16(b, 2)
    q = _nibbles(b[:, 8:24]).astype(np.int32) | _q5_high_bits(b[:, 4:8])
    return Decoded(q, d, m, zero=0, gsize=32, bits=5)


def _dec_q8_0(b: np.ndarray) -> Decoded:
    d = _scale_f16(b, 0)
    q = b[:, 2:34].view(np.int8).astype(np.int32)
    return Decoded(q, d, None, zero=0, gsize=32, bits=8)


# --- K-quants --------------------------------------------------------------


def _dec_q2_k(b: np.ndarray) -> Decoded:
    nb = b.shape[0]
    scales = b[:, 0:16]  # u8[16]: low nibble scale, high nibble min
    qs = b[:, 16:80]  # u8[64], 2-bit packed
    d = _scale_f16(b, 80)
    dmin = _scale_f16(b, 82)

    # element order: half (2) x shift (4) x byte (32); 16-elem groups get
    # scale index = half*8 + shift*2 + (byte>=16)
    q = qs.reshape(nb, 2, 1, 32)
    shifts = np.array([0, 2, 4, 6], dtype=np.uint8).reshape(1, 1, 4, 1)
    q2 = ((q >> shifts) & 3).astype(np.int32).reshape(nb, QK_K)

    sc = scales.astype(np.int32)  # group order == scale byte order
    dl = d * (sc & 0xF)  # [nb, 16]
    ml = dmin * (sc >> 4)
    return Decoded(q2, dl, -ml, zero=0, gsize=16, bits=2)


def _q3k_scales(sb: np.ndarray) -> np.ndarray:
    """[nb, 12] packed 6-bit scales -> [nb, 16] int32, bias 32 removed."""
    b = sb.astype(np.uint8)
    sc = np.empty((b.shape[0], 16), dtype=np.int32)
    sc[:, 0:4] = (b[:, 0:4] & 0xF) | ((b[:, 8:12] & 3) << 4)
    sc[:, 4:8] = (b[:, 4:8] & 0xF) | (((b[:, 8:12] >> 2) & 3) << 4)
    sc[:, 8:12] = (b[:, 0:4] >> 4) | (((b[:, 8:12] >> 4) & 3) << 4)
    sc[:, 12:16] = (b[:, 4:8] >> 4) | (((b[:, 8:12] >> 6) & 3) << 4)
    return sc - 32


def _dec_q3_k(b: np.ndarray) -> Decoded:
    nb = b.shape[0]
    hmask = b[:, 0:32]
    qs = b[:, 32:96]
    scales = _q3k_scales(b[:, 96:108])  # [nb,16]
    d = _scale_f16(b, 108)

    q = qs.reshape(nb, 2, 1, 32)
    shifts = np.array([0, 2, 4, 6], dtype=np.uint8).reshape(1, 1, 4, 1)
    q2 = ((q >> shifts) & 3).astype(np.int32)  # [nb, 2, 4, 32]

    # hmask bit index = half*4 + shift, byte = position within the 32-group;
    # q3 = low2 + 4*hbit, value = (q3 - 4) * dl
    hm = hmask.reshape(nb, 1, 1, 32)
    bit = (
        np.arange(2).reshape(1, 2, 1, 1) * 4 + np.arange(4).reshape(1, 1, 4, 1)
    ).astype(np.uint8)
    hbit = ((hm >> bit) & 1).astype(np.int32)
    q3 = (q2 | (hbit << 2)).reshape(nb, QK_K)
    return Decoded(q3, d * scales, None, zero=4, gsize=16, bits=3)


def _k4_scale_min(sb: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """get_scale_min_k4 over all 8 sub-blocks: [nb,12] -> ([nb,8], [nb,8])."""
    q = sb.astype(np.uint8)
    sc = np.empty((q.shape[0], 8), dtype=np.int32)
    mn = np.empty((q.shape[0], 8), dtype=np.int32)
    sc[:, 0:4] = q[:, 0:4] & 63
    mn[:, 0:4] = q[:, 4:8] & 63
    sc[:, 4:8] = (q[:, 8:12] & 0xF) | ((q[:, 0:4] >> 6) << 4)
    mn[:, 4:8] = (q[:, 8:12] >> 4) | ((q[:, 4:8] >> 6) << 4)
    return sc, mn


def _dec_q4_k(b: np.ndarray) -> Decoded:
    nb = b.shape[0]
    d = _scale_f16(b, 0)
    dmin = _scale_f16(b, 2)
    sc, mn = _k4_scale_min(b[:, 4:16])
    qs = b[:, 16:144]

    q = qs.reshape(nb, 4, 32)  # 4 chunks of 64 elements
    lo = (q & 0xF).astype(np.int32)
    hi = (q >> 4).astype(np.int32)
    qv = np.stack([lo, hi], axis=2).reshape(nb, QK_K)  # sub-block order
    return Decoded(qv, d * sc, -(dmin * mn), zero=0, gsize=32, bits=4)


def _dec_q5_k(b: np.ndarray) -> Decoded:
    nb = b.shape[0]
    d = _scale_f16(b, 0)
    dmin = _scale_f16(b, 2)
    sc, mn = _k4_scale_min(b[:, 4:16])
    qh = b[:, 16:48].reshape(nb, 1, 1, 32)
    qs = b[:, 48:176]

    q = qs.reshape(nb, 4, 32)
    lo = (q & 0xF).astype(np.int32)
    hi = (q >> 4).astype(np.int32)
    qv = np.stack([lo, hi], axis=2)  # [nb, 4, 2, 32]
    # chunk c, sub s uses qh bit 2c+s
    bit = (
        2 * np.arange(4).reshape(1, 4, 1, 1) + np.arange(2).reshape(1, 1, 2, 1)
    ).astype(np.uint8)
    hbit = ((qh >> bit) & 1).astype(np.int32)
    qv = (qv | (hbit << 4)).reshape(nb, QK_K)
    return Decoded(qv, d * sc, -(dmin * mn), zero=0, gsize=32, bits=5)


def _dec_q6_k(b: np.ndarray) -> Decoded:
    nb = b.shape[0]
    ql = b[:, 0:128].reshape(nb, 2, 64)  # per half: 64 bytes
    qh = b[:, 128:192].reshape(nb, 2, 32)
    scales = b[:, 192:208].view(np.int8).astype(np.int32).reshape(nb, 2, 8)
    d = _scale_f16(b, 208)  # [nb,1]

    l32 = ql[:, :, 0:32].astype(np.int32)
    h32 = ql[:, :, 32:64].astype(np.int32)
    hq = qh.astype(np.int32)
    q1 = (l32 & 0xF) | (((hq >> 0) & 3) << 4)  # elems   0..31 of half
    q2 = (h32 & 0xF) | (((hq >> 2) & 3) << 4)  # elems  32..63
    q3 = (l32 >> 4) | (((hq >> 4) & 3) << 4)  # elems  64..95
    q4 = (h32 >> 4) | (((hq >> 6) & 3) << 4)  # elems  96..127
    qv = np.stack([q1, q2, q3, q4], axis=2).reshape(nb, QK_K)

    # scale idx within half for the 4 rows of 32: [0,2,4,6] + l//16
    sidx = np.array([0, 2, 4, 6]).reshape(4, 1) + (np.arange(2) // 1).reshape(1, 2)
    sc = scales[:, :, sidx].reshape(nb, 16)  # [nb, 2, 4, 2] -> group order
    return Decoded(qv, d * sc, None, zero=32, gsize=16, bits=6)


_DECODE = {
    GgmlType.Q4_0: _dec_q4_0,
    GgmlType.Q4_1: _dec_q4_1,
    GgmlType.Q5_0: _dec_q5_0,
    GgmlType.Q5_1: _dec_q5_1,
    GgmlType.Q8_0: _dec_q8_0,
    GgmlType.Q2_K: _dec_q2_k,
    GgmlType.Q3_K: _dec_q3_k,
    GgmlType.Q4_K: _dec_q4_k,
    GgmlType.Q5_K: _dec_q5_k,
    GgmlType.Q6_K: _dec_q6_k,
}


# ---------------------------------------------------------------------------
# float dequantization (derived from the canonical decoding)


def dequantize(t: GgmlType, data: bytes | np.ndarray, n_elements: int) -> np.ndarray:
    """Decode `n_elements` of on-disk type `t` from `data` into float32."""
    if t == GgmlType.F32:
        return np.frombuffer(data, dtype="<f4", count=n_elements).copy()
    if t == GgmlType.F16:
        return np.frombuffer(data, dtype="<f2", count=n_elements).astype(np.float32)
    if t == GgmlType.I8:
        return np.frombuffer(data, dtype=np.int8, count=n_elements).astype(np.float32)
    if t == GgmlType.I32:
        return np.frombuffer(data, dtype="<i4", count=n_elements).astype(np.float32)
    from llm_tpu import native

    fast = native.dequantize(int(t), data, n_elements)
    if fast is not None:
        return fast
    return decode_blocks(t, data, n_elements).to_float().reshape(-1)


# ---------------------------------------------------------------------------
# quantization (targets permitted by the reference quantizer,
# llm-base/src/quantize.rs:224-244: Q4_0/Q4_1/Q5_0/Q5_1/Q8_0)


def quantize(t: GgmlType, x: np.ndarray) -> bytes:
    """Encode float32 array into on-disk type `t` (ggml rounding semantics)."""
    data, _ = quantize_with_hist(t, x)
    return data


def quantize_with_hist(t: GgmlType, x: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Quantize and return (bytes, histogram[16]) like ggml_quantize_*."""
    x = np.ascontiguousarray(x, dtype=np.float32).reshape(-1)
    if t == GgmlType.F32:
        return x.astype("<f4").tobytes(), np.zeros(16, dtype=np.int64)
    if t == GgmlType.F16:
        return x.astype("<f2").tobytes(), np.zeros(16, dtype=np.int64)
    fn = _QUANT.get(t)
    if fn is None:
        raise NotImplementedError(f"quantize for {t}")
    bs = block_size(t)
    if x.size % bs != 0:
        raise ValueError(f"{x.size} not a multiple of block size {bs} for {t}")
    xb = x.reshape(-1, bs)
    return fn(xb)


def _signed_absmax(xb: np.ndarray) -> np.ndarray:
    """Per-row value with the largest magnitude (keeping its sign).

    ggml keeps the *signed* value of the first strict-max |x| element.
    """
    idx = np.argmax(np.abs(xb), axis=1)
    return xb[np.arange(xb.shape[0]), idx]


def _hist(vals: np.ndarray, nbins_shift: int = 0) -> np.ndarray:
    v = vals.reshape(-1).astype(np.int64) >> nbins_shift
    return np.bincount(v, minlength=16)[:16]


def _qz_q4_0(xb: np.ndarray) -> tuple[bytes, np.ndarray]:
    nb = xb.shape[0]
    maxv = _signed_absmax(xb)
    d = maxv / -8.0
    inv = np.where(d != 0.0, 1.0 / np.where(d == 0, 1, d), 0.0)
    q = np.minimum(15, (xb * inv[:, None] + 8.5).astype(np.int8)).astype(np.uint8)
    out = np.empty((nb, 18), dtype=np.uint8)
    out[:, 0:2] = d.astype("<f2")[:, None].view(np.uint8)
    out[:, 2:18] = _pack_nibbles(q)
    return out.tobytes(), _hist(q)


def _qz_q4_1(xb: np.ndarray) -> tuple[bytes, np.ndarray]:
    nb = xb.shape[0]
    mn = xb.min(axis=1)
    mx = xb.max(axis=1)
    d = (mx - mn) / 15.0
    inv = np.where(d != 0.0, 1.0 / np.where(d == 0, 1, d), 0.0)
    q = np.minimum(15, ((xb - mn[:, None]) * inv[:, None] + 0.5).astype(np.int8)).astype(
        np.uint8
    )
    out = np.empty((nb, 20), dtype=np.uint8)
    out[:, 0:2] = d.astype("<f2")[:, None].view(np.uint8)
    out[:, 2:4] = mn.astype("<f2")[:, None].view(np.uint8)
    out[:, 4:20] = _pack_nibbles(q)
    return out.tobytes(), _hist(q)


def _pack_q5(q: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """[nb,32] 5-bit values -> (qs [nb,16], qh [nb,4] bytes of u32)."""
    nibs = _pack_nibbles(q & 0xF)
    hi = ((q >> 4) & 1).astype(np.uint32)  # [nb, 32], element-order bits
    shifts = np.arange(32, dtype=np.uint32)[None, :]
    qh = (hi << shifts).sum(axis=1, dtype=np.uint32)
    return nibs, qh[:, None].view(np.uint8).reshape(-1, 4)


def _qz_q5_0(xb: np.ndarray) -> tuple[bytes, np.ndarray]:
    nb = xb.shape[0]
    maxv = _signed_absmax(xb)
    d = maxv / -16.0
    inv = np.where(d != 0.0, 1.0 / np.where(d == 0, 1, d), 0.0)
    q = np.minimum(31, (xb * inv[:, None] + 16.5).astype(np.int8)).astype(np.uint8)
    qs, qh = _pack_q5(q)
    out = np.empty((nb, 22), dtype=np.uint8)
    out[:, 0:2] = d.astype("<f2")[:, None].view(np.uint8)
    out[:, 2:6] = qh
    out[:, 6:22] = qs
    return out.tobytes(), _hist(q, 1)


def _qz_q5_1(xb: np.ndarray) -> tuple[bytes, np.ndarray]:
    nb = xb.shape[0]
    mn = xb.min(axis=1)
    mx = xb.max(axis=1)
    d = (mx - mn) / 31.0
    inv = np.where(d != 0.0, 1.0 / np.where(d == 0, 1, d), 0.0)
    q = np.minimum(31, ((xb - mn[:, None]) * inv[:, None] + 0.5).astype(np.int8)).astype(
        np.uint8
    )
    qs, qh = _pack_q5(q)
    out = np.empty((nb, 24), dtype=np.uint8)
    out[:, 0:2] = d.astype("<f2")[:, None].view(np.uint8)
    out[:, 2:4] = mn.astype("<f2")[:, None].view(np.uint8)
    out[:, 4:8] = qh
    out[:, 8:24] = qs
    return out.tobytes(), _hist(q, 1)


def _qz_q8_0(xb: np.ndarray) -> tuple[bytes, np.ndarray]:
    nb = xb.shape[0]
    amax = np.abs(xb).max(axis=1)
    d = amax / 127.0
    inv = np.where(d != 0.0, 1.0 / np.where(d == 0, 1, d), 0.0)
    # roundf: round half away from zero
    scaled = xb * inv[:, None]
    q = np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)
    q = q.astype(np.int8)
    out = np.empty((nb, 34), dtype=np.uint8)
    out[:, 0:2] = d.astype("<f2")[:, None].view(np.uint8)
    out[:, 2:34] = q.view(np.uint8)
    return out.tobytes(), _hist((q.astype(np.int64) + 128) >> 4)


_QUANT = {
    GgmlType.Q4_0: _qz_q4_0,
    GgmlType.Q4_1: _qz_q4_1,
    GgmlType.Q5_0: _qz_q5_0,
    GgmlType.Q5_1: _qz_q5_1,
    GgmlType.Q8_0: _qz_q8_0,
}

QUANTIZE_TARGETS = tuple(_QUANT.keys())
