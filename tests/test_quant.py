"""Codec tests for the GGML block-quant formats.

Strategy (mirrors the reference's format unit tests + bindgen layout guards,
SURVEY.md §4): structural size checks, hand-computed micro-examples, and
quantize→dequantize roundtrip error bounds per format.
"""

import numpy as np
import pytest

from llm_tpu.ggml.types import GgmlType, block_size, type_size, data_size
from llm_tpu.ggml.quant import dequantize, quantize, quantize_with_hist, QUANTIZE_TARGETS


def test_type_layout_table():
    # bytes-per-block values from the ggml C structs (sys/src/lib.rs)
    assert (block_size(GgmlType.Q4_0), type_size(GgmlType.Q4_0)) == (32, 18)
    assert (block_size(GgmlType.Q4_1), type_size(GgmlType.Q4_1)) == (32, 20)
    assert (block_size(GgmlType.Q5_0), type_size(GgmlType.Q5_0)) == (32, 22)
    assert (block_size(GgmlType.Q5_1), type_size(GgmlType.Q5_1)) == (32, 24)
    assert (block_size(GgmlType.Q8_0), type_size(GgmlType.Q8_0)) == (32, 34)
    assert (block_size(GgmlType.Q2_K), type_size(GgmlType.Q2_K)) == (256, 84)
    assert (block_size(GgmlType.Q3_K), type_size(GgmlType.Q3_K)) == (256, 110)
    assert (block_size(GgmlType.Q4_K), type_size(GgmlType.Q4_K)) == (256, 144)
    assert (block_size(GgmlType.Q5_K), type_size(GgmlType.Q5_K)) == (256, 176)
    assert (block_size(GgmlType.Q6_K), type_size(GgmlType.Q6_K)) == (256, 210)
    assert data_size(GgmlType.Q4_0, 4096) == 4096 // 32 * 18


def test_q4_0_known_block():
    # One block: elements 0..15 -> low nibbles, 16..31 -> high nibbles.
    # d = 1.0 (f16 0x3C00); nibble value v decodes to (v - 8) * d.
    qs = bytes(((i + 1) % 16) << 4 | (i % 16) for i in range(16))
    raw = np.float16(1.0).tobytes() + qs
    y = dequantize(GgmlType.Q4_0, raw, 32)
    expected_lo = [(i % 16) - 8 for i in range(16)]
    expected_hi = [((i + 1) % 16) - 8 for i in range(16)]
    np.testing.assert_array_equal(y, np.array(expected_lo + expected_hi, dtype=np.float32))


def test_q8_0_known_block():
    d = np.float16(0.5)
    qs = np.arange(-16, 16, dtype=np.int8)
    raw = d.tobytes() + qs.tobytes()
    y = dequantize(GgmlType.Q8_0, raw, 32)
    np.testing.assert_allclose(y, qs.astype(np.float32) * 0.5)


def test_q5_0_high_bits():
    # qh bit j is the 5th bit of element j; with all nibbles 0 and d=1,
    # element j decodes to (16*bit_j) - 16.
    d = np.float16(1.0).tobytes()
    qh = np.uint32(0b1010_1010_1010_1010_1010_1010_1010_1010).tobytes()
    qs = bytes(16)
    y = dequantize(GgmlType.Q5_0, d + qh + qs, 32)
    expected = np.where(np.arange(32) % 2 == 1, 0.0, -16.0)
    np.testing.assert_array_equal(y, expected.astype(np.float32))


@pytest.mark.parametrize("t", QUANTIZE_TARGETS)
def test_roundtrip_error_bound(t):
    rng = np.random.default_rng(42)
    x = rng.normal(size=2048).astype(np.float32)
    raw = quantize(t, x)
    assert len(raw) == data_size(t, x.size)
    y = dequantize(t, raw, x.size)
    # Worst block-wise error: a full step for the symmetric formats (the
    # positive extreme clips: grid is [-2^(b-1), 2^(b-1)-1] * d), half a
    # step for the min/max formats; plus fp16-scale rounding slack.
    amax = np.abs(x.reshape(-1, 32)).max(axis=1, keepdims=True)
    steps = {
        GgmlType.Q4_0: 8,  # step = amax/8, clip error up to 1 step
        GgmlType.Q4_1: 15,  # step = range/15, error <= step/2 < amax/15
        GgmlType.Q5_0: 16,
        GgmlType.Q5_1: 31,
        GgmlType.Q8_0: 127,
    }
    tol = (amax / steps[t]) * 1.1 + 1e-3
    err = np.abs((x - y).reshape(-1, 32))
    assert (err <= tol).all(), f"max err {err.max()} vs tol {tol.max()}"


@pytest.mark.parametrize("t", QUANTIZE_TARGETS)
def test_quantize_is_idempotent_on_decoded_values(t):
    # quantize(dequantize(quantize(x))) must be byte-identical to quantize(x)
    rng = np.random.default_rng(7)
    x = rng.normal(size=1024).astype(np.float32)
    raw1 = quantize(t, x)
    y = dequantize(t, raw1, x.size)
    raw2 = quantize(t, y)
    assert raw1 == raw2


def test_histogram_counts():
    x = np.linspace(-1, 1, 256).astype(np.float32)
    _, hist = quantize_with_hist(GgmlType.Q4_0, x)
    assert hist.sum() == 256
    assert hist.shape == (16,)


@pytest.mark.parametrize(
    "t", [GgmlType.Q2_K, GgmlType.Q3_K, GgmlType.Q4_K, GgmlType.Q5_K, GgmlType.Q6_K]
)
def test_kquant_dequant_shapes_and_determinism(t):
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 256, size=2 * type_size(t), dtype=np.uint8).tobytes()
    y1 = dequantize(t, raw, 512)
    y2 = dequantize(t, raw, 512)
    assert y1.shape == (512,)
    assert y1.dtype == np.float32
    np.testing.assert_array_equal(y1, y2)
    assert np.isfinite(y1).all()


def test_q4_k_known_block():
    # Construct a Q4_K block where sub-block 0 has scale 2, min 1 and all
    # quants equal 3 -> value = d*sc*q - dmin*mn = 1*2*3 - 1*1 = 5.
    d = np.float16(1.0).tobytes()
    dmin = np.float16(1.0).tobytes()
    scales = bytearray(12)
    scales[0] = 2  # sc[0] = 2
    scales[4] = 1  # mn[0] = 1
    qs = bytearray(128)
    for i in range(16):  # first 32 elements = low nibbles of bytes 0..31
        qs[i] = 0x33
        qs[i + 16] = 0x33
    raw = d + dmin + bytes(scales) + bytes(qs)
    y = dequantize(GgmlType.Q4_K, raw, 256)
    np.testing.assert_allclose(y[:32], np.full(32, 5.0, dtype=np.float32))
    # sub-block 1 (elements 32..63): sc=0, mn=0 -> high nibble*0 - 0 = 0
    np.testing.assert_allclose(y[32:64], np.zeros(32, dtype=np.float32))


def test_q6_k_known_block():
    # All ql/qh zero -> q = -32 everywhere; scales[i]=1, d=0.25 -> y = -8.
    ql = bytes(128)
    qh = bytes(64)
    scales = np.ones(16, dtype=np.int8).tobytes()
    d = np.float16(0.25).tobytes()
    y = dequantize(GgmlType.Q6_K, ql + qh + scales + d, 256)
    np.testing.assert_allclose(y, np.full(256, -8.0, dtype=np.float32))


@pytest.mark.parametrize(
    "t,rel_bound",
    [
        (GgmlType.Q2_K, 0.35),
        (GgmlType.Q3_K, 0.19),
        (GgmlType.Q4_K, 0.09),
        (GgmlType.Q5_K, 0.05),
        (GgmlType.Q6_K, 0.025),
    ],
)
def test_kquant_roundtrip_error_bound(t, rel_bound):
    """Encoders for ggml_quantize_q2_K..q6_K (sys/src/lib.rs:3472-3516):
    encode->decode error bounded per bit-width; each extra bit roughly
    halves relative RMSE on gaussian data."""
    rng = np.random.default_rng(42)
    x = rng.normal(size=4096).astype(np.float32)
    raw = quantize(t, x)
    assert len(raw) == data_size(t, x.size)
    y = dequantize(t, raw, x.size)
    err = x - y
    rel = np.sqrt((err**2).mean()) / np.sqrt((x**2).mean())
    assert rel < rel_bound, f"{t}: rel RMSE {rel:.4f} >= {rel_bound}"
    # worst sub-block error bounded relative to its own amax
    sub = np.abs(err).reshape(-1, 16).max(1) / (
        np.abs(x).reshape(-1, 16).max(1) + 1e-9
    )
    assert sub.max() < 2.6 * rel_bound


def test_q4_k_beats_q4_1_on_gaussian():
    """The two-level scale scheme must actually pay off at equal nibble
    width (the point of K-quants)."""
    rng = np.random.default_rng(7)
    x = rng.normal(size=8192).astype(np.float32)
    errs = {}
    for t in (GgmlType.Q4_K, GgmlType.Q4_1):
        y = dequantize(t, quantize(t, x), x.size)
        errs[t] = float(np.sqrt(((x - y) ** 2).mean()))
    assert errs[GgmlType.Q4_K] < errs[GgmlType.Q4_1]


@pytest.mark.parametrize(
    "t", [GgmlType.Q2_K, GgmlType.Q3_K, GgmlType.Q4_K, GgmlType.Q5_K, GgmlType.Q6_K]
)
def test_kquant_encode_constant_and_zero_blocks(t):
    """Degenerate inputs (all-zero, constant) must encode without division
    blowups and decode to something close."""
    for v in (0.0, 1.5, -0.25):
        x = np.full(512, v, np.float32)
        y = dequantize(t, quantize(t, x), x.size)
        assert np.isfinite(y).all()
        tol = 0.26 * abs(v) + 1e-6  # Q2_K worst case: 2-bit symmetric-ish
        assert np.abs(y - x).max() <= tol, (v, np.abs(y - x).max())
