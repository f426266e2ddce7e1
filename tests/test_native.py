"""Native C++ codec vs numpy-codec equivalence (the numpy path is the
ground-truth oracle; the native path must bit-match it)."""

import numpy as np
import pytest

from llm_tpu import native
from llm_tpu.ggml.quant import dequantize as np_dequantize, quantize
from llm_tpu.ggml.types import GgmlType
from llm_tpu.ops import packing

ALL_TYPES = [
    GgmlType.Q4_0, GgmlType.Q4_1, GgmlType.Q5_0, GgmlType.Q5_1,
    GgmlType.Q8_0, GgmlType.Q2_K, GgmlType.Q3_K, GgmlType.Q4_K,
    GgmlType.Q5_K, GgmlType.Q6_K,
]

K_QUANT_RAW = {
    GgmlType.Q2_K, GgmlType.Q3_K, GgmlType.Q4_K, GgmlType.Q5_K, GgmlType.Q6_K,
}


def _random_blocks(t: GgmlType, n: int, seed=0) -> bytes:
    """Random valid block bytes: for 32-blocks use the real quantizer; for
    K-quants use random raw bytes with sane f16 scale fields."""
    rng = np.random.default_rng(seed)
    if t not in K_QUANT_RAW:
        x = rng.standard_normal(n, dtype=np.float32)
        return quantize(t, x)
    from llm_tpu.ggml.types import type_size, block_size

    nb = n // block_size(t)
    raw = rng.integers(0, 256, size=(nb, type_size(t)), dtype=np.uint8)
    # overwrite f16 scale fields with small valid halves to avoid NaN/inf
    d16 = np.float16(rng.uniform(0.001, 0.1, size=nb)).view(np.uint8).reshape(nb, 2)
    offs = {
        GgmlType.Q2_K: [80, 82], GgmlType.Q3_K: [108],
        GgmlType.Q4_K: [0, 2], GgmlType.Q5_K: [0, 2], GgmlType.Q6_K: [208],
    }[t]
    for o in offs:
        raw[:, o : o + 2] = d16
    return raw.tobytes()


@pytest.fixture(scope="module")
def lib_available():
    if native.get_lib() is None:
        pytest.skip("native codec library unavailable")


@pytest.mark.parametrize("t", ALL_TYPES)
def test_native_dequantize_matches_numpy(t, lib_available):
    n = 4 * (256 if t in K_QUANT_RAW else 32) * 3
    data = _random_blocks(t, n)
    ref = np_dequantize(t, data, n)
    got = native.dequantize(int(t), data, n)
    assert got is not None
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("t", ALL_TYPES)
def test_native_transcode_matches_numpy(t, lib_available, monkeypatch):
    bs = 256 if t in K_QUANT_RAW else 32
    K, R = bs * 2, 9
    data = _random_blocks(t, K * R, seed=3)

    qt_native = packing.pack_ggml(t, data, (K, R))
    # force the numpy path
    monkeypatch.setenv("LLM_TPU_NATIVE", "0")
    monkeypatch.setattr(native, "_tried", False)
    monkeypatch.setattr(native, "_lib", None)
    qt_np = packing.pack_ggml(t, data, (K, R))
    monkeypatch.setenv("LLM_TPU_NATIVE", "1")
    monkeypatch.setattr(native, "_tried", False)
    monkeypatch.setattr(native, "_lib", None)

    np.testing.assert_array_equal(np.asarray(qt_native.lo), np.asarray(qt_np.lo))
    if qt_np.hi is not None:
        np.testing.assert_array_equal(np.asarray(qt_native.hi), np.asarray(qt_np.hi))
    np.testing.assert_allclose(
        np.asarray(qt_native.scale), np.asarray(qt_np.scale), rtol=1e-6
    )
    if qt_np.bias is not None:
        np.testing.assert_allclose(
            np.asarray(qt_native.bias), np.asarray(qt_np.bias), rtol=1e-6
        )


@pytest.mark.parametrize("t", [GgmlType.Q4_0, GgmlType.Q5_K])
def test_native_transcode_row_selection(t, lib_available, monkeypatch):
    bs = 256 if t in K_QUANT_RAW else 32
    K, R = bs, 12
    data = _random_blocks(t, K * R, seed=5)
    rows = np.array([7, 0, 3], dtype=np.int64)

    qt_native = packing.pack_ggml(t, data, (K, R), rows=rows)
    monkeypatch.setenv("LLM_TPU_NATIVE", "0")
    monkeypatch.setattr(native, "_tried", False)
    monkeypatch.setattr(native, "_lib", None)
    qt_np = packing.pack_ggml(t, data, (K, R), rows=rows)
    monkeypatch.setenv("LLM_TPU_NATIVE", "1")
    monkeypatch.setattr(native, "_tried", False)
    monkeypatch.setattr(native, "_lib", None)

    assert qt_native.r == 3
    np.testing.assert_array_equal(np.asarray(qt_native.lo), np.asarray(qt_np.lo))
    np.testing.assert_allclose(
        np.asarray(qt_native.scale), np.asarray(qt_np.scale), rtol=1e-6
    )
