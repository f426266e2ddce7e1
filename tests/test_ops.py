"""Packing + qmatmul tests: device representation equals the numpy codecs."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from llm_tpu.ggml.types import GgmlType
from llm_tpu.ggml.quant import quantize, dequantize
from llm_tpu.ops import pack_ggml, dequant_jnp, qmatmul, quant_rows_lookup
from llm_tpu.ops.packing import QuantTensor
from llm_tpu.ops.qmatmul import _qmatmul_pallas

ALL_QTYPES = [
    GgmlType.Q4_0,
    GgmlType.Q4_1,
    GgmlType.Q5_0,
    GgmlType.Q5_1,
    GgmlType.Q8_0,
    GgmlType.Q2_K,
    GgmlType.Q3_K,
    GgmlType.Q4_K,
    GgmlType.Q5_K,
    GgmlType.Q6_K,
]


# byte offsets of the f16 scale fields inside each K-quant block
_KQ_SCALE_OFFSETS = {
    GgmlType.Q2_K: (80, 82),
    GgmlType.Q3_K: (108,),
    GgmlType.Q4_K: (0, 2),
    GgmlType.Q5_K: (0, 2),
    GgmlType.Q6_K: (208,),
}


def _random_raw(rng, t, K, R):
    """Random valid raw bytes for type t as a [K, R]-dim ggml tensor."""
    if t in (GgmlType.Q4_0, GgmlType.Q4_1, GgmlType.Q5_0, GgmlType.Q5_1, GgmlType.Q8_0):
        x = rng.normal(size=K * R).astype(np.float32)
        return quantize(t, x)
    # K-quants have no encoder yet: random bytes are a valid bitstream, but
    # overwrite the f16 super-scales with sane magnitudes (random f16 bit
    # patterns include NaN/65k values that make comparisons meaningless).
    from llm_tpu.ggml.types import type_size, block_size

    nb = K * R // block_size(t)
    ts = type_size(t)
    raw = rng.integers(0, 256, size=(nb, ts), dtype=np.uint8)
    for off in _KQ_SCALE_OFFSETS[t]:
        d = rng.uniform(0.01, 0.05, size=nb).astype(np.float16)
        raw[:, off : off + 2] = d[:, None].view(np.uint8)
    return raw.tobytes()


@pytest.mark.parametrize("t", ALL_QTYPES)
def test_pack_dequant_matches_codec(t):
    rng = np.random.default_rng(11)
    K, R = 256, 96  # R not a lane multiple -> exercises padding
    raw = _random_raw(rng, t, K, R)
    expected = dequantize(t, raw, K * R).reshape(R, K).T  # [K, R]

    qt = pack_ggml(t, raw, (K, R))
    assert isinstance(qt, QuantTensor)
    assert qt.shape == (K, R)
    assert qt.r_padded % 128 == 0
    got = np.asarray(dequant_jnp(qt))
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-6)


def test_pack_dense_f16():
    rng = np.random.default_rng(1)
    K, R = 64, 32
    w = rng.normal(size=(R, K)).astype(np.float16)
    arr = pack_ggml(GgmlType.F16, w.tobytes(), (K, R))
    assert arr.shape == (K, R)
    np.testing.assert_array_equal(np.asarray(arr), w.T)


@pytest.mark.parametrize("t", [GgmlType.Q4_0, GgmlType.Q8_0, GgmlType.Q4_K])
def test_qmatmul_xla_path(t, monkeypatch):
    monkeypatch.setenv("LLM_TPU_KERNELS", "xla")
    rng = np.random.default_rng(5)
    K, R, M = 256, 128, 4
    raw = _random_raw(rng, t, K, R)
    qt = pack_ggml(t, raw, (K, R))
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    y = qmatmul(x, qt)
    assert y.shape == (M, R)
    wd = dequantize(t, raw, K * R).reshape(R, K).T
    expected = np.asarray(x) @ wd
    np.testing.assert_allclose(np.asarray(y), expected, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("t", ALL_QTYPES)
def test_qmatmul_pallas_interpret_matches_xla(t):
    """The Pallas kernel (interpreter mode on CPU) must equal the same math
    (bf16 weights/activations, f32 accumulation) done in plain XLA."""
    rng = np.random.default_rng(9)
    K, R, M = 512, 256, 3
    raw = _random_raw(rng, t, K, R)
    qt = pack_ggml(t, raw, (K, R))
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))

    wd = dequant_jnp(qt).astype(jnp.bfloat16)
    y_ref = np.asarray(
        jax.lax.dot_general(
            x.astype(jnp.bfloat16),
            wd,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    )
    y_pal = _qmatmul_pallas(x, qt, tile_r=128, tile_k=256, interpret=True)
    assert y_pal.shape == (M, R)
    scale = np.abs(y_ref).max()
    np.testing.assert_allclose(np.asarray(y_pal), y_ref, atol=1e-5 * max(scale, 1.0), rtol=1e-5)


@pytest.mark.parametrize("t", [GgmlType.Q4_0, GgmlType.Q5_1, GgmlType.Q4_K])
def test_qmatmul_x_resident_matches_streaming(t, monkeypatch):
    """The VMEM-resident x path (constant block index, in-kernel k-slice)
    must be BIT-identical to the per-tile streamed x path — both feed the
    same bf16 blocks to the same dot; only the DMA schedule differs."""
    from llm_tpu.ops.qmatmul import _qmatmul_pallas, _qmatmul_pallas_stacked

    rng = np.random.default_rng(11)
    K, R, M, L = 512, 256, 8, 3
    raw = _random_raw(rng, t, K, R)
    qt = pack_ggml(t, raw, (K, R))
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))

    def set_mode(mb):
        # the env var is read at TRACE time: drop cached traces so the
        # flip actually takes effect for identical call signatures
        monkeypatch.setenv("LLM_TPU_X_RES_MB", mb)
        _qmatmul_pallas.clear_cache()
        _qmatmul_pallas_stacked.clear_cache()

    set_mode("0")  # force streaming
    y_stream = np.asarray(
        _qmatmul_pallas(x, qt, tile_r=128, tile_k=128, interpret=True)
    )
    set_mode("64")  # force resident
    y_res = np.asarray(
        _qmatmul_pallas(x, qt, tile_r=128, tile_k=128, interpret=True)
    )
    np.testing.assert_array_equal(y_stream, y_res)

    # stacked (scalar-prefetch layer select) variant, both x modes
    qts = [pack_ggml(t, _random_raw(rng, t, K, R), (K, R)) for _ in range(L)]
    stacked = type(qt)(
        qt.fmt_name, K, R,
        jnp.stack([q.lo for q in qts]),
        jnp.stack([q.hi for q in qts]) if qts[0].hi is not None else None,
        jnp.stack([q.scale for q in qts]),
        jnp.stack([q.bias for q in qts]) if qts[0].bias is not None else None,
    )
    for layer in (0, L - 1):
        set_mode("0")
        ys = np.asarray(
            _qmatmul_pallas_stacked(
                x, stacked, jnp.int32(layer), tile_r=128, tile_k=128,
                interpret=True,
            )
        )
        set_mode("64")
        yr = np.asarray(
            _qmatmul_pallas_stacked(
                x, stacked, jnp.int32(layer), tile_r=128, tile_k=128,
                interpret=True,
            )
        )
        np.testing.assert_array_equal(ys, yr)
        ref = np.asarray(
            jax.lax.dot_general(
                x.astype(jnp.bfloat16),
                dequant_jnp(qts[layer]).astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
        np.testing.assert_allclose(yr, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize(
    "t", [GgmlType.Q4_0, GgmlType.Q5_1, GgmlType.Q4_K, GgmlType.Q8_0,
          GgmlType.Q6_K]
)
def test_qmatmul_sub_k_matches_whole_tile(t, monkeypatch):
    """The sub-sliced kernel body (LLM_TPU_SUB_K: unpack/dequant/dot the K
    tile in VMEM-sized sub-slices while the DMA block stays whole-tile)
    computes the same bf16-weights/f32-accumulation math; only the f32
    accumulation ORDER differs (one partial sum per sub-slice, exactly
    like the k-tile loop across tiles), so compare at f32 rounding
    tolerance relative to the output scale."""
    from llm_tpu.ops.qmatmul import _qmatmul_pallas, _qmatmul_pallas_stacked

    rng = np.random.default_rng(13)
    K, R, M, L = 512, 256, 8, 2
    raw = _random_raw(rng, t, K, R)
    qt = pack_ggml(t, raw, (K, R))
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))

    def set_mode(sub):
        monkeypatch.setenv("LLM_TPU_SUB_K", sub)
        _qmatmul_pallas.clear_cache()
        _qmatmul_pallas_stacked.clear_cache()

    set_mode("0")
    y_whole = np.asarray(
        _qmatmul_pallas(x, qt, tile_r=128, tile_k=512, interpret=True)
    )
    ref = np.asarray(
        jax.lax.dot_general(
            x.astype(jnp.bfloat16),
            dequant_jnp(qt).astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    )
    tol = 1e-5 * max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(y_whole, ref, atol=tol, rtol=1e-4)
    for sub in ("128", "256"):
        set_mode(sub)
        y_sub = np.asarray(
            _qmatmul_pallas(x, qt, tile_r=128, tile_k=512, interpret=True)
        )
        np.testing.assert_allclose(y_sub, ref, atol=tol, rtol=1e-4)

    # stacked variant
    qts = [pack_ggml(t, _random_raw(rng, t, K, R), (K, R)) for _ in range(L)]
    stacked = type(qt)(
        qt.fmt_name, K, R,
        jnp.stack([q.lo for q in qts]),
        jnp.stack([q.hi for q in qts]) if qts[0].hi is not None else None,
        jnp.stack([q.scale for q in qts]),
        jnp.stack([q.bias for q in qts]) if qts[0].bias is not None else None,
    )
    set_mode("128")
    for layer in (0, L - 1):
        y = np.asarray(
            _qmatmul_pallas_stacked(
                x, stacked, jnp.int32(layer), tile_r=128, tile_k=512,
                interpret=True,
            )
        )
        ref_l = np.asarray(
            jax.lax.dot_general(
                x.astype(jnp.bfloat16),
                dequant_jnp(qts[layer]).astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
        np.testing.assert_allclose(
            y, ref_l, atol=1e-5 * max(np.abs(ref_l).max(), 1.0), rtol=1e-4
        )


def test_rows_lookup():
    rng = np.random.default_rng(2)
    K, R = 64, 160
    raw = _random_raw(rng, GgmlType.Q8_0, K, R)
    qt = pack_ggml(GgmlType.Q8_0, raw, (K, R))
    ids = jnp.asarray([0, 5, 159])
    rows = quant_rows_lookup(qt, ids)
    assert rows.shape == (3, K)
    full = dequantize(GgmlType.Q8_0, raw, K * R).reshape(R, K)
    np.testing.assert_allclose(np.asarray(rows), full[np.asarray(ids)], rtol=1e-6)


def test_packed_f16_scales_bit_exact(monkeypatch):
    """Packed-f16 scale planes must dequantize BIT-identically to f32 planes
    (the stored scales are f16 in the file, so both round-trips are exact)."""
    import numpy as np
    from llm_tpu.ggml.quant import quantize
    from llm_tpu.ggml.types import GgmlType
    from llm_tpu.ops import packing

    rng = np.random.default_rng(7)
    for t in [GgmlType.Q4_0, GgmlType.Q4_1, GgmlType.Q5_1, GgmlType.Q8_0]:
        x = rng.standard_normal(64 * 9, dtype=np.float32)
        data = quantize(t, x)
        qt_packed = packing.pack_ggml(t, data, (64, 9))
        assert qt_packed.scale_packed
        monkeypatch.setenv("LLM_TPU_SCALE_PACK", "0")
        qt_f32 = packing.pack_ggml(t, data, (64, 9))
        monkeypatch.delenv("LLM_TPU_SCALE_PACK")
        assert not qt_f32.scale_packed
        np.testing.assert_array_equal(
            np.asarray(packing.dequant_jnp(qt_packed)),
            np.asarray(packing.dequant_jnp(qt_f32)),
        )


def test_expand_f16x2_edge_values():
    """Integer f16->f32 expansion: zeros, denormals, negatives, max."""
    import numpy as np
    from llm_tpu.ops.packing import _pack_f16x2_np, expand_f16x2

    vals = np.array(
        [[0.0, -0.0], [6e-8, -6e-8], [5.96e-8, 65504.0], [1.0, -2.5],
         [6.1e-5, -6.1e-5], [3.0517578125e-05, 0.25]],
        dtype=np.float32,
    )
    f16 = vals.astype(np.float16).astype(np.float32)
    packed = _pack_f16x2_np(f16)
    out = np.asarray(expand_f16x2(packed))
    np.testing.assert_array_equal(out, f16)


@pytest.mark.parametrize("packed", [False, True])
@pytest.mark.parametrize(
    "fname", ["q4_0", "q5_1", "q8_0", "q2_k", "q3_k", "q4_k", "q5_k", "q6_k"]
)
def test_tile_selection_invariants_real_geometries(fname, packed,
                                                   monkeypatch):
    """Pure-host guard over the kernel's shape-dependent tile selection at
    REAL model geometries (GPT-2 768, LLaMA 4096/11008, 13B 5120/13824,
    Falcon-40B 8192): for every (format, K, M, SUB_K) combination the
    chosen tiles must divide, every plane's sliced row count must respect
    the 8-sublane step, and the sub-sliced full-K upgrade must never
    produce an unsliced whole-K body (the VMEM blowup the caps exist to
    avoid)."""
    from llm_tpu.ops.packing import _BY_NAME
    from llm_tpu.ops.qmatmul import (
        _k_step,
        _maybe_full_k,
        _pick_tile,
        _tile_prefs,
    )

    _, fmt = _BY_NAME[fname]
    if packed and fmt.gsize * 2 > 32:
        pass  # packed scales halve scale rows; still legal for all formats
    for Kp in (768, 2048, 2560, 4096, 5120, 8192, 11008, 13824):
        step = _k_step(fmt, packed, Kp)
        if Kp % step and step != Kp:
            continue  # geometry this format would have K-padded away
        for Mp in (8, 64, 512):
            for sub_env in ("", "0", "1024", "2048"):
                if sub_env:
                    monkeypatch.setenv("LLM_TPU_SUB_K", sub_env)
                else:
                    monkeypatch.delenv("LLM_TPU_SUB_K", raising=False)
                tile_r, tile_k = _tile_prefs(Mp, None, None)
                tile_k = _pick_tile(Kp, tile_k, step)
                assert Kp % tile_k == 0, (fname, Kp, tile_k)
                tile_k2, n_sub = _maybe_full_k(fmt, packed, Kp, Mp, tile_k)
                assert Kp % tile_k2 == 0
                assert tile_k2 % n_sub == 0
                slice_k = tile_k2 // n_sub
                # every plane's sliced rows stay sublane-aligned
                assert slice_k % _k_step(fmt, packed, tile_k2) == 0 or \
                    n_sub == 1
                g_rows = tile_k2 // fmt.gsize // (2 if packed else 1)
                assert g_rows % n_sub == 0
                target = int(sub_env or 0)
                if target <= 0:
                    assert n_sub == 1 and tile_k2 == tile_k
                else:
                    # the full-K upgrade must keep slices bounded; a
                    # geometry with no legal slicing keeps its capped tile
                    if tile_k2 > tile_k:
                        assert n_sub > 1
                        assert slice_k <= max(2048, target)
