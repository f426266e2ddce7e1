"""Coalesced (single-DMA-per-block) weight layout: pack/unpack roundtrip and
kernel parity vs the plane-layout oracle.

The coalesced layout (llm_tpu/ops/packing.py QuantTensorC) interleaves the
lo/hi/scale/bias rows of each (R-tile, K-tile) weight block into one
contiguous uint32 buffer so the Pallas kernel issues ONE linear DMA per grid
step — the round-5 experiment against the packed-plane DMA-pattern
hypothesis. Reference analog: the per-qtype fused vec_dot table
(/root/reference/crates/ggml/sys/src/lib.rs:2900-2974) this kernel replaces.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from llm_tpu.ggml.types import GgmlType
from llm_tpu.ggml.quant import quantize
from llm_tpu.ops.packing import (
    FORMATS,
    QuantTensor,
    coalesce_qt,
    coalesced_seg_rows,
    dequant_c_jnp,
    dequant_jnp,
    pack_ggml,
)
from llm_tpu.ops.qmatmul import (
    _qmatmul_pallas_c,
    _qmatmul_pallas_c_stacked,
    coalesce_tiles,
    qmatmul,
)

ALL_TYPES = list(FORMATS)


def _qt(t: GgmlType, K: int, R: int, seed: int = 0) -> QuantTensor:
    rng = np.random.default_rng(seed)
    w = (rng.standard_normal((R, K)) * 0.1).astype(np.float32)
    return pack_ggml(t, quantize(t, w), (K, R))


@pytest.mark.parametrize("t", ALL_TYPES)
def test_coalesce_dequant_roundtrip(t):
    K, R = 512, 256
    qt = _qt(t, K, R)
    tk, tr, _ = coalesce_tiles(qt.fmt, qt.k_padded, qt.r_padded,
                               qt.scale_packed)
    qtc = coalesce_qt(qt, tk, tr)
    ref = np.asarray(dequant_jnp(qt))
    got = np.asarray(dequant_c_jnp(qtc))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("t", [GgmlType.Q4_0, GgmlType.Q8_0, GgmlType.Q5_1,
                               GgmlType.Q4_K, GgmlType.Q6_K])
def test_coalesce_multi_tile_roundtrip(t):
    # force several k and r tiles
    K, R = 2048, 512
    qt = _qt(t, K, R, seed=3)
    segs_ok = [tk for tk in (512, 1024)
               if all(s % 8 == 0
                      for s in coalesced_seg_rows(qt.fmt, tk,
                                                  qt.scale_packed) if s)
               and qt.k_padded % tk == 0]
    tk = segs_ok[0]
    qtc = coalesce_qt(qt, tk, 128)
    np.testing.assert_array_equal(
        np.asarray(dequant_c_jnp(qtc)), np.asarray(dequant_jnp(qt))
    )


@pytest.mark.parametrize("t", ALL_TYPES)
def test_coalesced_kernel_interpret(t):
    K, R = 512, 256
    qt = _qt(t, K, R, seed=1)
    tk, tr, _ = coalesce_tiles(qt.fmt, qt.k_padded, qt.r_padded,
                               qt.scale_packed)
    qtc = coalesce_qt(qt, tk, tr)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, K)).astype(np.float32))
    ref = np.asarray(x) @ np.asarray(dequant_jnp(qt))
    got = np.asarray(_qmatmul_pallas_c(x, qtc, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("t", [GgmlType.Q4_0, GgmlType.Q8_0, GgmlType.Q4_K])
def test_coalesced_kernel_stacked_interpret(t):
    K, R, L = 512, 256, 3
    qts = [_qt(t, K, R, seed=10 + i) for i in range(L)]
    st = QuantTensor(
        qts[0].fmt_name, K, R,
        jnp.stack([q.lo for q in qts]),
        jnp.stack([q.hi for q in qts]) if qts[0].hi is not None else None,
        jnp.stack([q.scale for q in qts]),
        jnp.stack([q.bias for q in qts]) if qts[0].bias is not None else None,
    )
    tk, tr, _ = coalesce_tiles(qts[0].fmt, qts[0].k_padded,
                               qts[0].r_padded, qts[0].scale_packed)
    qtc = coalesce_qt(st, tk, tr)
    assert qtc.buf.ndim == 3 and qtc.buf.shape[0] == L
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((4, K)).astype(np.float32))
    for layer in range(L):
        ref = np.asarray(x) @ np.asarray(dequant_jnp(qts[layer]))
        got = np.asarray(
            _qmatmul_pallas_c_stacked(x, qtc, jnp.int32(layer),
                                      interpret=True)
        )
        np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_qmatmul_dispatch_xla_fallback():
    """qmatmul on a QuantTensorC without pallas goes through dequant_c_jnp
    (flat and layer-selected stacked)."""
    t = GgmlType.Q4_0
    K, R, L = 512, 256, 2
    qts = [_qt(t, K, R, seed=20 + i) for i in range(L)]
    tk, tr, _ = coalesce_tiles(qts[0].fmt, qts[0].k_padded,
                               qts[0].r_padded, qts[0].scale_packed)
    flat = coalesce_qt(qts[0], tk, tr)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, 5, K)).astype(np.float32))
    ref = np.asarray(x).reshape(-1, K) @ np.asarray(dequant_jnp(qts[0]))
    got = np.asarray(qmatmul(x, flat)).reshape(-1, R)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    st = QuantTensor(
        qts[0].fmt_name, K, R,
        jnp.stack([q.lo for q in qts]), None,
        jnp.stack([q.scale for q in qts]), None,
    )
    stc = coalesce_qt(st, tk, tr)
    ref1 = np.asarray(x).reshape(-1, K) @ np.asarray(dequant_jnp(qts[1]))
    got1 = np.asarray(qmatmul(x, stc, layer=jnp.int32(1))).reshape(-1, R)
    np.testing.assert_allclose(got1, ref1, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("t", ALL_TYPES)
def test_uncoalesce_roundtrip(t):
    """coalesce -> uncoalesce reproduces the original planes exactly
    (dtypes included) — the TP-sharding path depends on this inverse."""
    from llm_tpu.ops.packing import uncoalesce_qt

    K, R = 1024, 256
    qt = _qt(t, K, R, seed=31)
    tk, tr, _ = coalesce_tiles(qt.fmt, qt.k_padded, qt.r_padded,
                               qt.scale_packed)
    back = uncoalesce_qt(coalesce_qt(qt, tk, tr))
    for name in ("lo", "hi", "scale", "bias"):
        a, b = getattr(qt, name), getattr(back, name)
        if a is None:
            assert b is None
            continue
        assert np.asarray(a).dtype == np.asarray(b).dtype, name
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)
    assert (back.k, back.r) == (qt.k, qt.r)


def test_uncoalesce_roundtrip_stacked_q8():
    """Stacked (3D) byte-packed planes invert exactly too — the path TP
    sharding takes for layer-stacked q8_0 weights."""
    from llm_tpu.ops.packing import QuantTensor, uncoalesce_qt

    K, R, L = 512, 256, 2
    qts = [_qt(GgmlType.Q8_0, K, R, seed=60 + i) for i in range(L)]
    st = QuantTensor(
        qts[0].fmt_name, K, R,
        jnp.stack([q.lo for q in qts]), None,
        jnp.stack([q.scale for q in qts]), None,
    )
    tk, tr, _ = coalesce_tiles(qts[0].fmt, qts[0].k_padded,
                               qts[0].r_padded, qts[0].scale_packed)
    back = uncoalesce_qt(coalesce_qt(st, tk, tr))
    np.testing.assert_array_equal(
        np.asarray(back.lo), np.stack([np.asarray(q.lo) for q in qts])
    )
    np.testing.assert_array_equal(
        np.asarray(back.scale), np.stack([np.asarray(q.scale) for q in qts])
    )


def test_unfuse_through_coalesced():
    """fuse -> coalesce -> unfuse_quant recovers the original members
    (shard_params' route for launch-fused coalesced weights)."""
    from llm_tpu.ops.packing import fuse_quant, unfuse_quant

    t = GgmlType.Q4_0
    K, R = 512, 256
    qts = [_qt(t, K, R, seed=40 + i) for i in range(3)]
    fused = fuse_quant(qts)
    assert fused is not None
    tk, tr, _ = coalesce_tiles(fused.fmt, fused.k_padded, fused.r_padded,
                               fused.scale_packed)
    members = unfuse_quant(coalesce_qt(fused, tk, tr))
    assert len(members) == 3
    for got, ref in zip(members, qts):
        np.testing.assert_array_equal(
            np.asarray(dequant_jnp(got)), np.asarray(dequant_jnp(ref))
        )


def test_fused_coalesced_qmatmul_split():
    """Launch-fused q|k|v coalesced: one kernel call + split_fused
    recovers each member's product (incl. the R padding added by
    coalesce_auto's wide-lane policy)."""
    from llm_tpu.ops.packing import fuse_quant, split_fused
    from llm_tpu.ops.qmatmul import coalesce_auto

    t = GgmlType.Q4_0
    K, R = 512, 256
    qts = [_qt(t, K, R, seed=50 + i) for i in range(3)]
    fused = fuse_quant(qts)
    qtc = coalesce_auto(fused, to_device=True, min_k=0)
    assert qtc is not None and qtc.splits == fused.splits
    rng = np.random.default_rng(51)
    x = jnp.asarray(rng.standard_normal((4, K)).astype(np.float32))
    y = qmatmul(x, qtc)
    parts = split_fused(y, qtc.splits)
    assert [p.shape[-1] for p in parts] == [R, R, R]
    for p, ref_qt in zip(parts, qts):
        ref = np.asarray(x) @ np.asarray(dequant_jnp(ref_qt))
        np.testing.assert_allclose(np.asarray(p), ref, rtol=1e-4, atol=1e-4)


def test_model_coalesce_logit_parity(tmp_path, monkeypatch):
    """LLM_TPU_COALESCE=1: a loaded model's logits equal the plane-layout
    model's bit-for-bit (the coalesced layout is a re-tiling, not a
    requantization), including the tied-head coalesced copy."""
    from llm_tpu.loader import ModelParameters, load
    from llm_tpu.ops.packing import QuantTensorC
    from llm_tpu.session import InferenceSession
    from llm_tpu.testing import make_tiny_file

    path = tmp_path / "m.bin"
    # tied head exercises the coalesced head copy; q8_0 the byte-packed lo.
    # E=512 so the packed-scale segment rows hit sublane granularity (the
    # default tiny E has no legal coalesce tiling and falls back to planes)
    make_tiny_file("gpt2", path, element_type=GgmlType.Q8_0,
                   n_embd=512, n_head=8)

    ref = load(path, "gpt2", params=ModelParameters(context_size=64))
    s1 = InferenceSession(ref)
    s1.feed_prompt([2, 5, 7])
    monkeypatch.setenv("LLM_TPU_COALESCE", "1")
    monkeypatch.setenv("LLM_TPU_COALESCE_MIN_K", "0")  # tiny test shapes
    got = load(path, "gpt2", params=ModelParameters(context_size=64))
    assert isinstance(got.params.layers.w_up, QuantTensorC)
    assert isinstance(got.params.lm_head, QuantTensorC)
    s2 = InferenceSession(got)
    s2.feed_prompt([2, 5, 7])
    np.testing.assert_allclose(s2.last_logits, s1.last_logits,
                               rtol=1e-5, atol=1e-5)


def test_shard_params_on_coalesced(tmp_path, monkeypatch):
    """shard_params on a coalesced model converts back to planes and
    shards; sharded logits match the unsharded ones."""
    import jax
    import jax.numpy as jnp

    from llm_tpu.loader import ModelParameters, load
    from llm_tpu.parallel.sharding import (
        MeshConfig,
        make_mesh,
        shard_params,
    )
    from llm_tpu.ops.packing import QuantTensor
    from llm_tpu.testing import make_tiny_file

    path = tmp_path / "m.bin"
    make_tiny_file("llama", path, element_type=GgmlType.Q4_0,
                   n_embd=512, n_head=8)
    monkeypatch.setenv("LLM_TPU_COALESCE", "1")
    monkeypatch.setenv("LLM_TPU_COALESCE_MIN_K", "0")  # tiny test shapes
    model = load(path, "llama", params=ModelParameters(context_size=64))
    mesh = make_mesh(MeshConfig(data=1, model=4))
    sharded = shard_params(model.params, mesh)
    assert isinstance(sharded.layers.w_up, QuantTensor)

    from llm_tpu.models.forward import forward, init_cache

    ids = jnp.asarray([2, 5, 7], jnp.int32)
    cache = init_cache(model.spec, jnp.float32)
    logits_ref, _, _ = forward(model.spec, model.params, ids,
                               jnp.int32(0), cache)
    cache2 = init_cache(model.spec, jnp.float32)
    with mesh:
        logits_sh, _, _ = forward(model.spec, sharded, ids,
                                  jnp.int32(0), cache2)
    np.testing.assert_allclose(np.asarray(logits_sh), np.asarray(logits_ref),
                               rtol=1e-4, atol=1e-4)


def test_sub_slicing_engages():
    """Whole-K coalescing with sub-slices: K large enough that
    coalesce_tiles picks sub_slices > 1, kernel still exact."""
    t = GgmlType.Q4_0
    K, R = 4096, 256
    qt = _qt(t, K, R, seed=7)
    tk, tr, n_sub = coalesce_tiles(qt.fmt, qt.k_padded, qt.r_padded,
                                   qt.scale_packed)
    assert tk == qt.k_padded and n_sub == 2
    qtc = coalesce_qt(qt, tk, tr)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((4, K)).astype(np.float32))
    # bf16-semantics reference (the kernel dots in bf16; at K=4096 the
    # rounding vs an f32 reference exceeds elementwise rtol)
    ref = np.asarray(
        jnp.dot(x.astype(jnp.bfloat16),
                dequant_jnp(qt).astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    )
    got = np.asarray(_qmatmul_pallas_c(x, qtc, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)
