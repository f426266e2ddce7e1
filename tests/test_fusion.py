"""Launch-fused QKV / gate-up weights: fuse_quant must be exact (same
outputs as split kernels, including intra-fusion R padding), unfuse must
round-trip the planes, and a fused model must produce the same logits as
the same checkpoint loaded with fusion disabled."""

import jax.numpy as jnp
import numpy as np
import pytest

from llm_tpu.ggml.types import GgmlType
from llm_tpu.loader import ModelParameters, load
from llm_tpu.models.forward import forward_step, init_cache
from llm_tpu.ops.packing import (
    fuse_quant,
    pack_ggml,
    split_fused,
    unfuse_quant,
)
from llm_tpu.ggml.quant import quantize
from llm_tpu.ops.qmatmul import qmatmul
from llm_tpu.testing import make_tiny_file


def _qt(rng, k, r, gt=GgmlType.Q4_0):
    w = rng.normal(size=(r, k)).astype(np.float32)  # ggml row-major [R, K]
    return pack_ggml(gt, quantize(gt, w), (k, r)), w.T  # K-major logical


def test_fuse_matches_split_matmul():
    rng = np.random.default_rng(0)
    k = 64
    qa, wa = _qt(rng, k, 64)
    qb, wb = _qt(rng, k, 192)
    qc, wc = _qt(rng, k, 64)
    fused = fuse_quant([qa, qb, qc])
    assert fused is not None
    assert fused.splits == tuple((q.r, q.r_padded) for q in (qa, qb, qc))

    x = jnp.asarray(rng.normal(size=(4, k)), jnp.float32)
    ya, yb, yc = split_fused(qmatmul(x, fused), fused.splits)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(qmatmul(x, qa)),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(yb), np.asarray(qmatmul(x, qb)),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(yc), np.asarray(qmatmul(x, qc)),
                               rtol=1e-5, atol=1e-5)


def test_unfuse_roundtrip():
    rng = np.random.default_rng(1)
    qa, _ = _qt(rng, 64, 64)
    qb, _ = _qt(rng, 64, 128)
    fused = fuse_quant([qa, qb])
    ra, rb = unfuse_quant(fused)
    for orig, back in ((qa, ra), (qb, rb)):
        assert back.k == orig.k and back.r == orig.r
        assert back.fmt_name == orig.fmt_name
        np.testing.assert_array_equal(np.asarray(back.lo), np.asarray(orig.lo))
        np.testing.assert_array_equal(np.asarray(back.scale),
                                      np.asarray(orig.scale))


def test_fuse_rejects_mixed_formats():
    rng = np.random.default_rng(2)
    qa, _ = _qt(rng, 64, 64, GgmlType.Q4_0)
    qb, _ = _qt(rng, 64, 64, GgmlType.Q8_0)
    assert fuse_quant([qa, qb]) is None
    assert fuse_quant([qa]) is None  # nothing to fuse
    assert fuse_quant([qa, jnp.zeros((64, 64))]) is None  # dense member


@pytest.mark.parametrize("arch", ["llama", "gpt2", "falcon"])
def test_fused_model_matches_unfused(tmp_path, monkeypatch, arch):
    path = tmp_path / f"{arch}.bin"
    kw = {"n_embd": 512} if arch == "falcon" else {}  # MQA: r_k != r_q
    make_tiny_file(arch, path, element_type=GgmlType.Q4_0, **kw)

    def _load():
        return load(path, arch, params=ModelParameters(context_size=64))

    monkeypatch.setenv("LLM_TPU_FUSE", "1")
    fused_model = _load()
    # fusion defaults ON under coalescing (round 5) — force it off
    monkeypatch.setenv("LLM_TPU_FUSE", "0")
    split_model = _load()

    assert fused_model.params.layers.w_qkv is not None
    assert split_model.params.layers.w_qkv is None

    ids = jnp.asarray([3, 17, 5, 9], jnp.int32)
    lf, _, _ = forward_step(
        fused_model.spec, fused_model.params, ids, jnp.int32(0),
        init_cache(fused_model.spec, jnp.float32),
    )
    ls, _, _ = forward_step(
        split_model.spec, split_model.params, ids, jnp.int32(0),
        init_cache(split_model.spec, jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(lf), np.asarray(ls),
                               rtol=1e-5, atol=1e-5)
