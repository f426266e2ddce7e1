"""Dense-upcast path (LLM_TPU_DENSE_UPCAST): hold a quantized model's
weights as dense arrays on chip. Off by default (the round-5 chip A/B in
docs/probes/round5/gpt2_dense_upcast.log measured it neutral on this
hardware) but must stay exact: with f32 upcast it shares dequant_jnp with
the XLA-fallback matmul path, so logits must match to float tolerance."""

import jax.numpy as jnp
import numpy as np
import pytest

from llm_tpu.ggml.types import GgmlType
from llm_tpu.loader import ModelParameters, load
from llm_tpu.models.forward import forward_step, init_cache
from llm_tpu.models.params import (
    maybe_upcast_dense,
    upcast_model_weights,
)
from llm_tpu.ops.packing import QuantTensor, dequant_jnp
from llm_tpu.testing import make_tiny_file


def _tiny(tmp_path, arch, **kw):
    path = tmp_path / f"{arch}.bin"
    make_tiny_file(arch, path, element_type=GgmlType.Q4_0, **kw)
    return load(path, arch, params=ModelParameters(context_size=64))


@pytest.mark.parametrize("arch", ["llama", "gpt2"])
def test_upcast_forward_matches_quant(tmp_path, arch):
    model = _tiny(tmp_path, arch)
    dense = upcast_model_weights(model.params, jnp.float32)

    for f in ("wq", "wk", "wv", "wo", "w_up", "w_down"):
        w = getattr(dense.layers, f)
        if w is not None:
            assert isinstance(w, jnp.ndarray), f
    assert dense.layers.w_qkv is None  # unfused before upcast

    ids = jnp.asarray([3, 17, 5, 9], jnp.int32)
    lq, _, _ = forward_step(
        model.spec, model.params, ids, jnp.int32(0),
        init_cache(model.spec, jnp.float32),
    )
    ld, _, _ = forward_step(
        model.spec, dense, ids, jnp.int32(0),
        init_cache(model.spec, jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(lq), np.asarray(ld),
                               rtol=1e-5, atol=1e-5)


def test_upcast_matches_dequant_oracle(tmp_path, monkeypatch):
    monkeypatch.setenv("LLM_TPU_FUSE", "0")  # keep split planes to compare
    model = _tiny(tmp_path, "llama")
    dense = upcast_model_weights(model.params, jnp.float32)
    qt = model.params.layers.wq
    assert isinstance(qt, QuantTensor) and qt.scale.ndim == 3  # stacked
    for i in range(qt.scale.shape[0]):
        sl = QuantTensor(
            qt.fmt_name, qt.k, qt.r, qt.lo[i],
            qt.hi[i] if qt.hi is not None else None,
            qt.scale[i], qt.bias[i] if qt.bias is not None else None,
        )
        np.testing.assert_array_equal(
            np.asarray(dense.layers.wq[i]), np.asarray(dequant_jnp(sl))
        )


def test_upcast_handles_fused_weights(tmp_path, monkeypatch):
    monkeypatch.setenv("LLM_TPU_FUSE", "1")
    fused = _tiny(tmp_path, "llama")
    assert fused.params.layers.w_qkv is not None
    monkeypatch.setenv("LLM_TPU_FUSE", "0")
    split = _tiny(tmp_path, "llama")

    dense = upcast_model_weights(fused.params, jnp.float32)
    ids = jnp.asarray([1, 2, 8], jnp.int32)
    ld, _, _ = forward_step(
        fused.spec, dense, ids, jnp.int32(0), init_cache(fused.spec, jnp.float32)
    )
    ls, _, _ = forward_step(
        split.spec, split.params, ids, jnp.int32(0),
        init_cache(split.spec, jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(ld), np.asarray(ls),
                               rtol=1e-5, atol=1e-5)


def test_gate_default_off_and_auto(tmp_path, monkeypatch):
    monkeypatch.setenv("LLM_TPU_FUSE", "0")
    model = _tiny(tmp_path, "llama")
    assert isinstance(model.params.layers.wq, QuantTensor)  # default: off
    same = maybe_upcast_dense(model.params)
    assert same.layers.wq is model.params.layers.wq

    monkeypatch.setenv("LLM_TPU_DENSE_UPCAST", "auto")
    up = maybe_upcast_dense(model.params)  # tiny model: under the MB gate
    assert isinstance(up.layers.wq, jnp.ndarray)
    assert up.layers.wq.dtype == jnp.bfloat16

    monkeypatch.setenv("LLM_TPU_DENSE_UPCAST_MAX_MB", "0")
    kept = maybe_upcast_dense(model.params)
    assert isinstance(kept.layers.wq, QuantTensor)
