"""Model-layer tests: chunk/cache consistency + HF transformers parity.

The HF parity tests are the numerical-correctness oracle (the analog of the
reference's `Tokens` llm-test case, binaries/llm-test/src/tokens.rs): a tiny
random HF model is exported to our GGML format by the converter recipes in
hf_export.py and logits must match `transformers`' torch forward.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from llm_tpu.ggml.types import GgmlType
from llm_tpu.loader import ModelParameters, load
from llm_tpu.models.forward import forward_step, init_cache
from llm_tpu.testing import make_tiny_file

ARCHS = ["llama", "gpt2", "gptj", "gptneox", "bloom", "mpt", "falcon"]

IDS = np.array([3, 17, 5, 9, 22, 1, 8, 40], dtype=np.int32)


def _run(model, ids, chunks=None):
    spec = model.spec
    cache = init_cache(spec, jnp.float32)
    if chunks is None:
        chunks = [len(ids)]
    out, pos = [], 0
    for c in chunks:
        seg = jnp.asarray(ids[pos : pos + c])
        logits, _, cache = forward_step(
            spec, model.params, seg, jnp.int32(pos), cache
        )
        out.append(np.asarray(logits))
        pos += c
    return np.concatenate(out)


@pytest.mark.parametrize("arch", ARCHS)
def test_chunk_consistency(arch, tmp_path):
    path = tmp_path / f"{arch}.bin"
    make_tiny_file(arch, path)
    m = load(path, arch, params=ModelParameters(context_size=64))
    full = _run(m, IDS)
    chunked = _run(m, IDS, chunks=[3, 4, 1])
    assert np.isfinite(full).all()
    np.testing.assert_allclose(full, chunked, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("et", [GgmlType.Q4_0, GgmlType.Q5_1, GgmlType.Q8_0])
def test_chunk_consistency_quantized(et, tmp_path):
    path = tmp_path / "llama_q.bin"
    make_tiny_file("llama", path, element_type=et)
    m = load(path, "llama", params=ModelParameters(context_size=64))
    full = _run(m, IDS)
    chunked = _run(m, IDS, chunks=[5, 3])
    np.testing.assert_allclose(full, chunked, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("arch", ARCHS)
def test_hf_parity(arch, tmp_path):
    torch = pytest.importorskip("torch")
    from hf_export import EXPORTERS

    path = tmp_path / f"{arch}_hf.bin"
    hf_model = EXPORTERS[arch](path)
    m = load(path, arch, params=ModelParameters(context_size=64))

    ids = IDS
    with torch.no_grad():
        ref = (
            hf_model(torch.tensor(ids[None].astype(np.int64)))
            .logits[0]
            .float()
            .numpy()
        )
    got = _run(m, ids, chunks=[5, 3])

    # identical math up to op-ordering and f32 rounding
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
    assert (np.argmax(got, -1) == np.argmax(ref, -1)).all()


def test_falcon40b_hf_parity(tmp_path):
    torch = pytest.importorskip("torch")
    from hf_export import export_falcon40

    path = tmp_path / "falcon40.bin"
    hf_model = export_falcon40(path, kv=2)
    m = load(path, "falcon", params=ModelParameters(context_size=64))
    assert m.spec.n_head_kv == 2
    assert m.spec.residual == "parallel_two_ln"
    ids = IDS
    with torch.no_grad():
        ref = (
            hf_model(torch.tensor(ids[None].astype(np.int64)))
            .logits[0]
            .float()
            .numpy()
        )
    got = _run(m, ids, chunks=[5, 3])
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_falcon40b_synthetic_chunk_consistency(tmp_path):
    from llm_tpu.testing import make_tiny_file as mk

    path = tmp_path / "falcon40_syn.bin"
    mk("falcon", path, n_head_kv=2)
    m = load(path, "falcon", params=ModelParameters(context_size=64))
    full = _run(m, IDS)
    chunked = _run(m, IDS, chunks=[3, 4, 1])
    np.testing.assert_allclose(full, chunked, rtol=1e-5, atol=1e-5)


def test_kquant_model_end_to_end(tmp_path):
    """A checkpoint whose 2-D tensors are Q4_K loads and decodes coherently
    (chunked == full), exercising the K-quant kernel path through the
    whole stack (QK_K=256 needs n_embd % 256 == 0)."""
    path = tmp_path / "llama_q4k.bin"
    make_tiny_file("llama", path, element_type=GgmlType.Q4_K, n_embd=256)
    m = load(path, "llama", params=ModelParameters(context_size=64))
    assert m.spec.n_embd == 256
    full = _run(m, IDS)
    chunked = _run(m, IDS, chunks=[5, 3])
    assert np.isfinite(full).all()
    np.testing.assert_allclose(full, chunked, rtol=1e-4, atol=1e-4)


def test_gptneox_sequential_residual_hf_parity(tmp_path):
    torch = pytest.importorskip("torch")
    from hf_export import export_gptneox

    path = tmp_path / "neox_seq.bin"
    hf_model = export_gptneox(path, parallel=False)
    m = load(path, "gptneox", params=ModelParameters(context_size=64))
    assert m.spec.residual == "sequential"
    ids = IDS
    with torch.no_grad():
        ref = (
            hf_model(torch.tensor(ids[None].astype(np.int64)))
            .logits[0]
            .float()
            .numpy()
        )
    got = _run(m, ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
