"""Perplexity pipeline vs a direct torch computation with the reference's
exact windowing (chunk = context_size, BOS-substituted first token, scored
positions >= min(512, ctx/2); inference_session.rs:519-589)."""

import numpy as np
import pytest

from llm_tpu.loader import ModelParameters, load
from llm_tpu.session import (
    InferenceSession,
    InferenceSessionConfig,
    ModelKVMemoryType,
)


def test_perplexity_matches_torch_reference(tmp_path):
    torch = pytest.importorskip("torch")
    from hf_export import export_gpt2

    path = tmp_path / "gpt2.bin"
    hf_model = export_gpt2(path)
    ctx = 32
    m = load(path, "gpt2", params=ModelParameters(context_size=ctx))

    rng = np.random.default_rng(0)
    tokens = list(rng.integers(2, 90, size=3 * ctx + 7))

    session = InferenceSession(
        m,
        InferenceSessionConfig(
            memory_k_type=ModelKVMemoryType.Float32,
            memory_v_type=ModelKVMemoryType.Float32,
        ),
    )
    ours = []
    session.perplexity(tokens, lambda i, ppl: ours.append(ppl))
    assert len(ours) == 3

    # direct torch replication of the same windowed NLL
    nll, count = 0.0, 0
    ref = []
    with torch.no_grad():
        for i in range(3):
            chunk = list(tokens[i * ctx : (i + 1) * ctx])
            chunk[0] = 1  # BOS substitution (bot_token_id().unwrap_or(1))
            logits = hf_model(torch.tensor([chunk])).logits[0].float().numpy()
            for j in range(min(512, ctx // 2), ctx - 1):
                row = logits[j] - logits[j].max()
                p = np.exp(row)
                p /= p.sum()
                nll += -np.log(p[tokens[i * ctx + j + 1]])
                count += 1
            ref.append(float(np.exp(nll / count)))

    np.testing.assert_allclose(ours, ref, rtol=2e-3)
