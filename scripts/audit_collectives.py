"""Emit the bytes-per-step-per-axis collective table for the multi-host
decode paths (the zero-DCN evidence behind docs/architecture.md's 2-host
scaling bound; asserted in tests/test_multihost.py).

Runs on a virtual 8-device CPU mesh (data=2, model=4) with a tiny llama:
lowers the single-step dispatch and the step_multi block, audits the
compiled HLO, and prints per-op axis/bytes tables.

Run: python scripts/audit_collectives.py
"""

import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from llm_tpu.loader import ModelParameters, load
from llm_tpu.models.forward import _decode_loop_batched_jit, window_bucket
from llm_tpu.ops.sampling import (
    DeviceSampler,
    batched_sampler,
    ensure_value_keys,
)
from llm_tpu.parallel.collectives_audit import audit_compiled
from llm_tpu.parallel.multihost import MultiHostEngine
from llm_tpu.parallel.sharding import MeshConfig, make_mesh
from llm_tpu.testing import make_tiny_file


def main():
    path = os.path.join(tempfile.mkdtemp(), "llama.bin")
    make_tiny_file("llama", path)
    model = load(path, "llama", params=ModelParameters(context_size=64))
    mesh = make_mesh(MeshConfig(data=2, model=4))
    engine = MultiHostEngine(model, mesh, global_streams=4,
                             kv_dtype=jnp.float32, n_batch=4)
    B = engine.max_streams

    ids = np.zeros((B, 1), np.int32)
    n_past = np.arange(B, dtype=np.int32)
    mask = np.ones(B, bool)
    g_np, g_mask = engine._replicated_rows(n_past, mask)
    res = audit_compiled(
        engine._step_jit.lower(
            engine.spec, engine.params,
            engine._to_global(ids, ("data",)), g_np, engine.cache, 64,
            g_mask,
        ).compile(),
        mesh,
    )
    print("== single decode step (forward_batched dispatch) ==")
    print(res.table())

    cfg, values = batched_sampler([DeviceSampler.greedy()] * B, B)
    values = ensure_value_keys(values, cfg, B)
    logits = np.zeros((B, engine.spec.n_vocab), np.float32)
    n_steps = 8
    res2 = audit_compiled(
        _decode_loop_batched_jit.lower(
            engine.spec, engine.params,
            engine._to_global(logits, ("data",)), g_np, engine.cache,
            n_steps, window_bucket(B + n_steps, engine.spec.n_ctx), cfg,
            jax.random.PRNGKey(0),
            engine._to_global(
                {k: np.asarray(v) for k, v in values.items()}, ("data",)
            ),
            g_mask, None, None, False, mesh, engine._h_ax,
        ).compile(),
        mesh,
    )
    print(f"\n== step_multi block ({n_steps} tokens, one dispatch) ==")
    print(res2.table())

    dcn = (res.bytes_by_axis.get("data", 0)
           + res.bytes_by_axis.get("mixed", 0)
           + res2.bytes_by_axis.get("data", 0)
           + res2.bytes_by_axis.get("mixed", 0))
    print(f"\nDCN-crossing collective bytes across both paths: {dcn}")
    return 0 if dcn == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
