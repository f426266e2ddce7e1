"""Benchmark: LLaMA-7B Q4_0 single-chip decode throughput.

The BASELINE.md north-star metric: tokens/sec/chip for LLaMA-7B Q4_0 decode,
scored against the HBM roofline (decode is bandwidth-bound: every step must
stream the packed weights + the KV cache prefix from HBM).

The reference publishes no numbers (BASELINE.md), so `vs_baseline` reports
achieved/roofline on this chip — the fraction of speed-of-light.

Weights are synthesized directly as packed Q4_0 planes on device (no network
access for real checkpoints; identical compute/traffic to a real model).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from llm_tpu.models.forward import KVCache, forward_step
from llm_tpu.models.params import LayerParams, ModelParams
from llm_tpu.models.spec import ModelSpec
from llm_tpu.ops.packing import QuantTensor

# LLaMA-7B geometry
E, H, L, F, V = 4096, 32, 32, 11008, 32000
CTX = 2048
N_PAST = 1024
STEPS = 16


def probe_hbm_bw() -> float:
    """Measure achievable HBM read bandwidth on this chip with a reduce over
    a 2 GB array (self-calibrating roofline: the axon-tunneled chip delivers
    far less than book v5e bandwidth, and async timing lies, so measure with
    forced host sync and varied inputs)."""
    x = jax.random.normal(jax.random.PRNGKey(1), (1024, 1024, 1024), jnp.bfloat16)
    f = jax.jit(lambda x, s: jnp.sum(x.astype(jnp.float32)) * s)
    float(f(x, 1.0))  # compile+run
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        float(f(x, 1.0 + i))
        times.append(time.perf_counter() - t0)
    del x
    return x_bytes() / min(times)


def x_bytes() -> float:
    return 1024**3 * 2.0


def rand_q4(key, k, r, scale_dtype=jnp.bfloat16) -> QuantTensor:
    """Synthesize a packed Q4_0 tensor directly on device."""
    k1, k2 = jax.random.split(key)
    lo = jax.random.bits(k1, (k // 8, r), jnp.uint32)
    scale = (jax.random.uniform(k2, (k // 32, r), jnp.float32) * 0.02 + 0.001).astype(
        scale_dtype
    )
    return QuantTensor("q4_0", k, r, lo, None, scale, None)


def build_params(key) -> ModelParams:
    keys = jax.random.split(key, 16)

    def stack_q4(key, k, r):
        ks = jax.random.split(key, L)
        los, scales = [], []
        for i in range(L):
            qt = rand_q4(ks[i], k, r)
            los.append(qt.lo)
            scales.append(qt.scale)
        return QuantTensor(
            "q4_0", k, r, jnp.stack(los), None, jnp.stack(scales), None
        )

    ones = jnp.ones((L, E), jnp.float32)
    layers = LayerParams(
        ln1_w=ones, ln1_b=None, ln2_w=ones, ln2_b=None,
        wq=stack_q4(keys[0], E, E), bq=None,
        wk=stack_q4(keys[1], E, E), bk=None,
        wv=stack_q4(keys[2], E, E), bv=None,
        wo=stack_q4(keys[3], E, E), bo=None,
        w_gate=stack_q4(keys[4], E, F),
        w_up=stack_q4(keys[5], E, F), b_up=None,
        w_down=stack_q4(keys[6], F, E), b_down=None,
    )
    return ModelParams(
        wte=rand_q4(keys[7], E, V),
        wpe=None,
        emb_norm_w=None,
        emb_norm_b=None,
        final_norm_w=jnp.ones(E, jnp.float32),
        final_norm_b=None,
        lm_head=rand_q4(keys[8], E, V),
        lm_head_b=None,
        layers=layers,
    )


def weight_bytes(params: ModelParams) -> int:
    """Bytes streamed per decode step: all layer planes + final norm + head
    (the embedding table is gathered, one row — negligible)."""
    total = 0
    for qt in [params.layers.wq, params.layers.wk, params.layers.wv,
               params.layers.wo, params.layers.w_gate, params.layers.w_up,
               params.layers.w_down, params.lm_head]:
        total += qt.lo.nbytes + qt.scale.nbytes
    total += params.final_norm_w.nbytes + params.layers.ln1_w.nbytes
    total += params.layers.ln2_w.nbytes
    return total


def main() -> None:
    spec = ModelSpec(
        arch="llama", n_vocab=V, n_embd=E, n_head=H, n_head_kv=H,
        n_layer=L, n_rot=E // H, n_ctx=CTX, norm="rms", norm_has_bias=False,
        rope_mode=0, residual="sequential", ffn="swiglu",
    )
    key = jax.random.PRNGKey(0)
    params = build_params(key)
    cache = KVCache(
        k=jnp.zeros((L, CTX, H, E // H), jnp.bfloat16),
        v=jnp.zeros((L, CTX, H, E // H), jnp.bfloat16),
    )
    wbytes = weight_bytes(params)
    cache_bytes = cache.k.nbytes + cache.v.nbytes

    hbm_bw = probe_hbm_bw()

    ids = jnp.asarray([17], jnp.int32)

    # warmup / compile
    logits, _, cache = forward_step(spec, params, ids, jnp.int32(N_PAST), cache)
    float(logits[0, 0])

    # force a host sync per step: under the axon runtime async dispatch has
    # been observed to report readiness before the chain completes
    n_past = N_PAST + 1
    times = []
    for i in range(STEPS):
        t0 = time.perf_counter()
        logits, _, cache = forward_step(
            spec, params, ids, jnp.int32(n_past + i), cache
        )
        float(logits[0, 0])
        times.append(time.perf_counter() - t0)

    dt = float(np.median(times))
    tok_s = 1.0 / dt
    step_bytes = wbytes + cache_bytes
    roofline_tok_s = hbm_bw / step_bytes
    result = {
        "metric": "llama7b_q4_0_decode",
        "value": round(tok_s, 2),
        "unit": "tokens/s/chip",
        "vs_baseline": round(tok_s / roofline_tok_s, 4),
    }
    print(json.dumps(result))
    print(
        f"# step={dt*1e3:.1f}ms bytes/step={step_bytes/1e9:.2f}GB "
        f"probe_bw={hbm_bw/1e9:.0f}GB/s roofline={roofline_tok_s:.1f}tok/s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
