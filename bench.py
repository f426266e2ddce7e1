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

from llm_tpu.models.forward import (
    KVCache,
    decode_loop,
    forward_step,
    window_bucket,
)
from llm_tpu.models.params import LayerParams, ModelParams
from llm_tpu.models.spec import ModelSpec
from llm_tpu.ops.packing import QuantTensor

# LLaMA-7B geometry
E, H, L, F, V = 4096, 32, 32, 11008, 32000
CTX = 2048
N_PAST = 1024
STEPS = 16


def probe_hbm_bw() -> float:
    """Achievable weight-streaming bandwidth: a CHAIN of dependent dense
    bf16 mat-vecs (the decode access pattern), one host sync at the end.

    Only chained-dependency measurements are trustworthy here: standalone
    block_until_ready timings under the axon runtime report readiness
    early, and a VPU reduce understates what the MXU datapath streams.
    """
    n = 16384
    w = jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.bfloat16)
    reps = 8

    @jax.jit
    def chain(x, w):
        def body(h, _):
            h = jnp.dot(h, w, preferred_element_type=jnp.float32)
            h = h / (jnp.max(jnp.abs(h)) + 1.0)  # keep finite, keep dependency
            return h.astype(jnp.bfloat16), None
        h, _ = jax.lax.scan(body, x, None, length=reps)
        return h

    x = jnp.ones((8, n), jnp.bfloat16)
    float(chain(x, w)[0, 0])  # compile + run
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(x, w)[0, 0])
        times.append(time.perf_counter() - t0)
    del w
    return reps * (n * n * 2.0) / min(times)


def rand_q4(key, k, r) -> QuantTensor:
    """Synthesize a packed Q4_0 tensor directly on device, with the packed
    two-f16-per-uint32 scale plane the loader produces."""
    k1, k2 = jax.random.split(key)
    lo = jax.random.bits(k1, (k // 8, r), jnp.uint32)
    s = jax.random.uniform(k2, (k // 32, r), jnp.float32) * 0.02 + 0.001
    # f32 -> f16 bit patterns (values are normal-range positives) -> pairs
    sbits = (jax.lax.bitcast_convert_type(s, jnp.int32) >> 13) - (112 << 10)
    sbits = jnp.clip(sbits, 1, 0x7BFF).astype(jnp.uint32)
    packed = sbits[0::2] | (sbits[1::2] << 16)
    return QuantTensor("q4_0", k, r, lo, None, packed, None)


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
        # K padded to the packed-scale tile granule (512); qmatmul zero-pads x
        w_down=stack_q4(keys[6], ((F + 511) // 512) * 512, E), b_down=None,
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


def serve_bench() -> None:
    """Aggregate serving throughput: B=8 streams, int8 KV, multi-step
    on-device decode (the max-throughput single-chip configuration; int8 KV
    is what lets 8 x ctx-2048 streams fit beside the weights in 16 GB)."""
    from llm_tpu.models.forward import (
        decode_loop_batched,
        forward_batched_step,
        init_cache_batched,
    )

    spec = ModelSpec(
        arch="llama", n_vocab=V, n_embd=E, n_head=H, n_head_kv=H,
        n_layer=L, n_rot=E // H, n_ctx=CTX, norm="rms", norm_has_bias=False,
        rope_mode=0, residual="sequential", ffn="swiglu",
    )
    params = build_params(jax.random.PRNGKey(0))
    Bs, N = 8, 16
    cache = init_cache_batched(spec, Bs, "int8")
    ids = jnp.full((Bs, 1), 17, jnp.int32)
    n_past = jnp.full((Bs,), 512, jnp.int32)
    window = 1024
    logits, _, cache = forward_batched_step(
        spec, params, ids, n_past, cache, window
    )
    ll = logits[:, 0, :]
    toks, ll, n_past, cache = decode_loop_batched(
        spec, params, ll, n_past + 1, cache, N, window
    )
    np.asarray(toks)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        toks, ll, n_past, cache = decode_loop_batched(
            spec, params, ll, n_past, cache, N, window
        )
        np.asarray(toks)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    print(
        json.dumps(
            {
                "metric": "llama7b_q4_0_serve_8streams_int8kv",
                "value": round(Bs * N / dt, 2),
                "unit": "tokens/s/chip",
                "vs_baseline": round((Bs * N / dt) / 34.8, 4),
            }
        )
    )


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
    window = window_bucket(N_PAST + 3 * STEPS, CTX)

    # evaluate one token to populate last_logits, then run the on-device
    # multi-token decode loop (the serving decode mode: sampling on device,
    # one host dispatch per STEPS tokens)
    logits, _, cache = forward_step(
        spec, params, ids, jnp.int32(N_PAST), cache, window
    )
    last_logits = logits[0]
    n_past = N_PAST + 1

    toks, last_logits, n_past, cache = decode_loop(
        spec, params, last_logits, jnp.int32(n_past), cache, STEPS, window
    )
    np.asarray(toks)  # sync (compile + first run)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        toks, last_logits, n_past, cache = decode_loop(
            spec, params, last_logits, n_past, cache, STEPS, window
        )
        np.asarray(toks)  # host sync
        times.append(time.perf_counter() - t0)

    dt = float(np.median(times)) / STEPS
    tok_s = 1.0 / dt
    # attention reads only `window` of the cache ring per step
    step_bytes = wbytes + int(cache_bytes * window / CTX)
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


def _run_with_retry(fn, attempts: int = 3) -> None:
    """The axon remote-compile service fails transiently (HTTP 500
    tpu_compile_helper); retry before giving up."""
    for i in range(attempts):
        try:
            fn()
            return
        except Exception as e:  # noqa: BLE001
            if i == attempts - 1:
                raise
            print(f"# bench attempt {i + 1} failed ({e}); retrying",
                  file=sys.stderr)
            time.sleep(20)


if __name__ == "__main__":
    if "--serve" in sys.argv:
        _run_with_retry(serve_bench)
    else:
        _run_with_retry(main)
