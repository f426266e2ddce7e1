"""Chip A/B: gpt2 117M q8_0 decode — quantized kernel vs dense-bf16 upcast.

Round-5 follow-up to the four recorded gpt2 falsifications (unroll, full
coalesce, head-only coalesce, own-shape denominator): the model is
launch-bound (~49 Pallas calls x ~11 us/step), so the untried lever is to
remove the Pallas calls entirely — dequantize the 132 MB of q8_0 packed
planes to bf16 ONCE at load and decode through XLA's dense matmuls
(683 GB/s marginal dense stream on this slice vs ~350 for the kernel).

Variants interleave in one process; medians of repeated 256-step blocks
(the block length amortizes the ~28 ms dispatch RTT).

Run: python scripts/probe_gpt2_dense.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from llm_tpu.models.forward import decode_loop, forward_step, init_cache
from llm_tpu.models.params import upcast_model_weights
from llm_tpu.models.spec import ModelSpec

E, H, L, F, V = 768, 12, 12, 3072, 50304
N_CTX = 1024
STEPS = 256
ROUNDS = 5


def build():
    spec = ModelSpec(
        arch="gpt2", n_vocab=V, n_embd=E, n_head=H, n_head_kv=H, n_layer=L,
        n_rot=0, n_ctx=N_CTX, norm="ln", norm_has_bias=True, rope_mode=-1,
        learned_pos=True, residual="sequential", ffn="gelu",
    )
    params = bench.synth_params(
        jax.random.PRNGKey(4), "q8_0", E, F, L, V, norm_bias=True,
        learned_pos_ctx=N_CTX,
    )
    return spec, params


def timed_block(spec, params, cache, n_past, window):
    ids = jnp.asarray([17], jnp.int32)
    logits, _, cache = forward_step(
        spec, params, ids, jnp.int32(n_past), cache, window
    )
    state = [logits[0], cache]
    toks, last, _, cache = decode_loop(
        spec, params, state[0], jnp.int32(n_past + 1), state[1], STEPS, window
    )
    np.asarray(toks)
    state[:] = [last, cache]  # the cache arg is DONATED: rebind every call

    def one():
        t0 = time.perf_counter()
        t, l, _, c = decode_loop(
            spec, params, state[0], jnp.int32(n_past + 1), state[1], STEPS,
            window,
        )
        np.asarray(t)
        dt = time.perf_counter() - t0
        state[:] = [l, c]
        return dt

    return one


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    spec, params = build()
    dense = upcast_model_weights(params)
    jax.block_until_ready(jax.tree_util.tree_leaves(dense))

    qbytes = bench.weight_stream_bytes(params)
    dbytes = bench.weight_stream_bytes(dense)
    print(f"packed bytes/step {qbytes/1e6:.1f} MB, dense {dbytes/1e6:.1f} MB")

    cache_q = init_cache(spec, jnp.bfloat16)
    cache_d = init_cache(spec, jnp.bfloat16)
    run_q = timed_block(spec, params, cache_q, 512, 1024)
    run_d = timed_block(spec, dense, cache_d, 512, 1024)

    tq, td = [], []
    for r in range(ROUNDS):
        tq.append(run_q())
        td.append(run_d())
        print(
            f"round {r}: quant {STEPS/tq[-1]:.0f} tok/s  "
            f"dense {STEPS/td[-1]:.0f} tok/s"
        )
    mq = float(np.median(tq)) / STEPS
    md = float(np.median(td)) / STEPS
    print(
        f"\nmedian: quant {1/mq:.1f} tok/s ({qbytes/mq/1e9:.0f} GB/s eff)  "
        f"dense {1/md:.1f} tok/s ({dbytes/md/1e9:.0f} GB/s eff)  "
        f"speedup {mq/md:.3f}x"
    )
    # numerics sanity: one greedy step, same argmax
    ids = jnp.asarray([17], jnp.int32)
    lq, _, _ = forward_step(
        spec, params, ids, jnp.int32(0), init_cache(spec, jnp.bfloat16), 1024
    )
    ld, _, _ = forward_step(
        spec, dense, ids, jnp.int32(0), init_cache(spec, jnp.bfloat16), 1024
    )
    aq, ad = int(jnp.argmax(lq[0])), int(jnp.argmax(ld[0]))
    print(f"argmax quant={aq} dense={ad} match={aq == ad}")


if __name__ == "__main__":
    main()
