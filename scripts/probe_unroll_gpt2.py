"""A/B the layer-scan unroll on GPT-2 decode (the scan-overhead-bound
staged config). Interleaved in one process; the two variants use
different n_steps (256 vs 248) so both stay resident in the jit cache
(LLM_TPU_UNROLL_LAYERS is read at trace time — forcing a distinct static
arg per variant gets each its own trace)."""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from llm_tpu.models.forward import decode_loop, init_cache
from llm_tpu.models.spec import ModelSpec


def main() -> None:
    from bench import synth_params

    E, H, L, F, V = 768, 12, 12, 3072, 50304
    spec = ModelSpec(
        arch="gpt2", n_vocab=V, n_embd=E, n_head=H, n_head_kv=H, n_layer=L,
        n_rot=0, n_ctx=1024, norm="ln", norm_has_bias=True, rope_mode=-1,
        learned_pos=True, residual="sequential", ffn="gelu",
    )
    params = synth_params(
        jax.random.PRNGKey(4), "q8_0", E, F, L, V, norm_bias=True,
        learned_pos_ctx=1024,
    )
    from llm_tpu.models.forward import forward_step

    variants = {"scan": ("1", 256), "unroll": ("0", 248)}
    caches, lastls = {}, {}
    for k in variants:
        cache = init_cache(spec, jnp.bfloat16)
        logits, _, cache = forward_step(
            spec, params, jnp.asarray([17], jnp.int32), jnp.int32(512),
            cache, 1024,
        )
        caches[k], lastls[k] = cache, logits[0]

    def run(name):
        env, steps = variants[name]
        os.environ["LLM_TPU_UNROLL_LAYERS"] = env
        try:
            toks, ll, _, caches[name] = decode_loop(
                spec, params, lastls[name], jnp.int32(513), caches[name],
                steps, 1024,
            )
            lastls[name] = ll
            np.asarray(toks)
        finally:
            os.environ.pop("LLM_TPU_UNROLL_LAYERS", None)
        return steps

    for name in variants:
        t0 = time.perf_counter()
        run(name)
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)

    times = {k: [] for k in variants}
    for _ in range(7):
        for name in variants:
            t0 = time.perf_counter()
            steps = run(name)
            times[name].append((time.perf_counter() - t0) / steps)
    for name, ts in times.items():
        med = float(np.median(ts))
        print(f"{name}: {med*1e3:.3f} ms/step, {1.0/med:.0f} tok/s",
              flush=True)


if __name__ == "__main__":
    main()
