"""Model-level A/B of the coalesced weight layout (LLM_TPU_COALESCE=1):
headline decode tok/s for LLaMA-7B Q4_0 (real checkpoint through the
loader) and GPT-2 117M Q8_0 (bench geometry), plane vs coalesced, in one
process.

Run: python -u scripts/probe_coalesce_model.py [--skip-7b]
"""

import argparse
import gc
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

import bench  # noqa: E402
from llm_tpu.models.forward import init_cache, window_bucket


def measure_7b(tag):
    from llm_tpu.loader import ModelParameters, load

    t0 = time.perf_counter()
    model = load(
        bench.CKPT, "llama", params=ModelParameters(context_size=bench.CTX)
    )
    load_s = time.perf_counter() - t0
    spec, params = model.spec, model.params
    cache = init_cache(spec, jnp.bfloat16)
    window = window_bucket(bench.N_PAST + 3 * bench.DECODE_STEPS, bench.CTX)
    dt, cache = bench.time_decode_loop(spec, params, cache, bench.N_PAST,
                                       window)
    sb = bench.weight_stream_bytes(params)
    print(f"7b {tag}: {1.0/dt:.1f} tok/s  step={dt*1e3:.1f}ms  "
          f"stream={sb/1e9:.2f}GB/step  eff_bw={sb/dt/1e9:.0f}GB/s  "
          f"load={load_s:.0f}s", flush=True)
    del cache, params, model
    gc.collect()
    return 1.0 / dt


def measure_gpt2(tag, coalesce, head_only=False):
    from llm_tpu.models.spec import ModelSpec

    E, H, L, F, V = 768, 12, 12, 3072, 50304
    spec = ModelSpec(
        arch="gpt2", n_vocab=V, n_embd=E, n_head=H, n_head_kv=H, n_layer=L,
        n_rot=0, n_ctx=1024, norm="ln", norm_has_bias=True, rope_mode=-1,
        learned_pos=True, residual="sequential", ffn="gelu",
    )
    params = bench.synth_params(
        jax.random.PRNGKey(4), "q8_0", E, F, L, V, norm_bias=True,
        learned_pos_ctx=1024,
    )
    if coalesce:
        import dataclasses

        from llm_tpu.ops.packing import QuantTensor
        from llm_tpu.ops.qmatmul import coalesce_auto

        def c(w):
            if isinstance(w, QuantTensor):
                cc = coalesce_auto(w, to_device=True)
                if cc is not None:
                    return cc
            return w

        lay = params.layers
        layer_fields = () if head_only else (
            "wq", "wk", "wv", "wo", "w_up", "w_down")
        params = dataclasses.replace(
            params,
            layers=dataclasses.replace(
                lay, **{f: c(getattr(lay, f)) for f in layer_fields},
            ) if layer_fields else lay,
            lm_head=c(params.lm_head if params.lm_head is not None
                      else params.wte),
        )
    cache = init_cache(spec, jnp.bfloat16)
    dt, cache = bench.time_decode_loop(spec, params, cache, 512, 1024,
                                       steps=256)
    sb = bench.weight_stream_bytes(params)
    print(f"gpt2 {tag}: {1.0/dt:.0f} tok/s  step={dt*1e3:.2f}ms  "
          f"stream={sb/1e6:.0f}MB/step  eff_bw={sb/dt/1e9:.0f}GB/s",
          flush=True)
    del cache, params
    gc.collect()
    return 1.0 / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-7b", action="store_true")
    ap.add_argument("--skip-gpt2", action="store_true")
    args = ap.parse_args()

    if not args.skip_gpt2:
        os.environ["LLM_TPU_COALESCE_MIN_K"] = "0"  # probe overrides gate
        g_plane = measure_gpt2("plane", False)
        g_head = measure_gpt2("coal-head", True, head_only=True)
        g_coal = measure_gpt2("coalesced", True)
        g_plane2 = measure_gpt2("plane(rpt)", False)
        os.environ.pop("LLM_TPU_COALESCE_MIN_K", None)
        base = max(g_plane, g_plane2)
        print(f"gpt2 ratio all-coal: {g_coal / base:.3f}  "
              f"head-only: {g_head / base:.3f}", flush=True)

    if not args.skip_7b:
        bench.ensure_checkpoint()
        # explicit values: the layout defaults ON since round 5, so a
        # popped env var is NOT the plane layout
        os.environ["LLM_TPU_COALESCE"] = "0"
        p = measure_7b("plane")
        os.environ["LLM_TPU_COALESCE"] = "1"
        c = measure_7b("coalesced")
        os.environ["LLM_TPU_COALESCE"] = "0"
        p2 = measure_7b("plane(rpt)")
        os.environ.pop("LLM_TPU_COALESCE", None)
        print(f"7b ratio: {c / max(p, p2):.3f}", flush=True)


if __name__ == "__main__":
    main()
