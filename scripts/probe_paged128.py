"""128-stream paged serving probe (VERDICT r4 item 5): does doubling the
stream count at the SAME tokens-in-flight (window bucketing: 128 streams x
128-token pages vs 64 x 256) double aggregate tok/s on a required-traffic-
bound step?

Configs (equal pool bytes, so they alternate within one process without
exceeding the ~8 GB compile-service budget — pools are rebuilt per round):
  s64_int8   B=64,  PAGE=256, int8  (the current bench row)
  s128_int8  B=128, PAGE=128, int8  (same KV read bytes, 2x rows)
  s64_int4   B=64,  PAGE=256, int4  (re-measure: was 19% slower r4)
  s128_int4  B=128, PAGE=128, int4

Run: python -u scripts/probe_paged128.py [--rounds N]
"""

import argparse
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax.numpy as jnp
import numpy as np

import bench  # noqa: E402

STEPS = 16


def run_cfg(model, B, PAGE, kv, reps=3):
    from llm_tpu.paged import (
        PageAllocator,
        init_paged_cache,
        paged_decode_loop,
    )

    spec = model.spec
    pages_per = spec.n_ctx // PAGE
    n_pages = 1 + B
    pool = init_paged_cache(spec, n_pages, PAGE, kv)
    tables = np.full((B, pages_per), PageAllocator.TRASH, np.int32)
    for b in range(B):
        tables[b, 0] = 1 + b
    n_past = jnp.full((B,), PAGE - 56, jnp.int32)
    tables_j = jnp.asarray(tables)
    last = jnp.zeros((B, spec.n_vocab), jnp.float32)

    toks, ll, _, pool = paged_decode_loop(
        spec, model.params, last, n_past, tables_j, pool, STEPS, 1
    )
    np.asarray(toks)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        toks, ll, _, pool = paged_decode_loop(
            spec, model.params, ll, n_past, tables_j, pool, STEPS, 1
        )
        np.asarray(toks)
        times.append(time.perf_counter() - t0)
    del pool
    return min(times) / STEPS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--configs", default="s64_int8,s128_int8,s64_int4,s128_int4")
    args = ap.parse_args()

    from llm_tpu.loader import ModelParameters, load

    bench.ensure_checkpoint()
    model = load(
        bench.CKPT, "llama", params=ModelParameters(context_size=bench.CTX)
    )

    cfgs = {
        "s64_int8": (64, 256, "int8"),
        "s128_int8": (128, 128, "int8"),
        "s256_int8": (256, 64, "int8"),  # next doubling, same pool bytes
        "s64_int4": (64, 256, "int4"),
        "s128_int4": (128, 128, "int4"),
    }
    cfgs = {k: v for k, v in cfgs.items() if k in args.configs.split(",")}
    results = {k: [] for k in cfgs}
    for rnd in range(args.rounds):
        for name, (B, PAGE, kv) in cfgs.items():
            try:
                dt = run_cfg(model, B, PAGE, kv)
            except Exception as e:  # noqa: BLE001
                print(f"{name}: FAILED {type(e).__name__} {str(e)[:120]}",
                      flush=True)
                continue
            results[name].append(dt)
            B_ = cfgs[name][0]
            print(f"round {rnd+1} {name}: {dt*1e3:.1f} ms/step, "
                  f"agg {B_/dt:.0f} tok/s", flush=True)

    print("\nmedians:")
    for name, (B, PAGE, kv) in cfgs.items():
        if results[name]:
            dt = statistics.median(results[name])
            print(f"  {name:10} {dt*1e3:6.1f} ms/step  "
                  f"agg {B/dt:7.0f} tok/s")


if __name__ == "__main__":
    main()
