"""A/B the int4 vs int8 paged pool on chip at the bench's 64-stream shape.

Interleaves variants in ONE process (the shared slice drifts 2-4x between
minutes — memory/axon-chip-behavior) and reports per-variant medians of the
full paged_decode_loop block plus the attention-only pass.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from llm_tpu.paged import PageAllocator, init_paged_cache, paged_decode_loop


def main() -> None:
    bench.ensure_checkpoint()
    from llm_tpu.loader import ModelParameters, load

    model = load(bench.CKPT, "llama",
                 params=ModelParameters(context_size=2048))
    spec, params = model.spec, model.params

    B, PAGE, PAST, STEPS = 64, 256, 200, 16
    pages_per = spec.n_ctx // PAGE
    n_pages = 1 + B
    tables = np.full((B, pages_per), PageAllocator.TRASH, np.int32)
    for b in range(B):
        tables[b, 0] = 1 + b
    tables_j = jnp.asarray(tables)
    n_past = jnp.full((B,), PAST, jnp.int32)
    last = jnp.zeros((B, spec.n_vocab), jnp.float32)

    state = {}
    for kv in ("int8", "int4"):
        state[kv] = {"ll": last,
                     "pool": init_paged_cache(spec, n_pages, PAGE, kv)}

    def run(kv):
        s = state[kv]
        toks, ll, _, p2 = paged_decode_loop(
            spec, params, s["ll"], n_past, tables_j, s["pool"], STEPS, 1,
        )
        s["ll"], s["pool"] = ll, p2
        np.asarray(toks)

    # compile both first
    for kv in state:
        t0 = time.perf_counter()
        run(kv)
        print(f"{kv}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)

    times = {kv: [] for kv in state}
    for rep in range(7):
        for kv in state:
            t0 = time.perf_counter()
            run(kv)
            times[kv].append(time.perf_counter() - t0)

    for kv, ts in times.items():
        med = float(np.median(ts))
        print(f"{kv}: {med*1e3:.1f} ms/block, {med/STEPS*1e3:.2f} ms/step, "
              f"agg {B*STEPS/med:.0f} tok/s", flush=True)


if __name__ == "__main__":
    main()
