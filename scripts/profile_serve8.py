"""Isolate where serve-8 decode time goes (on chip).

Sections:
  A. baseline decode_loop_batched (current bench config), dense int8 path
  B. same with LLM_TPU_ONLINE_DECODE=1 (set env BEFORE running for this)
  C. window=512 instead of 1024 (halve cache reads -> slope gives
     attention's cache-read efficiency)
  D. B=1 batched loop (isolates per-stream attention overhead vs weights)
"""
import gc
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import bench
from llm_tpu.models.forward import (
    decode_loop_batched, forward_batched_step, init_cache_batched,
)


def timed(fn, reps=3):
    fn()  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


bench.ensure_checkpoint()
model = bench.load_model()
spec, params = model.spec, model.params
N = 64

for tag, Bs, window in [("A_B8_w1024", 8, 1024), ("C_B8_w512", 8, 512),
                        ("D_B1_w1024", 1, 1024)]:
    cache = init_cache_batched(spec, Bs, "int8")
    ids = jnp.full((Bs, 1), 17, jnp.int32)
    n_past = jnp.full((Bs,), 400, jnp.int32)
    logits, _, cache = forward_batched_step(spec, params, ids, n_past, cache,
                                            window)
    ll = logits[:, 0, :]
    state = {}

    def run(ll=ll, n_past=n_past, cache=cache, Bs=Bs, window=window,
            state=state):
        toks, ll2, np2, c2 = decode_loop_batched(
            spec, params, ll, n_past, cache, N, window
        )
        np.asarray(toks)
        state["c"] = c2

    dt = timed(run) / N
    print(f"{tag}: {dt*1e3:.2f} ms/step  agg {Bs/dt:.1f} tok/s", flush=True)
    del cache, state
    gc.collect()
