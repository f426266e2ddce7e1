"""Attention-kernel-only A/B: int8 vs int4 paged pools at 7B/64-stream
geometry (no model load — fast iteration on the kernel itself)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from types import SimpleNamespace

from llm_tpu.ops.paged_attention import paged_attention_pass
from llm_tpu.ops.packing import pack_int4_rows

# L=8 (not 32): both pools + scales at L=32 total ~17 GB and wedge the
# shared chip; ratios are unaffected (per-layer kernel is identical)
L, NP, Hkv, PAGE, D, B, REP = 8, 65, 32, 256, 128, 64, 1
WP = 1


def main() -> None:
    rng = np.random.default_rng(0)
    spec = SimpleNamespace(kq_scale=1.0 / np.sqrt(D), head_dim=D)
    ck = rng.integers(-127, 128, (L, NP, Hkv, PAGE, D),
                      dtype=np.int64).astype(np.int8)
    cv = rng.integers(-127, 128, (L, NP, Hkv, PAGE, D),
                      dtype=np.int64).astype(np.int8)
    ks = jnp.asarray(rng.uniform(0.001, 0.02, (L, NP, Hkv, PAGE))
                     .astype(np.float32))
    vs = jnp.asarray(rng.uniform(0.001, 0.02, (L, NP, Hkv, PAGE))
                     .astype(np.float32))
    tables = jnp.asarray(
        np.tile(np.arange(1, 1 + B)[:, None], (1, 8)).astype(np.int32))
    n_past = jnp.full((B,), 200, jnp.int32)
    qf = jnp.asarray(rng.standard_normal((B, 1, Hkv, REP, D))
                     .astype(np.float32))

    pools = {
        "int8": (jnp.asarray(ck), jnp.asarray(cv)),
        "int4": (pack_int4_rows(jnp.asarray(np.clip(ck, -7, 7))),
                 pack_int4_rows(jnp.asarray(np.clip(cv, -7, 7)))),
    }

    @jax.jit
    def attn_all_layers(pool_k, pool_v, ks, vs, q):
        def body(c, l):
            m, l_, acc = paged_attention_pass(
                spec, pool_k, pool_v, ks, vs, tables, n_past, None, WP,
                l, q)
            return c + acc.sum(), None
        out, _ = jax.lax.scan(
            body, jnp.float32(0), jnp.arange(L, dtype=jnp.int32))
        return out

    def run(kv):
        pk, pv = pools[kv]
        float(attn_all_layers(pk, pv, ks, vs, qf))

    for kv in pools:
        t0 = time.perf_counter()
        run(kv)
        print(f"{kv}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)

    times = {kv: [] for kv in pools}
    for _ in range(9):
        for kv in pools:
            t0 = time.perf_counter()
            run(kv)
            times[kv].append(time.perf_counter() - t0)
    for kv, ts in times.items():
        med = float(np.median(ts))
        bytes_kv = L * B * WP * PAGE * Hkv * (D if kv == "int8" else D // 2) * 2
        bytes_sc = L * B * WP * PAGE * Hkv * 2 * 4
        print(f"{kv}: {med*1e3:.1f} ms  "
              f"({(bytes_kv + bytes_sc)/med/1e9:.0f} GB/s over "
              f"{(bytes_kv + bytes_sc)/1e9:.2f} GB)", flush=True)


if __name__ == "__main__":
    main()
