"""Break down the paged-serve-64 decode step on chip.

BENCH_MATRIX has llama7b_q4_0_paged_serve_64streams_int8 at ~28.9 ms per
64-stream step vs serve-8's 17.9 ms. Expected extra traffic is ~2.2 GB of
int8 page reads (+~4.4 ms at the attention kernel's measured ~500 GB/s);
the rest is unexplained. This probe times the pieces:

  1. the full paged_decode_loop block (the bench's shape), at several
     block lengths (RTT amortization)
  2. the paged-attention kernel alone over all layers (no weights)
  3. the weight-stream path alone (block_kv disabled? -> approximated by
     the qstream probe shape at M=64)
  4. greedy sampling alone over [64, V]

Run AFTER bench's checkpoint exists.
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


def timeit(fn, reps=3):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main() -> None:
    bench.ensure_checkpoint()
    # load directly (NOT via bench.load_model: that wrapper emits a bench
    # metric as a side effect and swallows load errors — advisor r3)
    from llm_tpu.loader import ModelParameters, load

    model = load(bench.CKPT, "llama",
                 params=ModelParameters(context_size=2048))
    spec, params = model.spec, model.params

    B, PAGE, PAST = 64, 256, 200
    pages_per = spec.n_ctx // PAGE
    n_pages = 1 + B
    pool = init_paged_cache(spec, n_pages, PAGE, "int8")
    tables = np.full((B, pages_per), PageAllocator.TRASH, np.int32)
    nxt = iter(range(1, n_pages))
    for b in range(B):
        tables[b, 0] = next(nxt)
    n_past = jnp.full((B,), PAST, jnp.int32)
    tables_j = jnp.asarray(tables)
    last = jnp.zeros((B, spec.n_vocab), jnp.float32)
    wp = 1

    # 1. full blocks at several lengths
    for steps in (16, 48):
        state = {"ll": last, "pool": pool}

        def run():
            toks, ll, _, p2 = paged_decode_loop(
                spec, params, state["ll"], n_past, tables_j, state["pool"],
                steps, wp,
            )
            state["ll"], state["pool"] = ll, p2
            np.asarray(toks)

        dt = timeit(run)
        pool = state["pool"]
        print(f"block steps={steps}: {dt*1e3:.1f}ms total, "
              f"{dt/steps*1e3:.2f}ms/step, agg {B*steps/dt:.0f} tok/s",
              flush=True)

    # 2. attention kernel alone, all layers (scan), no weights
    from llm_tpu.ops.paged_attention import paged_attention_pass

    q = jnp.ones((B, 1, spec.n_head_kv,
                  spec.n_head // spec.n_head_kv, spec.head_dim), jnp.float32)

    @jax.jit
    def attn_all_layers(pool_k, pool_v, ks, vs, q):
        def body(c, l):
            m, l_, acc = paged_attention_pass(
                spec, pool_k, pool_v, ks, vs, tables_j, n_past, None, wp,
                l, q,
            )
            return c + acc.sum(), None
        out, _ = jax.lax.scan(
            body, jnp.float32(0), jnp.arange(spec.n_layer, dtype=jnp.int32))
        return out

    def run_attn():
        float(attn_all_layers(pool.k, pool.v, pool.k_scale, pool.v_scale, q))

    dt = timeit(run_attn)
    kv_bytes = spec.n_layer * B * PAGE * spec.n_head_kv * spec.head_dim * 2
    sc_bytes = spec.n_layer * B * PAGE * spec.n_head_kv * 2 * 4
    print(f"paged attention x{spec.n_layer} layers: {dt*1e3:.1f}ms "
          f"({(kv_bytes + sc_bytes)/dt/1e9:.0f} GB/s over "
          f"{(kv_bytes + sc_bytes)/1e9:.2f} GB)", flush=True)

    # 3. weight path alone: M=64 qstream chain (same probe as bench, M=64)
    import bench as _b
    qbw8 = _b.probe_qstream_bw(params)
    print(f"qstream M=8 probe: {qbw8/1e9:.0f} GB/s", flush=True)

    # M=64 variant
    from llm_tpu.models.params import unfuse_layer_weights
    from llm_tpu.ops.qmatmul import qmatmul

    split = unfuse_layer_weights(params.layers)
    gate, up, down = split.w_gate, split.w_up, split.w_down
    L, E = gate.lo.shape[0], gate.k
    reps = 12

    @jax.jit
    def chain64(x, gate, up, down):
        def body(h, i):
            l = i % L
            y1 = qmatmul(h, gate, layer=l)
            y2 = qmatmul(h, up, layer=l)
            y3 = qmatmul(y1 + y2, down, layer=l)
            h = h + y3[:, :E] * 1e-6
            h = h / (jnp.max(jnp.abs(h)) + 1.0)
            return h, None
        h, _ = jax.lax.scan(body, x, jnp.arange(L * reps, dtype=jnp.int32))
        return h

    x64 = jnp.ones((64, E), jnp.float32)
    def run64():
        float(chain64(x64, gate, up, down)[0, 0])
    dt = timeit(run64)
    nbytes = sum(
        q.lo.nbytes + q.scale.nbytes
        + (q.hi.nbytes if q.hi is not None else 0)
        + (q.bias.nbytes if q.bias is not None else 0)
        for q in (gate, up, down)
    )
    print(f"qstream M=64: {reps*nbytes/dt/1e9:.0f} GB/s", flush=True)

    # 4. greedy sampling over [64, V]
    from llm_tpu.ops.sampling import DeviceSampler, device_sample

    key = jax.random.PRNGKey(0)
    samp = DeviceSampler.greedy()

    @jax.jit
    def sample_block(logits, key):
        def body(c, i):
            k, acc = c
            k, sub = jax.random.split(k)
            t = device_sample(logits + acc[None, None] * 0, sub, samp, None,
                              None)
            return (k, acc + t.sum()), None
        (k, acc), _ = jax.lax.scan(
            body, (key, jnp.int32(0)), jnp.arange(64))
        return acc

    def run_s():
        int(sample_block(last, key))
    dt = timeit(run_s)
    print(f"greedy sample x64 steps over [64, V]: {dt*1e3:.1f}ms "
          f"({dt/64*1e3:.2f}ms/step)", flush=True)


if __name__ == "__main__":
    main()
