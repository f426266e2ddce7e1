"""Benchmark matrix: the BASELINE.md staged configs on one chip.

Headline (printed LAST as the driver-parsed JSON line): LLaMA-7B Q4_0
single-stream decode tokens/s/chip, scored against a MEASURED roofline —
the denominator is the packed-plane streaming rate the fused dequant-
matmul kernel itself achieves standalone at bench shapes (the round-1
VERDICT's prescription), measured with the ~28 ms dispatch RTT properly
amortized (>=0.5 s per timed dispatch: short dispatches understate every
rate — the chip's dense streaming is ~360 GB/s, not the ~130 GB/s that
RTT-polluted probes report). The dense bf16 chain rate is printed for
transparency: kernel_rate/dense_rate is the dequant kernel's own
efficiency, decode/kernel-roofline (`vs_baseline`) is how well the model
pipeline keeps the kernel fed.

The LLaMA-7B weights come from a REAL full-geometry checkpoint file
(~3.8 GB Q4_0 GGJT, synthesized once into /tmp) through the production
loader — container parse, 32000-entry vocab, native C++ transcode, and
host->HBM upload are all exercised and timed (loader.rs:419-567 analog).

Every metric is printed as its own JSON line as soon as it is computed
(so a partial run still reports what finished), the full matrix is
written to BENCH_MATRIX.json, and the headline line is re-printed last.

Metrics:
  smoke                      variants_ok: every QFormat x kernel variant
                             (flat/stacked/coalesced) + dense-attention D=64/80/128
                             really LOWERED on this chip before timing
                             (vs_baseline 1.0 = full sweep, 0.0 = stopped
                             at LLM_TPU_SMOKE_BUDGET); a lowering failure
                             aborts the bench naming the variant
  llama7b_q4_0_load          seconds, full loader path at 7B scale
  llama7b_q4_0_load_packed   seconds, repeat load via the plane cache
                             (cli pack; vs_baseline = fraction of cold)
  llama7b_q4_0_decode        tokens/s/chip vs measured roofline  [headline]
  llama7b_q4_0_prefill_512   prompt tokens/s at chunk 512
  llama7b_q4_0_prefill_8kctx_512   prefill at n_past 7168 of an 8K window
                                   (flash-style online-softmax attention)
  llama7b_q4_0_ttft_64tok    p50 ms to first token (64-token prompt)
  llama7b_q4_0_serve_8streams_int8kv   aggregate tokens/s, B=8, int8 KV
  llama7b_q4_0_prefix_cache_warm_ttft_512tok   ms to first token for a
                             REPEATED 512-token prompt (prompt-prefix page
                             cache; vs_baseline = fraction of uncached)
  llama7b_q4_0_paged_serve_64streams_int8   64 streams over a paged int8
                                            pool sized to tokens in flight
  llama7b_q4_0_paged_serve_128streams_int8  128 streams, window-bucketed
                                            (128-token pages: same tokens
                                            in flight, 2x rows)
  mpt7b_q4_k_8k_paged_int8_decode      staged config #4: ALiBi + Q4_K +
                                       8K context + int8 paged KV (Pallas
                                       paged-attention kernel)
  stablelm3b_q5_1_decode     staged config #3 geometry
  gpt2_117m_q8_0_decode      staged config #1 geometry
  llama13b_q4_0_decode       staged config #5's model on ONE chip (~7.3 GB
                             through the loader; its 2-host tensor-sharded
                             serving is validated by the 2-process
                             multihost test + the driver dryrun — no
                             multi-chip hardware here). Fits since round 4:
                             host-side layer stacking capped the load's
                             device transient at ~1x params (see
                             llama13b_bench docstring for the HBM budget).
"""

import gc
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from llm_tpu.models.forward import (
    KVCache,
    decode_loop,
    decode_loop_batched,
    forward_batched_step,
    forward_step,
    init_cache,
    init_cache_batched,
    window_bucket,
)
from llm_tpu.models.params import LayerParams, ModelParams
from llm_tpu.models.spec import ModelSpec
from llm_tpu.ops.packing import QuantTensor

CKPT = "/tmp/llm_tpu_bench/llama7b_q4_0.bin"
CTX = 2048
N_PAST = 1024
STEPS = 16  # paged-pool sections: block must stay within the mapped pages
DECODE_STEPS = 64  # bulk-decode blocks: amortizes the ~28 ms dispatch RTT

_MATRIX: list[dict] = []


def emit(metric: str, value: float, unit: str, vs_baseline: float) -> dict:
    rec = {
        "metric": metric,
        "value": round(float(value), 3),
        "unit": unit,
        "vs_baseline": round(float(vs_baseline), 4),
    }
    _MATRIX.append(rec)
    print(json.dumps(rec), flush=True)
    # MERGE by metric name: a partial or single-section run must never
    # clobber previously recorded metrics
    try:
        existing = {r["metric"]: r for r in json.load(open("BENCH_MATRIX.json"))}
    except Exception:  # noqa: BLE001
        existing = {}
    existing.update({r["metric"]: r for r in _MATRIX})
    with open("BENCH_MATRIX.json", "w") as f:
        json.dump(list(existing.values()), f, indent=1)
    return rec


def note(msg: str) -> None:
    print(f"# {msg}", file=sys.stderr, flush=True)


def _section(name):
    """Run a section, isolating failures so later metrics still report."""

    def deco(fn):
        def wrapped(*a, **kw):
            t0 = time.time()
            try:
                out = fn(*a, **kw)
                note(f"{name}: {time.time() - t0:.0f}s")
                return out
            except Exception as e:  # noqa: BLE001
                note(f"{name} FAILED: {type(e).__name__}: {e}")
                return None

        return wrapped

    return deco


# ---------------------------------------------------------------------------
# smoke gate (VERDICT r3 item 8): one real Mosaic lowering + numeric check
# per quant format and kernel variant BEFORE any timing — a lowering
# regression aborts the bench NAMING the variant instead of surfacing as a
# cryptic mid-bench failure (interpret-mode CI proves semantics, not
# lowering). Skippable with LLM_TPU_BENCH_SMOKE=0; `bench.py --smoke` runs
# only this gate.


def run_smoke() -> int:
    prev_mode = os.environ.get("LLM_TPU_KERNELS")
    # force the kernel path (the whole point is real Mosaic lowering);
    # on CPU (logic tests) interpret mode stands in
    os.environ["LLM_TPU_KERNELS"] = (
        "interpret" if jax.default_backend() == "cpu" else "pallas"
    )
    try:
        return _run_smoke_inner()
    finally:
        if prev_mode is None:
            os.environ.pop("LLM_TPU_KERNELS", None)
        else:
            os.environ["LLM_TPU_KERNELS"] = prev_mode


def _run_smoke_inner() -> int:
    from types import SimpleNamespace

    from llm_tpu.ggml.quant import quantize
    from llm_tpu.ops import dense_attention as da
    from llm_tpu.ops.packing import FORMATS, dequant_jnp, pack_ggml
    from llm_tpu.ops.qmatmul import qmatmul

    rng = np.random.default_rng(0)
    K = R = 512  # covers the scale-pack granule (16g) and QK_K=256
    x = jnp.asarray(rng.standard_normal((8, K)).astype(np.float32))
    n_ok = 0
    # Each variant is one remote Mosaic compile; on a healthy tunnel that
    # is seconds, but the axon compile service degrades to MINUTES per
    # compile at times (observed 2026-08-20). A lowering FAILURE always
    # aborts; running out of budget mid-sweep just stops early so the
    # gate can never eat the bench window.
    budget = float(os.environ.get("LLM_TPU_SMOKE_BUDGET", "600"))
    t_start = time.time()

    def over_budget() -> bool:
        if time.time() - t_start > budget:
            note(f"smoke: budget ({budget:.0f}s) exhausted after "
                 f"{n_ok} variants; continuing to the bench")
            return True
        return False

    def fail(variant, e):
        raise SystemExit(
            f"SMOKE FAILED at {variant}: {type(e).__name__}: {e}"
        )

    for t, fmt in FORMATS.items():
        if over_budget():
            emit("smoke", n_ok, "variants_ok", 0.0)
            return n_ok
        w = (rng.standard_normal((R, K)) * 0.02).astype(np.float32)
        qt = pack_ggml(t, quantize(t, w), (K, R))
        want = np.asarray(
            jnp.dot(x.astype(jnp.bfloat16),
                    dequant_jnp(qt, jnp.float32).astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        )
        scale = max(1.0, float(np.abs(want).max()))

        def st(p):
            return None if p is None else jnp.stack([p, p])

        sq = QuantTensor(qt.fmt_name, qt.k, qt.r, st(qt.lo), st(qt.hi),
                         st(qt.scale), st(qt.bias))
        variants = [
            (f"{fmt.name}/flat", lambda: qmatmul(x, qt)),
            (f"{fmt.name}/stacked",
             lambda: qmatmul(x, sq, layer=jnp.int32(1))),
        ]
        from llm_tpu.ops.qmatmul import coalesce_auto

        cq = coalesce_auto(sq, to_device=True, min_k=0)
        if cq is not None:
            variants.append(
                (f"{fmt.name}/coalesced",
                 lambda cq=cq: qmatmul(x, cq, layer=jnp.int32(1)))
            )
        for vname, call in variants:
            try:
                got = np.asarray(call())
                err = float(np.abs(got - want).max()) / scale
                assert err < 5e-2, f"rel-err {err:.3f} vs dequant reference"
                n_ok += 1
            except SystemExit:
                raise
            except Exception as e:  # noqa: BLE001
                fail(vname, e)

    # dense decode-attention kernel at every supported head geometry
    # (D=64 GPT-2/Falcon-7B, D=80 NeoX family, D=128), int8 cache, vs the
    # batched online-softmax jnp reference
    from llm_tpu.models.forward import _online_cache_pass_batched

    for D in (64, 80, 128):
        if over_budget():
            emit("smoke", n_ok, "variants_ok", 0.0)
            return n_ok
        L, B, Hkv, rep, S = 2, 2, 2, 2, 128
        spec = SimpleNamespace(kq_scale=1.0 / np.sqrt(D))
        qf = jnp.asarray(
            rng.standard_normal((B, 1, Hkv, rep, D)).astype(np.float32))
        ck = jnp.asarray(rng.integers(-127, 128, (L, B, Hkv, S, D),
                                      dtype=np.int64).astype(np.int8))
        cv = jnp.asarray(rng.integers(-127, 128, (L, B, Hkv, S, D),
                                      dtype=np.int64).astype(np.int8))
        ks = jnp.asarray(
            rng.uniform(0.001, 0.02, (L, B, Hkv, S)).astype(np.float32))
        vs = jnp.asarray(
            rng.uniform(0.001, 0.02, (L, B, Hkv, S)).astype(np.float32))
        n_past = jnp.asarray([64, 100], jnp.int32)
        try:
            m, l, acc = da.dense_attention_pass(
                spec, ck, cv, ks, vs, n_past, S, jnp.int32(1), qf)
            mr, lr, accr = _online_cache_pass_batched(
                spec, qf, (ck[1], ks[1]), (cv[1], vs[1]), n_past, None, 64)
            np.testing.assert_allclose(np.asarray(m), np.asarray(mr),
                                       rtol=2e-2, atol=2e-2)
            np.testing.assert_allclose(
                np.asarray(acc / l[..., None]),
                np.asarray(accr / lr[..., None]), rtol=2e-2, atol=2e-2)
            n_ok += 1
        except SystemExit:
            raise
        except Exception as e:  # noqa: BLE001
            fail(f"dense-attention/D={D}", e)

    # paged-attention kernel: int8 and nibble-packed int4 pools vs the
    # jnp page-scan pass (the int4 path has its own in-kernel unpack —
    # f32 floor-divide, the one form Mosaic legalizes — so it gets its
    # own lowering check)
    from llm_tpu.ops import paged_attention as pa
    from llm_tpu.ops.packing import pack_int4_rows
    from llm_tpu.paged import _paged_online_pass

    for bits in (8, 4):
        if over_budget():
            emit("smoke", n_ok, "variants_ok", 0.0)
            return n_ok
        L, NP, Hkv, page, D, B = 2, 5, 2, 16, 128, 2
        spec = SimpleNamespace(kq_scale=1.0 / np.sqrt(D), head_dim=D)
        qmaxi = 127 if bits == 8 else 7
        ck = rng.integers(-qmaxi, qmaxi + 1, (L, NP, Hkv, page, D),
                          dtype=np.int64).astype(np.int8)
        cv = rng.integers(-qmaxi, qmaxi + 1, (L, NP, Hkv, page, D),
                          dtype=np.int64).astype(np.int8)
        if bits == 4:
            pool_k = pack_int4_rows(jnp.asarray(ck))
            pool_v = pack_int4_rows(jnp.asarray(cv))
        else:
            pool_k, pool_v = jnp.asarray(ck), jnp.asarray(cv)
        ks = jnp.asarray(
            rng.uniform(0.001, 0.02, (L, NP, Hkv, page)).astype(np.float32))
        vs = jnp.asarray(
            rng.uniform(0.001, 0.02, (L, NP, Hkv, page)).astype(np.float32))
        tables = jnp.asarray([[1, 2, 0], [3, 4, 0]], jnp.int32)
        n_past = jnp.asarray([20, 30], jnp.int32)
        qf = jnp.asarray(
            rng.standard_normal((B, 1, Hkv, 1, D)).astype(np.float32))
        try:
            m, l, acc = pa.paged_attention_pass(
                spec, pool_k, pool_v, ks, vs, tables, n_past, None, 2,
                jnp.int32(1), qf)
            mr, lr, accr = _paged_online_pass(
                spec, qf, pool_k=pool_k, pool_v=pool_v, ks=ks, vs=vs,
                layer=jnp.int32(1), tables=tables, n_past=n_past,
                slopes=None, window_pages=2)
            np.testing.assert_allclose(np.asarray(m), np.asarray(mr),
                                       rtol=2e-2, atol=2e-2)
            np.testing.assert_allclose(
                np.asarray(acc / l[..., None]),
                np.asarray(accr / lr[..., None]), rtol=2e-2, atol=2e-2)
            n_ok += 1
        except SystemExit:
            raise
        except Exception as e:  # noqa: BLE001
            fail(f"paged-attention/int{bits}", e)

    emit("smoke", n_ok, "variants_ok", 1.0)
    return n_ok


# ---------------------------------------------------------------------------
# probes


def probe_dense_bw() -> float:
    """Dense bf16 mat-vec chain: the chip's raw streaming rate. Chained
    data dependencies + one host sync per measurement, and enough reps
    that the ~28 ms dispatch RTT is <5% of the dispatch (reps=8 measured
    "130 GB/s" on a 360 GB/s chip)."""
    n = 16384
    w = jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.bfloat16)
    reps = 48

    @jax.jit
    def chain(x, w):
        def body(h, _):
            h = jnp.dot(h, w, preferred_element_type=jnp.float32)
            h = h / (jnp.max(jnp.abs(h)) + 1.0)
            return h.astype(jnp.bfloat16), None

        h, _ = jax.lax.scan(body, x, None, length=reps)
        return h

    x = jnp.ones((8, n), jnp.bfloat16)
    float(chain(x, w)[0, 0])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(x, w)[0, 0])
        times.append(time.perf_counter() - t0)
    del w
    return reps * (n * n * 2.0) / min(times)


def probe_qstream_bw(params: ModelParams) -> float:
    """The fused kernel's standalone packed-plane streaming rate — the
    roofline denominator (round-1 VERDICT prescription). A chained scan of
    the three FFN projections (gate/up independent, down dependent — the
    same overlap structure as the real layer) over every layer's stacked
    planes, with the dispatch long enough (~0.5 s) that the ~28 ms RTT is
    noise. A 7-kernel full-layer replay was tried and is WORSE (113 GB/s):
    per-call overhead dominates it, and its compile took 14 minutes."""
    from llm_tpu.models.params import unfuse_layer_weights

    split = unfuse_layer_weights(params.layers)  # probe on split weights
    gate, up, down = (split.w_gate, split.w_up, split.w_down)
    # unfuse returns PLANE tensors; when the production layers are
    # coalesced (default since round 5), re-coalesce the split members so
    # the probe measures the layout the model actually runs — otherwise
    # the headline denominator silently reverts to the plane rate
    prod_coalesced = any(
        hasattr(getattr(params.layers, f), "buf")
        for f in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
                  "w_qkv", "w_gate_up")
        if getattr(params.layers, f) is not None
    )
    if prod_coalesced:
        from llm_tpu.ops.qmatmul import coalesce_auto

        def rl(qt):
            if qt is None or hasattr(qt, "buf"):
                return qt
            c = coalesce_auto(qt, to_device=True)
            return c if c is not None else qt

        gate, up, down = rl(gate), rl(up), rl(down)
    if gate is None:  # gelu FFN (gpt2/bloom/mpt): two projections
        gate = up
    L = gate.buf.shape[0] if hasattr(gate, "buf") else gate.lo.shape[0]
    E = gate.k
    reps = 24  # >=0.5 s per dispatch so the ~28 ms RTT is noise

    @jax.jit
    def chain(x, gate, up, down):
        from llm_tpu.ops.qmatmul import qmatmul

        def body(h, i):
            l = i % L
            # two independent streams (overlappable DMA, like the real
            # layer's q/k/v and gate/up) + one dependent (down)
            y1 = qmatmul(h, gate, layer=l)
            y2 = qmatmul(h, up, layer=l)
            y3 = qmatmul(y1 + y2, down, layer=l)  # kernel pads K itself
            h = h + y3[:, :E] * 1e-6  # inter-iteration dependency
            h = h / (jnp.max(jnp.abs(h)) + 1.0)
            return h, None

        h, _ = jax.lax.scan(body, x, jnp.arange(L * reps, dtype=jnp.int32))
        return h

    def plane_bytes(qt):
        if hasattr(qt, "buf"):  # coalesced layout
            return qt.buf.nbytes
        return (
            qt.lo.nbytes + qt.scale.nbytes
            + (qt.hi.nbytes if qt.hi is not None else 0)
            + (qt.bias.nbytes if qt.bias is not None else 0)
        )

    x = jnp.ones((8, E), jnp.float32)
    float(chain(x, gate, up, down)[0, 0])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(x, gate, up, down)[0, 0])
        times.append(time.perf_counter() - t0)
    nbytes = plane_bytes(gate) + plane_bytes(up) + plane_bytes(down)
    return reps * nbytes / min(times)


def weight_stream_bytes(params: ModelParams) -> int:
    """Bytes of packed weights streamed per decode step (embedding gather
    excluded — one row)."""
    total = 0
    for qt in [
        params.layers.wq, params.layers.wk, params.layers.wv,
        params.layers.w_qkv, params.layers.wo, params.layers.w_gate,
        params.layers.w_up, params.layers.w_gate_up, params.layers.w_down,
        params.lm_head if params.lm_head is not None else params.wte,
    ]:
        if qt is None:
            continue
        if isinstance(qt, QuantTensor):
            total += qt.lo.nbytes + qt.scale.nbytes
            if qt.hi is not None:
                total += qt.hi.nbytes
            if qt.bias is not None:
                total += qt.bias.nbytes
        elif hasattr(qt, "buf"):  # coalesced layout: one buffer, all planes
            total += qt.buf.nbytes
        else:
            total += qt.nbytes
    for v in [params.final_norm_w, params.layers.ln1_w, params.layers.ln2_w]:
        if v is not None:
            total += v.nbytes
    return total


# ---------------------------------------------------------------------------
# synthesized packed models (for the non-llama staged geometries; the llama
# path goes through the real checkpoint + loader)


def rand_qt(key, fmt_name: str, k: int, r: int) -> QuantTensor:
    """Random packed planes in the canonical on-device layout (f32 scales)."""
    from llm_tpu.ops.packing import _BY_NAME

    _, fmt = _BY_NAME[fmt_name]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    if fmt.lo_bits == 8:
        lo = jax.random.randint(k1, (k, r), -127, 127, jnp.int8)
    else:
        lo = jax.random.bits(k1, (k // (32 // fmt.lo_bits), r), jnp.uint32)
    hi = (
        jax.random.bits(k2, (k // (32 // fmt.hi_bits), r), jnp.uint32)
        if fmt.hi_bits
        else None
    )
    scale = jax.random.uniform(k3, (k // fmt.gsize, r), jnp.float32) * 0.01 + 1e-3
    bias = (
        jax.random.uniform(k4, (k // fmt.gsize, r), jnp.float32) * 0.01
        if fmt.has_bias
        else None
    )
    return QuantTensor(fmt_name, k, r, lo, hi, scale, bias)


def synth_params(key, fmt: str, E, F, L, V, *, fused_b=False, norm_bias=False,
                 swiglu=False, learned_pos_ctx=0, tied_head=True):
    keys = jax.random.split(key, 16)

    def stack(key, k, r):
        ks = jax.random.split(key, L)
        qts = [rand_qt(ks[i], fmt, k, r) for i in range(L)]
        return QuantTensor(
            fmt, k, r,
            jnp.stack([q.lo for q in qts]),
            jnp.stack([q.hi for q in qts]) if qts[0].hi is not None else None,
            jnp.stack([q.scale for q in qts]),
            jnp.stack([q.bias for q in qts]) if qts[0].bias is not None else None,
        )

    ones = jnp.ones((L, E), jnp.float32)
    zeros = jnp.zeros((L, E), jnp.float32)
    layers = LayerParams(
        ln1_w=ones, ln1_b=zeros if norm_bias else None,
        ln2_w=ones, ln2_b=zeros if norm_bias else None,
        wq=stack(keys[0], E, E), bq=None,
        wk=stack(keys[1], E, E), bk=None,
        wv=stack(keys[2], E, E), bv=None,
        wo=stack(keys[3], E, E), bo=None,
        w_gate=stack(keys[4], E, F) if swiglu else None,
        w_up=stack(keys[5], E, F), b_up=None,
        w_down=stack(keys[6], F, E), b_down=None,
    )
    from llm_tpu.models.params import (
        _coalesce_enabled,
        _fuse_enabled,
        coalesce_layer_weights,
        fuse_layer_weights,
    )

    if _fuse_enabled():
        layers = fuse_layer_weights(layers)
    wte = rand_qt(keys[7], fmt, E, V)
    head = None if tied_head else rand_qt(keys[8], fmt, E, V)
    if _coalesce_enabled():
        # same layout policy as the production loader (stacked planes
        # coalesce fine; size gate keeps small geometries on planes)
        from llm_tpu.ops.qmatmul import coalesce_auto

        layers = coalesce_layer_weights(layers, to_device=True)
        c = coalesce_auto(head if head is not None else wte, to_device=True)
        if c is not None:
            head = c
    return ModelParams(
        wte=wte,
        wpe=(
            jax.random.normal(keys[9], (E, learned_pos_ctx), jnp.float32) * 0.01
            if learned_pos_ctx
            else None
        ),
        emb_norm_w=None, emb_norm_b=None,
        final_norm_w=jnp.ones(E, jnp.float32),
        final_norm_b=jnp.zeros(E, jnp.float32) if norm_bias else None,
        lm_head=head,
        lm_head_b=None,
        layers=layers,
    )



def _ready_plane(layers):
    """block_until_ready target that works for both weight layouts and
    fused/split q|k|v."""
    qt = layers.w_qkv if layers.wq is None else layers.wq
    return qt.buf if hasattr(qt, "buf") else qt.lo

def time_decode_loop(spec, params, cache, n_past, window, steps=DECODE_STEPS):
    """Median time/token of the on-device multi-token decode loop."""
    ids = jnp.asarray([17], jnp.int32)
    logits, _, cache = forward_step(
        spec, params, ids, jnp.int32(n_past), cache, window
    )
    last_logits = logits[0]
    toks, last_logits, np_, cache = decode_loop(
        spec, params, last_logits, jnp.int32(n_past + 1), cache, steps, window
    )
    np.asarray(toks)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        toks, last_logits, np_, cache = decode_loop(
            spec, params, last_logits, jnp.int32(n_past + 1), cache, steps,
            window,
        )
        np.asarray(toks)
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / steps, cache


# ---------------------------------------------------------------------------
# sections


@_section("checkpoint")
def ensure_checkpoint() -> str:
    from llm_tpu.ggml.types import GgmlType
    from llm_tpu.testing import make_bench_file

    os.makedirs(os.path.dirname(CKPT), exist_ok=True)
    if not os.path.exists(CKPT):
        note("writing full-geometry LLaMA-7B Q4_0 checkpoint (~3.8 GB)")
        make_bench_file(
            "llama", CKPT, GgmlType.Q4_0, n_ff=11008, n_vocab=32000,
            n_embd=4096, n_head=32, n_layer=32, n_mult=256,
        )
    return CKPT


@_section("load")
def load_model():
    from llm_tpu.loader import ModelParameters, load

    prev = os.environ.get("LLM_TPU_PACK_CACHE")
    os.environ["LLM_TPU_PACK_CACHE"] = "0"  # time the COLD path even if a
    try:  # plane cache from a previous bench run sits in /tmp
        t0 = time.time()
        model = load(CKPT, "llama", params=ModelParameters(context_size=CTX))
    finally:  # restore (not pop): keep any operator-set value live
        if prev is None:
            os.environ.pop("LLM_TPU_PACK_CACHE", None)
        else:
            os.environ["LLM_TPU_PACK_CACHE"] = prev
    jax.block_until_ready(_ready_plane(model.params.layers))
    load_s = time.time() - t0
    size_gb = os.path.getsize(CKPT) / 1e9
    emit("llama7b_q4_0_load", load_s, "seconds",
         size_gb / load_s / 10)  # vs 10 GB/s nominal disk+transcode+PCIe
    return model


@_section("hbm-slope")
def probe_hbm_slope(model) -> float:
    """MARGINAL cost of the decode loop's cache reads: decode at window
    512 vs 2048 differs only in how many bf16 KV rows attention streams.
    Measured ~615 GB/s marginal vs ~140 GB/s serial probes — i.e. the
    XLA-scheduled cache reads largely OVERLAP the weight-streaming kernel
    path (latency hiding across the layer scan), they are NOT evidence of
    a 600 GB/s serial memory system (every serial probe — dense bf16
    chain, packed-plane kernel chain, near-pure DMA kernels in several
    layouts/tilings/grids — converges to ~90-145 GB/s on this chip).
    Reported for the record; the roofline treats cache reads as free
    (overlapped) and weights as the serial bottleneck."""
    spec, params = model.spec, model.params
    pts = []
    for npast, window in ((256, 512), (1920, 2048)):
        cache = init_cache(spec, jnp.bfloat16)
        dt, cache = time_decode_loop(
            spec, params, cache, npast, window, steps=32
        )
        bytes_w = (cache.k.nbytes + cache.v.nbytes) * window / CTX
        pts.append((bytes_w, dt))
        del cache
    (b0, t0), (b1, t1) = pts
    if t1 <= t0:
        return 0.0
    return (b1 - b0) / (t1 - t0)


@_section("decode")
def decode_bench(model, roofline_bw):
    spec = model.spec
    params = model.params
    cache = init_cache(spec, jnp.bfloat16)
    window = window_bucket(N_PAST + 3 * DECODE_STEPS, CTX)
    dt, cache = time_decode_loop(spec, params, cache, N_PAST, window)
    tok_s = 1.0 / dt
    # Roofline: the packed weight stream is the serial bottleneck; the
    # windowed cache reads overlap it almost fully (probe_hbm_slope), so
    # they are excluded from the denominator.
    step_bytes = weight_stream_bytes(params)
    roofline = roofline_bw / step_bytes
    note(
        f"decode step={dt*1e3:.1f}ms weight bytes/step={step_bytes/1e9:.2f}GB "
        f"roofline_bw={roofline_bw/1e9:.0f}GB/s roofline={roofline:.1f}tok/s"
    )
    del cache
    return emit(
        "llama7b_q4_0_decode", tok_s, "tokens/s/chip", tok_s / roofline
    )


@_section("prefill")
def prefill_bench(model):
    spec, params = model.spec, model.params
    T = 512
    cache = init_cache(spec, jnp.bfloat16)
    ids = jnp.asarray(np.arange(2, 2 + T) % 31000, jnp.int32)
    window = window_bucket(T, CTX)

    logits, _, cache = forward_step(spec, params, ids, jnp.int32(0), cache, window)
    np.asarray(logits[-1])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        logits, _, cache = forward_step(
            spec, params, ids, jnp.int32(0), cache, window
        )
        np.asarray(logits[-1])
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    del cache
    # vs_baseline: prefill utilization vs decode-equivalent traffic has no
    # meaning; report speedup over token-at-a-time decode instead
    return emit("llama7b_q4_0_prefill_512", T / dt, "tokens/s", 0.0)


@_section("prefill-8k")
def prefill_8k_bench(model):
    """VERDICT round-1 #3 done-criterion: prefill T=512 at n_ctx=8192 runs
    on chip within memory — the flash-style online-softmax attention path
    (the materialized scores would be ~0.5 GB/layer)."""
    from llm_tpu.models.forward import _use_online

    import dataclasses

    spec8k = dataclasses.replace(model.spec, n_ctx=8192)
    assert _use_online(512, spec8k.n_head, 7680)[0], "online path not engaged"
    params = model.params
    T, PAST = 512, 7168
    cache = init_cache(spec8k, jnp.bfloat16)  # 8K bf16 cache: 4.3 GB
    ids = jnp.asarray(np.arange(2, 2 + T) % 31000, jnp.int32)
    window = window_bucket(PAST + T, 8192)

    logits, _, cache = forward_step(
        spec8k, params, ids, jnp.int32(PAST), cache, window
    )
    np.asarray(logits[-1])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        logits, _, cache = forward_step(
            spec8k, params, ids, jnp.int32(PAST), cache, window
        )
        np.asarray(logits[-1])
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    del cache
    return emit("llama7b_q4_0_prefill_8kctx_512", T / dt, "tokens/s", 0.0)


@_section("ttft")
def ttft_bench(model):
    spec, params = model.spec, model.params
    P = 64
    cache = init_cache(spec, jnp.bfloat16)
    ids = jnp.asarray(np.arange(2, 2 + P) % 31000, jnp.int32)
    window = window_bucket(P + 1, CTX)

    def once(cache):
        t0 = time.perf_counter()
        logits, _, cache = forward_step(
            spec, params, ids, jnp.int32(0), cache, window
        )
        tok = int(np.argmax(np.asarray(logits[-1])))  # greedy first token
        return time.perf_counter() - t0, cache

    _, cache = once(cache)  # compile
    samples = []
    for _ in range(7):
        dt, cache = once(cache)
        samples.append(dt)
    p50 = float(np.median(samples)) * 1e3
    del cache
    return emit("llama7b_q4_0_ttft_64tok", p50, "ms_p50", 0.0)


@_section("serve")
def serve_bench(model, decode_rec, roofline_bw):
    """8-stream int8-KV multi-step decode (dense slots, Pallas
    dense-attention kernel). vs_baseline = the step's required-traffic
    roofline (weights + per-stream int8 KV window reads at the measured
    kernel rate); the naive 8x-single ratio is printed as a note."""
    spec, params = model.spec, model.params
    Bs, N = 8, 64
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
    single = decode_rec["value"] if decode_rec else 35.0
    kv_bytes = (
        spec.n_layer * Bs * window * spec.n_head_kv
        * (2 * spec.head_dim + 2 * 4)  # int8 k+v rows + f32 scales
    )
    step_bytes = weight_stream_bytes(params) + kv_bytes
    roofline_agg = Bs / (step_bytes / roofline_bw)
    agg = Bs * N / dt
    note(f"serve-8: {dt / N * 1e3:.1f} ms/step, traffic "
         f"{step_bytes / 1e9:.2f} GB/step, naive 8x-single ratio "
         f"{agg / (8 * single):.2f}")
    del cache
    return emit(
        "llama7b_q4_0_serve_8streams_int8kv", agg, "tokens/s/chip",
        agg / roofline_agg,
    )


def _paged_serve_impl(model, decode_rec, roofline_bw, B, PAGE, metric):
    """BASELINE's continuous-batching scale on ONE chip: B streams over a
    paged int8 pool sized for the TOKENS IN FLIGHT (2 pages/stream) — a
    dense 64-slot int8 cache would need ~34 GB and not fit; the page pool
    holds the same workload in ~4.3 GB.

    vs_baseline is the step's REQUIRED-TRAFFIC roofline: weights once per
    step + per-stream int8 KV window reads (+scales), at the kernel's
    measured streaming rate. (Round 3 scored against 64x the
    single-stream rate, which pretends the 4.4 GB/step of per-stream
    cache reads are overhead — the r4 probe showed the real step BEATS
    even this roofline because cache reads overlap the weight stream at
    a higher rate; the naive ratio is still printed as a note.)

    Round 5 adds the 128-stream row (window-bucketed: 128 x 128-token
    pages = the same tokens in flight and same pool bytes as 64 x 256):
    the step is required-traffic bound, so doubling rows at equal KV
    bytes measured +69% aggregate (2509 -> 4245 tok/s in the probe; the
    int4 pool re-measured slower than int8 again and stays a capacity
    lever)."""
    from llm_tpu.paged import PageAllocator, init_paged_cache, paged_decode_loop

    spec = model.spec
    params = model.params
    PAST = min(200, PAGE - 8)
    pages_per = spec.n_ctx // PAGE
    n_pages = 1 + B  # one page per stream in flight (~2.2 GB/plane; the
    #                  axon compile service crashes above ~8 GB total)
    pool = init_paged_cache(spec, n_pages, PAGE, "int8")
    tables = np.full((B, pages_per), PageAllocator.TRASH, np.int32)
    nxt = iter(range(1, n_pages))
    for b in range(B):
        tables[b, 0] = next(nxt)
    n_past = jnp.full((B,), PAST, jnp.int32)
    tables_j = jnp.asarray(tables)
    last = jnp.zeros((B, spec.n_vocab), jnp.float32)
    wp = 1

    toks, ll, _, pool = paged_decode_loop(
        spec, params, last, n_past, tables_j, pool, STEPS, wp
    )
    np.asarray(toks)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        toks, ll, _, pool = paged_decode_loop(
            spec, params, ll, n_past, tables_j, pool, STEPS, wp
        )
        np.asarray(toks)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    agg = B * STEPS / dt
    single = decode_rec["value"] if decode_rec else 34.5
    kv_bytes = (
        spec.n_layer * B * wp * PAGE * spec.n_head_kv
        * (2 * spec.head_dim + 2 * 4)  # int8 k+v rows + f32 k/v scales
    )
    step_bytes = weight_stream_bytes(params) + kv_bytes
    roofline_agg = B / (step_bytes / roofline_bw)
    note(f"paged-serve-{B}: {dt / STEPS * 1e3:.1f} ms/step, traffic "
         f"{step_bytes / 1e9:.2f} GB/step, naive {B}x-single ratio "
         f"{agg / (B * single):.2f}")
    del pool
    return emit(metric, agg, "tokens/s/chip", agg / roofline_agg)


@_section("paged-serve-64")
def paged_serve_bench(model, decode_rec, roofline_bw):
    return _paged_serve_impl(
        model, decode_rec, roofline_bw, 64, 256,
        "llama7b_q4_0_paged_serve_64streams_int8",
    )


@_section("paged-serve-128")
def paged_serve128_bench(model, decode_rec, roofline_bw):
    """The 128-stream window-bucketed row (see _paged_serve_impl)."""
    return _paged_serve_impl(
        model, decode_rec, roofline_bw, 128, 128,
        "llama7b_q4_0_paged_serve_128streams_int8",
    )


@_section("prefix-cache-ttft")
def prefix_cache_ttft_bench(model):
    """Serving TTFT for a REPEATED 512-token prompt through the paged
    engine's prompt-prefix cache: the repeat is an EXACT page-aligned hit
    (round 4), so admission borrows every page read-only AND restores the
    final-position logits from the cache — ZERO prefill dispatches; TTFT
    is one decode dispatch plus admission hashing (measured trajectory
    127 -> 103 ms with the CoW tail -> exact-hit; cold 162 ms)."""
    from llm_tpu.paged import PagedEngine
    from llm_tpu.samplers import GreedySampler
    from llm_tpu.serve import GenerationRequest

    engine = PagedEngine(
        model, max_streams=1, page_size=256, n_pages=17, kv_dtype="int8",
        n_batch=512, prefix_cache=True,
    )
    prompt = [int(x) for x in (np.arange(2, 514) % 31000)]

    def ttft(toks):
        first = []

        def on_tok(_rid, _txt):
            if not first:
                first.append(time.perf_counter())

        t0 = time.perf_counter()
        engine.generate_all(
            [GenerationRequest(prompt=toks, max_tokens=2,
                               sampler=GreedySampler(), on_token=on_tok)]
        )
        return ((first[0] if first else time.perf_counter()) - t0) * 1e3

    ttft([3, 4, 5])  # compile warm-up (same bucketed shapes)
    cold = min(ttft(prompt), ttft([int(t) + 1 for t in prompt]))
    warm = min(ttft(prompt), ttft(prompt))
    note(f"prefix-cache ttft: cold={cold:.0f}ms warm={warm:.0f}ms")
    return emit(
        "llama7b_q4_0_prefix_cache_warm_ttft_512tok", warm, "ms",
        warm / cold if cold else 0.0,  # fraction of the uncached TTFT
    )


@_section("perplexity")
def perplexity_bench(model):
    """North-star readiness: wikitext-2-scale perplexity THROUGHPUT at 7B
    through the production session pipeline (device-side NLL; the +0.1
    PPL parity check itself needs the real corpus + reference CLI, which
    this zero-egress host cannot fetch). 4 chunks x 2048 tokens of a
    synthetic corpus; reports scored tokens/s."""
    from llm_tpu.session import InferenceSession, InferenceSessionConfig

    session = InferenceSession(model, InferenceSessionConfig())
    rng = np.random.default_rng(11)
    toks = rng.integers(5, model.spec.n_vocab - 5, size=4 * CTX).tolist()
    done = []
    # warm-up chunk compiles the sub-chunk shapes
    session.perplexity(toks[:CTX], lambda i, p: done.append(p))
    t0 = time.perf_counter()
    session.perplexity(toks, lambda i, p: done.append(p))
    dt = time.perf_counter() - t0
    ppl = done[-1]
    note(f"synthetic-corpus ppl={ppl:.1f} ({4 * CTX} tokens in {dt:.1f}s)")
    return emit(
        "llama7b_q4_0_perplexity_tokens_per_s", 4 * CTX / dt, "tokens/s",
        0.0,  # no baseline: the reference publishes no PPL throughput
    )


@_section("load-packed")
def load_packed_bench(load_rec):
    """Repeat-load economics via the plane cache (cli pack): the packed
    pytree mmap-streams from disk straight to HBM, skipping container
    parse + native transcode. Runs with the first model freed so HBM holds
    only one copy of the 3.9 GB planes."""
    from llm_tpu.loader import ModelParameters, load
    from llm_tpu.models.pack_cache import (
        cache_key, pack_path, save_packed_params,
    )

    pp = pack_path(CKPT)
    if not (pp / "manifest.json").exists():
        note("writing plane cache (~3.9 GB)")
        import shutil

        free = shutil.disk_usage("/tmp").free
        if free < 6e9:
            note(f"skipping: only {free/1e9:.1f} GB free in /tmp")
            return None
        t0 = time.time()
        model = load(CKPT, "llama", params=ModelParameters(context_size=CTX))
        save_packed_params(model.params, pp, cache_key(CKPT))
        note(f"pack written in {time.time() - t0:.0f}s")
        del model
        gc.collect()
    # prime the page cache first: the cold-load number it is compared to
    # ran right after the checkpoint was written (cache-warm), so timing
    # the pack from a COLD cache would measure this host's slow virtual
    # disk (~40 MB/s cold), not the transcode-skip + transfer the cache
    # exists to isolate
    for f in sorted(pp.glob("*.npy")):
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass
    t0 = time.time()
    model = load(CKPT, "llama", params=ModelParameters(context_size=CTX))
    jax.block_until_ready(_ready_plane(model.params.layers))
    packed_s = time.time() - t0
    cold_s = load_rec["value"] if load_rec else 0.0
    del model
    gc.collect()
    return emit(
        "llama7b_q4_0_load_packed", packed_s, "seconds",
        packed_s / cold_s if cold_s else 0.0,  # fraction of the cold load
    )


@_section("paged-mpt")
def paged_mpt_bench(roofline_bw):
    """Staged config #4: MPT-7B geometry, Q4_K, ALiBi, 8K context, int8
    PAGED KV — decode through the Pallas paged-attention kernel."""
    from llm_tpu.paged import PageAllocator, init_paged_cache, paged_decode_loop

    E, H, L, F, V = 4096, 32, 32, 16384, 32000
    N_CTX = 8192
    PAGE = 256
    B = 2
    PAST = 7680

    spec = ModelSpec(
        arch="mpt", n_vocab=V, n_embd=E, n_head=H, n_head_kv=H, n_layer=L,
        n_rot=0, n_ctx=N_CTX, norm="ln", norm_has_bias=False, rope_mode=-1,
        alibi_bias_max=8.0, residual="sequential", ffn="gelu",
    )
    params = synth_params(jax.random.PRNGKey(2), "q4_k", E, F, L, V)

    pages_per = N_CTX // PAGE
    n_pages = 1 + B * pages_per
    pool = init_paged_cache(spec, n_pages, PAGE, "int8")
    tables = np.full((B, pages_per), PageAllocator.TRASH, np.int32)
    alloc = iter(range(1, n_pages))
    need = (PAST + STEPS) // PAGE + 1
    for b in range(B):
        for j in range(need):
            tables[b, j] = next(alloc)
    n_past = jnp.full((B,), PAST, jnp.int32)
    tables_j = jnp.asarray(tables)
    last = jnp.zeros((B, V), jnp.float32)
    wp = need

    toks, ll, _, pool = paged_decode_loop(
        spec, params, last, n_past, tables_j, pool, STEPS, wp
    )
    np.asarray(toks)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        toks, ll, _, pool = paged_decode_loop(
            spec, params, ll, n_past, tables_j, pool, STEPS, wp
        )
        np.asarray(toks)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) / STEPS
    step_bytes = weight_stream_bytes(params) + B * (
        wp * PAGE * H * (E // H) * 2  # int8 k+v pages
        + wp * PAGE * H * 2 * 4  # scales
    )
    roofline = roofline_bw / step_bytes
    del pool, params
    return emit(
        "mpt7b_q4_k_8k_paged_int8_decode", B / dt, "tokens/s/chip",
        (B / dt) / (B * roofline),
    )


@_section("stablelm")
def stablelm_bench(roofline_bw):
    """Staged config #3 geometry: GPT-NeoX/StableLM-3B Q5_1."""
    E, H, L, F, V = 2560, 32, 32, 10240, 50432
    spec = ModelSpec(
        arch="gptneox", n_vocab=V, n_embd=E, n_head=H, n_head_kv=H,
        n_layer=L, n_rot=E // H, n_ctx=CTX, norm="ln", norm_has_bias=True,
        rope_mode=2, residual="parallel_two_ln", ffn="gelu",
    )
    params = synth_params(
        jax.random.PRNGKey(3), "q5_1", E, F, L, V, norm_bias=True,
        tied_head=False,
    )
    cache = init_cache(spec, jnp.bfloat16)
    window = window_bucket(N_PAST + 3 * 128, CTX)
    dt, cache = time_decode_loop(spec, params, cache, N_PAST, window,
                                 steps=128)
    step_bytes = weight_stream_bytes(params)  # cache reads overlap
    roofline = roofline_bw / step_bytes
    del cache, params
    return emit(
        "stablelm3b_q5_1_decode", 1.0 / dt, "tokens/s/chip",
        (1.0 / dt) / roofline,
    )


@_section("gpt2")
def gpt2_bench(roofline_bw):
    """Staged config #1 geometry: GPT-2 117M Q8_0 greedy decode."""
    E, H, L, F, V = 768, 12, 12, 3072, 50304
    N_CTX = 1024
    spec = ModelSpec(
        arch="gpt2", n_vocab=V, n_embd=E, n_head=H, n_head_kv=H, n_layer=L,
        n_rot=0, n_ctx=N_CTX, norm="ln", norm_has_bias=True, rope_mode=-1,
        learned_pos=True, residual="sequential", ffn="gelu",
    )
    params = synth_params(
        jax.random.PRNGKey(4), "q8_0", E, F, L, V, norm_bias=True,
        learned_pos_ctx=N_CTX,
    )
    cache = init_cache(spec, jnp.bfloat16)
    window = 1024
    # 256-token blocks: at ~1.3 ms/step the ~28 ms dispatch RTT is a THIRD
    # of a 64-step block's wall time; big models amortize it at 64
    dt, cache = time_decode_loop(spec, params, cache, 512, window, steps=256)
    step_bytes = weight_stream_bytes(params)  # cache reads overlap
    # Denominator note (VERDICT r4 item 3): an "own-geometry kernel rate"
    # via probe_qstream_bw was tried and measured 71 GB/s — at 768-wide
    # shapes that probe times per-call dispatch overhead (3 calls of ~2
    # grid steps each per iteration), not streaming, and the real decode
    # runs 3x FASTER than it; scoring against it would be meaningless.
    # The 7B-shape kernel rate stays as the denominator, accepting that
    # it now includes the coalesced layout's gain which gpt2's small-K
    # weights are size-gated out of. The gap to that roofline is CHIP
    # PHYSICS, not kernel quality: dense-bf16 upcast (zero Pallas calls)
    # ties this row exactly (docs/probes/round5/gpt2_dense_upcast.log) —
    # the step is ~11 us-per-kernel dispatch-bound across ~50 sequential
    # ops, and the 77 MB head already streams at ~695 GB/s.
    roofline = roofline_bw / step_bytes
    del cache, params
    return emit(
        "gpt2_117m_q8_0_decode", 1.0 / dt, "tokens/s/chip",
        (1.0 / dt) / roofline,
    )


@_section("llama13b")
def llama13b_bench(roofline_bw):
    """Staged config #5's model (LLaMA-13B Q4_0) on one chip: full loader
    path + 64-token-block decode. The config's 2-host tensor-sharded
    continuous batching is exercised by tests/mh (two real OS processes)
    and dryrun_multichip; only single-chip hardware exists here.

    HBM budget (why this fits since round 4): packed weights 7.32 GB
    (4.5 bits/weight + packed f16 scales) + int8 KV at ctx 512 B=1
    0.21 GB + decode workspace well under 1 GB. Rounds 1-3 OOM'd at LOAD
    TIME, not decode: device-side jnp.stack of per-layer planes held
    every unstacked plane AND its stacked copy live at once (~2x params
    = 14.6 GB transient), over the slice's fluctuating free HBM. The
    loader now packs host-side and uploads each stacked tensor once
    (models/params.py stack_layers), capping the device transient at
    ~1x params; measured 2026-08-20: load 118 s, decode 40.3 tok/s. If
    the shared slice is under co-tenant memory pressure at bench time the
    section skips with a note rather than failing the bench."""
    from llm_tpu.ggml.types import GgmlType
    from llm_tpu.loader import ModelParameters, load
    from llm_tpu.testing import make_bench_file

    ckpt = "/tmp/llm_tpu_bench/llama13b_q4_0.bin"
    if not os.path.exists(ckpt):
        note("writing full-geometry LLaMA-13B Q4_0 checkpoint (~7 GB)")
        make_bench_file(
            "llama", ckpt, GgmlType.Q4_0, n_ff=13824, n_vocab=32000,
            n_embd=5120, n_head=40, n_layer=40, n_mult=256,
        )
    t0 = time.time()
    # ctx 1024 + int8 KV: ~7 GB weights + 0.43 GB cache — the virtualized
    # chip OOMs well under its nominal 16 GB (compile temporaries included)
    model = load(ckpt, "llama", params=ModelParameters(context_size=512))
    jax.block_until_ready(_ready_plane(model.params.layers))
    note(f"13B load {time.time() - t0:.0f}s")
    spec, params = model.spec, model.params
    # B=1 BATCHED decode: the head-major dense-attention kernel reads the
    # int8 cache with no f32 dequant temporaries (the single-stream jnp
    # path materializes ~0.8 GB of them at 13B and pushes the ~8 GB
    # service ceiling)
    cache = init_cache_batched(spec, 1, "int8")
    window = window_bucket(256 + 3 * DECODE_STEPS, 512)
    ids = jnp.full((1, 1), 17, jnp.int32)
    n_past = jnp.full((1,), 256, jnp.int32)
    logits, _, cache = forward_batched_step(
        spec, params, ids, n_past, cache, window
    )
    ll = logits[:, 0, :]
    toks, ll, n_past, cache = decode_loop_batched(
        spec, params, ll, n_past + 1, cache, DECODE_STEPS, window
    )
    np.asarray(toks)
    times = []
    for _ in range(3):
        n2 = jnp.full((1,), 257, jnp.int32)
        t0 = time.perf_counter()
        toks, _, _, cache = decode_loop_batched(
            spec, params, ll, n2, cache, DECODE_STEPS, window
        )
        np.asarray(toks)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) / DECODE_STEPS
    step_bytes = weight_stream_bytes(params)
    roofline = roofline_bw / step_bytes
    del cache, params, model
    gc.collect()
    return emit(
        "llama13b_q4_0_decode", 1.0 / dt, "tokens/s/chip",
        (1.0 / dt) / roofline,
    )


def main() -> None:
    t_all = time.time()
    if os.environ.get("LLM_TPU_BENCH_SMOKE", "1") != "0":
        t0 = time.time()
        n = run_smoke()
        note(f"smoke: ok ({n} variants, {time.time() - t0:.0f}s)")
    ensure_checkpoint()
    model = load_model()
    if model is None:
        raise SystemExit("load failed")

    dense_bw = probe_dense_bw()
    qbw = probe_qstream_bw(model.params)
    slope_bw = probe_hbm_slope(model) or 0.0
    # roofline = the kernel's own standalone streaming rate (VERDICT r1
    # prescription); the dense rate shows the chip's raw ceiling and the
    # slope shows cache-read overlap — reported for transparency
    roofline_bw = qbw
    note(
        f"probe: dense={dense_bw/1e9:.0f}GB/s qstream={qbw/1e9:.0f}GB/s "
        f"(kernel efficiency {qbw/dense_bw:.2f}) "
        f"cache-overlap slope={slope_bw/1e9:.0f}GB/s"
    )

    headline = decode_bench(model, roofline_bw)
    prefill_bench(model)
    prefill_8k_bench(model)
    ttft_bench(model)
    serve_bench(model, headline, roofline_bw)
    paged_serve_bench(model, headline, roofline_bw)
    paged_serve128_bench(model, headline, roofline_bw)
    prefix_cache_ttft_bench(model)
    perplexity_bench(model)

    # free the llama weights before the 7B-scale MPT section
    del model
    gc.collect()

    load_packed_bench(next(
        (r for r in _MATRIX if r["metric"] == "llama7b_q4_0_load"), None
    ))
    gc.collect()

    paged_mpt_bench(roofline_bw)
    stablelm_bench(roofline_bw)
    gpt2_bench(roofline_bw)
    llama13b_bench(roofline_bw)

    note(f"total bench time: {time.time() - t_all:.0f}s")
    if headline:
        print(json.dumps(headline), flush=True)  # driver-parsed line, LAST


def _wait_for_backend(attempts: int = 20, probe_timeout: int = 120) -> None:
    """Pre-flight: the axon PJRT client creation sometimes HANGS (not
    fails) when the tunnel is down — observed 2026-08-17, make_c_api_client
    blocked >5 min. A hung init in the driver's bench run would silently
    burn the round's wall clock, so probe device init in a SUBPROCESS with
    a hard timeout and wait for the tunnel to come back before starting."""
    import subprocess

    probe = (
        "import jax, jax.numpy as jnp; "
        "x = jnp.ones((128,128)); print(float((x@x).sum()))"
    )
    for i in range(attempts):
        try:
            subprocess.run(
                [sys.executable, "-c", probe], timeout=probe_timeout,
                check=True, capture_output=True,
            )
            return
        except Exception as e:  # noqa: BLE001
            note(
                f"backend probe {i + 1}/{attempts} failed "
                f"({type(e).__name__}); waiting 60s for the tunnel"
            )
            time.sleep(60)
    # Tunnel stayed down for the whole window: rather than produce NO
    # artifact, replay the last measured matrix (BENCH_MATRIX.json is
    # written by this script on every successful run on the real chip)
    # with an explicit stale marker on every line.
    note("device backend unreachable; replaying last measured matrix (stale)")
    try:
        rows = json.load(open("BENCH_MATRIX.json"))
    except Exception:  # noqa: BLE001
        raise SystemExit("device backend unreachable and no cached matrix")
    headline = None
    for r in rows:
        r = dict(r, stale=True)
        if r["metric"] == "llama7b_q4_0_decode":
            headline = r
        else:
            print(json.dumps(r), flush=True)
    if headline is None:
        # never let an arbitrary metric sit in the driver-parsed LAST
        # line slot (a cached matrix from a partial run may lack the
        # headline row)
        raise SystemExit("device backend unreachable and the cached "
                         "matrix has no headline row")
    print(json.dumps(headline), flush=True)  # driver-parsed line, LAST
    raise SystemExit(0)


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
            gc.collect()  # drop the failed attempt's device arrays first
            time.sleep(20)


if __name__ == "__main__":
    _wait_for_backend()
    if "--smoke" in sys.argv:
        n = run_smoke()
        note(f"smoke: ok ({n} variants)")
        raise SystemExit(0)
    _run_with_retry(main)
