"""Dequant-arithmetic variants of the coalesced kernel at the winning
cK_r512 geometry (round-5: the kernel is VPU-dequant-bound — stream-only
hits 697 GB/s = 1.04x dense while the full kernel does 349).

Variants (all same blocks/grid, only the in-VMEM arithmetic differs):
  base     unpack(2 shifts) -> f32 cvt -> f32 scale mul -> bf16 cvt -> dot
  bf16     unpack -> bf16 cvt -> bf16 scale mul -> dot      (1 fewer cvt)
  f32dot   unpack -> f32 cvt -> f32 scale mul -> f32 MXU dot (no bf16 cvt)
  ghoist   unpack -> bf16 cvt -> per-group batched MXU dots, scale applied
           to the [G, M, R] partials (VPU work per weight: 3 ops)
  stream   DMA-only reference (the bandwidth ceiling)

Run: python -u scripts/probe_dequant_variants.py [--rounds N]
"""

import argparse
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llm_tpu.ggml.quant import quantize
from llm_tpu.ggml.types import GgmlType
from llm_tpu.ops.packing import (
    QuantTensor,
    coalesce_qt,
    expand_f16x2,
    pack_ggml,
    unpack_plane,
    _expand_groups,
)

L = 4
SHORT, LONG = 48, 96
K, R = 4096, 11008


def build():
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((R, K)) * 0.02).astype(np.float32)
    raw = quantize(GgmlType.Q4_0, w)
    qt = pack_ggml(GgmlType.Q4_0, raw, (K, R), r_multiple=1024)

    def st(p):
        return None if p is None else jnp.stack([p] * L)

    sq = QuantTensor(qt.fmt_name, qt.k, qt.r, st(qt.lo), st(qt.hi),
                     st(qt.scale), st(qt.bias))
    qtc = coalesce_qt(sq, qt.k_padded, 512)  # whole-K x 512 lanes
    nbytes = qtc.buf.nbytes // L
    return qtc, nbytes


def make_call(qtc, mode):
    fmt = qtc.fmt
    segs = qtc.seg_rows
    lo_r, _, sc_r, _ = segs
    rows = sum(segs)
    n_r, n_k = qtc.rp // qtc.tile_r, qtc.kp // qtc.tile_k
    tile_r, tile_k = qtc.tile_r, qtc.tile_k
    Mp = 8
    g = fmt.gsize
    # sub-slice count: mode suffix _subN overrides the default 4
    sub = 4  # 1024-element K slices
    if "_sub" in mode:
        mode, n = mode.rsplit("_sub", 1)
        sub = int(n)
    sk = tile_k // sub

    if mode == "gdot":
        # x arrives PRE-grouped [K/g, Mp, g] (host/XLA reshape — lane-dim
        # reshapes are illegal inside Mosaic): per-group batched MXU dots,
        # scale applied to the [G, Mp, R] partials. VPU per weight: 2
        # unpack shifts + 1 bf16 cvt (no K-wide broadcast, no K-wide mul).
        def kernel(l_ref, xg_ref, buf_ref, out_ref, acc_ref):
            k = pl.program_id(1)

            @pl.when(k == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)

            buf = buf_ref[0]
            acc = jnp.zeros_like(acc_ref)
            Gt = sk // g
            for s in range(sub):
                lo = buf[s * (lo_r // sub) : (s + 1) * (lo_r // sub)]
                scw = buf[lo_r + s * (sc_r // sub)
                          : lo_r + (s + 1) * (sc_r // sub)]
                q = unpack_plane(lo, fmt.lo_bits, signed=True)
                qb = q.astype(jnp.bfloat16).reshape(Gt, g, tile_r)
                xb = xg_ref[s * Gt : (s + 1) * Gt]  # [Gt, Mp, g]
                part = jax.lax.dot_general(
                    xb, qb, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # [Gt, Mp, tile_r]
                sc = expand_f16x2(scw)  # [Gt, tile_r] f32
                acc = acc + jnp.sum(part * sc[:, None, :], axis=0)
            acc_ref[:] += acc

            @pl.when(k == n_k - 1)
            def _():
                out_ref[:] = acc_ref[:].astype(jnp.float32)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_r, n_k),
            in_specs=[
                pl.BlockSpec((tile_k // g, Mp, g),
                             lambda r, k, l: (k, 0, 0)),
                pl.BlockSpec((1, rows, tile_r),
                             lambda r, k, l: (l[0], r * n_k + k, 0)),
            ],
            out_specs=pl.BlockSpec((Mp, tile_r), lambda r, k, l: (0, r)),
            scratch_shapes=[pltpu.VMEM((Mp, tile_r), jnp.float32)],
        )

        def call(x, w, l):
            xp = (jnp.pad(x, ((0, 0), (0, qtc.kp - x.shape[1])))
                  if x.shape[1] != qtc.kp else x)
            xg = xp.astype(jnp.bfloat16).reshape(
                Mp, qtc.kp // g, g).swapaxes(0, 1)  # [K/g, Mp, g]
            return pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((Mp, qtc.rp), jnp.float32),
            )(jnp.asarray(l, jnp.int32).reshape(1), xg, w.buf)

        return call

    def kernel(l_ref, x_ref, buf_ref, out_ref, acc_ref):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        buf = buf_ref[0]
        acc = jnp.zeros_like(acc_ref)
        for s in range(sub):
            lo = buf[s * (lo_r // sub) : (s + 1) * (lo_r // sub)]
            scw = buf[lo_r + s * (sc_r // sub) : lo_r + (s + 1) * (sc_r // sub)]
            if mode == "stream":
                t = jnp.sum(lo.astype(jnp.int32), axis=0) + jnp.sum(
                    scw.astype(jnp.int32), axis=0)
                acc = acc + (t.astype(jnp.float32)[None, :] * 1e-30
                             + x_ref[:].astype(jnp.float32)[0, 0])
                continue
            q = unpack_plane(lo, fmt.lo_bits, signed=True)  # [sk, tile_r]
            x = x_ref[:, s * sk : (s + 1) * sk].astype(jnp.bfloat16)
            sc = expand_f16x2(scw)  # f32 [sk/g, tile_r]
            if mode in ("base", "dimsem"):
                wv = q.astype(jnp.float32) * _expand_groups(sc, g)
                acc = acc + jnp.dot(x, wv.astype(jnp.bfloat16),
                                    preferred_element_type=jnp.float32)
            elif mode == "bf16":
                wv = q.astype(jnp.bfloat16) * _expand_groups(
                    sc.astype(jnp.bfloat16), g)
                acc = acc + jnp.dot(x, wv,
                                    preferred_element_type=jnp.float32)
            elif mode == "f32dot":
                wv = q.astype(jnp.float32) * _expand_groups(sc, g)
                acc = acc + jnp.dot(x_ref[:, s * sk:(s + 1) * sk
                                          ].astype(jnp.float32), wv,
                                    preferred_element_type=jnp.float32)
            elif mode == "noscale":
                # WRONG numerics: skip the scale mul+expand — bounds the
                # cost of the scaling stage
                acc = acc + jnp.dot(x, q.astype(jnp.bfloat16),
                                    preferred_element_type=jnp.float32)
            elif mode == "nounpack":
                # WRONG numerics: broadcast each packed word over its 8
                # elements (no shifts) then scale — bounds the cost of the
                # nibble unpack itself
                wv = _expand_groups(lo.astype(jnp.int32), 8).astype(
                    jnp.float32) * _expand_groups(sc, g)
                acc = acc + jnp.dot(x, wv.astype(jnp.bfloat16),
                                    preferred_element_type=jnp.float32)
            elif mode == "ghoist":
                G = sk // g
                qb = q.astype(jnp.bfloat16).reshape(G, g, tile_r)
                xb = x.reshape(Mp, G, g).swapaxes(0, 1)  # [G, Mp, g]
                part = jax.lax.dot_general(
                    xb, qb, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # [G, Mp, tile_r]
                acc = acc + jnp.sum(part * sc[:, None, :], axis=0)
        acc_ref[:] += acc

        @pl.when(k == n_k - 1)
        def _():
            out_ref[:] = acc_ref[:].astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_r, n_k),
        in_specs=[
            pl.BlockSpec((Mp, tile_k), lambda r, k, l: (0, k)),
            pl.BlockSpec((1, rows, tile_r),
                         lambda r, k, l: (l[0], r * n_k + k, 0)),
        ],
        out_specs=pl.BlockSpec((Mp, tile_r), lambda r, k, l: (0, r)),
        scratch_shapes=[pltpu.VMEM((Mp, tile_r), jnp.float32)],
    )

    kw = {}
    if mode == "dimsem":
        # r-grid steps are independent (parallel); k accumulates
        kw["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        )

    def call(x, w, l):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((Mp, qtc.rp), jnp.float32),
            **kw,
        )(jnp.asarray(l, jnp.int32).reshape(1), x, w.buf)

    return call


def make_chain(call, reps, qtc):
    E = K

    @jax.jit
    def chain(x, w):
        def body(h, i):
            y = call(h, w, i % L)
            h = h + y[:, :E] * 1e-6
            h = h / (jnp.max(jnp.abs(h)) + 1.0)
            return h.astype(jnp.bfloat16), None

        h, _ = jax.lax.scan(body, x, jnp.arange(L * reps, dtype=jnp.int32))
        return h

    return chain


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=7)
    ap.add_argument("--modes", default="base,bf16,f32dot,ghoist,stream")
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", flush=True)
    qtc, nbytes = build()
    modes = args.modes.split(",")
    chains = {
        m: {r: make_chain(make_call(qtc, m), r, qtc) for r in (SHORT, LONG)}
        for m in modes
    }
    x = jnp.ones((8, K), jnp.bfloat16)
    ref = None
    for m, cs in chains.items():
        t0 = time.perf_counter()
        for r, c in cs.items():
            out = np.asarray(c(x, qtc))
        print(f"compiled {m} in {time.perf_counter()-t0:.1f}s", flush=True)
        if m == "base":
            ref = out
        elif ref is not None and m not in ("stream",):
            err = np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9)
            print(f"  {m}: rel err vs base {err:.2e}", flush=True)

    results = {m: {SHORT: [], LONG: []} for m in modes}
    order = list(modes)
    for rnd in range(args.rounds):
        for m in order:
            for r in (SHORT, LONG):
                t0 = time.perf_counter()
                float(chains[m][r](x, qtc)[0, 0])
                results[m][r].append(time.perf_counter() - t0)
        order = order[1:] + order[:1]
        print(f"round {rnd+1}/{args.rounds}", flush=True)

    print(f"\n{'mode':8} {'us/it(marg)':>12} {'GB/s(marg)':>11}")
    for m in modes:
        ts = statistics.median(results[m][SHORT])
        tl = statistics.median(results[m][LONG])
        marg = (tl - ts) / ((LONG - SHORT) * L)
        print(f"{m:8} {marg*1e6:12.1f} {nbytes/marg/1e9:11.1f}", flush=True)


if __name__ == "__main__":
    main()
