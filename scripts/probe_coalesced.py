"""A/B the coalesced single-DMA layout against the production plane kernel.

Round-5 experiment (VERDICT #1): the plane kernel issues 2-3 strided block
DMAs per grid step; the coalesced layout (QuantTensorC) stores each (r, k)
weight block as one linear HBM span so each step is ONE contiguous burst.
Methodology per docs/roadmap.md: interleave variants in one process,
medians-of-many rounds, and report the MARGINAL rate ((t_long - t_short) /
extra work) so the ~28 ms dispatch RTT and scan fixed costs cancel.

Variants at 7B FFN geometry, stacked over L layers (the production decode
call shape):
  plane      production _qmatmul_pallas_stacked, default tiles
  coal2048   coalesced tile_k=2048 (or largest legal), one DMA per step
  coalK      coalesced whole-K single k-step (sub-sliced dequant)
  dense      bf16 matmul, same logical shape (the chip-rate denominator)

Run: python -u scripts/probe_coalesced.py [--shape down] [--rounds N]
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

from llm_tpu.ggml.quant import quantize
from llm_tpu.ggml.types import GgmlType
import importlib

from llm_tpu.ops.packing import QuantTensor, coalesce_qt, pack_ggml

qm = importlib.import_module("llm_tpu.ops.qmatmul")

L = 4
SHORT, LONG = 48, 96  # chain reps (x L iterations each)


def build(K, R):
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((R, K)) * 0.02).astype(np.float32)
    raw = quantize(GgmlType.Q4_0, w)
    qt = pack_ggml(GgmlType.Q4_0, raw, (K, R))
    # wide-lane variants need R padded to 512/1024 multiples (2.3% extra
    # bytes at R=11008 -> 11264): round-5 follow-up after the coalesced
    # 1-DMA layout measured EQUAL to the plane kernel (the DMA-pattern
    # hypothesis is dead; per-grid-step overhead is the new suspect, so
    # try FEWER, BIGGER steps)
    qt_w = pack_ggml(GgmlType.Q4_0, raw, (K, R), r_multiple=1024)

    def st(p):
        return None if p is None else jnp.stack([p] * L)

    def stack_qt(q):
        return QuantTensor(q.fmt_name, q.k, q.r, st(q.lo), st(q.hi),
                           st(q.scale), st(q.bias))

    sq = stack_qt(qt)
    sq_w = stack_qt(qt_w)
    plane_bytes = sum(
        p.nbytes for p in (qt.lo, qt.hi, qt.scale, qt.bias) if p is not None
    )

    from llm_tpu.ops.packing import coalesced_seg_rows

    Kp, Rp = qt.k_padded, qt.r_padded
    tk_def, tr_def, _ = qm.coalesce_tiles(qt.fmt, Kp, Rp, qt.scale_packed)
    tk_small = next(
        tk for tk in range(min(2048, Kp), 63, -64)
        if Kp % tk == 0 and all(
            s % 8 == 0
            for s in coalesced_seg_rows(qt.fmt, tk, qt.scale_packed) if s)
    )
    tiles = {"coal2048": (sq, tk_small, tr_def)}
    if tk_def != tk_small:
        tiles["coalK"] = (sq, tk_def, tr_def)
    for tr in (512, 1024):
        if qt_w.r_padded % tr == 0:
            tiles[f"c_r{tr}"] = (sq_w, tk_small, tr)
    if qt_w.k_padded == Kp:  # whole-K + wide lanes: fewest steps of all
        tiles["cK_r512"] = (sq_w, Kp, 512)

    qtcs = {name: coalesce_qt(s, tk, tr)
            for name, (s, tk, tr) in tiles.items()}
    wd = jax.random.normal(jax.random.PRNGKey(1), (L, Kp, Rp), jnp.bfloat16)
    return qt, sq, qtcs, wd, plane_bytes, Kp, Rp


def make_stream_chain(qtc, reps, E):
    """Stream-ONLY kernel over a coalesced buffer: identical grid/blocks
    to the real kernel but the body just reduces the block (1 VPU add per
    element, no unpack/dequant/dot). Separates DMA from compute at the
    production tile size."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows = sum(qtc.seg_rows)
    n_r, n_k = qtc.rp // qtc.tile_r, qtc.kp // qtc.tile_k
    tile_r = qtc.tile_r
    Mp = 8

    def kernel(l_ref, x_ref, buf_ref, out_ref, acc_ref):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        # Mosaic has no uint32->f32 cast; reduce in int32 then convert.
        # (And scalar extracts must be 32-bit: cast x's block before [0,0].)
        s = jnp.sum(buf_ref[0].astype(jnp.int32), axis=0).astype(jnp.float32)
        acc_ref[:] += s[None, :] * 1e-30 + x_ref[:].astype(jnp.float32)[0, 0]

        @pl.when(k == n_k - 1)
        def _():
            out_ref[:] = acc_ref[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_r, n_k),
        in_specs=[
            pl.BlockSpec((Mp, qtc.tile_k), lambda r, k, l: (0, k)),
            pl.BlockSpec((1, rows, tile_r),
                         lambda r, k, l: (l[0], r * n_k + k, 0)),
        ],
        out_specs=pl.BlockSpec((Mp, tile_r), lambda r, k, l: (0, r)),
        scratch_shapes=[pltpu.VMEM((Mp, tile_r), jnp.float32)],
    )

    def call(x, w, l):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((Mp, qtc.rp), jnp.float32),
        )(jnp.asarray(l, jnp.int32).reshape(1),
          jnp.pad(x, ((0, 0), (0, qtc.kp - x.shape[1]))).astype(jnp.bfloat16)
          if x.shape[1] != qtc.kp else x.astype(jnp.bfloat16), w.buf)

    @jax.jit
    def chain(x, w):
        def body(h, i):
            y = call(h, w, i % L)
            h2 = y[:, :E] if y.shape[1] >= E else jnp.pad(
                y, ((0, 0), (0, E - y.shape[1])))
            h = h + h2 * 1e-6
            h = h / (jnp.max(jnp.abs(h)) + 1.0)
            return h, None

        h, _ = jax.lax.scan(body, x, jnp.arange(L * reps, dtype=jnp.int32))
        return h

    return chain


def make_chains(K, R, sq, qtcs, wd, Kp, Rp):
    E = K

    def mk(call, reps):
        # weights ride as ARGUMENTS: a closure would bake them into the
        # program as multi-hundred-MB constants, which blows the tunnel
        # compile service's request-size limit (HTTP 413, observed) and
        # distorts compile time
        @jax.jit
        def chain(x, w):
            def body(h, i):
                y = call(h, w, i % L)
                h2 = y[:, :E] if y.shape[1] >= E else jnp.pad(
                    y, ((0, 0), (0, E - y.shape[1])))
                h = h + h2 * 1e-6
                h = h / (jnp.max(jnp.abs(h)) + 1.0)
                return h, None

            h, _ = jax.lax.scan(body, x,
                                jnp.arange(L * reps, dtype=jnp.int32))
            return h

        return chain

    chains = {}
    weights = {"plane": sq, "dense": wd, **qtcs}
    chains["plane"] = {
        r: mk(lambda h, w, l: qm._qmatmul_pallas_stacked(h, w, l), r)
        for r in (SHORT, LONG)
    }
    for name in qtcs:
        chains[name] = {
            r: mk(lambda h, w, l: qm._qmatmul_pallas_c_stacked(h, w, l), r)
            for r in (SHORT, LONG)
        }

    def dense_call(h, w, l):
        if h.shape[1] != Kp:
            h = jnp.pad(h, ((0, 0), (0, Kp - h.shape[1])))
        return jnp.dot(h.astype(jnp.bfloat16), w[l],
                       preferred_element_type=jnp.float32)

    chains["dense"] = {r: mk(dense_call, r) for r in (SHORT, LONG)}
    for name in list(qtcs):
        sname = f"{name}_stream"
        chains[sname] = {
            r: make_stream_chain(qtcs[name], r, E) for r in (SHORT, LONG)
        }
        weights[sname] = qtcs[name]
    return chains, weights


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="up", choices=["up", "down"])
    ap.add_argument("--rounds", type=int, default=7)
    ap.add_argument(
        "--variants",
        default="plane,coal2048,coalK,c_r512,c_r1024,cK_r512,dense",
    )
    args = ap.parse_args()
    K, R = (4096, 11008) if args.shape == "up" else (11008, 4096)

    print(f"devices: {jax.devices()}", flush=True)
    qt, sq, qtcs, wd, plane_bytes, Kp, Rp = build(K, R)
    for name, qtc in qtcs.items():
        print(f"{name}: tile=({qtc.tile_k},{qtc.tile_r}) "
              f"buf={qtc.buf.nbytes/1e6:.1f}MB "
              f"grid=({qtc.rp//qtc.tile_r},{qtc.kp//qtc.tile_k})", flush=True)
    chains, weights = make_chains(K, R, sq, qtcs, wd, Kp, Rp)
    keep = set(args.variants.split(","))
    chains = {n: c for n, c in chains.items() if n in keep}

    x = jnp.ones((8, K), jnp.float32)
    # compile everything first
    for name, cs in chains.items():
        t0 = time.perf_counter()
        for r, c in cs.items():
            float(c(x, weights[name])[0, 0])
        print(f"compiled {name} in {time.perf_counter()-t0:.1f}s", flush=True)

    bytes_per = {n: plane_bytes for n in chains}
    bytes_per["dense"] = Kp * Rp * 2

    results = {n: {SHORT: [], LONG: []} for n in chains}
    names = list(chains)
    for rnd in range(args.rounds):
        for name in names:
            for r in (SHORT, LONG):
                t0 = time.perf_counter()
                float(chains[name][r](x, weights[name])[0, 0])
                results[name][r].append(time.perf_counter() - t0)
        names = names[1:] + names[:1]  # rotate order
        print(f"round {rnd+1}/{args.rounds} done", flush=True)

    print(f"\nshape K={K} R={R} (padded {Kp}x{Rp}), L={L}, "
          f"marginal over {(LONG-SHORT)*L} iters")
    print(f"{'variant':10} {'MB/it':>7} {'us/it(sust)':>12} "
          f"{'GB/s(sust)':>11} {'us/it(marg)':>12} {'GB/s(marg)':>11}")
    dense_marg = None
    rows = []
    for name in chains:
        ts = statistics.median(results[name][SHORT])
        tl = statistics.median(results[name][LONG])
        sust = tl / (LONG * L)
        marg = (tl - ts) / ((LONG - SHORT) * L)
        nb = bytes_per[name]
        rows.append((name, nb, sust, marg))
        if name == "dense":
            dense_marg = nb / marg / 1e9
        print(f"{name:10} {nb/1e6:7.1f} {sust*1e6:12.1f} "
              f"{nb/sust/1e9:11.1f} {marg*1e6:12.1f} {nb/marg/1e9:11.1f}",
              flush=True)
    if dense_marg:
        print("\nratios vs dense (marginal):")
        for name, nb, sust, marg in rows:
            if name != "dense":
                print(f"  {name:10} {nb/marg/1e9/dense_marg:.3f}")


if __name__ == "__main__":
    main()
