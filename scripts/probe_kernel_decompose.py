"""Decompose the fused q4_0 kernel's time: DMA vs unpack vs dequant vs dot.

Runs four Pallas variants over the SAME packed planes, same grid/tiles as
the production kernel at decode shape (M=8, K=R=4096, stacked L=4):

  stream   tiles are DMA'd and reduced with one cheap max (pure memory)
  unpack   + bit unpack to int32 (VPU shifts)
  dequant  + f32 convert + group-scale multiply + bf16 cast (full VPU)
  full     + MXU dot (the production kernel body)

Reported as packed GB/s each; the deltas locate the bottleneck.
Run: python -u scripts/probe_kernel_decompose.py [tile_r tile_k]
"""

import os
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llm_tpu.ggml.quant import quantize
from llm_tpu.ggml.types import GgmlType
from llm_tpu.ops.packing import (QuantTensor, expand_f16x2, pack_ggml,
                                 unpack_plane, _expand_groups)

K = R = 4096
L, REPS = 4, 64


def build():
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((R, K)) * 0.02).astype(np.float32)
    qt = pack_ggml(GgmlType.Q4_0, quantize(GgmlType.Q4_0, w), (K, R))

    def st(p):
        return None if p is None else jnp.stack([p] * L)

    return QuantTensor(qt.fmt_name, qt.k, qt.r, st(qt.lo), st(qt.hi),
                       st(qt.scale), st(qt.bias))


def make_probe(variant: str, n_k: int, g_rows: int):
    def kernel(l_ref, x_ref, lo_ref, scale_ref, out_ref, acc_ref):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        lo = lo_ref[0]
        scale = scale_ref[0]
        if variant == "stream":
            # one cheap reduce so the DMA isn't dead code
            acc_ref[:] += (lo[0, :8].astype(jnp.int32).max().astype(
                jnp.float32) + scale[0, :8].astype(jnp.int32).max().astype(
                jnp.float32))
        else:
            q = unpack_plane(lo, 4, signed=True)
            if variant == "unpack":
                acc_ref[:] += (q[0, :8].max().astype(jnp.float32)
                               + scale[0, :8].astype(jnp.int32).max()
                               .astype(jnp.float32))
            else:
                w = q.astype(jnp.float32) * _expand_groups(
                    expand_f16x2(scale), 32)
                w = w.astype(jnp.bfloat16)
                if variant == "dequant":
                    acc_ref[:] += w[0, :8].astype(jnp.float32).max()
                else:  # full
                    x = x_ref[:].astype(jnp.bfloat16)
                    acc_ref[:] += jnp.dot(
                        x, w, preferred_element_type=jnp.float32)

        @pl.when(k == n_k - 1)
        def _():
            out_ref[:] = acc_ref[:]

    return kernel


@partial(jax.jit, static_argnames=("variant", "tile_r", "tile_k"))
def run_chain(x, sq, variant="full", tile_r=512, tile_k=2048):
    Mp = 8
    pw = 8  # q4_0: 8 nibbles per uint32
    n_r, n_k = R // tile_r, K // tile_k
    g_rows = tile_k // 32 // 2  # packed f16 scales

    kernel = make_probe(variant, n_k, g_rows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_r, n_k),
        in_specs=[
            pl.BlockSpec((Mp, tile_k), lambda r, k, l: (0, k)),
            pl.BlockSpec((1, tile_k // pw, tile_r), lambda r, k, l: (l[0], k, r)),
            pl.BlockSpec((1, g_rows, tile_r), lambda r, k, l: (l[0], k, r)),
        ],
        out_specs=pl.BlockSpec((Mp, tile_r), lambda r, k, l: (0, r)),
        scratch_shapes=[pltpu.VMEM((Mp, tile_r), jnp.float32)],
    )
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, R), jnp.float32),
    )

    def body(h, i):
        y = call((i % L).reshape(1), h, sq.lo, sq.scale)
        h = h + y[:, :K] * 1e-6
        h = h / (jnp.max(jnp.abs(h)) + 1.0)
        return h, None

    h, _ = jax.lax.scan(body, x, jnp.arange(L * REPS, dtype=jnp.int32))
    return h


def main():
    tile_r = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    tile_k = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    sq = build()
    nbytes = sq.lo.nbytes // L + sq.scale.nbytes // L
    x = jnp.ones((8, K), jnp.float32)
    for variant in ("stream", "unpack", "dequant", "full"):
        f = lambda: float(run_chain(x, sq, variant, tile_r, tile_k)[0, 0])
        f()
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            f()
            times.append(time.perf_counter() - t0)
        rate = REPS * L * nbytes / min(times)
        print(f"{variant:8s} tile=({tile_r},{tile_k}): {rate/1e9:6.1f} GB/s",
              flush=True)


if __name__ == "__main__":
    main()
