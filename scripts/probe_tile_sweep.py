"""Tile/sub-K sweep of the stacked q4_0 kernel at 7B FFN geometry.

Each config runs in a fresh subprocess (LLM_TPU_SUB_K is read at trace
time, and jit caches key on tile args only). Reports MB/step, us/step and
GB/s; the marginal-rate model is time = fixed + bytes/BW, so compare
configs at EQUAL geometry.

Run: python -u scripts/probe_tile_sweep.py
"""

import os
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

CHILD = r"""
import sys, time, os
sys.path.insert(0, {root!r})
import jax, jax.numpy as jnp, numpy as np
from llm_tpu.ggml.types import GgmlType
from llm_tpu.ggml.quant import quantize
from llm_tpu.ops.packing import pack_ggml, QuantTensor
from llm_tpu.ops.qmatmul import _qmatmul_pallas_stacked
os.environ['LLM_TPU_KERNELS'] = 'pallas'

K, R, L, reps = {K}, {R}, 4, 48
rng = np.random.default_rng(0)
w = (rng.standard_normal((R, K)) * 0.02).astype(np.float32)
qt = pack_ggml(GgmlType.Q4_0, quantize(GgmlType.Q4_0, w), (K, R))
st = lambda p: None if p is None else jnp.stack([p]*L)
sq = QuantTensor(qt.fmt_name, qt.k, qt.r, st(qt.lo), st(qt.hi), st(qt.scale), st(qt.bias))

@jax.jit
def chain(x):
    def body(h, i):
        y = _qmatmul_pallas_stacked(x if False else h, sq, i % L,
                                    tile_r={tile_r}, tile_k={tile_k})
        h2 = y[:, :K] if R >= K else jnp.pad(y, ((0,0),(0, K - R)))
        h = h + h2*1e-6
        h = h / (jnp.max(jnp.abs(h)) + 1.0)
        return h, None
    h, _ = jax.lax.scan(body, x, jnp.arange(L*reps, dtype=jnp.int32))
    return h

x = jnp.ones((8, K), jnp.float32)
try:
    float(chain(x)[0,0])
except Exception as e:
    print('LOWERFAIL', type(e).__name__, str(e)[:120].replace(chr(10), ' '))
    raise SystemExit(0)
ts = []
for _ in range(3):
    t0 = time.perf_counter(); float(chain(x)[0,0]); ts.append(time.perf_counter()-t0)
nb = qt.lo.nbytes + qt.scale.nbytes
dt = min(ts)/(L*reps)
print(f'RESULT {{nb/1e6:.1f}} {{dt*1e6:.1f}} {{nb/dt/1e9:.1f}}')
"""


def run(K, R, tile_r, tile_k, sub_k=0):
    env = dict(os.environ)
    if sub_k:
        env["LLM_TPU_SUB_K"] = str(sub_k)
    else:
        env.pop("LLM_TPU_SUB_K", None)
    code = CHILD.format(root=str(Path(__file__).resolve().parents[1]),
                        K=K, R=R, tile_r=tile_r, tile_k=tile_k)
    r = subprocess.run([sys.executable, "-u", "-c", code], env=env,
                       capture_output=True, text=True, timeout=600)
    for line in r.stdout.splitlines():
        if line.startswith("RESULT"):
            _, mb, us, gbs = line.split()
            print(f"K={K} R={R} tile=({tile_r},{tile_k}) sub_k={sub_k}: "
                  f"{mb} MB/step {us} us/step {gbs} GB/s", flush=True)
            return float(gbs)
        if line.startswith("LOWERFAIL"):
            print(f"K={K} R={R} tile=({tile_r},{tile_k}) sub_k={sub_k}: "
                  f"{line}", flush=True)
            return None
    print(f"K={K} R={R} tile=({tile_r},{tile_k}) sub_k={sub_k}: no output\n"
          + r.stdout[-500:] + r.stderr[-500:], flush=True)
    return None


def main():
    K, R = 4096, 11008
    cfgs = [
        (512, 2048, 0),      # current default
        (1024, 2048, 0),
        (1024, 2048, 2048),
        (2048, 2048, 2048),
        (2752, 4096, 2048),  # R/4 divides 11008
        (1024, 4096, 2048),
        (512, 4096, 2048),
    ]
    for tr, tk, sk in cfgs:
        run(K, R, tr, tk, sk)


if __name__ == "__main__":
    main()
