"""Diagnose the packed-load path: where do the seconds go?

BENCH_MATRIX recorded llama7b_q4_0_load_packed at ~80 s vs ~29 s for the
COLD load — the cache exists to be faster, so something in the packed path
is pathological. This probe times each stage separately on the real chip:

  1. cold load (container parse + native transcode + device_put)
  2. pack write
  3. packed load, split into: np.load (disk/page-cache) per leaf vs
     jnp.asarray host->device transfer per leaf, plus the manifest walk.

Run: python scripts/probe_pack_load.py
"""

import gc
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

CKPT = "/tmp/llm_tpu_bench/llama7b_q4_0.bin"


def main() -> None:
    from llm_tpu.loader import ModelParameters, load
    from llm_tpu.models.pack_cache import (
        cache_key, load_packed_params, pack_path, save_packed_params,
    )

    assert os.path.exists(CKPT), "run bench.ensure_checkpoint first"
    pp = pack_path(CKPT)

    # --- stage 1: cold load
    os.environ["LLM_TPU_PACK_CACHE"] = "0"
    try:
        t0 = time.time()
        model = load(CKPT, "llama", params=ModelParameters(context_size=2048))
        jax.block_until_ready(model.params.layers.wq.lo)
        cold_s = time.time() - t0
    finally:
        os.environ.pop("LLM_TPU_PACK_CACHE", None)
    print(f"cold load: {cold_s:.1f}s", flush=True)

    # --- stage 2: pack write (re-pack when the existing pack is stale —
    # compare the manifest key only; a full load_packed_params here would
    # read+upload the whole multi-GB pack just to answer yes/no)
    def _pack_fresh() -> bool:
        try:
            manifest = json.loads((pp / "manifest.json").read_text())
        except (OSError, ValueError):
            return False
        return manifest.get("key") == cache_key(CKPT)

    if not _pack_fresh():
        t0 = time.time()
        save_packed_params(model.params, pp, cache_key(CKPT))
        print(f"pack write: {time.time() - t0:.1f}s", flush=True)
    del model
    gc.collect()

    # --- stage 3: prime page cache, then split the packed load
    t0 = time.time()
    for f in sorted(pp.glob("*.npy")):
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass
    print(f"prime: {time.time() - t0:.1f}s", flush=True)

    # 3a: np.load only (no device transfer)
    t0 = time.time()
    hosted = []
    total = 0
    for f in sorted(pp.glob("*.npy")):
        a = np.load(f)
        total += a.nbytes
        hosted.append(a)
    readonly_s = time.time() - t0
    print(f"np.load all ({total/1e9:.2f} GB host): {readonly_s:.1f}s",
          flush=True)

    # 3b: device transfer only (host arrays already resident)
    t0 = time.time()
    dev = [jnp.asarray(a) for a in hosted]
    jax.block_until_ready(dev)
    xfer_s = time.time() - t0
    print(f"jnp.asarray all: {xfer_s:.1f}s "
          f"({total/1e9/xfer_s:.2f} GB/s)", flush=True)
    del dev, hosted
    gc.collect()

    # 3c: the production packed load end to end
    t0 = time.time()
    params = load_packed_params(pp, cache_key(CKPT))
    assert params is not None
    jax.block_until_ready(params.layers.wq.lo)
    packed_s = time.time() - t0
    print(f"packed load (production): {packed_s:.1f}s", flush=True)
    del params
    gc.collect()

    print(json.dumps({
        "cold_s": round(cold_s, 1),
        "read_s": round(readonly_s, 1),
        "xfer_s": round(xfer_s, 1),
        "packed_s": round(packed_s, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
