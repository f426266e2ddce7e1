"""Run only the paged bench sections (new heads-batched kernel) on chip."""
import gc
import sys

sys.path.insert(0, "/root/repo")
import os
os.chdir("/root/repo")

import bench

bench.ensure_checkpoint()
model = bench.load_model()
if model is None:
    raise SystemExit("load failed")
qbw = bench.probe_qstream_bw(model.params)
bench.note(f"qstream probe: {qbw/1e9:.0f} GB/s")
bench.paged_serve_bench(model, None)
del model
gc.collect()
bench.paged_mpt_bench(qbw)
