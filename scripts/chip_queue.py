"""On-chip measurement queue (run when the TPU tunnel is up).

Stages (default all):
  correctness  paged kernel on-chip: PagedEngine decode with the Mosaic
               kernel vs the jnp page-scan (xla) path, must match.
  paged        paged bench sections (heads-batched kernel): paged-serve-64
               + MPT-8K (scripts/bench_paged.py).
  serve8       serve-8 A/B: dense branch vs LLM_TPU_ONLINE_DECODE=1.
  xres         decode A/B of the VMEM-resident x path (LLM_TPU_X_RES_MB=2)
               -> flip the _x_resident default in ops/qmatmul.py if faster.
  subk         decode A/B of the sub-K-sliced full-K tiles
               (LLM_TPU_SUB_K=2048) -> adopt in tile prefs if faster.
  formats      scripts/chip_formats.py: all 10 quant formats at real dims.
Run: python -u scripts/chip_queue.py [stage]
"""
import gc
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

stage = sys.argv[1] if len(sys.argv) > 1 else "all"


def correctness():
    import jax.numpy as jnp
    from llm_tpu.loader import ModelParameters, load
    from llm_tpu.paged import PagedEngine
    from llm_tpu.samplers import DeterministicSampler
    from llm_tpu.serve import GenerationRequest
    from llm_tpu.testing import make_tiny_file

    path = "/tmp/chipq_mpt128.bin"
    if not os.path.exists(path):
        make_tiny_file("mpt", path, n_embd=512)
    model = load(path, "mpt", params=ModelParameters(context_size=64))

    def run(mode):
        os.environ["LLM_TPU_KERNELS"] = mode
        engine = PagedEngine(model, max_streams=2, page_size=16,
                             kv_dtype="int8")
        out = engine.generate_all(
            [GenerationRequest(prompt=[2, 3, 4], max_tokens=8,
                               sampler=DeterministicSampler())]
        )[0]
        os.environ.pop("LLM_TPU_KERNELS", None)
        return out

    ref = run("xla")
    got = run("pallas")  # Mosaic kernel on chip
    print(f"paged kernel on-chip: ref={ref!r} got={got!r} "
          f"match={ref == got}", flush=True)
    assert ref == got


if stage in ("all", "correctness"):
    correctness()
    gc.collect()

if stage in ("all", "paged"):
    subprocess.run([sys.executable, "-u", "scripts/bench_paged.py"], check=False)

if stage in ("all", "serve8"):
    print("== serve8 baseline (dense branch) ==", flush=True)
    subprocess.run([sys.executable, "-u", "scripts/profile_serve8.py"],
                   check=False)
    print("== serve8 online-forced ==", flush=True)
    env = dict(os.environ, LLM_TPU_ONLINE_DECODE="1")
    subprocess.run([sys.executable, "-u", "scripts/profile_serve8.py"],
                   check=False, env=env)


def _decode_rate(env_extra: dict) -> float:
    """LLaMA-7B-geometry Q4_0 stacked-scan decode probe under env_extra,
    in a subprocess (env vars are read at trace time)."""
    code = (
        "import sys; sys.path.insert(0, '/root/repo');"
        "import scripts.chip_formats as cf;"
        "print('RATE', cf.stacked_rate('q4_0'))"
    )
    import subprocess as sp
    r = sp.run([sys.executable, "-c", code],
               env=dict(os.environ, **env_extra), capture_output=True,
               text=True, timeout=1200)
    for line in r.stdout.splitlines():
        if line.startswith("RATE"):
            return float(line.split()[1])
    print(r.stdout[-2000:], r.stderr[-2000:])
    raise SystemExit("probe failed")


if stage in ("all", "xres"):
    base = _decode_rate({"LLM_TPU_X_RES_MB": "0"})
    res = _decode_rate({"LLM_TPU_X_RES_MB": "2"})
    print(f"x-resident A/B: base={base/1e9:.1f} GB/s res={res/1e9:.1f} GB/s",
          flush=True)

if stage in ("all", "subk"):
    base = _decode_rate({})
    subk = _decode_rate({"LLM_TPU_SUB_K": "2048"})
    print(f"sub-K A/B: base={base/1e9:.1f} GB/s subk={subk/1e9:.1f} GB/s",
          flush=True)

if stage in ("all", "formats"):
    subprocess.run([sys.executable, "-u", "scripts/chip_formats.py"],
                   check=False)
