"""On-chip spot check of the prefix-cache warm TTFT (exact-hit path).

Loads the bench 7B Q4_0 checkpoint directly (not through bench.load_model,
so the recorded load metric is untouched) and runs ONLY the prefix-cache
TTFT section; emit() merges the refreshed metric into BENCH_MATRIX.json.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


def main() -> None:
    from llm_tpu.loader import ModelParameters, load

    bench.ensure_checkpoint()
    model = load(
        bench.CKPT, "llama", params=ModelParameters(context_size=bench.CTX)
    )
    bench.prefix_cache_ttft_bench(model)


if __name__ == "__main__":
    main()
