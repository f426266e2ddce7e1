"""Warm-TTFT breakdown for the prefix-cache exact-hit path (VERDICT r4
item 7): what of the warm TTFT is admission, host sampling, dispatch
enqueue, and the (now overlapped) device round-trip?

Loads the bench 7B Q4_0 checkpoint, primes the prefix cache with a
512-token prompt, then measures:
  - bare decode-step p50 on the primed engine (dispatch + force)
  - warm TTFT (bench methodology: first on_token callback)
  - the same with the callback timestamped against the step dispatch

Run: python -u scripts/probe_warm_ttft_breakdown.py
"""

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import bench  # noqa: E402


def main() -> None:
    from llm_tpu.loader import ModelParameters, load
    from llm_tpu.paged import PagedEngine
    from llm_tpu.samplers import GreedySampler
    from llm_tpu.serve import GenerationRequest

    bench.ensure_checkpoint()
    model = load(
        bench.CKPT, "llama", params=ModelParameters(context_size=bench.CTX)
    )

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

    ttft([3, 4, 5])  # compile warm-up
    cold = min(ttft(prompt), ttft([int(t) + 1 for t in prompt]))
    warms = [ttft(prompt) for _ in range(7)]
    warm = statistics.median(warms)
    print(f"cold TTFT: {cold:.1f} ms")
    print(f"warm TTFT p50: {warm:.1f} ms (runs: "
          + " ".join(f"{w:.0f}" for w in warms) + ")")

    # bare decode-step cost on the primed engine (the step the TTFT path
    # no longer waits for): run a longer generation and time step()
    rid = engine.submit(GenerationRequest(
        prompt=prompt, max_tokens=24, sampler=GreedySampler()))
    # drain admission/prefill (exact hit -> instant)
    engine.step()
    steps = []
    while engine.has_work():
        t0 = time.perf_counter()
        engine.step()
        steps.append(time.perf_counter() - t0)
    del rid
    if steps:
        print(f"bare decode step p50: "
              f"{statistics.median(steps) * 1e3:.1f} ms "
              f"(n={len(steps)}) — the old pre-overlap TTFT floor")


if __name__ == "__main__":
    main()
