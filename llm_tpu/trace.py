"""Tracing and timing instrumentation.

The reference instruments its hot entry points with the `tracing` crate
(#[instrument] on feed_prompt/infer_next_token/infer,
inference_session.rs:298,380,433; subscriber to stderr in
binaries/llm-cli/src/main.rs:18-22). Here:

- `span(name)`: context manager logging wall-clock durations to stderr when
  LLM_TPU_TRACE is set (1 = spans; 2 = also per-evaluate device timings).
- `annotate(name)`: jax.profiler.TraceAnnotation passthrough so spans show
  up in XLA device profiles.
- `profile(path)`: wraps jax.profiler.trace for capturing a TPU trace that
  can be opened in TensorBoard/XProf.

Counters beyond InferenceStats live host-side in Span.accumulate.
"""

from __future__ import annotations

import contextlib
import os
import sys
import time
from collections import defaultdict
from typing import Iterator

_LEVEL = int(os.environ.get("LLM_TPU_TRACE", "0") or "0")

totals: dict[str, float] = defaultdict(float)
counts: dict[str, int] = defaultdict(int)


def enabled(level: int = 1) -> bool:
    return _LEVEL >= level


def set_level(level: int) -> None:
    global _LEVEL
    _LEVEL = level


@contextlib.contextmanager
def span(name: str, level: int = 1) -> Iterator[None]:
    """Timed span; logs to stderr at LLM_TPU_TRACE >= level and accumulates
    totals/counts either way (cheap)."""
    t0 = time.perf_counter()
    try:
        try:
            import jax.profiler

            ctx = jax.profiler.TraceAnnotation(name)
        except Exception:
            ctx = contextlib.nullcontext()
        with ctx:
            yield
    finally:
        dt = time.perf_counter() - t0
        totals[name] += dt
        counts[name] += 1
        if _LEVEL >= level:
            print(f"[trace] {name}: {dt * 1e3:.2f} ms", file=sys.stderr)


@contextlib.contextmanager
def profile(log_dir: str) -> Iterator[None]:
    """Capture an XLA device profile (open with xprof/TensorBoard)."""
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def report() -> str:
    """Accumulated span totals, reference InferenceStats style."""
    lines = []
    for name in sorted(totals):
        n = counts[name]
        tot = totals[name]
        lines.append(
            f"{name}: total {tot * 1e3:.1f} ms, calls {n}, "
            f"mean {tot / n * 1e3:.2f} ms"
        )
    return "\n".join(lines)


def reset() -> None:
    totals.clear()
    counts.clear()
