"""Basic inference example — the analog of
/root/reference/crates/llm/examples/inference.rs.

Usage: python examples/inference.py <architecture> <model_path> [prompt]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import llm_tpu


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit("usage: inference.py <architecture> <model_path> [prompt]")
    architecture, model_path = sys.argv[1], sys.argv[2]
    prompt = sys.argv[3] if len(sys.argv) > 3 else "Rust is a cool programming language because"

    model = llm_tpu.load(
        model_path,
        architecture,
        params=llm_tpu.ModelParameters(context_size=2048),
        progress=lambda ev: print(f"load: {ev.kind}", file=sys.stderr)
        if ev.kind != "tensor_loaded"
        else None,
    )

    session = model.start_session()
    stats = session.infer(
        llm_tpu.InferenceRequest(prompt=prompt, maximum_token_count=64),
        rng=np.random.default_rng(42),
        callback=lambda r: (
            print(r.text, end="", flush=True)
            if r.kind in ("prompt_token", "inferred_token")
            else None
        ),
    )
    print(f"\n\nInference stats:\n{stats}")


if __name__ == "__main__":
    main()
