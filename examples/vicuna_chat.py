"""Manual chat loop example — the analog of
/root/reference/crates/llm/examples/vicuna-chat.rs: a persona prelude and
per-message prefixes, with `conversation_inference_callback` scanning for the
stop sequence.

Usage: python examples/vicuna_chat.py <architecture> <model_path>
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import llm_tpu
from llm_tpu.session import conversation_inference_callback


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit("usage: vicuna_chat.py <architecture> <model_path>")
    architecture, model_path = sys.argv[1], sys.argv[2]

    model = llm_tpu.load(model_path, architecture)
    session = model.start_session()

    character_name = "### Assistant"
    user_name = "### Human"
    persona = "A chat between a human and an assistant."
    history = (
        f"{character_name}: Hello - How may I help you today?\n"
        f"{user_name}: What is the capital of France?\n"
        f"{character_name}: Paris is the capital of France.\n"
    )
    session.feed_prompt(
        f"{persona}\n{history}",
        callback=lambda b: print(b.decode("utf-8", "replace"), end="", flush=True),
    )

    rng = np.random.default_rng()
    params = llm_tpu.InferenceParameters()
    while True:
        try:
            line = input(f"{user_name}: ")
        except EOFError:
            break
        session.feed_prompt(f"{user_name}: {line}\n{character_name}:")
        cb = conversation_inference_callback(
            f"{user_name}:", lambda t: print(t, end="", flush=True)
        )
        print(f"{character_name}:", end="", flush=True)
        while True:
            try:
                token = session.infer_next_token(rng, params)
            except llm_tpu.InferenceError:
                break
            resp = llm_tpu.InferenceResponse(
                "inferred_token", token.decode("utf-8", "replace")
            )
            if cb(resp) is llm_tpu.InferenceFeedback.Halt:
                break
        print()


if __name__ == "__main__":
    main()
