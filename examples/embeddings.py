"""Embedding extraction + cosine similarity — the analog of
/root/reference/crates/llm/examples/embeddings.rs.

Usage: python examples/embeddings.py <architecture> <model_path> [query]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import llm_tpu


def get_embeddings(model, text: str) -> np.ndarray:
    session = model.start_session()
    req = llm_tpu.OutputRequest(embeddings=[])
    session.feed_prompt(text, output_request=req)
    emb = np.asarray(req.embeddings, np.float32).reshape(-1, model.spec.n_embd)
    return emb[-1]  # embedding of the final token


def cosine(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit("usage: embeddings.py <architecture> <model_path> [query]")
    architecture, model_path = sys.argv[1], sys.argv[2]
    query = sys.argv[3] if len(sys.argv) > 3 else "My favourite animal is the dog"
    comparands = sys.argv[4:] or [
        "My favourite animal is the dog",
        "I have just adopted a cute dog",
        "My favourite animal is the cat",
    ]

    model = llm_tpu.load(model_path, architecture)
    query_emb = get_embeddings(model, query)
    print(f"Query: {query}")
    for text in comparands:
        sim = cosine(query_emb, get_embeddings(model, text))
        print(f"  {sim:+.4f}  {text}")


if __name__ == "__main__":
    main()
