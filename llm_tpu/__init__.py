"""llm_tpu — a TPU-native quantized-inference framework.

A brand-new JAX/XLA/Pallas implementation with the capabilities of
rustformers/llm (the reference, surveyed in SURVEY.md): loads GGML/GGJT
block-quantized checkpoints (Q4_0/Q4_1/Q5_0/Q5_1/Q8_0 and K-quants) and
serves LLaMA, GPT-2, GPT-J, GPT-NeoX, BLOOM, MPT and Falcon — designed
TPU-first: packed-integer weights dequantized on the fly in fused Pallas
matmul kernels, a static-shape bucketed decode under `jit`, and tensor
sharding over a `jax.sharding.Mesh`.

Public API parity target: the reference's `llm` facade
(/root/reference/crates/llm/src/lib.rs).
"""

__version__ = "0.1.0"

from llm_tpu.ggml.types import GgmlType, FileType, FileTypeFormat, ContainerType

__all__ = [
    "GgmlType",
    "FileType",
    "FileTypeFormat",
    "ContainerType",
    "load",
    "Model",
    "ModelParameters",
    "InferenceSession",
    "InferenceSessionConfig",
    "InferenceRequest",
    "InferenceParameters",
    "OutputRequest",
    "TokenizerSource",
    "Prompt",
    "SUPPORTED_ARCHITECTURES",
    "Engine",
    "GenerationRequest",
    "PagedEngine",
    "SpeculativeEngine",
    "SampledSpeculativeEngine",
    "PagedSpeculativeEngine",
    "PagedSampledSpeculativeEngine",
    "LlmServer",
    "write_engine",
    "read_engine",
]


def __getattr__(name):
    """Lazy public API (the analog of the reference `llm` facade crate,
    /root/reference/crates/llm/src/lib.rs) — deferred so that importing
    llm_tpu does not pull in jax until a model is touched."""
    if name in ("load", "Model", "ModelParameters", "RoPEOverrides"):
        import llm_tpu.loader as m

        return getattr(m, name)
    if name == "load_dynamic":  # reference llm::load_dynamic alias
        import llm_tpu.loader as m

        return m.load
    if name in (
        "InferenceSession",
        "InferenceSessionConfig",
        "InferenceRequest",
        "InferenceParameters",
        "InferenceStats",
        "InferenceError",
        "InferenceFeedback",
        "InferenceResponse",
        "OutputRequest",
        "ModelKVMemoryType",
        "conversation_inference_callback",
        "feed_prompt_callback",
    ):
        import llm_tpu.session as m

        return getattr(m, name)
    if name in ("TokenizerSource", "Tokenizer", "Prompt", "TokenBias"):
        import llm_tpu.tokenizer as m

        return getattr(m, name)
    if name in ("SUPPORTED_ARCHITECTURES", "ModelSpec", "get_arch"):
        import llm_tpu.models.spec as m

        return getattr(m, name)
    if name == "quantize":
        from llm_tpu.quantize import quantize

        return quantize
    if name in ("Engine", "GenerationRequest"):
        import llm_tpu.serve as m

        return getattr(m, name)
    if name == "PagedEngine":
        from llm_tpu.paged import PagedEngine

        return PagedEngine
    if name in (
        "SpeculativeEngine",
        "SampledSpeculativeEngine",
        "PagedSpeculativeEngine",
        "PagedSampledSpeculativeEngine",
    ):
        import llm_tpu.speculative as m

        return getattr(m, name)
    if name == "LlmServer":
        from llm_tpu.server import LlmServer

        return LlmServer
    if name in ("write_engine", "read_engine"):
        import llm_tpu.engine_snapshot as m

        return getattr(m, name)
    raise AttributeError(f"module 'llm_tpu' has no attribute {name!r}")
