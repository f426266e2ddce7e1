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
]
