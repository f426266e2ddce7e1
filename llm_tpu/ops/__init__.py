"""TPU compute ops: packed-quantized tensors, fused matmul kernels, attention,
norms, positional encodings.

This is the replacement of the reference's native compute layer (ggml.c /
k_quants.c fused dequant-dot kernels, SURVEY.md §2.1) designed for TPU:
weights stay bit-packed in HBM, are dequantized in VMEM tiles inside Pallas
kernels, and hit the MXU as bf16 — there is no host-side dequantized copy.
"""

from llm_tpu.ops.packing import (
    QuantTensor,
    QFormat,
    FORMATS,
    pack_ggml,
    pack_dense,
    dequant_jnp,
)
from llm_tpu.ops.qmatmul import qmatmul, quant_rows_lookup

__all__ = [
    "QuantTensor",
    "QFormat",
    "FORMATS",
    "pack_ggml",
    "pack_dense",
    "dequant_jnp",
    "qmatmul",
    "quant_rows_lookup",
]
