"""Weight-only int8 quantization (M5).

The reference's quantization story is *loading* pre-quantized GPTQ/AWQ
checkpoints through external CUDA kernel packages
(/root/reference/evaluate_chat.py:119-125, experiment_multi.py:218-223).
The TPU-native equivalent is in-framework: symmetric per-channel int8
weights consumed by the Pallas fused dequant-matmul
(``kernels.int8_matmul``), plus an int8 KV cache (``cache.kvcache``).
"""

from .core import (
    QUANT_LEAF_Q,
    QUANT_LEAF_S,
    dequantize_tensor,
    is_quantized_leaf,
    quantize_params,
    quantize_tensor,
)

__all__ = [
    "QUANT_LEAF_Q",
    "QUANT_LEAF_S",
    "dequantize_tensor",
    "is_quantized_leaf",
    "quantize_params",
    "quantize_tensor",
]
