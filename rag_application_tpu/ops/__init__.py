from .topk import blocked_topk, merge_topk
from .quant import quantize_int8, dequantize_int8, matryoshka_inv_norms

__all__ = [
    "blocked_topk",
    "merge_topk",
    "quantize_int8",
    "dequantize_int8",
    "matryoshka_inv_norms",
]
