from .topk import blocked_topk, gather_rescore, merge_topk
from .quant import (
    dequantize_int8,
    matryoshka_inv_norms,
    prepare_vectors,
    prepare_vectors_xla,
    quantize_int8,
)
from .bm25 import bm25_topk, bm25_impact_weights, pack_doc_major
from .rrf import rrf_fuse, first_occurrence_mask
from .fused_topk import fused_scan_topk
from .graph_hop import k_hop_expand, path_reachability

__all__ = [
    "blocked_topk",
    "gather_rescore",
    "merge_topk",
    "quantize_int8",
    "dequantize_int8",
    "matryoshka_inv_norms",
    "prepare_vectors",
    "prepare_vectors_xla",
    "bm25_topk",
    "bm25_impact_weights",
    "pack_doc_major",
    "rrf_fuse",
    "first_occurrence_mask",
    "fused_scan_topk",
    "k_hop_expand",
    "path_reachability",
]
