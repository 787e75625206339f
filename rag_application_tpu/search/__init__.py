from .hybrid import HybridSearcher, hybrid_search
from .params import adaptive_funnel

__all__ = ["HybridSearcher", "hybrid_search", "adaptive_funnel"]
