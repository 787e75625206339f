from .analyzer import Analyzer
from .sparse import SparseIndex

__all__ = ["Analyzer", "SparseIndex"]
