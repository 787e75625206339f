from .collection import Collection, VectorStore

__all__ = ["Collection", "VectorStore"]
