from .tokenizer import HashTokenizer
from .encoder import TextEncoder, MultimodalEncoder, EncoderState, init_encoder
from .cache import EmbeddingCache
from .embedder import Embedder

__all__ = [
    "HashTokenizer",
    "TextEncoder",
    "MultimodalEncoder",
    "EncoderState",
    "init_encoder",
    "EmbeddingCache",
    "Embedder",
]
