import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_application_tpu.config import EncoderConfig
from rag_application_tpu.models.cache import EmbeddingCache
from rag_application_tpu.models.embedder import Embedder
from rag_application_tpu.models.encoder import init_encoder
from rag_application_tpu.models.tokenizer import HashTokenizer

TINY = EncoderConfig(vocab_size=512, hidden_dim=32, num_layers=2, num_heads=4,
                     mlp_dim=64, max_len=32, out_dim=16, dtype="float32")


def test_tokenizer_deterministic():
    tok = HashTokenizer(1024, 16)
    ids1, mask1 = tok.encode_batch(["Hello, world!"])
    ids2, mask2 = tok.encode_batch(["Hello, world!"])
    np.testing.assert_array_equal(ids1, ids2)
    assert ids1[0, 0] == 1  # CLS
    assert mask1[0].sum() == ids1[0].astype(bool).sum()


def test_tokenizer_truncation():
    tok = HashTokenizer(1024, 8)
    ids, mask = tok.encode_batch(["one two three four five six seven eight nine ten"])
    assert mask[0].all()
    assert ids[0, -1] == 2  # SEP survives truncation


def test_encoder_forward_unit_norm():
    enc = init_encoder(TINY, max_len=32)
    tok = HashTokenizer(TINY.vocab_size, 32)
    ids, mask = tok.encode_batch(["a test sentence", "another one"])
    out = enc.model.apply(enc.params, jnp.asarray(ids), jnp.asarray(mask))
    assert out.shape == (2, 16)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1), 1.0,
                               atol=1e-5)


def test_encoder_mask_invariance():
    """Padding must not influence the embedding (mean pool over mask)."""
    enc = init_encoder(TINY, max_len=32)
    tok = HashTokenizer(TINY.vocab_size, 32)
    ids, mask = tok.encode_batch(["same text"])
    ids2 = ids.copy()
    ids2[0, mask[0].sum():] = 77  # garbage in padding
    o1 = enc.model.apply(enc.params, jnp.asarray(ids), jnp.asarray(mask))
    o2 = enc.model.apply(enc.params, jnp.asarray(ids2), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)


def test_multimodal_encoder_image_changes_embedding():
    enc = init_encoder(TINY, max_len=16, multimodal=True)
    tok = HashTokenizer(TINY.vocab_size, 16)
    ids, mask = tok.encode_batch(["a page of text"])
    img0 = jnp.zeros((1, 224, 224, 3))
    img1 = jnp.ones((1, 224, 224, 3))
    o0 = enc.model.apply(enc.params, jnp.asarray(ids), jnp.asarray(mask), img0)
    o1 = enc.model.apply(enc.params, jnp.asarray(ids), jnp.asarray(mask), img1)
    assert not np.allclose(np.asarray(o0), np.asarray(o1))


def test_embedding_cache_hit_and_ttl():
    cache = EmbeddingCache(capacity=2, ttl=3600)
    v = np.ones(4, dtype=np.float32)
    cache.put("hello", v)
    np.testing.assert_array_equal(cache.get("hello"), v)
    assert cache.hits == 1
    assert cache.get("missing") is None
    # LRU eviction
    cache.put("a", v)
    cache.put("b", v)
    assert cache.get("hello") is None


def test_embedder_batched_and_cached():
    emb = Embedder(cfg=TINY, batch_size=4, max_len=16)
    texts = [f"sentence {i}" for i in range(6)]
    out = emb.encode(texts)
    assert out.shape == (6, 16)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-4)
    # second call: full cache hit, identical vectors
    before_misses = emb.cache.misses
    out2 = emb.encode(texts)
    np.testing.assert_array_equal(out, out2)
    assert emb.cache.misses == before_misses


def test_embedder_identical_texts_identical_vectors():
    emb = Embedder(cfg=TINY, batch_size=4, max_len=16)
    out = emb.encode(["same", "same"])
    np.testing.assert_allclose(out[0], out[1], atol=1e-6)
