import jax.numpy as jnp
import numpy as np
import pytest

from rag_application_tpu.config import FunnelConfig, IndexConfig, SparseConfig
from rag_application_tpu.index.dense import DenseIndex
from rag_application_tpu.index.sparse import SparseIndex
from rag_application_tpu.search.hybrid import HybridSearcher, hybrid_search
from rag_application_tpu.search.params import adaptive_funnel

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "a fast auburn fox leaped across a sleepy canine",
    "machine learning on tensor processing units",
    "sparse retrieval with bm25 ranking functions",
    "dense retrieval with neural embeddings",
    "the dog sleeps while the fox runs in the forest",
    "bm25 is a classic sparse ranking function",
    "tensor contractions run fast on matrix units",
    "reciprocal rank fusion merges candidate lists",
    "knowledge graphs store entities and relationships",
]


def spectral_embeddings(rng, n, d, decay=0.02):
    """Synthetic embeddings with decaying spectrum (matryoshka-friendly)."""
    x = rng.standard_normal((n, d)).astype(np.float32)
    scale = np.exp(-decay * np.arange(d)).astype(np.float32)
    return x * scale


@pytest.fixture
def searcher(rng):
    cfg = IndexConfig(dim=64, matryoshka_dims=(8, 16, 32), initial_capacity=16)
    dense = DenseIndex(cfg)
    sparse = SparseIndex(SparseConfig(candidate_pool=64, max_query_terms=8))
    s = HybridSearcher(dense, sparse,
                       funnel=FunnelConfig(matryoshka_limits=(8, 6, 5),
                                           dense_limit=5, quantized_limit=5,
                                           sparse_limit=5, final_limit=5))
    embs = spectral_embeddings(rng, len(TEXTS), 64)
    s.add(embs, TEXTS)
    return s, embs


def test_hybrid_self_retrieval(searcher, rng):
    s, embs = searcher
    noisy = embs + 0.01 * rng.standard_normal(embs.shape).astype(np.float32)
    res = s.search(noisy, TEXTS, k=3)
    assert (res.rows[:, 0] == np.arange(len(TEXTS))).all()
    assert res.valid[:, 0].all()
    # scores sorted descending
    padded = np.where(res.valid, res.scores, -np.inf)
    assert (np.diff(padded, axis=-1) <= 1e-6).all()


def test_hybrid_sparse_only_hit(searcher, rng):
    """A doc matched only lexically must enter the candidate union via the
    sparse/RRF branch. (The FINAL ordering is an exact dense rescore —
    parity with qdrant_handler.py:363-372 — so with a random dense query
    the lexical hit's final rank is data-dependent; the guarantee is
    membership in the rescored union, asserted with k >= union size.)"""
    s, embs = searcher
    # Query embedding points nowhere near doc 8; text matches doc 8 strongly.
    q = rng.standard_normal((1, 64)).astype(np.float32)
    res = s.search(q, ["reciprocal rank fusion candidate lists"], k=25)
    assert 8 in res.rows[0][res.valid[0]]


def test_hybrid_filter_mask(searcher, rng):
    s, embs = searcher
    mask = np.zeros(s.dense.capacity, dtype=bool)
    mask[:5] = True
    noisy = embs[:4] + 0.01 * rng.standard_normal((4, 64)).astype(np.float32)
    res = s.search(noisy, TEXTS[:4], k=3, filter_mask=jnp.asarray(mask))
    valid_rows = res.rows[res.valid]
    assert (valid_rows < 5).all()


def test_hybrid_delete(searcher, rng):
    s, embs = searcher
    s.delete([0])
    noisy = embs[:1] + 0.01 * rng.standard_normal((1, 64)).astype(np.float32)
    res = s.search(noisy, TEXTS[:1], k=5)
    assert 0 not in res.rows[0][res.valid[0]]
    # nearest surviving semantic neighbor takes rank 1 spot instead
    assert res.valid[0, 0]


def test_hybrid_without_sparse(rng):
    dense = DenseIndex(IndexConfig(dim=32, matryoshka_dims=(8, 16),
                                   initial_capacity=8))
    embs = spectral_embeddings(rng, 20, 32)
    dense.insert(embs)
    res = hybrid_search(dense, None, embs[:3], None, 4,
                        funnel=FunnelConfig(matryoshka_limits=(8, 6),
                                            dense_limit=5, quantized_limit=5,
                                            final_limit=4))
    assert (res.rows[:, 0] == np.arange(3)).all()


def test_hybrid_matryoshka_disabled(searcher, rng):
    s, embs = searcher
    noisy = embs + 0.01 * rng.standard_normal(embs.shape).astype(np.float32)
    res = s.search(noisy, TEXTS, k=3, use_matryoshka=False)
    assert (res.rows[:, 0] == np.arange(len(TEXTS))).all()


def test_adaptive_funnel_parity():
    """Heuristic fallback parity (hybrid_search_workflow.py:97-106),
    bucketed to powers of two."""
    f = adaptive_funnel(100_000)
    assert f.matryoshka_limits[0] == 512  # bucket(min(500, 10000))
    assert f.sparse_limit == 128  # bucket(min(100, 2000))
    small = adaptive_funnel(100)
    assert small.matryoshka_limits == FunnelConfig().matryoshka_limits


def test_hybrid_recall_at_10_small_corpus(rng):
    """End-to-end recall vs brute force on a 2k corpus."""
    n, d = 2000, 128
    cfg = IndexConfig(dim=d, matryoshka_dims=(16, 32, 64),
                      initial_capacity=2048, block_size=1024)
    dense = DenseIndex(cfg)
    embs = spectral_embeddings(rng, n, d)
    dense.insert(embs)
    queries = spectral_embeddings(rng, 16, d)
    res = hybrid_search(dense, None, queries, None, 10,
                        funnel=adaptive_funnel(n))
    qn = queries / np.linalg.norm(queries, axis=-1, keepdims=True)
    en = embs / np.linalg.norm(embs, axis=-1, keepdims=True)
    exact = np.argsort(-(qn @ en.T), axis=-1)[:, :10]
    recall = np.mean([
        np.isin(exact[i], res.rows[i][res.valid[i]]).mean()
        for i in range(16)
    ])
    assert recall >= 0.95, recall
