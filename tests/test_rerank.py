import jax.numpy as jnp
import numpy as np
import pytest

from rag_application_tpu.config import (
    Config,
    EncoderConfig,
    FunnelConfig,
    IndexConfig,
    SparseConfig,
)
from rag_application_tpu.models.embedder import Embedder
from rag_application_tpu.search.rerank import LateInteractionReranker, maxsim_scores
from rag_application_tpu.store.collection import Collection

TINY = EncoderConfig(vocab_size=1024, hidden_dim=32, num_layers=1, num_heads=4,
                     mlp_dim=64, max_len=64, out_dim=32, dtype="float32")


def test_maxsim_exact_small():
    """Hand-computable maxsim: one query token, two docs."""
    q = jnp.asarray(np.array([[[1.0, 0.0]]]))  # (1,1,2)
    qm = jnp.ones((1, 1), dtype=bool)
    d = jnp.asarray(np.array([[[[1.0, 0.0], [0.0, 1.0]],
                               [[0.0, 1.0], [0.0, 1.0]]]]))  # (1,2,2,2)
    dm = jnp.ones((1, 2, 2), dtype=bool)
    s = np.asarray(maxsim_scores(q, qm, d, dm))
    np.testing.assert_allclose(s, [[1.0, 0.0]], atol=1e-6)


def test_maxsim_masking():
    q = jnp.asarray(np.ones((1, 2, 2), dtype=np.float32))
    qm = jnp.asarray([[True, False]])  # second query token masked
    d = jnp.asarray(np.ones((1, 1, 3, 2), dtype=np.float32))
    dm = jnp.asarray([[[True, False, False]]])
    s = np.asarray(maxsim_scores(q, qm, d, dm))
    np.testing.assert_allclose(s, [[1.0]], atol=1e-5)  # one active pair


@pytest.fixture(scope="module")
def embedder():
    return Embedder(cfg=TINY, batch_size=8, max_len=64)


def test_reranker_prefers_lexical_overlap(embedder):
    rr = LateInteractionReranker(embedder, budget_tokens=256)
    queries = ["the fox jumped over the dog"]
    candidates = [[
        "a treatise on monetary policy and inflation",
        "the fox jumped over the dog",
        "tensor units multiply matrices",
    ]]
    order = rr.rerank(queries, candidates)
    assert order[0][0] == 1  # identical text wins under maxsim


def test_reranker_ragged_candidates(embedder):
    rr = LateInteractionReranker(embedder, budget_tokens=256)
    order = rr.rerank(["query one", "query two"],
                      [["a", "b", "c"], ["only one"]])
    assert sorted(order[0]) == [0, 1, 2]
    assert order[1] == [0]
    assert rr.rerank(["x"], [[]]) == [[]]


def test_collection_rerank_integration(embedder, rng):
    cfg = Config()
    cfg.index = IndexConfig(dim=32, matryoshka_dims=(8, 16), initial_capacity=16)
    cfg.sparse = SparseConfig(candidate_pool=64, max_query_terms=8)
    cfg.funnel = FunnelConfig(matryoshka_limits=(8, 6), dense_limit=5,
                              quantized_limit=5, sparse_limit=5, final_limit=4,
                              rerank=True)
    col = Collection("rr", cfg)
    col.set_reranker(LateInteractionReranker(embedder, budget_tokens=256))
    texts = ["alpha beta gamma", "the fox jumped", "delta epsilon zeta",
             "fox fox fox jumped jumped"]
    col.store_document_vectors("d", [{"text": t} for t in texts],
                               embedder.encode(texts))
    hits = col.hybrid_search(embedder.encode(["fox jumped"])[0],
                             "fox jumped", limit=4, adaptive=False)
    assert hits[0].payload["text"] in ("the fox jumped",
                                       "fox fox fox jumped jumped")
