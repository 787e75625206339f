import jax.numpy as jnp
import numpy as np
import pytest

from rag_application_tpu.config import IndexConfig
from rag_application_tpu.index.ann import GraphIndex, GraphSearchParams
from rag_application_tpu.index.dense import DenseIndex
from rag_application_tpu.ops.graph_ann import rng_prune


def clustered_corpus(rng, n, d, n_clusters=20):
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32) * 3
    assign = rng.integers(0, n_clusters, n)
    x = centers[assign] + rng.standard_normal((n, d)).astype(np.float32)
    return (x / np.linalg.norm(x, axis=-1, keepdims=True)).astype(np.float32)


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(3)
    n, d = 2000, 64
    corpus = clustered_corpus(rng, n, d)
    dense = DenseIndex(IndexConfig(dim=d, matryoshka_dims=(16, 32),
                                   initial_capacity=4096, block_size=1024))
    dense.insert(corpus)
    gi = GraphIndex.build(dense, m=16, k_build=32, entry_size=64, batch=512)
    return gi, corpus, rng


def test_graph_shape_and_degree(built):
    gi, corpus, _ = built
    n = len(corpus)
    assert gi.adj.shape == (n + 1, 16)
    adj = np.asarray(gi.adj)
    # every non-sentinel edge is a valid node, no self loops in core rows
    core = adj[:-1]
    rows = np.arange(n)[:, None]
    valid_edges = core < n
    assert (core[valid_edges] >= 0).all()
    assert not (core == rows).any()
    # every node keeps at least one neighbor
    assert (valid_edges.sum(axis=1) >= 1).all()


def test_beam_search_recall(built):
    gi, corpus, rng = built
    q_rows = rng.integers(0, len(corpus), 32)
    queries = corpus[q_rows] + 0.05 * rng.standard_normal(
        (32, corpus.shape[1])).astype(np.float32)
    qn = queries / np.linalg.norm(queries, axis=-1, keepdims=True)
    exact = np.argsort(-(qn @ corpus.T), axis=-1)[:, :10]

    vals, ids = gi.search(queries, 10,
                          params=GraphSearchParams(ef=64, iters=12, expand=4,
                                                   prefix_dim=32))
    ids = np.asarray(ids)
    recall = np.mean([np.isin(exact[i], ids[i]).mean() for i in range(32)])
    assert recall >= 0.9, recall
    # scores are exact full-dim cosines
    vals = np.asarray(vals)
    ref = np.take_along_axis(qn @ corpus.T, ids, axis=-1)
    np.testing.assert_allclose(vals, ref, atol=2e-2)


def test_beam_search_filter(built):
    gi, corpus, rng = built
    mask = np.zeros(gi.dense.capacity, dtype=bool)
    mask[:500] = True
    queries = corpus[700:704]
    vals, ids = gi.search(queries, 5, filter_mask=jnp.asarray(mask))
    ids = np.asarray(ids)
    ok = np.isfinite(np.asarray(vals))
    assert (ids[ok] < 500).all()


def test_rng_prune_diversity():
    """Pruning keeps the closest candidate and drops candidates dominated
    by an already-kept neighbor."""
    rng = np.random.default_rng(0)
    vecs = np.eye(8, dtype=np.float32)
    vecs = jnp.asarray(np.vstack([vecs, np.zeros((1, 8), np.float32)]))
    # node resembles e0; candidates: e0-dupe (c1), e0-dupe (c2), e1 (c3)
    cand = jnp.asarray([[0, 1, 2]], dtype=jnp.int32)
    # scores to node; gram(c1,c2)=... use vecs rows 0,0-like
    scores = jnp.asarray([[0.99, 0.98, 0.5]], dtype=jnp.float32)
    out = np.asarray(rng_prune(cand, scores, vecs, 2, sentinel=9,
                               block_rows=1))
    assert out[0, 0] == 0  # best kept


def test_incremental_insert(built):
    gi, corpus, rng = built
    d = corpus.shape[1]
    new = rng.standard_normal((5, d)).astype(np.float32)
    new /= np.linalg.norm(new, axis=-1, keepdims=True)
    rows = gi.dense.insert(new)
    gi.insert_batch(rows)
    assert gi.built_size == len(corpus) + 5
    # new nodes are retrievable (entry sample + graph links)
    vals, ids = gi.search(new, 3, params=GraphSearchParams(ef=64, iters=12))
    ids = np.asarray(ids)
    hit = np.mean([rows[i] in ids[i] for i in range(5)])
    assert hit >= 0.8, (hit, ids, rows)
