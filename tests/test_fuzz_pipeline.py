"""Property tests: the fused single-dispatch pipeline must agree with the
staged reference pipeline across random corpora, funnels and filters."""

import jax.numpy as jnp
import numpy as np
import pytest

from rag_application_tpu.config import FunnelConfig, IndexConfig, SparseConfig
from rag_application_tpu.index.dense import DenseIndex
from rag_application_tpu.index.sparse import SparseIndex
from rag_application_tpu.search.fused import FusedSearcher
from rag_application_tpu.search.hybrid import hybrid_search

WORDS = ("fox dog tensor unit sparse dense graph node query index rank "
         "fusion chunk page entity relation column row value search").split()


def random_setup(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(20, 120))
    d = int(rng.choice([32, 64]))
    m_dims = (8, 16) if d == 32 else (16, 32)
    dense = DenseIndex(IndexConfig(dim=d, matryoshka_dims=m_dims,
                                   initial_capacity=128,
                                   block_size=int(rng.choice([32, 64, 128]))))
    sparse = SparseIndex(SparseConfig(candidate_pool=64, max_query_terms=8))
    embs = (rng.standard_normal((n, d))
            * np.exp(-0.02 * np.arange(d))).astype(np.float32)
    texts = [" ".join(rng.choice(WORDS, size=8)) for _ in range(n)]
    dense.insert(embs)
    sparse.add_batch(texts)
    # random tombstones
    doomed = rng.choice(n, size=max(1, n // 10), replace=False)
    dense.delete(doomed)
    for r in doomed:
        sparse.delete(int(r))
    funnel = FunnelConfig(
        matryoshka_limits=(int(rng.integers(6, 16)), int(rng.integers(4, 10))),
        dense_limit=int(rng.integers(4, 12)),
        quantized_limit=int(rng.integers(4, 12)),
        sparse_limit=int(rng.integers(3, 8)),
        final_limit=int(rng.integers(3, 8)),
    )
    q_count = int(rng.integers(1, 6))
    q_idx = rng.integers(0, n, q_count)
    queries = embs[q_idx] + 0.02 * rng.standard_normal((q_count, d)).astype(np.float32)
    q_texts = [texts[i] for i in q_idx]
    mask = None
    if rng.random() < 0.5:
        mask = np.zeros(dense.capacity, dtype=bool)
        mask[rng.choice(n, size=max(2, n // 2), replace=False)] = True
    return dense, sparse, funnel, queries, q_texts, mask


@pytest.mark.parametrize("seed", range(6))
def test_fused_equals_staged(seed):
    dense, sparse, funnel, queries, q_texts, mask = random_setup(seed)
    staged = hybrid_search(
        dense, sparse, queries, q_texts, funnel.final_limit, funnel=funnel,
        filter_mask=jnp.asarray(mask) if mask is not None else None)
    fused = FusedSearcher(dense, sparse, funnel)
    scores, ids = fused.search(
        queries, q_texts, funnel.final_limit,
        filter_mask=jnp.asarray(mask) if mask is not None else None)
    ids = np.asarray(ids)
    scores = np.asarray(scores)
    valid = np.isfinite(scores)
    np.testing.assert_array_equal(ids[valid], staged.rows[staged.valid],
                                  err_msg=f"seed={seed}")
    np.testing.assert_allclose(scores[valid], staged.scores[staged.valid],
                               rtol=1e-4, err_msg=f"seed={seed}")
    # filter respected
    if mask is not None:
        assert mask[ids[valid]].all()
