"""The hybrid query pipeline as one batched device program.

Parity target: `QdrantHandler.hybrid_search` (app/core/vector_store/
qdrant/qdrant_handler.py:269-412):

  reference (server-side Qdrant)              here (on-device)
  ------------------------------              ----------------
  matryoshka prefetch cascade                 64-d corpus scan -> prefix
    64(100) -> 128(80) -> 256(60) (:305-330)    rescore at 128/256 (gathers)
  int8 prefetch -> dense refine (:333-344)    int8 corpus scan -> exact
                                                dense rescore of candidates
  sparse BM25 prefetch (:347-354)             bm25_topk kernel
  RRF(quantized, sparse) (:357-360)           ops.rrf.rrf_fuse
  final dense rescore, exact=True,            exact gather-rescore over the
    hnsw_ef (:363-372)                          candidate union (no ef knob:
                                                the final stage is exact by
                                                construction)
  ColBERT rerank (:380,388-412)               optional late-interaction
                                                rerank (search/rerank.py)

The whole funnel runs without host round-trips between stages; only the
BM25 query analysis (string -> term ids) happens on host.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FunnelConfig
from ..index.dense import DenseIndex
from ..index.sparse import SparseIndex
from ..ops.bm25 import bm25_topk
from ..ops.rrf import INVALID_ID, first_occurrence_mask

NEG_INF = jnp.float32(-jnp.inf)


@dataclass
class HybridResult:
    scores: np.ndarray  # (Q, k) f32, -inf padding
    rows: np.ndarray  # (Q, k) int32, INVALID_ID padding
    valid: np.ndarray  # (Q, k) bool


def _refine(index: DenseIndex, queries, vals, ids, k: int,
            level: Optional[int]) -> Tuple[jax.Array, jax.Array]:
    """Rescore candidate ids at a finer view and keep the top-k."""
    valid = jnp.isfinite(vals)
    scores = index.rescore(queries, ids, candidate_valid=valid, level=level)
    k_eff = min(k, ids.shape[-1])
    top_scores, pos = jax.lax.top_k(scores, k_eff)
    top_ids = jnp.take_along_axis(ids, pos, axis=-1)
    return top_scores, top_ids


def hybrid_search(
    dense: DenseIndex,
    sparse: Optional[SparseIndex],
    query_embeddings,
    query_texts: Optional[Sequence[str]],
    k: Optional[int] = None,
    *,
    funnel: Optional[FunnelConfig] = None,
    filter_mask: Optional[jax.Array] = None,
    use_matryoshka: bool = True,
) -> HybridResult:
    """Run the full hybrid funnel for a query batch.

    Args:
      dense: the dense index shard.
      sparse: BM25 index (None disables the sparse branch, as the
        reference does when no sparse vector is supplied).
      query_embeddings: (Q, d) raw query embeddings.
      query_texts: raw query strings for the BM25 branch.
      k: final results per query (default funnel.final_limit).
      funnel: candidate funnel; defaults to the reference's defaults.
      filter_mask: (N-capacity,) bool payload filter, aligned to rows.
      use_matryoshka: disable the prefix cascade (isotropic embeddings
        gain nothing from it; the int8 branch then carries recall).

    Note: this staged path always ranks the final union by exact dense
    score (the reference's semantics). `FunnelConfig.final_fusion="rrf"`
    is implemented in the production fused path (search/fused.py),
    which Collection routes through.
    """
    f = funnel or FunnelConfig()
    k = k or f.final_limit
    q = dense.normalize_queries(query_embeddings)
    nq = q.shape[0]

    branch_ids = []  # candidate lists entering the final exact rescore
    rrf_lists = []

    # --- matryoshka cascade: coarse scan, then prefix-view refinements ---
    if use_matryoshka and dense.cfg.matryoshka_dims:
        m = f.matryoshka_limits
        vals, ids = dense.search_matryoshka(q, m[0], 0, filter_mask=filter_mask)
        for level in range(1, len(dense.cfg.matryoshka_dims)):
            if level >= len(m):
                break
            vals, ids = _refine(dense, q, vals, ids, m[level], level)
        vals, ids = _refine(dense, q, vals, ids, f.dense_limit, None)
        branch_ids.append((vals, ids))

    # --- int8 branch: quantized scan -> rank-select refine ---
    # The scan scores are full-dim int8 dots, so the refine set is chosen
    # from them directly (no bf16 re-gather); the final union rescore
    # below supplies the exact scores (the reference's int8 prefetch ->
    # refine -> exact:True chain, qdrant_handler.py:333-344,363-372).
    i8_vals, i8_ids = dense.search_int8(q, f.quantized_limit,
                                        filter_mask=filter_mask)
    keep = min(f.dense_limit, i8_ids.shape[-1])
    i8_vals, pos = jax.lax.top_k(i8_vals, keep)
    i8_ids = jnp.take_along_axis(i8_ids, pos, axis=-1)
    rrf_lists.append((i8_ids, jnp.isfinite(i8_vals)))
    branch_ids.append((i8_vals, i8_ids))

    # --- sparse BM25 branch ---
    if sparse is not None and query_texts is not None and len(sparse) > 0:
        dv = sparse.device_arrays()
        q_rows, q_terms, q_valid = sparse.encode_queries(list(query_texts))
        fm = filter_mask
        if fm is not None:
            fm = fm[: len(sparse)]
        sp_scores, sp_ids = bm25_topk(
            dv["post_docs"], dv["post_weights"], dv["doc_packed"],
            q_rows, q_terms, q_valid, f.sparse_limit,
            pool=sparse.cfg.candidate_pool, filter_mask=fm,
        )
        sp_valid = jnp.isfinite(sp_scores)
        rrf_lists.append((sp_ids, sp_valid))
        branch_ids.append((jnp.where(sp_valid, 0.0, NEG_INF), sp_ids))

    # --- RRF of quantized-dense + sparse (parity :357-360) ---
    # Skipped as pure compute: the fused list is a subset of the union
    # already entering the exact rescore, so it cannot change the output
    # (see the note in search/fused.py).
    del rrf_lists

    # --- final exact dense rescore over the candidate union (:363-372) ---
    all_ids = jnp.concatenate([ids for _, ids in branch_ids], axis=-1)
    all_valid = jnp.concatenate(
        [jnp.isfinite(vals) for vals, _ in branch_ids], axis=-1
    )
    all_ids = jnp.where(all_valid, all_ids, INVALID_ID)
    keep = first_occurrence_mask(all_ids) & (all_ids != INVALID_ID)
    final_scores = dense.rescore(q, jnp.where(keep, all_ids, 0),
                                 candidate_valid=keep)
    k_eff = min(k, all_ids.shape[-1])
    top_scores, pos = jax.lax.top_k(final_scores, k_eff)
    top_ids = jnp.take_along_axis(all_ids, pos, axis=-1)
    valid = jnp.isfinite(top_scores)
    top_ids = jnp.where(valid, top_ids, INVALID_ID)

    return HybridResult(
        scores=np.asarray(top_scores),
        rows=np.asarray(top_ids),
        valid=np.asarray(valid),
    )


class HybridSearcher:
    """Convenience facade pairing a DenseIndex and SparseIndex.

    Mirrors the per-collection surface of `QdrantHandler`
    (create_collection == construction; store_document_vectors == add;
    hybrid_search == search; get_collection_chunk_count == len).
    """

    def __init__(self, dense: DenseIndex, sparse: Optional[SparseIndex] = None,
                 funnel: Optional[FunnelConfig] = None):
        self.dense = dense
        self.sparse = sparse
        self.funnel = funnel

    def __len__(self) -> int:
        return self.dense.size

    def add(self, embeddings, texts: Optional[Sequence[str]] = None) -> np.ndarray:
        rows = self.dense.insert(embeddings)
        if self.sparse is not None and texts is not None:
            sparse_rows = self.sparse.add_batch(list(texts))
            assert list(sparse_rows) == list(rows), "dense/sparse row drift"
        return rows

    def delete(self, rows) -> None:
        self.dense.delete(rows)
        if self.sparse is not None:
            for r in np.asarray(rows).tolist():
                self.sparse.delete(r)

    def search(self, query_embeddings, query_texts=None, k: int = 10,
               **kw) -> HybridResult:
        return hybrid_search(self.dense, self.sparse, query_embeddings,
                             query_texts, k, funnel=self.funnel, **kw)
