"""Fused similarity + top-k over HBM-resident corpus blocks.

This op is the TPU-native replacement for the reference's delegated ANN
query (Qdrant HNSW `query_points`, app/core/vector_store/qdrant/
qdrant_handler.py:269-372). Instead of pointer-chasing a graph, a query
batch is scored against the corpus with MXU matmuls in HBM-sized blocks;
each block reduces to k candidates (exact `lax.top_k` or the TPU-native
`lax.approx_max_k` PartialReduce) which are merged into a running top-k
inside a `lax.scan`. The full (Q, N) score matrix is never materialized,
so HBM traffic is one read of the corpus per query batch — the
bandwidth-optimal schedule for exact search.

Design notes:
  * cosine == inner product because corpus rows are L2-normalized at
    insert time (parity: Qdrant cosine distance, qdrant_handler.py:61).
  * matryoshka prefix scoring reuses the same storage via column slices
    plus precomputed inverse prefix norms (parity: prefix slices stored
    as separate named vectors, qdrant_handler.py:148-150 — here they are
    free views, which is what makes "Qdrant-equal memory" achievable).
  * int8 scoring runs the MXU in int8 x int8 -> int32 mode (parity:
    Qdrant scalar-quantized search, qdrant_handler.py:92-98,144-146).
  * payload filtering is a corpus-aligned boolean mask applied as -inf
    before the reduce (parity: Qdrant server-side payload filters,
    qdrant_handler.py:297).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..utils import cdiv

NEG_INF = jnp.float32(-jnp.inf)


def merge_topk(
    vals_a: jax.Array,
    idx_a: jax.Array,
    vals_b: jax.Array,
    idx_b: jax.Array,
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Merge two per-query candidate lists into the top-k of their union.

    Shapes: (Q, Ka) + (Q, Kb) -> (Q, k). Does not deduplicate ids; callers
    that merge overlapping lists (e.g. cascade stages) dedup separately.
    """
    vals = jnp.concatenate([vals_a, vals_b], axis=-1)
    idx = jnp.concatenate([idx_a, idx_b], axis=-1)
    top_vals, top_pos = jax.lax.top_k(vals, k)
    top_idx = jnp.take_along_axis(idx, top_pos, axis=-1)
    return top_vals, top_idx


def _block_reduce(scores: jax.Array, k: int, approx: bool, recall_target: float):
    """Reduce (Q, B) block scores to per-block top-k candidates."""
    if approx and scores.shape[-1] > 2 * k:
        return jax.lax.approx_max_k(scores, k, recall_target=recall_target)
    return jax.lax.top_k(scores, k)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k",
        "block_size",
        "prefix_dim",
        "approx",
        "recall_target",
    ),
)
def blocked_topk(
    corpus: jax.Array,
    queries: jax.Array,
    k: int,
    *,
    block_size: int = 131072,
    valid_n: Optional[int] = None,
    prefix_dim: Optional[int] = None,
    inv_norms: Optional[jax.Array] = None,
    filter_mask: Optional[jax.Array] = None,
    approx: bool = True,
    recall_target: float = 0.95,
) -> Tuple[jax.Array, jax.Array]:
    """Top-k inner-product search of ``queries`` against ``corpus``.

    Args:
      corpus: (N, d) corpus matrix (bf16/f32 for dense, int8 for quantized).
      queries: (Q, d) query matrix, same scoring dtype family as corpus.
      k: number of results per query.
      block_size: corpus rows scored per scan step.
      valid_n: logical corpus size (rows >= valid_n are padding). May be a
        traced scalar — growing the logical size does not recompile.
      prefix_dim: if set, score only the first ``prefix_dim`` columns
        (matryoshka view).
      inv_norms: optional (N,) per-row score scale (inverse prefix norms so
        prefix scores are true cosines).
      filter_mask: optional (N,) bool; False rows are excluded (payload /
        user filtering).
      approx: use `lax.approx_max_k` for the per-block reduce on large
        blocks (exact merge across blocks still applies).
      recall_target: approx_max_k per-block recall target.

    Returns:
      (values (Q, k) f32, indices (Q, k) i32) sorted descending. Indices of
      padded/filtered rows only appear when fewer than k rows are valid
      (their values are -inf).
    """
    n, d = corpus.shape
    q = queries.shape[0]
    if valid_n is None:
        valid_n = n
    if prefix_dim is not None and prefix_dim < d:
        corpus = corpus[:, :prefix_dim]
        queries = queries[:, :prefix_dim]
        d = prefix_dim

    int8_mode = corpus.dtype == jnp.int8
    acc_type = jnp.int32 if int8_mode else jnp.float32

    k_eff = min(k, n)
    num_blocks = cdiv(n, block_size)
    padded_n = num_blocks * block_size

    def score_block(start: jax.Array) -> jax.Array:
        blk = jax.lax.dynamic_slice_in_dim(corpus, start, block_size, axis=0)
        scores = jnp.dot(
            queries, blk.T, preferred_element_type=acc_type
        ).astype(jnp.float32)
        col = start + jax.lax.broadcasted_iota(jnp.int32, (1, block_size), 1)
        valid = col < valid_n
        if inv_norms is not None:
            scale = jax.lax.dynamic_slice_in_dim(
                inv_norms, start, block_size, axis=0
            )
            scores = scores * scale[None, :]
        if filter_mask is not None:
            fm = jax.lax.dynamic_slice_in_dim(
                filter_mask, start, block_size, axis=0
            )
            valid = jnp.logical_and(valid, fm[None, :])
        return jnp.where(valid, scores, NEG_INF)

    if num_blocks == 1 and padded_n == n:
        scores = score_block(jnp.int32(0))
        return _block_reduce(scores, k_eff, approx, recall_target)

    # Pad corpus-dependent arrays once so every dynamic slice is in bounds.
    pad = padded_n - n
    if pad:
        corpus = jnp.pad(corpus, ((0, pad), (0, 0)))
        if inv_norms is not None:
            inv_norms = jnp.pad(inv_norms, (0, pad))
        if filter_mask is not None:
            filter_mask = jnp.pad(filter_mask, (0, pad))

    def step(carry, block_idx):
        vals, idx = carry
        start = block_idx * block_size
        scores = score_block(start)
        b_vals, b_idx = _block_reduce(scores, k_eff, approx, recall_target)
        carry = merge_topk(vals, idx, b_vals, b_idx + start, k_eff)
        return carry, None

    init = (
        jnp.full((q, k_eff), NEG_INF, dtype=jnp.float32),
        jnp.zeros((q, k_eff), dtype=jnp.int32),
    )
    (vals, idx), _ = jax.lax.scan(
        step, init, jnp.arange(num_blocks, dtype=jnp.int32)
    )
    return vals, idx


def gather_rescore(
    corpus: jax.Array,
    queries: jax.Array,
    candidates: jax.Array,
    *,
    candidate_valid: Optional[jax.Array] = None,
) -> jax.Array:
    """Exact rescore of candidate rows: the final `exact: True` stage.

    Parity: the reference's final dense rescore with ``exact=True``
    (qdrant_handler.py:363-372). Gathers candidate vectors (Q, m, d) and
    contracts against the per-query vector on the MXU.

    Args:
      corpus: (N, d) full-precision corpus.
      queries: (Q, d) queries.
      candidates: (Q, m) int32 candidate row ids.
      candidate_valid: optional (Q, m) bool mask; invalid -> -inf.

    Returns: (Q, m) f32 exact scores.
    """
    cand_vecs = corpus[candidates]  # (Q, m, d)
    scores = jnp.einsum(
        "qd,qmd->qm",
        queries.astype(jnp.float32),
        cand_vecs.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    if candidate_valid is not None:
        scores = jnp.where(candidate_valid, scores, NEG_INF)
    return scores
