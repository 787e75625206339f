"""On-device reciprocal-rank fusion of candidate lists.

Parity target: the reference fuses its quantized-dense branch and sparse
BM25 branch with Qdrant's server-side `FusionQuery(fusion=Fusion.RRF)`
(app/core/vector_store/qdrant/qdrant_handler.py:357-360), then feeds the
fused list plus the matryoshka cascade into a final exact dense rescore.
Qdrant's RRF assigns each candidate `sum_lists 1 / (k + rank)` with k=2 by
default; we expose `rrf_k` (the commonly used 60 is the default here, and
2 gives bit-parity with Qdrant).

TPU design: candidate lists are small (tens to hundreds of ids), so the
fusion is a dense rank-matching problem, not a hash join. The union of
all lists is formed by concatenation; each union element's rank in each
source list is recovered with an equality match against that list (a
(S, K) compare on the VPU); duplicates within the union are suppressed by
a first-occurrence mask. Everything is fixed-shape and fully batched —
no host round-trip between retrieval branches and fusion.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-jnp.inf)
INVALID_ID = jnp.int32(2147483647)


def first_occurrence_mask(ids: jax.Array) -> jax.Array:
    """(Q, S) -> (Q, S) bool mask keeping the first occurrence of each id.

    Quadratic in S (S is a few hundred at most), entirely on the VPU.
    """
    s = ids.shape[-1]
    eq = ids[..., :, None] == ids[..., None, :]  # (Q, S, S)
    pos = jnp.arange(s)
    earlier = pos[None, :, None] > pos[None, None, :]  # j earlier than i
    dup = jnp.any(eq & earlier, axis=-1)
    return ~dup


def rrf_fuse(
    lists: Sequence[Tuple[jax.Array, jax.Array]],
    k: int,
    *,
    rrf_k: int = 60,
) -> Tuple[jax.Array, jax.Array]:
    """Fuse ranked candidate lists with reciprocal rank fusion.

    Args:
      lists: sequence of (ids (Q, K_j) int32, valid (Q, K_j) bool) ranked
        lists, best-first. Invalid slots (padding) are ignored.
      k: fused results per query.
      rrf_k: RRF constant; contribution of rank r (0-based) is
        1 / (rrf_k + r + 1).

    Returns:
      (scores (Q, k) f32, ids (Q, k) int32), descending by fused score.
      Slots beyond the union's valid size have score -inf and INVALID_ID.
    """
    union_ids = []
    for ids, valid in lists:
        union_ids.append(jnp.where(valid, ids, INVALID_ID))
    union = jnp.concatenate(union_ids, axis=-1)  # (Q, S)

    score = jnp.zeros(union.shape, dtype=jnp.float32)
    for ids, valid in lists:
        masked = jnp.where(valid, ids, INVALID_ID)
        match = union[..., :, None] == masked[..., None, :]  # (Q, S, K_j)
        ranks = jnp.arange(ids.shape[-1], dtype=jnp.float32)
        contrib = 1.0 / (rrf_k + ranks + 1.0)
        score = score + jnp.sum(jnp.where(match, contrib[None, None, :], 0.0), axis=-1)

    keep = first_occurrence_mask(union) & (union != INVALID_ID)
    score = jnp.where(keep, score, NEG_INF)

    k_eff = min(k, union.shape[-1])
    top_scores, top_pos = jax.lax.top_k(score, k_eff)
    top_ids = jnp.take_along_axis(union, top_pos, axis=-1)
    top_ids = jnp.where(top_scores > NEG_INF, top_ids, INVALID_ID)
    if k_eff < k:
        # honor the (Q, k) contract even when the union is smaller —
        # callers size downstream buffers by k
        pad = k - k_eff
        top_scores = jnp.pad(top_scores, ((0, 0), (0, pad)),
                             constant_values=NEG_INF)
        top_ids = jnp.pad(top_ids, ((0, 0), (0, pad)),
                          constant_values=INVALID_ID)
    return top_scores, top_ids
