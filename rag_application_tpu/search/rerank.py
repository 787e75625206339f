"""Late-interaction reranking (ColBERT-style maxsim).

Parity: the reference reranks hybrid-search finalists with
jinaai/jina-colbert-v2 behind `rerank_with_colbert`
(app/core/vector_store/qdrant/qdrant_handler.py:20,380,388-412), with an
8000-token total budget split across candidates (:375); its HF fallback
is a mean-pooled matmul argsort (app/core/models/huggingface/
huggingface.py:172-189).

Here candidates are re-encoded with the framework encoder in token mode
and scored with true late interaction: for each (query, doc) pair,
sum over query tokens of the max similarity over doc tokens — one
einsum + masked reductions, batched over the whole candidate set on the
MXU. Token-level doc embeddings are computed at query time (like the
reference) — storing them for the whole corpus would be ~100x the index.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def maxsim_scores(
    q_tokens: jax.Array,  # (Q, Tq, D)
    q_mask: jax.Array,    # (Q, Tq) bool
    d_tokens: jax.Array,  # (Q, M, Td, D)
    d_mask: jax.Array,    # (Q, M, Td) bool
) -> jax.Array:
    """Late-interaction scores (Q, M): sum_t max_s <q_t, d_s>."""
    qf = q_tokens.astype(jnp.float32)
    df = d_tokens.astype(jnp.float32)
    qf = qf / jnp.maximum(jnp.linalg.norm(qf, axis=-1, keepdims=True), 1e-9)
    df = df / jnp.maximum(jnp.linalg.norm(df, axis=-1, keepdims=True), 1e-9)
    sim = jnp.einsum("qtd,qmsd->qmts", qf, df)  # (Q, M, Tq, Td)
    sim = jnp.where(d_mask[:, :, None, :], sim, -jnp.inf)
    best = jnp.max(sim, axis=-1)  # (Q, M, Tq)
    best = jnp.where(q_mask[:, None, :], best, 0.0)
    best = jnp.where(jnp.isfinite(best), best, 0.0)  # all-padding docs
    return jnp.sum(best, axis=-1)


class LateInteractionReranker:
    def __init__(self, embedder, *, budget_tokens: int = 8000):
        """`embedder` must expose `.state` (model/params), `.tokenizer`,
        and `.max_len` — the standard Embedder."""
        self.embedder = embedder
        self.budget_tokens = budget_tokens
        self._token_fwd = jax.jit(
            lambda params, ids, mask: embedder.state.model.apply(
                params, ids, mask, return_tokens=True)
        )

    def _encode_tokens(self, texts: Sequence[str], max_len: int):
        ids, mask = self.embedder.tokenizer.encode_batch(list(texts), max_len)
        _, tokens = self._token_fwd(self.embedder.state.params,
                                    jnp.asarray(ids), jnp.asarray(mask))
        return tokens, jnp.asarray(mask)

    def rerank(
        self,
        queries: Sequence[str],
        candidates: List[List[str]],
        *,
        top_k: Optional[int] = None,
    ) -> List[List[int]]:
        """Rerank per-query candidate texts; returns per-query orderings
        (indices into the candidate list, best first).

        The per-doc token budget is `budget_tokens // max(m, 1)`, clamped
        to the encoder window (parity: qdrant_handler.py:375).
        """
        q = len(queries)
        m = max((len(c) for c in candidates), default=0)
        if m == 0:
            return [[] for _ in queries]
        per_doc = max(16, min(self.embedder.max_len,
                              self.budget_tokens // m))
        q_tokens, q_mask = self._encode_tokens(queries, min(64, self.embedder.max_len))

        flat_docs: List[str] = []
        for c in candidates:
            flat_docs.extend(c + [""] * (m - len(c)))
        d_tokens, d_mask = self._encode_tokens(flat_docs, per_doc)
        td, dim = d_tokens.shape[-2], d_tokens.shape[-1]
        d_tokens = d_tokens.reshape(q, m, td, dim)
        d_mask = d_mask.reshape(q, m, td)
        # padded candidate slots must not outrank real ones
        real = np.zeros((q, m), dtype=bool)
        for i, c in enumerate(candidates):
            real[i, : len(c)] = True
        d_mask = jnp.logical_and(d_mask, jnp.asarray(real)[:, :, None])

        scores = np.asarray(maxsim_scores(q_tokens, q_mask, d_tokens, d_mask))
        scores = np.where(real, scores, -np.inf)
        order = np.argsort(-scores, axis=-1)
        out = []
        for i, c in enumerate(candidates):
            ranked = [int(j) for j in order[i] if j < len(c)]
            out.append(ranked[: top_k or len(c)])
        return out
