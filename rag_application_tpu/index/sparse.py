"""Host-side BM25 index builder feeding the device kernels.

Replaces the reference's delegated sparse stack (fastembed "Qdrant/bm25"
encoding + Qdrant's in-RAM sparse index, app/core/embedding/
embedding_handler.py:101-142, qdrant_handler.py:81-86). Documents are
analyzed on the host into term-frequency maps; `rebuild()` materializes
two dense device views:

  * term-major: (V_pad, P) impact-ordered postings (doc ids + weights)
  * doc-major:  (N+1, L) per-doc top-L terms by impact (exact-rescore view)

Both are fixed-shape and bucket-padded so repeated rebuilds reuse the
compiled `bm25_topk` executable. Inserts/deletes mark the index dirty;
the next search triggers a rebuild (bulk-ingest friendly — the reference
likewise re-upserts whole pages, IndexerAPI neo4j_handler.py:154-203).
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SparseConfig
from ..utils import round_up
from ..ops.bm25 import bm25_topk
from .analyzer import Analyzer


def bm25_idf(n_docs: int, df: np.ndarray) -> np.ndarray:
    """Lucene/fastembed BM25 idf: ln(1 + (N - df + 0.5)/(df + 0.5))."""
    return np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


class SparseIndex:
    def __init__(self, config: Optional[SparseConfig] = None,
                 analyzer: Optional[Analyzer] = None):
        self.cfg = config or SparseConfig()
        self.analyzer = analyzer or Analyzer()
        # Host state: per-doc term-frequency maps, aligned with dense rows.
        self._doc_tfs: List[Optional[Counter]] = []
        self._doc_lens: List[int] = []
        self._dirty = True
        self._device: Optional[dict] = None

    # ------------------------------------------------------------------ host

    def __len__(self) -> int:
        return len(self._doc_tfs)

    def add(self, text: str) -> int:
        """Analyze + append one document; returns its row id."""
        tids = self.analyzer.encode(text, grow=True)
        row = len(self._doc_tfs)
        self._doc_tfs.append(Counter(tids))
        self._doc_lens.append(len(tids))
        self._dirty = True
        return row

    def add_batch(self, texts: Sequence[str]) -> List[int]:
        return [self.add(t) for t in texts]

    def delete(self, row: int) -> None:
        """Tombstone a row (parity: page-level DETACH DELETE re-ingest,
        IndexerAPI neo4j_handler.py:161-169)."""
        self._doc_tfs[row] = None
        self._doc_lens[row] = 0
        self._dirty = True

    # ---------------------------------------------------------------- build

    def rebuild(self) -> None:
        cfg = self.cfg
        n = len(self._doc_tfs)
        v = len(self.analyzer)
        # Bucket-pad shapes so recompiles only happen on large growth.
        v_pad = max(256, 1 << math.ceil(math.log2(v + 1))) if v else 256

        df = np.zeros(v, dtype=np.int64)
        for tf in self._doc_tfs:
            if tf:
                for tid in tf:
                    df[tid] += 1
        total_len = sum(self._doc_lens)
        live = sum(1 for t in self._doc_tfs if t)
        avgdl = (total_len / live) if live else 1.0
        idf = bm25_idf(max(live, 1), np.maximum(df, 0))

        # Per-(term, doc) impact weights.
        post_lists: List[List[Tuple[float, int]]] = [[] for _ in range(v)]
        doc_entries: List[List[Tuple[float, int]]] = []
        k1, b = cfg.k1, cfg.b
        for row, tf_map in enumerate(self._doc_tfs):
            entries: List[Tuple[float, int]] = []
            if tf_map:
                dl = self._doc_lens[row]
                norm = k1 * (1.0 - b + b * dl / avgdl)
                for tid, tf in tf_map.items():
                    w = float(idf[tid]) * tf * (k1 + 1.0) / (tf + norm)
                    post_lists[tid].append((w, row))
                    entries.append((w, tid))
            doc_entries.append(entries)

        p = min(cfg.max_postings_per_term,
                round_up(max((len(pl) for pl in post_lists), default=1), 128))
        p = max(p, 128)
        l = min(cfg.max_terms_per_doc,
                round_up(max((len(e) for e in doc_entries), default=1), 32))
        l = max(l, 32)

        post_docs = np.full((v_pad, p), n, dtype=np.int32)
        post_w = np.zeros((v_pad, p), dtype=np.float32)
        for tid, plist in enumerate(post_lists):
            plist.sort(reverse=True)  # impact-ordered; truncation keeps top-P
            for j, (w, row) in enumerate(plist[:p]):
                post_docs[tid, j] = row
                post_w[tid, j] = w

        doc_terms = np.full((n + 1, l), -1, dtype=np.int32)
        doc_w = np.zeros((n + 1, l), dtype=np.float32)
        for row, entries in enumerate(doc_entries):
            entries.sort(reverse=True)
            for j, (w, tid) in enumerate(entries[:l]):
                doc_terms[row, j] = tid
                doc_w[row, j] = w

        self._device = {
            "post_docs": jnp.asarray(post_docs),
            "post_weights": jnp.asarray(post_w),
            "doc_terms": jnp.asarray(doc_terms),
            "doc_weights": jnp.asarray(doc_w),
            "v_pad": v_pad,
        }
        self._dirty = False

    # ---------------------------------------------------------------- query

    def encode_queries(self, queries: Sequence[str]) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Queries -> (q_rows, q_terms, q_valid), fixed width T."""
        t = self.cfg.max_query_terms
        if self._device is None:
            raise RuntimeError("rebuild() before querying")
        v_pad = self._device["v_pad"]
        q_rows = np.full((len(queries), t), v_pad - 1, dtype=np.int32)
        q_terms = np.full((len(queries), t), -2, dtype=np.int32)
        q_valid = np.zeros((len(queries), t), dtype=bool)
        for i, qtext in enumerate(queries):
            tids = list(dict.fromkeys(self.analyzer.encode(qtext, grow=False)))[:t]
            for j, tid in enumerate(tids):
                q_rows[i, j] = tid
                q_terms[i, j] = tid
                q_valid[i, j] = True
        return jnp.asarray(q_rows), jnp.asarray(q_terms), jnp.asarray(q_valid)

    def search(
        self,
        queries: Sequence[str],
        k: int,
        *,
        filter_mask: Optional[jax.Array] = None,
        approx: bool = True,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """BM25 top-k. Returns (scores (Q,k), rows (Q,k)); empty slots have
        row == len(self) and score -inf."""
        if self._dirty:
            self.rebuild()
        dv = self._device
        q_rows, q_terms, q_valid = self.encode_queries(queries)
        scores, ids = bm25_topk(
            dv["post_docs"], dv["post_weights"],
            dv["doc_terms"], dv["doc_weights"],
            q_rows, q_terms, q_valid, k,
            pool=self.cfg.candidate_pool,
            filter_mask=filter_mask,
            approx=approx,
        )
        return np.asarray(scores), np.asarray(ids)

    # ------------------------------------------------------------ reference

    def exact_scores(self, query: str) -> np.ndarray:
        """Exact host-side BM25 scores for every doc (test oracle)."""
        tids = set(self.analyzer.encode(query, grow=False))
        n = len(self._doc_tfs)
        df = Counter()
        for tf in self._doc_tfs:
            if tf:
                df.update(tf.keys())
        live = sum(1 for t in self._doc_tfs if t)
        total_len = sum(self._doc_lens)
        avgdl = (total_len / live) if live else 1.0
        k1, b = self.cfg.k1, self.cfg.b
        out = np.zeros(n, dtype=np.float64)
        for row, tf_map in enumerate(self._doc_tfs):
            if not tf_map:
                continue
            dl = self._doc_lens[row]
            norm = k1 * (1.0 - b + b * dl / avgdl)
            for tid in tids:
                tf = tf_map.get(tid, 0)
                if tf:
                    idf = math.log(1.0 + (live - df[tid] + 0.5) / (df[tid] + 0.5))
                    out[row] += idf * tf * (k1 + 1.0) / (tf + norm)
        return out
