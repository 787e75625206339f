"""Graph-ANN index: MXU-built neighborhood graph + batched beam query.

The reference's ANN tier is Qdrant's HNSW (built by incremental
pointer-chasing inserts, queried with `hnsw_ef` 128-512 — qdrant_handler
.py:363-372, hybrid_search_workflow.py:60). On TPU both halves invert:

  build  — the exact kNN graph of the corpus is computed with blocked
           MXU matmuls (the all-pairs scan a CPU could never afford is
           ~seconds of dense FLOPs here), then diversity-pruned on device
           with the relative-neighborhood rule. No insertion order, no
           level dice rolls: the build is deterministic and embarrassingly
           batchable. Incremental inserts append rows and link them
           through a beam search + prune (periodic full rebuild optional).
  query  — `ops.graph_ann.beam_search`: lockstep batched best-first
           search in the matryoshka prefix view + exact rescore.

The graph serves the regimes where the cascade scan loses: very large
corpora (sublinear work per query) and strict single-query latency.
`ef` maps 1:1 to the reference's `hnsw_ef` recall knob.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.graph_ann import beam_search, rng_prune
from ..ops.topk import blocked_topk
from .dense import DenseIndex


@dataclass
class GraphSearchParams:
    """Query-time knobs (parity: `hnsw_ef` in SearchParams,
    hybrid_search_workflow.py:8-19)."""

    ef: int = 128
    iters: int = 16
    expand: int = 4
    prefix_dim: Optional[int] = 64


class GraphIndex:
    def __init__(self, dense: DenseIndex, adj: jax.Array, entry_ids: np.ndarray,
                 *, m: int, built_size: int):
        self.dense = dense
        self.adj = adj              # (built_size + 1, m) int32; row N = sentinel
        self.entry_ids = entry_ids  # (S,) static entry sample
        self.m = m
        self.built_size = built_size

    # ---------------------------------------------------------------- build

    @classmethod
    def build(
        cls,
        dense: DenseIndex,
        *,
        m: int = 32,
        k_build: int = 64,
        entry_size: int = 512,
        batch: int = 1024,
        build_prefix_dim: Optional[int] = None,
        seed: int = 0,
    ) -> "GraphIndex":
        """Build the pruned kNN graph with blocked exact top-k.

        k_build candidates per node feed the RNG pruning down to degree m.
        """
        n = dense.size
        if n == 0:
            raise ValueError("empty index")
        if dense.vecs is None:
            raise ValueError(
                "graph-ANN build needs the bf16 plane (store_bf16=True); "
                "capacity mode trades the graph engine for corpus size")
        vecs = dense.vecs
        k_eff = min(k_build + 1, n)
        # prefix candidate scores must be COSINES (inverse prefix norms):
        # raw prefix dots are on a different scale than the full-dim gram
        # values rng_prune compares them against, which starved nodes of
        # edges
        build_inv = None
        if build_prefix_dim is not None:
            dims = dense.cfg.matryoshka_dims
            if build_prefix_dim not in dims:
                raise ValueError(
                    f"build_prefix_dim {build_prefix_dim} is not a "
                    f"matryoshka level {dims} (no inverse norms for it)")
            build_inv = dense.inv_norms[:, dims.index(build_prefix_dim)]

        cand_rows = []
        score_rows = []
        for start in range(0, n, batch):
            stop = min(n, start + batch)
            q = vecs[start:stop].astype(vecs.dtype)
            vals, ids = blocked_topk(
                vecs, q, k_eff,
                block_size=dense.cfg.block_size,
                valid_n=n,
                prefix_dim=build_prefix_dim,
                inv_norms=build_inv,
                approx=True,
                recall_target=0.98,
            )
            if build_prefix_dim is not None:
                # rescore candidates at full dim so rng_prune compares
                # like with like (prefix scores are scaled by the query's
                # prefix norm; the prune rule checks them against
                # full-dim candidate-candidate cosines)
                g = vecs[jnp.clip(ids, 0, n - 1)].astype(jnp.float32)
                vals = jnp.einsum("qd,qkd->qk", q.astype(jnp.float32), g)

            # drop self-matches: any slot equal to the node's own row
            self_ids = jnp.arange(start, stop, dtype=jnp.int32)[:, None]
            is_self = ids == self_ids
            vals = jnp.where(is_self, -jnp.inf, vals)
            order = jnp.argsort(-vals, axis=-1)[:, : k_eff - 1]
            ids = jnp.take_along_axis(ids, order, axis=-1)
            vals = jnp.take_along_axis(vals, order, axis=-1)
            cand_rows.append(ids)
            score_rows.append(vals)
        cand = jnp.concatenate(cand_rows, axis=0)
        scores = jnp.concatenate(score_rows, axis=0)

        adj_core = rng_prune(cand, scores, vecs, m, sentinel=n)
        # append the sentinel row (self-loops to sentinel)
        sentinel_row = jnp.full((1, m), n, dtype=jnp.int32)
        adj = jnp.concatenate([adj_core.astype(jnp.int32), sentinel_row], axis=0)

        rng = np.random.default_rng(seed)
        entry_ids = rng.choice(n, size=min(entry_size, n), replace=False).astype(
            np.int32
        )
        return cls(dense, adj, entry_ids, m=m, built_size=n)

    # ---------------------------------------------------------------- query

    def search(
        self,
        queries,
        k: int,
        *,
        params: Optional[GraphSearchParams] = None,
        filter_mask: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        p = params or GraphSearchParams()
        q = self.dense.normalize_queries(queries)
        nq = q.shape[0]
        ent = jnp.asarray(self.entry_ids)
        if len(self.entry_ids) > p.ef:
            # Entries are shared across queries — score them with ONE
            # (S, d) gather + matmul and hand each query only its top-ef.
            # Broadcasting all S entries into the beam would gather a
            # (Q, S, d) tensor (25 GiB at Q=2048, S=8192) for scores a
            # plain matmul yields. Large S is how clustered corpora stay
            # reachable (kNN graphs disconnect across well-separated
            # clusters; entries must cover them).
            evecs = self.dense.vecs[ent].astype(jnp.float32)  # (S, d)
            escore = q.astype(jnp.float32) @ evecs.T          # (Q, S)
            _, pos = jax.lax.approx_max_k(escore, p.ef)
            entries = ent[pos]                                 # (Q, ef)
        else:
            entries = jnp.broadcast_to(
                ent[None, :], (nq, len(self.entry_ids)))
        mask = self.dense.live
        if filter_mask is not None:
            mask = jnp.logical_and(mask, filter_mask)
        inv = None
        prefix_dim = p.prefix_dim
        if prefix_dim is not None:
            dims = self.dense.cfg.matryoshka_dims
            if prefix_dim in dims:
                inv = self.dense.inv_norms[:, dims.index(prefix_dim)]
            else:
                # no stored norms for this prefix: raw prefix dots are
                # on a different scale per row (the condition build()
                # raises on) — fall back to full-dim beam scoring
                # rather than rank on a biased score
                prefix_dim = None
        return beam_search(
            self.adj, self.dense.vecs, inv, q, entries, k,
            ef=p.ef, iters=p.iters, expand=p.expand,
            prefix_dim=prefix_dim, filter_mask=mask,
        )

    # -------------------------------------------------------- persistence

    def save(self, path: str) -> None:
        """Adjacency + entry sample to an npz (the dense shard checkpoints
        separately via index/checkpoint.py)."""
        np.savez(path, adj=np.asarray(self.adj), entry_ids=self.entry_ids,
                 m=self.m, built_size=self.built_size)

    @classmethod
    def load(cls, path: str, dense: DenseIndex) -> "GraphIndex":
        d = np.load(path)
        return cls(dense, jnp.asarray(d["adj"]), d["entry_ids"],
                   m=int(d["m"]), built_size=int(d["built_size"]))

    # ------------------------------------------------------------- updates

    def insert_batch(self, rows: np.ndarray, *, link_ef: int = 64) -> None:
        """Link newly inserted dense rows into the graph.

        Each new node beam-searches its neighbors through the existing
        graph, prunes them to degree m, and takes the resulting row in a
        grown adjacency matrix. New nodes join the entry sample so they
        are reachable before reverse edges exist; a periodic full rebuild
        restores the symmetric pruned graph.
        """
        rows = np.asarray(rows, dtype=np.int32)
        if rows.size == 0:
            return
        # exact-range check: min/max alone admits duplicated+missing ids
        # (e.g. [5,6,6,8] onto built_size 5), which would append pruned
        # rows positionally misaligned with their node ids
        if not np.array_equal(
                rows, np.arange(self.built_size,
                                self.built_size + len(rows), dtype=np.int32)):
            raise ValueError("insert_batch rows must extend the graph "
                             "contiguously (exactly arange(built_size, "
                             "built_size+len))")
        q = self.dense.vecs[rows].astype(jnp.float32)
        vals, ids = self.search(q, min(link_ef, self.built_size))
        new_n = self.built_size + len(rows)
        # prune each new node's candidates
        pruned = rng_prune(ids, vals, self.dense.vecs, self.m, sentinel=new_n)
        old_core = self.adj[:-1]
        # remap old sentinel (built_size) to the new sentinel value
        old_core = jnp.where(old_core == self.built_size, new_n, old_core)
        sentinel_row = jnp.full((1, self.m), new_n, dtype=jnp.int32)
        self.adj = jnp.concatenate(
            [old_core, pruned.astype(jnp.int32), sentinel_row], axis=0
        )
        self.built_size = new_n
        self.entry_ids = np.concatenate([self.entry_ids, rows])
