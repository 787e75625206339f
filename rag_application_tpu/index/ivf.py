"""IVF-flat ANN engine: coarse k-means partitions scanned as slabs.

The reference's recall knob is Qdrant's HNSW `hnsw_ef` 128-512
(app/core/vector_store/qdrant/qdrant_handler.py:363-372). A graph walk
is a poor fit for the MXU (pointer-chasing gathers, divergent
frontiers); the TPU-native sublinear engine is an inverted-file scan:

  build:  spherical k-means on-device (assignment and centroid updates
          are both big matmuls), rows reordered cluster-contiguous into
          fixed-size BUCKETS of `bucket_rows` rows (padded with dead
          rows).
  query:  one (Q, C) centroid matmul ranks clusters; each bucket
          inherits its cluster's score, so `probes` buckets per query
          is a fixed slab budget regardless of cluster-size skew (big
          clusters simply contribute more buckets at the same score).
          The probed slabs gather as contiguous (R, d) blocks — slab
          gathers are >= 1 KB/row, the regime where XLA gathers run at
          full HBM rate (CLAUDE.md) — then one int8 einsum scores
          (Q, P, R) on the MXU and an exact bf16 rescore of the top
          candidates restores full-precision cosines.

Rows inserted after a build land in an exact-scanned tail (no silent
recall decay — the tail is brute-forced until `rebuild_threshold`
triggers a rebuild), replacing the graph engine's unbounded entry
growth (VERDICT round 1).

`probes` is the `hnsw_ef` analogue: more probes = more recall, linear
cost. The scan funnel (ops/fused_topk) remains the default engine —
IVF earns its keep on single-query latency and on corpora too large to
full-scan per query.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rrf import INVALID_ID
from .dense import DenseIndex


@dataclass
class IVFSearchParams:
    probes: int = 128          # buckets scanned per query (the recall knob)
    rescore: bool = True       # exact bf16/int8 rescore of the candidates
    rescore_limit: int = 128   # candidates entering the exact rescore


@functools.partial(jax.jit, static_argnames=("n_clusters", "iters",
                                             "block_rows"))
def _kmeans_device(x: jax.Array, init: jax.Array, valid_n: jax.Array, *,
                   n_clusters: int, iters: int,
                   block_rows: int) -> jax.Array:
    """Spherical k-means: blocked assignment + one-hot-matmul updates.
    x: (N, d) f32 unit rows (N multiple of block_rows); rows >= valid_n
    are padding and contribute NOTHING (an unmasked zero pad row argmax-
    ties to cluster 0, making counts[0] > 0 with sums[0] unchanged —
    the empty-cluster guard would then zero that centroid instead of
    keeping it). Returns (C, d) unit centroids."""
    n, d = x.shape
    n_blocks = n // block_rows

    def step(cents, _):
        def body(carry, blk):
            sums, counts = carry
            xb = jax.lax.dynamic_slice_in_dim(x, blk * block_rows,
                                              block_rows, 0)
            scores = xb @ cents.T                       # (B, C)
            assign = jnp.argmax(scores, axis=-1)        # (B,)
            valid = (blk * block_rows
                     + jnp.arange(block_rows)) < valid_n
            onehot = (jax.nn.one_hot(assign, n_clusters, dtype=jnp.float32)
                      * valid[:, None].astype(jnp.float32))
            sums = sums + onehot.T @ xb                 # (C, d)
            counts = counts + jnp.sum(onehot, axis=0)
            return (sums, counts), None

        (sums, counts), _ = jax.lax.scan(
            body, (jnp.zeros((n_clusters, d), jnp.float32),
                   jnp.zeros((n_clusters,), jnp.float32)),
            jnp.arange(n_blocks))
        # empty clusters keep their previous centroid
        new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(
            counts[:, None], 1.0), cents)
        new = new / jnp.maximum(
            jnp.linalg.norm(new, axis=-1, keepdims=True), 1e-12)
        return new, None

    cents, _ = jax.lax.scan(step, init, None, length=iters)
    return cents


@functools.partial(jax.jit, static_argnames=("block_rows",))
def _assign_device(src: jax.Array, cents: jax.Array, *,
                   block_rows: int) -> jax.Array:
    """Blocked nearest-centroid assignment straight off the stored
    plane (int8/bf16): each block converts+normalizes in f32 on the fly,
    so the full corpus is never materialized at f32 (10M x 768 would be
    30 GB)."""
    n = src.shape[0]

    def body(_, blk):
        xb = jax.lax.dynamic_slice_in_dim(
            src, blk * block_rows, block_rows, 0).astype(jnp.float32)
        xb = xb * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(xb * xb, axis=-1, keepdims=True), 1e-12))
        return None, jnp.argmax(xb @ cents.T, axis=-1).astype(jnp.int32)

    _, out = jax.lax.scan(body, None, jnp.arange(n // block_rows))
    return out.reshape(-1)


@functools.partial(jax.jit, static_argnames=("k", "probes", "rescore_limit",
                                             "has_filter", "has_rescore"))
def _ivf_search(
    centroids: jax.Array,       # (C, d) f32 unit
    bucket_cluster: jax.Array,  # (NB,) int32
    bucket_tbl: jax.Array,      # (NB, R, d) int8
    bucket_rowids: jax.Array,   # (NB, R) int32, -1 = dead slot
    rescore_tbl: Optional[jax.Array],  # (cap, d) bf16 (or int8 cap mode)
    rescore_scale: float,
    row_recip: Optional[jax.Array],  # (cap,) per-row dequant (capacity
                                     # mode with int8_per_row_scale)
    tail_tbl: jax.Array,        # (T, d) int8 exact-scan tail (T may be 0)
    tail_rowids: jax.Array,     # (T,) int32
    queries: jax.Array,         # (Q, d) f32
    filter_mask: Optional[jax.Array],  # (cap,) bool
    k: int, probes: int, rescore_limit: int,
    has_filter: bool, has_rescore: bool,
) -> Tuple[jax.Array, jax.Array]:
    q = queries.astype(jnp.float32)
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    q8 = jnp.clip(jnp.round(q * 127.0), -127, 127).astype(jnp.int8)

    c_scores = q @ centroids.T                    # (Q, C)
    b_scores = c_scores[:, bucket_cluster]        # (Q, NB)
    p_eff = min(probes, b_scores.shape[-1])
    _, b_idx = jax.lax.top_k(b_scores, p_eff)

    # Probe-chunked scoring: XLA materializes the gathered slabs as s32
    # for the int8 einsum, so one shot at (Q, P, R, d) is
    # Q*P*R*d*4 bytes of HLO temp (12 GB at Q=256 P=256 R=64 d=768 —
    # OOM, measured). Chunk the probe axis so the temp stays ~1.5 GB;
    # scores/ids per chunk are tiny.
    qn, d_ = q.shape
    r = bucket_tbl.shape[1]
    chunk = max(1, min(p_eff, (1 << 31) // max(1, qn * r * d_ * 4)))
    n_chunks = -(-p_eff // chunk)
    pad = n_chunks * chunk - p_eff
    if pad:
        # pad probes point at bucket 0; their candidates are masked to
        # rowid -1 after scoring (probe_valid below), so they can never
        # rank — the pad only squares up the chunked scan shape
        b_idx = jnp.pad(b_idx, ((0, 0), (0, pad)))
    b_chunks = jnp.transpose(
        b_idx.reshape(qn, n_chunks, chunk), (1, 0, 2))

    def body(_, bc):
        slab = bucket_tbl[bc]                     # (Q, c, R, d)
        rid = bucket_rowids[bc]                   # (Q, c, R)
        sc = jnp.einsum("qd,qprd->qpr", q8, slab,
                        preferred_element_type=jnp.int32)
        return None, (sc.reshape(qn, -1).astype(jnp.float32),
                      rid.reshape(qn, -1))

    _, (sc_all, rid_all) = jax.lax.scan(body, None, b_chunks)
    scores = jnp.transpose(sc_all, (1, 0, 2)).reshape(qn, -1)
    rids = jnp.transpose(rid_all, (1, 0, 2)).reshape(qn, -1)
    if row_recip is not None:
        # per-row scaled int8 rows: raw dots are not comparable across
        # rows — restore the common cosine scale before ranking
        scores = scores * row_recip[jnp.clip(rids, 0,
                                             row_recip.shape[0] - 1)]
    if pad:
        # mask the duplicated padding probes so they cannot double-count
        probe_valid = jnp.arange(n_chunks * chunk) < p_eff
        probe_valid = jnp.repeat(probe_valid, r)
        rids = jnp.where(probe_valid[None, :], rids, -1)
    valid = rids >= 0
    if has_filter:
        valid &= filter_mask[jnp.clip(rids, 0, filter_mask.shape[0] - 1)]
    scores = jnp.where(valid, scores, -jnp.inf)

    # exact-scanned tail: rows inserted since the last build
    if tail_tbl.shape[0]:
        t_scores = (q8.astype(jnp.int32) @
                    tail_tbl.astype(jnp.int32).T).astype(jnp.float32)
        if row_recip is not None:
            t_scores = t_scores * row_recip[jnp.clip(
                tail_rowids, 0, row_recip.shape[0] - 1)][None, :]
        t_valid = tail_rowids >= 0
        if has_filter:
            t_valid &= filter_mask[jnp.clip(tail_rowids, 0,
                                            filter_mask.shape[0] - 1)]
        t_scores = jnp.where(t_valid[None, :], t_scores, -jnp.inf)
        scores = jnp.concatenate([scores, t_scores], axis=-1)
        rids = jnp.concatenate(
            [rids, jnp.broadcast_to(tail_rowids[None, :],
                                    (qn, tail_rowids.shape[0]))], axis=-1)

    kk = min(rescore_limit if has_rescore else k, scores.shape[-1])
    top, pos = jax.lax.top_k(scores, kk)
    ids = jnp.take_along_axis(rids, pos, axis=-1)

    if has_rescore:
        safe = jnp.clip(ids, 0, rescore_tbl.shape[0] - 1)
        g = rescore_tbl[safe].astype(jnp.float32)
        exact = jnp.einsum("qd,qcd->qc", q, g)
        exact = exact * (row_recip[safe] if row_recip is not None
                         else rescore_scale)
        exact = jnp.where(jnp.isfinite(top), exact, -jnp.inf)
        top, pos = jax.lax.top_k(exact, min(k, kk))
        ids = jnp.take_along_axis(ids, pos, axis=-1)
    else:
        # int8 dot -> approximate cosine (row factor already applied
        # when per-row scaled; only the query quantization remains)
        top = top / 127.0 if row_recip is not None else top / (127.0 * 127.0)
        top, ids = top[:, :k], ids[:, :k]
    ids = jnp.where(jnp.isfinite(top), ids, INVALID_ID)
    return top, ids


class IVFIndex:
    """Coarse-quantizer partition index over a DenseIndex's rows."""

    def __init__(self, dense: DenseIndex, centroids, bucket_cluster,
                 bucket_tbl, bucket_rowids, *, built_n: int,
                 bucket_rows: int, rebuild_threshold: float = 0.25):
        self.dense = dense
        self.centroids = centroids
        self.bucket_cluster = bucket_cluster
        self.bucket_tbl = bucket_tbl
        self.bucket_rowids = bucket_rowids
        self.built_n = built_n        # rows covered by the partition
        self.bucket_rows = bucket_rows
        self.rebuild_threshold = rebuild_threshold

    # ------------------------------------------------------------- build

    @classmethod
    def build(cls, dense: DenseIndex, *, n_clusters: int = 1024,
              bucket_rows: int = 64, iters: int = 10,
              train_sample: int = 262_144, seed: int = 0,
              block_rows: int = 65_536) -> "IVFIndex":
        n = dense.size
        if n == 0:
            raise ValueError("empty index")
        d = dense.cfg.dim
        n_clusters = int(min(n_clusters, max(1, n // max(bucket_rows, 8))))
        src = dense.vecs if dense.vecs is not None else dense.int8

        # training sample (full f32 rows, normalized) — stays on device;
        # only 4-byte ids cross the host boundary (the relay moves MBs/s)
        rng = np.random.default_rng(seed)
        n_train = min(n, train_sample)
        sel = (np.arange(n) if n_train == n
               else rng.choice(n, size=n_train, replace=False))
        # pad the training set to a block multiple
        blk = min(block_rows, 1 << max(8, (n_train - 1).bit_length()))
        pad = (-n_train) % blk
        train = src[jnp.asarray(sel)].astype(jnp.float32)
        train = train / jnp.maximum(
            jnp.linalg.norm(train, axis=-1, keepdims=True), 1e-12)
        if pad:
            train = jnp.concatenate(
                [train, jnp.zeros((pad, d), jnp.float32)])
        init = train[
            jnp.asarray(rng.choice(n_train, size=n_clusters, replace=False))]
        cents = _kmeans_device(train, init, jnp.asarray(n_train),
                               n_clusters=n_clusters,
                               iters=iters, block_rows=blk)

        # full assignment (blocked, off the stored plane — no f32 copy).
        # The capacity array is padded; assignments beyond n are dropped.
        a_blk = blk
        while src.shape[0] % a_blk:
            a_blk //= 2
        assign = np.asarray(_assign_device(src, cents,
                                           block_rows=max(a_blk, 1)))[:n]

        # host-side reorder into fixed-size buckets, cluster-contiguous
        order = np.argsort(assign, kind="stable")
        counts = np.bincount(assign, minlength=n_clusters)
        buckets_per_cluster = np.maximum(1, -(-counts // bucket_rows))
        n_buckets = int(buckets_per_cluster.sum())
        bucket_cluster = np.repeat(np.arange(n_clusters, dtype=np.int32),
                                   buckets_per_cluster)
        rowids = np.full((n_buckets, bucket_rows), -1, dtype=np.int32)
        b0 = np.concatenate([[0], np.cumsum(buckets_per_cluster)])[:-1]
        pos = 0
        for c in range(n_clusters):
            rows_c = order[pos:pos + counts[c]]
            pos += counts[c]
            flat = rowids[b0[c]:b0[c] + buckets_per_cluster[c]].reshape(-1)
            flat[:counts[c]] = rows_c
            rowids[b0[c]:b0[c] + buckets_per_cluster[c]] = flat.reshape(
                -1, bucket_rows)

        # slab table gathered ON DEVICE (a host round-trip of the int8
        # plane would cost minutes through the relay)
        rowids_dev = jnp.asarray(rowids)
        safe = jnp.where(rowids_dev >= 0, rowids_dev, 0)
        tbl = jnp.where((rowids_dev >= 0)[..., None],
                        dense.int8[safe], jnp.int8(0))
        out = cls(dense, cents, jnp.asarray(bucket_cluster),
                  tbl, rowids_dev,
                  built_n=n, bucket_rows=bucket_rows)
        # remembered so rebuild() reproduces THIS configuration instead
        # of silently reverting to defaults
        out._build_kw = dict(n_clusters=n_clusters, bucket_rows=bucket_rows,
                             iters=iters, train_sample=train_sample,
                             seed=seed, block_rows=block_rows)
        return out

    # ------------------------------------------------------------ queries

    @property
    def tail_rows(self) -> int:
        return self.dense.size - self.built_n

    @property
    def needs_rebuild(self) -> bool:
        return self.tail_rows > self.rebuild_threshold * max(self.built_n, 1)

    def search(self, queries, k: int = 10, *,
               params: Optional[IVFSearchParams] = None,
               filter_mask: Optional[jax.Array] = None
               ) -> Tuple[jax.Array, jax.Array]:
        p = params or IVFSearchParams()
        d = self.dense
        rescore_tbl = d.vecs if d.vecs is not None else d.int8
        rescore_scale = 1.0 if d.vecs is not None else 1.0 / 127.0
        tail_n = self.tail_rows
        # tail padded to a fixed bucket multiple: appends only recompile
        # when the padded size crosses a boundary
        t_pad = max(256, 1 << (max(1, tail_n) - 1).bit_length()) \
            if tail_n else 0
        if tail_n:
            tail_tbl = jax.lax.dynamic_slice_in_dim(
                d.int8, self.built_n, min(t_pad, d.int8.shape[0]
                                          - self.built_n), 0)
            tcur = tail_tbl.shape[0]
            if tcur < t_pad:
                tail_tbl = jnp.pad(tail_tbl, ((0, t_pad - tcur), (0, 0)))
            tail_ids = self.built_n + np.arange(t_pad, dtype=np.int32)
            tail_ids = jnp.asarray(
                np.where(tail_ids < d.size, tail_ids, -1))
        else:
            tail_tbl = jnp.zeros((0, d.cfg.dim), dtype=jnp.int8)
            tail_ids = jnp.zeros((0,), dtype=jnp.int32)
        live = d.live
        fm = live if filter_mask is None else jnp.logical_and(
            live, filter_mask)
        return _ivf_search(
            self.centroids, self.bucket_cluster, self.bucket_tbl,
            self.bucket_rowids, rescore_tbl if p.rescore else None,
            rescore_scale,
            getattr(d, "int8_recip", None) if d.vecs is None else None,
            tail_tbl, tail_ids,
            jnp.asarray(queries, dtype=jnp.float32), fm,
            k=k, probes=p.probes, rescore_limit=p.rescore_limit,
            has_filter=True, has_rescore=p.rescore)

    def insert_batch(self, rows: np.ndarray) -> None:
        """Rows already inserted into the DenseIndex join the exact-scan
        tail automatically (search covers [built_n, size)); call
        `rebuild()` when `needs_rebuild` to fold them into the
        partition."""
        # nothing to do: the tail is derived from dense.size
        del rows

    def rebuild(self, **kw) -> "IVFIndex":
        """Fold the tail into a fresh partition. Reuses the original
        build configuration (n_clusters/iters/...) unless overridden,
        and keeps this index's rebuild_threshold."""
        params = dict(getattr(self, "_build_kw", {}))
        params.update(kw)
        threshold = self.rebuild_threshold
        fresh = IVFIndex.build(self.dense, **params)
        self.__dict__.update(fresh.__dict__)
        self.rebuild_threshold = threshold
        return self

    # -------------------------------------------------------- persistence

    def save(self, path: str) -> None:
        """Centroids + partition layout to an npz (the dense shard
        checkpoints separately via index/checkpoint.py; the bucket slab
        table is NOT stored — it regathers from the int8 plane on load,
        keeping the file at ids + centroids size)."""
        import json

        np.savez(path,
                 centroids=np.asarray(self.centroids),
                 bucket_cluster=np.asarray(self.bucket_cluster),
                 bucket_rowids=np.asarray(self.bucket_rowids),
                 built_n=self.built_n, bucket_rows=self.bucket_rows,
                 rebuild_threshold=self.rebuild_threshold,
                 build_kw=json.dumps(getattr(self, "_build_kw", {})))

    @classmethod
    def load(cls, path: str, dense: DenseIndex) -> "IVFIndex":
        import json

        d = np.load(path)
        rowids = jnp.asarray(d["bucket_rowids"])
        safe = jnp.where(rowids >= 0, rowids, 0)
        tbl = jnp.where((rowids >= 0)[..., None],
                        dense.int8[safe], jnp.int8(0))
        out = cls(dense, jnp.asarray(d["centroids"]),
                  jnp.asarray(d["bucket_cluster"]), tbl, rowids,
                  built_n=int(d["built_n"]),
                  bucket_rows=int(d["bucket_rows"]),
                  rebuild_threshold=float(d["rebuild_threshold"]))
        # restore the build configuration so rebuild() after a restart
        # reproduces it instead of reverting to defaults
        if "build_kw" in d.files:
            kw = json.loads(str(d["build_kw"]))
            if kw:
                out._build_kw = kw
        return out
