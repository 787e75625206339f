"""Multi-chip IVF: per-shard partitions, ICI top-k merge.

Parity surface: the reference's ANN recall knob is Qdrant HNSW hnsw_ef
(app/core/vector_store/qdrant/qdrant_handler.py:363-372) and its
"scale" story is adding service replicas; this is the ANN leg's
corpus-axis sharding (SURVEY §2.6 / §5.8).

The scan funnel shards rows and streams every byte of its shard per
batch (parallel/search.py); the IVF leg extends past that regime —
each device holds its own coarse partition over its corpus rows and a
query reads only `probes` slabs per shard, so total read volume stays
probes x slab_bytes x n_shards regardless of corpus size. Candidate
lists (k ids + scores per shard) all_gather over ICI and one top-k
merges, same template as `sharded_fused_hybrid`.

Build is per shard on the host controller (each shard's k-means sees
only its rows — global centroids are unnecessary because every shard
is probed); the stacked arrays pad to the widest shard.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..index.dense import DenseIndex
from ..index.ivf import IVFIndex, IVFSearchParams
from ..ops.rrf import INVALID_ID


def build_sharded_ivf(dense: DenseIndex, n_shards: int, *,
                      rows_per_shard: Optional[int] = None,
                      **build_kw) -> dict:
    """Partition dense rows [0, size) into contiguous shards and build
    one IVFIndex per shard. Returns stacked numpy arrays (leading axis =
    shard, padded to the widest shard) ready for `place_sharded_ivf`."""
    n = dense.size
    if rows_per_shard is None:
        rows_per_shard = -(-n // n_shards)
    parts: List[IVFIndex] = []
    for s in range(n_shards):
        lo = min(s * rows_per_shard, n)
        hi = min(lo + rows_per_shard, n)
        if hi <= lo:
            parts.append(None)
            continue
        shard_view = _ShardView(dense, lo, hi)
        parts.append(IVFIndex.build(shard_view, **build_kw))

    live = [p for p in parts if p is not None]
    c_max = max(p.centroids.shape[0] for p in live)
    nb_max = max(p.bucket_tbl.shape[0] for p in live)
    r = live[0].bucket_rows
    d = dense.cfg.dim

    cents = np.zeros((n_shards, c_max, d), np.float32)
    bcl = np.zeros((n_shards, nb_max), np.int32)
    btbl = np.zeros((n_shards, nb_max, r, d), np.int8)
    brid = np.full((n_shards, nb_max, r), -1, np.int32)
    nbs = np.zeros((n_shards,), np.int32)
    # capacity-mode per-row dequant factors (index/dense.py
    # int8_per_row_scale): raw int8 dots are NOT comparable across rows
    # without them — stacked bucket-aligned so the search multiplies in
    # place (the single-chip engine does the same, index/ivf.py)
    scaled = getattr(dense, "int8_recip", None) is not None \
        and dense.vecs is None
    brecip = (np.zeros((n_shards, nb_max, r), np.float32)
              if scaled else None)
    recip_host = (np.asarray(dense.int8_recip) if scaled else None)
    for s, p in enumerate(parts):
        if p is None:
            continue
        c, nb = p.centroids.shape[0], p.bucket_tbl.shape[0]
        cents[s, :c] = np.asarray(p.centroids)
        bcl[s, :nb] = np.asarray(p.bucket_cluster)
        btbl[s, :nb] = np.asarray(p.bucket_tbl)
        nbs[s] = nb
        rid = np.asarray(p.bucket_rowids)
        # shard-local ids -> global rows
        grid = np.where(rid >= 0, rid + s * rows_per_shard, -1)
        brid[s, :nb] = grid
        if scaled:
            brecip[s, :nb] = np.where(
                grid >= 0, recip_host[np.clip(grid, 0, len(recip_host) - 1)],
                0.0)
    out = {"centroids": cents, "bucket_cluster": bcl,
           "bucket_tbl": btbl, "bucket_rowids": brid, "n_buckets": nbs,
           "rows_per_shard": rows_per_shard}
    if scaled:
        out["bucket_recip"] = brecip
    return out


class _ShardView:
    """A DenseIndex-shaped window over rows [lo, hi) (build-only)."""

    def __init__(self, dense: DenseIndex, lo: int, hi: int):
        self.cfg = dense.cfg
        self.size = hi - lo
        self.vecs = (dense.vecs[lo:hi] if dense.vecs is not None else None)
        self.int8 = dense.int8[lo:hi]
        self.int8_recip = (dense.int8_recip[lo:hi]
                           if getattr(dense, "int8_recip", None) is not None
                           else None)
        self.live = dense.live[lo:hi]


def place_sharded_ivf(mesh: Mesh, stacked: dict, *, axis: str = "data"):
    """Device-put the stacked build output shard-major on the mesh."""
    def put(x, spec):
        return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))

    return {
        "centroids": put(stacked["centroids"], P(axis, None, None)),
        "bucket_cluster": put(stacked["bucket_cluster"], P(axis, None)),
        "bucket_tbl": put(stacked["bucket_tbl"], P(axis, None, None, None)),
        "bucket_rowids": put(stacked["bucket_rowids"], P(axis, None, None)),
        "n_buckets": put(stacked["n_buckets"], P(axis)),
        "bucket_recip": (put(stacked["bucket_recip"], P(axis, None, None))
                         if "bucket_recip" in stacked else None),
        "rows_per_shard": stacked["rows_per_shard"],
    }


def sharded_ivf_search(
    mesh: Mesh,
    placed: dict,
    queries: jax.Array,                 # (Q, d) f32 replicated
    k: int,
    *,
    axis: str = "data",
    probes: int = 64,
    rescore_vecs: Optional[jax.Array] = None,  # (N, d) bf16 row-sharded
                                               # exact-rescore plane
    rescore_limit: int = 128,
) -> Tuple[jax.Array, jax.Array]:
    """Every shard probes its own partition; per-shard top-k lists merge
    over ICI. With `rescore_vecs` the shard exact-rescores its
    candidates before the merge (scores comparable across shards —
    cosines either way)."""
    rows_per_shard = placed["rows_per_shard"]
    has_rescore = rescore_vecs is not None
    has_recip = placed.get("bucket_recip") is not None

    def local(cents_s, bcl_s, btbl_s, brid_s, nb_s, brcp_s, v_s, q):
        shard_id = jax.lax.axis_index(axis)
        start = shard_id * rows_per_shard
        cents, bcl = cents_s[0], bcl_s[0]
        btbl, brid = btbl_s[0], brid_s[0]
        nb = nb_s[0]
        brcp = brcp_s[0] if has_recip else None

        qn = q.shape[0]
        qf = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True),
                             1e-12)
        q8 = jnp.clip(jnp.round(qf * 127.0), -127, 127).astype(jnp.int8)
        b_scores = (qf @ cents.T)[:, bcl]
        # padding buckets (beyond this shard's real count) never probed
        pad_mask = jnp.arange(b_scores.shape[-1]) < nb
        b_scores = jnp.where(pad_mask[None, :], b_scores, -jnp.inf)
        p_eff = min(probes, b_scores.shape[-1])
        _, b_idx = jax.lax.top_k(b_scores, p_eff)

        # probe-chunked scoring: XLA materializes the gathered slabs as
        # s32 for the int8 einsum (Q*P*R*d*4 bytes of HLO temp — the
        # exact OOM the single-chip engine chunks for, index/ivf.py)
        d_ = q.shape[1]
        r = btbl.shape[1]
        chunk = max(1, min(p_eff, (1 << 31) // max(1, qn * r * d_ * 4)))
        n_chunks = -(-p_eff // chunk)
        cpad = n_chunks * chunk - p_eff
        if cpad:
            b_idx = jnp.pad(b_idx, ((0, 0), (0, cpad)))
        b_chunks = jnp.transpose(
            b_idx.reshape(qn, n_chunks, chunk), (1, 0, 2))

        def body(_, bc):
            slab = btbl[bc]
            rid = brid[bc]
            s_ = jnp.einsum("qd,qprd->qpr", q8, slab,
                            preferred_element_type=jnp.int32
                            ).astype(jnp.float32)
            if brcp is not None:
                s_ = s_ * brcp[bc]
            return None, (s_.reshape(qn, -1), rid.reshape(qn, -1))

        _, (sc_all, rid_all) = jax.lax.scan(body, None, b_chunks)
        sc = jnp.transpose(sc_all, (1, 0, 2)).reshape(qn, -1)
        rids = jnp.transpose(rid_all, (1, 0, 2)).reshape(qn, -1)
        if cpad:
            probe_valid = jnp.repeat(
                jnp.arange(n_chunks * chunk) < p_eff, r)
            rids = jnp.where(probe_valid[None, :], rids, -1)
        sc = jnp.where(rids >= 0, sc, -jnp.inf)
        kk = min(rescore_limit if has_rescore else k, sc.shape[-1])
        top, pos = jax.lax.top_k(sc, kk)
        ids = jnp.take_along_axis(rids, pos, axis=-1)
        if has_rescore:
            local_ids = jnp.clip(ids - start, 0, v_s.shape[0] - 1)
            g = v_s[local_ids].astype(jnp.float32)
            exact = jnp.einsum("qd,qcd->qc", qf, g)
            exact = jnp.where(jnp.isfinite(top), exact, -jnp.inf)
            top, pos = jax.lax.top_k(exact, min(k, kk))
            ids = jnp.take_along_axis(ids, pos, axis=-1)
        else:
            # per-row scaled rows already carry their factor; only the
            # query quantization remains
            top = top / 127.0 if has_recip else top / (127.0 * 127.0)
            top, ids = top[:, :k], ids[:, :k]
        ids = jnp.where(jnp.isfinite(top), ids, INVALID_ID)

        all_v = jax.lax.all_gather(top, axis)
        all_i = jax.lax.all_gather(ids, axis)
        s, qn2, kk2 = all_v.shape
        all_v = jnp.transpose(all_v, (1, 0, 2)).reshape(qn2, s * kk2)
        all_i = jnp.transpose(all_i, (1, 0, 2)).reshape(qn2, s * kk2)
        out_v, out_pos = jax.lax.top_k(all_v, min(k, s * kk2))
        out_i = jnp.take_along_axis(all_i, out_pos, axis=-1)
        return out_v, jnp.where(jnp.isfinite(out_v), out_i, INVALID_ID)

    specs = [P(axis, None, None), P(axis, None),
             P(axis, None, None, None), P(axis, None, None), P(axis),
             P(axis, None, None)]
    n_shards_ = placed["bucket_tbl"].shape[0]
    brcp_arg = placed["bucket_recip"] if has_recip else jax.device_put(
        jnp.zeros((n_shards_, 1, 1), jnp.float32),
        NamedSharding(mesh, P(axis, None, None)))
    args = [placed["centroids"], placed["bucket_cluster"],
            placed["bucket_tbl"], placed["bucket_rowids"],
            placed["n_buckets"], brcp_arg]
    if has_rescore:
        specs.append(P(axis, None))
        args.append(rescore_vecs)
        fn = local
    else:
        specs.append(P(axis, None))
        args.append(jax.device_put(
            jnp.zeros((mesh.shape[axis], 1), jnp.bfloat16),
            NamedSharding(mesh, P(axis, None))))
        fn = local
    search = functools.partial(
        shard_map, mesh=mesh, in_specs=tuple(specs) + (P(),),
        out_specs=(P(), P()), check_vma=False,
    )(fn)
    return search(*args, queries)
