"""Multi-chip sharded search: corpus rows over the mesh, merge over ICI.

The TPU-native replacement for the reference's "scale by adding services"
story (SURVEY §5.8): a corpus larger than one chip's HBM shards its rows
across devices; every device scans its shard with the same blocked
top-k kernel; per-shard candidate lists all-gather over ICI and a fused
top-k merge produces the global result. This is the exact structural
analogue of the multi-slice recipe (candidate lists are tiny — k ids +
scores per shard — so the collective moves KBs, not the corpus).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.topk import blocked_topk


def sharded_topk(
    mesh: Mesh,
    corpus: jax.Array,
    queries: jax.Array,
    k: int,
    *,
    axis: str = "data",
    valid_n: Optional[int] = None,
    block_size: int = 131072,
    approx: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Global top-k over a row-sharded corpus.

    Args:
      corpus: (N, d) with N divisible by mesh.shape[axis]; rows sharded
        over ``axis`` (place with `NamedSharding(mesh, P(axis, None))`).
      queries: (Q, d), replicated.
      valid_n: logical corpus size (global row count).

    Returns replicated (vals (Q, k), idx (Q, k)) with global row indices.
    """
    n, d = corpus.shape
    n_shards = mesh.shape[axis]
    if n % n_shards:
        raise ValueError(f"corpus rows {n} not divisible by {n_shards} shards")
    rows_per_shard = n // n_shards
    if valid_n is None:
        valid_n = n

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def search(corpus_shard, q):
        shard_id = jax.lax.axis_index(axis)
        start = shard_id * rows_per_shard
        # Rows beyond the logical size are padding on the last shard.
        local_valid = jnp.clip(valid_n - start, 0, rows_per_shard)
        vals, idx = blocked_topk(
            corpus_shard, q, k,
            block_size=min(block_size, rows_per_shard),
            approx=approx,
        )
        col = jax.lax.broadcasted_iota(jnp.int32, idx.shape, 1)
        in_range = idx < local_valid
        vals = jnp.where(in_range, vals, -jnp.inf)
        idx = idx + start
        # Gather every shard's candidates and merge: (S, Q, k) -> (Q, S*k).
        all_vals = jax.lax.all_gather(vals, axis)
        all_idx = jax.lax.all_gather(idx, axis)
        s = all_vals.shape[0]
        qn = all_vals.shape[1]
        all_vals = jnp.transpose(all_vals, (1, 0, 2)).reshape(qn, s * vals.shape[-1])
        all_idx = jnp.transpose(all_idx, (1, 0, 2)).reshape(qn, s * vals.shape[-1])
        top_vals, pos = jax.lax.top_k(all_vals, k)
        top_idx = jnp.take_along_axis(all_idx, pos, axis=-1)
        return top_vals, top_idx

    return search(corpus, queries)


def shard_corpus(mesh: Mesh, corpus, *, axis: str = "data") -> jax.Array:
    """Pad rows to a shard multiple and place them row-sharded on the mesh."""
    corpus = jnp.asarray(corpus)
    n_shards = mesh.shape[axis]
    n = corpus.shape[0]
    pad = (-n) % n_shards
    if pad:
        corpus = jnp.pad(corpus, ((0, pad), (0, 0)))
    return jax.device_put(corpus, NamedSharding(mesh, P(axis, None)))


def sharded_hybrid_topk(
    mesh: Mesh,
    vecs: jax.Array,       # (N, d) bf16/f32 row-sharded over `axis`
    int8: jax.Array,       # (N, d) int8 row-sharded
    queries: jax.Array,    # (Q, d) f32 replicated, unit-norm
    k: int,
    *,
    axis: str = "data",
    candidates: int = 64,
    block_size: int = 8192,
) -> Tuple[jax.Array, jax.Array]:
    """Multi-chip dense funnel: per-shard int8 scan -> per-shard exact
    bf16 rescore of local candidates -> all-gather of (k cand/shard) ->
    global top-k. Only candidate lists (KBs) ride the ICI; the corpus
    never moves. The structural template for sharding the full hybrid
    funnel (the sparse branch shards the same way: doc-major rows are
    corpus-row-aligned)."""
    n = vecs.shape[0]
    n_shards = mesh.shape[axis]
    if n % n_shards:
        raise ValueError(f"{n} rows not divisible by {n_shards}")
    rows_per_shard = n // n_shards

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def search(v_shard, i8_shard, q):
        shard_id = jax.lax.axis_index(axis)
        start = shard_id * rows_per_shard
        q8 = jnp.clip(jnp.round(q * 127.0), -127, 127).astype(jnp.int8)
        _, cand = blocked_topk(
            i8_shard, q8, candidates,
            block_size=min(block_size, rows_per_shard), approx=True,
        )
        # exact local rescore at full precision
        g = v_shard[jnp.clip(cand, 0, rows_per_shard - 1)].astype(jnp.float32)
        exact = jnp.einsum("qd,qcd->qc", q.astype(jnp.float32), g)
        top, pos = jax.lax.top_k(exact, min(k, candidates))
        idx = jnp.take_along_axis(cand, pos, axis=-1) + start
        all_v = jax.lax.all_gather(top, axis)
        all_i = jax.lax.all_gather(idx, axis)
        s, qn, kk = all_v.shape
        all_v = jnp.transpose(all_v, (1, 0, 2)).reshape(qn, s * kk)
        all_i = jnp.transpose(all_i, (1, 0, 2)).reshape(qn, s * kk)
        out_v, out_pos = jax.lax.top_k(all_v, k)
        return out_v, jnp.take_along_axis(all_i, out_pos, axis=-1)

    return search(vecs, int8, queries)


def sharded_fused_hybrid(
    mesh: Mesh,
    vecs: Optional[jax.Array],  # (S*R, d) bf16/f32 row-sharded over `axis`,
                                # or None (capacity mode: int8-only shards,
                                # rescore dequantizes — 80M+ rows on a v5e-8)
    int8: jax.Array,        # (S*R, d) int8 row-sharded
    inv_norms: Optional[jax.Array],  # (S*R, M) f32 row-sharded (matryoshka
                                     # prefix norms; None disables cascade)
    live: jax.Array,        # (S*R,) bool row-sharded
    post_packed: Optional[jax.Array],  # (S, V_pad, P) int32 stacked postings
    doc_packed: Optional[jax.Array],   # (S, R+1, 2L) int32 stacked doc views
    queries: jax.Array,      # (Q, d) f32 replicated
    q_rows: Optional[jax.Array],       # (Q, T) int32 replicated
    q_terms: Optional[jax.Array],      # (Q, T) int32 replicated
    q_valid: Optional[jax.Array],      # (Q, T) bool replicated
    k: int,
    *,
    axis: str = "data",
    spec: Optional["FusedSpec"] = None,
    valid_n: Optional[int] = None,     # global logical row count
    filter_mask: Optional[jax.Array] = None,  # (S*R,) bool row-sharded
    int8_recip: Optional[jax.Array] = None,   # (S*R,) f32 row-sharded
                                              # (capacity-mode per-row
                                              # dequant, index/dense.py)
    quantized_limit: int = 64,
    dense_limit: int = 48,
    sparse_limit: int = 32,
    sparse_pool: int = 64,
    block_size: int = 8192,
) -> Tuple[jax.Array, jax.Array]:
    """The FULL hybrid funnel over a row-sharded corpus, merged over ICI
    with one all-gather of per-shard top-k lists.

    Each shard runs `search.fused.fused_core` — the *same* function the
    single-chip engine jits — on its local slab (matryoshka cascade,
    int8 scan, packed-postings BM25 with global statistics
    (parallel/sparse.py), exact rescore of the deduped union), so
    multi-chip results match the single-chip funnel by construction:
    with per-shard limits >= the single-chip limits each shard's
    candidate set is a superset of the single-chip candidates that live
    on it, scores come from the identical scoring path, and the ICI
    merge is a plain top-k over comparable scores
    (tests/test_parallel.py asserts result equality on an 8-device
    mesh). Pass `spec` for full control (matryoshka dims/limits etc.);
    the legacy keyword knobs build an int8+sparse-only spec."""
    from ..ops.rrf import INVALID_ID
    from ..search.fused import FusedSpec, fused_core

    cap_mode = vecs is None
    n = int8.shape[0]
    n_shards = mesh.shape[axis]
    if n % n_shards:
        raise ValueError(f"{n} rows not divisible by {n_shards}")
    rows_per_shard = n // n_shards
    g_valid = n if valid_n is None else int(valid_n)

    if spec is None:
        spec = FusedSpec(
            k=k, matryoshka_dims=(), matryoshka_limits=(),
            dense_limit=dense_limit, quantized_limit=quantized_limit,
            sparse_limit=sparse_limit, sparse_pool=sparse_pool,
            rrf_k=60, block_size=block_size, recall_target=1.0,
            use_int8=quantized_limit > 0)
    has_sparse = spec.sparse_limit > 0 and post_packed is not None
    spec = spec._replace(
        k=k,
        block_size=min(spec.block_size, rows_per_shard),
        # per-shard slabs run the XLA scan (the Pallas kernel is the
        # single-chip fast path; inside shard_map the XLA path fuses fine)
        scan_impl="xla", scan_prefix_dim=0,
        sparse_limit=spec.sparse_limit if has_sparse else 0,
        has_filter=filter_mask is not None,
        matryoshka_dims=() if cap_mode else spec.matryoshka_dims,
        # shard-local RRF ranks are not globally comparable (a shard's
        # rank-1 may be the global rank-50), so the sharded funnel
        # always merges exact dense scores; final_fusion="rrf" is a
        # single-chip serving feature (weak-encoder rescue)
        final_fusion="dense",
    )

    # shard_map needs concrete arrays for every slot: absent planes get
    # row-aligned dummies (never read — the spec disables their branch)
    if inv_norms is None:
        m = len(spec.matryoshka_dims)
        if m:
            raise ValueError("matryoshka cascade needs inv_norms")
        inv_norms = jax.device_put(
            jnp.zeros((n, 0), dtype=jnp.float32),
            NamedSharding(mesh, P(axis, None)))
    if filter_mask is None:
        fm = live
    else:
        fm = filter_mask
    use_recip = cap_mode and int8_recip is not None
    if not use_recip:
        int8_recip = jax.device_put(
            jnp.zeros((n,), dtype=jnp.float32),
            NamedSharding(mesh, P(axis)))
    if not has_sparse:
        post_packed = jax.device_put(
            jnp.zeros((n_shards, 1, 1), dtype=jnp.int32),
            NamedSharding(mesh, P(axis, None, None)))
        doc_packed = jax.device_put(
            jnp.zeros((n_shards, rows_per_shard + 1, 2), dtype=jnp.int32),
            NamedSharding(mesh, P(axis, None, None)))
        qn = queries.shape[0]
        q_rows = q_terms = jnp.zeros((qn, 1), dtype=jnp.int32)
        q_valid = jnp.zeros((qn, 1), dtype=bool)

    def funnel(v_s, i8_s, inv_s, live_s, fm_s, recip_s, post_s, docp_s,
               q, qr, qt, qv):
        shard_id = jax.lax.axis_index(axis)
        start = shard_id * rows_per_shard
        local_valid = jnp.clip(g_valid - start, 0, rows_per_shard)
        sparse_arrays = (post_s[0], None, docp_s[0]) if spec.sparse_limit \
            else None
        sparse_queries = (qr, qt, qv) if spec.sparse_limit else None
        top, ids = fused_core(
            v_s, i8_s, inv_s, live_s, local_valid.astype(jnp.int32), q,
            fm_s if spec.has_filter else None,
            sparse_arrays, sparse_queries, spec,
            int8_recip=recip_s if use_recip else None)
        idx = jnp.where(ids != INVALID_ID, ids + start, INVALID_ID)

        # ICI merge: candidate lists only (KBs)
        all_v = jax.lax.all_gather(top, axis)
        all_i = jax.lax.all_gather(idx, axis)
        s, qn, kk = all_v.shape
        all_v = jnp.transpose(all_v, (1, 0, 2)).reshape(qn, s * kk)
        all_i = jnp.transpose(all_i, (1, 0, 2)).reshape(qn, s * kk)
        out_v, out_pos = jax.lax.top_k(all_v, min(k, s * kk))
        out_i = jnp.take_along_axis(all_i, out_pos, axis=-1)
        return out_v, jnp.where(jnp.isfinite(out_v), out_i, INVALID_ID)

    common_specs = (P(axis, None), P(axis, None), P(axis), P(axis),
                    P(axis),
                    P(axis, None, None), P(axis, None, None),
                    P(), P(), P(), P())
    if cap_mode:
        search = functools.partial(
            shard_map, mesh=mesh, in_specs=common_specs,
            out_specs=(P(), P()), check_vma=False,
        )(lambda i8_s, *rest: funnel(None, i8_s, *rest))
        return search(int8, inv_norms, live, fm, int8_recip,
                      post_packed, doc_packed,
                      queries, q_rows, q_terms, q_valid)
    search = functools.partial(
        shard_map, mesh=mesh, in_specs=(P(axis, None),) + common_specs,
        out_specs=(P(), P()), check_vma=False,
    )(funnel)
    return search(vecs, int8, inv_norms, live, fm, int8_recip,
                  post_packed, doc_packed,
                  queries, q_rows, q_terms, q_valid)


def sharded_topk_dryrun(mesh: Mesh) -> None:
    """Tiny-shape execution of the sharded search path (driver dry run)."""
    axis = "data"
    n_shards = mesh.shape[axis]
    rng = np.random.default_rng(0)
    n, d, q, k = n_shards * 32, 64, 4, 5
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    queries = corpus[:q] + 0.01 * rng.standard_normal((q, d)).astype(np.float32)

    sharded = shard_corpus(mesh, corpus, axis=axis)
    vals, idx = sharded_topk(mesh, sharded, jnp.asarray(queries), k,
                             axis=axis, valid_n=n, approx=False)
    idx = np.asarray(idx)
    assert (idx[:, 0] == np.arange(q)).all(), f"self-retrieval failed: {idx[:, 0]}"

    # the two-stage sharded funnel (int8 scan -> exact rescore -> merge)
    int8 = np.clip(np.round(corpus * 127), -127, 127).astype(np.int8)
    int8_sharded = jax.device_put(
        jnp.asarray(int8), NamedSharding(mesh, P(axis, None)))
    v2, i2 = sharded_hybrid_topk(mesh, sharded, int8_sharded,
                                 jnp.asarray(queries), k, axis=axis,
                                 candidates=8, block_size=32)
    i2 = np.asarray(i2)
    assert (i2[:, 0] == np.arange(q)).all(), f"hybrid shard failed: {i2[:, 0]}"

    # the FULL sharded funnel: dense + local BM25 + exact rescore + merge
    from ..config import SparseConfig
    from ..index.sparse import SparseIndex
    from .sparse import build_sharded_sparse

    words = "fox dog tensor unit sparse dense graph node".split()
    sparse = SparseIndex(SparseConfig(candidate_pool=32, max_query_terms=8))
    sparse.add_batch([" ".join(rng.choice(words, size=5)) for _ in range(n)])
    sh = build_sharded_sparse(sparse, n_shards)
    live = jax.device_put(jnp.ones((n,), dtype=bool),
                          NamedSharding(mesh, P(axis)))
    post = jax.device_put(jnp.asarray(sh["post_packed"]),
                          NamedSharding(mesh, P(axis, None, None)))
    docp = jax.device_put(jnp.asarray(sh["doc_packed"]),
                          NamedSharding(mesh, P(axis, None, None)))
    q_rows, q_terms, q_valid = sparse.encode_queries(["fox dog"] * q)
    v3, i3 = sharded_fused_hybrid(
        mesh, sharded, int8_sharded, None, live, post, docp,
        jnp.asarray(queries), q_rows, q_terms, q_valid, k,
        axis=axis, quantized_limit=8, dense_limit=8, sparse_limit=4,
        sparse_pool=32, block_size=32)
    i3 = np.asarray(i3)
    assert (i3[:, 0] == np.arange(q)).all(), f"full funnel failed: {i3[:, 0]}"

    # capacity mode (vecs=None): int8-only shards, dequantized rescore
    v4, i4 = sharded_fused_hybrid(
        mesh, None, int8_sharded, None, live, post, docp,
        jnp.asarray(queries), q_rows, q_terms, q_valid, k,
        axis=axis, quantized_limit=8, dense_limit=8, sparse_limit=4,
        sparse_pool=32, block_size=32)
    i4 = np.asarray(i4)
    assert (i4[:, 0] == np.arange(q)).all(), f"capacity funnel failed: {i4[:, 0]}"

    # FULL single-chip-variant funnel: matryoshka cascade + int8 +
    # packed-postings BM25 through the shared fused_core (the spec path)
    from ..search.fused import FusedSpec

    inv = np.stack([
        1.0 / np.maximum(np.linalg.norm(corpus[:, :16], axis=-1), 1e-12),
        np.ones(n, dtype=np.float32),
    ], axis=1).astype(np.float32)
    inv_sharded = jax.device_put(
        jnp.asarray(inv), NamedSharding(mesh, P(axis, None)))
    full_spec = FusedSpec(
        k=k, matryoshka_dims=(16, d), matryoshka_limits=(16, 8),
        dense_limit=8, quantized_limit=8, sparse_limit=4, sparse_pool=32,
        rrf_k=60, block_size=32, recall_target=1.0)
    v5, i5 = sharded_fused_hybrid(
        mesh, sharded, int8_sharded, inv_sharded, live, post, docp,
        jnp.asarray(queries), q_rows, q_terms, q_valid, k,
        axis=axis, spec=full_spec)
    i5 = np.asarray(i5)
    assert (i5[:, 0] == np.arange(q)).all(), \
        f"cascade funnel failed: {i5[:, 0]}"

    # multi-chip IVF (parallel/ivf.py): per-shard partitions + ICI merge
    from ..config import IndexConfig
    from ..index.dense import DenseIndex
    from .ivf import build_sharded_ivf, place_sharded_ivf, sharded_ivf_search

    dense = DenseIndex(IndexConfig(dim=d, matryoshka_dims=(),
                                   initial_capacity=max(n, 64)))
    dense.insert(corpus)
    stacked = build_sharded_ivf(dense, n_shards, n_clusters=4,
                                bucket_rows=8, iters=3, block_rows=32)
    placed = place_sharded_ivf(mesh, stacked)
    rps = stacked["rows_per_shard"]
    pad = n_shards * rps - n
    vs = jnp.pad(dense.vecs[:n].astype(jnp.bfloat16), ((0, pad), (0, 0)))
    vs = jax.device_put(vs, NamedSharding(mesh, P(axis, None)))
    v6, i6 = sharded_ivf_search(mesh, placed, jnp.asarray(queries), k,
                                probes=4, rescore_vecs=vs)
    i6 = np.asarray(i6)
    assert (i6[:, 0] == np.arange(q)).all(), f"sharded ivf failed: {i6[:, 0]}"
