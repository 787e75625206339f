import importlib.util

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_application_tpu.parallel.mesh import make_mesh, param_shardings
from rag_application_tpu.parallel.search import (
    shard_corpus,
    sharded_topk,
    sharded_topk_dryrun,
)


def test_make_mesh_shapes():
    mesh = make_mesh(8, model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh = make_mesh(8)
    assert dict(mesh.shape) == {"data": 8, "model": 1}


def test_param_shardings_rules():
    mesh = make_mesh(8, model=2)
    params = {
        "kernel": jnp.zeros((16, 64)),
        "bias": jnp.zeros((7,)),
        "odd": jnp.zeros((3, 5)),
    }
    shards = param_shardings(mesh, params)
    assert shards["kernel"].spec == jax.sharding.PartitionSpec(None, "model")
    assert shards["bias"].spec == jax.sharding.PartitionSpec()
    assert shards["odd"].spec == jax.sharding.PartitionSpec()


def test_sharded_topk_matches_single_device(rng):
    mesh = make_mesh(8)
    n, d, q, k = 8 * 64, 32, 6, 7
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    queries = corpus[:q] + 0.05 * rng.standard_normal((q, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=-1, keepdims=True)

    sharded = shard_corpus(mesh, corpus)
    vals, idx = sharded_topk(mesh, sharded, jnp.asarray(queries), k,
                             valid_n=n, approx=False)
    ref = np.argsort(-(queries @ corpus.T), axis=-1)[:, :k]
    np.testing.assert_array_equal(np.asarray(idx), ref)


def test_sharded_topk_ragged_tail(rng):
    """Logical size not divisible by shard count: padding rows excluded."""
    mesh = make_mesh(8)
    n_logical, d, k = 100, 16, 5
    corpus = rng.standard_normal((n_logical, d)).astype(np.float32)
    queries = corpus[:3]
    sharded = shard_corpus(mesh, corpus)  # pads to 104 rows
    vals, idx = sharded_topk(mesh, sharded, jnp.asarray(queries), k,
                             valid_n=n_logical, approx=False)
    assert np.asarray(idx).max() < n_logical
    assert (np.asarray(idx)[:, 0] == np.arange(3)).all()


def test_dryrun_helper():
    mesh = make_mesh(8)
    sharded_topk_dryrun(mesh)


def test_graft_entry_contract():
    spec = importlib.util.spec_from_file_location("graft", "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 768)
    assert np.isfinite(np.asarray(out)).all()


def test_graft_dryrun_multichip():
    spec = importlib.util.spec_from_file_location("graft", "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_sharded_fused_hybrid_full_funnel(rng):
    """The FULL hybrid funnel (dense int8 scan + local BM25 + exact
    rescore) over 8 shards: per-shard-exact limits make the merged
    result equal the exact dense oracle, and lexical-only docs surface
    via the sharded sparse branch."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rag_application_tpu.config import SparseConfig
    from rag_application_tpu.index.sparse import SparseIndex
    from rag_application_tpu.parallel.mesh import make_mesh
    from rag_application_tpu.parallel.search import sharded_fused_hybrid
    from rag_application_tpu.parallel.sparse import build_sharded_sparse

    mesh = make_mesh(8)
    n, d = 96, 32
    words = ("fox dog tensor unit sparse dense graph node query index "
             "rank fusion chunk page entity relation").split()
    corpus = (rng.standard_normal((n, d))
              * np.exp(-0.02 * np.arange(d))).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    texts = [" ".join(rng.choice(words, size=6)) for _ in range(n)]
    texts[77] = "zebra quagga okapi zebra quagga"  # lexical-only target

    sparse = SparseIndex(SparseConfig(candidate_pool=64, max_query_terms=8))
    sparse.add_batch(texts)
    sh = build_sharded_sparse(sparse, 8)
    r = sh["rows_per_shard"]
    assert 8 * r >= n

    pad = 8 * r - n
    vecs = np.pad(corpus, ((0, pad), (0, 0)))
    int8 = np.clip(np.round(vecs * 127), -127, 127).astype(np.int8)
    live = np.zeros(8 * r, dtype=bool); live[:n] = True

    axis = "data"
    row_sharded = NamedSharding(mesh, P(axis, None))
    stacked = NamedSharding(mesh, P(axis, None, None))
    vecs_d = jax.device_put(jnp.asarray(vecs), row_sharded)
    int8_d = jax.device_put(jnp.asarray(int8), row_sharded)
    live_d = jax.device_put(jnp.asarray(live), NamedSharding(mesh, P(axis)))
    post_d = jax.device_put(jnp.asarray(sh["post_packed"]), stacked)
    docp_d = jax.device_put(jnp.asarray(sh["doc_packed"]), stacked)

    q_idx = np.array([3, 42, 77, 90])
    queries = corpus[q_idx] + 0.01 * rng.standard_normal(
        (len(q_idx), d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=-1, keepdims=True)
    q_rows, q_terms, q_valid = sparse.encode_queries(
        [texts[i] for i in q_idx])

    k = 10
    vals, ids = sharded_fused_hybrid(
        mesh, vecs_d, int8_d, None, live_d, post_d, docp_d,
        jnp.asarray(queries), q_rows, q_terms, q_valid, k,
        axis=axis, quantized_limit=r, dense_limit=r, sparse_limit=8,
        sparse_pool=64, block_size=32)
    ids = np.asarray(ids); vals = np.asarray(vals)

    # per-shard-exact dense limits -> merged result == exact dense oracle
    exact = np.argsort(-(queries @ corpus.T), axis=-1)[:, :k]
    recall = np.mean([np.isin(exact[i], ids[i]).mean()
                      for i in range(len(q_idx))])
    assert recall == 1.0, recall
    assert (ids[:, 0] == q_idx).all()
    # scores are global cosines, descending
    assert (np.diff(vals, axis=-1) <= 1e-6).all()

    # capacity mode (vecs=None): same funnel from int8-only shards;
    # top hits match and scores stay cosine-scaled
    v_c, i_c = sharded_fused_hybrid(
        mesh, None, int8_d, None, live_d, post_d, docp_d,
        jnp.asarray(queries), q_rows, q_terms, q_valid, k,
        axis=axis, quantized_limit=r, dense_limit=r, sparse_limit=8,
        sparse_pool=64, block_size=32)
    i_c = np.asarray(i_c); v_c = np.asarray(v_c)
    assert (i_c[:, 0] == q_idx).all()
    overlap = np.mean([np.isin(ids[i], i_c[i]).mean()
                       for i in range(len(q_idx))])
    assert overlap >= 0.9, overlap
    assert np.all(v_c[np.isfinite(v_c)] <= 1.02)


def test_sharded_sparse_scores_match_host_oracle(rng):
    """Per-shard BM25 with global stats reproduces the exact host scores
    for every returned doc (sharding must never change a score)."""
    from rag_application_tpu.config import SparseConfig
    from rag_application_tpu.index.sparse import SparseIndex
    from rag_application_tpu.ops.bm25 import bm25_topk
    from rag_application_tpu.parallel.sparse import build_sharded_sparse

    words = "alpha beta gamma delta epsilon zeta eta theta".split()
    sparse = SparseIndex(SparseConfig(candidate_pool=32, max_query_terms=8))
    texts = [" ".join(rng.choice(words, size=5)) for _ in range(40)]
    sparse.add_batch(texts)
    sh = build_sharded_sparse(sparse, 4)
    r = sh["rows_per_shard"]

    query = "alpha delta"
    q_rows, q_terms, q_valid = sparse.encode_queries([query])
    oracle = sparse.exact_scores(query)

    found = {}
    for s in range(4):
        scores, ids = bm25_topk(
            jnp.asarray(sh["post_packed"][s]), None,
            jnp.asarray(sh["doc_packed"][s]),
            q_rows, q_terms, q_valid, r, pool=32, approx=False)
        for score, lid in zip(np.asarray(scores)[0], np.asarray(ids)[0]):
            if np.isfinite(score):
                found[s * r + int(lid)] = float(score)
    assert found, "no sparse hits"
    for gid, score in found.items():
        np.testing.assert_allclose(score, oracle[gid], rtol=1e-4)
    # every positive-scoring doc is found by exactly its shard
    expect = {i for i in range(40) if oracle[i] > 0}
    assert set(found) == expect


def test_sharded_funnel_equals_single_chip_at_100k(rng):
    """VERDICT item: multi-chip 'same results as single-chip' must be
    provable. The sharded funnel runs search.fused.fused_core per shard
    with the SAME spec (matryoshka cascade + int8 + packed-postings
    BM25), so with per-shard limits == single-chip limits every
    single-chip candidate is found by its shard, scores come from the
    identical code path, and the merged top-k equals the single-device
    fused_hybrid bit-for-bit."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rag_application_tpu.config import SparseConfig
    from rag_application_tpu.index.sparse import SparseIndex
    from rag_application_tpu.parallel.mesh import make_mesh
    from rag_application_tpu.parallel.search import sharded_fused_hybrid
    from rag_application_tpu.parallel.sparse import build_sharded_sparse
    from rag_application_tpu.search.fused import FusedSpec, fused_hybrid

    mesh = make_mesh(8)
    n, d, nq, k = 100_000, 64, 8, 10
    dims = (16, 32)
    corpus = (rng.standard_normal((n, d))
              * np.exp(-0.05 * np.arange(d))).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    vecs = jnp.asarray(corpus, dtype=jnp.bfloat16)
    int8 = jnp.asarray(
        np.clip(np.round(corpus * 127), -127, 127).astype(np.int8))
    inv = np.stack(
        [1.0 / np.maximum(np.linalg.norm(corpus[:, :dd], axis=-1), 1e-12)
         for dd in dims], axis=1).astype(np.float32)
    live = jnp.ones((n,), dtype=bool)

    words = [f"tok{i}" for i in range(512)]
    texts = [" ".join(rng.choice(words, size=5)) for _ in range(n)]
    sparse = SparseIndex(SparseConfig(candidate_pool=64, max_query_terms=8))
    chunk = 10_000
    for s in range(0, n, chunk):
        sparse.add_batch(texts[s:s + chunk])

    q_idx = rng.choice(n, size=nq, replace=False)
    queries = corpus[q_idx] + 0.05 * rng.standard_normal(
        (nq, d)).astype(np.float32)
    q_rows, q_terms, q_valid = sparse.encode_queries(
        [texts[i] for i in q_idx])

    spec = FusedSpec(
        k=k, matryoshka_dims=dims, matryoshka_limits=(48, 32),
        dense_limit=32, quantized_limit=48, sparse_limit=16,
        sparse_pool=64, rrf_k=60, block_size=8192, recall_target=1.0)

    # --- single chip ---
    dv = sparse.device_arrays()
    s_vals, s_ids = fused_hybrid(
        vecs, int8, jnp.asarray(inv), live, np.int32(n),
        jnp.asarray(queries), None,
        (dv["post_docs"], dv["post_weights"], dv["doc_packed"]),
        (q_rows, q_terms, q_valid), spec)
    s_vals, s_ids = np.asarray(s_vals), np.asarray(s_ids)

    # --- 8 shards ---
    sh = build_sharded_sparse(sparse, 8)
    r = sh["rows_per_shard"]
    pad = 8 * r - n
    row_sharded = NamedSharding(mesh, P("data", None))
    stacked = NamedSharding(mesh, P("data", None, None))

    def put(x, spec_):
        return jax.device_put(jnp.asarray(x), spec_)

    vecs_d = put(np.pad(np.asarray(vecs, np.float32), ((0, pad), (0, 0))
                        ).astype(jnp.bfloat16), row_sharded)
    int8_d = put(np.pad(np.asarray(int8), ((0, pad), (0, 0))), row_sharded)
    inv_d = put(np.pad(inv, ((0, pad), (0, 0))), row_sharded)
    live_d = put(np.pad(np.ones(n, bool), (0, pad)),
                 NamedSharding(mesh, P("data")))
    post_d = put(sh["post_packed"], stacked)
    docp_d = put(sh["doc_packed"], stacked)

    m_vals, m_ids = sharded_fused_hybrid(
        mesh, vecs_d, int8_d, inv_d, live_d, post_d, docp_d,
        jnp.asarray(queries), q_rows, q_terms, q_valid, k,
        spec=spec, valid_n=n)
    m_vals, m_ids = np.asarray(m_vals), np.asarray(m_ids)

    assert (m_ids == s_ids).all(), (
        f"id mismatch:\nsingle={s_ids}\nsharded={m_ids}")
    np.testing.assert_allclose(m_vals, s_vals, rtol=1e-5, atol=1e-6)


def test_sharded_ivf_search(rng):
    """Multi-chip IVF (parallel/ivf.py): per-shard partitions + ICI
    merge — the beyond-HBM extension of the ANN leg. Recall must hold
    vs the exact oracle and the exact rescore must be score-faithful."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rag_application_tpu.config import IndexConfig
    from rag_application_tpu.index.dense import DenseIndex
    from rag_application_tpu.parallel.ivf import (
        build_sharded_ivf, place_sharded_ivf, sharded_ivf_search)
    from rag_application_tpu.parallel.mesh import make_mesh

    n, d = 40_000, 64
    centers = rng.standard_normal((64, d)).astype(np.float32)
    x = centers[rng.integers(0, 64, n)] + \
        0.25 * rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    dense = DenseIndex(IndexConfig(dim=d, matryoshka_dims=(),
                                   initial_capacity=1024))
    dense.insert(x)
    mesh = make_mesh(8)
    stacked = build_sharded_ivf(dense, 8, n_clusters=32, bucket_rows=16,
                                iters=5, block_rows=1024)
    placed = place_sharded_ivf(mesh, stacked)
    r = stacked["rows_per_shard"]
    pad = 8 * r - n
    vecs = jnp.pad(dense.vecs[:n].astype(jnp.bfloat16), ((0, pad), (0, 0)))
    vecs = jax.device_put(vecs, NamedSharding(mesh, P("data", None)))

    q_idx = rng.choice(n, 48, replace=False)
    q = x[q_idx] + 0.05 * rng.standard_normal((48, d)).astype(np.float32)
    exact = np.argsort(-(q @ x.T), axis=-1)[:, :10]
    vals, ids = sharded_ivf_search(mesh, placed, jnp.asarray(q), 10,
                                   probes=32, rescore_vecs=vecs)
    ids = np.asarray(ids)
    rec = np.mean([np.isin(exact[i], ids[i]).mean() for i in range(48)])
    assert rec >= 0.95, rec
    # scores are true cosines (bf16 rescore), descending
    vals = np.asarray(vals)
    assert vals.max() <= 1.01
    assert (np.diff(vals, axis=-1) <= 1e-6).all()
    # the no-rescore path works too (coarse int8 scores)
    v2, i2 = sharded_ivf_search(mesh, placed, jnp.asarray(q), 10,
                                probes=32)
    assert np.isfinite(np.asarray(v2)).any()


def test_sharded_ivf_capacity_mode_per_row_scale(rng):
    """Capacity-mode shards (int8-only, per-row scaled): ranking must
    apply the per-row dequant factors — raw int8 dots are incomparable
    across rows at 127/max|x| scaling."""
    from rag_application_tpu.config import IndexConfig
    from rag_application_tpu.index.dense import DenseIndex
    from rag_application_tpu.parallel.ivf import (
        build_sharded_ivf, place_sharded_ivf, sharded_ivf_search)
    from rag_application_tpu.parallel.mesh import make_mesh

    n, d = 16_000, 64
    centers = rng.standard_normal((32, d)).astype(np.float32)
    x = centers[rng.integers(0, 32, n)] + \
        0.25 * rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    dense = DenseIndex(IndexConfig(dim=d, matryoshka_dims=(),
                                   initial_capacity=1024, store_bf16=False))
    dense.insert(x)
    assert dense.int8_recip is not None
    mesh = make_mesh(8)
    stacked = build_sharded_ivf(dense, 8, n_clusters=16, bucket_rows=16,
                                iters=4, block_rows=512)
    assert "bucket_recip" in stacked
    placed = place_sharded_ivf(mesh, stacked)

    q_idx = rng.choice(n, 32, replace=False)
    q = x[q_idx] + 0.05 * rng.standard_normal((32, d)).astype(np.float32)
    exact = np.argsort(-(q @ x.T), axis=-1)[:, :10]
    vals, ids = sharded_ivf_search(mesh, placed, jnp.asarray(q), 10,
                                   probes=32)
    ids = np.asarray(ids)
    rec = np.mean([np.isin(exact[i], ids[i]).mean() for i in range(32)])
    assert rec >= 0.9, rec
    # scores land on the cosine scale (recip + query /127 applied)
    vals = np.asarray(vals)
    assert vals[np.isfinite(vals)].max() <= 1.1
