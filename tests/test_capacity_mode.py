"""Capacity mode (store_bf16=False): int8-only storage for 2.4x more
rows per chip. Search scans int8 and the exact rescore dequantizes int8
rows — results must track the full-mode funnel up to quantization.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rag_application_tpu.config import FunnelConfig, IndexConfig
from rag_application_tpu.index.dense import DenseIndex
from rag_application_tpu.search.fused import FusedSearcher


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def normed(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_capacity_mode_memory_and_search(rng):
    n, d = 3000, 128
    cfg = IndexConfig(dim=d, matryoshka_dims=(), store_bf16=False,
                      initial_capacity=1024)
    idx = DenseIndex(cfg)
    assert idx.vecs is None
    corpus = normed(rng, n, d)
    idx.insert(corpus[:2000])
    idx.insert(corpus[2000:])  # exercises capacity growth
    assert idx.size == n and idx.capacity >= n
    queries = corpus[:8] + 0.02 * rng.standard_normal((8, d)).astype(np.float32)
    vals, ids = idx.search(queries, 5)
    assert (np.asarray(ids)[:, 0] == np.arange(8)).all()
    # matryoshka views are unavailable without the bf16 plane
    cfg2 = IndexConfig(dim=d, matryoshka_dims=(64,), store_bf16=False,
                       initial_capacity=1024)
    idx2 = DenseIndex(cfg2)
    idx2.insert(corpus[:100])
    with pytest.raises(ValueError, match="matryoshka"):
        idx2.search_matryoshka(queries, 5, 0)


def test_capacity_mode_funnel_tracks_full_mode(rng):
    n, d, k = 2500, 128, 10
    corpus = normed(rng, n, d)
    queries = corpus[:16] + 0.05 * rng.standard_normal((16, d)).astype(np.float32)
    funnel = FunnelConfig(dense_limit=24, quantized_limit=32,
                          sparse_limit=0, final_limit=k)

    full = DenseIndex(IndexConfig(dim=d, matryoshka_dims=(),
                                  initial_capacity=4096))
    full.insert(corpus)
    cap = DenseIndex(IndexConfig(dim=d, matryoshka_dims=(),
                                 store_bf16=False, initial_capacity=4096))
    cap.insert(corpus)

    sf = FusedSearcher(full, None, funnel, scan_impl="pallas",
                       scan_block_rows=512)
    sc = FusedSearcher(cap, None, funnel, scan_impl="pallas",
                       scan_block_rows=512)
    v_f, i_f = sf.search(queries, None, k, use_matryoshka=False)
    v_c, i_c = sc.search(queries, None, k, use_matryoshka=False)
    i_f, i_c = np.asarray(i_f), np.asarray(i_c)
    overlap = np.mean([np.isin(i_f[i], i_c[i]).mean() for i in range(16)])
    assert overlap >= 0.9  # same candidates; rescore differs by int8 noise
    # capacity-mode scores approximate the true cosines (dequantized int8)
    v_c = np.asarray(v_c)
    assert np.all(v_c[np.isfinite(v_c)] <= 1.02)
    qn = queries / np.linalg.norm(queries, axis=-1, keepdims=True)
    exact_best = np.max(qn @ corpus.T, axis=-1)
    np.testing.assert_allclose(v_c[:, 0], exact_best, atol=0.03)


def test_capacity_mode_checkpoint_roundtrip(rng, tmp_path):
    from rag_application_tpu.config import Config, SparseConfig
    from rag_application_tpu.index.checkpoint import (load_collection,
                                                      save_collection)
    from rag_application_tpu.store.collection import Collection

    cfg = Config()
    cfg.index = IndexConfig(dim=64, matryoshka_dims=(), store_bf16=False,
                            initial_capacity=256)
    cfg.sparse = SparseConfig(candidate_pool=32, max_query_terms=8)
    col = Collection("cap", cfg)
    corpus = normed(rng, 100, 64)
    col.store_document_vectors(
        "doc", [{"text": f"chunk {i}"} for i in range(100)], corpus)
    path = str(tmp_path / "snap")
    save_collection(col, path)
    col2 = load_collection(path, cfg)
    assert col2.dense.vecs is None and col2.dense.int8 is not None
    assert col2.dense.size == 100
    # per-row dequant factors roundtrip bit-exact
    np.testing.assert_array_equal(np.asarray(col2.dense.int8_recip),
                                  np.asarray(col.dense.int8_recip))
    vals, ids = col2.dense.search(corpus[:4], 3)
    assert (np.asarray(ids)[:, 0] == np.arange(4)).all()

    # storage-plane mismatch is rejected
    cfg_full = Config()
    cfg_full.index = IndexConfig(dim=64, matryoshka_dims=(),
                                 initial_capacity=256)
    cfg_full.sparse = cfg.sparse
    with pytest.raises(ValueError, match="storage planes"):
        load_collection(path, cfg_full)


def test_bf16_only_mode(rng):
    """store_int8=False: quantized table dropped; bf16 paths intact."""
    n, d = 1200, 64
    cfg = IndexConfig(dim=d, matryoshka_dims=(), store_int8=False,
                      initial_capacity=2048)
    idx = DenseIndex(cfg)
    corpus = normed(rng, n, d)
    idx.insert(corpus)
    assert idx.int8 is None
    vals, ids = idx.search(corpus[:6], 5)
    assert (np.asarray(ids)[:, 0] == np.arange(6)).all()
    with pytest.raises(ValueError, match="store_int8"):
        idx.search_int8(corpus[:2], 5)
    with pytest.raises(ValueError, match="at least one"):
        DenseIndex(IndexConfig(dim=d, store_int8=False, store_bf16=False))


def test_bf16_only_funnel_disables_int8_branch(rng):
    """store_int8=False must not crash the fused funnel — the int8
    branch is disabled and matryoshka carries the search."""
    n, d = 1500, 128
    cfg = IndexConfig(dim=d, matryoshka_dims=(64,), store_int8=False,
                      initial_capacity=2048)
    idx = DenseIndex(cfg)
    corpus = normed(rng, n, d)
    idx.insert(corpus)
    f = FunnelConfig(matryoshka_limits=(64,), dense_limit=16,
                     quantized_limit=40, sparse_limit=0, final_limit=5)
    s = FusedSearcher(idx, None, f, scan_impl="pallas", scan_block_rows=512)
    queries = corpus[:6] + 0.01 * rng.standard_normal((6, d)).astype(np.float32)
    v, i = s.search(queries, None, 5, use_matryoshka=True)
    assert (np.asarray(i)[:, 0] == np.arange(6)).all()
    # with every branch off, the error is informative, not a crash
    with pytest.raises(ValueError, match="no funnel branch"):
        s.search(queries, None, 5, use_matryoshka=False)


def test_capacity_mode_search_scores_are_cosines(rng):
    n, d = 1000, 128
    idx = DenseIndex(IndexConfig(dim=d, matryoshka_dims=(),
                                 store_bf16=False, initial_capacity=1024))
    corpus = normed(rng, n, d)
    idx.insert(corpus)
    vals, ids = idx.search(corpus[:4], 3)
    v = np.asarray(vals)
    assert np.all(v[np.isfinite(v)] <= 1.02)
    np.testing.assert_allclose(v[:, 0], 1.0, atol=0.02)  # self-match


def test_capacity_mode_through_app_stack(rng):
    """Capacity mode config flows through build_app -> ingest -> hybrid
    search over HTTP (the RAGTPU_INDEX_STORE_BF16=0 deployment path)."""
    import asyncio

    import httpx

    from rag_application_tpu.api.app import build_app
    from rag_application_tpu.api.http import HTTPServer
    from rag_application_tpu.config import (Config, EncoderConfig,
                                            SparseConfig)
    from rag_application_tpu.llm.router import LLMRouter, Provider
    from rag_application_tpu.models.embedder import Embedder

    tiny = EncoderConfig(vocab_size=512, hidden_dim=32, num_layers=1,
                         num_heads=4, mlp_dim=64, max_len=32, out_dim=32,
                         dtype="float32")
    cfg = Config()
    cfg.index = IndexConfig(dim=32, matryoshka_dims=(), store_bf16=False,
                            initial_capacity=64)
    cfg.sparse = SparseConfig(candidate_pool=32, max_query_terms=8)
    cfg.funnel = FunnelConfig(dense_limit=5, quantized_limit=5,
                              sparse_limit=5, final_limit=5)
    cfg.kg.entity_dim = 32

    async def main():
        llm = LLMRouter(Provider.STUB)
        emb = Embedder(cfg=tiny, batch_size=4, max_len=16)
        router, state = build_app(cfg, llm=llm, embedder=emb)
        server = HTTPServer(router, port=0)
        port = await server.start()
        try:
            async with httpx.AsyncClient(
                base_url=f"http://127.0.0.1:{port}", timeout=60
            ) as c:
                r = await c.post("/ingest/raw-text", json={
                    "text": "capacity mode keeps only the int8 plane " * 10,
                    "document_id": "d", "user_id": "u"})
                assert r.status_code == 202, r.text
                r = await c.post("/api/v1/search/hybrid",
                                 json={"query": "int8 plane", "user_id": "u"})
                assert r.status_code == 200 and r.json()["results"], r.text
                assert state.users["u"].collection.dense.vecs is None
                assert r.json()["results"][0]["score"] <= 1.02
        finally:
            await server.stop()

    asyncio.run(main())


def test_per_row_scale_recovers_rescore_precision():
    """The int8-rescore precision floor capped 10M recall at ~0.91
    (CLAUDE.md): normalized 768-d rows only span ~±17 int8 codes at the
    global /127 scale. Per-row max-abs scaling (int8_per_row_scale)
    must recover most of the f32-exact recall; the unscaled layout must
    measurably trail it."""
    import numpy as np

    from rag_application_tpu.config import IndexConfig
    from rag_application_tpu.index.dense import DenseIndex

    rng = np.random.default_rng(11)
    n, d, nq, k = 20_000, 768, 64, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    q = x[rng.choice(n, nq, replace=False)] + \
        0.05 * rng.standard_normal((nq, d)).astype(np.float32)
    exact = np.argsort(-(q @ x.T), axis=-1)[:, :k]

    from rag_application_tpu.config import FunnelConfig
    from rag_application_tpu.search.fused import FusedSearcher

    def recall(per_row):
        idx = DenseIndex(IndexConfig(
            dim=d, matryoshka_dims=(), initial_capacity=1024,
            store_bf16=False, int8_per_row_scale=per_row))
        idx.insert(x)
        assert (idx.int8_recip is not None) == per_row
        # the production capacity path: int8 candidate scan + exact
        # rescore of the union (the rescore is where per-row scaling
        # pays — the scan's error is query-quantization-dominated)
        f = FusedSearcher(idx, None, FunnelConfig(
            matryoshka_limits=(), dense_limit=32, quantized_limit=64,
            sparse_limit=0, final_limit=k), scan_impl="xla")
        vals, ids = f.search(q, None, k, use_matryoshka=False)
        ids = np.asarray(ids)
        assert np.asarray(vals).max() <= 1.05  # cosine scale either way
        return np.mean([np.isin(exact[i], ids[i]).mean()
                        for i in range(nq)])

    r_scaled, r_global = recall(True), recall(False)
    assert r_scaled >= 0.97, (r_scaled, r_global)
    assert r_scaled > r_global + 0.02, (r_scaled, r_global)
