import jax.numpy as jnp
import numpy as np
import pytest

from rag_application_tpu.config import FunnelConfig, IndexConfig, SparseConfig
from rag_application_tpu.index.dense import DenseIndex
from rag_application_tpu.index.sparse import SparseIndex
from rag_application_tpu.ops.rrf import INVALID_ID
from rag_application_tpu.search.fused import FusedSearcher
from rag_application_tpu.search.hybrid import hybrid_search

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "a fast auburn fox leaped across a sleepy canine",
    "machine learning on tensor processing units",
    "sparse retrieval with bm25 ranking functions",
    "dense retrieval with neural embeddings",
    "the dog sleeps while the fox runs in the forest",
    "bm25 is a classic sparse ranking function",
    "tensor contractions run fast on matrix units",
    "reciprocal rank fusion merges candidate lists",
    "knowledge graphs store entities and relationships",
]

FUNNEL = FunnelConfig(matryoshka_limits=(8, 6, 5), dense_limit=5,
                      quantized_limit=5, sparse_limit=5, final_limit=5)


@pytest.fixture
def setup(rng):
    dense = DenseIndex(IndexConfig(dim=64, matryoshka_dims=(8, 16, 32),
                                   initial_capacity=16))
    sparse = SparseIndex(SparseConfig(candidate_pool=64, max_query_terms=8))
    embs = (rng.standard_normal((len(TEXTS), 64))
            * np.exp(-0.03 * np.arange(64))).astype(np.float32)
    dense.insert(embs)
    sparse.add_batch(TEXTS)
    return dense, sparse, embs


def test_fused_matches_staged_pipeline(setup, rng):
    dense, sparse, embs = setup
    noisy = embs + 0.01 * rng.standard_normal(embs.shape).astype(np.float32)

    staged = hybrid_search(dense, sparse, noisy, TEXTS, 5, funnel=FUNNEL)
    fused = FusedSearcher(dense, sparse, FUNNEL)
    scores, ids = fused.search(noisy, TEXTS, 5)

    ids = np.asarray(ids)
    scores = np.asarray(scores)
    valid = np.isfinite(scores)
    np.testing.assert_array_equal(ids[valid], staged.rows[staged.valid])
    np.testing.assert_allclose(scores[valid], staged.scores[staged.valid],
                               rtol=1e-4)


def test_fused_self_retrieval(setup, rng):
    dense, sparse, embs = setup
    fused = FusedSearcher(dense, sparse, FUNNEL)
    noisy = embs + 0.01 * rng.standard_normal(embs.shape).astype(np.float32)
    scores, ids = fused.search(noisy, TEXTS, 3)
    assert (np.asarray(ids)[:, 0] == np.arange(len(TEXTS))).all()


def test_fused_filter(setup, rng):
    dense, sparse, embs = setup
    fused = FusedSearcher(dense, sparse, FUNNEL)
    mask = np.zeros(dense.capacity, dtype=bool)
    mask[:4] = True
    scores, ids = fused.search(embs[:2], TEXTS[:2], 3,
                               filter_mask=jnp.asarray(mask))
    ids = np.asarray(ids)
    ok = np.isfinite(np.asarray(scores))
    assert (ids[ok] < 4).all()


def test_fused_insert_no_recompile(setup, rng):
    """Growing the logical size within capacity must reuse the executable."""
    dense, sparse, embs = setup
    fused = FusedSearcher(dense, None, FUNNEL)
    fused.search(embs[:2], None, 3)
    from rag_application_tpu.search.fused import fused_hybrid

    misses_before = fused_hybrid._cache_size()
    extra = rng.standard_normal((3, 64)).astype(np.float32)
    dense.insert(extra)  # capacity 16 holds 13 rows; no doubling
    fused.search(embs[:2], None, 3)
    assert fused_hybrid._cache_size() == misses_before


def test_fused_dense_only(setup, rng):
    dense, _, embs = setup
    fused = FusedSearcher(dense, None, FUNNEL)
    scores, ids = fused.search(embs[:4], None, 3)
    assert (np.asarray(ids)[:, 0] == np.arange(4)).all()


@pytest.mark.parametrize("wire", ["float16", "int8"])
def test_fused_wire_formats(setup, rng, wire):
    """Compressed query uploads (f16 / per-row-int8) keep the ranking.

    The funnel renormalizes every query in f32 on device (fused.py
    fused_core), so the per-row int8 scale cancels and only quantization
    noise remains — top-k ids must match the f32 wire on this small,
    well-separated corpus.
    """
    dense, sparse, embs = setup
    fused = FusedSearcher(dense, sparse, FUNNEL)
    noisy = embs + 0.01 * rng.standard_normal(embs.shape).astype(np.float32)

    ref_scores, ref_ids = fused.search_prepared(
        fused.prepare(noisy, TEXTS), 3)
    scores, ids = fused.search_prepared(
        fused.prepare(noisy, TEXTS, upload_dtype=wire), 3)

    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_ids))
    ok = np.isfinite(np.asarray(ref_scores))
    np.testing.assert_allclose(np.asarray(scores)[ok],
                               np.asarray(ref_scores)[ok],
                               atol=2e-2 if wire == "int8" else 2e-3)


def test_final_fusion_rrf_rescues_keyword_hit(setup, rng):
    """final_fusion="rrf": a document that only BM25 can find (its
    dense embedding is anti-correlated with the query) must surface in
    the final top-k; with the default dense-only final rescore it is
    ranked last. This is the weak-encoder rescue path the real-docs
    eval rides (FunnelConfig.final_fusion)."""
    dense = DenseIndex(IndexConfig(dim=64, matryoshka_dims=(),
                                   initial_capacity=16))
    sparse = SparseIndex(SparseConfig(candidate_pool=64, max_query_terms=8))
    texts = [f"filler document number {i} about nothing" for i in range(9)]
    texts.append("zyzzyva needle keyword appears exactly here")
    embs = rng.standard_normal((10, 64)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    q = embs[0].copy()
    embs[9] = -q  # dense score of the needle doc is -1 (worst possible)
    dense.insert(embs)
    sparse.add_batch(texts)

    funnel = FunnelConfig(matryoshka_limits=(), dense_limit=8,
                          quantized_limit=8, sparse_limit=4, final_limit=3)
    qtext = ["zyzzyva needle keyword"]

    dense_rank = FusedSearcher(dense, sparse, funnel)
    _, ids = dense_rank.search(q[None, :], qtext, 3)
    assert 9 not in np.asarray(ids)[0]  # buried by the dense rescore

    rrf_rank = FusedSearcher(
        dense, sparse,
        FunnelConfig(matryoshka_limits=(), dense_limit=8, quantized_limit=8,
                     sparse_limit=4, final_limit=3, final_fusion="rrf"))
    scores, ids = rrf_rank.search(q[None, :], qtext, 3)
    assert 9 in np.asarray(ids)[0]
    assert np.isfinite(np.asarray(scores)[0, :1]).all()


def test_final_fusion_rrf_without_sparse_matches_dense(setup, rng):
    """final_fusion="rrf" with no sparse leg degrades to the dense
    ordering (the RRF block is sparse-gated)."""
    dense, sparse, embs = setup
    noisy = embs + 0.01 * rng.standard_normal(embs.shape).astype(np.float32)
    import dataclasses
    base = FusedSearcher(dense, None, FUNNEL)
    rrf = FusedSearcher(dense, None,
                        dataclasses.replace(FUNNEL, final_fusion="rrf"))
    _, ids_a = base.search(noisy, None, 3)
    _, ids_b = rrf.search(noisy, None, 3)
    np.testing.assert_array_equal(np.asarray(ids_a), np.asarray(ids_b))


def test_tokens_wire_matches_vector_wire():
    """search_tokens (int32 ids up, encoder+funnel in one dispatch)
    returns exactly what encode-on-host + search returns."""
    import jax.numpy as jnp

    from rag_application_tpu.config import (EncoderConfig, FunnelConfig,
                                            IndexConfig)
    from rag_application_tpu.index.dense import DenseIndex
    from rag_application_tpu.models.encoder import init_encoder
    from rag_application_tpu.search.fused import FusedSearcher

    rng = np.random.default_rng(5)
    cfg = EncoderConfig(vocab_size=256, hidden_dim=32, num_layers=1,
                        num_heads=4, mlp_dim=64, max_len=12, out_dim=32,
                        dtype="float32")
    enc = init_encoder(cfg, max_len=12)
    docs = rng.integers(1, 256, (300, 12)).astype(np.int32)
    mask = docs != 0
    vecs = np.asarray(enc.model.apply(enc.params, jnp.asarray(docs),
                                      jnp.asarray(mask)))
    dense = DenseIndex(IndexConfig(dim=32, matryoshka_dims=(),
                                   initial_capacity=512, block_size=128))
    dense.insert(vecs)
    funnel = FunnelConfig(matryoshka_limits=(), dense_limit=16,
                          quantized_limit=32, sparse_limit=0, final_limit=5)
    searcher = FusedSearcher(dense, None, funnel, scan_impl="xla")
    searcher.bind_encoder(enc.model, enc.params, pad_id=0)

    q_tok = docs[:8]
    s_tok, i_tok = searcher.search_tokens(q_tok, k=5, use_matryoshka=False)
    # host-side encode -> the classic vector path
    qv = np.asarray(enc.model.apply(enc.params, jnp.asarray(q_tok),
                                    jnp.asarray(q_tok != 0)))
    s_vec, i_vec = searcher.search(qv, None, k=5, use_matryoshka=False)
    np.testing.assert_array_equal(np.asarray(i_tok), np.asarray(i_vec))
    np.testing.assert_allclose(np.asarray(s_tok), np.asarray(s_vec),
                               rtol=1e-5)
    # self-retrieval sanity
    assert (np.asarray(i_tok)[:, 0] == np.arange(8)).all()


def test_fully_live_maskless_path_matches_masked(rng):
    """size == capacity with no deletes drops the live plane from the
    scan (DenseIndex.fully_live); results must be identical to the
    masked trace, and delete() must flip the index back to masking."""
    cap, d = 512, 64
    dense = DenseIndex(IndexConfig(dim=d, matryoshka_dims=(),
                                   initial_capacity=cap))
    embs = (rng.standard_normal((cap, d))
            * np.exp(-0.03 * np.arange(d))).astype(np.float32)
    dense.insert(embs)
    assert dense.fully_live
    f = FunnelConfig(matryoshka_limits=(), dense_limit=8,
                     quantized_limit=8, sparse_limit=0, final_limit=5)
    s = FusedSearcher(dense, None, f, scan_impl="pallas",
                      scan_block_rows=128)
    q = embs[:6] + 0.01 * rng.standard_normal((6, d)).astype(np.float32)
    v_fast, i_fast = s.search(q, None, 5, use_matryoshka=False)
    # force the masked trace on the same data
    dense.has_deletes = True
    assert not dense.fully_live
    v_mask, i_mask = s.search(q, None, 5, use_matryoshka=False)
    np.testing.assert_array_equal(np.asarray(i_fast), np.asarray(i_mask))
    np.testing.assert_allclose(np.asarray(v_fast), np.asarray(v_mask),
                               rtol=1e-5)
    # a real delete must exclude the row (mask path engaged for good)
    dense.has_deletes = False
    dense.delete(np.asarray([0]))
    assert not dense.fully_live
    _, i_del = s.search(embs[:1], None, 5, use_matryoshka=False)
    assert 0 not in np.asarray(i_del)


def test_fully_live_capacity_mode_packed_scaled(rng):
    """Capacity mode (per-row int8 scales) + fully-live: the
    packed_scaled kernel runs without a mask plane and matches the
    host oracle."""
    from rag_application_tpu.ops.fused_topk import fused_scan_topk

    cap, d = 512, 32
    dense = DenseIndex(IndexConfig(dim=d, matryoshka_dims=(),
                                   store_bf16=False,
                                   initial_capacity=cap))
    embs = rng.standard_normal((cap, d)).astype(np.float32)
    dense.insert(embs)
    assert dense.fully_live and dense.int8_recip is not None
    f = FunnelConfig(matryoshka_limits=(), dense_limit=8,
                     quantized_limit=8, sparse_limit=0, final_limit=5)
    s = FusedSearcher(dense, None, f, scan_impl="pallas",
                      scan_block_rows=128)
    q = embs[:8] + 0.01 * rng.standard_normal((8, d)).astype(np.float32)
    _, ids = s.search(q, None, 5, use_matryoshka=False)
    assert fused_scan_topk.last_path == "packed_scaled"
    en = embs / np.linalg.norm(embs, axis=-1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    exact = np.argmax(qn @ en.T, axis=-1)
    assert (np.asarray(ids)[:, 0] == exact).mean() >= 0.9


def test_dbsf_fusion_resists_flat_dense_dilution(rng):
    """final_fusion="dbsf": a contrast-free dense leg must not dilute
    BM25's decisive keyword winner out of the top-k (the rank-RRF
    failure mode on the realdocs Pokemon needles, r5)."""
    from rag_application_tpu.ops.rrf import INVALID_ID

    dense = DenseIndex(IndexConfig(dim=32, matryoshka_dims=(),
                                   initial_capacity=64))
    sparse = SparseIndex(SparseConfig(candidate_pool=64,
                                      max_query_terms=8))
    # 40 near-identical docs (flat dense scores) + one keyword needle
    base = rng.standard_normal(32).astype(np.float32)
    embs = np.stack([base + 0.01 * rng.standard_normal(32)
                     for _ in range(40)]).astype(np.float32)
    dense.insert(embs)
    texts = ["common words everywhere alike"] * 39 + [
        "bulbasaur grass poison stats sheet"]
    sparse.add_batch(texts)
    f = FunnelConfig(matryoshka_limits=(), dense_limit=8,
                     quantized_limit=16, sparse_limit=8, final_limit=5,
                     final_fusion="dbsf")
    s = FusedSearcher(dense, sparse, f, scan_impl="xla")
    q = (base + 0.01 * rng.standard_normal(32)).astype(np.float32)
    _, ids = s.search(q[None], ["bulbasaur stats sheet"], 5,
                      use_matryoshka=False)
    ids = np.asarray(ids)[0]
    assert 39 in ids[ids != INVALID_ID]  # the keyword needle survives
