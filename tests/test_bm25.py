import numpy as np
import pytest

from rag_application_tpu.config import SparseConfig
from rag_application_tpu.index.analyzer import Analyzer, light_stem
from rag_application_tpu.index.sparse import SparseIndex, bm25_idf

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "a fast auburn fox leaped across a sleepy canine",
    "machine learning on tensor processing units",
    "sparse retrieval with bm25 ranking functions",
    "dense retrieval with neural embeddings",
    "the dog sleeps while the fox runs through the forest",
    "bm25 is a classic sparse ranking function for retrieval",
    "tensor contractions run efficiently on matrix units",
]


def make_index(**kw):
    cfg = SparseConfig(candidate_pool=64, max_query_terms=8, **kw)
    idx = SparseIndex(cfg)
    idx.add_batch(DOCS)
    return idx


def test_analyzer_stopwords_and_stem():
    a = Analyzer()
    toks = a.tokenize("The Foxes are jumping over dogs!")
    assert "the" not in toks and "are" not in toks
    assert "foxe" in toks or "fox" in toks  # stemmed plural


def test_light_stem():
    assert light_stem("jumping") == "jump"
    assert light_stem("dogs") == "dog"
    assert light_stem("is") == "is"


def test_bm25_idf_formula():
    idf = bm25_idf(10, np.array([1, 5, 10]))
    ref = np.log(1 + (10 - np.array([1, 5, 10]) + 0.5) / (np.array([1, 5, 10]) + 0.5))
    np.testing.assert_allclose(idf, ref)


def test_bm25_search_matches_exact_oracle():
    idx = make_index()
    for query in ["fox dog", "bm25 sparse retrieval", "tensor units"]:
        scores, rows = idx.search([query], k=4, approx=False)
        exact = idx.exact_scores(query)
        order = np.argsort(-exact, kind="stable")
        expect = [r for r in order[:4] if exact[r] > 0]
        got = [r for r, s in zip(rows[0], scores[0]) if np.isfinite(s)]
        assert got == expect, (query, got, expect)
        for r, s in zip(rows[0], scores[0]):
            if np.isfinite(s):
                np.testing.assert_allclose(s, exact[r], rtol=1e-4)


def test_bm25_empty_query_returns_no_hits():
    idx = make_index()
    scores, rows = idx.search(["zzzunknownzzz"], k=3)
    assert not np.isfinite(scores).any()
    assert (rows == len(DOCS)).all()


def test_bm25_delete_tombstones():
    idx = make_index()
    scores, rows = idx.search(["fox"], k=8, approx=False)
    assert 0 in rows[0]
    idx.delete(0)
    scores, rows = idx.search(["fox"], k=8, approx=False)
    assert 0 not in rows[0][np.isfinite(scores[0])]


def test_bm25_filter_mask():
    import jax.numpy as jnp

    idx = make_index()
    mask = np.zeros(len(DOCS), dtype=bool)
    mask[5] = True  # only doc 5 allowed
    scores, rows = idx.search(["fox dog"], k=4, filter_mask=jnp.asarray(mask), approx=False)
    finite = np.isfinite(scores[0])
    assert rows[0][finite].tolist() == [5]


def test_bm25_incremental_add_is_searchable():
    idx = make_index()
    new_row = idx.add("an entirely new document about quokkas")
    scores, rows = idx.search(["quokkas"], k=2, approx=False)
    assert rows[0][0] == new_row


def test_bm25_batched_queries():
    idx = make_index()
    scores, rows = idx.search(["fox", "embeddings"], k=3, approx=False)
    assert np.isfinite(scores[0]).any() and np.isfinite(scores[1]).any()
    assert rows.shape == (2, 3)


def test_bm25_packed_postings_layout():
    """rebuild emits packed postings for small corpora: one int32 per
    posting, (impact<<21)|doc, padding rows = sentinel doc id."""
    idx = make_index()
    dv = idx.device_arrays()
    assert dv["post_weights"] is None
    pd = np.asarray(dv["post_docs"])
    n = len(DOCS)
    docs = pd & ((1 << 21) - 1)
    wq = pd >> 21
    # padding slots: sentinel doc, zero impact; real slots: valid doc + impact
    real = docs < n
    assert (wq[real] >= 1).all() and (wq[real] <= 1023).all()
    assert (docs[~real] == n).all() and (wq[~real] == 0).all()


def test_bm25_packed_matches_two_array():
    """Packed and two-array stage-1 layouts give identical final results
    (stage 2 is exact; with pool >= all postings the cutoff can't differ)."""
    import jax.numpy as jnp

    from rag_application_tpu.ops.bm25 import bm25_topk

    idx = make_index()
    dv = idx.device_arrays()
    q_rows, q_terms, q_valid = idx.encode_queries(["fox dog", "tensor units"])
    packed = bm25_topk(dv["post_docs"], None, dv["doc_packed"],
                       q_rows, q_terms, q_valid, 4, pool=128, approx=False)

    # rebuild the two-array layout from the packed one: weights only rank
    # the cutoff, so any monotone weights reproduce the same candidates
    pd = np.asarray(dv["post_docs"])
    n = len(DOCS)
    docs = (pd & ((1 << 21) - 1)).astype(np.int32)
    w = (pd >> 21).astype(np.float16)
    two = bm25_topk(jnp.asarray(docs), jnp.asarray(w), dv["doc_packed"],
                    q_rows, q_terms, q_valid, 4, pool=128, approx=False)

    np.testing.assert_array_equal(np.asarray(packed[1]), np.asarray(two[1]))
    np.testing.assert_allclose(np.asarray(packed[0]), np.asarray(two[0]),
                               rtol=1e-6)


def test_max_impact_posting_survives_packing():
    """wq=1023 packed ints bitcast into the f32 NaN range and vanished
    from approx_max_k's candidate pool — the HIGHEST-impact posting of
    every corpus. Cap at 1019 keeps the bitcast finite and monotone."""
    idx = make_index()
    dv = idx.device_arrays()
    pd = np.asarray(dv["post_docs"])
    wq = pd[pd != len(DOCS)] >> 21
    assert wq.max() <= 1019
    # bitcast of every packed value is finite
    import jax
    import jax.numpy as jnp

    f = np.asarray(jax.vmap(
        lambda x: jax.lax.bitcast_convert_type(x, jnp.float32))(
        jnp.asarray(pd.reshape(-1))))
    assert np.isfinite(f).all()
    # the approx path still returns the top match for a max-impact query
    scores, rows = idx.search(["bm25"], k=2, approx=True)
    exact = idx.exact_scores("bm25")
    assert rows[0][0] == int(np.argmax(exact))


def test_blocked_doc_major_expand_matches_one_shot(monkeypatch):
    """The chunked device expansion (donated-buffer scatter, added after
    the 10M capacity-mode HBM OOM) must produce the identical doc-major
    table as the one-shot path."""
    import numpy as np

    import rag_application_tpu.index.sparse as sp
    from rag_application_tpu.config import SparseConfig

    rng = np.random.default_rng(3)
    toks = rng.integers(0, 300, size=(4000, 24)).astype(np.int64)

    def build():
        idx = sp.SparseIndex(SparseConfig())
        idx.analyzer.vocab = {f"w{t}": t for t in range(300)}
        idx.add_pretokenized(toks)
        idx.rebuild()
        return np.asarray(idx.device_arrays()["doc_packed"])

    one = build()
    monkeypatch.setattr(sp, "_EXPAND_BLOCK_ROWS_L", 512 * 32)
    blocked = build()
    assert one.shape == blocked.shape
    assert np.array_equal(one, blocked)
