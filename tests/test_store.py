import numpy as np
import pytest

from rag_application_tpu.config import Config, FunnelConfig, IndexConfig, SparseConfig
from rag_application_tpu.index.checkpoint import load_collection, save_collection
from rag_application_tpu.index.payload import PayloadStore
from rag_application_tpu.store.collection import Collection, VectorStore


def small_config():
    cfg = Config()
    cfg.index = IndexConfig(dim=32, matryoshka_dims=(8, 16), initial_capacity=8)
    cfg.sparse = SparseConfig(candidate_pool=64, max_query_terms=8)
    cfg.funnel = FunnelConfig(matryoshka_limits=(8, 6), dense_limit=5,
                              quantized_limit=5, sparse_limit=5, final_limit=5)
    return cfg


def make_collection(rng, n=10):
    col = Collection("user_test", small_config())
    embs = rng.standard_normal((n, 32)).astype(np.float32)
    chunks = [{"text": f"chunk number {i} about topic{i}", "page": i} for i in range(n)]
    col.store_document_vectors("doc-1", chunks[: n // 2], embs[: n // 2])
    col.store_document_vectors("doc-2", chunks[n // 2:], embs[n // 2:],
                               extra_payload={"user_id": "u2"})
    return col, embs


def test_payload_store_filters():
    store = PayloadStore()
    store.add([{"user_id": "a", "document_id": "d1"},
               {"user_id": "a", "document_id": "d2"},
               {"user_id": "b", "document_id": "d1"}])
    assert store.rows_where(user_id="a") == [0, 1]
    assert store.rows_where(user_id="a", document_id="d1") == [0]
    mask = store.filter_mask(8, user_id="b")
    assert mask.tolist() == [False, False, True, False, False, False, False, False]
    assert store.filter_mask(8) is None
    store.delete([0])
    assert store.rows_where(user_id="a") == [1]


def test_collection_store_and_search(rng):
    col, embs = make_collection(rng)
    assert col.chunk_count() == 10
    hits = col.hybrid_search(embs[3], "chunk number 3", limit=3, adaptive=False)
    assert hits[0].row == 3
    assert hits[0].payload["document_id"] == "doc-1"
    assert hits[0].payload["page"] == 3


def test_collection_document_filter(rng):
    col, embs = make_collection(rng)
    hits = col.hybrid_search(embs[1], None, limit=5, adaptive=False,
                             document_id="doc-2")
    assert all(h.payload["document_id"] == "doc-2" for h in hits)


def test_collection_delete_document(rng):
    col, embs = make_collection(rng)
    removed = col.delete_document("doc-1")
    assert removed == 5
    assert col.chunk_count() == 5
    hits = col.hybrid_search(embs[0], None, limit=5, adaptive=False)
    assert all(h.payload["document_id"] != "doc-1" for h in hits)
    # idempotent re-delete
    assert col.delete_document("doc-1") == 0


def test_chat_vectors(rng):
    col, embs = make_collection(rng)
    msg_embs = rng.standard_normal((2, 32)).astype(np.float32)
    col.store_chat_vectors("thread-9", [{"text": "hello there"},
                                        {"text": "general kenobi"}], msg_embs)
    hits = col.hybrid_search(msg_embs[0], None, limit=3, adaptive=False,
                             kind="chat")
    assert hits[0].payload["thread_id"] == "thread-9"


def test_vector_store_registry():
    vs = VectorStore(small_config())
    c1 = vs.get_or_create("alice")
    c2 = vs.get_or_create("alice")
    assert c1 is c2
    vs.get_or_create("bob")
    assert vs.names() == ["user_alice", "user_bob"]
    assert vs.drop("bob") and not vs.drop("bob")


def test_checkpoint_roundtrip(rng, tmp_path):
    col, embs = make_collection(rng)
    col.delete_document("doc-1")
    path = str(tmp_path / "ckpt")
    save_collection(col, path)
    restored = load_collection(path, small_config())

    assert restored.chunk_count() == col.chunk_count()
    q = embs[7]
    orig = col.hybrid_search(q, "chunk number 7", limit=3, adaptive=False)
    got = restored.hybrid_search(q, "chunk number 7", limit=3, adaptive=False)
    assert [h.row for h in got] == [h.row for h in orig]
    np.testing.assert_allclose([h.score for h in got],
                               [h.score for h in orig], rtol=1e-5)
    assert got[0].payload == orig[0].payload


def test_checkpoint_atomic_overwrite(rng, tmp_path):
    col, _ = make_collection(rng)
    path = str(tmp_path / "ckpt")
    save_collection(col, path)
    # second save over the same path succeeds and remains loadable
    save_collection(col, path)
    restored = load_collection(path, small_config())
    assert restored.chunk_count() == col.chunk_count()


def test_checkpoint_consistent_under_concurrent_writes(rng, tmp_path):
    """A snapshot taken while another thread inserts must stay row-aligned
    (dense size == sparse docs == payload rows) — the executor-thread
    checkpointer races the event-loop mutators in serve.py."""
    import threading

    col, _ = make_collection(rng)
    path = str(tmp_path / "ckpt")
    stop = threading.Event()
    errors = []

    def writer():
        i = 0
        while not stop.is_set():
            embs = rng.standard_normal((3, 32)).astype(np.float32)
            chunks = [{"text": f"w{i} c{j} topic{j}"} for j in range(3)]
            try:
                col.store_document_vectors(f"wdoc-{i}", chunks, embs)
                if i % 4 == 3:
                    col.delete_document(f"wdoc-{i - 1}")
            except Exception as e:  # pragma: no cover
                errors.append(e)
                return
            i += 1

    t = threading.Thread(target=writer)
    t.start()
    try:
        for _ in range(5):
            save_collection(col, path)
            restored = load_collection(path, small_config())
            n = restored.dense.size
            assert len(restored.sparse) == n
            assert len(restored.payloads) == n
    finally:
        stop.set()
        t.join()
    assert not errors


def test_hybrid_search_text_batch_matches_encode_then_search():
    """Tokens-wire Collection search (bind_query_encoder +
    hybrid_search_text_batch): identical hits to host-encode +
    hybrid_search_batch — the serve micro-batcher's RAGTPU_TOKENS_WIRE
    path."""
    from rag_application_tpu.config import EncoderConfig
    from rag_application_tpu.models.embedder import Embedder
    from rag_application_tpu.models.encoder import init_encoder

    rng = np.random.default_rng(11)
    ecfg = EncoderConfig(vocab_size=512, hidden_dim=32, num_layers=1,
                         num_heads=4, mlp_dim=64, max_len=16, out_dim=32,
                         dtype="float32")
    state = init_encoder(ecfg, max_len=16)
    emb = Embedder(cfg=ecfg, state=state, batch_size=4, max_len=16)

    col = Collection("user_tok", small_config())
    texts = [f"document about topic{i} and subject{i % 3}"
             for i in range(12)]
    vecs = emb.encode(texts)
    col.store_document_vectors(
        "doc-1", [{"text": t, "page": i} for i, t in enumerate(texts)],
        vecs)

    col.bind_query_encoder(emb)
    queries = ["document about topic3", "subject2 document"]
    classic = col.hybrid_search_batch(emb.encode(queries), queries, 4)
    tok = col.hybrid_search_text_batch(queries, 4)
    for a, b in zip(classic, tok):
        assert [h.row for h in a] == [h.row for h in b]
        np.testing.assert_allclose([h.score for h in a],
                                   [h.score for h in b], rtol=1e-5)
    # filters ride along
    filt = col.hybrid_search_text_batch(queries, 4, page=3)
    assert all(h.payload["page"] == 3 for hits in filt for h in hits)
