"""Object store (S3-semantics, filesystem-backed) + ingest handoff.

Parity targets: IndexerAPI/src/core/storage/s3_handler.py:14-254 (bucket
auto-create, upload/download/delete-prefix), file_processor.py:150-184
(per-page payload handoff through the store), rabbitmq_handler.py:37-63
(NoSuchKey is non-retryable), delete.py:10-60 (delete cascade).
"""

import asyncio

import pytest

from rag_application_tpu.config import Config, IngestConfig, KGConfig
from rag_application_tpu.ingest.pipeline import IngestPipeline
from rag_application_tpu.ingest.queue import NonRetryableError, Task, TaskType
from rag_application_tpu.kg.store import KGStore
from rag_application_tpu.models.embedder import Embedder
from rag_application_tpu.store.collection import Collection
from rag_application_tpu.store.objects import NoSuchKeyError, ObjectStore

from test_ingest import TINY, small_config


# --------------------------------------------------------------- store core

def test_put_get_roundtrip(tmp_path):
    st = ObjectStore(tmp_path)
    st.put_object("doc/a.txt", b"hello")
    assert st.get_object("doc/a.txt") == b"hello"
    assert st.object_exists("doc/a.txt")
    st.put_object("doc/a.txt", b"world")  # overwrite
    assert st.get_object("doc/a.txt") == b"world"


def test_missing_key_raises(tmp_path):
    st = ObjectStore(tmp_path)
    with pytest.raises(NoSuchKeyError):
        st.get_object("nope")
    assert not st.object_exists("nope")
    assert st.delete_object("nope") is False


def test_key_traversal_rejected(tmp_path):
    st = ObjectStore(tmp_path)
    with pytest.raises(ValueError):
        st.put_object("../escape.txt", b"x")
    with pytest.raises(ValueError):
        st.get_object("a/../../b")
    with pytest.raises(ValueError):
        st.put_object("", b"x")


def test_list_and_delete_prefix(tmp_path):
    st = ObjectStore(tmp_path)
    for k in ("d1/pages/1.txt", "d1/pages/2.txt", "d1/original/f.pdf",
              "d2/pages/1.txt"):
        st.put_object(k, b"x")
    assert st.list_objects("d1") == [
        "d1/original/f.pdf", "d1/pages/1.txt", "d1/pages/2.txt"]
    assert st.list_objects("d1/pages/1.txt") == ["d1/pages/1.txt"]
    assert st.delete_prefix("d1") == 3
    assert st.list_objects("d1") == []
    assert st.object_exists("d2/pages/1.txt")  # other prefix untouched


def test_buckets_isolated(tmp_path):
    st = ObjectStore(tmp_path)
    st.put_object("k", b"default")
    st.put_object("k", b"other", bucket="other")
    assert st.get_object("k") == b"default"
    assert st.get_object("k", bucket="other") == b"other"


# ------------------------------------------------------------ ingest handoff

@pytest.fixture
def pipeline_with_store(tmp_path):
    col = Collection("t", small_config())
    emb = Embedder(cfg=TINY, batch_size=4, max_len=32)
    kg = KGStore(KGConfig(max_degree=8), dim=32)
    store = ObjectStore(tmp_path)
    pipe = IngestPipeline(col, emb, kg=kg, object_store=store,
                          config=IngestConfig(chunk_chars=200,
                                              max_concurrency=4))
    return pipe, store


def test_page_handoff_through_store(pipeline_with_store):
    pipe, store = pipeline_with_store
    # explicit mime pins the unstructured route (content is text, which
    # the sniffing would legitimately classify as direct)
    text = ("page content about retrieval systems. " * 15).encode()
    res = asyncio.run(pipe.ingest_file("report.pdf", text,
                                       document_id="doc1",
                                       mime="application/pdf"))
    assert res.failed_tasks == 0
    assert res.chunks >= 2
    keys = store.list_objects("doc1")
    # original upload + one object per page
    assert "doc1/original/report.pdf" in keys
    assert sum(1 for k in keys if k.startswith("doc1/pages/")) == res.pages
    # page objects hold the indexed text
    rows = pipe.collection.payloads.rows_where(document_id="doc1")
    stored = store.get_object("doc1/pages/1.txt").decode()
    texts = {pipe.collection.payloads.get(r)["text"] for r in rows}
    assert stored in texts


def test_reingest_replaces_objects(pipeline_with_store):
    pipe, store = pipeline_with_store
    asyncio.run(pipe.ingest_file("r.pdf", b"first version " * 40,
                                 document_id="doc1", mime="application/pdf"))
    first = store.list_objects("doc1")
    asyncio.run(pipe.ingest_file("r.pdf", b"second " * 10,
                                 document_id="doc1", mime="application/pdf"))
    second = store.list_objects("doc1")
    assert second and set(second) != set(first)
    assert store.get_object("doc1/pages/1.txt").startswith(b"second")


def test_missing_page_object_nonretryable(pipeline_with_store):
    pipe, _ = pipeline_with_store
    task = Task(TaskType.UNSTRUCTURED_PAGE,
                {"document_id": "doc1", "page_number": 1,
                 "text_key": "doc1/pages/999.txt"})
    with pytest.raises(NonRetryableError):
        asyncio.run(pipe._handle_unstructured_page(task))


def test_api_delete_cascade(tmp_path):
    import httpx

    from rag_application_tpu.api.app import build_app
    from rag_application_tpu.api.http import HTTPServer

    cfg = small_config()
    cfg.ingest = IngestConfig(chunk_chars=200, max_concurrency=4,
                              object_store_dir=str(tmp_path))
    emb = Embedder(cfg=TINY, batch_size=4, max_len=32)

    async def main():
        router, state = build_app(cfg, embedder=emb)
        server = HTTPServer(router, port=0)
        port = await server.start()
        try:
            sp = state.space("u1")
            await sp.pipeline.ingest_file(
                "f.pdf", b"delete cascade text " * 30, document_id="docx")
            assert sp.pipeline.object_store.list_objects("docx")
            async with httpx.AsyncClient(
                base_url=f"http://127.0.0.1:{port}", timeout=60
            ) as client:
                r = await client.post("/delete/file",
                                      json={"user_id": "u1",
                                            "document_id": "docx"})
                assert r.status_code == 200
                assert r.json()["deleted_objects"] > 0
            assert sp.pipeline.object_store.list_objects("docx") == []
        finally:
            await server.stop()

    asyncio.run(main())


def test_user_id_cannot_escape_store_root(tmp_path):
    """user_id comes from the request body; a traversal-shaped id must
    not place the per-user store outside object_store_dir."""
    from rag_application_tpu.api.app import AppState, build_app
    from rag_application_tpu.models.embedder import Embedder

    from test_ingest import TINY

    cfg = small_config()
    cfg.ingest = IngestConfig(chunk_chars=200, max_concurrency=4,
                              object_store_dir=str(tmp_path / "store"))
    emb = Embedder(cfg=TINY, batch_size=4, max_len=32)
    _, state = build_app(cfg, embedder=emb)
    evil = "x/../../../../tmp/evil"
    sp = state.space(evil)
    base = sp.pipeline.object_store.base.resolve()
    assert str(base).startswith(str((tmp_path / "store").resolve()))
    # distinct hostile ids get distinct directories
    sp2 = state.space("x/............/tmp/evil")
    assert sp2.pipeline.object_store.base != sp.pipeline.object_store.base
