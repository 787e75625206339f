import asyncio

import numpy as np
import pytest

from rag_application_tpu.config import (
    Config,
    EncoderConfig,
    FunnelConfig,
    IndexConfig,
    IngestConfig,
    KGConfig,
    SparseConfig,
)
from rag_application_tpu.ingest.chunker import chunk_text, chunk_words
from rag_application_tpu.ingest.pipeline import IngestPipeline, classify_file
from rag_application_tpu.ingest.queue import (
    NonRetryableError,
    Task,
    TaskType,
    WorkQueue,
    task_priority,
)
from rag_application_tpu.kg.store import KGStore
from rag_application_tpu.models.embedder import Embedder
from rag_application_tpu.store.collection import Collection

TINY = EncoderConfig(vocab_size=512, hidden_dim=32, num_layers=1, num_heads=4,
                     mlp_dim=64, max_len=32, out_dim=32, dtype="float32")


def small_config():
    cfg = Config()
    cfg.index = IndexConfig(dim=32, matryoshka_dims=(8, 16), initial_capacity=16)
    cfg.sparse = SparseConfig(candidate_pool=64, max_query_terms=8)
    cfg.funnel = FunnelConfig(matryoshka_limits=(8, 6), dense_limit=5,
                              quantized_limit=5, sparse_limit=5, final_limit=5)
    return cfg


# ------------------------------------------------------------------ chunker

def test_chunk_words_packing():
    text = " ".join(["word"] * 100)
    chunks = chunk_words(text, 50)
    assert all(len(c) <= 50 for c in chunks)
    assert " ".join(chunks).split() == text.split()


def test_chunk_words_overlong_word():
    chunks = chunk_words("tiny " + "x" * 100 + " small", 50)
    assert any(len(c) == 100 for c in chunks)


def test_chunk_text_overlap():
    paras = "\n\n".join(f"paragraph number {i} " + "filler " * 30
                        for i in range(10))
    chunks = chunk_text(paras, chunk_size=400, chunk_overlap=50)
    assert len(chunks) > 1
    for prev, nxt in zip(chunks, chunks[1:]):
        assert nxt.startswith(prev[-50:])


def test_chunk_text_heading_boundary():
    text = "intro text\n\n# Section One\n\nbody\n\n# Section Two\n\nmore"
    chunks = chunk_text(text, chunk_size=10_000, chunk_overlap=0)
    assert len(chunks) >= 3


# -------------------------------------------------------------------- queue

def test_task_priority_parity():
    assert task_priority(TaskType.FILE) == 255
    assert task_priority(TaskType.STRUCTURED_CHUNK, 3) == 247
    assert task_priority(TaskType.DIRECT_CHUNK, 0) == 230
    assert task_priority(TaskType.UNSTRUCTURED_PAGE, 5) == 200


def test_queue_priority_and_ledger():
    async def main():
        q = WorkQueue(max_retries=3, max_concurrency=1)
        order = []

        async def handler(task):
            order.append(task.payload["n"])

        await q.put(Task(TaskType.UNSTRUCTURED_PAGE, {"n": 3}, priority=10))
        await q.put(Task(TaskType.FILE, {"n": 1}, priority=255))
        await q.put(Task(TaskType.DIRECT_CHUNK, {"n": 2}, priority=100))
        await q.run(handler)
        assert order == [1, 2, 3]
        assert q.queue_info()["succeeded"] == 3
        assert q.succeeded[0]["processing_time_seconds"] >= 0

    asyncio.run(main())


def test_queue_retry_then_failed():
    async def main():
        q = WorkQueue(max_retries=3, max_concurrency=2)
        attempts = {"flaky": 0}

        async def handler(task):
            if task.payload["kind"] == "fatal":
                raise NonRetryableError("no such key")
            attempts["flaky"] += 1
            if attempts["flaky"] < 3:
                raise RuntimeError("transient")

        await q.put(Task(TaskType.DIRECT_CHUNK, {"kind": "flaky"}))
        await q.put(Task(TaskType.DIRECT_CHUNK, {"kind": "fatal"}))
        await q.run(handler)
        assert attempts["flaky"] == 3  # retried to success
        assert len(q.failed) == 1 and q.failed[0].payload["kind"] == "fatal"
        assert q.failed[0].attempts == 0  # non-retryable skipped the cycle

    asyncio.run(main())


def test_queue_exhausts_retries():
    async def main():
        q = WorkQueue(max_retries=2, max_concurrency=1)

        async def handler(task):
            raise RuntimeError("always")

        await q.put(Task(TaskType.DIRECT_CHUNK, {}))
        await q.run(handler)
        assert len(q.failed) == 1
        assert q.failed[0].attempts == 2

    asyncio.run(main())


# ----------------------------------------------------------------- pipeline

def test_classify_file():
    assert classify_file("a.csv") == "structured"
    assert classify_file("a.md") == "direct"
    assert classify_file("a.pdf") == "unstructured"
    assert classify_file("x", mime="text/plain") == "direct"


@pytest.fixture
def pipeline():
    col = Collection("t", small_config())
    emb = Embedder(cfg=TINY, batch_size=4, max_len=32)
    kg = KGStore(KGConfig(max_degree=8), dim=32)

    def extractor(text):
        if "vivek" in text.lower():
            return {
                "entities": [
                    {"id": "vivek", "text": "Vivek", "entity_type": "PERSON",
                     "entity_profile": "author"}],
                "relationships": [],
            }
        return {"entities": [], "relationships": []}

    return IngestPipeline(col, emb, kg=kg, kg_extractor=extractor,
                          config=IngestConfig(chunk_chars=200,
                                              max_concurrency=4))


def test_ingest_text_end_to_end(pipeline):
    res = asyncio.run(pipeline.ingest_text(
        "Vivek built a retrieval system. " * 20, document_id="doc1"))
    assert res.chunks >= 2
    assert res.failed_tasks == 0
    hits = pipeline.collection.hybrid_search(
        pipeline.embedder.encode(["retrieval system"])[0],
        "retrieval system", limit=3, adaptive=False)
    assert hits and hits[0].payload["document_id"] == "doc1"
    # KG got the entity
    ents = pipeline.kg.get_entities("doc1")
    assert any(e["id"] == "vivek" for e in ents)


def test_ingest_csv_structured(pipeline):
    csv = b"name,age\nalice,30\nbob,25\n"
    res = asyncio.run(pipeline.ingest_file("people.csv", csv,
                                           document_id="sheet1"))
    assert res.chunks == 1
    rows = pipeline.collection.payloads.rows_where(document_id="sheet1")
    payload = pipeline.collection.payloads.get(rows[0])
    assert payload["source"] == "structured"
    assert "name" in payload["text"]
    stats = pipeline.kg.stats()
    assert stats["column"] == 2


def test_ingest_reingest_idempotent(pipeline):
    asyncio.run(pipeline.ingest_text("some document text here " * 30,
                                     document_id="dup"))
    first = pipeline.collection.chunk_count()
    asyncio.run(pipeline.ingest_text("some document text here " * 30,
                                     document_id="dup"))
    assert pipeline.collection.chunk_count() == first


def test_ingest_empty_csv_nonretryable(pipeline):
    res = asyncio.run(pipeline.ingest_file("empty.csv", b"",
                                           document_id="e1"))
    assert res.chunks == 0
    assert len(pipeline.queue.failed) == 1
    assert pipeline.queue.failed[0].attempts == 0  # straight to failed


def test_ingest_contextualized(pipeline):
    """Contextual chunk augmentation (text_processor.py:214-309 parity):
    doc summary + per-chunk context stored and used for embedding."""
    from rag_application_tpu.llm.router import LLMRouter, Provider

    llm = LLMRouter(Provider.STUB)
    llm.stub.on(r"Summarize this document", lambda _: "a doc about retrieval")
    llm.stub.on(r"situating the target chunk", lambda _: "context: part of the retrieval doc")
    pipeline.contextualizer = llm
    res = asyncio.run(pipeline.ingest_text(
        "retrieval systems need context. " * 40, document_id="ctxdoc"))
    assert res.chunks >= 2
    rows = pipeline.collection.payloads.rows_where(document_id="ctxdoc")
    payload = pipeline.collection.payloads.get(rows[0])
    assert payload["context"] == "context: part of the retrieval doc"
    pipeline.contextualizer = None


def test_ingest_image_without_vlm_fails_cleanly(pipeline):
    res = asyncio.run(pipeline.ingest_file("pic.png", b"\x89PNG...",
                                           document_id="img"))
    assert res.chunks == 0
    assert pipeline.queue.failed
    assert "page_describer" in pipeline.queue.failed[-1].error


def test_queue_bound_evicts_lowest_priority():
    """Bounded queue sheds the least-urgent backlog, never the next task."""
    async def main():
        q = WorkQueue(max_concurrency=1, max_length=3)
        await q.put(Task(TaskType.FILE, {"n": "hi"}, priority=255))
        await q.put(Task(TaskType.DIRECT_CHUNK, {"n": "mid"}, priority=100))
        await q.put(Task(TaskType.UNSTRUCTURED_PAGE, {"n": "low"}, priority=1))
        await q.put(Task(TaskType.DIRECT_CHUNK, {"n": "mid2"}, priority=90))
        order = []

        async def handler(task):
            order.append(task.payload["n"])

        await q.run(handler)
        assert "hi" in order and "low" not in order
        assert order[0] == "hi"

    asyncio.run(main())


def test_ingest_url_with_fetcher(rng):
    """URL ingest: fetch -> readable text -> FILE pipeline (the reference
    declares /ingest/url but its URL task raises NotImplementedError,
    orchestrator.py:24-27)."""
    col = Collection("u", small_config())
    emb = Embedder(cfg=TINY, batch_size=4, max_len=32)

    async def fetcher(url):
        assert url == "https://example.com/docs/page"
        return ("<html><head><script>x()</script></head><body>"
                "<h1>Retrieval</h1><p>" + "engine facts. " * 40
                + "</p></body></html>")

    pipe = IngestPipeline(col, emb, url_fetcher=fetcher,
                          config=IngestConfig(chunk_chars=200,
                                              max_concurrency=4))
    res = asyncio.run(pipe.ingest_url("https://example.com/docs/page"))
    assert res.failed_tasks == 0
    assert res.chunks >= 1
    rows = col.payloads.rows_where(document_id="https://example.com/docs/page")
    text = col.payloads.get(rows[0])["text"]
    assert "engine facts" in text and "<script>" not in text


def test_ingest_url_without_fetcher_fails_into_ledger():
    col = Collection("u2", small_config())
    emb = Embedder(cfg=TINY, batch_size=4, max_len=32)
    pipe = IngestPipeline(col, emb, config=IngestConfig(max_concurrency=2))
    res = asyncio.run(pipe.ingest_url("https://nowhere.invalid/x"))
    assert res.chunks == 0
    assert res.failed_tasks == 1


def test_failed_tasks_counts_current_ingest_only(pipeline):
    """The failed ledger is append-only; results must report only THIS
    ingest's failures."""
    r1 = asyncio.run(pipeline.ingest_file("song.mp3", b"\xff\xfbbinary",
                                          document_id="bad"))
    assert r1.failed_tasks == 1
    r2 = asyncio.run(pipeline.ingest_text("perfectly fine text " * 30,
                                          document_id="good"))
    assert r2.failed_tasks == 0


def test_queue_chaos_no_task_lost():
    """Fault injection (SURVEY §5.3 notes the reference has none): under
    random transient failures and a burst of concurrent producers, every
    task ends in exactly one ledger — succeeded or failed — and retry
    accounting stays within budget."""
    import numpy as np

    rng = np.random.default_rng(0)

    async def main():
        q = WorkQueue(max_retries=3, max_concurrency=8)
        n_tasks = 200
        fail_p = {i: float(rng.random() * 0.8) for i in range(n_tasks)}
        fatal = set(int(i) for i in rng.choice(n_tasks, 10, replace=False))
        seen = []

        async def handler(task):
            i = task.payload["i"]
            seen.append(i)
            if i in fatal:
                raise NonRetryableError("fatal")
            if rng.random() < fail_p[i]:
                raise RuntimeError("transient")

        async def producer(lo, hi):
            for i in range(lo, hi):
                await q.put(Task(TaskType.DIRECT_CHUNK, {"i": i},
                                 priority=int(rng.integers(0, 256))))

        await asyncio.gather(*[producer(j * 50, (j + 1) * 50)
                               for j in range(4)])
        await q.run(handler)

        done = {t["task"].payload["i"] if isinstance(t, dict) else
                t.payload["i"] for t in q.failed}
        info = q.queue_info()
        assert info["succeeded"] + info["failed"] == n_tasks
        # fatal tasks are always in failed, never succeeded
        assert fatal <= done
        # every failure burned the full retry budget (except fatal)
        for t in q.failed:
            task = t["task"] if isinstance(t, dict) else t
            if task.payload["i"] not in fatal:
                assert task.attempts == 3

    asyncio.run(main())
