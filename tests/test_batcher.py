"""Request micro-batching (search/batcher.py): concurrent API searches
ride one engine dispatch."""

import asyncio

import numpy as np
import pytest

from rag_application_tpu.search.batcher import MicroBatcher, _bucket


def test_bucket_powers_of_two():
    assert [_bucket(n) for n in (1, 2, 3, 5, 9, 64, 65)] == \
        [1, 2, 4, 8, 16, 64, 128]
    assert _bucket(5000) == 2048  # capped


def test_concurrent_requests_share_one_dispatch():
    calls = []

    def run_batch(embs, texts, limit):
        calls.append(embs.shape[0])
        # hit lists echo the query row so routing is checkable
        return [[("hit", float(embs[i, 0]), limit)] * limit
                for i in range(embs.shape[0])]

    async def main():
        b = MicroBatcher(run_batch, max_wait_ms=10.0)
        outs = await asyncio.gather(*(
            b.search(np.full(4, float(i)), f"q{i}", limit=1 + i % 3)
            for i in range(20)))
        # every request got ITS row back, sliced to its own limit
        for i, hits in enumerate(outs):
            assert hits[0][1] == float(i)
            assert len(hits) == 1 + i % 3
        assert b.requests_served == 20
        # far fewer dispatches than requests (single digit, usually 1-2)
        assert b.batches_run <= 3
        # padded to a bucket: every dispatch size is a power of two
        assert all(n & (n - 1) == 0 for n in calls)

    asyncio.run(main())


def test_lone_request_latency_and_errors():
    def boom(embs, texts, limit):
        raise RuntimeError("engine down")

    async def main():
        ok = MicroBatcher(lambda e, t, k: [[1]] * e.shape[0],
                          max_wait_ms=1.0)
        t0 = asyncio.get_event_loop().time()
        out = await ok.search(np.zeros(4), None, 1)
        assert out == [1]
        assert asyncio.get_event_loop().time() - t0 < 0.5
        bad = MicroBatcher(boom, max_wait_ms=1.0)
        with pytest.raises(RuntimeError, match="engine down"):
            await bad.search(np.zeros(4), None, 1)

    asyncio.run(main())


def test_api_hybrid_endpoint_microbatches():
    import httpx

    from rag_application_tpu.api.app import build_app
    from rag_application_tpu.api.http import HTTPServer
    from rag_application_tpu.config import (Config, EncoderConfig,
                                            FunnelConfig, IndexConfig,
                                            SparseConfig)
    from rag_application_tpu.llm.router import LLMRouter, Provider
    from rag_application_tpu.models.embedder import Embedder

    tiny = EncoderConfig(vocab_size=512, hidden_dim=32, num_layers=1,
                         num_heads=4, mlp_dim=64, max_len=32, out_dim=32,
                         dtype="float32")
    cfg = Config()
    cfg.index = IndexConfig(dim=32, matryoshka_dims=(), initial_capacity=64)
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
                await c.post("/ingest/raw-text", json={
                    "text": "the quick brown fox jumps over lazy dogs " * 8,
                    "document_id": "d", "user_id": "u"})
                rs = await asyncio.gather(*(
                    c.post("/api/v1/search/hybrid",
                           json={"query": "quick fox", "user_id": "u"})
                    for _ in range(12)))
                assert all(r.status_code == 200 for r in rs)
                assert all(r.json()["results"] for r in rs)
                b = state.users["u"].batcher
                assert b is not None and b.requests_served == 12
                assert b.batches_run < 12  # shared dispatches
        finally:
            await server.stop()

    asyncio.run(main())


def test_mixed_embedding_group_resolves_every_future():
    """A group mixing embedding=None and ndarray submissions must resolve
    every future (result or exception), not kill the worker and hang the
    requests, and the worker must survive for the next group."""
    def run_batch(embs, texts, limit):
        return [["ok"]] * (embs.shape[0] if embs is not None else len(texts))

    async def main():
        b = MicroBatcher(run_batch, max_wait_ms=10.0)
        results = await asyncio.wait_for(asyncio.gather(
            b.search(None, "query one", 1),
            b.search(np.zeros(4, dtype=np.float32), "query two", 1),
            return_exceptions=True), timeout=10)
        assert len(results) == 2  # resolved, not hung
        # the worker survives for the next clean group
        out = await asyncio.wait_for(b.search(None, "query three", 1),
                                     timeout=10)
        assert out == ["ok"]

    asyncio.run(main())
