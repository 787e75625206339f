import asyncio
import time

import pytest

from rag_application_tpu.utils.observability import METRICS, Metrics


def test_counters_and_gauges():
    m = Metrics()
    m.inc("requests", user="a")
    m.inc("requests", 2, user="a")
    m.set_gauge("queue_depth", 7)
    text = m.render()
    assert 'requests_total{user="a"} 3.0' in text
    assert "queue_depth 7" in text


def test_histogram_and_quantile():
    m = Metrics()
    for v in (0.001, 0.002, 0.002, 0.2):
        m.observe("latency", v)
    q50 = m.quantile("latency", 0.5)
    assert q50 is not None and q50 <= 0.0025
    text = m.render()
    assert "latency_count 4" in text
    assert "latency_sum" in text


def test_stage_timer():
    m = Metrics()
    with m.stage_timer("encode"):
        time.sleep(0.01)
    assert m.quantile("stage_seconds", 0.5, stage="encode") >= 0.005


def test_metrics_endpoint_and_vlm_chat_agent():
    """Covers /metrics plus ChatAgent + VLMProcessor wiring."""

    async def main():
        import httpx

        from rag_application_tpu.agents import AGENT_CLASS_MAP
        from rag_application_tpu.agents.chat_agent import ChatAgent  # noqa: F401 — registers
        from rag_application_tpu.api.app import build_app
        from rag_application_tpu.api.http import HTTPServer
        from rag_application_tpu.config import Config, EncoderConfig, IndexConfig
        from rag_application_tpu.llm.router import LLMRouter, Provider
        from rag_application_tpu.llm.vlm import VLMProcessor
        from rag_application_tpu.models.embedder import Embedder

        assert "chat_agent" in AGENT_CLASS_MAP
        assert "knowledge_search_agent" in AGENT_CLASS_MAP

        # VLM processor replaces image blocks and caches by content
        vlm = VLMProcessor(LLMRouter(Provider.STUB))
        msgs = [{"role": "user", "content": [
            {"type": "text", "text": "what is this?"},
            {"type": "image_url", "image_url": {"url": "data:abc"}}]}]
        out = await vlm.process_messages(msgs)
        assert "[Image:" in out[0]["content"]
        await vlm.process_messages(msgs)
        assert vlm.calls == 1  # cached

        cfg = Config()
        cfg.index = IndexConfig(dim=32, matryoshka_dims=(8,), initial_capacity=16)
        enc = EncoderConfig(vocab_size=256, hidden_dim=32, num_layers=1,
                            num_heads=4, mlp_dim=64, max_len=16, out_dim=32,
                            dtype="float32")
        router, state = build_app(cfg, llm=LLMRouter(Provider.STUB),
                                  embedder=Embedder(cfg=enc, batch_size=4,
                                                    max_len=16))
        server = HTTPServer(router, port=0)
        port = await server.start()
        try:
            async with httpx.AsyncClient(
                base_url=f"http://127.0.0.1:{port}") as c:
                r = await c.get("/metrics")
                assert r.status_code == 200
                assert "version=0.0.4" in r.headers["content-type"]
        finally:
            await server.stop()

    asyncio.run(main())
