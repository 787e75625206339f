import asyncio
import base64
import json

import httpx
import pytest

from rag_application_tpu.api.app import build_app
from rag_application_tpu.api.http import HTTPServer
from rag_application_tpu.config import (
    Config,
    EncoderConfig,
    FunnelConfig,
    IndexConfig,
    IngestConfig,
    SparseConfig,
)
from rag_application_tpu.llm.router import LLMRouter, Provider
from rag_application_tpu.models.embedder import Embedder

TINY = EncoderConfig(vocab_size=512, hidden_dim=32, num_layers=1, num_heads=4,
                     mlp_dim=64, max_len=32, out_dim=32, dtype="float32")


def small_config():
    cfg = Config()
    cfg.index = IndexConfig(dim=32, matryoshka_dims=(8, 16), initial_capacity=16)
    cfg.sparse = SparseConfig(candidate_pool=64, max_query_terms=8)
    cfg.funnel = FunnelConfig(matryoshka_limits=(8, 6), dense_limit=5,
                              quantized_limit=5, sparse_limit=5, final_limit=5)
    cfg.ingest = IngestConfig(chunk_chars=300, max_concurrency=4)
    return cfg


def with_server(fn):
    async def main():
        llm = LLMRouter(Provider.STUB)
        emb = Embedder(cfg=TINY, batch_size=4, max_len=16)
        router, state = build_app(small_config(), llm=llm, embedder=emb)
        server = HTTPServer(router, port=0)
        port = await server.start()
        try:
            async with httpx.AsyncClient(
                base_url=f"http://127.0.0.1:{port}", timeout=60
            ) as client:
                await fn(client, state)
        finally:
            await server.stop()

    asyncio.run(main())


def test_chunked_upload_protocol():
    async def fn(client, state):
        r = await client.post("/api/v1/upload/start", json={
            "filename": "big.txt", "user_id": "u"})
        approval = r.json()["approval_id"]
        data = ("chunk one of the file. " * 20).encode()
        half = len(data) // 2
        r = await client.post(f"/api/v1/upload/chunk/{approval}/1",
                              content=data[half:])
        assert r.status_code == 200
        r = await client.post(f"/api/v1/upload/chunk/{approval}/0",
                              content=data[:half])
        assert r.status_code == 200
        r = await client.post(f"/api/v1/upload/complete/{approval}")
        assert r.status_code == 202 and r.json()["chunks"] >= 1
        # approval id is single-use
        r = await client.post(f"/api/v1/upload/complete/{approval}")
        assert r.status_code == 404
    with_server(fn)


def test_storage_webhook():
    async def fn(client, state):
        r = await client.post("/webhook/storage", json={"Records": [
            {"s3": {"object": {"key": "hooked.txt"}},
             "user_id": "w", "content": "webhook ingested text " * 10}]})
        assert r.status_code == 202
        assert r.json()["accepted"] == ["hooked.txt"]
        r = await client.get("/api/v1/documents", params={"user_id": "w"})
        docs = r.json()["documents"]
        assert docs and docs[0]["document_id"] == "hooked.txt"
    with_server(fn)


def test_agents_catalog():
    async def fn(client, state):
        r = await client.get("/agents")
        ids = [a["id"] for a in r.json()["agents"]]
        assert {"chat_agent", "deep_research_agent",
                "knowledge_search_agent"} <= set(ids)
    with_server(fn)


def test_llm_passthrough_non_stream_and_stream():
    async def fn(client, state):
        r = await client.post("/v1/chat/completions", json={
            "messages": [{"role": "user", "content": "passthrough hello"}]})
        body = r.json()
        assert body["choices"][0]["message"]["content"].startswith("[stub]")

        async with client.stream("POST", "/v1/chat/completions", json={
            "stream": True,
            "messages": [{"role": "user", "content": "stream pass"}],
        }) as r:
            text = ""
            async for line in r.aiter_lines():
                if line.startswith("data:"):
                    d = line[5:].strip()
                    if d == "[DONE]":
                        break
                    j = json.loads(d)
                    text += j["choices"][0]["delta"].get("content", "")
        assert "stream pass" in text
    with_server(fn)


def test_user_signup_signin_crud():
    async def fn(client, state):
        r = await client.post("/api/v1/users/signup", json={
            "username": "vivek", "password": "s3cret", "email": "v@x.io"})
        assert r.status_code == 201
        uid = r.json()["user_id"]
        # duplicate username rejected
        r = await client.post("/api/v1/users/signup", json={
            "username": "vivek", "password": "other"})
        assert r.status_code == 422
        # signin
        r = await client.post("/api/v1/users/signin", json={
            "username": "vivek", "password": "s3cret"})
        token = r.json()["access_token"]
        assert state.user_registry.verify_token(token) == uid
        r = await client.post("/api/v1/users/signin", json={
            "username": "vivek", "password": "wrong"})
        assert r.status_code == 401
        # CRUD
        r = await client.get(f"/api/v1/users/{uid}")
        assert r.json()["email"] == "v@x.io"
        r = await client.put(f"/api/v1/users/{uid}",
                             json={"email": "new@x.io"})
        assert r.json()["email"] == "new@x.io"
        r = await client.request("DELETE", f"/api/v1/users/{uid}")
        assert r.json()["deleted"]
        r = await client.get(f"/api/v1/users/{uid}")
        assert r.status_code == 404
    with_server(fn)


def test_agent_config_crud_and_tools_listing():
    async def fn(client, state):
        r = await client.post("/api/v1/agents", json={
            "name": "support bot", "base": "chat_agent",
            "system_prompt": "be nice"})
        assert r.status_code == 201
        aid = r.json()["agent_id"]
        r = await client.post("/api/v1/agents", json={
            "name": "x", "base": "nope"})
        assert r.status_code == 422
        r = await client.get("/api/v1/agents")
        assert any(a["agent_id"] == aid for a in r.json()["agents"])
        r = await client.put(f"/api/v1/agents/{aid}", json={"name": "bot2"})
        assert r.json()["name"] == "bot2"
        r = await client.request("DELETE", f"/api/v1/agents/{aid}")
        assert r.json()["deleted"]
        # tools listing
        r = await client.get("/v1/tools")
        assert len(r.json()["tools"]) >= 21
    with_server(fn)


def test_documents_rest_crud():
    async def fn(client, state):
        await client.post("/ingest/raw-text", json={
            "text": "document body text " * 20, "document_id": "docA",
            "user_id": "d"})
        r = await client.get("/api/v1/documents/docA",
                             params={"user_id": "d"})
        assert r.status_code == 200 and r.json()["chunks"] >= 1
        r = await client.get("/api/v1/documents/missing",
                             params={"user_id": "d"})
        assert r.status_code == 404
        r = await client.request("DELETE", "/api/v1/documents/docA",
                                 params={"user_id": "d"})
        assert r.json()["deleted_chunks"] >= 1
        r = await client.request("DELETE", "/api/v1/documents/docA",
                                 params={"user_id": "d"})
        assert r.status_code == 404
    with_server(fn)


def test_keep_alive_reuses_connection():
    """Two requests ride ONE TCP connection (keep-alive); an explicit
    Connection: close closes it."""
    import asyncio

    from rag_application_tpu.api.http import HTTPServer, JSONResponse, Router

    async def main():
        router = Router()

        @router.route("GET", "/ping")
        async def ping(req):
            return JSONResponse({"ok": True})

        server = HTTPServer(router, port=0)
        port = await server.start()
        try:
            reader, writer = await asyncio.open_connection("127.0.0.1", port)
            for i in range(3):
                writer.write(b"GET /ping HTTP/1.1\r\nhost: x\r\n\r\n")
                await writer.drain()
                status = await reader.readline()
                assert b"200" in status
                headers = {}
                while True:
                    line = await reader.readline()
                    if line in (b"\r\n", b"\n"):
                        break
                    k, _, v = line.decode().partition(":")
                    headers[k.strip().lower()] = v.strip()
                body = await reader.readexactly(
                    int(headers["content-length"]))
                assert b"true" in body
                assert headers["connection"] == "keep-alive"
            # explicit close is honored
            writer.write(b"GET /ping HTTP/1.1\r\nhost: x\r\n"
                         b"connection: close\r\n\r\n")
            await writer.drain()
            data = await reader.read()  # server closes after response
            assert b"connection: close" in data
            writer.close()
            await writer.wait_closed()
        finally:
            await server.stop()

    asyncio.run(main())


def test_app_wires_kg_extractor_into_ingest():
    """build_app(kg_extractor=...) must flow into every user pipeline so
    served ingest populates the knowledge graph (parity: per-page KG
    extraction, _unstructured_processor.py:55-66)."""
    import asyncio

    from rag_application_tpu.api.app import build_app
    from rag_application_tpu.config import (
        Config, EncoderConfig, FunnelConfig, IndexConfig, SparseConfig)
    from rag_application_tpu.llm.router import LLMRouter, Provider
    from rag_application_tpu.models.embedder import Embedder

    cfg = Config()
    cfg.index = IndexConfig(dim=32, matryoshka_dims=(8, 16),
                            initial_capacity=16)
    cfg.sparse = SparseConfig(candidate_pool=64, max_query_terms=8)
    cfg.funnel = FunnelConfig(matryoshka_limits=(8, 6), dense_limit=5,
                              quantized_limit=5, sparse_limit=5,
                              final_limit=5)
    tiny = EncoderConfig(vocab_size=512, hidden_dim=32, num_layers=1,
                         num_heads=4, mlp_dim=64, max_len=32, out_dim=32,
                         dtype="float32")

    async def extractor(text):
        return {"entities": [
            {"id": "ada", "text": "Ada", "entity_type": "PERSON",
             "entity_profile": "mathematician"}], "relationships": []}

    router, state = build_app(
        cfg, llm=LLMRouter(Provider.STUB),
        embedder=Embedder(cfg=tiny, batch_size=4, max_len=16),
        kg_extractor=extractor)
    sp = state.space("u1")
    assert sp.pipeline.kg_extractor is extractor
    res = asyncio.run(sp.pipeline.ingest_text(
        "Ada wrote the first program.", document_id="d1"))
    assert res.failed_tasks == 0
    ents = sp.kg.get_entities()
    assert any(e.get("text") == "Ada" for e in ents)


def test_chunked_request_closes_connection():
    """Transfer-Encoding bodies are not framed by this server; the
    connection must close after the response so unread body bytes are
    discarded instead of parsing as the next request (desync/smuggling
    shape)."""
    import asyncio

    from rag_application_tpu.api.http import HTTPServer, JSONResponse, Router

    async def main():
        router = Router()

        @router.route("GET", "/ping")
        async def ping(req):
            return JSONResponse({"ok": True})

        server = HTTPServer(router, port=0)
        port = await server.start()
        try:
            reader, writer = await asyncio.open_connection("127.0.0.1", port)
            writer.write(b"GET /ping HTTP/1.1\r\nhost: x\r\n"
                         b"transfer-encoding: chunked\r\n\r\n"
                         b"5\r\nhello\r\n0\r\n\r\n")
            await writer.drain()
            data = await asyncio.wait_for(reader.read(), timeout=10)
            # one response, connection: close, then EOF (chunk bytes
            # never parsed as a second request)
            assert data.count(b"HTTP/1.1") == 1
            assert b"connection: close" in data
            writer.close()
            await writer.wait_closed()
        finally:
            await server.stop()

    asyncio.run(main())


def test_filtered_search_and_collection_counts():
    """Payload filters over HTTP + the MCP collections surface.

    Parity: hybrid_search(filters=...) (qdrant_handler.py:297),
    get_collection_chunk_count filters (qdrant_handler.py:443-480), and
    GET /collections + /collections/{user_id}/count
    (qdrant_search_mcp_endpoint.py:102-151 — the reference stubs the
    filter plumbing out; here it works)."""
    async def fn(client, state):
        for did, text in [
            ("doc-cats", "Cats are small carnivorous mammals kept as pets. " * 4),
            ("doc-dogs", "Dogs are loyal domesticated canines kept as pets. " * 4),
        ]:
            r = await client.post("/ingest/raw-text", json={
                "text": text, "document_id": did, "user_id": "filt"})
            assert r.status_code == 202

        # unfiltered search sees both documents
        r = await client.post("/api/v1/search/hybrid", json={
            "query": "pets kept at home", "user_id": "filt", "limit": 8})
        docs = {h["payload"]["document_id"] for h in r.json()["results"]}
        assert docs == {"doc-cats", "doc-dogs"}

        # a document_id filter restricts results to that document —
        # even for a query that matches the other one better
        r = await client.post("/api/v1/search/hybrid", json={
            "query": "loyal dogs", "user_id": "filt", "limit": 8,
            "filters": {"document_id": "doc-cats"}})
        hits = r.json()["results"]
        assert hits
        assert {h["payload"]["document_id"] for h in hits} == {"doc-cats"}

        # a filter matching nothing returns empty, not an error
        r = await client.post("/api/v1/search/hybrid", json={
            "query": "pets", "user_id": "filt",
            "filters": {"document_id": "no-such-doc"}})
        assert r.json()["results"] == []

        # collections listing + filtered counts
        r = await client.get("/api/v1/collections")
        cols = {c["user_id"]: c["chunks"] for c in r.json()["collections"]}
        assert cols.get("filt", 0) >= 2
        r = await client.get("/api/v1/collections/filt/count")
        total = r.json()["chunks"]
        assert total == cols["filt"]
        r = await client.get(
            "/api/v1/collections/filt/count?document_id=doc-cats")
        cats = r.json()["chunks"]
        assert 0 < cats < total
        r = await client.get("/api/v1/collections/nobody/count")
        assert r.json()["chunks"] == 0
    with_server(fn)
