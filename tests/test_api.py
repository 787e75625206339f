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
    """Run `fn(client)` against a live server instance."""

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


def test_health_and_models():
    async def fn(client, state):
        r = await client.get("/health")
        assert r.status_code == 200 and r.json()["status"] == "ok"
        r = await client.get("/v1/models")
        ids = [m["id"] for m in r.json()["data"]]
        assert "stub-model" in ids
    with_server(fn)


def test_404_and_405():
    async def fn(client, state):
        r = await client.get("/nope")
        assert r.status_code == 404
        r = await client.get("/ingest/file")
        assert r.status_code == 405
    with_server(fn)


def test_ingest_search_ask_delete_flow():
    async def fn(client, state):
        text = ("Vivek Malipatel created the OmniRAG retrieval platform. "
                "It uses hybrid dense and sparse search with rank fusion. ") * 5
        r = await client.post("/ingest/raw-text", json={
            "text": text, "document_id": "omnirag-doc", "user_id": "alice"})
        assert r.status_code == 202
        assert r.json()["chunks"] >= 1

        r = await client.post("/api/v1/search/hybrid", json={
            "query": "who created omnirag", "user_id": "alice", "limit": 3})
        hits = r.json()["results"]
        assert hits and hits[0]["payload"]["document_id"] == "omnirag-doc"

        r = await client.post("/search/scout", json={
            "query": "omnirag platform", "user_id": "alice"})
        assert r.status_code == 200
        assert r.json()["results"]  # page space hit

        r = await client.post("/api/v1/query/ask", json={
            "question": "Who created OmniRAG?", "user_id": "alice"})
        body = r.json()
        assert body["answer"]
        assert body["sources"][0]["document_id"] == "omnirag-doc"

        r = await client.post("/delete/file", json={
            "document_id": "omnirag-doc", "user_id": "alice"})
        assert r.json()["deleted_chunks"] >= 1
        r = await client.post("/api/v1/search/hybrid", json={
            "query": "omnirag", "user_id": "alice"})
        assert r.json()["results"] == []
    with_server(fn)


def test_ingest_file_b64_csv():
    async def fn(client, state):
        csv = base64.b64encode(b"name,age\nalice,30\nbob,25\n").decode()
        r = await client.post("/ingest/file", json={
            "filename": "people.csv", "content_b64": csv, "user_id": "bob"})
        assert r.status_code == 202 and r.json()["chunks"] == 1
        r = await client.post("/search/query", json={
            "user_id": "bob", "tool": "get_column_values",
            "args": {"column_name": "name"}})
        vals = [v["value"] for v in r.json()["result"]["values"]]
        assert vals == ["alice", "bob"]
    with_server(fn)


def test_structured_query_unknown_tool():
    async def fn(client, state):
        r = await client.post("/search/query", json={
            "tool": "drop_tables", "user_id": "x"})
        assert r.status_code == 422
        assert "available" in r.json()["detail"]
    with_server(fn)


def test_chat_completions_non_streaming():
    async def fn(client, state):
        r = await client.post("/chat/completions", json={
            "model": "stub-model", "user": "carol",
            "messages": [{"role": "user", "content": "hello agent"}]})
        body = r.json()
        assert body["object"] == "chat.completion"
        assert body["choices"][0]["message"]["content"]
        assert body["checkpoint_id"]
        # second turn continues the same thread
        r2 = await client.post("/chat/completions", json={
            "model": "stub-model", "user": "carol",
            "thread_id": body["thread_id"],
            "messages": [{"role": "user", "content": "and again"}]})
        assert r2.json()["thread_id"] == body["thread_id"]
    with_server(fn)


def test_chat_completions_streaming_sse():
    async def fn(client, state):
        async with client.stream("POST", "/chat/completions", json={
            "model": "stub-model", "user": "dave", "stream": True,
            "messages": [{"role": "user", "content": "stream please"}],
        }) as r:
            assert r.headers["content-type"].startswith("text/event-stream")
            chunks = []
            async for line in r.aiter_lines():
                if line.startswith("data:"):
                    data = line[5:].strip()
                    if data == "[DONE]":
                        break
                    chunks.append(json.loads(data))
        assert chunks[-1]["choices"][0]["finish_reason"] == "stop"
        text = "".join(c["choices"][0]["delta"].get("content", "")
                       for c in chunks)
        assert "stream please" in text
    with_server(fn)


def test_api_key_auth():
    async def main():
        llm = LLMRouter(Provider.STUB)
        emb = Embedder(cfg=TINY, batch_size=4, max_len=16)
        router, state = build_app(small_config(), llm=llm, embedder=emb,
                                  api_key="sekret")
        server = HTTPServer(router, port=0)
        port = await server.start()
        try:
            async with httpx.AsyncClient(
                base_url=f"http://127.0.0.1:{port}", timeout=30
            ) as client:
                r = await client.post("/search/scout",
                                      json={"query": "x"})
                assert r.status_code == 401
                r = await client.post(
                    "/search/scout", json={"query": "x"},
                    headers={"Authorization": "Bearer sekret"})
                assert r.status_code == 200
        finally:
            await server.stop()

    asyncio.run(main())


def test_copilotkit_info_and_execute():
    """Protocol-lite remote-agent endpoint (parity role:
    AgentAPI/app/api/routes/copilotkit.py)."""
    async def fn(client, state):
        r = await client.post("/copilotkit", json={"method": "info"})
        names = [a["name"] for a in r.json()["agents"]]
        assert "chat" in names and "deep_research_agent" in names

        async with client.stream("POST", "/copilotkit", json={
            "method": "agent/execute", "agent": "chat",
            "properties": {"user_id": "erin", "thread_id": "t-ck"},
            "messages": [{"role": "user", "content": "hello runtime"}],
        }) as r:
            assert r.headers["content-type"].startswith("text/event-stream")
            events = []
            async for line in r.aiter_lines():
                if line.startswith("data:"):
                    data = line[5:].strip()
                    if data == "[DONE]":
                        break
                    events.append(json.loads(data))
        assert events[-1]["event"] == "done"
        assert events[-1]["thread_id"] == "t-ck"
        text = "".join(e.get("delta", "") for e in events
                       if e["event"] == "message")
        assert "hello runtime" in text

        r = await client.post("/copilotkit", json={"method": "bogus"})
        assert r.status_code == 422

        r = await client.post("/copilotkit", json={
            "method": "agent/execute", "agent": "no-such-agent",
            "messages": [{"role": "user", "content": "x"}]})
        assert r.status_code == 404
    with_server(fn)


def test_signin_token_opens_protected_routes():
    """Tokens issued by /api/v1/users/signin must pass _auth, and
    mutating routes must reject unauthenticated callers."""
    async def main():
        llm = LLMRouter(Provider.STUB)
        emb = Embedder(cfg=TINY, batch_size=4, max_len=16)
        router, state = build_app(small_config(), llm=llm, embedder=emb,
                                  api_key="sekret")
        server = HTTPServer(router, port=0)
        port = await server.start()
        try:
            async with httpx.AsyncClient(
                base_url=f"http://127.0.0.1:{port}", timeout=60
            ) as client:
                # mutating/priv routes closed without credentials
                for method, path in (
                    ("PUT", "/api/v1/users/u1"),
                    ("DELETE", "/api/v1/users/u1"),
                    ("POST", "/api/v1/agents"),
                    ("DELETE", "/api/v1/documents/d1"),
                    ("GET", "/queue/info"),
                    ("POST", "/webhook/storage"),
                ):
                    r = await client.request(method, path, json={})
                    assert r.status_code == 401, (method, path, r.status_code)
                # with a global api key configured, signup itself is
                # key-gated: an open signup would let anyone mint a
                # token _auth accepts, bypassing the key entirely
                r = await client.post("/api/v1/users/signup",
                                      json={"username": "ann",
                                            "password": "pw12345"})
                assert r.status_code == 401
                r = await client.post(
                    "/api/v1/users/signup",
                    json={"username": "ann", "password": "pw12345"},
                    headers={"authorization": "Bearer sekret"})
                assert r.status_code == 201
                r = await client.post("/api/v1/users/signin",
                                      json={"username": "ann",
                                            "password": "pw12345"})
                token = r.json()["access_token"]
                hdrs = {"authorization": f"Bearer {token}"}
                r = await client.get("/queue/info", headers=hdrs)
                assert r.status_code == 200
                # the global api key still works
                r = await client.get(
                    "/queue/info",
                    headers={"authorization": "Bearer sekret"})
                assert r.status_code == 200
        finally:
            await server.stop()

    asyncio.run(main())


def test_upload_complete_rejects_missing_chunks():
    async def fn(client, state):
        r = await client.post("/api/v1/upload/start",
                              json={"filename": "f.txt", "user_id": "u"})
        aid = r.json()["approval_id"]
        await client.post(f"/api/v1/upload/chunk/{aid}/0", content=b"part0 ")
        await client.post(f"/api/v1/upload/chunk/{aid}/2", content=b"part2")
        r = await client.post(f"/api/v1/upload/complete/{aid}")
        assert r.status_code == 422
        # supply the hole and completion succeeds
        await client.post(f"/api/v1/upload/chunk/{aid}/1", content=b"part1 ")
        r = await client.post(f"/api/v1/upload/complete/{aid}")
        assert r.status_code == 202
    with_server(fn)


def test_stateless_chats_get_distinct_threads():
    async def fn(client, state):
        r1 = await client.post("/chat/completions", json={
            "model": "stub-model", "user": "u",
            "messages": [{"role": "user", "content": "first"}]})
        r2 = await client.post("/chat/completions", json={
            "model": "stub-model", "user": "u",
            "messages": [{"role": "user", "content": "second"}]})
        assert r1.json()["thread_id"] != r2.json()["thread_id"]
    with_server(fn)


def test_chat_page_round_trip():
    """L7 chat UI (api/chat_ui.py): GET /chat serves the page, and the
    exact request it issues (fetch /v1/chat/completions stream:true,
    SSE frames parsed for choices[0].delta.content) round-trips against
    the stub provider — the in-CI equivalent of a browser session."""
    async def fn(client, state):
        r = await client.get("/chat")
        assert r.status_code == 200
        assert r.headers["content-type"].startswith("text/html")
        html = r.text
        # the page must target the endpoints it claims to drive
        for needle in ("/v1/chat/completions", "/chat/completions",
                       "/v1/models", "getReader"):
            assert needle in html, needle

        acc = []
        async with client.stream("POST", "/v1/chat/completions", json={
            "model": "stub-model", "stream": True,
            "messages": [{"role": "user", "content": "hello page"}],
        }) as r:
            assert r.headers["content-type"].startswith("text/event-stream")
            async for line in r.aiter_lines():
                if not line.startswith("data:"):
                    continue
                payload = line[5:].strip()
                if payload == "[DONE]":
                    continue
                delta = json.loads(payload)["choices"][0]["delta"]
                if delta.get("content"):
                    acc.append(delta["content"])
        assert "hello page" in "".join(acc)

    with_server(fn)


def test_chat_threads_server_side():
    """Agent-mode threads persist server-side: the page's thread
    endpoints list, reload, and delete a conversation created through
    /chat/completions (the reference's LangGraph-SDK thread parity)."""
    async def fn(client, state):
        html = (await client.get("/chat")).text
        for needle in ("/chat/threads", "thread_id", "delthread"):
            assert needle in html, needle

        r = await client.post("/chat/completions", json={
            "model": "stub-model",
            "thread_id": "chat-testthread01",
            "messages": [{"role": "user", "content": "remember me"}],
        })
        assert r.status_code == 200
        assert r.json()["thread_id"] == "chat-testthread01"

        r = await client.get("/chat/threads")
        threads = r.json()["threads"]
        mine = [t for t in threads if t["thread_id"] == "chat-testthread01"]
        assert mine and "remember me" in mine[0]["title"]

        r = await client.get("/chat/threads/chat-testthread01")
        msgs = r.json()["messages"]
        assert msgs[0]["role"] == "user"
        assert msgs[0]["content"] == "remember me"
        assert any(m["role"] == "assistant" for m in msgs)

        r = await client.delete("/chat/threads/chat-testthread01")
        assert r.json()["ok"]
        r = await client.get("/chat/threads")
        assert not any(t["thread_id"] == "chat-testthread01"
                       for t in r.json()["threads"])

    with_server(fn)
