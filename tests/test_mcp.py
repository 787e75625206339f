import asyncio
import json

import pytest

from rag_application_tpu.config import (
    Config,
    EncoderConfig,
    FunnelConfig,
    IndexConfig,
    KGConfig,
    SparseConfig,
)
from rag_application_tpu.kg.store import KGStore
from rag_application_tpu.mcp.file_server import FileOperationsServer
from rag_application_tpu.mcp.search_server import SearchMCPServer
from rag_application_tpu.mcp.server import MCPServer
from rag_application_tpu.models.embedder import Embedder
from rag_application_tpu.store.collection import Collection

TINY = EncoderConfig(vocab_size=512, hidden_dim=32, num_layers=1, num_heads=4,
                     mlp_dim=64, max_len=32, out_dim=32, dtype="float32")


def rpc(server, method, params=None, *, msg_id=1, api_key=None):
    return asyncio.run(server.handle(
        {"jsonrpc": "2.0", "id": msg_id, "method": method,
         "params": params or {}}, api_key=api_key))


def test_initialize_and_builtin_tools():
    s = MCPServer("t")
    r = rpc(s, "initialize")
    assert r["result"]["serverInfo"]["name"] == "t"
    r = rpc(s, "tools/list")
    names = [t["name"] for t in r["result"]["tools"]]
    assert "health" in names and "info" in names
    r = rpc(s, "tools/call", {"name": "health"})
    body = json.loads(r["result"]["content"][0]["text"])
    assert body["status"] == "ok"


def test_unknown_method_and_tool():
    s = MCPServer("t")
    assert rpc(s, "bogus/method")["error"]["code"] == -32601
    assert rpc(s, "tools/call", {"name": "nope"})["error"]["code"] == -32602


def test_file_server_sandbox(tmp_path):
    root = tmp_path / "sandbox"
    root.mkdir()
    (root / "hello.txt").write_text("hi")
    s = FileOperationsServer([str(root)])

    r = rpc(s, "tools/call", {"name": "read_file",
                              "arguments": {"path": str(root / "hello.txt")}})
    assert json.loads(r["result"]["content"][0]["text"])["content"] == "hi"

    r = rpc(s, "tools/call", {"name": "read_file",
                              "arguments": {"path": "/etc/passwd"}})
    assert r["result"]["isError"]
    assert "outside allowed" in r["result"]["content"][0]["text"]

    # symlink escape blocked
    (root / "link").symlink_to("/etc")
    r = rpc(s, "tools/call", {"name": "list_dir",
                              "arguments": {"path": str(root / "link")}})
    assert r["result"]["isError"]

    rpc(s, "tools/call", {"name": "write_file", "arguments": {
        "path": str(root / "new/file.txt"), "content": "data"}})
    assert (root / "new/file.txt").read_text() == "data"


def test_permission_levels(tmp_path):
    root = tmp_path / "sb"
    root.mkdir()
    s = FileOperationsServer([str(root)],
                             api_keys={"rkey": "read", "akey": "admin"})
    # no key -> unauthorized
    r = rpc(s, "tools/call", {"name": "health"})
    assert r["error"]["code"] == -32001
    # read key cannot write
    r = rpc(s, "tools/call", {"name": "write_file", "arguments": {
        "path": str(root / "x"), "content": "y"}}, api_key="rkey")
    assert r["error"]["code"] == -32001
    # read key doesn't even see write tools in the listing
    tools = [t["name"] for t in
             rpc(s, "tools/list", api_key="rkey")["result"]["tools"]]
    assert "write_file" not in tools and "read_file" in tools
    # admin can delete
    (root / "gone.txt").write_text("x")
    r = rpc(s, "tools/call", {"name": "delete_path", "arguments": {
        "path": str(root / "gone.txt")}}, api_key="akey")
    assert not r["result"]["isError"]


def test_search_mcp_server():
    cfg = Config()
    cfg.index = IndexConfig(dim=32, matryoshka_dims=(8, 16), initial_capacity=16)
    cfg.sparse = SparseConfig(candidate_pool=64, max_query_terms=8)
    cfg.funnel = FunnelConfig(matryoshka_limits=(8, 6), dense_limit=5,
                              quantized_limit=5, sparse_limit=5, final_limit=5)
    col = Collection("m", cfg)
    emb = Embedder(cfg=TINY, batch_size=4, max_len=16)
    kg = KGStore(KGConfig(max_degree=8), dim=32)
    col.store_document_vectors("d", [{"text": "the fox jumped the fence"}],
                               emb.encode(["the fox jumped the fence"]))
    s = SearchMCPServer(col, kg, emb)
    tools = [t["name"] for t in rpc(s, "tools/list")["result"]["tools"]]
    assert "hybrid_search" in tools and len(tools) >= 21
    r = rpc(s, "tools/call", {"name": "hybrid_search",
                              "arguments": {"query": "fox fence"}})
    hits = json.loads(r["result"]["content"][0]["text"])
    assert hits and "fox" in hits[0]["text"]
    r = rpc(s, "resources/read", {"uri": "stats://collection"})
    stats = json.loads(r["result"]["contents"][0]["text"])
    assert stats["chunks"] == 1


def test_mcp_over_http():
    async def main():
        import httpx

        from rag_application_tpu.api.http import HTTPServer, Router

        router = Router()
        s = MCPServer("http-test")
        s.attach_http(router)
        server = HTTPServer(router, port=0)
        port = await server.start()
        try:
            async with httpx.AsyncClient(
                base_url=f"http://127.0.0.1:{port}") as c:
                r = await c.post("/mcp", json={
                    "jsonrpc": "2.0", "id": 1, "method": "tools/list"})
                names = [t["name"] for t in r.json()["result"]["tools"]]
                assert "health" in names
                # batch request
                r = await c.post("/mcp", json=[
                    {"jsonrpc": "2.0", "id": 1, "method": "ping"},
                    {"jsonrpc": "2.0", "id": 2, "method": "ping"}])
                assert len(r.json()) == 2
        finally:
            await server.stop()

    asyncio.run(main())


def test_serve_stdio_transport(tmp_path):
    """The actual stdio loop: line-delimited JSON-RPC in, responses out
    (bad JSON skipped, EOF terminates)."""
    import io

    srv = FileOperationsServer(allowed_dirs=[str(tmp_path)])
    (tmp_path / "f.txt").write_text("hello stdio")
    lines = [
        json.dumps({"jsonrpc": "2.0", "id": 1, "method": "initialize",
                    "params": {}}),
        "this is not json",
        json.dumps({"jsonrpc": "2.0", "id": 2, "method": "tools/call",
                    "params": {"name": "read_file",
                               "arguments": {"path": str(tmp_path / "f.txt")}}}),
    ]
    stdin = io.StringIO("\n".join(lines) + "\n")
    stdout = io.StringIO()
    asyncio.run(srv.serve_stdio(stdin=stdin, stdout=stdout))
    out = [json.loads(l) for l in stdout.getvalue().splitlines()]
    assert len(out) == 2  # the bad-JSON line produced no response
    assert out[0]["id"] == 1 and "result" in out[0]
    text = json.dumps(out[1])
    assert out[1]["id"] == 2 and "hello stdio" in text
