import asyncio
import json

import pytest

from rag_application_tpu.mcp.server import MCPServer
from rag_application_tpu.tools.mcp_client import MCPClient, mcp_tool
from rag_application_tpu.tools.registry import Tool
from rag_application_tpu.tools.web import (
    html_to_text,
    web_scrape_tool,
    web_search_tool,
)


def test_html_to_text():
    html = """<html><head><style>body{}</style>
    <script>alert(1)</script></head>
    <body><h1>Title</h1><p>First &amp; second.</p>
    <div>Third&nbsp;part</div></body></html>"""
    text = html_to_text(html)
    assert "alert" not in text and "body{}" not in text
    assert "Title" in text and "First & second." in text
    assert "Third part" in text


def test_web_search_tool_with_stub_backend():
    async def backend(query, k):
        return [{"title": f"result for {query}", "url": "http://x",
                 "snippet": "snip"}][:k]

    t = web_search_tool(backend)
    out = asyncio.run(t.call(query="tpus"))
    assert out[0]["title"] == "result for tpus"


def test_web_scrape_tool_with_stub_fetch():
    async def fetch(url):
        return "<html><body><p>Hello page</p></body></html>"

    t = web_scrape_tool(fetch)
    out = asyncio.run(t.call(url="http://example.com", max_chars=100))
    assert out["text"] == "Hello page"


def test_mcp_client_inprocess_and_batch():
    async def main():
        s1 = MCPServer("alpha")
        s1.add_tool(Tool("double", "", {"type": "object", "properties": {
            "x": {"type": "integer"}}}, lambda x: {"doubled": x * 2}))
        s2 = MCPServer("beta")
        client = MCPClient()
        client.add_inprocess("alpha", s1)
        client.add_inprocess("beta", s2)

        tools = await client.list_tools()
        assert "double" in tools["alpha"] and "health" in tools["beta"]

        out = await client.call("alpha", "double", {"x": 21})
        assert out == {"doubled": 42}

        batch = await client.call_batch([
            {"server": "alpha", "tool": "double", "arguments": {"x": 1}},
            {"server": "beta", "tool": "health"},
            {"server": "alpha", "tool": "missing"},
        ])
        assert batch[0] == {"doubled": 2}
        assert batch[1]["status"] == "ok"
        assert "error" in batch[2]

    asyncio.run(main())


def test_mcp_agent_tool():
    async def main():
        s = MCPServer("srv")
        client = MCPClient()
        client.add_inprocess("srv", s)
        t = mcp_tool(client)
        out = await t.call(action="list")
        assert "srv" in out
        out = await t.call(action="call", server="srv", tool="health")
        assert out["status"] == "ok"

    asyncio.run(main())


def test_mcp_client_http_transport():
    async def main():
        import httpx

        from rag_application_tpu.api.http import HTTPServer, Router

        router = Router()
        s = MCPServer("remote")
        s.attach_http(router)
        server = HTTPServer(router, port=0)
        port = await server.start()
        try:
            client = MCPClient.from_config({"servers": {
                "remote": {"url": f"http://127.0.0.1:{port}/mcp"}}})
            tools = await client.list_tools("remote")
            assert "health" in tools["remote"]
        finally:
            await server.stop()

    asyncio.run(main())


def test_browser_agent_loop():
    import json as _json

    from rag_application_tpu.llm.router import LLMRouter, Provider
    from rag_application_tpu.tools.browser import browser_tool

    class FakeDriver:
        def __init__(self):
            self.pages = {"http://site": "welcome page with a search box"}
            self.log = []

        async def navigate(self, url):
            self.log.append(("navigate", url))
            return self.pages.get(url, "404")

        async def click(self, sel):
            self.log.append(("click", sel))
            return "results page: the answer is 42"

        async def type_text(self, sel, text):
            self.log.append(("type", sel, text))
            return "typed"

        async def page_text(self):
            return "results page: the answer is 42"

    llm = LLMRouter(Provider.STUB)
    state = {"n": 0}

    def decide(_):
        state["n"] += 1
        if state["n"] == 1:
            return _json.dumps({"action": "click", "target": "#search"})
        return _json.dumps({"action": "finish", "answer": "42"})

    llm.stub.on(r"next browser action", decide)
    driver = FakeDriver()
    t = browser_tool(llm, driver)
    out = asyncio.run(t.call(task="find the answer", start_url="http://site"))
    assert out["answer"] == "42"
    assert ("click", "#search") in driver.log
    assert out["steps"][0]["action"] == "navigate"
