import asyncio
import json

import numpy as np
import pytest

from rag_application_tpu.agents.base_agent import AgentState, BaseAgent
from rag_application_tpu.agents.memory import (
    SemanticMemory,
    ThreadCheckpointer,
    VectorMemoryStore,
)
from rag_application_tpu.config import EncoderConfig
from rag_application_tpu.llm.router import ChatMessage, LLMRouter, Provider, StubLLM
from rag_application_tpu.models.embedder import Embedder
from rag_application_tpu.tools.registry import Tool, ToolRegistry, tool

TINY = EncoderConfig(vocab_size=512, hidden_dim=32, num_layers=1, num_heads=4,
                     mlp_dim=64, max_len=32, out_dim=32, dtype="float32")


# ------------------------------------------------------------------ LLM router

def test_stub_llm_echo_and_rules():
    async def main():
        r = LLMRouter(Provider.STUB)
        out = await r.generate_text("hello there")
        assert "hello there" in out
        r.stub.on(r"capital of france", lambda _: "Paris")
        out = await r.generate_text("What is the Capital of France?")
        assert out == "Paris"
    asyncio.run(main())


def test_stub_llm_structured_output():
    async def main():
        r = LLMRouter(Provider.STUB)
        schema = {"type": "object", "properties": {
            "name": {"type": "string"},
            "count": {"type": "integer"},
            "tags": {"type": "array"}}}
        out = await r.generate_structured("extract", schema)
        assert isinstance(out, dict) and "name" in out and out["tags"] == []
    asyncio.run(main())


def test_stub_llm_tool_call():
    async def main():
        r = LLMRouter(Provider.STUB)
        tools = [{"type": "function", "function": {"name": "lookup",
                  "description": "", "parameters": {}}}]
        resp = await r.chat([ChatMessage("user", "please use lookup now")],
                            tools=tools)
        assert resp.tool_calls and resp.tool_calls[0]["function"]["name"] == "lookup"
    asyncio.run(main())


def test_llm_stream():
    async def main():
        r = LLMRouter(Provider.STUB)
        chunks = [c async for c in r.stream([ChatMessage("user", "x" * 100)])]
        assert len(chunks) > 1 and "".join(chunks).startswith("[stub]")
    asyncio.run(main())


# --------------------------------------------------------------------- tools

def test_tool_decorator_schema():
    @tool("adder", "adds numbers")
    def adder(a: int, b: int = 2):
        return a + b

    assert adder.schema["properties"]["a"]["type"] == "integer"
    assert adder.schema["required"] == ["a"]
    result = asyncio.run(adder.call(a=3))
    assert result == 5


def test_registry_executes_openai_calls():
    async def main():
        reg = ToolRegistry([Tool("echo", "", {"type": "object", "properties": {}},
                                 lambda **kw: {"echoed": kw})])
        msg = await reg.execute_call({
            "id": "c1", "type": "function",
            "function": {"name": "echo", "arguments": '{"x": 1}'}})
        assert msg["role"] == "tool" and json.loads(msg["content"]) == {"echoed": {"x": 1}}
        msg = await reg.execute_call({
            "id": "c2", "function": {"name": "nope", "arguments": "{}"}})
        assert "unknown tool" in msg["content"]
    asyncio.run(main())


# -------------------------------------------------------------------- memory

@pytest.fixture(scope="module")
def embedder():
    return Embedder(cfg=TINY, batch_size=4, max_len=16)


def test_vector_memory_store(embedder):
    store = VectorMemoryStore(embedder)
    ns = ("memory", "u1", "semantic")
    store.put(ns, "k1", {"fact": "vivek likes tpus"}, text="vivek likes tpus")
    store.put(ns, "k2", {"fact": "the sky is blue"}, text="the sky is blue")
    assert store.get(ns, "k1")["fact"] == "vivek likes tpus"
    hits = store.search(ns, "vivek likes tpus", k=1)
    assert hits and hits[0]["fact"] == "vivek likes tpus"
    # overwrite same key
    store.put(ns, "k1", {"fact": "updated"}, text="updated fact")
    assert store.get(ns, "k1")["fact"] == "updated"
    store.delete(ns, "k2")
    assert store.get(ns, "k2") is None


def test_checkpointer_roundtrip(tmp_path):
    cp = ThreadCheckpointer(str(tmp_path))
    c1 = cp.save("thread-1", {"messages": [1]})
    c2 = cp.save("thread-1", {"messages": [1, 2]})
    assert cp.load("thread-1")["messages"] == [1, 2]
    assert cp.load("thread-1", c1)["messages"] == [1]
    assert cp.list_checkpoints("thread-1") == [c1, c2]
    assert cp.load("missing") is None


# --------------------------------------------------------------------- agent

def test_agent_basic_invoke():
    async def main():
        agent = BaseAgent(LLMRouter(Provider.STUB))
        out = await agent.ainvoke("say something", thread_id="t1")
        assert out["content"].startswith("[stub]")
        # conversation persists across invocations
        out2 = await agent.ainvoke("again", thread_id="t1")
        assert len(out2["messages"]) == 4
    asyncio.run(main())


def test_agent_tool_loop():
    async def main():
        calls = []

        def weather(query: str = ""):
            calls.append(query)
            return {"forecast": "sunny"}

        agent = BaseAgent(LLMRouter(Provider.STUB), tools=[
            Tool("weather", "get weather",
                 {"type": "object", "properties": {"query": {"type": "string"}}},
                 weather)])
        out = await agent.ainvoke("please use weather today", thread_id="w")
        assert calls, "tool was not invoked"
        roles = [m["role"] for m in out["messages"]]
        assert "tool" in roles
    asyncio.run(main())


def test_agent_summarization_node():
    async def main():
        agent = BaseAgent(LLMRouter(Provider.STUB), max_tokens=100,
                          target_tokens=40)
        agent.llm.stub.on(r"summarize", lambda _: "the-summary")
        state = AgentState(messages=[
            {"role": "user", "content": "x" * 300},
            {"role": "assistant", "content": "y" * 300},
            {"role": "user", "content": "latest question"}])
        await agent._summarization_node(state)
        assert state.summary == "the-summary"
        assert len(state.messages) < 3
        assert state.messages[-1]["content"] == "latest question"
    asyncio.run(main())


def test_agent_checkpoint_resume(tmp_path):
    async def main():
        cp = ThreadCheckpointer(str(tmp_path))
        a1 = BaseAgent(LLMRouter(Provider.STUB), checkpointer=cp)
        await a1.ainvoke("remember the number 42", thread_id="t9")
        # a fresh agent instance resumes the thread from disk
        a2 = BaseAgent(LLMRouter(Provider.STUB), checkpointer=cp)
        out = await a2.ainvoke("continue", thread_id="t9")
        assert any("42" in str(m.get("content")) for m in out["messages"])
    asyncio.run(main())


def test_agent_stream_events():
    async def main():
        agent = BaseAgent(LLMRouter(Provider.STUB))
        events = [e async for e in agent.astream("stream me", thread_id="s")]
        kinds = [e["type"] for e in events]
        assert kinds[-1] == "done"
        assert "message" in kinds
        text = "".join(e.get("delta", "") for e in events)
        assert "stream me" in text
    asyncio.run(main())


def test_agent_reflections(embedder):
    async def main():
        store = VectorMemoryStore(embedder)
        llm = LLMRouter(Provider.STUB)
        llm.stub.on(r"extract memories", lambda _: json.dumps({
            "semantic": [{"subject": "user", "predicate": "likes",
                          "object": "tpus"}],
            "profile_facts": ["likes tpus"],
            "episode": {"observation": "o", "thoughts": "t", "action": "a",
                        "result": "r"},
            "procedures": [{"name": "answer style",
                            "conditions": "user asks for code",
                            "steps": ["reply with bullet points"]}]}))
        agent = BaseAgent(llm, memory_store=store, reflections=True,
                          user_id="u7")
        await agent.ainvoke("i like tpus", thread_id="r1")
        await agent.drain_reflections()
        assert store.list(("memory", "u7", "semantic"))
        assert store.list(("memory", "u7", "profile"))[-1]["facts"] == ["likes tpus"]
        assert store.list(("memory", "u7", "episodic"))
        procs = store.list(("memory", "u7", "procedural"))
        assert procs and procs[-1]["name"] == "answer style"
    asyncio.run(main())


def test_streamed_turns_reflect_too(embedder):
    """astream schedules the same reflection write as ainvoke (the chat
    API's streaming path previously formed no memories), and distinct
    UNNAMED procedures keep distinct keys (keying by conditions)."""
    async def main():
        store = VectorMemoryStore(embedder)
        llm = LLMRouter(Provider.STUB)
        llm.stub.on(r"extract memories", lambda _: json.dumps({
            "semantic": [], "profile_facts": [], "episode": {},
            "procedures": [
                {"name": "", "conditions": "asks for code",
                 "steps": ["bullets"]},
                {"name": "", "conditions": "asks for math",
                 "steps": ["latex"]}]}))
        agent = BaseAgent(llm, memory_store=store, reflections=True,
                          user_id="u8")
        async for _ in agent.astream("hello", thread_id="s1"):
            pass
        await agent.drain_reflections()
        procs = store.list(("memory", "u8", "procedural"))
        assert len(procs) == 2, procs  # unnamed rules don't collide
        assert agent._reflection_tasks == []  # done-callback pruned it
    asyncio.run(main())


def test_procedural_correction_changes_precontext(embedder):
    """A user correction becomes a procedural memory that shows up in the
    NEXT turn's system precontext (parity: the procedural reflection
    executor feeding _precontext, base_agent.py:604-655 + :561-569)."""
    from rag_application_tpu.agents.base_agent import AgentState

    async def main():
        store = VectorMemoryStore(embedder)
        llm = LLMRouter(Provider.STUB)
        llm.stub.on(r"extract memories", lambda _: json.dumps({
            "procedures": [{"name": "citation rule",
                            "conditions": "any summary request",
                            "steps": ["always cite the source document"]}]}))
        agent = BaseAgent(llm, memory_store=store, reflections=True,
                          user_id="u8")
        # before the correction: no procedures in precontext
        pre_state = AgentState(
            messages=[{"role": "user", "content": "summarize the report"}])
        assert "citation rule" not in agent._precontext(pre_state)
        await agent.ainvoke("please always cite the source document",
                            thread_id="c1")
        await agent.drain_reflections()
        pre = agent._precontext(AgentState(
            messages=[{"role": "user", "content": "summarize the report"}]))
        assert "citation rule" in pre and "cite the source" in pre
    asyncio.run(main())


def test_checkpoints_are_snapshots():
    """Historic checkpoint_ids must restore their snapshot, not alias
    the live (mutating) message list."""
    from rag_application_tpu.agents.memory import ThreadCheckpointer

    cp = ThreadCheckpointer()
    state = {"messages": [{"role": "user", "content": "one"}], "summary": ""}
    a = cp.save("t", state)
    state["messages"].append({"role": "assistant", "content": "two"})
    cp.save("t", state)
    restored = cp.load("t", checkpoint_id=a)
    assert len(restored["messages"]) == 1
    # mutating a loaded state must not corrupt the stored history
    restored["messages"].append({"role": "user", "content": "x"})
    assert len(cp.load("t", checkpoint_id=a)["messages"]) == 1


def test_summarization_never_orphans_tool_messages():
    """The keep-window must not start with role:'tool' messages (their
    assistant tool_calls turn would have been summarized away)."""
    import asyncio

    from rag_application_tpu.agents.base_agent import AgentState, BaseAgent
    from rag_application_tpu.llm.router import LLMRouter, Provider

    agent = BaseAgent(LLMRouter(Provider.STUB), max_tokens=60,
                      target_tokens=30)
    msgs = [{"role": "user", "content": "question " * 20},
            {"role": "assistant", "content": "calling tools",
             "tool_calls": [{"id": "1"}]},
            {"role": "tool", "content": "result " * 20},
            {"role": "tool", "content": "result " * 20},
            {"role": "assistant", "content": "final answer " * 5}]
    state = AgentState(messages=list(msgs))
    asyncio.run(agent._summarization_node(state))
    assert state.messages, "everything summarized away"
    assert state.messages[0].get("role") != "tool"


def test_agent_registry_lists_all_builtins():
    from rag_application_tpu.agents import AGENT_CLASS_MAP, get_agent_by_id

    assert get_agent_by_id("waiter_agent") is not None
    assert {"chat_agent", "deep_research_agent", "waiter_agent",
            "knowledge_search_agent"} <= set(AGENT_CLASS_MAP)
