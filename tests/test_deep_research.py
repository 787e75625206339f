import asyncio
import json

import pytest

from rag_application_tpu.agents.deep_research import DeepResearchAgent
from rag_application_tpu.agents.memory import VectorMemoryStore
from rag_application_tpu.config import EncoderConfig
from rag_application_tpu.llm.router import LLMRouter, Provider
from rag_application_tpu.models.embedder import Embedder
from rag_application_tpu.tools.registry import Tool, ToolRegistry

TINY = EncoderConfig(vocab_size=512, hidden_dim=32, num_layers=1, num_heads=4,
                     mlp_dim=64, max_len=32, out_dim=32, dtype="float32")


@pytest.fixture
def research_setup():
    emb = Embedder(cfg=TINY, batch_size=4, max_len=16)
    store = VectorMemoryStore(emb)
    llm = LLMRouter(Provider.STUB)

    # scripted sub-agent behaviors
    gap_state = {"round": 0}

    def intent(_):
        return json.dumps({"needs_clarification": False,
                           "contract": ["history of X", "uses of X"]})

    def gap(_):
        gap_state["round"] += 1
        # first two gap checks report gaps; later ones report none
        return json.dumps({"gap_exists": gap_state["round"] <= 2,
                           "missing": "details about X"})

    def subq(_):
        return json.dumps({"subqueries": ["what is the history of X"]})

    llm.stub.on(r"research contract", intent)
    llm.stub.on(r"Does a gap remain", gap)
    llm.stub.on(r"search subqueries", subq)
    llm.stub.on(r"Write a dense factual finding",
                lambda _: "X was invented in 1970 and is used for Y.")
    llm.stub.on(r"final research report",
                lambda _: "REPORT: X invented 1970; used for Y.")

    searches = []
    toolbox = ToolRegistry([Tool(
        "hybrid_search", "", {"type": "object", "properties": {}},
        lambda query, k=4: searches.append(query) or [{"text": "X doc"}])])

    return llm, store, toolbox, searches


def test_deep_research_full_loop(research_setup):
    llm, store, toolbox, searches = research_setup

    async def main():
        agent = DeepResearchAgent(llm, toolbox=toolbox, research_store=store,
                                  max_iterations=3)
        out = await agent.ainvoke("tell me about X", thread_id="dr1")
        assert out["status"] == "complete"
        assert out["content"].startswith("REPORT")
        assert out["contract"] == ["history of X", "uses of X"]
        assert out["iterations"] >= 1
        assert searches  # subqueries hit the knowledge tools
        findings = store.list(("research", "dr1"))
        assert findings and "1970" in findings[0]["finding"]
        # trace converges to zero gaps
        assert out["trace"][-1]["open_gaps"] == 0

    asyncio.run(main())


def test_deep_research_clarification_interrupt():
    llm = LLMRouter(Provider.STUB)
    llm.stub.on(r"research contract", lambda _: json.dumps({
        "needs_clarification": True,
        "clarifying_question": "Which X do you mean?",
        "contract": []}))

    async def main():
        emb = Embedder(cfg=TINY, batch_size=4, max_len=16)
        agent = DeepResearchAgent(llm, research_store=VectorMemoryStore(emb),
                                  clarify=True, max_iterations=1)
        out = await agent.ainvoke("about X", thread_id="dr2")
        assert out["status"] == "needs_clarification"
        assert "Which X" in out["question"]
        # resume with the clarification: planner now proceeds
        llm.stub._rules.clear()
        llm.stub.on(r"research contract", lambda _: json.dumps({
            "needs_clarification": False, "contract": ["item"]}))
        llm.stub.on(r"Does a gap remain",
                    lambda _: json.dumps({"gap_exists": False}))
        llm.stub.on(r"final research report", lambda _: "final")
        out = await agent.ainvoke("about X", thread_id="dr2",
                                  clarification="X the language")
        assert out["status"] == "complete"

    asyncio.run(main())
