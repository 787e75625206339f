"""End-to-end demo: ingest -> hybrid search -> graph -> agent chat.

Runs entirely offline (stub LLM, hash tokenizer). On a TPU host the same
code runs the kernels on-device; on CPU everything interprets.

    python examples/end_to_end.py
"""

import asyncio
import os
import sys

import numpy as np

# allow running uninstalled from a repo checkout
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# RAGTPU_PLATFORM=cpu runs the demo off-TPU (the axon relay can be
# degraded; this must be set before first backend use)
if os.environ.get("RAGTPU_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["RAGTPU_PLATFORM"])

from rag_application_tpu.agents.chat_agent import ChatAgent
from rag_application_tpu.config import Config
from rag_application_tpu.ingest.pipeline import IngestPipeline
from rag_application_tpu.kg.extract import EntityRelationExtractor
from rag_application_tpu.kg.store import KGStore
from rag_application_tpu.llm.router import LLMRouter, Provider
from rag_application_tpu.models.embedder import Embedder
from rag_application_tpu.search.orchestration import SearchOrchestrator
from rag_application_tpu.store.collection import Collection
from rag_application_tpu.tools.knowledge import KnowledgeSearchToolbox

DOC = """
OmniRAG is a retrieval augmented generation platform created by Vivek
Malipatel. It combines dense vector search with BM25 keyword retrieval
and fuses the results with reciprocal rank fusion. The knowledge graph
stores entities and relationships extracted from every document page.
Structured spreadsheets become column profiles with row values.
"""


async def main():
    cfg = Config()
    llm = LLMRouter(Provider.STUB)
    embedder = Embedder(cfg=cfg.encoder, batch_size=32, max_len=128)
    collection = Collection("user_demo", cfg)
    kg = KGStore(cfg.kg, dim=min(embedder.dim, 2048))
    extractor = EntityRelationExtractor(llm)
    pipeline = IngestPipeline(collection, embedder, kg=kg,
                              kg_extractor=extractor.as_pipeline_extractor())

    result = await pipeline.ingest_text(DOC, document_id="omnirag-intro")
    print(f"ingested: {result.chunks} chunks, {result.pages} pages")

    hits = collection.hybrid_search(
        embedder.encode(["who created omnirag"])[0],
        "who created omnirag", limit=3)
    print("top hit:", hits[0].payload["text"][:80], f"(score {hits[0].score:.3f})")

    orch = SearchOrchestrator(collection, kg, embedder, llm)
    answer = await orch.ask("Who created OmniRAG?")
    print("grounded answer:", answer["answer"][:120])

    toolbox = KnowledgeSearchToolbox(collection, kg, embedder).build()
    agent = ChatAgent(llm, knowledge_toolbox=toolbox)
    out = await agent.ainvoke("use knowledge_search_agent to find the creator",
                              thread_id="demo")
    print("agent:", out["content"][:120])

    print("kg stats:", kg.stats())
    print("queue:", pipeline.queue.queue_info())


if __name__ == "__main__":
    asyncio.run(main())
