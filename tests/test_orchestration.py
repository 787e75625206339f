import asyncio
import json

import numpy as np
import pytest

from rag_application_tpu.config import (
    Config,
    EncoderConfig,
    FunnelConfig,
    IndexConfig,
    KGConfig,
    SparseConfig,
)
from rag_application_tpu.kg.checkpoint import load_kg, save_kg
from rag_application_tpu.kg.dedup import deduplication_loop
from rag_application_tpu.kg.store import KGStore, Space
from rag_application_tpu.llm.router import LLMRouter, Provider
from rag_application_tpu.models.embedder import Embedder
from rag_application_tpu.search.orchestration import (
    SearchOrchestrator,
    determine_graph_params,
    determine_search_params,
)
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


@pytest.fixture(scope="module")
def setup():
    emb = Embedder(cfg=TINY, batch_size=4, max_len=16)
    col = Collection("orch", small_config())
    kg = KGStore(KGConfig(max_degree=8), dim=32)
    texts = ["vivek created omnirag", "omnirag does hybrid retrieval",
             "neo4j stores the knowledge graph"]
    col.store_document_vectors("doc", [{"text": t} for t in texts],
                               emb.encode(texts))
    ents = [{"id": "vivek", "text": "Vivek", "entity_type": "PERSON",
             "entity_profile": "engineer"},
            {"id": "omnirag", "text": "OmniRAG", "entity_type": "PRODUCT",
             "entity_profile": "rag platform"}]
    rels = [{"source": "vivek", "target": "omnirag",
             "relation_type": "CREATED", "relationship_profile": "creator"}]
    kg.upsert_unstructured_page(
        "doc", 1, content="page", embedding=emb.encode(["page"])[0],
        entities=ents, relationships=rels,
        entity_embeddings=emb.encode([e["entity_profile"] for e in ents]),
        relationship_embeddings=emb.encode(["creator"]))
    return emb, col, kg


def test_determine_search_params_llm_values():
    llm = LLMRouter(Provider.STUB)
    llm.stub.on(r"tune|Choose hybrid", lambda _: json.dumps({
        "matryoshka_64_limit": 100, "matryoshka_128_limit": 90,
        "matryoshka_256_limit": 70, "dense_limit": 50,
        "quantized_limit": 40, "sparse_limit": 30, "final_limit": 10,
        "hnsw_ef": 256}))
    f = asyncio.run(determine_search_params(llm, "q", 100_000))
    assert f.matryoshka_limits[0] == 128  # bucketed pow2
    assert f.final_limit == 10


def test_determine_search_params_fallback():
    llm = LLMRouter(Provider.STUB)
    llm.stub.on(r".*", lambda _: "not json at all {{{")
    f = asyncio.run(determine_search_params(llm, "q", 100_000))
    assert f.matryoshka_limits[0] == 512  # adaptive fallback


def test_determine_graph_params_bounds():
    llm = LLMRouter(Provider.STUB)
    llm.stub.on(r"graph", lambda _: json.dumps({
        "search_depth": 99, "expansion_factor": 1,
        "relevance_threshold": 0.5, "max_paths": 100}))
    p = asyncio.run(determine_graph_params(llm, "q"))
    assert p.search_depth == 3 and p.expansion_factor == 8
    assert p.max_paths == 20


def test_orchestrator_execute_and_ask(setup):
    emb, col, kg = setup
    llm = LLMRouter(Provider.STUB)
    llm.stub.on(r"Extract the entities", lambda _: json.dumps(
        {"entities": ["omnirag"], "relations": ["created"]}))
    llm.stub.on(r"retrieval-grounded|Context:", lambda _: "Vivek created it [doc].")
    orch = SearchOrchestrator(col, kg, emb, llm)

    out = asyncio.run(orch.execute("who created omnirag"))
    assert out["hits"]
    assert "PASSAGES:" in out["context"]
    assert "ENTITIES:" in out["context"]

    ans = asyncio.run(orch.ask("who created omnirag"))
    assert "Vivek" in ans["answer"]
    assert ans["sources"][0]["document_id"] == "doc"
    assert ans["graph"]["entities"] >= 1


def test_kg_checkpoint_roundtrip(setup, tmp_path):
    emb, col, kg = setup
    path = str(tmp_path / "kg")
    save_kg(kg, path)
    kg2 = load_kg(path, KGConfig(max_degree=8))
    assert kg2.stats() == kg.stats()
    q = emb.encode(["rag platform"])[0]
    h1 = kg.search_space(Space.ENTITY, q, k=2)
    h2 = kg2.search_space(Space.ENTITY, q, k=2)
    assert [x["id"] for x in h1] == [x["id"] for x in h2]
    # graph structure survives
    row = kg2._find_entity_row("omnirag", "doc")
    ctx = kg2.entity_context(row)
    assert ctx["relationships"][0]["relationship"]["relation_type"] == "CREATED"


def test_dedup_loop_stops(setup):
    emb, col, kg = setup

    async def main():
        import asyncio as aio
        stop = aio.Event()
        task = aio.create_task(deduplication_loop(kg, interval=0.05,
                                                  stop_event=stop))
        await aio.sleep(0.12)
        stop.set()
        total = await task
        assert total >= 0

    asyncio.run(main())
