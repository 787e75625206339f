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
from rag_application_tpu.kg.store import KGStore
from rag_application_tpu.models.embedder import Embedder
from rag_application_tpu.store.collection import Collection
from rag_application_tpu.tools.knowledge import KnowledgeSearchToolbox

TINY = EncoderConfig(vocab_size=512, hidden_dim=32, num_layers=1, num_heads=4,
                     mlp_dim=64, max_len=32, out_dim=32, dtype="float32")


@pytest.fixture(scope="module")
def toolbox():
    cfg = Config()
    cfg.index = IndexConfig(dim=32, matryoshka_dims=(8, 16), initial_capacity=16)
    cfg.sparse = SparseConfig(candidate_pool=64, max_query_terms=8)
    cfg.funnel = FunnelConfig(matryoshka_limits=(8, 6), dense_limit=5,
                              quantized_limit=5, sparse_limit=5, final_limit=5)
    col = Collection("kt", cfg)
    emb = Embedder(cfg=TINY, batch_size=4, max_len=16)
    kg = KGStore(KGConfig(max_degree=8), dim=32)

    texts = ["vivek created the omnirag platform",
             "omnirag uses neo4j for graph storage",
             "the benchmark measures recall at ten"]
    col.store_document_vectors("resume.pdf",
                               [{"text": t} for t in texts],
                               emb.encode(texts))
    kg.upsert_document("resume.pdf", {"title": "Resume", "author": "vivek"})
    ents = [
        {"id": "vivek", "text": "Vivek", "entity_type": "PERSON",
         "entity_profile": "engineer"},
        {"id": "omnirag", "text": "OmniRAG", "entity_type": "PRODUCT",
         "entity_profile": "rag platform"},
        {"id": "neo4j", "text": "Neo4j", "entity_type": "TECHNOLOGY",
         "entity_profile": "graph database"},
    ]
    rels = [
        {"source": "vivek", "target": "omnirag", "relation_type": "CREATED",
         "relationship_profile": "vivek created omnirag"},
        {"source": "omnirag", "target": "neo4j", "relation_type": "USES",
         "relationship_profile": "omnirag uses neo4j"},
    ]
    def kv(t):
        v = emb.encode([t])[0]
        return v
    kg.upsert_unstructured_page(
        "resume.pdf", 1, content="resume page one about vivek",
        embedding=kv("resume page one"),
        entities=ents, relationships=rels,
        entity_embeddings=np.stack([kv(e["entity_profile"]) for e in ents]),
        relationship_embeddings=np.stack([kv(r["relationship_profile"]) for r in rels]),
    )
    kg.upsert_structured_sheet(
        "data.csv", 1, sheet_name="people", summary="a table of people",
        summary_embedding=kv("a table of people"),
        columns=[{"name": "name", "profile": "person names"}],
        column_embeddings=np.stack([kv("person names")]),
        rows=[{"name": "alice"}, {"name": "bob"}],
    )
    return KnowledgeSearchToolbox(col, kg, emb).build()


def run(reg, name, **kw):
    return asyncio.run(reg.get(name).call(**kw))


def test_toolbox_has_21_tools(toolbox):
    assert len(toolbox) == 21


def test_document_tools(toolbox):
    hits = run(toolbox, "search_documents", query="resume")
    assert hits and hits[0]["document_id"] == "resume.pdf"
    docs = run(toolbox, "list_documents")
    assert {d["document_id"] for d in docs} >= {"resume.pdf", "data.csv"}
    meta = run(toolbox, "get_document_metadata", document_id="resume.pdf")
    assert meta["author"] == "vivek"
    pages = run(toolbox, "list_document_pages", document_id="resume.pdf")
    assert pages[0]["page_number"] == 1
    page = run(toolbox, "get_page_content", document_id="resume.pdf",
               page_number=1)
    assert "vivek" in page["content"]


def test_semantic_space_tools(toolbox):
    hits = run(toolbox, "search_entities_semantic", query="graph database")
    assert hits and hits[0]["space"] == "entity"
    hits = run(toolbox, "search_across_spaces", query="rag platform", k=5)
    assert hits and len({h["space"] for h in hits}) >= 2


def test_hybrid_search_tool(toolbox):
    hits = run(toolbox, "hybrid_search", query="omnirag neo4j graph storage")
    assert hits and "neo4j" in hits[0]["text"]


def test_entity_graph_tools(toolbox):
    e = run(toolbox, "get_entity_by_id", entity_id="omnirag")
    assert e["entity_type"] == "PRODUCT"
    persons = run(toolbox, "find_entities_by_type", entity_type="PERSON")
    assert [p["id"] for p in persons] == ["vivek"]
    ctx = run(toolbox, "get_entity_context", entity_id="omnirag")
    types = {r["relationship"]["relation_type"] for r in ctx["relationships"]}
    assert types == {"CREATED", "USES"}
    trav = run(toolbox, "traverse_entity_graph", entity_id="vivek", hops=2)
    assert {t["id"] for t in trav} == {"vivek", "omnirag", "neo4j"}
    path = run(toolbox, "path_between_entities", source_id="vivek",
               target_id="neo4j")
    assert path["reachable"] and path["hops"] == 2
    rels = run(toolbox, "get_relationships_between", source_id="vivek",
               target_id="omnirag")
    assert rels and rels[0]["relation_type"] == "CREATED"


def test_table_tools(toolbox):
    col = run(toolbox, "get_column_values", column_name="name")
    assert [v["value"] for v in col["values"]] == ["alice", "bob"]
    hits = run(toolbox, "search_row_values", value="alice")
    assert hits and hits[0]["match"]["value"] == "alice"


def test_chunk_neighbors(toolbox):
    out = run(toolbox, "get_chunk_neighbors", document_id="resume.pdf",
              chunk_index=1, radius=1)
    assert [c["chunk_index"] for c in out] == [0, 1, 2]


def test_structured_query(toolbox):
    stats = run(toolbox, "structured_query", operation="stats")
    assert stats["entity"] == 3
    err = run(toolbox, "structured_query", operation="drop_everything")
    assert "unknown operation" in err["error"]
