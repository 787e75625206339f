"""Sharded multi-space KG search (parallel/kg.py) vs the single-chip
KGStore path on the 8-device CPU mesh.

Parity anchor: the reference scales multi-space search in Neo4j
(IndexerAPI/src/core/storage/neo4j_handler.py:809-827); here each space
row-shards over the mesh and candidate lists merge over ICI.
"""

import numpy as np
import pytest

from rag_application_tpu.kg.store import KGStore, Space
from rag_application_tpu.parallel.kg import ShardedKGSearch, sharded_kg_dryrun
from rag_application_tpu.parallel.mesh import make_mesh

DIM = 64


def _populate(store: KGStore, rng, n_docs=6, pages_per_doc=8,
              ents_per_page=4):
    """A multi-document store with entities, relationships and a sheet."""
    for d in range(n_docs):
        doc = f"doc{d}"
        for p in range(pages_per_doc):
            ents = [{"id": f"e{d}_{p}_{i}", "text": f"entity {d}{p}{i}",
                     "entity_type": "T", "entity_profile": "prof"}
                    for i in range(ents_per_page)]
            rels = [{"source": ents[0]["id"], "target": ents[1]["id"],
                     "relation_type": "R", "relationship_profile": "rp"}]
            store.upsert_unstructured_page(
                doc, p,
                content=f"page {d}:{p}",
                embedding=rng.standard_normal(DIM).astype(np.float32),
                entities=ents,
                entity_embeddings=rng.standard_normal(
                    (ents_per_page, DIM)).astype(np.float32),
                relationships=rels,
                relationship_embeddings=rng.standard_normal(
                    (1, DIM)).astype(np.float32),
            )
    store.upsert_structured_sheet(
        "doc0", 99, sheet_name="s", summary="sheet summary",
        summary_embedding=rng.standard_normal(DIM).astype(np.float32),
        columns=[{"name": "a"}, {"name": "b"}],
        column_embeddings=rng.standard_normal((2, DIM)).astype(np.float32),
        rows=[{"a": 1, "b": 2}],
    )


def test_sharded_equals_single_chip(rng):
    mesh = make_mesh(8)
    store = KGStore(dim=DIM)
    _populate(store, rng)
    sharded = ShardedKGSearch(store, mesh)
    for seed in range(4):
        q = np.random.default_rng(seed).standard_normal(DIM)
        single = store.search_across_spaces(q, k=10)
        multi = sharded.search_across_spaces(q, k=10)
        assert [(h["space"], h["row"]) for h in multi] == \
            [(h["space"], h["row"]) for h in single]
        np.testing.assert_allclose(
            [h["score"] for h in multi], [h["score"] for h in single],
            rtol=2e-2)  # bf16 scoring on both paths, blocked differently
        # per-space searches agree too
        s_one = store.search_space(Space.ENTITY, q, k=5)
        s_multi = sharded.search_space(Space.ENTITY, q, k=5)
        assert [h["row"] for h in s_multi] == [h["row"] for h in s_one]


def test_sharded_filters_and_refresh(rng):
    mesh = make_mesh(8)
    store = KGStore(dim=DIM)
    _populate(store, rng, n_docs=3)
    sharded = ShardedKGSearch(store, mesh)
    q = rng.standard_normal(DIM)
    hits = sharded.search_across_spaces(q, k=8, document_id="doc1")
    assert hits and all(h["document_id"] == "doc1" for h in hits)
    # deletes are invisible until refresh(), then excluded
    store.delete_document("doc1")
    sharded.refresh()
    hits = sharded.search_across_spaces(q, k=8, document_id="doc1")
    assert hits == []
    other = sharded.search_across_spaces(q, k=8)
    assert other and all(h["document_id"] != "doc1" for h in other)


def test_capacity_mode_recall(rng):
    """int8-plane sharded search: top-k overlaps the exact bf16 search
    (the int8 storage floor, same bound the chunk index's capacity mode
    carries)."""
    mesh = make_mesh(8)
    store = KGStore(dim=DIM)
    _populate(store, rng, n_docs=8, pages_per_doc=8)
    cap = ShardedKGSearch(store, mesh, capacity=True)
    for seed in range(3):
        q = np.random.default_rng(100 + seed).standard_normal(DIM)
        exact = {(h["space"], h["row"])
                 for h in store.search_across_spaces(q, k=10)}
        got = {(h["space"], h["row"])
               for h in cap.search_across_spaces(q, k=10)}
        assert len(exact & got) >= 8  # recall@10 >= 0.8 at 64-d int8


def test_dryrun_runs():
    sharded_kg_dryrun(make_mesh(8))
