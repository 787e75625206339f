import numpy as np
import pytest

from rag_application_tpu.config import KGConfig
from rag_application_tpu.kg.dedup import _levenshtein_ratio, deduplicate, find_duplicates
from rag_application_tpu.kg.store import KGStore, Space

DIM = 64


def vec(rng, seed_vec=None, noise=0.0):
    if seed_vec is None:
        v = rng.standard_normal(DIM).astype(np.float32)
    else:
        v = seed_vec + noise * rng.standard_normal(DIM).astype(np.float32)
    return v / np.linalg.norm(v)


@pytest.fixture
def kg(rng):
    kg = KGStore(KGConfig(max_degree=8), dim=DIM,
                 scope={"user_id": "u1", "org_id": "o1"})
    ents = [
        {"id": "e1", "text": "Vivek Malipatel", "entity_type": "PERSON",
         "entity_profile": "a software engineer"},
        {"id": "e2", "text": "OmniRAG", "entity_type": "PRODUCT",
         "entity_profile": "a rag platform"},
        {"id": "e3", "text": "Neo4j", "entity_type": "TECHNOLOGY",
         "entity_profile": "a graph database"},
    ]
    rels = [
        {"source": "e1", "target": "e2", "relation_type": "CREATED",
         "relationship_profile": "vivek created omnirag"},
        {"source": "e2", "target": "e3", "relation_type": "USES",
         "relationship_profile": "omnirag uses neo4j"},
    ]
    e_embs = np.stack([vec(rng) for _ in ents])
    r_embs = np.stack([vec(rng) for _ in rels])
    kg.upsert_unstructured_page(
        "resume.pdf", 1, content="page one text", embedding=vec(rng),
        entities=ents, relationships=rels, entity_embeddings=e_embs,
        relationship_embeddings=r_embs,
    )
    return kg


def test_upsert_and_stats(kg):
    s = kg.stats()
    assert s["page"] == 1 and s["entity"] == 3 and s["relationship"] == 2


def test_page_replace_semantics(kg, rng):
    """Re-upserting a page replaces its subgraph, not duplicates it."""
    kg.upsert_unstructured_page(
        "resume.pdf", 1, content="page one v2", embedding=vec(rng),
        entities=[{"id": "e1", "text": "Vivek M", "entity_type": "PERSON",
                   "entity_profile": "p"}],
        entity_embeddings=np.stack([vec(rng)]),
    )
    s = kg.stats()
    assert s["page"] == 1
    assert s["entity"] == 3  # e1 replaced; e2/e3 still there (same doc)
    pages = kg.get_pages("resume.pdf")
    assert pages[0]["content"] == "page one v2"


def test_search_space_and_filters(kg, rng):
    ent = kg.spaces[Space.ENTITY]
    row = kg._find_entity_row("e2", "resume.pdf")
    q = np.asarray(ent.index.vecs[row], dtype=np.float32)
    hits = kg.search_space(Space.ENTITY, q, k=2)
    assert hits[0]["id"] == "e2"
    assert hits[0]["user_id"] == "u1"
    hits = kg.search_space(Space.ENTITY, q, k=3, entity_type="PERSON")
    assert all(h["entity_type"] == "PERSON" for h in hits)


def test_search_across_spaces(kg, rng):
    row = kg._find_entity_row("e3", "resume.pdf")
    q = np.asarray(kg.spaces[Space.ENTITY].index.vecs[row], dtype=np.float32)
    hits = kg.search_across_spaces(q, k=5)
    assert hits[0]["space"] == "entity" and hits[0]["id"] == "e3"
    spaces = {h["space"] for h in hits}
    assert "page" in spaces or "relationship" in spaces  # merged across spaces


def test_traverse(kg):
    e1 = kg._find_entity_row("e1", "resume.pdf")
    out = kg.traverse([e1], hops=2)
    ids_by_hop = {(h["hop"], h["id"]) for h in out[0]}
    assert (0, "e1") in ids_by_hop
    assert (1, "e2") in ids_by_hop
    assert (2, "e3") in ids_by_hop


def test_traverse_hop_cap(kg):
    e1 = kg._find_entity_row("e1", "resume.pdf")
    out = kg.traverse([e1], hops=99)  # capped at cfg.max_hops=3
    assert max(h["hop"] for h in out[0]) <= 3


def test_entity_context(kg):
    e2 = kg._find_entity_row("e2", "resume.pdf")
    ctx = kg.entity_context(e2)
    assert ctx["entity"]["id"] == "e2"
    rel_types = {r["relationship"]["relation_type"] for r in ctx["relationships"]}
    assert rel_types == {"CREATED", "USES"}


def test_reset_document(kg, rng):
    kg.upsert_unstructured_page("other.pdf", 1, content="other",
                                embedding=vec(rng))
    removed = kg.reset_document("resume.pdf")
    assert removed > 0
    s = kg.stats()
    assert s["entity"] == 0 and s["relationship"] == 0 and s["page"] == 1
    # idempotent
    assert kg.reset_document("resume.pdf") == 0


def test_levenshtein_ratio():
    assert _levenshtein_ratio("kitten", "kitten") == 1.0
    assert _levenshtein_ratio("", "") == 1.0
    assert 0.7 < _levenshtein_ratio("Vivek Malipatel", "Vivek Malipatel ") <= 1.0
    assert _levenshtein_ratio("abc", "xyz") == 0.0


def test_dedup_merges_near_duplicates(rng):
    kg = KGStore(KGConfig(max_degree=8), dim=DIM)
    base = vec(rng)
    ents = [
        {"id": "a", "text": "Anthropic", "entity_type": "ORG",
         "entity_profile": "ai lab", "occurrences": 3},
        {"id": "a2", "text": "Anthropic.", "entity_type": "ORG",
         "entity_profile": "ai lab", "occurrences": 1},
        {"id": "b", "text": "DeepMind", "entity_type": "ORG",
         "entity_profile": "ai lab"},
    ]
    embs = np.stack([base, vec(rng, base, 0.02), vec(rng)])
    rels = [{"source": "a2", "target": "b", "relation_type": "COMPETES",
             "relationship_profile": "x"}]
    kg.upsert_unstructured_page("d", 1, content="c", embedding=vec(rng),
                                entities=ents, relationships=rels,
                                entity_embeddings=embs,
                                relationship_embeddings=np.stack([vec(rng)]))
    pairs = find_duplicates(kg)
    assert len(pairs) == 1
    merged = deduplicate(kg)
    assert merged == 1
    assert kg.stats()["entity"] == 2
    # winner (higher occurrences) kept, edges rewired onto it
    a_row = kg.spaces[Space.ENTITY].by_key[("entity", "a", "d")]
    winner = kg.spaces[Space.ENTITY].get(a_row)
    assert winner["occurrences"] == 4
    ctx = kg.entity_context(a_row)
    assert any(r["neighbor"]["id"] == "b" for r in ctx["relationships"])


def test_entity_reupsert_keeps_edges(rng):
    """MERGE re-upsert of an entity must carry its graph along: edges
    created on page 1 survive the entity being mentioned on page 2."""
    kg = KGStore(KGConfig(max_degree=8), dim=DIM)
    e = lambda: rng.standard_normal(DIM).astype("float32")
    ents = [{"id": "ada", "text": "Ada", "entity_type": "PERSON"},
            {"id": "babbage", "text": "Babbage", "entity_type": "PERSON"}]
    rels = [{"source": "ada", "target": "babbage",
             "relation_type": "WORKS_FOR", "relationship_profile": "x"}]
    kg.upsert_unstructured_page("doc", 1, content="p1", embedding=e(),
                                entities=ents, relationships=rels,
                                entity_embeddings=np.stack([e(), e()]),
                                relationship_embeddings=np.stack([e()]))
    kg.upsert_unstructured_page("doc", 2, content="p2", embedding=e(),
                                entities=[ents[0]], relationships=[],
                                entity_embeddings=np.stack([e()]))
    row = kg.spaces[Space.ENTITY].by_key[("entity", "ada", "doc")]
    ctx = kg.entity_context(row)
    assert ctx["relationships"], "page-1 edge lost after re-upsert"
    neighbors = [r["neighbor"]["id"] for r in ctx["relationships"]
                 if r.get("neighbor")]
    assert "babbage" in neighbors
    # the surviving neighbor sees the NEW ada row too
    b_row = kg.spaces[Space.ENTITY].by_key[("entity", "babbage", "doc")]
    b_neighbors = [r["neighbor"]["id"] for r in kg.entity_context(b_row)
                   ["relationships"] if r.get("neighbor")]
    assert "ada" in b_neighbors


def test_by_id_secondary_index_tracks_mutations(kg, rng):
    """The `by_id` index (entity_id -> {key: row}) must stay consistent
    through upsert/replace/delete so entity-id tool lookups are
    O(matches) instead of O(N) by_key scans (VERDICT r2 item 7)."""
    from rag_application_tpu.kg.store import Space

    table = kg.spaces[Space.ENTITY]
    rows = table.rows_for_id("e1")
    assert len(rows) == 1
    key, row = rows[0]
    assert table.by_key[key] == row
    assert table.get(row)["id"] == "e1"
    # scoped lookup by document
    assert table.rows_for_id("e1", "resume.pdf") == rows
    assert table.rows_for_id("e1", "other.pdf") == []

    # page re-upsert MERGEs entities onto new rows; by_id must follow
    ents = [{"id": "e1", "text": "Vivek M", "entity_type": "PERSON",
             "entity_profile": "updated"}]
    kg.upsert_unstructured_page(
        "resume.pdf", 1, content="page one v2", embedding=vec(rng),
        entities=ents, relationships=[],
        entity_embeddings=vec(rng)[None, :], relationship_embeddings=None)
    rows2 = table.rows_for_id("e1")
    assert len(rows2) == 1
    assert table.get(rows2[0][1])["entity_profile"] == "updated"

    kg.reset_document("resume.pdf")
    assert table.rows_for_id("e1") == []
    assert "e1" not in table.by_id


def test_by_id_survives_checkpoint_roundtrip(kg, tmp_path):
    from rag_application_tpu.kg.checkpoint import load_kg, save_kg
    from rag_application_tpu.kg.store import Space

    save_kg(kg, str(tmp_path / "kg"))
    back = load_kg(str(tmp_path / "kg"))
    table = back.spaces[Space.ENTITY]
    assert {k[1] for k in table.by_key} == set(table.by_id)
    assert len(table.rows_for_id("e2")) == 1
