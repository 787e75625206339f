import asyncio
import json

import pytest

from rag_application_tpu.kg.extract import (
    ENTITY_TYPES,
    RELATION_TYPES,
    EntityRelationExtractor,
    slugify,
)
from rag_application_tpu.llm.router import LLMRouter, Provider


def test_taxonomy_sizes():
    """Parity: 16 entity types + 18 relation types (IndexerAPI
    model_handler.py:205-349)."""
    assert len(ENTITY_TYPES) == 16
    assert len(RELATION_TYPES) == 18


def test_slugify():
    assert slugify("Ada Lovelace") == "ada_lovelace"
    assert slugify("  --  ") == "entity"


def test_extract_cleaning_and_confidence():
    llm = LLMRouter(Provider.STUB)
    llm.stub.on(r"Extract the knowledge graph", lambda _: json.dumps({
        "entities": [
            {"id": "Ada Lovelace", "text": "Ada Lovelace",
             "entity_type": "PERSON", "entity_profile": "mathematician"},
            {"id": "ada lovelace", "text": "Ada", "entity_type": "PERSON"},
            {"id": "engine", "text": "Analytical Engine",
             "entity_type": "MADE_UP_TYPE"},
            {"id": "", "text": ""},
        ],
        "relationships": [
            {"source": "Ada Lovelace", "target": "engine",
             "relation_type": "CREATED", "confidence": 0.9},
            {"source": "Ada Lovelace", "target": "missing",
             "relation_type": "USES"},
            {"source": "Ada Lovelace", "target": "engine",
             "relation_type": "BAD_REL", "confidence": 0.1},
        ]}))
    ex = EntityRelationExtractor(llm, min_confidence=0.3)
    out = asyncio.run(ex.extract("Ada Lovelace designed the Analytical Engine."))
    ids = [e["id"] for e in out["entities"]]
    assert ids == ["ada_lovelace", "engine"]  # dupe + empty dropped
    assert out["entities"][1]["entity_type"] == "OTHER"  # unknown type coerced
    assert len(out["relationships"]) == 1  # missing target + low conf dropped
    assert out["relationships"][0]["relation_type"] == "CREATED"


def test_merge_chunks_continuation():
    chunks = ["This is a sentence that", "continues in the next chunk.",
              "A new sentence starts here."]
    merged = EntityRelationExtractor.merge_chunks(chunks)
    assert len(merged) == 2
    assert merged[0].endswith("chunk.")


def test_extract_bad_llm_output_returns_empty():
    llm = LLMRouter(Provider.STUB)
    llm.stub.on(r".*", lambda _: "{{{definitely not json")
    ex = EntityRelationExtractor(llm)
    out = asyncio.run(ex.extract("text"))
    assert out == {"entities": [], "relationships": []}
