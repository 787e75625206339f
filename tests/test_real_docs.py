"""Real-document end-to-end quality harness (evals/real_docs.py).

Parity surface: the reference's only end-to-end quality check — a live
"Who is Vivek Malipatel?" integration test over its real fixtures
(test/test_neo4j_search.py:15-60, IndexerAPI/pre-tests/). Here the SAME
documents flow through the native pipeline and a graded needle-query
set; CI keeps a 2-document subset so the test stays ~1 minute, and the
bench aux leg (bench.py BENCH_REALDOCS) grades the full set.
"""

import asyncio
import os

import pytest

from rag_application_tpu.evals.real_docs import (
    QUESTIONS,
    build_real_docs_stack,
    evaluate_real_docs,
    extractive_answer,
)

REAL = os.path.join(os.path.dirname(__file__), "fixtures", "real")

SUBSET_FILES = ["Resume.pdf", "ragas_papers.pdf"]
SUBSET_QUESTIONS = [
    q for q in QUESTIONS
    if "Vivek" in q[0] or "RAGAS" in q[0] or "Salesforce" in q[0]
    or "Oppenheimer" in q[0] or "chatbot" in q[0] or "Wiki" in q[0]
]


def run(coro):
    return asyncio.run(coro)


@pytest.fixture(scope="module")
def stack():
    return run(build_real_docs_stack(files=SUBSET_FILES))


def test_fixtures_present():
    for name in SUBSET_FILES:
        assert os.path.exists(os.path.join(REAL, name)), name


def test_real_docs_ingest_produces_chunks(stack):
    # both documents parsed into non-empty searchable chunks
    assert stack.collection.dense.size >= 5
    payloads = stack.collection.payloads.get_many(
        range(stack.collection.dense.size))
    docs = {p.get("document_id") for p in payloads if p}
    assert {"Resume", "ragas_papers"} <= docs
    blob = " ".join(stack.chunk_texts)
    assert "Malipatel" in blob
    assert "WikiEval" in blob


def test_real_docs_retrieval_quality(stack):
    """The graded needle-query set: with the from-scratch encoder the
    BM25+RRF leg must carry keyword needles. The floor is deliberately
    below the measured 0.85-0.93 so relay/session noise can't flake
    CI, but far above the 0.07 the dense-only final ranking scored."""
    res = run(evaluate_real_docs(stack, k=5, questions=SUBSET_QUESTIONS))
    assert res["n_questions"] >= 10
    assert res["retrieval_recall_at_k"] >= 0.6, res["per_question"]
    assert res["answer_hit_rate"] >= 0.2, res["per_question"]


def test_who_is_vivek_malipatel(stack):
    """The reference's literal headline question
    (test/test_neo4j_search.py:15-60)."""
    res = run(evaluate_real_docs(
        stack, k=5, questions=[("Who is Vivek Malipatel?", ["Malipatel"])]))
    assert res["retrieval_recall_at_k"] == 1.0
    assert res["answer_hit_rate"] == 1.0


def test_extractive_answer_idf_weighting():
    ctx = ("Vivek Malipatel worked at many companies. "
           "Vivek Malipatel studied computer science. "
           "He worked for PricewaterhouseCoopers in Bangalore, India.")
    ans = extractive_answer(
        "Which company did Vivek Malipatel work for in Bangalore?", ctx)
    assert "Bangalore" in ans


def test_extractive_answer_strips_doc_tags():
    ctx = "[Resume#0] EDUCATION\nIllinois Institute of Technology, Chicago"
    ans = extractive_answer("Which university in Chicago?", ctx)
    assert "Illinois" in ans
