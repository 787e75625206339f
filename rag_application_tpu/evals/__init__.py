"""Evaluation harnesses (real-document retrieval/answer quality)."""

from .real_docs import (  # noqa: F401
    QUESTIONS,
    build_real_docs_stack,
    evaluate_real_docs,
    extractive_answer,
)
