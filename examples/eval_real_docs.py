"""Real-document retrieval-quality bench leg (evals/real_docs.py).

Ingests the reference's own fixture documents (Resume.pdf,
ragas_papers.pdf, cube.PDF, the ML-slides PPTX, the resume DOCX,
Pokemon.csv — IndexerAPI/pre-tests/) through the full native pipeline
and grades the 28-question needle set, reporting retrieval recall@5 and
extractive answer hit-rate. This is the "does it work on real text"
counterpart to the synthetic-corpus QPS/recall legs; the reference's
own analogue is its live "Who is Vivek Malipatel?" integration test
(test/test_neo4j_search.py:15-60).

Runs on CPU by default: ingest is encoder-bound and the remote-compile
tunnel adds minutes without changing the quality numbers (the funnel
itself is measured on-chip by the main bench legs). REALDOCS_PLATFORM
overrides.

Env:
  REALDOCS_TRAIN_STEPS  contrastive fine-tune steps on the ingested
                        corpus before the graded re-ingest (default 0;
                        the from-scratch encoder + BM25/RRF funnel is
                        the honest baseline)
  REALDOCS_K            recall cutoff (default 5)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(f"[{time.strftime('%X')}]", *a, file=sys.stderr)


def main() -> None:
    plat = os.environ.get("REALDOCS_PLATFORM", "cpu")
    if plat == "cpu":
        # pre-import env skips the axon plugin's import-time discovery
        # (wedges on a dead relay); the config update overrides the
        # sitecustomize programmatic platform
        os.environ["JAX_PLATFORMS"] = "cpu"
    import asyncio

    import jax

    if plat == "cpu":
        jax.config.update("jax_platforms", "cpu")
    # plat == "tpu"/"axon": leave the sitecustomize attach alone — the
    # chip rides the axon plugin (platform name "tpu"); forcing
    # JAX_PLATFORMS=tpu selects the NATIVE libtpu path, which has no
    # local device ("No jellyfish device found", r4)
    from rag_application_tpu.evals.real_docs import (
        QUESTIONS, build_real_docs_stack, evaluate_real_docs)

    train_steps = int(os.environ.get("REALDOCS_TRAIN_STEPS", "0"))
    k = int(os.environ.get("REALDOCS_K", "5"))
    t0 = time.time()
    stack = asyncio.run(build_real_docs_stack(train_steps=train_steps))
    t_ingest = time.time() - t0
    log(f"ingested {stack.collection.dense.size} chunks, "
        f"{stack.kg.stats()} in {t_ingest:.0f}s")
    t0 = time.time()
    res = asyncio.run(evaluate_real_docs(stack, k=k))
    for q in res["per_question"]:
        log(("ok  " if q["retrieved"] else "MISS"),
            ("ans " if q["answered"] else "    "), q["query"][:60])
    print(json.dumps({
        "n_questions": res["n_questions"],
        "retrieval_recall_at_k": round(res["retrieval_recall_at_k"], 4),
        "answer_hit_rate": round(res["answer_hit_rate"], 4),
        "k": k,
        "train_steps": train_steps,
        "n_chunks": int(stack.collection.dense.size),
        "ingest_s": round(t_ingest, 1),
        "eval_s": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()
