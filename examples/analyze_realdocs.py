"""Per-question diagnosis of the realdocs harness: untrained vs trained
encoder in ONE process (single fixture parse; the trained stack reuses
the harvested chunk texts through the normal re-ingest path).

For every miss, prints whether the answer span was in the retrieved
top-k, in the orchestrator context, and what the extractive window
returned — the data needed to tell funnel misses from answerer misses
from training damage.

    REALDOCS_TRAIN_STEPS=150 python examples/analyze_realdocs.py
"""

import asyncio
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

plat = os.environ.get("REALDOCS_PLATFORM", "cpu")
if plat == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

if plat == "cpu":
    jax.config.update("jax_platforms", "cpu")

from rag_application_tpu.evals.real_docs import (  # noqa: E402
    QUESTIONS, _norm, build_real_docs_stack, evaluate_real_docs)


async def report(tag, res, stack=None):
    print(f"== {tag}: recall@5 {res['retrieval_recall_at_k']:.4f} "
          f"answer-hit {res['answer_hit_rate']:.4f}", flush=True)
    for q, (query, spans) in zip(res["per_question"], QUESTIONS):
        if q["retrieved"] and q["answered"]:
            continue
        print(f"  {'MISS-R' if not q['retrieved'] else 'MISS-A'} "
              f"{query[:58]}")
        print(f"    window({len(q['answer'])}ch): {q['answer'][:200]!r}")
        if stack is not None:
            ctx = (await stack.orchestrator.execute(
                query, limit=5))["context"]
            in_ctx = [sp for sp in spans if _norm(sp) in _norm(ctx)]
            print(f"    span in context: {in_ctx or 'NO'}")
            for sp in in_ctx:
                i = _norm(ctx).find(_norm(sp))
                lo, hi = max(0, i - 90), i + 90
                print(f"    span site: ...{_norm(ctx)[lo:hi]}...")


async def main():
    steps = int(os.environ.get("REALDOCS_TRAIN_STEPS", "150"))
    t0 = time.time()
    stack0 = await build_real_docs_stack(train_steps=0)
    print(f"[analyze] untrained stack in {time.time()-t0:.0f}s",
          flush=True)
    res0 = await evaluate_real_docs(stack0, k=5)
    await report("untrained", res0, stack0)

    from rag_application_tpu.evals.real_docs import _train_encoder
    t0 = time.time()
    emb_t = _train_encoder(stack0.embedder, stack0.chunk_texts, steps)
    print(f"[analyze] trained {steps} steps in {time.time()-t0:.0f}s",
          flush=True)
    # re-ingest with the trained encoder through the normal path
    t0 = time.time()
    from rag_application_tpu.config import Config
    from rag_application_tpu.ingest.pipeline import IngestPipeline
    from rag_application_tpu.kg.extract import EntityRelationExtractor
    from rag_application_tpu.kg.store import KGStore
    from rag_application_tpu.llm.router import LLMRouter, Provider
    from rag_application_tpu.search.orchestration import SearchOrchestrator
    from rag_application_tpu.store.collection import Collection
    from rag_application_tpu.evals.real_docs import (_default_fixture_dir,
                                                     FIXTURES,
                                                     RealDocsStack)

    cfg = Config()
    cfg.funnel.final_fusion = "rrf"
    llm = LLMRouter(Provider.STUB)
    fdir = _default_fixture_dir()
    collection = Collection("real_docs_t", cfg)
    kg = KGStore(cfg.kg, dim=min(emb_t.dim, 2048))
    pipeline = IngestPipeline(
        collection, emb_t, kg=kg,
        kg_extractor=EntityRelationExtractor(llm).as_pipeline_extractor())
    for name in FIXTURES:
        with open(os.path.join(fdir, name), "rb") as f:
            await pipeline.ingest_file(name, f.read(),
                                       document_id=os.path.splitext(name)[0])
    orch = SearchOrchestrator(collection, kg, emb_t, llm)
    stack_t = RealDocsStack(collection, kg, emb_t, orch, pipeline)
    print(f"[analyze] trained re-ingest in {time.time()-t0:.0f}s",
          flush=True)
    res1 = await evaluate_real_docs(stack_t, k=5)
    await report(f"trained-{steps}", res1, stack_t)
    print(json.dumps({
        "untrained": [res0["retrieval_recall_at_k"],
                      res0["answer_hit_rate"]],
        "trained": [res1["retrieval_recall_at_k"],
                    res1["answer_hit_rate"]],
        "steps": steps}))


if __name__ == "__main__":
    asyncio.run(main())
