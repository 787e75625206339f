"""Golden tests pinning reference-observable behaviors (SURVEY §4).

Each test names the reference file:line whose behavior it reproduces.
"""

import asyncio

import jax.numpy as jnp
import numpy as np

from rag_application_tpu.config import FunnelConfig
from rag_application_tpu.ingest.chunker import chunk_words
from rag_application_tpu.ingest.queue import TaskType, task_priority
from rag_application_tpu.ops.quant import quantize_int8
from rag_application_tpu.ops.rrf import rrf_fuse
from rag_application_tpu.search.params import adaptive_funnel


def test_int8_quantization_formula():
    """qdrant_handler.py:144-146 — clip(round(x*127), -127, 127)."""
    x = np.array([[0.5, -0.5, 1.0, -1.0, 0.004, 1.5]], dtype=np.float32)
    got = np.asarray(quantize_int8(jnp.asarray(x)))
    np.testing.assert_array_equal(got, [[64, -64, 127, -127, 1, 127]])


def test_matryoshka_prefix_is_a_view():
    """qdrant_handler.py:148-150 — matryoshka vectors are prefixes of the
    dense vector (here: literally the same storage)."""
    from rag_application_tpu.config import IndexConfig
    from rag_application_tpu.index.dense import DenseIndex

    idx = DenseIndex(IndexConfig(dim=16, matryoshka_dims=(4, 8),
                                 initial_capacity=8))
    rng = np.random.default_rng(0)
    idx.insert(rng.standard_normal((4, 16)).astype(np.float32))
    full = np.asarray(idx.vecs[:4], dtype=np.float32)
    # prefix view times inv norm is unit length
    pref = full[:, :4] * np.asarray(idx.inv_norms[:4, 0])[:, None]
    np.testing.assert_allclose(np.linalg.norm(pref, axis=-1), 1.0, atol=2e-2)


def test_rrf_qdrant_formula():
    """qdrant_handler.py:357-360 — Qdrant RRF: sum 1/(k + rank), k=2,
    rank 1-based."""
    a = (jnp.asarray([[5, 6, 7]]), jnp.ones((1, 3), dtype=bool))
    b = (jnp.asarray([[7, 5]]), jnp.ones((1, 2), dtype=bool))
    scores, ids = rrf_fuse([a, b], k=3, rrf_k=2)
    got = dict(zip(np.asarray(ids)[0].tolist(),
                   np.asarray(scores)[0].tolist()))
    assert abs(got[5] - (1 / 3 + 1 / 4)) < 1e-6
    assert abs(got[7] - (1 / 5 + 1 / 3)) < 1e-6
    assert abs(got[6] - 1 / 4) < 1e-6


def test_entity_vector_256_truncation():
    """entity_relation_extractor.py:251 — KG vectors are 256-d prefixes
    of the dense embedding."""
    from rag_application_tpu.ingest.pipeline import IngestPipeline

    class FakeKG:
        dim = 256

    p = IngestPipeline.__new__(IngestPipeline)
    p.kg = FakeKG()
    v = np.arange(768, dtype=np.float32)
    out = p._kg_vec(v)
    assert out.shape == (256,)
    np.testing.assert_array_equal(out, v[:256])


def test_word_packing_8000_chars():
    """IndexerAPI file_processor.py:223-241 — 8000-char greedy packing,
    words never split."""
    words = [f"w{i}" for i in range(5000)]
    chunks = chunk_words(" ".join(words), 8000)
    assert all(len(c) <= 8000 for c in chunks)
    assert " ".join(chunks).split() == words


def test_priority_scheme():
    """rabbitmq_handler.py:66-95 — FILE=255 > STRUCTURED(250-i) >
    DIRECT(230-i) > UNSTRUCTURED_PAGE(205-page)."""
    assert task_priority(TaskType.FILE) == 255
    assert (task_priority(TaskType.STRUCTURED_CHUNK, 0)
            > task_priority(TaskType.DIRECT_CHUNK, 0)
            > task_priority(TaskType.UNSTRUCTURED_PAGE, 0))
    assert task_priority(TaskType.UNSTRUCTURED_PAGE, 1000) == 0


def test_adaptive_funnel_formula_inputs():
    """hybrid_search_workflow.py:97-106 — min(500,n/10) etc., bucketed."""
    f = adaptive_funnel(5_000_000)
    assert f.matryoshka_limits[0] == 512  # bucket(500)
    assert f.dense_limit == 256  # bucket(200)
    assert f.sparse_limit == 128  # bucket(100)


def test_summarization_budgets_default():
    """base_agent.py:415-495 + AgentAPI config.py:94,106 — 32768 trigger,
    8192 target."""
    from rag_application_tpu.agents.base_agent import BaseAgent
    from rag_application_tpu.llm.router import LLMRouter, Provider

    a = BaseAgent(LLMRouter(Provider.STUB))
    assert a.max_tokens == 32768 and a.target_tokens == 8192


def test_waiter_agent_order_flow():
    """WaiterAgent parity (AgentAPI/app/agents/waiter_agent)."""
    from rag_application_tpu.agents.waiter_agent import WaiterAgent
    from rag_application_tpu.llm.router import LLMRouter, Provider

    async def main():
        w = WaiterAgent(LLMRouter(Provider.STUB))
        menu = await w.tools.get("browse_menu").call(vegetarian_only=True)
        assert all(m["vegetarian"] for m in menu)
        await w.tools.get("add_to_order").call(table="t1",
                                               dish="Tiramisu", quantity=2)
        order = await w.tools.get("get_order").call(table="t1")
        assert order["total"] == 16.0
        bad = await w.tools.get("add_to_order").call(table="t1", dish="sushi")
        assert "error" in bad
        out = await w.tools.get("checkout").call(table="t1")
        assert out["status"] == "paid" and out["total"] == 16.0

    asyncio.run(main())
