import asyncio

import numpy as np
import pytest

from rag_application_tpu.agents.base_agent import BaseAgent
from rag_application_tpu.config import Config, FunnelConfig, IndexConfig, SparseConfig
from rag_application_tpu.index.ivf import IVFIndex
from rag_application_tpu.llm.router import LLMRouter, Provider
from rag_application_tpu.store.collection import Collection


def small_config():
    cfg = Config()
    cfg.index = IndexConfig(dim=32, matryoshka_dims=(8, 16),
                            initial_capacity=512, block_size=256)
    cfg.sparse = SparseConfig(candidate_pool=64, max_query_terms=8)
    cfg.funnel = FunnelConfig(matryoshka_limits=(8, 6), dense_limit=5,
                              quantized_limit=5, sparse_limit=5, final_limit=5)
    return cfg


@pytest.fixture(scope="module")
def col():
    # own generator: the shared `rng` fixture is function-scoped
    rng = np.random.default_rng(1234)
    col = Collection("ann", small_config())
    embs = rng.standard_normal((300, 32)).astype(np.float32)
    col.store_document_vectors(
        "d1", [{"text": f"chunk {i}", "tag": "a" if i % 2 == 0 else "b"}
               for i in range(300)], embs)
    col.build_ann(n_clusters=16, bucket_rows=16, iters=4, block_rows=256)
    return col, embs


def test_collection_ann_search(col, rng):
    c, embs = col
    q = embs[42] + 0.01 * rng.standard_normal(32).astype(np.float32)
    hits = c.ann_search(q, limit=5, ef=48)
    assert hits[0].row == 42
    assert hits[0].payload["text"] == "chunk 42"


def test_collection_ann_filter(col, rng):
    c, embs = col
    q = embs[10]
    hits = c.ann_search(q, limit=5, ef=48, tag="b")
    assert hits and all(h.payload["tag"] == "b" for h in hits)


def test_ivf_index_save_load(col, tmp_path):
    c, embs = col
    path = str(tmp_path / "ivf.npz")
    c.ann.save(path)
    restored = IVFIndex.load(path, c.dense)
    v1, i1 = c.ann.search(embs[:3], 4)
    v2, i2 = restored.search(embs[:3], 4)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_agent_abatch_and_events():
    async def main():
        agent = BaseAgent(LLMRouter(Provider.STUB))
        outs = await agent.abatch(["one", "two"])
        assert len(outs) == 2 and all(o["content"] for o in outs)
        events = [e async for e in agent.astream_events("hello", thread_id="e")]
        kinds = [e["event"] for e in events]
        assert kinds[-1] == "on_end" and "on_message" in kinds

    asyncio.run(main())
