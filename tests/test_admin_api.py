import asyncio
import os

import httpx
import pytest

from rag_application_tpu.api.app import build_app
from rag_application_tpu.api.http import HTTPServer
from rag_application_tpu.config import (
    Config,
    EncoderConfig,
    FunnelConfig,
    IndexConfig,
    IngestConfig,
    SparseConfig,
)
from rag_application_tpu.llm.router import LLMRouter, Provider
from rag_application_tpu.models.embedder import Embedder

TINY = EncoderConfig(vocab_size=512, hidden_dim=32, num_layers=1, num_heads=4,
                     mlp_dim=64, max_len=32, out_dim=32, dtype="float32")


def small_config():
    cfg = Config()
    cfg.index = IndexConfig(dim=32, matryoshka_dims=(8, 16), initial_capacity=16)
    cfg.sparse = SparseConfig(candidate_pool=64, max_query_terms=8)
    cfg.funnel = FunnelConfig(matryoshka_limits=(8, 6), dense_limit=5,
                              quantized_limit=5, sparse_limit=5, final_limit=5)
    cfg.ingest = IngestConfig(chunk_chars=300, max_concurrency=4)
    # KG dim must fit the tiny encoder
    cfg.kg.entity_dim = 32
    return cfg


def test_checkpoint_restore_roundtrip(tmp_path):
    async def main():
        llm = LLMRouter(Provider.STUB)
        emb = Embedder(cfg=TINY, batch_size=4, max_len=16)
        router, state = build_app(small_config(), llm=llm, embedder=emb)
        server = HTTPServer(router, port=0)
        port = await server.start()
        path = str(tmp_path / "snap")
        try:
            async with httpx.AsyncClient(
                base_url=f"http://127.0.0.1:{port}", timeout=60
            ) as c:
                await c.post("/ingest/raw-text", json={
                    "text": "durable state over restarts " * 10,
                    "document_id": "dur", "user_id": "u"})
                r = await c.post("/admin/checkpoint",
                                 json={"user_id": "u", "path": path})
                assert r.status_code == 200 and r.json()["chunks"] >= 1

                # wipe the space, restore, search again
                state.users.pop("u")
                r = await c.post("/admin/restore",
                                 json={"user_id": "u", "path": path})
                assert r.status_code == 200
                r = await c.post("/api/v1/search/hybrid", json={
                    "query": "durable state", "user_id": "u"})
                hits = r.json()["results"]
                assert hits and hits[0]["payload"]["document_id"] == "dur"
        finally:
            await server.stop()

    asyncio.run(main())


def test_user_registry_survives_restart(tmp_path):
    """Accounts, custom agents, AND the token secret checkpoint with the
    spaces: an outstanding bearer token keeps working after a restart,
    and a deactivated user's token is revoked immediately."""
    from rag_application_tpu.serve import checkpoint_spaces, restore_spaces

    async def main():
        llm = LLMRouter(Provider.STUB)
        emb = Embedder(cfg=TINY, batch_size=4, max_len=16)
        _, state = build_app(small_config(), llm=llm, embedder=emb)
        state.user_registry.signup("ann", "pw12345")
        token = state.user_registry.signin("ann", "pw12345")
        state.agent_registry.create("helper", system_prompt="hi")
        ckpt = str(tmp_path / "auto")
        checkpoint_spaces(state, ckpt, {})

        _, state2 = build_app(small_config(), llm=llm, embedder=emb)
        restore_spaces(state2, ckpt)
        assert state2.user_registry.verify_token(token) is not None
        assert any(a["name"] == "helper"
                   for a in state2.agent_registry.list())

        # deactivation revokes outstanding tokens, not just new signins
        uid = state2.user_registry.verify_token(token)
        state2.user_registry.update(uid, is_active=False)
        assert state2.user_registry.verify_token(token) is None

    asyncio.run(main())


def test_auto_checkpoint_and_boot_restore(tmp_path):
    """serve.py's durability loop: checkpoint_spaces snapshots changed
    spaces (skip-if-unchanged), restore_spaces rebuilds them at boot."""
    from rag_application_tpu.serve import (
        checkpoint_spaces, restore_spaces, space_fingerprint)

    async def main():
        llm = LLMRouter(Provider.STUB)
        emb = Embedder(cfg=TINY, batch_size=4, max_len=16)
        _, state = build_app(small_config(), llm=llm, embedder=emb)
        sp = state.space("u1")
        await sp.pipeline.ingest_text("alpha beta gamma " * 20,
                                      document_id="d1")
        ckpt = str(tmp_path / "auto")
        saved_fp = {}
        assert checkpoint_spaces(state, ckpt, saved_fp) == ["u1"]
        # unchanged space -> no second save
        assert checkpoint_spaces(state, ckpt, saved_fp) == []
        # mutate -> saved again
        await sp.pipeline.ingest_text("delta epsilon " * 30,
                                      document_id="d2")
        assert checkpoint_spaces(state, ckpt, saved_fp) == ["u1"]

        # fresh process: boot-restore from the same dir
        _, state2 = build_app(small_config(), llm=llm, embedder=emb)
        assert restore_spaces(state2, ckpt) == ["u1"]
        sp2 = state2.space("u1")
        assert sp2.collection.chunk_count() == sp.collection.chunk_count()
        assert space_fingerprint(sp2) == space_fingerprint(sp)
        # restored space still searches
        import numpy as np
        qv = np.asarray(emb.encode(["alpha beta"]))[0]
        hits = sp2.collection.hybrid_search(qv, "alpha beta", limit=3)
        assert len(hits) > 0

    asyncio.run(main())


def test_restore_skips_unrecoverable_user_id(tmp_path):
    """A checkpoint whose manifest collection name lacks the 'user_'
    prefix cannot yield a usable user id; restore must warn-and-skip
    rather than register the space under the digest directory name
    (where no request would ever find it)."""
    from rag_application_tpu.index.checkpoint import save_collection
    from rag_application_tpu.kg.checkpoint import save_kg
    from rag_application_tpu.kg.store import KGStore
    from rag_application_tpu.serve import restore_spaces
    from rag_application_tpu.store.collection import Collection

    cfg = small_config()
    col = Collection("orphan", cfg)  # no user_ prefix in the manifest
    path = str(tmp_path / "digestdir")
    os.makedirs(path)
    save_collection(col, os.path.join(path, "collection"))
    save_kg(KGStore(cfg.kg), os.path.join(path, "kg"))

    llm = LLMRouter(Provider.STUB)
    emb = Embedder(cfg=TINY, batch_size=4, max_len=16)
    _, state = build_app(cfg, llm=llm, embedder=emb)
    assert restore_spaces(state, str(tmp_path)) == []
    assert state.users == {}


def test_fingerprint_catches_count_neutral_mutation(tmp_path):
    """Delete doc A + ingest same-size doc B within one interval: live
    counts return to their old values, but the monotonic dense.size moves
    — the next checkpoint pass must re-snapshot (review finding: the old
    fingerprint skipped it, losing B on restore)."""
    import numpy as np

    from rag_application_tpu.serve import checkpoint_spaces, restore_spaces

    async def main():
        llm = LLMRouter(Provider.STUB)
        emb = Embedder(cfg=TINY, batch_size=4, max_len=16)
        _, state = build_app(small_config(), llm=llm, embedder=emb)
        sp = state.space("u")
        await sp.pipeline.ingest_text("alpha " * 40, document_id="A")
        ckpt = str(tmp_path / "fp")
        saved_fp = {}
        assert checkpoint_spaces(state, ckpt, saved_fp) == ["u"]

        n_before = sp.collection.chunk_count()
        sp.collection.delete_document("A")
        await sp.pipeline.ingest_text("omega " * 40, document_id="B")
        assert sp.collection.chunk_count() == n_before  # count-neutral
        assert checkpoint_spaces(state, ckpt, saved_fp) == ["u"]  # re-saved

        _, state2 = build_app(small_config(), llm=llm, embedder=emb)
        restore_spaces(state2, ckpt)
        qv = np.asarray(emb.encode(["omega"]))[0]
        hits = state2.space("u").collection.hybrid_search(qv, "omega", limit=3)
        assert any("omega" in h.payload.get("text", "") for h in hits)

    asyncio.run(main())


def test_build_ann_and_search_endpoint():
    """ANN is reachable through the served API: build (IVF default) then
    query with the ef knob (parity: hnsw_ef, qdrant_handler.py:369)."""
    async def main():
        llm = LLMRouter(Provider.STUB)
        emb = Embedder(cfg=TINY, batch_size=4, max_len=16)
        router, state = build_app(small_config(), llm=llm, embedder=emb)
        server = HTTPServer(router, port=0)
        port = await server.start()
        try:
            async with httpx.AsyncClient(
                base_url=f"http://127.0.0.1:{port}", timeout=60
            ) as client:
                await fn(client, state)
        finally:
            await server.stop()

    async def fn(client, state):
        for i in range(6):
            r = await client.post("/ingest/raw-text", json={
                "user_id": "u", "document_id": f"d{i}",
                "text": f"document {i} about topic{i} retrieval engines"})
            assert r.status_code in (200, 202)
        # querying before building is a clean 400
        r = await client.post("/api/v1/search/ann", json={
            "user_id": "u", "query": "topic3"})
        assert r.status_code == 400
        # the graph engine was removed in round 3 — clean 400, not a crash
        r = await client.post("/admin/build-ann", json={
            "user_id": "u", "engine": "graph"})
        assert r.status_code == 400
        r = await client.post("/admin/build-ann", json={
            "user_id": "u", "n_clusters": 4, "bucket_rows": 8, "iters": 3})
        assert r.status_code == 200
        body = r.json()
        assert body["engine"] == "ivf" and body["rows"] >= 6
        r = await client.post("/api/v1/search/ann", json={
            "user_id": "u", "query": "document 3 about topic3 retrieval "
            "engines", "limit": 3, "ef": 4})
        assert r.status_code == 200
        results = r.json()["results"]
        assert results and any(
            "topic3" in h["payload"].get("text", "") for h in results)

    asyncio.run(main())
