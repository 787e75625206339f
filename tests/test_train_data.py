import asyncio

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_application_tpu.config import (
    Config,
    EncoderConfig,
    FunnelConfig,
    IndexConfig,
    SparseConfig,
)
from rag_application_tpu.llm.router import LLMRouter, Provider
from rag_application_tpu.models.encoder import init_encoder
from rag_application_tpu.models.tokenizer import HashTokenizer
from rag_application_tpu.models.train import TrainState, make_optimizer, make_train_step
from rag_application_tpu.models.train_data import (
    batches,
    crop_pairs,
    llm_query_pairs,
    neighbor_pairs,
)
from rag_application_tpu.store.collection import Collection

TINY = EncoderConfig(vocab_size=256, hidden_dim=32, num_layers=1, num_heads=4,
                     mlp_dim=64, max_len=32, out_dim=16, dtype="float32")


def test_neighbor_pairs(rng):
    cfg = Config()
    cfg.index = IndexConfig(dim=16, matryoshka_dims=(), initial_capacity=16)
    col = Collection("td", cfg)
    texts = [f"text number {i} with several words" for i in range(5)]
    col.store_document_vectors("doc", [{"text": t} for t in texts],
                               rng.standard_normal((5, 16)).astype(np.float32))
    pairs = neighbor_pairs(col)
    assert len(pairs) == 4
    assert pairs[0] == (texts[0], texts[1])


def test_crop_pairs(rng_np=np.random.default_rng(0)):
    texts = [" ".join(f"w{i}" for i in range(60))]
    pairs = crop_pairs(texts, rng_np)
    assert pairs and pairs[0][0] != pairs[0][1]
    assert all(len(p.split()) >= 8 for pair in pairs for p in pair)


def test_llm_query_pairs():
    llm = LLMRouter(Provider.STUB)
    llm.stub.on(r"search query", lambda _: "what is the topic?")
    pairs = asyncio.run(llm_query_pairs(["a passage about topics"], llm))
    assert pairs == [("what is the topic?", "a passage about topics")]


def test_batches_feed_train_step():
    tok = HashTokenizer(TINY.vocab_size, 32)
    pairs = [(f"question {i} about thing {i}", f"passage {i} covering thing {i}")
             for i in range(20)]
    enc = init_encoder(TINY, max_len=32)
    opt = make_optimizer(1e-3)
    step = jax.jit(make_train_step(enc.model, opt))
    state = TrainState(params=enc.params, opt_state=opt.init(enc.params),
                       step=jnp.zeros((), jnp.int32))
    n = 0
    for batch in batches(pairs, tok, batch_size=8, max_len=32):
        state, m = step(state, {k: jnp.asarray(v) for k, v in batch.items()})
        assert np.isfinite(float(m["loss"]))
        n += 1
    assert n == 2  # 20 pairs -> two full batches of 8


def test_ict_pairs_asymmetric_views():
    from rag_application_tpu.models.train_data import ict_pairs

    rng = np.random.default_rng(0)
    texts = ["The quick brown fox jumps. The lazy dog sleeps nearby. "
             "A third sentence provides extra context for the passage. "
             "And a fourth one pads it out beyond the minimum length."]
    pairs = ict_pairs(texts, rng)
    assert len(pairs) == 1
    query, ctx = pairs[0]
    assert 3 <= len(query.split()) <= 24
    assert len(ctx.split()) > len(query.split())
    # short texts yield nothing
    assert ict_pairs(["too short"], rng) == []


def test_keyword_pairs_route_rare_anchors():
    """Keyword probes: high-IDF tokens of a chunk, paired with it —
    the doc2query-style term in the realdocs fine-tune mix."""
    import numpy as np

    from rag_application_tpu.models.train_data import keyword_pairs

    texts = [
        "sheet pokemon csv with 800 rows columns name attack defense",
        "ragas retrieval augmented generation assessment framework eval",
        "common words appear here and here and here again and again",
    ]
    pairs = keyword_pairs(texts, np.random.default_rng(0), per_text=3)
    assert len(pairs) == 9
    for q, t in pairs:
        qt = q.split()
        assert 3 <= len(qt) <= 7
        # every probe token comes from its own text
        assert all(w in t.lower().split() for w in qt)
    # determinism under a fixed seed
    again = keyword_pairs(texts, np.random.default_rng(0), per_text=3)
    assert pairs == again
