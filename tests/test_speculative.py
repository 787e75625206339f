"""Prompt-lookup speculative decoding (models/speculative.py).

Core claim: drafting + block verification is a SCHEDULING change —
greedy output is token-identical to the plain fused `generate` loop,
for any prompt, acceptance pattern, eos placement, and k_spec.
Reference behavior matched: one-token-per-step local generation
(app/core/models/huggingface/huggingface.py:195-260), beaten on
schedule, equal on tokens.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_application_tpu.models.decoder import (
    DecoderConfig,
    generate,
    init_decoder_params,
)
from rag_application_tpu.models.speculative import (
    generate_lookup,
    generate_lookup_stats,
)

CFG = DecoderConfig(vocab_size=128, hidden=64, num_layers=2, heads=4,
                    kv_heads=2, mlp_dim=128, max_len=256, dtype="float32")
PARAMS = init_decoder_params(jax.random.PRNGKey(3), CFG)
KEY = jax.random.PRNGKey(0)


def _greedy(ids, plen, max_new, eos=-1):
    out, n = generate(PARAMS, CFG, jnp.asarray(ids),
                      jnp.asarray(plen, jnp.int32), max_new, eos, -9,
                      KEY, 0.0)
    return np.asarray(out), np.asarray(n)


def _spec(ids, plen, max_new, eos=-1, k=4):
    out, n = generate_lookup(PARAMS, CFG, jnp.asarray(ids),
                             jnp.asarray(plen, jnp.int32), max_new, eos,
                             -9, KEY, k)
    return np.asarray(out), np.asarray(n)


@pytest.mark.parametrize("seed,t,k", [(0, 12, 4), (1, 7, 2), (2, 20, 6)])
def test_token_identical_to_plain_generate(seed, t, k):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, CFG.vocab_size, (1, t)).astype(np.int32)
    ref, rn = _greedy(ids, [t], 24)
    got, gn = _spec(ids, [t], 24, k=k)
    assert (got == ref).all(), (got, ref)
    assert (gn == rn).all()


def test_token_identical_fuzz():
    """8 random prompts at fixed shapes (one compiled program each
    side): speculative == plain for every one — acceptance patterns
    vary per prompt, the equality must not."""
    rng = np.random.default_rng(99)
    for _ in range(8):
        ids = rng.integers(0, CFG.vocab_size, (1, 16)).astype(np.int32)
        ref, rn = _greedy(ids, [16], 24)
        got, gn = _spec(ids, [16], 24, k=4)
        assert (got == ref).all() and (gn == rn).all()


def test_repetitive_prompt_accepts_drafts():
    """A prompt that is itself a repeated phrase: untrained models fall
    into greedy cycles, and even before that the emitted sequence reuses
    its own bigrams — the block-verify loop must finish in fewer model
    steps than tokens while emitting the identical sequence."""
    phrase = [5, 9, 17, 3]
    ids = np.asarray([phrase * 4], np.int32)  # (1, 16)
    t = ids.shape[1]
    ref, _ = _greedy(ids, [t], 32)
    out, n, steps = generate_lookup_stats(
        PARAMS, CFG, jnp.asarray(ids), jnp.asarray([t], jnp.int32), 32,
        -1, -9, KEY, 4)
    assert (np.asarray(out) == ref).all()
    s = int(np.asarray(steps))
    assert s <= 32
    # the loop can never beat the information bound either
    assert s >= int(np.ceil((32 - 1) / 5))
    # greedy decode of a tiny random model from a periodic prompt cycles
    # in practice; if it did here, speculation must have exploited it
    toks = np.asarray(out)[0]
    bigrams = set(zip(toks[:-1], toks[1:]))
    if len(bigrams) < len(toks) - 4:  # substantial bigram reuse
        assert s < 31, (s, toks)


def test_eos_stops_and_pads():
    rng = np.random.default_rng(4)
    ids = rng.integers(0, CFG.vocab_size, (1, 9)).astype(np.int32)
    ref, _ = _greedy(ids, [9], 16)
    eos = int(ref[0, 3])  # forces eos mid-stream (possibly mid-block)
    ref2, rn2 = _greedy(ids, [9], 16, eos=eos)
    got, gn = _spec(ids, [9], 16, eos=eos)
    assert (got == ref2).all(), (got, ref2)
    assert (gn == rn2).all()


def test_ragged_prompt_and_padding():
    """Right-padded prompt (prompt_len < T) behaves as the unpadded
    prompt — pad slots are never attended and never matched."""
    rng = np.random.default_rng(5)
    ids = rng.integers(0, CFG.vocab_size, (1, 16)).astype(np.int32)
    got, _ = _spec(ids, [10], 12)
    solo, _ = _spec(ids[:, :10], [10], 12)
    assert (got == solo).all()


def test_rejects_batch():
    with pytest.raises(ValueError, match="single-row"):
        _spec(np.zeros((2, 4), np.int32), [4, 4], 8)


def test_filtered_probs_matches_sample_logits():
    """_filtered_probs is the analytic law of decoder.sample_logits:
    20k Monte-Carlo draws land within ~2% of it (temperature + top-k +
    nucleus all active)."""
    from rag_application_tpu.models.decoder import sample_logits
    from rag_application_tpu.models.speculative import _filtered_probs

    logits = jnp.asarray(np.random.default_rng(0).normal(0, 2, (8,)),
                         jnp.float32)
    p = np.asarray(_filtered_probs(logits, temperature=0.7, top_k=5,
                                   top_p=0.8))
    assert abs(p.sum() - 1.0) < 1e-5
    assert (p > 0).sum() <= 5  # top-k honored

    keys = jax.random.split(jax.random.PRNGKey(1), 20000)
    draws = jax.vmap(lambda k: sample_logits(
        logits[None], k, temperature=0.7, top_k=5, top_p=0.8)[0])(keys)
    emp = np.bincount(np.asarray(draws), minlength=8) / 20000.0
    np.testing.assert_allclose(emp, p, atol=0.02)


def test_sampled_verify_preserves_the_target_law():
    """Rejection-sampled draft verification: the marginal of the first
    emitted token equals the target distribution exactly (20k draws),
    regardless of what the draft proposes; accepted positions echo the
    draft."""
    from rag_application_tpu.models.speculative import _sampled_verify

    rng = np.random.default_rng(3)
    V, K = 8, 3
    probs = rng.dirichlet(np.ones(V), size=K + 1).astype(np.float32)
    probs_j = jnp.asarray(probs)
    draft = jnp.asarray([2, 5, 0], jnp.int32)

    keys = jax.random.split(jax.random.PRNGKey(2), 20000)
    g, accept = jax.vmap(lambda k: _sampled_verify(probs_j, draft, k))(keys)
    g, accept = np.asarray(g), np.asarray(accept)
    # accepted -> the draft token verbatim
    assert (g[:, 0][accept[:, 0]] == 2).all()
    # position-0 marginal == target row 0 (the exactness property)
    emp = np.bincount(g[:, 0], minlength=V) / 20000.0
    np.testing.assert_allclose(emp, probs[0], atol=0.02)
    # acceptance rate at position 0 == p_0(draft_0)
    assert abs(accept[:, 0].mean() - probs[0, 2]) < 0.02
    # bonus position K: plain draw from row K
    emp_k = np.bincount(g[:, K], minlength=V) / 20000.0
    np.testing.assert_allclose(emp_k, probs[K], atol=0.02)


def test_sampled_lookup_generates_seeded_and_valid():
    """Sampled speculative generation: seeded-deterministic, in-vocab,
    pads after eos, and a near-zero temperature reproduces the greedy
    sequence (the distribution collapses onto the argmax)."""
    rng = np.random.default_rng(31)
    ids = rng.integers(0, CFG.vocab_size, (1, 12)).astype(np.int32)

    def sample(seed, temp):
        out, n = generate_lookup(PARAMS, CFG, jnp.asarray(ids),
                                 jnp.asarray([12], jnp.int32), 16, -1,
                                 -9, jax.random.PRNGKey(seed), 4, temp,
                                 32, 0.9)
        return np.asarray(out), np.asarray(n)

    o1, n1 = sample(0, 0.8)
    o2, _ = sample(0, 0.8)
    o3, _ = sample(7, 0.8)
    assert (o1 == o2).all()
    assert ((o1 >= -9) & (o1 < CFG.vocab_size)).all()
    assert not (o1 == o3).all()  # different seed, different path
    # temperature -> 0 collapses onto greedy
    cold, _ = sample(0, 1e-4)
    ref, _ = _greedy(ids, [12], 16)
    assert (cold == ref).all()
    # eos stops and pads
    eos = int(o1[0, 1])
    oe, ne = generate_lookup(PARAMS, CFG, jnp.asarray(ids),
                             jnp.asarray([12], jnp.int32), 16, eos, -9,
                             jax.random.PRNGKey(0), 4, 0.8, 32, 0.9)
    oe = np.asarray(oe)[0]
    stopped = np.where(oe == eos)[0]
    if stopped.size:  # everything after the first eos is pad
        assert (oe[stopped[0] + 1:] == -9).all()


def test_local_llm_speculative_chat_matches_plain():
    """LocalLLM(speculative=True): greedy chat text equals the plain
    fused path (lossless), via the public provider surface."""
    import asyncio

    from rag_application_tpu.llm.local import LocalLLM
    from rag_application_tpu.llm.router import ChatMessage
    from rag_application_tpu.models.wordpiece import WordPieceTokenizer

    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "system", "user",
             "assistant", ":", "you", "are", "helpful", "hello", "world",
             "how", "is", "the", "weather", "today", "fine", "sunny"]
    tok = WordPieceTokenizer.from_vocab_list(words, native=False)
    cfg = DecoderConfig(vocab_size=len(words), hidden=32, num_layers=2,
                        heads=4, kv_heads=2, mlp_dim=64, max_len=64,
                        dtype="float32")
    params = init_decoder_params(jax.random.PRNGKey(7), cfg)
    plain = LocalLLM(params, cfg, tok, model_name="tiny")
    spec = LocalLLM(params, cfg, tok, model_name="tiny", speculative=True)
    msgs = [ChatMessage("user", "hello how is the weather today")]

    async def main():
        a = await plain.chat(msgs, max_tokens=10, temperature=0.0)
        b = await spec.chat(msgs, max_tokens=10, temperature=0.0)
        return a.content, b.content

    a, b = asyncio.run(main())
    assert a == b and isinstance(a, str)
