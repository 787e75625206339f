"""Continuous batching (llm/scheduler.py): iteration-level scheduling
over the shared-slot KV cache.

Parity: the reference serves concurrent chat through Ollama, which
continuously batches decode server-side (app/core/models/ollama/*);
here N in-flight requests share ONE decode batch on the chip. The core
claim tested: batching is a SCHEDULING change, not a model change —
greedy decode through the batcher is token-identical to a solo fused
`generate` run, including across join/leave churn and cache compaction.
"""

import asyncio

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_application_tpu.llm.scheduler import DEAD, ContinuousBatcher
from rag_application_tpu.models.decoder import (
    DecoderConfig,
    generate,
    init_decoder_params,
)

CFG = DecoderConfig(vocab_size=256, hidden=64, num_layers=3, heads=4,
                    kv_heads=2, mlp_dim=128, max_len=128, dtype="float32")
PARAMS = init_decoder_params(jax.random.PRNGKey(0), CFG)


def _solo(prompt, max_new, prompt_pad, eos_id=-1):
    """Reference: one fused greedy `generate` run, eos/pad stripped."""
    ids = np.zeros((1, prompt_pad), np.int32)
    ids[0, :len(prompt)] = prompt
    out, _ = generate(PARAMS, CFG, ids, np.asarray([len(prompt)], np.int32),
                      max_new, eos_id, -7, jax.random.PRNGKey(0), 0.0)
    return [int(t) for t in np.asarray(out)[0] if int(t) not in (-7, eos_id)]


def _prompts(n, rng):
    return [list(rng.integers(1, CFG.vocab_size, rng.integers(3, 12)))
            for _ in range(n)]


def test_concurrent_greedy_matches_solo():
    """Four requests decoded in one shared batch produce exactly the
    tokens each would produce alone."""
    rng = np.random.default_rng(0)
    prompts = _prompts(4, rng)
    news = [10, 7, 13, 4]

    async def run():
        b = ContinuousBatcher(PARAMS, CFG, slots=4, prompt_pad=16,
                              horizon=32, chunk=4)
        return await asyncio.gather(*[
            b.submit(p, max_new=n) for p, n in zip(prompts, news)])

    got = asyncio.run(run())
    for p, n, toks in zip(prompts, news, got):
        assert toks == _solo(p, n, 16), (p, n)


def test_staggered_joins_keep_rows_independent():
    """Requests joining mid-flight (more requests than rows, so rows are
    reused after retirement) still match their solo runs."""
    rng = np.random.default_rng(1)
    prompts = _prompts(6, rng)

    async def run():
        b = ContinuousBatcher(PARAMS, CFG, slots=2, prompt_pad=16,
                              horizon=48, chunk=2)

        async def late(i, delay):
            await asyncio.sleep(delay)
            return await b.submit(prompts[i], max_new=6)

        out = await asyncio.gather(*[late(i, 0.02 * i) for i in range(6)])
        assert b.steps > 0
        return out

    got = asyncio.run(run())
    for p, toks in zip(prompts, got):
        assert toks == _solo(p, 6, 16), p


def test_eos_stops_early():
    """eos latches the row inactive; the eos token itself is excluded
    (generate_ids convention)."""
    rng = np.random.default_rng(2)
    prompt = _prompts(1, rng)[0]
    ref = _solo(prompt, 12, 16)
    eos = ref[5]  # force a stop mid-stream
    want = ref[:ref.index(eos)]

    async def run():
        b = ContinuousBatcher(PARAMS, CFG, slots=2, prompt_pad=16,
                              horizon=32, chunk=4)
        return await b.submit(prompt, max_new=12, eos_id=eos)

    assert asyncio.run(run()) == want


def test_compaction_preserves_decode():
    """A horizon smaller than total decoded tokens forces cache
    compaction mid-request; tokens still match solo, and retired rows'
    slots are reclaimed (head returns below the cache end)."""
    rng = np.random.default_rng(3)
    prompts = _prompts(3, rng)

    async def run():
        # S = 8 + 16 = 24; three sequential 20-token requests must
        # compact (24 shared write slots < 3*20 + prompts)
        b = ContinuousBatcher(PARAMS, CFG, slots=2, prompt_pad=8,
                              horizon=16, chunk=4)
        outs = await asyncio.gather(*[
            b.submit(p[:6], max_new=14) for p in prompts])
        return outs, b.compactions

    got, compactions = asyncio.run(run())
    assert compactions > 0
    for p, toks in zip(prompts, got):
        assert toks == _solo(p[:6], 14, 8), p


def test_cache_overflow_raises_to_submitter():
    """Live tokens that cannot fit even after compaction surface as an
    exception on the awaiting submit, not a hung future."""
    rng = np.random.default_rng(4)
    prompt = _prompts(1, rng)[0][:4]

    async def run():
        b = ContinuousBatcher(PARAMS, CFG, slots=1, prompt_pad=8,
                              horizon=8, chunk=4)
        # one row needs 4 + 40 live slots; S = 16 — impossible
        await b.submit(prompt, max_new=40)

    with pytest.raises(RuntimeError, match="cache full"):
        asyncio.run(run())


def test_retire_clears_slot_map():
    """After a request finishes, its row's slot_pos is all DEAD, so
    compaction never counts a dead request's leftovers."""
    rng = np.random.default_rng(5)
    prompt = _prompts(1, rng)[0]

    async def run():
        b = ContinuousBatcher(PARAMS, CFG, slots=2, prompt_pad=16,
                              horizon=32, chunk=4)
        await b.submit(prompt, max_new=8)
        return np.asarray(b.slot_pos)

    slot_pos = asyncio.run(run())
    assert (slot_pos == DEAD).all()


def test_kv_quant_batcher_matches_solo_across_compaction():
    """int8 KV cache through the batcher: token-identical to a solo
    fused `generate` under the same cache representation, including
    across a forced compaction (the re-pack gathers quantized rows and
    their scales together, so values are preserved exactly)."""
    from dataclasses import replace

    qcfg = replace(CFG, kv_quant=True)

    def solo_q(prompt, max_new, prompt_pad):
        ids = np.zeros((1, prompt_pad), np.int32)
        ids[0, :len(prompt)] = prompt
        out, _ = generate(PARAMS, qcfg, ids,
                          np.asarray([len(prompt)], np.int32),
                          max_new, -1, -7, jax.random.PRNGKey(0), 0.0)
        return [int(t) for t in np.asarray(out)[0] if int(t) != -7]

    rng = np.random.default_rng(11)
    prompts = _prompts(3, rng)

    async def run():
        b = ContinuousBatcher(PARAMS, qcfg, slots=2, prompt_pad=8,
                              horizon=16, chunk=4)
        assert b.ck["q"].dtype == jnp.int8
        outs = await asyncio.gather(*[
            b.submit(p[:6], max_new=14) for p in prompts])
        return outs, b.compactions

    got, compactions = asyncio.run(run())
    assert compactions > 0
    for p, toks in zip(prompts, got):
        assert toks == solo_q(p[:6], 14, 8), p


def test_speculative_batcher_matches_solo():
    """spec_k>0: every batch step verifies K drafts + 1 correction per
    row; per-row acceptance with the shared write head. Token-identical
    to solo greedy generate for repetitive prompts (high acceptance),
    random prompts (near-zero acceptance), and mixed batches."""
    rng = np.random.default_rng(7)
    phrase = list(rng.integers(1, CFG.vocab_size, 4))
    prompts = [phrase * 3,                     # cyclic: drafts accept
               list(rng.integers(1, CFG.vocab_size, 9)),   # random
               phrase * 2 + [7]]               # near-cyclic
    news = [12, 9, 11]

    async def run():
        b = ContinuousBatcher(PARAMS, CFG, slots=4, prompt_pad=16,
                              horizon=96, chunk=3, spec_k=3)
        return await asyncio.gather(*[
            b.submit(p, max_new=n) for p, n in zip(prompts, news)])

    got = asyncio.run(run())
    for p, n, toks in zip(prompts, news, got):
        assert toks == _solo(p, n, 16), (p, n, toks)


def test_speculative_batcher_compaction_and_eos():
    """Slot burn is chunk*(K+1) per dispatch, so a small horizon forces
    compaction mid-request; eos is consumed (never emitted) exactly as
    in the plain batcher."""
    rng = np.random.default_rng(8)
    prompts = _prompts(3, rng)

    async def run():
        b = ContinuousBatcher(PARAMS, CFG, slots=2, prompt_pad=8,
                              horizon=32, chunk=2, spec_k=3)
        outs = await asyncio.gather(*[
            b.submit(p[:6], max_new=14) for p in prompts])
        return outs, b.compactions

    got, compactions = asyncio.run(run())
    assert compactions > 0
    for p, toks in zip(prompts, got):
        assert toks == _solo(p[:6], 14, 8), p

    # eos: take a known continuation and re-run with eos = 3rd token
    base = _solo(prompts[0][:6], 14, 8)
    eos = base[2]

    async def run_eos():
        b = ContinuousBatcher(PARAMS, CFG, slots=2, prompt_pad=8,
                              horizon=32, chunk=2, spec_k=3)
        return await b.submit(prompts[0][:6], max_new=14, eos_id=eos)

    assert asyncio.run(run_eos()) == _solo(prompts[0][:6], 14, 8, eos_id=eos)


def test_speculative_batcher_composes_with_kv_quant():
    """spec_k and the int8 KV cache together: still token-identical to
    a solo greedy run under the same cache representation."""
    from dataclasses import replace

    qcfg = replace(CFG, kv_quant=True)
    rng = np.random.default_rng(9)
    phrase = list(rng.integers(1, CFG.vocab_size, 4))
    prompts = [phrase * 3, list(rng.integers(1, CFG.vocab_size, 7))]

    def solo_q(prompt, max_new, prompt_pad):
        ids = np.zeros((1, prompt_pad), np.int32)
        ids[0, :len(prompt)] = prompt
        out, _ = generate(PARAMS, qcfg, ids,
                          np.asarray([len(prompt)], np.int32),
                          max_new, -1, -7, jax.random.PRNGKey(0), 0.0)
        return [int(t) for t in np.asarray(out)[0] if int(t) != -7]

    async def run():
        b = ContinuousBatcher(PARAMS, qcfg, slots=2, prompt_pad=16,
                              horizon=64, chunk=2, spec_k=3)
        return await asyncio.gather(*[
            b.submit(p, max_new=10) for p in prompts])

    got = asyncio.run(run())
    for p, toks in zip(prompts, got):
        assert toks == solo_q(p, 10, 16), p


def test_first_token_eos_latches_row():
    """A request whose FIRST sampled token is eos must deliver nothing
    and stop — in both plain and speculative modes (the first token is
    the only eos that can ride the carry into a chunk)."""
    rng = np.random.default_rng(21)
    prompt = list(rng.integers(1, CFG.vocab_size, 7))
    first = _solo(prompt, 1, 16)[0]  # the greedy first token

    async def run(spec_k):
        b = ContinuousBatcher(PARAMS, CFG, slots=2, prompt_pad=16,
                              horizon=48, chunk=4, spec_k=spec_k)
        return await b.submit(prompt, max_new=10, eos_id=first)

    assert asyncio.run(run(0)) == []
    assert asyncio.run(run(3)) == []


def test_prefix_overflow_falls_back_to_full_prefill():
    """A suffix whose pow2 pad would overshoot the slot axis silently
    uses the full-prefill path (correct output, zero prefix hits):
    p0=18, suffix 14 pads to Ts=16 -> row buffer 34 > S = 32+1."""
    header = list(np.random.default_rng(24).integers(
        1, CFG.vocab_size, 18))
    prompt = header + list(np.random.default_rng(25).integers(
        1, CFG.vocab_size, 14))

    async def run():
        b = ContinuousBatcher(PARAMS, CFG, slots=1, prompt_pad=32,
                              horizon=1, chunk=1)
        b.register_prefix(header)
        out = await b.submit(prompt, max_new=1)
        return out, b.prefix_hits

    out, hits = asyncio.run(run())
    assert hits == 0  # fell back instead of tracing an over-long paste
    assert out == _solo(prompt, 1, 32)


def test_prefix_cached_admission_matches_solo():
    """register_prefix: prompts sharing the registered header prefill
    only their suffix, and the decoded tokens are identical to full
    prefills (slot s = position s either way)."""
    rng = np.random.default_rng(12)
    header = list(rng.integers(1, CFG.vocab_size, 11))
    tails = [list(rng.integers(1, CFG.vocab_size, n)) for n in (3, 5, 1)]
    prompts = [header + t for t in tails]
    other = list(rng.integers(1, CFG.vocab_size, 6))  # no prefix match

    async def run():
        b = ContinuousBatcher(PARAMS, CFG, slots=2, prompt_pad=32,
                              horizon=48, chunk=4)
        b.register_prefix(header)
        outs = await asyncio.gather(*[
            b.submit(p, max_new=8) for p in prompts + [other]])
        return outs, b.prefix_hits

    got, hits = asyncio.run(run())
    assert hits == 3
    for p, toks in zip(prompts + [other], got):
        assert toks == _solo(p, 8, 32), p


def test_prefix_cache_composes_with_speculation():
    rng = np.random.default_rng(13)
    header = list(rng.integers(1, CFG.vocab_size, 9))
    prompts = [header + list(rng.integers(1, CFG.vocab_size, n))
               for n in (2, 4)]

    async def run():
        b = ContinuousBatcher(PARAMS, CFG, slots=2, prompt_pad=16,
                              horizon=64, chunk=2, spec_k=3)
        b.register_prefix(header)
        outs = await asyncio.gather(*[
            b.submit(p, max_new=10) for p in prompts])
        return outs, b.prefix_hits

    got, hits = asyncio.run(run())
    assert hits == 2
    for p, toks in zip(prompts, got):
        assert toks == _solo(p, 10, 16), p


def test_batcher_serves_tp_sharded_params():
    """Multi-chip serving: the SAME batcher jits run with TP-sharded
    params (megatron-style param_shardings over the model axis) and
    produce token-identical output — XLA inserts the ICI collectives
    from the input shardings, the scheduler never changes."""
    from rag_application_tpu.parallel.mesh import make_mesh, param_shardings

    mesh = make_mesh(8, model=2)
    sharded = jax.device_put(PARAMS, param_shardings(mesh, PARAMS))
    rng = np.random.default_rng(10)
    prompts = _prompts(3, rng)
    news = [8, 11, 6]

    async def run(params):
        b = ContinuousBatcher(params, CFG, slots=2, prompt_pad=16,
                              horizon=48, chunk=4)
        return await asyncio.gather(*[
            b.submit(p, max_new=n) for p, n in zip(prompts, news)])

    base = asyncio.run(run(PARAMS))
    shard = asyncio.run(run(sharded))
    assert shard == base


def test_adaptive_speculation_throttles_and_stays_exact():
    """spec_min_tps above what random prompts can achieve: the batcher
    probes speculation, measures a low realized rate, and falls back to
    K=0 chunks for the cooldown — emitted tokens stay identical to solo
    (the K=0 spec chunk shares the output-emission convention)."""
    rng = np.random.default_rng(15)
    prompts = _prompts(3, rng)

    async def run():
        b = ContinuousBatcher(PARAMS, CFG, slots=2, prompt_pad=16,
                              horizon=64, chunk=2, spec_k=3,
                              spec_min_tps=4.5, spec_cooldown=4)
        outs = await asyncio.gather(*[
            b.submit(p, max_new=12) for p in prompts])
        return outs, b.spec_dispatches, b.plain_dispatches

    got, spec_d, plain_d = asyncio.run(run())
    assert spec_d >= 1  # probed at least once
    assert plain_d >= 1  # and throttled
    for p, toks in zip(prompts, got):
        assert toks == _solo(p, 12, 16), p


def test_adaptive_speculation_sampled_mode():
    """Throttling composes with sampled speculation: K=0 chunks route
    through _sampled_verify's empty-draft path; output stays seeded-
    deterministic and in-vocab."""
    rng = np.random.default_rng(16)
    prompt = list(rng.integers(1, CFG.vocab_size, 6))

    def run_once():
        async def run():
            b = ContinuousBatcher(PARAMS, CFG, slots=1, prompt_pad=8,
                                  horizon=48, chunk=2, spec_k=2,
                                  temperature=0.8, top_k=32, top_p=0.9,
                                  spec_min_tps=4.0, spec_cooldown=3)
            out = await b.submit(prompt, max_new=10)
            return out, b.plain_dispatches

        return asyncio.run(run())

    a, plain_a = run_once()
    b, _ = run_once()
    assert a == b and len(a) == 10
    assert plain_a >= 1
    assert all(0 <= t < CFG.vocab_size for t in a)


def test_sampled_speculative_batcher():
    """spec_k with temperature>0: rejection-sampled verification (law
    pinned in tests/test_speculative.py). Seeded-deterministic per
    batcher; a near-zero temperature collapses onto the solo greedy
    sequence THROUGH the whole batch machinery (joins + compaction)."""
    rng = np.random.default_rng(14)
    prompt = list(rng.integers(1, CFG.vocab_size, 6))

    def run_once(seed, temp):
        async def run():
            b = ContinuousBatcher(PARAMS, CFG, slots=2, prompt_pad=8,
                                  horizon=32, chunk=2, spec_k=3,
                                  temperature=temp, top_k=32,
                                  top_p=0.9, seed=seed)
            return await b.submit(prompt, max_new=12), b.compactions

        return asyncio.run(run())

    a, _ = run_once(0, 0.8)
    b, _ = run_once(0, 0.8)
    c, _ = run_once(5, 0.8)
    assert a == b and len(a) == 12
    assert all(0 <= t < CFG.vocab_size for t in a)
    assert a != c  # different seed, different trajectory (overwhelmingly)

    cold, compactions = run_once(0, 1e-4)
    assert compactions > 0  # the run crossed a compaction
    assert cold == _solo(prompt, 12, 8)


def test_local_llm_batched_chat_matches_solo_chat():
    """LocalLLM.chat through enable_batching returns the same text as
    the solo fused path for greedy requests, and concurrent chats
    share the batch."""
    from rag_application_tpu.llm.local import LocalLLM
    from rag_application_tpu.llm.router import ChatMessage
    from rag_application_tpu.models.wordpiece import WordPieceTokenizer

    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "system", "user",
             "assistant", ":", "hello", "world", "weather", "sunny",
             "how", "is", "the", "today", "a", "fine"]
    tok = WordPieceTokenizer.from_vocab_list(words, native=False)
    cfg = DecoderConfig(vocab_size=len(words), hidden=32, num_layers=2,
                        heads=4, kv_heads=2, mlp_dim=64, max_len=64,
                        dtype="float32")
    params = init_decoder_params(jax.random.PRNGKey(7), cfg)
    convs = [[ChatMessage("user", "hello how is the weather")],
             [ChatMessage("user", "the weather today")],
             [ChatMessage("user", "sunny world hello")]]

    async def main():
        solo = LocalLLM(params, cfg, tok, model_name="tiny")
        want = [(await solo.chat(m, max_tokens=8)).content for m in convs]
        batched = LocalLLM(params, cfg, tok, model_name="tiny")
        batched.enable_batching(slots=2, prompt_pad=32, horizon=32,
                                chunk=4)
        got = await asyncio.gather(*[
            batched.chat(m, max_tokens=8) for m in convs])
        assert batched._batcher.steps > 0  # actually went through it
        return want, [r.content for r in got]

    want, got = asyncio.run(main())
    assert got == want


def test_long_prompt_bypasses_batcher():
    """A prompt longer than the batcher's prompt_pad must take the solo
    path (submit clips to the LAST prompt_pad tokens — routing it
    through the batch would silently drop the system prompt)."""
    from rag_application_tpu.llm.local import LocalLLM
    from rag_application_tpu.llm.router import ChatMessage
    from rag_application_tpu.models.wordpiece import WordPieceTokenizer

    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "system", "user",
             "assistant", ":", "hello", "world", "weather", "sunny",
             "how", "is", "the", "today", "a", "fine"]
    tok = WordPieceTokenizer.from_vocab_list(words, native=False)
    cfg = DecoderConfig(vocab_size=len(words), hidden=32, num_layers=2,
                        heads=4, kv_heads=2, mlp_dim=64, max_len=64,
                        dtype="float32")
    params = init_decoder_params(jax.random.PRNGKey(7), cfg)
    long_msg = [ChatMessage("system", "the weather today is fine"),
                ChatMessage("user", " ".join(["hello world"] * 6))]

    async def main():
        solo = LocalLLM(params, cfg, tok, model_name="tiny")
        want = (await solo.chat(long_msg, max_tokens=6)).content
        batched = LocalLLM(params, cfg, tok, model_name="tiny")
        b = batched.enable_batching(slots=2, prompt_pad=8, horizon=16,
                                    chunk=4)
        assert len(batched.render(long_msg)) > 8  # genuinely too long
        got = (await batched.chat(long_msg, max_tokens=6)).content
        return want, got, b.steps

    want, got, steps = asyncio.run(main())
    assert got == want
    assert steps == 0  # never entered the batch


def test_local_llm_batched_stream_matches_solo_stream():
    """Concurrent LocalLLM.stream calls through the batcher yield the
    same concatenated text as the solo per-token path."""
    from rag_application_tpu.llm.local import LocalLLM
    from rag_application_tpu.llm.router import ChatMessage
    from rag_application_tpu.models.wordpiece import WordPieceTokenizer

    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "user", "assistant",
             ":", "hello", "world", "sunny", "fine", "a", "the"]
    tok = WordPieceTokenizer.from_vocab_list(words, native=False)
    cfg = DecoderConfig(vocab_size=len(words), hidden=32, num_layers=2,
                        heads=4, kv_heads=2, mlp_dim=64, max_len=64,
                        dtype="float32")
    params = init_decoder_params(jax.random.PRNGKey(9), cfg)
    convs = [[ChatMessage("user", "hello world")],
             [ChatMessage("user", "the sunny a fine")]]

    async def collect(llm, msgs):
        return "".join([d async for d in llm.stream(msgs, max_tokens=6)])

    async def main():
        solo = LocalLLM(params, cfg, tok)
        want = [await collect(solo, m) for m in convs]
        batched = LocalLLM(params, cfg, tok)
        batched.enable_batching(slots=2, prompt_pad=16, horizon=16,
                                chunk=2)
        got = await asyncio.gather(*[collect(batched, m) for m in convs])
        assert batched._batcher.steps > 0
        return want, got

    want, got = asyncio.run(main())
    assert got == want


def test_sampled_mode_runs():
    """temperature > 0 exercises the sampling path end-to-end (no
    equality claim — randomness differs from solo by design)."""
    rng = np.random.default_rng(6)
    prompts = _prompts(2, rng)

    async def run():
        b = ContinuousBatcher(PARAMS, CFG, slots=2, prompt_pad=16,
                              horizon=32, chunk=4, temperature=0.8,
                              top_k=16, top_p=0.9, seed=7)
        return await asyncio.gather(*[
            b.submit(p, max_new=6) for p in prompts])

    got = asyncio.run(run())
    for toks in got:
        assert len(toks) == 6
        assert all(0 <= t < CFG.vocab_size for t in toks)


def test_lookahead_row_reuse_safety():
    """With lookahead > 0 a chunk's output can land AFTER its row was
    retired and re-admitted to a new request; the (row, request_id)
    snapshot must drop those tokens instead of leaking them. Heavy
    churn (8 requests over 2 rows, varied budgets, deep lookahead)
    stays token-identical to solo."""
    rng = np.random.default_rng(7)
    prompts = _prompts(8, rng)
    news = [3, 11, 6, 1, 9, 4, 12, 2]

    async def run():
        b = ContinuousBatcher(PARAMS, CFG, slots=2, prompt_pad=16,
                              horizon=48, chunk=2, lookahead=4)
        return await asyncio.gather(*[
            b.submit(p, max_new=n) for p, n in zip(prompts, news)])

    got = asyncio.run(run())
    for p, n, toks in zip(prompts, news, got):
        assert toks == _solo(p, n, 16), (p, n)


def test_lookahead_zero_matches_pipelined():
    """lookahead=0 (read every chunk before dispatching the next) and
    deep lookahead produce identical streams — pipelining is a dispatch
    overlap, not a scheduling change."""
    rng = np.random.default_rng(8)
    prompts = _prompts(3, rng)

    async def run(la):
        b = ContinuousBatcher(PARAMS, CFG, slots=2, prompt_pad=16,
                              horizon=32, chunk=4, lookahead=la)
        return await asyncio.gather(*[
            b.submit(p, max_new=8) for p in prompts])

    assert asyncio.run(run(0)) == asyncio.run(run(5))


def test_lookahead_spec_compaction_identity():
    """Speculative chunks + compaction + lookahead compose: emitted
    tokens still match solo greedy decode."""
    rng = np.random.default_rng(9)
    prompts = _prompts(3, rng)

    async def run():
        b = ContinuousBatcher(PARAMS, CFG, slots=2, prompt_pad=8,
                              horizon=24, chunk=2, spec_k=2, lookahead=3)
        outs = await asyncio.gather(*[
            b.submit(p[:6], max_new=10) for p in prompts])
        return outs, b.compactions

    got, compactions = asyncio.run(run())
    assert compactions > 0
    for p, toks in zip(prompts, got):
        assert toks == _solo(p[:6], 10, 8), p


def test_eos_at_chunk_last_step_zombie_row():
    """A row that SAMPLES eos at its chunk's last step is dead on
    device but looks alive to the host (its last emitted id is a real
    token). With slots=1 and a tight cache the next request forces
    compaction; the zombie's lane must be reclaimed (via the live
    active-vector read at the compaction sync point) instead of
    raising 'cache full after compaction'. Sweeping the eos position
    across a whole chunk guarantees one case lands on the boundary."""
    rng = np.random.default_rng(11)
    prompt = _prompts(1, rng)[0][:6]
    ref = _solo(prompt, 24, 8)

    async def run(eos):
        b = ContinuousBatcher(PARAMS, CFG, slots=1, prompt_pad=8,
                              horizon=16, chunk=8, lookahead=2)
        first = await b.submit(prompt, max_new=18, eos_id=eos)
        second = await b.submit(prompt, max_new=18, eos_id=eos)
        return first, second

    # chunk 2 ends at global step 15 and fills the 24-slot cache; eos
    # SAMPLED there (= stream index 16, delivered 16 < max_new 18) is
    # the zombie: dead on device, last emitted id real, budget left.
    # m > 16 would genuinely exceed capacity (22 live + 8 burn > 24) —
    # not this test's subject.
    for m in (14, 15, 16):
        eos = ref[m]
        assert eos not in ref[:m], "pick a prompt whose ref[m] is fresh"
        want = ref[:m]
        first, second = asyncio.run(run(eos))
        assert first == want, m
        assert second == want, m


def test_multi_lora_batcher_matches_merged_solo():
    """Rows with DIFFERENT adapters decode in one shared batch; each
    row's greedy output equals a solo run of its adapter merged into
    the dense weights (multi-LoRA serving, models/lora.py::lora_banks +
    decoder.forward lora=)."""
    from rag_application_tpu.models.lora import (
        lora_banks,
        lora_merge,
        lora_wrap_with,
    )

    def rand_adapter(seed, r):
        key = jax.random.PRNGKey(seed)
        out = {}
        for t, fin, fout in (("wq", 64, 64), ("wv", 64, 32)):
            key, k1, k2 = jax.random.split(key, 3)
            out[t] = {"a": jax.random.normal(k1, (3, fin, r)) * 0.3,
                      "b": jax.random.normal(k2, (3, r, fout)) * 0.3,
                      "s": jnp.full((3, 1, 1), 2.0, jnp.float32)}
        return out

    ad1, ad2 = rand_adapter(1, 4), rand_adapter(2, 8)
    banks = lora_banks([ad1, ad2], dtype=jnp.float32)
    rng = np.random.default_rng(3)
    prompts = _prompts(3, rng)
    aids = [0, 1, 2]
    news = [9, 11, 8]

    async def run():
        b = ContinuousBatcher(PARAMS, CFG, slots=3, prompt_pad=16,
                              horizon=32, chunk=4, lora_banks=banks)
        return await asyncio.gather(*[
            b.submit(p, max_new=n, adapter_id=a)
            for p, n, a in zip(prompts, news, aids)])

    got = asyncio.run(run())
    merged = [PARAMS,
              lora_merge(lora_wrap_with(PARAMS, ad1)),
              lora_merge(lora_wrap_with(PARAMS, ad2))]
    for p, n, a, toks in zip(prompts, news, aids, got):
        ids = np.zeros((1, 16), np.int32)
        ids[0, :len(p)] = p
        out, _ = generate(merged[a], CFG, ids,
                          np.asarray([len(p)], np.int32), n, -1, -7,
                          jax.random.PRNGKey(0), 0.0)
        solo = [int(t) for t in np.asarray(out)[0] if int(t) != -7]
        assert toks == solo, (a, toks, solo)


def test_multi_lora_adapter_id_validation():
    banks_cfg = dict(slots=2, prompt_pad=16, horizon=32, chunk=4)

    async def run():
        b = ContinuousBatcher(PARAMS, CFG, **banks_cfg)  # no banks
        try:
            await b.submit([1, 2, 3], max_new=4, adapter_id=1)
        except ValueError as e:
            return str(e)
        return None

    msg = asyncio.run(run())
    assert msg and "adapter_id" in msg
