"""Extended sampling through the continuous batcher (llm/scheduler.py
sampling_ext): per-request grammar constraints, OpenAI penalties and
logit_bias ride per-row device planes inside the shared decode batch.

Parity+: the reference's serving stack (Ollama continuous batching,
app/core/models/ollama/*) has NO per-request grammar or penalty support
— such requests fall back to provider-side behavior. Here they batch
with plain requests AND stay token-identical to the solo fused loop
(decoder.generate_logprobs), which tests assert exactly at greedy.
"""

import asyncio
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_application_tpu.llm.scheduler import ContinuousBatcher
from rag_application_tpu.models.constrain import compile_schema
from rag_application_tpu.models.decoder import (
    DecoderConfig,
    generate,
    init_decoder_params,
)

CFG = DecoderConfig(vocab_size=160, hidden=32, num_layers=2, heads=4,
                    kv_heads=2, mlp_dim=64, max_len=512, dtype="float32")
PARAMS = init_decoder_params(jax.random.PRNGKey(0), CFG)
EOS = 158  # outside the grammar: only the accept-state mask allows it


class ByteTok:
    """Toy tokenizer: id i decodes to chr(i) for printable ASCII."""

    def decode(self, ids):
        return "".join(chr(i) if 32 <= i < 127 else "\x00" for i in ids)

    def encode(self, text):
        return [ord(c) if 32 <= ord(c) < 127 else 1 for c in text]


SCHEMA = {"type": "object", "properties": {
    "name": {"type": "string", "minLength": 1, "maxLength": 6},
    # digit-bounded so a GREEDY constrained decode must terminate
    "count": {"type": "integer", "minimum": 0, "maximum": 99999},
    "kind": {"enum": ["alpha", "beta"]},
}}
CON = compile_schema(SCHEMA, ByteTok(), CFG.vocab_size)


def _solo(prompt, max_new, prompt_pad, *, eos_id=-1, constraint=None,
          presence=0.0, frequency=0.0, logit_bias=None):
    """Reference: one fused greedy `generate` run, eos/pad stripped."""
    ids = np.zeros((1, prompt_pad), np.int32)
    ids[0, :len(prompt)] = prompt
    out, _ = generate(PARAMS, CFG, ids, np.asarray([len(prompt)], np.int32),
                      max_new, eos_id, -7, jax.random.PRNGKey(0), 0.0,
                      64, 1.0, None, presence, frequency,
                      None if constraint is None else constraint.as_device(),
                      None if logit_bias is None else jnp.asarray(logit_bias))
    return [int(t) for t in np.asarray(out)[0] if int(t) not in (-7, eos_id)]


def _prompts(n, rng, hi=120):
    return [list(rng.integers(32, hi, rng.integers(3, 12)))
            for _ in range(n)]


def _ext_batcher(**kw):
    kw.setdefault("slots", 2)
    kw.setdefault("prompt_pad", 16)
    kw.setdefault("horizon", 256)
    kw.setdefault("chunk", 4)
    return ContinuousBatcher(PARAMS, CFG, sampling_ext=True, **kw)


def test_constrained_request_matches_solo_and_parses():
    """A grammar-constrained request through the shared batch is
    token-identical to the solo fused run and emits valid JSON."""
    rng = np.random.default_rng(0)
    prompts = _prompts(3, rng)

    async def run():
        b = _ext_batcher()
        cid = b.register_constraint(CON)
        return await asyncio.gather(
            b.submit(prompts[0], max_new=120, eos_id=EOS,
                     constraint_id=cid),
            b.submit(prompts[1], max_new=10),
            b.submit(prompts[2], max_new=120, eos_id=EOS,
                     constraint_id=cid),
        )

    con0, plain, con2 = asyncio.run(run())
    for p, got in ((prompts[0], con0), (prompts[2], con2)):
        want = _solo(p, 120, 16, eos_id=EOS, constraint=CON)
        assert got == want
        doc = json.loads(ByteTok().decode(got))
        assert set(doc) == {"name", "count", "kind"}
    # the plain neighbor is untouched by its constrained batch-mates
    assert plain == _solo(prompts[1], 10, 16)


def test_penalties_match_solo():
    """presence/frequency penalties through the batcher reproduce the
    solo fused loop exactly (counts seeded from the prompt, consumed
    token joins before the next sample)."""
    rng = np.random.default_rng(1)
    # repeated-token prompts so the prompt-count seeding matters
    prompts = [[40, 40, 41, 41, 41, 42], list(rng.integers(32, 120, 8))]

    async def run():
        b = _ext_batcher()
        return await asyncio.gather(
            b.submit(prompts[0], max_new=24, presence=0.7, frequency=1.3),
            b.submit(prompts[1], max_new=24, frequency=2.0),
        )

    got = asyncio.run(run())
    assert got[0] == _solo(prompts[0], 24, 16, presence=0.7, frequency=1.3)
    assert got[1] == _solo(prompts[1], 24, 16, frequency=2.0)
    # and the penalty actually changes the output
    assert got[1] != _solo(prompts[1], 24, 16)


def test_logit_bias_matches_solo():
    rng = np.random.default_rng(2)
    p = _prompts(1, rng)[0]
    bias = np.zeros((CFG.vocab_size,), np.float32)
    bias[55] = 30.0  # strong pull toward one token

    async def run():
        b = _ext_batcher()
        return await b.submit(p, max_new=12, logit_bias=bias)

    got = asyncio.run(run())
    assert got == _solo(p, 12, 16, logit_bias=bias)
    assert 55 in got  # the bias did its job


def test_row_reuse_clears_ext_planes():
    """A plain request admitted into a row previously used by a
    penalized+biased+constrained request must match its pure solo run
    (stale planes would corrupt it)."""
    rng = np.random.default_rng(3)
    plains = _prompts(4, rng)
    bias = np.zeros((CFG.vocab_size,), np.float32)
    bias[60] = 25.0

    async def run():
        b = _ext_batcher(slots=2)
        cid = b.register_constraint(CON)
        first = await asyncio.gather(
            b.submit(plains[0], max_new=120, eos_id=EOS, constraint_id=cid,
                     presence=0.5, frequency=0.5, logit_bias=bias),
            b.submit(plains[1], max_new=6),
        )
        second = await asyncio.gather(
            b.submit(plains[2], max_new=8),
            b.submit(plains[3], max_new=8),
        )
        return first, second

    _, second = asyncio.run(run())
    assert second[0] == _solo(plains[2], 8, 16)
    assert second[1] == _solo(plains[3], 8, 16)


def test_ext_composes_with_lora_rows():
    """A constrained request and a LoRA-adapter request share one
    batch; each matches its own solo reference."""
    from rag_application_tpu.models.lora import (
        lora_adapters,
        lora_banks,
        lora_init,
        lora_wrap_with,
    )

    wrapped = lora_init(jax.random.PRNGKey(7), PARAMS, r=2, alpha=8.0)
    tree = lora_adapters(wrapped)
    tree = jax.tree.map(  # nonzero b so the adapter actually acts
        lambda v: v + 0.05 * jax.random.normal(
            jax.random.PRNGKey(8), v.shape, jnp.float32).astype(v.dtype),
        tree)
    banks = lora_banks([tree], alpha=8.0, dtype=jnp.float32)
    rng = np.random.default_rng(4)
    prompts = _prompts(2, rng)

    async def run():
        b = _ext_batcher(lora_banks=banks)
        cid = b.register_constraint(CON)
        return await asyncio.gather(
            b.submit(prompts[0], max_new=120, eos_id=EOS,
                     constraint_id=cid),
            b.submit(prompts[1], max_new=8, adapter_id=1),
        )

    con_out, lora_out = asyncio.run(run())
    assert con_out == _solo(prompts[0], 120, 16, eos_id=EOS, constraint=CON)
    json.loads(ByteTok().decode(con_out))
    # LoRA reference: solo generate with the merged adapter
    from rag_application_tpu.models.decoder import generate as gen

    ids = np.zeros((1, 16), np.int32)
    ids[0, :len(prompts[1])] = prompts[1]
    out, _ = gen(PARAMS, CFG, ids, np.asarray([len(prompts[1])], np.int32),
                 8, -1, -7, jax.random.PRNGKey(0), 0.0, 64, 1.0,
                 {"aid": jnp.asarray([1], jnp.int32), "banks": banks})
    want = [int(t) for t in np.asarray(out)[0] if int(t) != -7]
    assert lora_out == want


def test_validation_errors():
    async def run():
        plain = ContinuousBatcher(PARAMS, CFG, slots=2, prompt_pad=16,
                                  horizon=32, chunk=2)
        with pytest.raises(ValueError, match="sampling_ext"):
            await plain.submit([40, 41], presence=0.5)
        with pytest.raises(RuntimeError, match="sampling_ext"):
            plain.register_constraint(CON)
        ext = _ext_batcher()
        with pytest.raises(ValueError, match="constraint_id"):
            await ext.submit([40, 41], constraint_id=3)
        with pytest.raises(ValueError, match="logit_bias"):
            await ext.submit([40, 41], logit_bias=np.zeros(7, np.float32))

    asyncio.run(run())
    # spec_k + sampling_ext compose since r3 (_decode_chunk_spec_ext)
    ContinuousBatcher(PARAMS, CFG, slots=2, prompt_pad=16, horizon=64,
                      chunk=2, spec_k=2, sampling_ext=True)


def test_local_llm_routes_ext_through_batcher():
    """LocalLLM.chat with a response schema / penalties rides the ext
    batcher (no solo fallback) and still emits schema-valid JSON."""
    from rag_application_tpu.llm.local import LocalLLM
    from rag_application_tpu.llm.router import ChatMessage

    llm = LocalLLM(PARAMS, CFG, ByteTok(), eos_id=EOS)
    llm.enable_batching(slots=2, prompt_pad=512, horizon=256, chunk=4,
                        sampling_ext=True)

    async def run():
        r1, r2 = await asyncio.gather(
            llm.chat([ChatMessage("user", "emit")],
                     response_schema=SCHEMA, max_tokens=120),
            llm.chat([ChatMessage("user", "hello")], max_tokens=8,
                     presence_penalty=0.5),
        )
        return r1, r2

    r1, r2 = asyncio.run(run())
    doc = json.loads(r1.content)
    assert set(doc) == {"name", "count", "kind"}
    assert r2.content is not None
    b = llm._batcher
    assert b.steps > 0
    assert sum(c is not None for c in b._cslots) == 1


def test_constraint_bank_lru_and_memoization():
    """The constraint bank is capped: re-registering the same grammar
    is O(1) memoized, novel grammars beyond max_constraints LRU-evict a
    free slot (stable bank shape — no growth), and an evicted grammar
    re-registers into a reused slot. Outputs stay solo-identical
    through the churn."""
    rng = np.random.default_rng(5)
    prompts = _prompts(3, rng)
    other = compile_schema({"enum": ["x", "yz"]}, ByteTok(),
                           CFG.vocab_size)
    third = compile_schema({"type": "boolean"}, ByteTok(),
                           CFG.vocab_size)

    async def run():
        b = _ext_batcher(max_constraints=2)
        cid1 = b.register_constraint(CON)
        assert b.register_constraint(CON) == cid1  # memoized
        cid2 = b.register_constraint(other)
        assert {cid1, cid2} == {1, 2}
        shape_before = np.asarray(b._cbanks["table"]).shape
        # bank full + nothing pinned: third evicts the LRU slot (cid1)
        cid3 = b.register_constraint(third)
        assert cid3 == cid1
        assert np.asarray(b._cbanks["table"]).shape == shape_before
        # CON was evicted: its old id now maps to `third`; re-register
        cid1b = b.register_constraint(CON)  # evicts cid2 (now LRU)
        assert cid1b == cid2
        out = await b.submit(prompts[0], max_new=120, eos_id=EOS,
                             constraint_id=cid1b)
        return b, out

    b, out = asyncio.run(run())
    assert out == _solo(prompts[0], 120, 16, eos_id=EOS, constraint=CON)
    json.loads(ByteTok().decode(out))


def test_constraint_bank_full_of_pinned_slots_raises():
    """Every slot pinned by live/pending requests -> register raises
    (LocalLLM then falls back to the solo constrained path)."""
    rng = np.random.default_rng(6)
    prompts = _prompts(2, rng)
    other = compile_schema({"enum": ["x", "yz"]}, ByteTok(),
                           CFG.vocab_size)
    third = compile_schema({"type": "boolean"}, ByteTok(),
                           CFG.vocab_size)

    async def run():
        b = _ext_batcher(max_constraints=2)
        cid1 = b.register_constraint(CON)
        cid2 = b.register_constraint(other)
        t1 = asyncio.ensure_future(b.submit(
            prompts[0], max_new=120, eos_id=EOS, constraint_id=cid1))
        t2 = asyncio.ensure_future(b.submit(
            prompts[1], max_new=120, eos_id=EOS, constraint_id=cid2))
        await asyncio.sleep(0)  # both submissions pin their slots
        with pytest.raises(ValueError, match="pinned"):
            b.register_constraint(third)
        outs = await asyncio.gather(t1, t2)
        # pins released after completion: registration succeeds now
        cid3 = b.register_constraint(third)
        assert cid3 in (1, 2)
        return outs

    outs = asyncio.run(run())
    assert outs[0] == _solo(prompts[0], 120, 16, eos_id=EOS, constraint=CON)


def test_constrained_through_speculative_batcher_matches_solo():
    """VERDICT r2 item 5: spec_k>0 composes with sampling_ext — the
    verify block masks every position with the evolved DFA/penalty
    state (_decode_chunk_spec_ext), so a constrained request keeps the
    speculative speedup while staying greedy-identical to solo. The
    JSON grammar makes drafts agree often (quoted keys repeat), so
    tokens/step must exceed 1 for the constrained request."""
    rng = np.random.default_rng(7)
    prompts = _prompts(3, rng)

    async def run():
        b = _ext_batcher(spec_k=4, horizon=640)
        cid = b.register_constraint(CON)
        outs = await asyncio.gather(
            b.submit(prompts[0], max_new=120, eos_id=EOS,
                     constraint_id=cid),
            b.submit(prompts[1], max_new=24),
            b.submit(prompts[2], max_new=24, presence=0.7, frequency=1.3),
        )
        return b, outs

    b, (con, plain, pen) = asyncio.run(run())
    want = _solo(prompts[0], 120, 16, eos_id=EOS, constraint=CON)
    assert con == want
    doc = json.loads(ByteTok().decode(con))
    assert set(doc) == {"name", "count", "kind"}
    assert plain == _solo(prompts[1], 24, 16)
    assert pen == _solo(prompts[2], 24, 16, presence=0.7, frequency=1.3)
    # speculation must actually engage: >1 token per block step
    assert b.tokens_out / max(b.steps, 1) > 1.0, (
        b.tokens_out, b.steps)


def test_spec_ext_row_reuse_and_eos_latch():
    """Rows recycled between constrained spec requests must not leak
    DFA state or counts (re-admission reseeds them)."""
    rng = np.random.default_rng(8)
    prompts = _prompts(4, rng)

    async def run():
        b = _ext_batcher(slots=2, spec_k=2, horizon=640)
        cid = b.register_constraint(CON)
        first = await asyncio.gather(
            b.submit(prompts[0], max_new=120, eos_id=EOS,
                     constraint_id=cid),
            b.submit(prompts[1], max_new=6),
        )
        second = await asyncio.gather(
            b.submit(prompts[2], max_new=120, eos_id=EOS,
                     constraint_id=cid),
            b.submit(prompts[3], max_new=8),
        )
        return first, second

    first, second = asyncio.run(run())
    assert first[0] == _solo(prompts[0], 120, 16, eos_id=EOS,
                             constraint=CON)
    assert second[0] == _solo(prompts[2], 120, 16, eos_id=EOS,
                              constraint=CON)
    assert second[1] == _solo(prompts[3], 8, 16)
