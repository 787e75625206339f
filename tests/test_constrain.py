"""Grammar-constrained decoding (models/constrain.py + decoder wiring).

Parity+: the reference only gets schema-valid output from providers
with server-side structured output (OpenAI); its local path re-prompts
and retries (app/services/agents/*). Here validity is enforced by a
token-level DFA inside the fused loop — even a RANDOM-INIT model emits
parseable, schema-conforming JSON.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_application_tpu.models.constrain import (
    Constraint,
    compile_regex,
    compile_schema,
    host_accepts,
    lift_to_tokens,
    schema_to_regex,
    token_bytes,
)
from rag_application_tpu.models.decoder import (
    DecoderConfig,
    generate,
    init_decoder_params,
)


def _accepts(schema, text: str) -> bool:
    trans, acc = compile_regex(schema_to_regex(schema))
    return host_accepts(trans, acc, text.encode("utf-8"))


def test_primitive_grammars():
    assert _accepts({"type": "integer"}, "0")
    assert _accepts({"type": "integer"}, "-120")
    assert not _accepts({"type": "integer"}, "01")
    assert not _accepts({"type": "integer"}, "")
    assert not _accepts({"type": "integer"}, "1.5")
    assert _accepts({"type": "number"}, "3.25")
    assert _accepts({"type": "number"}, "-1e-9")
    assert not _accepts({"type": "number"}, "1.")
    assert _accepts({"type": "boolean"}, "true")
    assert not _accepts({"type": "boolean"}, "True")
    assert _accepts({"type": "null"}, "null")
    assert _accepts({"type": "string"}, '"hi there"')
    assert _accepts({"type": "string"}, '"esc \\" \\n \\u00e9"')
    assert not _accepts({"type": "string"}, '"unterminated')
    assert not _accepts({"type": "string"}, '"raw " quote"')
    assert _accepts({"enum": ["a", "bb"]}, '"bb"')
    assert not _accepts({"enum": ["a", "bb"]}, '"c"')


def test_bounded_string_and_arrays():
    sch = {"type": "string", "minLength": 2, "maxLength": 4}
    assert not _accepts(sch, '"a"')
    assert _accepts(sch, '"ab"')
    assert _accepts(sch, '"abcd"')
    assert not _accepts(sch, '"abcde"')
    arr = {"type": "array", "items": {"type": "integer"}}
    assert _accepts(arr, "[]")
    assert _accepts(arr, "[1]")
    assert _accepts(arr, "[1,2,-3]")
    assert not _accepts(arr, "[1,]")
    arr1 = {"type": "array", "items": {"type": "boolean"}, "minItems": 1}
    assert not _accepts(arr1, "[]")
    assert _accepts(arr1, "[true,false]")


def test_object_grammar_canonical():
    sch = {"type": "object", "properties": {
        "name": {"type": "string", "maxLength": 8},
        "age": {"type": "integer"},
        "tags": {"type": "array", "items": {"enum": ["x", "y"]}},
        "ok": {"type": "boolean"},
    }}
    good = '{"name":"ada","age":36,"tags":["x","y"],"ok":true}'
    assert _accepts(sch, good)
    assert json.loads(good)  # the canonical form IS valid JSON
    assert not _accepts(sch, '{"age":36,"name":"ada","tags":[],"ok":true}')
    assert not _accepts(sch, '{"name":"ada","age":36,"tags":[],"ok":1}')
    assert not _accepts(sch, '{"name": "ada","age":36,"tags":[],"ok":true}')


def test_unsupported_schema_raises():
    with pytest.raises(ValueError):
        schema_to_regex({"type": "object"})  # no properties
    with pytest.raises(ValueError):
        schema_to_regex({"anyOf": [{"type": "string"}]})


class ByteTok:
    """Toy tokenizer: id i decodes to chr(i) for printable ASCII."""

    def decode(self, ids):
        return "".join(chr(i) if 32 <= i < 127 else "\x00" for i in ids)

    def encode(self, text):
        return [ord(c) if 32 <= ord(c) < 127 else 1 for c in text]


SCHEMA = {"type": "object", "properties": {
    "name": {"type": "string", "minLength": 1, "maxLength": 6},
    # digit-bounded so even a GREEDY constrained decode must terminate
    # (an unbounded integer lets argmax loop on its favorite digit)
    "count": {"type": "integer", "minimum": 0, "maximum": 99999},
    "kind": {"enum": ["alpha", "beta"]},
}}


def test_token_lift_matches_host_dfa():
    """table[s, v] must equal running the byte DFA over v's bytes."""
    trans, acc = compile_regex(schema_to_regex(SCHEMA))
    tb, tl = token_bytes(ByteTok(), 160)
    table = lift_to_tokens(trans, acc, tb, tl)
    rng = np.random.default_rng(0)
    for s in rng.integers(0, trans.shape[0], 40):
        for v in rng.integers(32, 127, 40):
            st = int(s)
            for b in bytes([v]):
                st = int(trans[st, b]) if st >= 0 else -1
            assert table[s, v] == st


def test_random_model_emits_valid_json():
    """The flagship property: a RANDOM-INIT decoder, sampled at
    temperature 1, emits output that json-parses and conforms to the
    schema — on every seed — because the DFA masks the logits and eos
    is only reachable in accepting states."""
    cfg = DecoderConfig(vocab_size=160, hidden=32, num_layers=2, heads=4,
                        kv_heads=2, mlp_dim=64, max_len=144,
                        dtype="float32")
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    con = compile_schema(SCHEMA, ByteTok(), cfg.vocab_size).as_device()
    eos = 158  # outside the grammar: only the accept-state mask allows it
    prompt = jnp.asarray([[65, 66, 67, 68]], jnp.int32)
    plen = jnp.asarray([4], jnp.int32)
    for seed in range(6):
        # max_new covers the longest sentence the bounded grammar admits
        # (escaped \uXXXX name chars are the worst case)
        out, n = generate(params, cfg, prompt, plen, 120, eos, 0,
                          jax.random.PRNGKey(seed), 1.0, 32, 0.95,
                          None, 0.0, 0.0, con)
        ids = [int(t) for t in np.asarray(out)[0] if int(t) not in (0, eos)]
        text = ByteTok().decode(ids)
        doc = json.loads(text)  # must parse
        assert set(doc) == {"name", "count", "kind"}
        assert isinstance(doc["name"], str) and 1 <= len(doc["name"]) <= 6
        assert isinstance(doc["count"], int)
        assert doc["kind"] in ("alpha", "beta")


def test_greedy_constrained_matches_dfa():
    """Greedy decoding under the constraint also stays in-grammar."""
    cfg = DecoderConfig(vocab_size=160, hidden=32, num_layers=2, heads=4,
                        kv_heads=2, mlp_dim=64, max_len=144,
                        dtype="float32")
    params = init_decoder_params(jax.random.PRNGKey(5), cfg)
    con = compile_schema(SCHEMA, ByteTok(), cfg.vocab_size).as_device()
    out, _ = generate(params, cfg, jnp.asarray([[70, 71]], jnp.int32),
                      jnp.asarray([2], jnp.int32), 120, 158, 0,
                      jax.random.PRNGKey(0), 0.0, 32, 1.0,
                      None, 0.0, 0.0, con)
    ids = [int(t) for t in np.asarray(out)[0] if int(t) not in (0, 158)]
    json.loads(ByteTok().decode(ids))


def test_incapable_vocab_refused():
    """A vocabulary that cannot express the grammar is rejected up
    front (never a mid-decode dead end)."""

    class NoBrace:
        def decode(self, ids):
            return "".join(
                chr(i) if 32 <= i < 127 and chr(i) != "{" else "\x00"
                for i in ids)

    with pytest.raises(ValueError, match="cannot realize"):
        compile_schema(SCHEMA, NoBrace(), 160)


def test_local_llm_structured_output_is_valid():
    """LocalLLM.chat(response_schema=...) returns text that parses and
    conforms — from a random model — via the compiled constraint."""
    import asyncio

    from rag_application_tpu.llm.local import LocalLLM
    from rag_application_tpu.llm.router import ChatMessage

    # max_len must cover the rendered prompt (chat appends the schema
    # as an instruction — ~250 ByteTok chars) PLUS the bounded response
    cfg = DecoderConfig(vocab_size=160, hidden=32, num_layers=2, heads=4,
                        kv_heads=2, mlp_dim=64, max_len=512,
                        dtype="float32")
    params = init_decoder_params(jax.random.PRNGKey(1), cfg)
    local = LocalLLM(params, cfg, ByteTok(), eos_id=158)
    r = asyncio.run(local.chat(
        [ChatMessage("user", "emit the record")],
        response_schema=SCHEMA, max_tokens=120, temperature=1.0))
    doc = json.loads(r.content)
    assert set(doc) == {"name", "count", "kind"}


def test_hf_bytelevel_bpe_token_bytes():
    """A REAL HF fast tokenizer (byte-level BPE built in-process):
    token_bytes must invert the byte->unicode remap, because
    decode([v]) does NOT return the in-context contribution. Then a
    constrained generate through it yields valid JSON."""
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast
    from transformers.models.gpt2.tokenization_gpt2 import bytes_to_unicode

    b2u = bytes_to_unicode()
    vocab = {ch: i for i, ch in enumerate(b2u.values())}
    # a few multi-char merges to exercise multi-byte token lifting
    extra = ['{"', '":', 'true', 'false']
    merges = [('{', '"'), ('"', ':'),
              ('t', 'r'), ('tr', 'u'), ('tru', 'e'),
              ('f', 'a'), ('fa', 'l'), ('fal', 's'), ('fals', 'e')]
    for m in ['tr', 'tru', 'fa', 'fal', 'fals'] + extra:
        vocab[m] = len(vocab)
    raw = Tokenizer(models.BPE(vocab=vocab,
                               merges=[(a, b) for a, b in merges]))
    raw.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    raw.decoder = decoders.ByteLevel()
    hf = PreTrainedTokenizerFast(tokenizer_object=raw)
    V = len(vocab)

    tb, tl = token_bytes(hf, V)
    def tok_bytes(s):
        i = vocab[s]
        return bytes(tb[i, :tl[i]])
    assert tok_bytes('{"') == b'{"'
    assert tok_bytes('true') == b'true'
    assert tok_bytes(b2u[ord(' ')]) == b' '    # remapped space byte
    assert tok_bytes(b2u[ord('"')]) == b'"'

    sch = {"type": "object", "properties": {
        "ok": {"type": "boolean"},
        "n": {"type": "integer", "minimum": 0, "maximum": 99},
    }}
    con = compile_schema(sch, hf, V).as_device()
    cfg = DecoderConfig(vocab_size=V, hidden=32, num_layers=2, heads=4,
                        kv_heads=2, mlp_dim=64, max_len=64,
                        dtype="float32")
    params = init_decoder_params(jax.random.PRNGKey(3), cfg)
    # eos/pad must be tokens the grammar can never emit — the ids of
    # CONTROL-byte tokens (bytes_to_unicode orders printables first, so
    # small ids are real glyphs like '"'; a grammar-reachable eos would
    # end the row mid-sentence when legitimately sampled).
    eos, pad = vocab[b2u[0]], vocab[b2u[1]]
    out, _ = generate(params, cfg, jnp.asarray([[5, 6, 7]], jnp.int32),
                      jnp.asarray([3], jnp.int32), 40, eos, pad,
                      jax.random.PRNGKey(2), 1.0, 16, 0.9,
                      None, 0.0, 0.0, con)
    ids = []
    for t in np.asarray(out)[0]:
        if int(t) == eos:
            break
        if int(t) != pad:
            ids.append(int(t))
    doc = json.loads(hf.decode(ids))
    assert set(doc) == {"ok", "n"}
    assert isinstance(doc["ok"], bool) and isinstance(doc["n"], int)


def test_sentencepiece_style_pieces():
    """The '▁'-marker and <0xNN> byte-fallback branch."""

    class SPLike:
        all_special_ids = [0]

        def convert_ids_to_tokens(self, v):
            table = {0: "<s>", 1: "▁hello", 2: "world", 3: "<0x7B>",
                     4: "▁"}
            return table.get(v, "x")

    tb, tl = token_bytes(SPLike(), 5)
    got = [bytes(tb[i, :tl[i]]) for i in range(5)]
    assert got[0] == b"\x00"        # special: never valid
    assert got[1] == b" hello"
    assert got[2] == b"world"
    assert got[3] == b"{"           # byte fallback
    assert got[4] == b" "
