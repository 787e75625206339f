"""TPU-native causal LM: parity vs transformers Llama + generation
semantics + TP sharding.

Reference behavior matched: HF local text generation
(app/core/models/huggingface/huggingface.py:17-22,195-260).
"""

import asyncio

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_application_tpu.models.decoder import (
    DecoderConfig,
    convert_hf_llama_state_dict,
    decode_step,
    generate,
    init_decoder_params,
    init_kv_cache,
    prefill,
)

CFG = DecoderConfig(vocab_size=256, hidden=64, num_layers=3, heads=4,
                    kv_heads=2, mlp_dim=128, max_len=32, dtype="float32")


@pytest.fixture(scope="module")
def hf_pair():
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf_cfg = LlamaConfig(
        vocab_size=CFG.vocab_size, hidden_size=CFG.hidden,
        intermediate_size=CFG.mlp_dim, num_hidden_layers=CFG.num_layers,
        num_attention_heads=CFG.heads, num_key_value_heads=CFG.kv_heads,
        max_position_embeddings=64, rms_norm_eps=CFG.eps,
        rope_theta=CFG.rope_theta, tie_word_embeddings=False,
        attention_dropout=0.0)
    hf = LlamaForCausalLM(hf_cfg).eval()
    return hf, convert_hf_llama_state_dict(hf.state_dict(), CFG)


def _prompt(rng, b, t):
    return rng.integers(0, CFG.vocab_size, (b, t)).astype(np.int32)


def test_prefill_and_decode_match_hf_logits(hf_pair):
    """Prefill last-token logits and every incremental decode step equal
    the HF full-sequence forward (GQA + RoPE + RMSNorm all exact)."""
    import torch

    hf, params = hf_pair
    rng = np.random.default_rng(0)
    B, T = 2, 10
    ids = _prompt(rng, B, T)
    extra = _prompt(rng, B, 4)
    full = np.concatenate([ids, extra], axis=1)
    with torch.no_grad():
        ref = hf(torch.tensor(full.astype(np.int64))).logits.numpy()

    ck, cv = init_kv_cache(CFG, B)
    logits, ck, cv = prefill(params, CFG, jnp.asarray(ids),
                             jnp.asarray([T, T]), ck, cv)
    np.testing.assert_allclose(np.asarray(logits), ref[:, T - 1],
                               atol=2e-4, rtol=1e-4)
    pos = jnp.asarray([T, T])
    for j in range(extra.shape[1]):
        logits, ck, cv = decode_step(params, CFG, jnp.asarray(extra[:, j]),
                                     pos, pos[0], ck, cv)
        np.testing.assert_allclose(np.asarray(logits), ref[:, T + j],
                                   atol=2e-4, rtol=1e-4)
        pos = pos + 1


def test_greedy_generate_matches_hf(hf_pair):
    import torch

    hf, params = hf_pair
    ids = _prompt(np.random.default_rng(1), 2, 8)
    ref = hf.generate(torch.tensor(ids.astype(np.int64)), max_new_tokens=6,
                      do_sample=False, eos_token_id=None, pad_token_id=0)
    out, n = generate(params, CFG, jnp.asarray(ids), jnp.asarray([8, 8]),
                      6, 255, 0, jax.random.PRNGKey(0), 0.0)
    assert (np.asarray(out) == ref.numpy()[:, 8:]).all()
    assert (np.asarray(n) == 6).all()


def test_ragged_batch_matches_single_row(hf_pair):
    """Per-row prompt lengths: a short row padded inside a batch decodes
    exactly what it decodes alone (pad-slot cache garbage is never
    attended)."""
    _, params = hf_pair
    ids = _prompt(np.random.default_rng(2), 2, 10)
    plen = np.asarray([10, 6], np.int32)
    out, _ = generate(params, CFG, jnp.asarray(ids), jnp.asarray(plen),
                      5, 255, 0, jax.random.PRNGKey(0), 0.0)
    solo, _ = generate(params, CFG, jnp.asarray(ids[1:2, :6]),
                       jnp.asarray(plen[1:]), 5, 255, 0,
                       jax.random.PRNGKey(0), 0.0)
    assert (np.asarray(out)[1] == np.asarray(solo)[0]).all()


def test_eos_stops_row_and_pads_rest(hf_pair):
    _, params = hf_pair
    ids = _prompt(np.random.default_rng(3), 1, 8)
    ref, _ = generate(params, CFG, jnp.asarray(ids), jnp.asarray([8]),
                      6, 255, 0, jax.random.PRNGKey(0), 0.0)
    first = int(np.asarray(ref)[0, 0])
    out, n = generate(params, CFG, jnp.asarray(ids), jnp.asarray([8]),
                      6, first, 0, jax.random.PRNGKey(0), 0.0)
    out = np.asarray(out)[0]
    assert out[0] == first and (out[1:] == 0).all()
    assert int(np.asarray(n)[0]) == 1


def test_sampling_seeded_and_bounded(hf_pair):
    """Sampled decode is deterministic per seed, differs across seeds,
    and top-k keeps every token inside the k most likely."""
    _, params = hf_pair
    ids = _prompt(np.random.default_rng(4), 2, 8)
    args = (params, CFG, jnp.asarray(ids), jnp.asarray([8, 8]), 8, 255, 0)
    a, _ = generate(*args, jax.random.PRNGKey(1), 0.8, 4, 0.95)
    b, _ = generate(*args, jax.random.PRNGKey(1), 0.8, 4, 0.95)
    c, _ = generate(*args, jax.random.PRNGKey(2), 0.8, 4, 0.95)
    assert (np.asarray(a) == np.asarray(b)).all()
    assert not (np.asarray(a) == np.asarray(c)).all()

    # verify the top-k constraint against the true next-token ranking
    ck, cv = init_kv_cache(CFG, 2)
    logits, *_ = prefill(params, CFG, jnp.asarray(ids),
                         jnp.asarray([8, 8]), ck, cv)
    top4 = np.argsort(np.asarray(logits), axis=-1)[:, -4:]
    for row in range(2):
        assert int(np.asarray(a)[row, 0]) in top4[row]


def test_random_init_generates():
    """init_decoder_params produces a runnable model (training-from-
    scratch entry point)."""
    params = init_decoder_params(jax.random.PRNGKey(0), CFG)
    ids = _prompt(np.random.default_rng(5), 1, 4)
    out, n = generate(params, CFG, jnp.asarray(ids), jnp.asarray([4]),
                      4, 255, 0, jax.random.PRNGKey(0), 1.0, 16, 0.9)
    assert np.asarray(out).shape == (1, 4)


def test_quantized_weights_int8_and_logits_close(hf_pair):
    """Weight-only int8: every matmul weight is stored int8 with a
    per-output-channel scale; quantized logits track bf16-exact logits
    and greedy generation agrees on a short horizon."""
    from rag_application_tpu.models.decoder import quantize_decoder_params

    _, params = hf_pair
    qp = quantize_decoder_params(params)
    for name in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
                 "tok_emb", "lm_head"):
        assert qp[name]["q"].dtype == jnp.int8
        # scales are per output channel (one per column/row), not global
        assert qp[name]["s"].shape[-1] == (
            params[name].shape[-1] if name != "tok_emb"
            else params[name].shape[0])
    for name in ("attn_norm", "ffn_norm", "final_norm"):
        assert not isinstance(qp[name], dict)

    ids = _prompt(np.random.default_rng(7), 2, 10)
    plen = jnp.asarray([10, 10])

    def last_logits(p):
        ck, cv = init_kv_cache(CFG, 2)
        return prefill(p, CFG, jnp.asarray(ids), plen, ck, cv)[0]

    base = np.asarray(last_logits(params))
    quant = np.asarray(last_logits(qp))
    # int8 error bound: correlation stays near 1 on the logit vector
    corr = np.corrcoef(base.ravel(), quant.ravel())[0, 1]
    assert corr > 0.999, corr

    out_b, _ = generate(params, CFG, jnp.asarray(ids), plen, 4, 255, 0,
                        jax.random.PRNGKey(0), 0.0)
    out_q, _ = generate(qp, CFG, jnp.asarray(ids), plen, 4, 255, 0,
                        jax.random.PRNGKey(0), 0.0)
    agree = (np.asarray(out_b) == np.asarray(out_q)).mean()
    assert agree >= 0.75, agree


def test_quantized_grid_weights_are_exact():
    """Weights already on an int8 grid round-trip exactly: quantized
    forward == full-precision forward bit-for-bit (scale commutes past
    the contraction)."""
    from rag_application_tpu.models.decoder import quantize_decoder_params

    params = init_decoder_params(jax.random.PRNGKey(1), CFG)
    # snap every quantizable weight onto its own int8 grid
    snapped = {}
    for name, w in params.items():
        if name in ("attn_norm", "ffn_norm", "final_norm"):
            snapped[name] = w
            continue
        axis = -1 if name == "tok_emb" else -2
        s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axis,
                    keepdims=True) / 127.0
        snapped[name] = (jnp.round(w.astype(jnp.float32) / s) * s).astype(
            jnp.float32)
    qp = quantize_decoder_params(snapped)
    ids = _prompt(np.random.default_rng(8), 1, 6)

    def last_logits(p):
        ck, cv = init_kv_cache(CFG, 1)
        return prefill(p, CFG, jnp.asarray(ids), jnp.asarray([6]),
                       ck, cv)[0]

    np.testing.assert_allclose(np.asarray(last_logits(qp)),
                               np.asarray(last_logits(snapped)),
                               atol=1e-5, rtol=1e-5)


def test_score_continuations_matches_hf(hf_pair):
    """Choice scoring: summed continuation log-probs equal the HF
    full-forward oracle for ragged candidates in one batched call."""
    import torch

    from rag_application_tpu.models.decoder import score_continuations

    hf, params = hf_pair
    rng = np.random.default_rng(13)
    prompt = rng.integers(0, CFG.vocab_size, (6,)).astype(np.int32)
    choices = [rng.integers(0, CFG.vocab_size, (k,)).astype(np.int32)
               for k in (3, 5, 2)]
    T = 16
    ids = np.zeros((len(choices), T), np.int32)
    tlen = []
    for i, c in enumerate(choices):
        row = np.concatenate([prompt, c])
        ids[i, :len(row)] = row
        tlen.append(len(row))
    got = np.asarray(score_continuations(
        params, CFG, jnp.asarray(ids),
        jnp.asarray([6] * len(choices), np.int32),
        jnp.asarray(tlen, np.int32)))
    for i, c in enumerate(choices):
        row = np.concatenate([prompt, c])[None].astype(np.int64)
        with torch.no_grad():
            lg = hf(torch.tensor(row)).logits.log_softmax(-1).numpy()[0]
        want = sum(lg[j, row[0, j + 1]] for j in range(5, 5 + len(c)))
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=3e-4)


def test_local_llm_choose_text():
    """choose_text always returns one of the options and prefers the
    higher-likelihood one (checked against per-option scoring)."""
    local = _make_local()
    from rag_application_tpu.llm.router import ChatMessage

    msgs = [ChatMessage("user", "how is the weather")]
    options = ["sunny", "fine today", "hello world"]
    out = local.choose_text(msgs, options)
    assert out in options
    prompt = local.render(msgs)
    enc = [local.tokenizer.encode(o) for o in options]
    enc = [e[:-1] if e and e[-1] == local.eos_id else e for e in enc]
    idx, scores = local.choose(prompt, enc)
    assert options[idx] == out
    assert scores[idx] == max(scores)


def test_generate_logprobs_match_hf(hf_pair):
    """Each emitted token's reported log-prob equals the HF forward's
    log-softmax at that position (raw model law, greedy decode)."""
    import torch

    from rag_application_tpu.models.decoder import generate_logprobs

    hf, params = hf_pair
    ids = _prompt(np.random.default_rng(14), 1, 8)
    out, n, lps = generate_logprobs(params, CFG, jnp.asarray(ids),
                                    jnp.asarray([8]), 5, 255, 0,
                                    jax.random.PRNGKey(0), 0.0)
    out, lps = np.asarray(out)[0], np.asarray(lps)[0]
    full = np.concatenate([ids[0], out]).astype(np.int64)
    with torch.no_grad():
        lg = hf(torch.tensor(full[None])).logits.log_softmax(-1).numpy()[0]
    for j in range(5):
        want = lg[8 + j - 1, out[j]]
        np.testing.assert_allclose(lps[j], want, rtol=1e-4, atol=2e-4)


def test_local_llm_chat_logprobs():
    """logprobs=true on the local provider returns OpenAI-style
    per-token entries aligned with the completion."""
    local = _make_local()

    from rag_application_tpu.llm.router import ChatMessage

    async def main():
        return await local.chat([ChatMessage("user", "hello world")],
                                max_tokens=6, temperature=0.0,
                                logprobs=True)

    resp = asyncio.run(main())
    assert resp.logprobs is not None and len(resp.logprobs) >= 1
    assert all(isinstance(e["logprob"], float) and e["logprob"] <= 0.0
               for e in resp.logprobs)
    assert resp.usage["completion_tokens"] == len(resp.logprobs)


def test_structured_enum_routes_through_choice_scoring():
    """generate_structured with a top-level enum on the local provider
    returns a GUARANTEED-valid option via exact scoring (no retries)."""
    from rag_application_tpu.llm.router import LLMRouter, Provider

    local = _make_local()
    router = LLMRouter(Provider.LOCAL, model="tiny-local", local=local)

    async def main():
        return await router.generate_structured(
            "how is the weather today",
            {"enum": ["sunny", "fine", "hello world"]})

    out = asyncio.run(main())
    assert out in ("sunny", "fine", "hello world")


def test_qwen2_logits_parity():
    """Qwen2-family checkpoints (q/k/v projection biases, GQA, tied or
    untied head) convert through the same loader; prefill + decode
    logits match the HF forward."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(1)
    cfg = DecoderConfig(vocab_size=256, hidden=64, num_layers=2, heads=4,
                        kv_heads=2, mlp_dim=128, max_len=32,
                        rope_theta=1e6, dtype="float32")
    hf = Qwen2ForCausalLM(Qwen2Config(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden,
        intermediate_size=cfg.mlp_dim, num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.heads, num_key_value_heads=cfg.kv_heads,
        max_position_embeddings=64, rms_norm_eps=cfg.eps,
        rope_theta=cfg.rope_theta, tie_word_embeddings=False,
        attention_dropout=0.0)).eval()
    params = convert_hf_llama_state_dict(hf.state_dict(), cfg)
    assert "bq" in params and params["bq"].shape == (2, 64)

    rng = np.random.default_rng(11)
    B, T = 2, 9
    ids = rng.integers(0, cfg.vocab_size, (B, T)).astype(np.int32)
    extra = rng.integers(0, cfg.vocab_size, (B, 3)).astype(np.int32)
    full = np.concatenate([ids, extra], axis=1)
    with torch.no_grad():
        ref = hf(torch.tensor(full.astype(np.int64))).logits.numpy()

    ck, cv = init_kv_cache(cfg, B)
    logits, ck, cv = prefill(params, cfg, jnp.asarray(ids),
                             jnp.asarray([T, T]), ck, cv)
    np.testing.assert_allclose(np.asarray(logits), ref[:, T - 1],
                               atol=2e-4, rtol=1e-4)
    pos = jnp.asarray([T, T])
    for j in range(extra.shape[1]):
        logits, ck, cv = decode_step(params, cfg, jnp.asarray(extra[:, j]),
                                     pos, pos[0], ck, cv)
        np.testing.assert_allclose(np.asarray(logits), ref[:, T + j],
                                   atol=2e-4, rtol=1e-4)
        pos = pos + 1


def test_llama3_rope_scaling_parity():
    """rope_scaling {rope_type: llama3}: frequency-banded scaling (the
    Llama-3.x long-context recipe) matches the HF forward exactly."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(2)
    cfg = DecoderConfig(vocab_size=128, hidden=64, num_layers=2, heads=4,
                        kv_heads=2, mlp_dim=96, max_len=64,
                        rope_theta=10000.0, rope_kind="llama3",
                        rope_factor=8.0, rope_low_freq_factor=1.0,
                        rope_high_freq_factor=4.0,
                        rope_original_max_len=32, dtype="float32")
    hf = LlamaForCausalLM(LlamaConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden,
        intermediate_size=cfg.mlp_dim, num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.heads, num_key_value_heads=cfg.kv_heads,
        max_position_embeddings=64, rms_norm_eps=cfg.eps,
        rope_theta=cfg.rope_theta, tie_word_embeddings=False,
        attention_dropout=0.0,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 32})).eval()
    params = convert_hf_llama_state_dict(hf.state_dict(), cfg)
    rng = np.random.default_rng(12)
    B, T = 2, 40  # past original_max so the scaled band matters
    ids = rng.integers(0, cfg.vocab_size, (B, T)).astype(np.int32)
    with torch.no_grad():
        ref = hf(torch.tensor(ids.astype(np.int64))).logits.numpy()
    ck, cv = init_kv_cache(cfg, B)
    logits, *_ = prefill(params, cfg, jnp.asarray(ids),
                         jnp.asarray([T, T]), ck, cv)
    np.testing.assert_allclose(np.asarray(logits), ref[:, T - 1],
                               atol=2e-4, rtol=1e-4)


def test_kv_quant_cache_logits_close(hf_pair):
    """int8 KV cache: prefill + incremental decode logits stay within
    quantization noise of the f32-cache run (the per-slot scales commute
    past both attention contractions, so dequantized K/V never exist)."""
    from dataclasses import replace

    _, params = hf_pair
    qcfg = replace(CFG, kv_quant=True)
    rng = np.random.default_rng(7)
    B, T = 2, 10
    ids = _prompt(rng, B, T)
    plen = jnp.asarray([T, T])

    ck, cv = init_kv_cache(CFG, B)
    ref, ck, cv = prefill(params, CFG, jnp.asarray(ids), plen, ck, cv)
    qck, qcv = init_kv_cache(qcfg, B)
    assert qck["q"].dtype == jnp.int8 and qck["s"].dtype == jnp.float32
    got, qck, qcv = prefill(params, qcfg, jnp.asarray(ids), plen, qck, qcv)
    tol = 0.03 * float(np.max(np.abs(np.asarray(ref))))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=tol)

    extra = _prompt(rng, B, 3)
    pos = jnp.asarray([T, T])
    for j in range(extra.shape[1]):
        step = jnp.asarray(extra[:, j])
        ref, ck, cv = decode_step(params, CFG, step, pos, pos[0], ck, cv)
        got, qck, qcv = decode_step(params, qcfg, step, pos, pos[0],
                                    qck, qcv)
        tol = 0.05 * float(np.max(np.abs(np.asarray(ref))))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=tol)
        pos = pos + 1


def test_kv_quant_generate_deterministic_and_valid(hf_pair):
    """Fused generate with the int8 cache: greedy decode is seeded-
    deterministic, emits in-vocab ids, and ragged-batch isolation holds
    (a padded short row equals its solo run under the SAME cache repr)."""
    from dataclasses import replace

    _, params = hf_pair
    qcfg = replace(CFG, kv_quant=True)
    ids = _prompt(np.random.default_rng(9), 2, 10)
    plen = jnp.asarray(np.asarray([10, 6], np.int32))
    out1, n1 = generate(params, qcfg, jnp.asarray(ids), plen, 5, 255, 0,
                        jax.random.PRNGKey(0), 0.0)
    out2, _ = generate(params, qcfg, jnp.asarray(ids), plen, 5, 255, 0,
                       jax.random.PRNGKey(0), 0.0)
    assert (np.asarray(out1) == np.asarray(out2)).all()
    assert ((np.asarray(out1) >= 0) & (np.asarray(out1) < CFG.vocab_size)).all()
    solo, _ = generate(params, qcfg, jnp.asarray(ids[1:2, :6]),
                       jnp.asarray([6]), 5, 255, 0, jax.random.PRNGKey(0),
                       0.0)
    assert (np.asarray(out1)[1] == np.asarray(solo)[0]).all()


def test_tensor_parallel_prefill_equality(hf_pair):
    """Decoder params shard with the generic megatron-style rule
    (parallel/mesh.py param_shardings) over the model axis; sharded
    logits equal single-device logits."""
    from rag_application_tpu.parallel.mesh import make_mesh, param_shardings

    _, params = hf_pair
    mesh = make_mesh(8, model=2)
    shardings = param_shardings(mesh, params)
    sharded = jax.device_put(params, shardings)
    ids = _prompt(np.random.default_rng(6), 2, 10)

    def run(p):
        ck, cv = init_kv_cache(CFG, 2)
        logits, *_ = prefill(p, CFG, jnp.asarray(ids),
                             jnp.asarray([10, 10]), ck, cv)
        return logits

    base = np.asarray(run(params))
    shard = np.asarray(jax.jit(run)(sharded))
    np.testing.assert_allclose(shard, base, atol=2e-4, rtol=1e-4)


# ---------------------------------------------------------------- LocalLLM


def _make_local():
    from rag_application_tpu.llm.local import LocalLLM
    from rag_application_tpu.models.wordpiece import WordPieceTokenizer

    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "system", "user",
             "assistant", ":", "you", "are", "helpful", "hello", "world",
             "how", "is", "the", "weather", "today", "##s", "##ing", "a",
             "answer", "question", "toky", "##o", "fine", "sunny"]
    tok = WordPieceTokenizer.from_vocab_list(words, native=False)
    cfg = DecoderConfig(vocab_size=len(words), hidden=32, num_layers=2,
                        heads=4, kv_heads=2, mlp_dim=64, max_len=48,
                        dtype="float32")
    params = init_decoder_params(jax.random.PRNGKey(7), cfg)
    return LocalLLM(params, cfg, tok, model_name="tiny-local")


def test_local_llm_chat_stream_and_router():
    from rag_application_tpu.llm.router import ChatMessage, LLMRouter, Provider

    local = _make_local()
    router = LLMRouter(Provider.LOCAL, model="tiny-local", local=local)
    msgs = [ChatMessage("system", "you are helpful"),
            ChatMessage("user", "hello how is the weather")]

    async def main():
        resp = await router.chat(msgs, max_tokens=8, temperature=0.0,
                                 unknown_param="dropped")
        assert isinstance(resp.content, str) and resp.content
        assert 0 < resp.usage["completion_tokens"] <= 8
        # streaming concatenates to the same text under the same knobs
        chunks = []
        async for delta in router.stream(msgs, max_tokens=8,
                                        temperature=0.0):
            chunks.append(delta)
        assert "".join(chunks) == resp.content
        # stop sequences truncate
        if len(resp.content.split()) > 1:
            stop_word = resp.content.split()[1]
            r2 = await router.chat(msgs, max_tokens=8, temperature=0.0,
                                   stop=[stop_word])
            assert stop_word not in r2.content
        return resp

    asyncio.run(main())


def test_local_provider_requires_instance():
    from rag_application_tpu.llm.router import LLMRouter, Provider

    with pytest.raises(ValueError, match="LocalLLM"):
        LLMRouter(Provider.LOCAL)


def test_lm_training_overfits_and_generates():
    """Next-token CE training on a repeating pattern: loss collapses and
    greedy generation reproduces the sequence (training + inference
    share one forward)."""
    import optax

    from rag_application_tpu.models.train import make_lm_train_step
    from rag_application_tpu.models.train import TrainState

    cfg = DecoderConfig(vocab_size=32, hidden=32, num_layers=2, heads=4,
                        kv_heads=2, mlp_dim=64, max_len=32, dtype="float32")
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    opt = optax.adamw(5e-3)
    step = jax.jit(make_lm_train_step(cfg, opt))
    state = TrainState(params=params, opt_state=opt.init(params),
                       step=jnp.zeros((), jnp.int32))
    pattern = np.tile([5, 9, 13, 7], 5)[:16]
    batch = {"ids": jnp.asarray(np.tile(pattern, (4, 1)), jnp.int32),
             "mask": jnp.ones((4, 16), bool)}
    state, m0 = step(state, batch)
    for _ in range(120):
        state, m = step(state, batch)
    assert float(m["loss"]) < 0.1 < float(m0["loss"])
    assert float(m["accuracy"]) > 0.95
    out, _ = generate(state.params, cfg,
                      jnp.asarray(pattern[None, :8], jnp.int32),
                      jnp.asarray([8]), 8, 31, 0, jax.random.PRNGKey(0), 0.0)
    assert (np.asarray(out)[0] == pattern[8:]).all()


def test_lm_training_sharded_matches_single_device():
    """DP x TP sharded LM step on the 8-device mesh: one step's loss and
    updated params equal the single-device step."""
    import optax

    from rag_application_tpu.models.train import (
        TrainState,
        make_lm_train_step,
        shard_lm_train_setup,
    )
    from rag_application_tpu.parallel.mesh import make_mesh

    cfg = DecoderConfig(vocab_size=32, hidden=32, num_layers=2, heads=4,
                        kv_heads=2, mlp_dim=64, max_len=32, dtype="float32")
    params = init_decoder_params(jax.random.PRNGKey(1), cfg)
    opt = optax.adamw(1e-3)
    rng = np.random.default_rng(0)
    batch = {"ids": jnp.asarray(rng.integers(0, 32, (8, 16)), jnp.int32),
             "mask": jnp.ones((8, 16), bool)}

    base_state = TrainState(params=params, opt_state=opt.init(params),
                            step=jnp.zeros((), jnp.int32))
    base_state, base_m = jax.jit(make_lm_train_step(cfg, opt))(
        base_state, batch)

    mesh = make_mesh(8, model=2)
    state, step_fn, b_shard = shard_lm_train_setup(mesh, params, cfg, opt)
    sbatch = {k: jax.device_put(v, b_shard) for k, v in batch.items()}
    state, m = step_fn(state, sbatch)
    assert np.isfinite(float(m["loss"]))
    np.testing.assert_allclose(float(m["loss"]), float(base_m["loss"]),
                               atol=1e-5, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(base_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)


def test_decode_unroll_matches_scan_path():
    """The unrolled decode layer loop (static cache views, the serving
    default) computes the same function as the lax.scan path (dynamic
    slices). f32: near-exact on hidden + caches; generate: identical
    token ids for both kv_quant settings."""
    import dataclasses

    from rag_application_tpu.models.decoder import forward

    for kvq in (False, True):
        cfg_u = dataclasses.replace(CFG, kv_quant=kvq, decode_unroll=True)
        cfg_s = dataclasses.replace(cfg_u, decode_unroll=False)
        params = init_decoder_params(jax.random.PRNGKey(0), cfg_u)
        rng = np.random.default_rng(0)
        ids = jnp.asarray(_prompt(rng, 2, 8))
        plen = jnp.full((2,), 8, jnp.int32)
        key = jax.random.PRNGKey(1)
        out_u, n_u = generate(params, cfg_u, ids, plen, 12,
                              CFG.vocab_size - 1, 0, key, 1.0, 8, 0.9)
        out_s, n_s = generate(params, cfg_s, ids, plen, 12,
                              CFG.vocab_size - 1, 0, key, 1.0, 8, 0.9)
        assert np.array_equal(np.asarray(out_u), np.asarray(out_s))
        assert np.array_equal(np.asarray(n_u), np.asarray(n_s))
        # T>1 decode (the speculative verify-block shape) on raw forward
        ck, cv = init_kv_cache(cfg_u, 2)
        pos = jnp.arange(3)[None].repeat(2, 0) + 8
        sp = jnp.arange(CFG.max_len)[None].repeat(2, 0)
        x_u, k_u, v_u = forward(params, cfg_u, ids[:, :3], pos, ck, cv,
                                write_slot=jnp.int32(8), slot_positions=sp)
        x_s, k_s, v_s = forward(params, cfg_s, ids[:, :3], pos, ck, cv,
                                write_slot=jnp.int32(8), slot_positions=sp)
        np.testing.assert_allclose(np.asarray(x_u, np.float32),
                                   np.asarray(x_s, np.float32),
                                   rtol=1e-4, atol=1e-5)
        for a, b in zip(jax.tree.leaves((k_u, v_u)),
                        jax.tree.leaves((k_s, v_s))):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       rtol=1e-4, atol=1e-5)


def test_attn_kernel_matches_einsum_path():
    """The fused Pallas flash-decode kernel (ops/decode_attn.py,
    interpret mode on CPU) computes exactly the einsum path's kv_quant
    attention: per-step decode logits match to f32 rounding, through
    ragged slot positions and the fused generate."""
    import dataclasses

    from rag_application_tpu.models.decoder import decode_step

    cfg_k = dataclasses.replace(
        CFG, hidden=128, heads=4, kv_heads=2, max_len=64,
        kv_quant=True, attn_kernel=True)
    cfg_e = dataclasses.replace(cfg_k, attn_kernel=False)
    params = init_decoder_params(jax.random.PRNGKey(0), cfg_k)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (3, 16)), jnp.int32)
    plen = jnp.asarray([16, 11, 7], jnp.int32)
    s_idx = jnp.arange(64, dtype=jnp.int32)[None, :]
    slot_pos = jnp.where(s_idx < 16,
                         jnp.where(s_idx < plen[:, None], s_idx,
                                   jnp.int32(2 ** 30)),
                         plen[:, None] + (s_idx - 16))
    outs = {}
    for tag, cfg in (("kernel", cfg_k), ("einsum", cfg_e)):
        ck, cv = init_kv_cache(cfg, 3, 64)
        lg, ck, cv = prefill(params, cfg, ids, plen, ck, cv)
        tok = jnp.argmax(lg, -1).astype(jnp.int32)
        pos = plen
        acc = []
        for step in range(4):
            lg, ck, cv = decode_step(params, cfg, tok, pos, 16 + step,
                                     ck, cv, slot_positions=slot_pos)
            acc.append(np.asarray(lg, np.float32))
            tok = jnp.argmax(lg, -1).astype(jnp.int32)
            pos = pos + 1
        outs[tag] = acc
    for a, b in zip(outs["kernel"], outs["einsum"]):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=2e-4)
    out, n = generate(params, cfg_k, ids, plen, 12, CFG.vocab_size - 1,
                      0, jax.random.PRNGKey(5), 1.0, 8, 0.9)
    o = np.asarray(out)
    assert (o >= 0).all() and (o < CFG.vocab_size).all()
    assert int(np.asarray(n).min()) > 0


def test_local_llm_multi_lora_chat():
    """register_lora + chat(adapter=...): the adapter changes the
    output, adapter=None serves the base, and unknown names raise.
    Covers the solo fused path AND the batcher path (per-row adapter
    ids through llm/scheduler.py)."""
    local = _make_local()
    cfg = local.cfg
    key = jax.random.PRNGKey(11)
    ad = {}
    for t, fin, fout in (("wq", 32, 32), ("wo", 32, 32)):
        key, k1, k2 = jax.random.split(key, 3)
        ad[t] = {"a": jax.random.normal(k1, (cfg.num_layers, fin, 8)) * 0.5,
                 "b": jax.random.normal(k2, (cfg.num_layers, 8, fout)) * 0.5,
                 "s": jnp.full((cfg.num_layers, 1, 1), 2.0, jnp.float32)}
    idx = local.register_lora("polite", ad)
    assert idx == 1
    from rag_application_tpu.llm.router import ChatMessage

    msgs = [ChatMessage("user", "hello world how is the weather")]

    async def run(**params):
        r = await local.chat(msgs, **params)
        return r.content

    base = asyncio.run(run(max_tokens=8))
    tuned = asyncio.run(run(max_tokens=8, adapter="polite"))
    base2 = asyncio.run(run(max_tokens=8))
    assert base == base2  # deterministic greedy
    assert tuned != base  # a 0.5-magnitude adapter must change output
    with pytest.raises(ValueError):
        asyncio.run(run(max_tokens=8, adapter="nope"))
    # batcher path: same adapter selection, same outputs per row
    local.enable_batching(slots=2, prompt_pad=32, horizon=32, chunk=4)

    async def both():
        return await asyncio.gather(
            local.chat(msgs, max_tokens=8),
            local.chat(msgs, max_tokens=8, adapter="polite"))

    rb, rt = asyncio.run(both())
    assert rb.content == base
    assert rt.content == tuned


def test_sampling_penalties_openai_law():
    """presence/frequency penalties follow the OpenAI law over ALL text
    so far (prompt included): the fused loop's greedy output equals a
    host replay of prefill + decode_step with logits penalized by
    hand, and a huge frequency penalty forbids any repeat."""
    from rag_application_tpu.models.decoder import decode_step

    params = init_decoder_params(jax.random.PRNGKey(2), CFG)
    rng = np.random.default_rng(1)
    B, T, NEW = 2, 8, 10
    ids = jnp.asarray(_prompt(rng, B, T))
    plen = jnp.asarray([T, 5], jnp.int32)
    pres, freq = 0.7, 1.3
    out, n = generate(params, CFG, ids, plen, NEW, -1, -9,
                      jax.random.PRNGKey(0), 0.0, 64, 1.0, None,
                      pres, freq)
    out = np.asarray(out)

    # host replay
    S = T + NEW
    ck, cv = init_kv_cache(CFG, B, S)
    s_idx = np.arange(S)[None, :]
    pl = np.asarray(plen)[:, None]
    slot_pos = jnp.asarray(np.where(
        s_idx < T, np.where(s_idx < pl, s_idx, 2 ** 30),
        pl + (s_idx - T)).astype(np.int32))
    logits, ck, cv = prefill(params, CFG, ids, plen, ck, cv)
    counts = np.zeros((B, CFG.vocab_size), np.int64)
    idn = np.asarray(ids)
    for b in range(B):
        for t in range(int(plen[b])):
            counts[b, idn[b, t]] += 1
    pos = np.asarray(plen).copy()
    got = []
    lg = np.asarray(logits, np.float32)
    for step in range(NEW):
        pen = lg - pres * (counts > 0) - freq * counts
        tok = pen.argmax(-1).astype(np.int32)
        got.append(tok.copy())
        for b in range(B):
            counts[b, tok[b]] += 1
        lg, ck, cv = decode_step(params, CFG, jnp.asarray(tok),
                                 jnp.asarray(pos), T + step, ck, cv,
                                 slot_positions=slot_pos)
        lg = np.asarray(lg, np.float32)
        pos += 1
    ref = np.stack(got, axis=1)
    assert np.array_equal(out[:, :NEW], ref), (out, ref)

    # huge frequency penalty: nothing (prompt included) ever repeats
    out2, _ = generate(params, CFG, ids, plen, NEW, -1, -9,
                       jax.random.PRNGKey(0), 0.0, 64, 1.0, None,
                       0.0, 1e6)
    o2 = np.asarray(out2)
    for b in range(B):
        seen = set(idn[b, :int(plen[b])].tolist())
        for t in o2[b]:
            assert int(t) not in seen
            seen.add(int(t))


def test_logit_bias():
    """OpenAI logit_bias: -100 bans a token; +100 forces it (within
    temperature sampling); chat threads the per-request dict through."""
    params = init_decoder_params(jax.random.PRNGKey(3), CFG)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(_prompt(rng, 2, 6))
    plen = jnp.full((2,), 6, jnp.int32)
    # ban the unbiased greedy first token
    base, _ = generate(params, CFG, ids, plen, 6, -1, -9,
                       jax.random.PRNGKey(0), 0.0)
    banned = int(np.asarray(base)[0, 0])
    vec = np.zeros((CFG.vocab_size,), np.float32)
    vec[banned] = -1e9
    out, _ = generate(params, CFG, ids, plen, 6, -1, -9,
                      jax.random.PRNGKey(0), 0.0, 64, 1.0, None,
                      0.0, 0.0, None, jnp.asarray(vec))
    assert (np.asarray(out) != banned).all()
    # +1e9 forces the token everywhere
    vec2 = np.zeros((CFG.vocab_size,), np.float32)
    vec2[7] = 1e9
    out2, _ = generate(params, CFG, ids, plen, 6, -1, -9,
                       jax.random.PRNGKey(0), 1.0, 64, 0.9, None,
                       0.0, 0.0, None, jnp.asarray(vec2))
    assert (np.asarray(out2) == 7).all()
    # chat surface: +huge bias on the "hello" piece forces every token
    local = _make_local()
    from rag_application_tpu.llm.router import ChatMessage

    hello_id = local.tokenizer.vocab["hello"]
    r1 = asyncio.run(local.chat(
        [ChatMessage("user", "how is the weather")],
        max_tokens=5, logit_bias={str(hello_id): 100000}))
    words = r1.content.split()
    assert words and all(w == "hello" for w in words), r1.content


def test_logit_bias_composes_with_penalties():
    """logit_bias must still apply when presence/frequency penalties are
    set (regression: the penalty branch used to rebuild the sampling
    logits from scratch, silently dropping the bias)."""
    params = init_decoder_params(jax.random.PRNGKey(3), CFG)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(_prompt(rng, 2, 6))
    plen = jnp.full((2,), 6, jnp.int32)
    base, _ = generate(params, CFG, ids, plen, 6, -1, -9,
                       jax.random.PRNGKey(0), 0.0)
    banned = int(np.asarray(base)[0, 0])
    vec = np.zeros((CFG.vocab_size,), np.float32)
    vec[banned] = -1e9
    # with a mild presence penalty active, the ban must still hold
    out, _ = generate(params, CFG, ids, plen, 6, -1, -9,
                      jax.random.PRNGKey(0), 0.0, 64, 1.0, None,
                      0.5, 0.0, None, jnp.asarray(vec))
    assert (np.asarray(out) != banned).all()


def test_stream_solo_fallback_honors_penalties_and_bias():
    """stream() without an ext batcher must apply presence/frequency
    penalties and logit_bias — the same sampling law chat() uses for the
    identical request (regression: the per-token solo step silently
    ignored the knobs, so the output depended on deployment config)."""
    local = _make_local()
    from rag_application_tpu.llm.router import ChatMessage

    hello_id = local.tokenizer.vocab["hello"]
    msgs = [ChatMessage("user", "how is the weather")]
    knobs = dict(max_tokens=6, logit_bias={str(hello_id): 100000},
                 presence_penalty=0.3)

    async def main():
        ref = await local.chat(msgs, **knobs)
        chunks = []
        async for delta in local.stream(msgs, **knobs):
            chunks.append(delta)
        return ref.content, "".join(chunks)

    ref, streamed = asyncio.run(main())
    assert streamed == ref
    words = streamed.split()
    assert words and all(w == "hello" for w in words), streamed


def test_chat_rejected_schema_rides_plain_batcher():
    """A response_schema outside the compile subset must not count as
    'extended sampling': on a plain (non-ext) batcher the request keeps
    the shared batch instead of dropping to the solo path."""
    local = _make_local()
    from rag_application_tpu.llm.router import ChatMessage

    # prompt_pad must cover the appended schema-instruction message
    # (render clips at cfg.max_len-1 = 47 tokens)
    local.enable_batching(slots=2, prompt_pad=48, horizon=32, chunk=2)
    bad_schema = {"type": "object", "properties": {},
                  "additionalProperties": True}  # rejected: no props

    async def main():
        r = await local.chat([ChatMessage("user", "hello")],
                             max_tokens=4, response_schema=bad_schema)
        return r

    r = asyncio.run(main())
    assert r.usage["completion_tokens"] >= 1
    assert local._batcher.steps > 0  # it actually used the batcher
