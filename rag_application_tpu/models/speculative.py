"""Prompt-lookup speculative decoding: lossless speedup, greedy or sampled.

Parity+: the reference's serving paths (Ollama local serving,
app/core/models/ollama/*; HF local generation,
app/core/models/huggingface/huggingface.py:195-260) decode one token
per model step. RAG completions are copy-heavy — answers quote the
retrieved context — so the next tokens are very often already IN the
sequence. This module drafts them from the sequence itself (prompt
lookup: match the current bigram earlier in the history, propose its
continuation) and verifies K drafts + 1 token in ONE decoder step.
Accepted drafts cost one step instead of one step each; rejected
drafts cost nothing extra (the correction token came out of the same
verify pass). Greedy output is argmax-identical to `decoder.generate`
in exact arithmetic (bit-exact on the CPU backend, bf16 included); on
the bf16 TPU the (1, K+1) and (1, 1) forwards compile to
differently-fused programs whose logits agree to ~1-2 ulps, so greedy
outputs may diverge where the top-2 margin is inside that noise — at
such ties either token is an argmax up to hardware rounding (measured:
every observed divergence had margin 0.0-0.03125, examples/diag_spec.py;
docs/decoder.md "bf16-TPU tie caveat"). Sampled output (temperature >
0) draws from the IDENTICAL filtered distribution via rejection-sampled
acceptance (`_sampled_verify`; Monte-Carlo-pinned in
tests/test_speculative.py) — drafting changes the schedule, never the
distribution.

TPU-first design:
  * the whole generate loop is ONE `lax.while_loop` dispatch (like
    `decoder.generate` — critical through the relay, where every
    dispatch costs ~30 ms RTT);
  * every iteration runs a fixed-shape (1, K+1) forward — XLA compiles
    exactly one block program; acceptance only changes carried indices,
    never shapes;
  * the bigram search is a vectorized compare over the position-indexed
    history buffer (no host logic, no dynamic shapes);
  * verification reuses the decoder's shared-slot cache layout: the
    K+1 block writes slots [head, head+K] with one
    `dynamic_update_slice`; rejected slots are simply re-written by the
    next block (head advances by accepted+1 <= K+1), so no rollback
    pass ever touches the cache.

Single-row only (B=1): speculation is a LATENCY tool for interactive
streams; batch throughput is the continuous batcher's job
(llm/scheduler.py). The shared write head makes per-row acceptance
counts incompatible with one batched head — rows would rewind
differently.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .decoder import (
    DecoderConfig,
    _project,
    forward,
    init_kv_cache,
    prefill,
    sample_logits,
    topk_logits,
)

DEAD = 2 ** 30  # slot_positions sentinel (matches llm/scheduler.py)


def _filtered_probs(logits: jax.Array, *, temperature: float, top_k: int,
                    top_p: float) -> jax.Array:
    """The exact full-vocab distribution `decoder.sample_logits` draws
    from: temperature -> top-k -> nucleus within the top-k, renormalized
    (everything outside gets probability 0)."""
    V = logits.shape[-1]
    vals, idx = topk_logits(logits / temperature, top_k)  # sorted desc
    if top_p < 1.0:
        probs = jax.nn.softmax(vals)
        csum = jnp.cumsum(probs)
        keep = (csum - probs) < top_p  # first token always kept
        vals = jnp.where(keep, vals, -jnp.inf)
    kept = jax.nn.softmax(vals)
    return jnp.zeros((V,), kept.dtype).at[idx].set(kept)


def _sampled_verify(probs: jax.Array, draft: jax.Array, key: jax.Array
                    ) -> Tuple[jax.Array, jax.Array]:
    """Rejection-sampling verification of a deterministic draft.

    probs (K+1, V): the target distributions at each block position
    (position j conditions on draft[:j]); draft (K,). The drafted
    proposal is a point mass, so speculative sampling reduces to:
    accept draft[j] with probability p_j(draft[j]); on the first
    rejection, draw from p_j with the drafted token REMOVED and
    renormalized (the positive residual (p - q)+). The emitted marginal
    equals p_j exactly: p(d)*delta_d + (1-p(d)) * p|!d = p. Position K
    (the bonus token) has no draft — a plain draw from p_K.

    Returns (g (K+1,) tokens, accept (K,) bool flags)."""
    K = draft.shape[0]
    uk, rk = jax.random.split(key)
    p_d = jnp.take_along_axis(probs[:K], draft[:, None], axis=1)[:, 0]
    accept = jax.random.uniform(uk, (K,)) < p_d
    residual = probs.at[jnp.arange(K), draft].set(0.0)  # row K untouched
    res = jax.random.categorical(
        rk, jnp.log(jnp.maximum(residual, 1e-38)), axis=-1).astype(
        jnp.int32)
    g = jnp.concatenate([jnp.where(accept, draft, res[:K]), res[K:]])
    return g, accept


@partial(jax.jit, static_argnums=(1, 4, 8, 9, 10, 11))
def generate_lookup_stats(params: Dict[str, Any], cfg: DecoderConfig,
                          ids: jax.Array, prompt_len: jax.Array,
                          max_new: int, eos_id: int, pad_id: int,
                          rng: jax.Array, k_spec: int = 4,
                          temperature: float = 0.0, top_k: int = 64,
                          top_p: float = 1.0
                          ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """`generate_lookup` that also returns the number of decoder block
    steps taken (scalar int32) — tokens-per-step is the speedup.

    temperature == 0: greedy — accept drafts the argmax agrees with;
    output is argmax-identical to `decoder.generate` at temperature 0
    up to bf16-TPU tie rounding (module docstring).
    temperature > 0: SAMPLED speculation — each draft is accepted with
    the target probability of that token and rejections resample from
    the residual (`_sampled_verify`), so every emitted token is an
    exact draw from the same filtered distribution `decoder.generate`
    samples — speculation changes the schedule, not the law."""
    sampled = temperature > 0.0
    B, T = ids.shape
    if B != 1:
        raise ValueError("generate_lookup is single-row (B=1); batches "
                         "belong to the continuous batcher")
    K = int(k_spec)
    if K < 1:
        raise ValueError("k_spec must be >= 1")
    eos = jnp.asarray(eos_id, jnp.int32)
    pad = jnp.asarray(pad_id, jnp.int32)
    plen = prompt_len.astype(jnp.int32)[0]

    # cache: prompt block [0, T) + one slot per consumed token. The last
    # block may consume up to K+1 slots while emitting its final token,
    # hence the +K slack; rejected slots are overwritten by later blocks.
    S = T + max_new + K
    cache_k, cache_v = init_kv_cache(cfg, 1, S)
    s_idx = jnp.arange(S, dtype=jnp.int32)
    slot_pos = jnp.where(s_idx < plen, s_idx,
                         jnp.asarray(DEAD, jnp.int32))[None, :]

    # position-indexed history: hist[p] = token at position p. Prompt
    # pad positions [plen, T) hold garbage until emissions overwrite
    # them; the bigram search masks anything at positions >= pos. The
    # +K+1 tail keeps the emission block write unclamped at the end.
    HL = T + max_new + K + 1
    hist = jnp.zeros((HL,), jnp.int32)
    hist = jax.lax.dynamic_update_slice(hist, ids[0], (0,))

    logits, cache_k, cache_v = prefill(params, cfg, ids,
                                       prompt_len.astype(jnp.int32),
                                       cache_k, cache_v)
    if sampled:
        first = sample_logits(logits, jax.random.fold_in(rng, 2 ** 16),
                              temperature=temperature, top_k=top_k,
                              top_p=top_p)[0]
    else:
        first = jnp.argmax(logits[0]).astype(jnp.int32)
    hist = jax.lax.dynamic_update_slice(hist, first[None], (plen,))

    h_idx = jnp.arange(HL - 1, dtype=jnp.int32)
    k_off = jnp.arange(K + 1, dtype=jnp.int32)

    def cond(st):
        e, done = st[0], st[2]
        return jnp.logical_and(e < max_new, ~done)

    def body(st):
        e, pos, done, head, steps, hist, slot_pos, ck, cv = st
        # ---- draft: latest earlier occurrence of the current bigram
        prev = hist[pos - 1]
        cur = hist[pos]
        m = jnp.logical_and(
            jnp.logical_and(hist[:-1] == prev, hist[1:] == cur),
            h_idx + 1 < pos)
        any_m = jnp.any(m)
        # latest match wins (most local phrasing); -1 -> no match
        mi = jnp.max(jnp.where(m, h_idx, -1))
        start = jnp.where(any_m, mi + 2, pos + 1)  # no match: drafts
        start = jnp.clip(start, 0, HL - K)         # are garbage -> reject
        draft = jax.lax.dynamic_slice(hist, (start,), (K,))

        # ---- verify K+1 tokens in one decoder step
        x = jnp.concatenate([cur[None], draft])[None, :]     # (1, K+1)
        positions = (pos + k_off)[None, :]
        slot_pos = jax.lax.dynamic_update_slice(
            slot_pos, positions, (0, head))
        hidden, ck, cv = forward(params, cfg, x, positions, ck, cv,
                                 write_slot=head, slot_positions=slot_pos)
        blk = _project(params, cfg, hidden[0])               # (K+1, V)
        if sampled:
            probs = jax.vmap(lambda l: _filtered_probs(
                l, temperature=temperature, top_k=top_k,
                top_p=top_p))(blk)
            g, accept = _sampled_verify(
                probs, draft, jax.random.fold_in(rng, steps))
            acc = jnp.cumprod(accept.astype(jnp.int32))
        else:
            g = jnp.argmax(blk, axis=-1).astype(jnp.int32)   # (K+1,)
            # acceptance: longest draft prefix the model agrees with
            acc = jnp.cumprod((draft == g[:K]).astype(jnp.int32))
        a = jnp.sum(acc)                                     # 0..K

        # ---- emit g[0..a], clamped by budget and cut at eos
        no_eos_before = jnp.cumprod(
            jnp.concatenate([jnp.ones((1,), jnp.int32),
                             (g[:-1] != eos).astype(jnp.int32)]))
        emit = (k_off <= a) & (k_off < max_new - e) & (no_eos_before == 1)
        n_new = jnp.sum(emit.astype(jnp.int32))
        eos_hit = jnp.any(jnp.logical_and(emit, g == eos))
        block = jax.lax.dynamic_slice(hist, (pos + 1,), (K + 1,))
        block = jnp.where(emit, g, block)
        hist = jax.lax.dynamic_update_slice(hist, block, (pos + 1,))

        return (e + n_new, pos + n_new, jnp.logical_or(done, eos_hit),
                head + a + 1, steps + 1, hist, slot_pos, ck, cv)

    st = (jnp.asarray(1, jnp.int32), plen, first == eos,
          jnp.asarray(T, jnp.int32), jnp.asarray(1, jnp.int32),
          hist, slot_pos, cache_k, cache_v)
    e, pos, done, head, steps, hist, *_ = jax.lax.while_loop(cond, body, st)

    out = jax.lax.dynamic_slice(hist, (plen,), (max_new,))
    out = jnp.where(jnp.arange(max_new) < e, out, pad)[None, :]
    return out, jnp.sum(out != pad, axis=1), steps


def generate_lookup(params: Dict[str, Any], cfg: DecoderConfig,
                    ids: jax.Array, prompt_len: jax.Array, max_new: int,
                    eos_id: int, pad_id: int, rng: jax.Array,
                    k_spec: int = 4, temperature: float = 0.0,
                    top_k: int = 64, top_p: float = 1.0
                    ) -> Tuple[jax.Array, jax.Array]:
    """Generation with prompt-lookup drafts, fused in one dispatch.
    Same contract as `decoder.generate`: returns (tokens (1, max_new)
    int32, pad after eos; n_generated (1,)). Greedy at temperature 0 is
    argmax-identical to the plain loop up to bf16-TPU tie rounding
    (module docstring); temperature > 0 draws from the identical
    filtered distribution via rejection-sampled verification (`rng`
    seeds it)."""
    out, n, _ = generate_lookup_stats(params, cfg, ids, prompt_len,
                                      max_new, eos_id, pad_id, rng,
                                      k_spec, temperature, top_k, top_p)
    return out, n
