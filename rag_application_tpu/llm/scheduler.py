"""Continuous batching for on-device decode (iteration-level scheduling).

Parity+: the reference serves concurrent chat through Ollama, which
continuously batches decode server-side (app/core/models/ollama/*;
AgentAPI chat endpoints fan requests at it). `LocalLLM.chat` runs one
fused `generate` per request — concurrent requests serialize on the
chip. This scheduler gives the local provider the same property as the
reference's serving stack: N in-flight requests share ONE decode batch,
each joining and leaving without stopping the others.

Design for this backend (see models/decoder.py and CLAUDE.md):

  * the KV cache keeps the SHARED-SLOT layout: on every global step all
    rows write the same physical slot via one scalar-indexed
    `dynamic_update_slice` (per-row scatter rewrites the whole cache
    per layer per token — measured 13-24x slower). A request's logical
    positions therefore do not equal its physical slots; `slot_pos`
    (B, S) carries each slot's true per-row position and dead slots get
    2**30 so no later occupant of the row ever attends them.
  * requests JOIN at chunk boundaries: decode runs `chunk` tokens per
    dispatch (a `lax.scan`), amortizing the relay/dispatch RTT, and the
    host admits/retires requests between chunks. Joining costs one
    single-row prefill (a (L,1,T,KVH,hd) row write — cheap).
  * when the write head reaches the cache end, `compact` re-packs every
    row's live slots to the front (one argsort + take_along_axis over
    the slot axis), so cache size bounds CONCURRENT tokens, not total
    tokens ever decoded.

Greedy decode of a request through the batcher is token-identical to a
solo `generate` run (asserted in tests/test_scheduler.py) — batching is
a scheduling change, not a model change.
"""

from __future__ import annotations

import asyncio
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.decoder import (
    DecoderConfig,
    _project,
    decode_step,
    forward,
    init_kv_cache,
    prefill,
    sample_logits,
)

DEAD = 2 ** 30  # slot_pos sentinel: slot holds nothing attendable


@dataclass
class _Slot:
    """Host-side bookkeeping for one batch row."""
    request_id: int = -1
    remaining: int = 0
    queue: Optional[asyncio.Queue] = None
    eos_id: int = -1


def _commit_row(logits, plen_total, rck, rcv, row, ck, cv, slot_pos,
                pos, tok, active, temperature, top_k, top_p, rng):
    """Shared admission tail (traced inside both prefill jits): paste
    the request's row cache into the batch cache, stamp its slot map,
    and seed pos/tok/active from the sampled first token."""
    # tree-mapped so int8 caches ({"q","s"}, per-leaf ndim differs) work
    write = lambda c, n: jax.tree.map(
        lambda d, s: jax.lax.dynamic_update_slice(
            d, s, (0, row, 0) + (0,) * (d.ndim - 3)), c, n)
    ck, cv = write(ck, rck), write(cv, rcv)
    S = slot_pos.shape[1]
    s_idx = jnp.arange(S, dtype=jnp.int32)
    new_row = jnp.where(s_idx < plen_total, s_idx,
                        jnp.asarray(DEAD, jnp.int32))
    slot_pos = jax.lax.dynamic_update_slice(slot_pos, new_row[None],
                                            (row, 0))
    pos = pos.at[row].set(plen_total)
    first = sample_logits(logits, rng, temperature=temperature,
                          top_k=top_k, top_p=top_p)
    tok = tok.at[row].set(first[0])
    active = active.at[row].set(True)
    return ck, cv, slot_pos, pos, tok, active


@partial(jax.jit, static_argnums=(1, 11, 12, 13),
         donate_argnums=(5, 6, 7, 8, 9, 10))
def _prefill_row(params, cfg: DecoderConfig, ids, plen, row,
                 ck, cv, slot_pos, pos, tok, active,
                 temperature: float, top_k: int, top_p: float, rng,
                 lora=None):
    """Admit one request into batch row `row`: run its prompt (B=1),
    write the prompt K/V into the row's leading slots, reset the row's
    slot_pos/pos/token/active state. Returns updated device state."""
    T = ids.shape[1]
    rck, rcv = init_kv_cache(cfg, 1, T)
    logits, rck, rcv = prefill(params, cfg, ids, plen, rck, rcv, lora=lora)
    return _commit_row(logits, plen[0], rck, rcv, row, ck, cv, slot_pos,
                       pos, tok, active, temperature, top_k, top_p, rng)


@partial(jax.jit, static_argnums=(1, 13, 14, 15),
         donate_argnums=(7, 8, 9, 10, 11, 12))
def _prefill_row_prefix(params, cfg: DecoderConfig, pck, pcv, suffix,
                        slen, row, ck, cv, slot_pos, pos, tok, active,
                        temperature: float, top_k: int, top_p: float, rng,
                        lora=None):
    """Admit a request whose prompt starts with a REGISTERED prefix:
    the prefix's K/V (pck/pcv, (L,1,p0,KVH,hd)) was computed once at
    registration, so only the suffix runs through the model. The row
    cache is prefix-paste + one suffix block forward at write_slot=p0
    (slot s = position s throughout, same layout as a full prefill)."""
    p0 = jax.tree.leaves(pck)[0].shape[2]
    Ts = suffix.shape[1]
    rck, rcv = init_kv_cache(cfg, 1, p0 + Ts)
    paste = lambda c, pre: jax.tree.map(
        lambda d, s: jax.lax.dynamic_update_slice(d, s, (0,) * d.ndim),
        c, pre)
    rck, rcv = paste(rck, pck), paste(rcv, pcv)
    positions = (p0 + jnp.arange(Ts, dtype=jnp.int32))[None, :]
    hidden, rck, rcv = forward(params, cfg, suffix, positions, rck, rcv,
                               write_slot=jnp.asarray(p0, jnp.int32),
                               lora=lora)
    last = jnp.take_along_axis(
        hidden, (slen - 1)[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    logits = _project(params, cfg, last)
    return _commit_row(logits, p0 + slen[0], rck, rcv, row, ck, cv,
                       slot_pos, pos, tok, active, temperature, top_k,
                       top_p, rng)


@partial(jax.jit, donate_argnums=(0,))
def _hist_admit(hist, ids, plen, row, tok):
    """Write an admitted request's prompt + first sampled token into its
    row of the position-indexed history buffer (speculative mode)."""
    HB = hist.shape[1]
    row_h = jnp.zeros((HB,), jnp.int32)
    row_h = jax.lax.dynamic_update_slice(row_h, ids[0], (0,))
    hist = jax.lax.dynamic_update_slice(hist, row_h[None], (row, 0))
    return jax.lax.dynamic_update_slice(hist, tok[row][None, None],
                                        (row, plen[0]))


@partial(jax.jit, static_argnums=(1, 2, 3, 13, 14, 15),
         donate_argnums=(4, 5, 6, 7, 8, 11, 12))
def _decode_chunk_spec(params, cfg: DecoderConfig, chunk: int, K: int,
                       tok, pos, active, slot_pos, hist, base_slot,
                       eos, ck, cv, temperature: float = 0.0,
                       top_k: int = 64, top_p: float = 1.0,
                       rng=None, step0=None, lora=None):
    """`chunk` speculative block steps in ONE dispatch.

    Each step drafts K tokens per row from the row's own history
    (prompt-lookup: continuation of the latest earlier occurrence of
    the current bigram) and verifies them plus one correction token in
    a single (B, K+1) forward through the shared-slot cache. Per-row
    acceptance needs no rewind: every step burns K+1 physical slots
    for every row and each row's REJECTED slots are stamped DEAD in its
    slot_pos lane, so compaction reclaims them exactly like retired
    requests' slots. Returns emitted ids (chunk, B, K+1) — per (step,
    row) a contiguous prefix of real ids then -1 sentinels (eos is
    consumed, never emitted, matching `_decode_chunk`)."""
    B = tok.shape[0]
    HB = hist.shape[1]
    h_idx = jnp.arange(HB - 1, dtype=jnp.int32)
    k_off = jnp.arange(K + 1, dtype=jnp.int32)
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]

    def body(carry, j):
        tok, pos, active, slot_pos, hist, ck, cv = carry
        head = base_slot + j * (K + 1)
        # ---- per-row bigram lookup over the history buffer
        prev = jnp.take_along_axis(
            hist, jnp.clip(pos - 1, 0, HB - 1)[:, None], axis=1)[:, 0]
        m = ((hist[:, :-1] == prev[:, None])
             & (hist[:, 1:] == tok[:, None])
             & (h_idx[None, :] + 1 < pos[:, None]))
        mi = jnp.max(jnp.where(m, h_idx[None, :], -1), axis=1)
        start = jnp.clip(jnp.where(mi >= 0, mi + 2, pos + 1), 0, HB - K)
        draft = jnp.take_along_axis(
            hist, start[:, None] + k_off[None, :K], axis=1)     # (B, K)

        # ---- verify block: K+1 tokens per row, shared physical slots
        x = jnp.concatenate([tok[:, None], draft], axis=1)       # (B, K+1)
        positions = pos[:, None] + k_off[None, :]
        col = jnp.where(active[:, None], positions,
                        jnp.asarray(DEAD, jnp.int32))
        slot_pos = jax.lax.dynamic_update_slice(slot_pos, col, (0, head))
        hidden, ck, cv = forward(params, cfg, x, positions, ck, cv,
                                 write_slot=head, slot_positions=slot_pos,
                                 lora=lora)
        blk = _project(params, cfg, hidden)                      # (B,K+1,V)
        if temperature > 0.0:
            # sampled speculation: accept each draft with its target
            # probability, resample rejections from the residual — the
            # emitted law equals plain sampling (models/speculative.py,
            # Monte-Carlo-pinned in tests)
            from ..models.speculative import _filtered_probs, _sampled_verify

            probs = jax.vmap(jax.vmap(lambda l: _filtered_probs(
                l, temperature=temperature, top_k=top_k,
                top_p=top_p)))(blk)
            keys = jax.random.split(
                jax.random.fold_in(rng, step0 + j), B)
            g, accept = jax.vmap(_sampled_verify)(probs, draft, keys)
            acc = jnp.cumprod(accept.astype(jnp.int32), axis=1)
        else:
            g = jnp.argmax(blk, axis=-1).astype(jnp.int32)       # (B, K+1)
            acc = jnp.cumprod((draft == g[:, :K]).astype(jnp.int32),
                              axis=1)

        # ---- per-row acceptance + emission (eos consumed, not emitted)
        a = jnp.sum(acc, axis=1)                                 # (B,) 0..K
        in_run = k_off[None, :] <= a[:, None]
        no_eos_before = jnp.cumprod(jnp.concatenate(
            [jnp.ones((B, 1), jnp.int32),
             (g[:, :-1] != eos[:, None]).astype(jnp.int32)], axis=1),
            axis=1)
        ok = in_run & (no_eos_before == 1) & active[:, None]
        emit = ok & (g != eos[:, None])
        emitted = jnp.where(emit, g, jnp.asarray(-1, jnp.int32))
        eos_hit = jnp.any(ok & (g == eos[:, None]), axis=1)

        # rejected (and inactive) slots go DEAD so compaction reclaims
        # them; accepted slots keep their positions
        col2 = jnp.where(in_run & active[:, None], positions,
                         jnp.asarray(DEAD, jnp.int32))
        slot_pos = jax.lax.dynamic_update_slice(slot_pos, col2, (0, head))

        # append the block's tokens to each row's history (clamped once
        # a request outgrows the buffer — drafts degrade, never results)
        widx = jnp.clip(pos + 1, 0, HB - (K + 1))[:, None] + k_off[None, :]
        hist = hist.at[rows, widx].set(
            jnp.where(in_run & active[:, None], g,
                      jnp.take_along_axis(hist, widx, axis=1)))

        new_tok = jnp.take_along_axis(g, a[:, None], axis=1)[:, 0]
        still = jnp.logical_and(active, ~eos_hit)
        return (jnp.where(active, new_tok, tok),
                jnp.where(active, pos + a + 1, pos),
                still, slot_pos, hist, ck, cv), emitted

    (tok, pos, active, slot_pos, hist, ck, cv), out = jax.lax.scan(
        body, (tok, pos, active, slot_pos, hist, ck, cv),
        jnp.arange(chunk, dtype=jnp.int32))
    return tok, pos, active, slot_pos, hist, ck, cv, out


@partial(jax.jit, static_argnums=(1, 2, 3, 13, 14, 15),
         donate_argnums=(4, 5, 6, 7, 8, 11, 12, 16, 20))
def _decode_chunk_spec_ext(params, cfg: DecoderConfig, chunk: int, K: int,
                           tok, pos, active, slot_pos, hist, base_slot,
                           eos, ck, cv, temperature: float = 0.0,
                           top_k: int = 64, top_p: float = 1.0,
                           counts=None, bias=None, pres=None, freq=None,
                           cstate=None, cid=None, cbanks=None,
                           rng=None, step0=None, lora=None):
    """`_decode_chunk_spec` composed with the extended-sampling
    transform (_ext_mask): every verify position i is masked with the
    DFA state and token counts AFTER consuming x_0..x_i — exactly the
    per-step ordering of `_decode_chunk_ext` — so a constrained/
    penalized request through a speculative batcher is greedy-identical
    to its solo run while still accepting multi-token drafts (drafts
    that would step outside the grammar simply fail argmax agreement
    and are rejected, never emitted). Sampled mode verifies against the
    MASKED filtered distribution, preserving the constrained law.

    Removes the r2 exclusivity (VERDICT item 5): constrained requests
    previously forfeited the ~1.65x speculative speedup."""
    B = tok.shape[0]
    HB = hist.shape[1]
    V = counts.shape[1]
    h_idx = jnp.arange(HB - 1, dtype=jnp.int32)
    k_off = jnp.arange(K + 1, dtype=jnp.int32)
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]

    def body(carry, j):
        (tok, pos, active, slot_pos, hist, ck, cv,
         counts, cstate) = carry
        head = base_slot + j * (K + 1)
        prev = jnp.take_along_axis(
            hist, jnp.clip(pos - 1, 0, HB - 1)[:, None], axis=1)[:, 0]
        m = ((hist[:, :-1] == prev[:, None])
             & (hist[:, 1:] == tok[:, None])
             & (h_idx[None, :] + 1 < pos[:, None]))
        mi = jnp.max(jnp.where(m, h_idx[None, :], -1), axis=1)
        start = jnp.clip(jnp.where(mi >= 0, mi + 2, pos + 1), 0, HB - K)
        draft = jnp.take_along_axis(
            hist, start[:, None] + k_off[None, :K], axis=1)     # (B, K)

        x = jnp.concatenate([tok[:, None], draft], axis=1)      # (B, K+1)
        positions = pos[:, None] + k_off[None, :]
        col = jnp.where(active[:, None], positions,
                        jnp.asarray(DEAD, jnp.int32))
        slot_pos = jax.lax.dynamic_update_slice(slot_pos, col, (0, head))
        hidden, ck, cv = forward(params, cfg, x, positions, ck, cv,
                                 write_slot=head, slot_positions=slot_pos,
                                 lora=lora)
        blk = _project(params, cfg, hidden)                     # (B,K+1,V)

        # ---- ext-state evolution along the draft: position i's mask
        # sees counts/DFA state after consuming x_0..x_i
        onehots = jax.nn.one_hot(jnp.clip(x, 0, V - 1), V,
                                 dtype=jnp.int32)               # (B,K+1,V)
        cum = jnp.cumsum(onehots, axis=1)
        cnts = counts[:, None, :] + cum                         # (B,K+1,V)

        def dfa(c, xi):
            c2 = cbanks["table"][cid, c, jnp.clip(xi, 0, None)]
            c2 = jnp.maximum(c2, 0)
            return c2, c2

        _, states = jax.lax.scan(dfa, cstate, x.T)              # (K+1, B)
        states = states.T                                       # (B, K+1)
        masked = jax.vmap(
            lambda l, cnt, st: _ext_mask(l, cnt, bias, pres, freq,
                                         st, cid, cbanks, eos),
            in_axes=1, out_axes=1)(blk, cnts, states)

        if temperature > 0.0:
            from ..models.speculative import _filtered_probs, _sampled_verify

            probs = jax.vmap(jax.vmap(lambda l: _filtered_probs(
                l, temperature=temperature, top_k=top_k,
                top_p=top_p)))(masked)
            keys = jax.random.split(
                jax.random.fold_in(rng, step0 + j), B)
            g, accept = jax.vmap(_sampled_verify)(probs, draft, keys)
            acc = jnp.cumprod(accept.astype(jnp.int32), axis=1)
        else:
            g = jnp.argmax(masked, axis=-1).astype(jnp.int32)   # (B, K+1)
            acc = jnp.cumprod((draft == g[:, :K]).astype(jnp.int32),
                              axis=1)

        a = jnp.sum(acc, axis=1)                                # (B,) 0..K
        in_run = k_off[None, :] <= a[:, None]
        no_eos_before = jnp.cumprod(jnp.concatenate(
            [jnp.ones((B, 1), jnp.int32),
             (g[:, :-1] != eos[:, None]).astype(jnp.int32)], axis=1),
            axis=1)
        ok = in_run & (no_eos_before == 1) & active[:, None]
        emit = ok & (g != eos[:, None])
        emitted = jnp.where(emit, g, jnp.asarray(-1, jnp.int32))
        eos_hit = jnp.any(ok & (g == eos[:, None]), axis=1)

        col2 = jnp.where(in_run & active[:, None], positions,
                         jnp.asarray(DEAD, jnp.int32))
        slot_pos = jax.lax.dynamic_update_slice(slot_pos, col2, (0, head))

        widx = jnp.clip(pos + 1, 0, HB - (K + 1))[:, None] + k_off[None, :]
        hist = hist.at[rows, widx].set(
            jnp.where(in_run & active[:, None], g,
                      jnp.take_along_axis(hist, widx, axis=1)))

        # commit the accepted prefix x_0..x_a into the ext state (a
        # dying row's state is garbage-after-latch; re-admission
        # reseeds it via _prefill_row_ext / _ext_reset_row)
        take = jnp.take_along_axis(
            cum, a[:, None, None], axis=1)[:, 0]                # (B, V)
        counts = counts + jnp.where(active[:, None], take, 0)
        new_state = jnp.take_along_axis(states, a[:, None], axis=1)[:, 0]
        cstate = jnp.where(active, new_state, cstate)

        new_tok = jnp.take_along_axis(g, a[:, None], axis=1)[:, 0]
        still = jnp.logical_and(active, ~eos_hit)
        return (jnp.where(active, new_tok, tok),
                jnp.where(active, pos + a + 1, pos),
                still, slot_pos, hist, ck, cv, counts, cstate), emitted

    (tok, pos, active, slot_pos, hist, ck, cv, counts, cstate), out = (
        jax.lax.scan(body,
                     (tok, pos, active, slot_pos, hist, ck, cv,
                      counts, cstate),
                     jnp.arange(chunk, dtype=jnp.int32)))
    return tok, pos, active, slot_pos, hist, ck, cv, counts, cstate, out


@partial(jax.jit, static_argnums=(1, 2, 9, 10, 11),
         donate_argnums=(3, 4, 5, 6, 14, 15))
def _decode_chunk(params, cfg: DecoderConfig, chunk: int,
                  tok, pos, active, slot_pos, base_slot, step0,
                  temperature: float, top_k: int, top_p: float,
                  eos, rng, ck, cv, lora=None):
    """Run `chunk` decode steps for all rows in ONE dispatch.

    Step j writes every row's K/V at physical slot base_slot + j and
    stamps that slot's per-row position (DEAD for inactive rows).
    Rows latch inactive on eos. Returns tokens (chunk, B) — the token
    CONSUMED at each step is the one reported; the freshly sampled
    token rides the carry for the next step/chunk. `step0` is the
    GLOBAL step counter (monotone across compactions, unlike
    base_slot) so sampling randomness never repeats."""
    def body(carry, j):
        tok, pos, active, slot_pos, ck, cv = carry
        # the carried token is normally eos-free (a sampled eos latches
        # the row before riding the carry), EXCEPT the prefill-sampled
        # first token — latch on consumption so it is neither delivered
        # nor continued past (decoder.generate's newly_done semantics)
        ok = jnp.logical_and(active, tok != eos)
        col = jnp.where(ok, pos, jnp.asarray(DEAD, jnp.int32))
        slot_pos = jax.lax.dynamic_update_slice(
            slot_pos, col[:, None], (0, base_slot + j))
        logits, ck, cv = decode_step(params, cfg, tok, pos,
                                     base_slot + j, ck, cv,
                                     slot_positions=slot_pos, lora=lora)
        nxt = sample_logits(logits, jax.random.fold_in(rng, step0 + j),
                            temperature=temperature, top_k=top_k,
                            top_p=top_p)
        emitted = jnp.where(ok, tok, jnp.asarray(-1, jnp.int32))
        still = jnp.logical_and(ok, nxt != eos)
        return (jnp.where(ok, nxt, tok),
                jnp.where(ok, pos + 1, pos),
                still, slot_pos, ck, cv), emitted

    (tok, pos, active, slot_pos, ck, cv), out = jax.lax.scan(
        body, (tok, pos, active, slot_pos, ck, cv),
        jnp.arange(chunk, dtype=jnp.int32))
    return tok, pos, active, slot_pos, ck, cv, out


def _ext_mask(logits, counts, bias, pres, freq, cstate, cid, cbanks, eos):
    """Per-row extended sampling transform (traced): OpenAI logit_bias
    (additive) + presence/frequency penalties over the row's token
    counts + grammar-constraint mask from the row's DFA state. Bank 0
    of `cbanks` is permissive (models/constrain.stack_constraints), so
    a row with cid=0/zero planes gets the identity transform — one
    compiled program serves constrained and plain rows together.
    Matches decoder.generate_logprobs's `emit` composition exactly."""
    sample_from = logits + bias.astype(logits.dtype)
    sample_from = (sample_from
                   - pres[:, None] * (counts > 0).astype(logits.dtype)
                   - freq[:, None] * counts.astype(logits.dtype))
    allowed = cbanks["table"][cid, cstate] >= 0          # (B, V)
    V = logits.shape[-1]
    allowed = jnp.logical_or(
        allowed, jnp.logical_and(
            cbanks["accept"][cid, cstate][:, None],
            jnp.arange(V, dtype=jnp.int32)[None, :] == eos[:, None]))
    return jnp.where(allowed, sample_from,
                     jnp.asarray(-1e30, sample_from.dtype))


@partial(jax.jit, static_argnums=(1, 2, 9, 10, 11),
         donate_argnums=(3, 4, 5, 6, 14, 15, 16, 20))
def _decode_chunk_ext(params, cfg: DecoderConfig, chunk: int,
                      tok, pos, active, slot_pos, base_slot, step0,
                      temperature: float, top_k: int, top_p: float,
                      eos, rng, ck, cv, counts, bias, pres, freq,
                      cstate, cid, cbanks, lora=None):
    """`_decode_chunk` with per-request extended sampling: counts
    (B, V) token counts for the OpenAI penalties (prompt included,
    seeded at admission), bias (B, V) logit_bias planes, pres/freq (B,)
    penalty scalars, cstate/cid (B,) the grammar-DFA state and
    constraint-bank id per row. The consumed token joins the counts and
    steps the DFA BEFORE the next sample — the same ordering as the
    solo fused loop (decoder.generate_logprobs), so a lone request
    through an ext batcher is token-identical to a solo run with the
    same knobs (asserted in tests/test_scheduler_ext.py)."""
    rows = jnp.arange(tok.shape[0], dtype=jnp.int32)

    def body(carry, j):
        tok, pos, active, slot_pos, ck, cv, counts, cstate = carry
        ok = jnp.logical_and(active, tok != eos)
        counts = counts.at[rows, tok].add(ok.astype(jnp.int32))
        cstate = jnp.where(
            ok, cbanks["table"][cid, cstate, jnp.clip(tok, 0, None)],
            cstate)
        cstate = jnp.maximum(cstate, 0)  # never index with DEAD
        col = jnp.where(ok, pos, jnp.asarray(DEAD, jnp.int32))
        slot_pos = jax.lax.dynamic_update_slice(
            slot_pos, col[:, None], (0, base_slot + j))
        logits, ck, cv = decode_step(params, cfg, tok, pos,
                                     base_slot + j, ck, cv,
                                     slot_positions=slot_pos, lora=lora)
        masked = _ext_mask(logits, counts, bias, pres, freq, cstate,
                           cid, cbanks, eos)
        nxt = sample_logits(masked, jax.random.fold_in(rng, step0 + j),
                            temperature=temperature, top_k=top_k,
                            top_p=top_p)
        emitted = jnp.where(ok, tok, jnp.asarray(-1, jnp.int32))
        still = jnp.logical_and(ok, nxt != eos)
        return (jnp.where(ok, nxt, tok),
                jnp.where(ok, pos + 1, pos),
                still, slot_pos, ck, cv, counts, cstate), emitted

    (tok, pos, active, slot_pos, ck, cv, counts, cstate), out = jax.lax.scan(
        body, (tok, pos, active, slot_pos, ck, cv, counts, cstate),
        jnp.arange(chunk, dtype=jnp.int32))
    return tok, pos, active, slot_pos, ck, cv, counts, cstate, out


@partial(jax.jit, static_argnums=(1, 23, 24, 25),
         donate_argnums=(5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16))
def _prefill_row_ext(params, cfg: DecoderConfig, ids, plen, row,
                     ck, cv, slot_pos, pos, tok, active,
                     counts, bias, pres, freq, cstate, cid,
                     cbanks, bias_row, p, f, c, eos,
                     temperature: float, top_k: int, top_p: float, rng,
                     lora=None):
    """`_prefill_row` for an ext batcher: additionally seeds the row's
    sampling-extension planes (prompt token counts for the penalties,
    logit_bias plane, penalty scalars, DFA state 0 + bank id) and
    samples the FIRST token through the same masked transform the chunk
    steps use. Plain admissions pass zero planes/c=0 — the mask is then
    the identity and the sampled token matches `_prefill_row` exactly
    (same rng), so plain requests keep token parity with a non-ext
    batcher."""
    T = ids.shape[1]
    rck, rcv = init_kv_cache(cfg, 1, T)
    logits, rck, rcv = prefill(params, cfg, ids, plen, rck, rcv, lora=lora)
    V = counts.shape[1]
    in_prompt = (jnp.arange(T, dtype=jnp.int32)
                 < plen[0]).astype(jnp.int32)
    rc = jnp.zeros((V,), jnp.int32).at[ids[0]].add(in_prompt)
    counts = jax.lax.dynamic_update_slice(counts, rc[None], (row, 0))
    bias = jax.lax.dynamic_update_slice(
        bias, bias_row[None].astype(bias.dtype), (row, 0))
    pres = pres.at[row].set(p)
    freq = freq.at[row].set(f)
    cstate = cstate.at[row].set(0)
    cid = cid.at[row].set(c)
    # NATIVE logits dtype, same as _decode_chunk_ext and the solo fused
    # loop — an f32 cast here could flip the first greedy argmax on
    # near-ties for bf16 models, breaking token parity with solo runs
    masked = _ext_mask(
        logits, rc[None], bias_row[None], p[None],
        f[None], jnp.zeros((1,), jnp.int32), c[None], cbanks, eos[None])
    ck, cv, slot_pos, pos, tok, active = _commit_row(
        masked, plen[0], rck, rcv, row, ck, cv, slot_pos, pos, tok,
        active, temperature, top_k, top_p, rng)
    return (ck, cv, slot_pos, pos, tok, active,
            counts, bias, pres, freq, cstate, cid)


@partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4, 5))
def _ext_reset_row(counts, bias, pres, freq, cstate, cid, row):
    """Zero one row's sampling-extension planes (a plain admission into
    an ext batcher reuses the fast `_prefill_row`/prefix paths; this
    clears whatever the row's previous occupant left behind)."""
    zc = jnp.zeros((1, counts.shape[1]), counts.dtype)
    zb = jnp.zeros((1, bias.shape[1]), bias.dtype)
    counts = jax.lax.dynamic_update_slice(counts, zc, (row, 0))
    bias = jax.lax.dynamic_update_slice(bias, zb, (row, 0))
    return (counts, bias, pres.at[row].set(0.0), freq.at[row].set(0.0),
            cstate.at[row].set(0), cid.at[row].set(0))


@partial(jax.jit, donate_argnums=(0, 1))
def _compact(ck, cv, slot_pos):
    """Re-pack every row's live slots to the front of the slot axis.

    Order = stable sort by slot position (DEAD slots sink to the end);
    returns the re-packed caches, slot_pos, and the new shared write
    head (max live count over rows — rows with fewer live slots keep a
    DEAD gap, which the mask ignores)."""
    order = jnp.argsort(slot_pos, axis=1, stable=True)  # (B, S)
    slot_pos = jnp.take_along_axis(slot_pos, order, axis=1)
    gather = lambda c: jax.tree.map(
        lambda d: jnp.take_along_axis(
            d, order.reshape((1,) + order.shape + (1,) * (d.ndim - 3)),
            axis=2), c)
    ck, cv = gather(ck), gather(cv)
    head = jnp.max(jnp.sum(slot_pos < DEAD, axis=1)).astype(jnp.int32)
    return ck, cv, slot_pos, head


class ContinuousBatcher:
    """Async continuous-batching frontend over one decoder + cache.

    `submit` enqueues a prompt and resolves to the generated ids; the
    internal loop admits pending requests into free rows between decode
    chunks. One instance per (params, cfg); all sampling knobs are
    fixed per instance so every chunk reuses one compiled program."""

    def __init__(self, params: Dict[str, Any], cfg: DecoderConfig, *,
                 slots: int = 8, prompt_pad: int = 128,
                 horizon: int = 512, chunk: int = 8,
                 temperature: float = 0.0, top_k: int = 64,
                 top_p: float = 1.0, seed: int = 0, spec_k: int = 0,
                 spec_min_tps: float = 0.0, spec_cooldown: int = 16,
                 lookahead: int = 2, lora_banks=None,
                 sampling_ext: bool = False, max_constraints: int = 8):
        if chunk < 1 or horizon < chunk:
            raise ValueError("need chunk >= 1 and horizon >= chunk")
        # spec_k works for greedy (argmax-agreement acceptance, token-
        # identical) AND sampled batchers (rejection-sampled acceptance
        # preserving the filtered distribution exactly); composed with
        # sampling_ext, every verify position applies the grammar/
        # penalty mask before agreement (_decode_chunk_spec_ext) so
        # constrained requests keep the speculative speedup
        self.params, self.cfg = params, cfg
        # multi-LoRA serving: stacked adapter banks
        # (models/lora.py::lora_banks; index 0 = base). Per-row adapter
        # ids ride host state and reach every decode/prefill jit as the
        # `lora` pytree — N fine-tunes share this one batch.
        self._banks = lora_banks
        self._aid = np.zeros((slots,), np.int32)
        # host mirror of each row's constraint id (0 = none): blocks
        # bank-slot eviction while the row decodes, even if the
        # submitting consumer already abandoned its stream
        self._row_cid = np.zeros((slots,), np.int32)
        self.B, self.T = slots, prompt_pad
        self.S = prompt_pad + horizon
        self.chunk = chunk
        # spec_k>0: every chunk step verifies spec_k history-drafted
        # tokens + 1 correction per row in ONE forward (_decode_chunk_spec)
        self.spec_k = int(spec_k)
        self.width = self.spec_k + 1  # physical slots burned per step
        if horizon < chunk * self.width:
            raise ValueError("need horizon >= chunk * (spec_k + 1)")
        # adaptive speculation: a speculative dispatch whose realized
        # tokens/step falls below spec_min_tps pauses speculation for
        # spec_cooldown dispatches (a K=0 spec chunk IS a plain chunk
        # under the same output-emission convention, so switching
        # widths per dispatch never changes the emitted tokens).
        # spec_min_tps=0 (default) disables throttling.
        self.spec_min_tps = float(spec_min_tps)
        self.spec_cooldown = int(spec_cooldown)
        self._cooldown = 0
        # lookahead: chunks dispatched ahead of the oldest unread chunk
        # OUTPUT. Dispatch is async (the jit returns array futures), so
        # with lookahead > 0 the host<->device readback of chunk k
        # overlaps the device compute of chunks k+1..k+L — through a
        # high-RTT transport (the axon relay) this turns the per-chunk
        # cost from compute+RTT into max(compute, RTT/L). Safety: a
        # chunk's output is delivered against a (row, request_id)
        # snapshot taken at dispatch, so a row retired + re-admitted
        # while its old chunk was in flight never leaks tokens to the
        # new request. lookahead=0 reads each chunk back before
        # dispatching the next (the pre-pipelining behavior).
        self.lookahead = max(0, int(lookahead))
        self.spec_dispatches = 0
        self.plain_dispatches = 0
        self.temperature, self.top_k, self.top_p = temperature, top_k, top_p
        self.rng = jax.random.PRNGKey(seed)
        # per-request extended sampling (sampling_ext=True): grammar
        # constraints + OpenAI penalties + logit_bias ride per-row
        # device planes through `_decode_chunk_ext` — constrained
        # requests BATCH with plain ones instead of falling back to the
        # solo fused path (LocalLLM.chat routes accordingly).
        self.sampling_ext = bool(sampling_ext)
        # constraint bank: FIXED-CAPACITY slot array with LRU eviction.
        # Unbounded growth would (a) recompile _decode_chunk_ext /
        # _prefill_row_ext on every novel schema a client sends (bank
        # shape is baked into the jit; multi-second remote recompiles
        # through the relay) and (b) hold every schema's (S, V) table in
        # HBM forever. Slots are memoized by table digest; eviction
        # skips slots pinned by live/pending requests. Both bank axes
        # are bucketed to powers of two so the device shape changes at
        # most O(log) times over the batcher's life.
        if max_constraints < 1:
            raise ValueError("max_constraints must be >= 1")
        self.max_constraints = int(max_constraints)
        self._cslots: List[Optional[Any]] = []
        self._cdigest: Dict[str, int] = {}   # table digest -> slot
        self._cuse: Dict[int, int] = {}      # slot -> lru tick
        self._ctick = 0
        self._cpins: Dict[int, int] = {}     # cid -> live/pending refs
        self._smax_bucket = 1                # monotone states bucket
        self._cbanks = None
        if self.sampling_ext:
            self._restack_constraints()
        self._reset_device_state()
        self._slots = [_Slot() for _ in range(slots)]
        self._pending: "asyncio.Queue[Tuple[int, List[int], int, int, asyncio.Queue]]" = (
            asyncio.Queue())
        self._next_id = 0
        self._task: Optional[asyncio.Task] = None
        self.steps = 0
        self.compactions = 0
        self.tokens_out = 0  # delivered ids (speculative tokens/step =
        #                      tokens_out/steps; ~1 without spec_k)
        self._prefixes: List[Tuple[Tuple[int, ...], Any, Any]] = []
        self.prefix_hits = 0

    def register_prefix(self, prefix_ids: Sequence[int]) -> None:
        """Precompute and pin the K/V of a shared prompt prefix (e.g.
        the rendered system preamble). Admissions whose prompt starts
        with it skip recomputing those positions — only the suffix runs
        through the model (vLLM-style prefix caching, sized to the RAG
        serving pattern of one constant header + variable question)."""
        ids = [int(t) for t in prefix_ids]
        p0 = len(ids)
        if not 2 <= p0 < self.T:
            raise ValueError("prefix needs 2 <= len < prompt_pad")
        Pb = 1
        while Pb < p0:
            Pb <<= 1
        padded = np.zeros((1, Pb), np.int32)
        padded[0, :p0] = ids
        pck, pcv = init_kv_cache(self.cfg, 1, Pb)
        _, pck, pcv = prefill(self.params, self.cfg, jnp.asarray(padded),
                              jnp.asarray([p0], np.int32), pck, pcv)
        cut = lambda c: jax.tree.map(lambda d: d[:, :, :p0], c)
        self._prefixes.append((tuple(ids), cut(pck), cut(pcv)))
        self._prefixes.sort(key=lambda e: -len(e[0]))  # longest wins

    def stats(self) -> Dict[str, float]:
        """Serving counters (also pushed to utils.observability.METRICS
        as decode_* by the loop)."""
        return {"steps": self.steps, "compactions": self.compactions,
                "tokens_out": self.tokens_out,
                "tokens_per_step": (self.tokens_out / self.steps
                                    if self.steps else 0.0)}

    # ------------------------------------------------------------ public

    async def submit(self, prompt_ids: Sequence[int], *, max_new: int = 128,
                     eos_id: int = -1, adapter_id: int = 0,
                     constraint_id: int = 0, presence: float = 0.0,
                     frequency: float = 0.0,
                     logit_bias=None) -> List[int]:
        """Generate up to `max_new` tokens for one prompt; returns the
        emitted ids (eos excluded). Concurrency-safe: callers share the
        batch. `adapter_id` indexes the instance's LoRA banks (0 =
        base model) — rows with different adapters decode together.
        `constraint_id` (register_constraint), presence/frequency and
        logit_bias ((V,) additive plane) need sampling_ext=True; such
        requests still share the batch with plain ones."""
        out: List[int] = []
        async for t in self.submit_stream(prompt_ids, max_new=max_new,
                                          eos_id=eos_id,
                                          adapter_id=adapter_id,
                                          constraint_id=constraint_id,
                                          presence=presence,
                                          frequency=frequency,
                                          logit_bias=logit_bias):
            out.append(t)
        return out

    async def submit_stream(self, prompt_ids: Sequence[int], *,
                            max_new: int = 128, eos_id: int = -1,
                            adapter_id: int = 0, constraint_id: int = 0,
                            presence: float = 0.0, frequency: float = 0.0,
                            logit_bias=None):
        """Like `submit` but yields each token id as soon as its decode
        chunk lands — N concurrent streams share one decode batch
        (time-to-next-token is bounded by chunk size, not by the other
        streams' completions)."""
        ids = list(prompt_ids)[-self.T:]
        if not ids:
            raise ValueError("empty prompt")
        n_adapters = (0 if self._banks is None else
                      next(iter(self._banks.values()))["a"].shape[1] - 1)
        if not 0 <= adapter_id <= n_adapters:
            raise ValueError(f"adapter_id {adapter_id} out of range "
                             f"(have {n_adapters} adapters)")
        ext = None
        wants_ext = (constraint_id or presence or frequency
                     or logit_bias is not None)
        if wants_ext and not self.sampling_ext:
            raise ValueError("constraint/penalties/logit_bias need a "
                             "batcher built with sampling_ext=True")
        if wants_ext:
            if constraint_id and not (
                    0 < constraint_id <= len(self._cslots)
                    and self._cslots[constraint_id - 1] is not None):
                raise ValueError(
                    f"constraint_id {constraint_id} is not a registered "
                    f"bank slot (have {len(self._cslots)})")
            vec = np.zeros((self.cfg.vocab_size,), np.float32)
            if logit_bias is not None:
                lb = np.asarray(logit_bias, np.float32)
                if lb.shape != vec.shape:
                    raise ValueError(
                        f"logit_bias must be ({self.cfg.vocab_size},)")
                vec = lb
            ext = (int(constraint_id), float(presence), float(frequency),
                   vec)
            if constraint_id:
                # pin the bank slot for the request's whole life
                # (pending + decoding) so LRU eviction never swaps the
                # grammar out from under an in-flight cid
                self._cpins[int(constraint_id)] = (
                    self._cpins.get(int(constraint_id), 0) + 1)
                self._ctick += 1
                self._cuse[int(constraint_id) - 1] = self._ctick
        q: asyncio.Queue = asyncio.Queue()
        rid = self._next_id
        self._next_id += 1
        try:
            await self._pending.put((rid, ids, int(max_new), int(eos_id), q,
                                     int(adapter_id), ext))
            self._ensure_loop()
            while True:
                t = await q.get()
                if t is None:
                    return
                if isinstance(t, BaseException):
                    raise t
                yield t
        finally:
            if ext is not None and ext[0]:
                n = self._cpins.get(ext[0], 0) - 1
                if n > 0:
                    self._cpins[ext[0]] = n
                else:
                    self._cpins.pop(ext[0], None)

    # ---------------------------------------------------------- internals

    def _reset_device_state(self) -> None:
        """Fresh cache + row state. Also the failure-recovery path: a
        loop that died mid-chunk may have invalidated the donated cache
        buffers, so recovery re-initializes rather than reuses them."""
        self.ck, self.cv = init_kv_cache(self.cfg, self.B, self.S)
        self.slot_pos = jnp.full((self.B, self.S), DEAD, jnp.int32)
        self.pos = jnp.zeros((self.B,), jnp.int32)
        self.tok = jnp.zeros((self.B,), jnp.int32)
        self.active = jnp.zeros((self.B,), bool)
        self.head = self.T  # next physical write slot (shared)
        # speculative mode: per-row position-indexed token history (the
        # draft source). Requests outgrowing it keep decoding correctly
        # — only their draft quality degrades (writes clamp).
        self.hist = (jnp.zeros((self.B, self.S + self.width + 1),
                               jnp.int32) if self.spec_k else None)
        if self.sampling_ext:
            V = self.cfg.vocab_size
            self.counts = jnp.zeros((self.B, V), jnp.int32)
            self.bias = jnp.zeros((self.B, V), jnp.float32)
            self.pres = jnp.zeros((self.B,), jnp.float32)
            self.freq = jnp.zeros((self.B,), jnp.float32)
            self.cstate = jnp.zeros((self.B,), jnp.int32)
            self.cid = jnp.zeros((self.B,), jnp.int32)

    def _restack_constraints(self) -> None:
        from ..models.constrain import stack_constraints

        # bucket both bank axes to powers of two (capped at
        # max_constraints) so slot fills/evictions keep the device shape
        # — and therefore the compiled chunk/prefill programs — stable
        n = 1
        while n < len(self._cslots):
            n <<= 1
        n = min(max(n, 1), self.max_constraints)
        smax = max([1] + [c.table.shape[0] for c in self._cslots
                          if c is not None])
        while self._smax_bucket < smax:
            self._smax_bucket <<= 1
        self._cbanks = stack_constraints(
            self._cslots, self.cfg.vocab_size, n_banks=n,
            min_states=self._smax_bucket).as_device()

    @staticmethod
    def _constraint_digest(constraint) -> str:
        d = getattr(constraint, "_digest", None)
        if d is None:
            import hashlib

            h = hashlib.sha1()
            t = np.ascontiguousarray(constraint.table)
            h.update(str(t.shape).encode())
            h.update(t.tobytes())
            h.update(np.ascontiguousarray(constraint.accept).tobytes())
            d = h.hexdigest()
            try:
                constraint._digest = d  # memo on the object (dataclass)
            except AttributeError:
                pass
        return d

    def register_constraint(self, constraint) -> int:
        """Register a compiled grammar (models/constrain.Constraint)
        for per-request constrained decoding; returns its constraint_id
        for `submit`. Registration is memoized by table digest and the
        bank holds at most `max_constraints` slots: a novel schema
        beyond that evicts the least-recently-used slot not pinned by a
        live or pending request, and raises ValueError when every slot
        is pinned (callers fall back to the solo constrained path).
        Safe to call per request — a registered constraint is O(1)."""
        if not self.sampling_ext:
            raise RuntimeError(
                "constraints need a batcher built with sampling_ext=True")
        key = self._constraint_digest(constraint)
        slot = self._cdigest.get(key)
        if slot is not None:
            self._ctick += 1
            self._cuse[slot] = self._ctick
            return slot + 1
        if len(self._cslots) < self.max_constraints:
            slot = len(self._cslots)
            self._cslots.append(None)
        else:
            in_rows = set(int(c) for c in self._row_cid if c)
            evictable = [s for s in range(len(self._cslots))
                         if not self._cpins.get(s + 1)
                         and (s + 1) not in in_rows]
            if not evictable:
                raise ValueError(
                    "constraint bank full: every slot is pinned by a "
                    "live or pending request (raise max_constraints)")
            slot = min(evictable, key=lambda s: self._cuse.get(s, 0))
            old = self._cslots[slot]
            if old is not None:
                self._cdigest.pop(self._constraint_digest(old), None)
        self._cslots[slot] = constraint
        self._cdigest[key] = slot
        self._ctick += 1
        self._cuse[slot] = self._ctick
        self._restack_constraints()
        return slot + 1

    def _ensure_loop(self) -> None:
        if self._task is None or self._task.done():
            self._task = asyncio.get_running_loop().create_task(self._run())

    def _free_rows(self) -> List[int]:
        return [i for i, s in enumerate(self._slots) if s.queue is None]

    def _lora(self, aid_vec) -> Optional[Dict[str, Any]]:
        if self._banks is None:
            return None
        return {"aid": jnp.asarray(aid_vec, jnp.int32),
                "banks": self._banks}

    def _admit(self, row: int, rid: int, ids: List[int],
               adapter_id: int = 0, ext=None,
               eos_id: int = -1) -> Optional[int]:
        """Device-side admission (jit dispatches + the spec-mode first-
        token read). Runs in an executor thread; returns the first
        sampled token in speculative mode (else None). Queue-facing
        state moves in `_finish_admit` on the loop thread."""
        padded = np.zeros((1, self.T), np.int32)
        padded[0, :len(ids)] = ids
        rng = jax.random.fold_in(self.rng, 2 ** 20 + rid)
        self._aid[row] = adapter_id
        self._row_cid[row] = ext[0] if ext is not None else 0
        row_lora = self._lora([adapter_id])
        if ext is not None:
            # extended-sampling admission: seed the row's planes and
            # sample the first token through the same masked transform
            # the chunk steps apply (skips the prefix-cache fast path —
            # the penalties need the row's full prompt counts anyway)
            c, p, f, vec = ext
            (self.ck, self.cv, self.slot_pos, self.pos, self.tok,
             self.active, self.counts, self.bias, self.pres, self.freq,
             self.cstate, self.cid) = _prefill_row_ext(
                self.params, self.cfg, jnp.asarray(padded),
                jnp.asarray([len(ids)], np.int32), np.int32(row),
                self.ck, self.cv, self.slot_pos, self.pos, self.tok,
                self.active, self.counts, self.bias, self.pres,
                self.freq, self.cstate, self.cid, self._cbanks,
                jnp.asarray(vec), np.float32(p), np.float32(f),
                np.int32(c), np.int32(eos_id), self.temperature,
                self.top_k, self.top_p, rng, row_lora)
            self.head = max(self.head, len(ids))
            if self.spec_k:
                # speculative batchers draft from per-row history and
                # deliver the prefill-sampled first token at admission
                # (same contract as the plain path below)
                self.hist = _hist_admit(
                    self.hist, jnp.asarray(padded),
                    jnp.asarray([len(ids)], np.int32), np.int32(row),
                    self.tok)
                return int(np.asarray(self.tok)[row])
            return None
        if self.sampling_ext:
            # plain admission into an ext batcher: the fast paths below
            # sample the first token unmasked (identical law — zero
            # planes are the identity transform); just clear whatever
            # the row's previous occupant left in the planes
            (self.counts, self.bias, self.pres, self.freq, self.cstate,
             self.cid) = _ext_reset_row(
                self.counts, self.bias, self.pres, self.freq,
                self.cstate, self.cid, np.int32(row))
        # prefix K/V were computed through the BASE model: an adapter
        # changes every projection, so adapter rows take a full prefill
        match = None if adapter_id != 0 else next(
            ((pids, pck, pcv) for pids, pck, pcv in self._prefixes
             if len(ids) > len(pids)
             and tuple(ids[:len(pids)]) == pids), None)
        if match is not None:
            pids, pck, pcv = match
            sfx = ids[len(pids):]
            Ts = 1
            while Ts < len(sfx):
                Ts <<= 1
            # the p0+Ts row buffer must paste inside the S-slot axis;
            # a long suffix after a long prefix can overshoot the pow2
            # pad — fall back to a full prefill rather than fail
            if len(pids) + Ts > self.S:
                match = None
        if match is not None:
            spad = np.zeros((1, Ts), np.int32)
            spad[0, :len(sfx)] = sfx
            (self.ck, self.cv, self.slot_pos, self.pos, self.tok,
             self.active) = _prefill_row_prefix(
                self.params, self.cfg, pck, pcv, jnp.asarray(spad),
                jnp.asarray([len(sfx)], np.int32), np.int32(row),
                self.ck, self.cv, self.slot_pos, self.pos, self.tok,
                self.active, self.temperature, self.top_k, self.top_p,
                rng, row_lora)
            self.prefix_hits += 1
        else:
            (self.ck, self.cv, self.slot_pos, self.pos, self.tok,
             self.active) = _prefill_row(
                self.params, self.cfg, jnp.asarray(padded),
                jnp.asarray([len(ids)], np.int32), np.int32(row),
                self.ck, self.cv, self.slot_pos, self.pos, self.tok,
                self.active, self.temperature, self.top_k, self.top_p,
                rng, row_lora)
        first = None
        if self.spec_k:
            self.hist = _hist_admit(
                self.hist, jnp.asarray(padded),
                jnp.asarray([len(ids)], np.int32), np.int32(row), self.tok)
            first = int(np.asarray(self.tok)[row])
        # the shared write head must never re-enter a live prompt range
        # (possible after compaction shrank it): decode writes hit EVERY
        # row at the shared slot and would clobber this prompt's K/V.
        self.head = max(self.head, len(ids))
        return first

    def _finish_admit(self, row: int, rid: int, max_new: int,
                      eos_id: int, q: asyncio.Queue,
                      first: Optional[int]) -> None:
        """Queue-facing admission bookkeeping. Runs on the EVENT-LOOP
        thread (asyncio.Queue.put_nowait is not thread-safe; the device
        work in `_admit` runs in an executor thread)."""
        self._slots[row] = _Slot(rid, max_new, q, eos_id)
        if first is not None:
            # block steps emit their OUTPUTS (g); the prefill-sampled
            # first token is nobody's output, so deliver it here (the
            # plain path instead emits each consumed token one step
            # late, which covers it)
            if first == eos_id or max_new <= 0:
                self._retire(row)
            else:
                q.put_nowait(first)
                self.tokens_out += 1
                self._slots[row].remaining -= 1
                if self._slots[row].remaining == 0:
                    self._retire(row)

    def _retire(self, row: int) -> None:
        s = self._slots[row]
        if s.queue is not None:
            s.queue.put_nowait(None)
        self._slots[row] = _Slot()
        self._aid[row] = 0
        self._row_cid[row] = 0
        self.active = self.active.at[row].set(False)
        # clear the row's slot map so compaction never counts (and the
        # write head never sits past) a dead request's leftovers
        self.slot_pos = self.slot_pos.at[row].set(DEAD)

    async def _run(self) -> None:
        try:
            await self._serve()
        except asyncio.CancelledError:
            # event-loop teardown (asyncio.run cancels pending tasks):
            # propagate — this is not a serving failure and the device
            # state dies with the loop anyway
            raise
        except BaseException as exc:  # deliver, never hang submitters
            for s in self._slots:
                if s.queue is not None:
                    s.queue.put_nowait(exc)
            self._slots = [_Slot() for _ in range(self.B)]
            while True:
                try:
                    _, _, _, _, q, _, _ = self._pending.get_nowait()
                except asyncio.QueueEmpty:
                    break
                q.put_nowait(exc)
            # the exception now lives with every submitter; re-raising
            # would only leave an unretrieved task exception (asyncio
            # dumps those at shutdown). Log, restore a clean device
            # state (donated buffers may be invalid mid-chunk), and let
            # the loop die; the next submit restarts it.
            import logging

            logging.getLogger(__name__).exception("batcher loop failed")
            self._reset_device_state()

    def _process(self, entry) -> None:
        """Deliver one read-back chunk output. `entry` is the dispatch-
        time snapshot (readback future done, busy (row, rid) pairs,
        use_k). Runs on the event-loop thread."""
        emitted, busy, use_k = entry
        if self.spec_k:
            if use_k > 0:
                if self.spec_min_tps > 0 and busy:
                    rows = [i for i, _ in busy]
                    rate = float((emitted[:, rows, :] >= 0).sum()) / (
                        self.chunk * len(rows))
                    if rate < self.spec_min_tps:
                        self._cooldown = self.spec_cooldown
        for i, rid in busy:
            s = self._slots[i]
            if s.queue is None or s.request_id != rid:
                continue  # retired (and possibly re-admitted) meanwhile
            for j in range(self.chunk):
                if s.remaining == 0:
                    break
                for w in range(emitted.shape[2]):
                    t = int(emitted[j, i, w])
                    if t < 0 or s.remaining == 0:
                        # -1 ends this BLOCK's run, not the row:
                        # later steps in the chunk may emit more
                        break
                    s.queue.put_nowait(t)
                    s.remaining -= 1
                    self.tokens_out += 1
            # row death is derived from the output itself (the live
            # device `active` may already reflect LATER in-flight
            # chunks): a row alive through the chunk's last step emits
            # a real id at (last, 0) in both plain and spec modes, so
            # -1 there means the row was dead (or died consuming eos)
            # by the end of THIS chunk. A row that dies by SAMPLING eos
            # at the last step shows up one chunk later — one wasted
            # dispatch, never a wrong token.
            if s.remaining == 0 or int(emitted[-1, i, 0]) < 0:
                self._retire(i)
        from ..utils.observability import METRICS

        METRICS.inc("decode_steps", self.chunk)
        METRICS.set_gauge("decode_tokens_per_step",
                          self.tokens_out / max(self.steps, 1))
        METRICS.set_gauge("decode_active_rows", len(busy))

    async def _serve(self) -> None:
        loop = asyncio.get_running_loop()
        # in-flight chunk outputs: (readback future -> np (chunk,B,W),
        # busy snapshot [(row, rid)], use_k), oldest first
        inflight: List[Tuple[asyncio.Future, List[Tuple[int, int]], int]] = []

        async def _pop_oldest():
            fut, busy, use_k = inflight.pop(0)
            self._process((await fut, busy, use_k))

        try:
            while True:
                # admit as many pending requests as there are free rows
                admitted = False
                for row in self._free_rows():
                    try:
                        (rid, ids, max_new,
                         eos_id, q, aid, ext) = self._pending.get_nowait()
                    except asyncio.QueueEmpty:
                        break
                    first = await loop.run_in_executor(
                        None, self._admit, row, rid, ids, aid, ext, eos_id)
                    self._finish_admit(row, rid, max_new, eos_id, q, first)
                    admitted = True
                busy = [(i, s.request_id) for i, s in enumerate(self._slots)
                        if s.queue is not None]
                if not busy:
                    if inflight:
                        await _pop_oldest()
                        continue
                    if admitted:
                        continue
                    return  # nothing in flight; next submit restarts
                # adaptive speculation: during a cooldown run K=0 spec
                # chunks (same emission convention, 1 slot/step) and
                # re-probe speculation when it expires. With lookahead
                # pipelining the low-rate signal arrives up to
                # `lookahead` dispatches late (the rate is only known
                # at readback), so a cooldown cycle wastes up to
                # lookahead+1 speculative chunks instead of exactly 1 —
                # set lookahead=0 if strict throttling matters more
                # than pipelining.
                use_k = self.spec_k
                throttled = (use_k and self.spec_min_tps > 0
                             and self._cooldown > 0)
                if throttled:
                    use_k = 0
                burn = self.chunk * (use_k + 1)  # slots per dispatch
                if self.head + burn > self.S:
                    # process every in-flight output first: rows that
                    # died in those chunks retire HERE, clearing their
                    # slot_pos lanes so compaction actually reclaims
                    # them (and reading _compact's host-value head
                    # drains the device pipeline anyway)
                    while inflight:
                        await _pop_oldest()
                    # the output-derived retire misses one case: a row
                    # whose chunk sampled eos at its LAST step is dead
                    # on device but host-busy, and its un-cleared lane
                    # would survive compaction (spuriously "cache
                    # full"). We are at a sync point anyway — read the
                    # live active vector and retire device-dead rows
                    # before re-packing.
                    alive = await loop.run_in_executor(
                        None, np.asarray, self.active)
                    for i, s in enumerate(self._slots):
                        if s.queue is not None and not alive[i]:
                            self._retire(i)
                    busy = [(i, s.request_id)
                            for i, s in enumerate(self._slots)
                            if s.queue is not None]
                    if not busy:
                        continue  # drain/retire freed every row
                    (self.ck, self.cv, self.slot_pos,
                     head) = await loop.run_in_executor(
                        None, lambda: _compact(self.ck, self.cv,
                                               self.slot_pos))
                    self.head = int(head)
                    self.compactions += 1
                    if self.head + burn > self.S:
                        raise RuntimeError(
                            "cache full after compaction: concurrent live "
                            "tokens exceed prompt_pad+horizon; raise "
                            "horizon or lower max_new")
                if throttled:
                    # decrement only when the K=0 probe chunk actually
                    # dispatches (the compaction branch may `continue`)
                    self._cooldown -= 1
                eos_vec = np.full((self.B,), -2, np.int32)
                for i, _ in busy:
                    eos_vec[i] = self._slots[i].eos_id

                def _step():
                    if self.spec_k and self.sampling_ext:
                        (self.tok, self.pos, self.active, self.slot_pos,
                         self.hist, self.ck, self.cv, self.counts,
                         self.cstate, out) = _decode_chunk_spec_ext(
                            self.params, self.cfg, self.chunk, use_k,
                            self.tok, self.pos, self.active, self.slot_pos,
                            self.hist, np.int32(self.head),
                            jnp.asarray(eos_vec), self.ck, self.cv,
                            self.temperature, self.top_k, self.top_p,
                            self.counts, self.bias, self.pres, self.freq,
                            self.cstate, self.cid, self._cbanks,
                            self.rng, np.int32(self.steps),
                            self._lora(self._aid))
                        return out  # (chunk, B, use_k+1)
                    if self.spec_k:
                        (self.tok, self.pos, self.active, self.slot_pos,
                         self.hist, self.ck, self.cv,
                         out) = _decode_chunk_spec(
                            self.params, self.cfg, self.chunk, use_k,
                            self.tok, self.pos, self.active, self.slot_pos,
                            self.hist, np.int32(self.head),
                            jnp.asarray(eos_vec), self.ck, self.cv,
                            self.temperature, self.top_k, self.top_p,
                            self.rng, np.int32(self.steps),
                            self._lora(self._aid))
                        return out  # (chunk, B, use_k+1)
                    if self.sampling_ext:
                        (self.tok, self.pos, self.active, self.slot_pos,
                         self.ck, self.cv, self.counts, self.cstate,
                         out) = _decode_chunk_ext(
                            self.params, self.cfg, self.chunk, self.tok,
                            self.pos, self.active, self.slot_pos,
                            np.int32(self.head), np.int32(self.steps),
                            self.temperature, self.top_k, self.top_p,
                            jnp.asarray(eos_vec), self.rng, self.ck,
                            self.cv, self.counts, self.bias, self.pres,
                            self.freq, self.cstate, self.cid,
                            self._cbanks, self._lora(self._aid))
                        return out[:, :, None]  # (chunk, B, 1)
                    (self.tok, self.pos, self.active, self.slot_pos,
                     self.ck, self.cv, out) = _decode_chunk(
                        self.params, self.cfg, self.chunk, self.tok,
                        self.pos, self.active, self.slot_pos,
                        np.int32(self.head), np.int32(self.steps),
                        self.temperature, self.top_k, self.top_p,
                        jnp.asarray(eos_vec), self.rng, self.ck, self.cv,
                        self._lora(self._aid))
                    return out[:, :, None]  # (chunk, B, 1)

                # `_step` issues the chunk and returns the OUTPUT ref
                # without waiting for execution (async dispatch); `out`
                # is a fresh jit output no later call donates, so its
                # device->host read can float in its own executor thread
                # while further chunks dispatch.
                out = await loop.run_in_executor(None, _step)
                self.head += burn
                self.steps += self.chunk
                if self.spec_k:
                    if use_k > 0:
                        self.spec_dispatches += 1
                    else:
                        self.plain_dispatches += 1
                inflight.append((loop.run_in_executor(None, np.asarray, out),
                                 busy, use_k))
                while len(inflight) > self.lookahead:
                    await _pop_oldest()
        finally:
            # surface in-flight readbacks before the loop exits (error
            # path: _run resets device state; an unawaited future that
            # fails later would be dumped as "exception never retrieved")
            for fut, _, _ in inflight:
                fut.cancel()
                try:
                    await fut
                except (Exception, asyncio.CancelledError):
                    pass
