"""TPU-native causal LM: LLaMA-family decoder with static KV cache.

Parity: the reference's HF local client runs decoder-only generation
("Text generation (LLaMA, Mistral, etc.)", app/core/models/huggingface/
huggingface.py:17-22,195-260) on torch with a TextIteratorStreamer. This
is the same model family re-designed for XLA:

  * layers are STACKED on a leading axis and run under one `lax.scan` —
    one compiled block regardless of depth (no per-layer HLO bloat,
    identical fusion for every layer);
  * the KV cache is a static `(L, B, S, kv_heads, head_dim)` buffer;
    prefill writes it with one `dynamic_update_slice`, and decode writes
    ALL rows at one SHARED slot per step (slot = padded-prompt-length +
    step) — a single scalar-indexed `dynamic_update_slice`, never a
    per-row scatter or one-hot blend (both move the whole cache through
    HBM per layer per token; measured 13-24x slower at batch 64). Slot
    index and token position decouple: RoPE uses each row's true
    position, and visibility is `slot_positions[b,s] <= query_pos`;
  * generation is a `lax.while_loop` with an eos-latch carry — the whole
    multi-token decode is ONE device dispatch (critical through the
    relay: per-token dispatch costs ~30 ms RTT; the fused loop costs it
    once). A jitted single-step path (`make_decode_step`) serves true
    token streaming when TTFT matters more than dispatch count;
  * batches decode with PER-ROW prompt lengths: pad-position garbage in
    the cache is provably never attended — prompt pad slots get
    slot_position = 2**30 (masked for every query), and a done row's
    stalled position masks the pad tokens later written on its lane.

Weight import (`convert_hf_llama_state_dict`) maps a torch
`LlamaForCausalLM`-layout state dict (incl. grouped-query attention,
tied embeddings, and Qwen2-family q/k/v projection biases) onto the
stacked tree — LLaMA, Mistral, Qwen2, TinyLlama, etc.; logits parity vs
transformers is asserted in tests/test_decoder.py for both families.

Weight-only int8 (`quantize_decoder_params`): small-batch decode is
bound by weight HBM bytes, so int8 weights with per-output-channel
scales halve the step's traffic and the checkpoint's footprint (a
7B-class model fits one chip). The scale is applied to the matmul
OUTPUT — ``(x @ q) * s`` — so no dequantized matrix ever exists; int8
magnitudes are exact in bf16, keeping the MXU on its native path.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int
    hidden: int
    num_layers: int
    heads: int
    kv_heads: int
    mlp_dim: int
    max_len: int = 1024
    rope_theta: float = 10000.0
    # Llama-3-style rope scaling ("llama3") or positional interpolation
    # ("linear"); "none" = plain RoPE. Flat fields (not HF's dict) keep
    # the config hashable for jit static args.
    rope_kind: str = "none"
    rope_factor: float = 1.0
    rope_low_freq_factor: float = 1.0
    rope_high_freq_factor: float = 4.0
    rope_original_max_len: int = 8192
    eps: float = 1e-6
    dtype: str = "bfloat16"
    # int8 KV cache (inference only — the round() has no gradient):
    # K/V rows store int8 with one f32 scale per (slot, kv-head), read
    # back as (int8 @ .) * scale inside attention. Halves the cache's
    # HBM traffic — the term decode time grows with — and doubles the
    # concurrent-token capacity of a serving cache (llm/scheduler.py).
    kv_quant: bool = False
    # Decode-step layer loop: unrolled (static layer indices — each
    # layer's cache slice is a view of the stacked buffer, no
    # dynamic_slice copy) vs lax.scan (dynamic indices — reading layer
    # i's (B,S,KVH,hd) slab out of the carry materializes a copy, an
    # extra 2x cache read+write of HBM traffic per step). Measured
    # crossover (v5e-1, b64): the copies only dominate once the
    # per-layer K slab passes ~10 MB (S896 kvq: scan 4.07 vs unroll
    # 2.00 ms/step; S256 kvq: scan 1.41 vs unroll 1.66 — the scan
    # fuses the small step better). None (default) picks per compiled
    # shape; True/False force a path (e.g. scan for very deep models
    # where compile time dominates).
    decode_unroll: Optional[bool] = None
    # Fused Pallas flash-decode attention for int8 KV caches (T=1 steps
    # with a kernel-tileable geometry; anything else falls back to the
    # XLA einsums). OPT-IN: at GQA C=8 the decode attention is MXU
    # thin-pass bound and at C=32 the XLA bf16 einsum is already
    # HBM-saturated (914 GB/s measured) — the kernel only matches XLA
    # in both regimes (see ops/decode_attn.py STATUS).
    attn_kernel: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden // self.heads

    @property
    def q_groups(self) -> int:
        return self.heads // self.kv_heads


# ------------------------------------------------------------------ params


def init_decoder_params(rng: jax.Array, cfg: DecoderConfig) -> Dict[str, Any]:
    """Random init (scaled normal) in the stacked-layer layout."""
    L, H, M = cfg.num_layers, cfg.hidden, cfg.mlp_dim
    hd, nq, nkv = cfg.head_dim, cfg.heads, cfg.kv_heads
    keys = iter(jax.random.split(rng, 16))
    dt = jnp.dtype(cfg.dtype)

    def dense(key, shape, fan_in):
        return (jax.random.normal(key, shape, jnp.float32)
                / np.sqrt(fan_in)).astype(dt)

    return {
        "tok_emb": dense(next(keys), (cfg.vocab_size, H), H),
        "attn_norm": jnp.ones((L, H), dt),
        "ffn_norm": jnp.ones((L, H), dt),
        "wq": dense(next(keys), (L, H, nq * hd), H),
        "wk": dense(next(keys), (L, H, nkv * hd), H),
        "wv": dense(next(keys), (L, H, nkv * hd), H),
        "wo": dense(next(keys), (L, nq * hd, H), nq * hd),
        "w_gate": dense(next(keys), (L, H, M), H),
        "w_up": dense(next(keys), (L, H, M), H),
        "w_down": dense(next(keys), (L, M, H), M),
        "final_norm": jnp.ones((H,), dt),
        "lm_head": dense(next(keys), (H, cfg.vocab_size), H),
    }


def convert_hf_llama_state_dict(state_dict: Dict[str, Any],
                                cfg: DecoderConfig) -> Dict[str, Any]:
    """torch `LlamaForCausalLM.state_dict()` -> stacked param tree.

    torch Linear weights are (out, in); ours are (in, out)."""
    def get(key: str) -> np.ndarray:
        v = state_dict[key]
        return np.asarray(v.detach().cpu().float().numpy()
                          if hasattr(v, "detach") else v)

    def stacked(fmt: str, transpose: bool = True) -> jnp.ndarray:
        mats = [get(fmt.format(i)) for i in range(cfg.num_layers)]
        if transpose:
            mats = [m.T for m in mats]
        return jnp.asarray(np.stack(mats), dtype=cfg.dtype)

    emb = get("model.embed_tokens.weight")
    head_key = ("lm_head.weight" if "lm_head.weight" in state_dict
                else "model.embed_tokens.weight")  # tied embeddings
    out = {}
    # Qwen2-family checkpoints carry q/k/v projection biases (LLaMA and
    # Mistral don't); pick them up when present — forward adds them
    # before RoPE, matching the HF attention module.
    for short, proj in (("bq", "q_proj"), ("bk", "k_proj"),
                        ("bv", "v_proj")):
        key = f"model.layers.0.self_attn.{proj}.bias"
        if key in state_dict:
            out[short] = stacked(
                "model.layers.{}.self_attn." + proj + ".bias",
                transpose=False)
    out.update({
        "tok_emb": jnp.asarray(emb, dtype=cfg.dtype),
        "attn_norm": stacked(
            "model.layers.{}.input_layernorm.weight", transpose=False),
        "ffn_norm": stacked(
            "model.layers.{}.post_attention_layernorm.weight",
            transpose=False),
        "wq": stacked("model.layers.{}.self_attn.q_proj.weight"),
        "wk": stacked("model.layers.{}.self_attn.k_proj.weight"),
        "wv": stacked("model.layers.{}.self_attn.v_proj.weight"),
        "wo": stacked("model.layers.{}.self_attn.o_proj.weight"),
        "w_gate": stacked("model.layers.{}.mlp.gate_proj.weight"),
        "w_up": stacked("model.layers.{}.mlp.up_proj.weight"),
        "w_down": stacked("model.layers.{}.mlp.down_proj.weight"),
        "final_norm": jnp.asarray(get("model.norm.weight"), dtype=cfg.dtype),
        "lm_head": jnp.asarray(get(head_key).T, dtype=cfg.dtype),
    })
    return out


def quantize_decoder_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Weight-only int8: every matmul weight becomes ``{"q": int8, "s":
    f32}`` with one scale per OUTPUT channel (`tok_emb` per row, since
    it is gathered, not contracted). Norm vectors stay as-is.

    Inference reads half the weight bytes — the thing decode is bound
    by at small batch — and a 7B-class checkpoint drops under a single
    chip's HBM. The matmul runs as ``(x @ q.astype(bf16)) * s``: int8
    magnitudes are exact in bf16 and the scale commutes past the
    contraction, so the dequantized matrix is never materialized.
    Training must use the original bf16 tree (no straight-through
    estimator here)."""
    out = {}
    for name, w in params.items():
        if name in ("attn_norm", "ffn_norm", "final_norm",
                    "bq", "bk", "bv"):  # norms and biases stay as-is
            out[name] = w
            continue
        wf = w.astype(jnp.float32)
        axis = -1 if name == "tok_emb" else -2  # contraction axis
        scale = jnp.max(jnp.abs(wf), axis=axis, keepdims=True) / 127.0
        scale = jnp.maximum(scale, 1e-12)
        q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
        out[name] = {"q": q, "s": jnp.squeeze(scale, axis=axis)}
    return out


def _mm(x: jax.Array, w: Any) -> jax.Array:
    """x @ w for a plain matrix, a quantized {"q","s"} pair, or a
    LoRA-wrapped {"w","a","b","s"} leaf (models/lora.py): base matmul +
    the rank-r update x@a@b scaled by s — the (in, out) product is
    never materialized, and the base may itself be quantized."""
    if isinstance(w, dict):
        if "a" in w:  # LoRA wrapper
            y = _mm(x, w["w"])
            lo = (x @ w["a"].astype(x.dtype)) @ w["b"].astype(x.dtype)
            return y + lo * w["s"].astype(x.dtype)
        y = x @ w["q"].astype(x.dtype)
        return y * w["s"].astype(x.dtype)
    return x @ w


def _take_emb(emb: Any, ids: jax.Array, dt: jnp.dtype) -> jax.Array:
    if isinstance(emb, dict):
        rows = jnp.take(emb["q"], ids, axis=0).astype(dt)
        return rows * jnp.take(emb["s"], ids, axis=0)[..., None].astype(dt)
    return jnp.take(emb, ids, axis=0).astype(dt)


def init_kv_cache(cfg: DecoderConfig, batch: int,
                  length: Optional[int] = None) -> Tuple[Any, Any]:
    """`length` sizes the slot axis (default cfg.max_len). `generate`
    right-sizes it to prompt_T + max_new — attention reads scale with
    the request, not the model's maximum context.

    With cfg.kv_quant each cache is ``{"q": int8, "s": f32 per
    (slot, kv-head)}`` instead of one cfg.dtype array."""
    shape = (cfg.num_layers, batch, length or cfg.max_len,
             cfg.kv_heads, cfg.head_dim)

    # distinct buffers per plane: callers that donate the caches into a
    # jitted step (llm/scheduler.py) must not hand one buffer in twice
    def one():
        if cfg.kv_quant:
            return {"q": jnp.zeros(shape, jnp.int8),
                    "s": jnp.zeros(shape[:-1], jnp.float32)}
        return jnp.zeros(shape, jnp.dtype(cfg.dtype))

    return one(), one()


def _kv_quantize(x: jax.Array) -> Dict[str, jax.Array]:
    """(..., hd) -> int8 rows + one f32 scale per row (max-abs / 127)."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-12) / 127.0
    q = jnp.clip(jnp.round(xf / s[..., None]), -127, 127).astype(jnp.int8)
    return {"q": q, "s": s}


def cache_len(cache: Any) -> int:
    """Slot-axis length of a cache in either representation."""
    return (cache["q"] if isinstance(cache, dict) else cache).shape[2]


# ----------------------------------------------------------------- forward


def _attn_kernel_ok(cfg: DecoderConfig, seq_len: int) -> bool:
    from ..ops.decode_attn import supported

    return supported(seq_len=seq_len, kv_heads=cfg.kv_heads,
                     head_dim=cfg.head_dim)


def _rmsnorm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    n = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (n * w.astype(jnp.float32)).astype(x.dtype)


def _rope(positions: jax.Array, cfg: DecoderConfig) -> Tuple[jax.Array, jax.Array]:
    """cos/sin (B, T, head_dim) in the HF rotate-half convention
    (freqs repeated across both halves). rope_kind applies the HF
    `rope_scaling` schemes: "linear" divides every frequency by the
    factor; "llama3" keeps high frequencies, divides low frequencies,
    and smoothly interpolates the band between (the Llama-3.x long-
    context recipe, modeling_rope_utils._compute_llama3_parameters)."""
    hd = cfg.head_dim
    inv = 1.0 / (cfg.rope_theta
                 ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
    if cfg.rope_kind == "linear":
        inv = inv / cfg.rope_factor
    elif cfg.rope_kind == "llama3":
        two_pi = 2.0 * np.pi
        wavelen = two_pi / inv
        low_wl = cfg.rope_original_max_len / cfg.rope_low_freq_factor
        high_wl = cfg.rope_original_max_len / cfg.rope_high_freq_factor
        smooth = (cfg.rope_original_max_len / wavelen
                  - cfg.rope_low_freq_factor) / (
            cfg.rope_high_freq_factor - cfg.rope_low_freq_factor)
        smooth = jnp.clip(smooth, 0.0, 1.0)
        scaled = (1.0 - smooth) * inv / cfg.rope_factor + smooth * inv
        inv = jnp.where(wavelen < high_wl, inv,
                        jnp.where(wavelen > low_wl,
                                  inv / cfg.rope_factor, scaled))
    elif cfg.rope_kind != "none":
        raise ValueError(f"unknown rope_kind {cfg.rope_kind!r}")
    freqs = positions.astype(jnp.float32)[..., None] * inv  # (B,T,hd/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    # x: (B, T, n_heads, head_dim); cos/sin: (B, T, head_dim)
    half = x.shape[-1] // 2
    rot = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
    c = cos[:, :, None, :].astype(x.dtype)
    s = sin[:, :, None, :].astype(x.dtype)
    return x * c + rot * s


def forward(
    params: Dict[str, Any],
    cfg: DecoderConfig,
    ids: jax.Array,                    # (B, T) int32
    positions: jax.Array,              # (B, T) int32 absolute positions
    cache_k: jax.Array,                # (L, B, S, KVH, hd)
    cache_v: jax.Array,
    *,
    write_slot: Optional[jax.Array] = None,  # decode: SCALAR slot, all rows
    slot_positions: Optional[jax.Array] = None,  # (B,S) abs pos per slot
    remat: bool = False,  # rematerialize each layer (training memory)
    lora: Optional[Dict[str, Any]] = None,  # per-ROW adapters, see below
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One forward pass over T tokens against the cache.

    Multi-LoRA serving (`lora`): {"aid": (B,) int32, "banks":
    {target: {"a": (L, N, in, r), "b": (L, N, r, out)}}} — each batch
    row applies ITS OWN adapter (index into the stacked banks;
    models/lora.py::lora_banks builds them with index 0 = the zero
    adapter, i.e. the base model). Rank-r deltas cost O(B*H*r) — noise
    next to the dense projections — so N fine-tunes share one frozen
    base in a single decode batch (the reference would run N Ollama
    model instances for this).

    Prefill (write_slot=None): T tokens are written at cache slots
    [0, T) — positions must be arange(T).
    Decode (write_slot given): every row's T tokens land at slots
    [write_slot, write_slot+T) (one dynamic_update_slice — the only
    cache write pattern that doesn't rewrite the whole cache per step).
    T=1 is the plain decode step; T=K+1 is a speculative verify block
    (models/speculative.py) — within-block causality comes from the
    slot_positions mask, so no extra plumbing is needed.

    Visibility: query at absolute position p sees slot s iff
    slot_positions[b, s] <= p. The default (slot_positions=None) is
    slot s holds position s — true for prefill and for unpadded
    single-row decode; `generate` passes the ragged-batch layout.

    Returns (hidden (B,T,H), cache_k', cache_v')."""
    B, T = ids.shape
    S = cache_len(cache_k)
    cfg_dt = jnp.dtype(cfg.dtype)
    x = _take_emb(params["tok_emb"], ids, cfg_dt)
    cos, sin = _rope(positions, cfg)
    if slot_positions is None:
        slots = jnp.arange(S, dtype=jnp.int32)[None, None, :]
    else:
        slots = slot_positions[:, None, :]
    mask = slots <= positions[:, :, None]
    neg = jnp.asarray(-1e30, jnp.float32)

    def proj(h, lp, name):
        """Dense projection + this row's rank-r LoRA delta (if any)."""
        y = _mm(h, lp[name])
        la = lp.get(name + ":la")      # (B, in, r) — per-row factors
        if la is None:
            return y
        lb = lp[name + ":lb"]          # (B, r, out)
        lo = jnp.einsum("bth,bhr->btr", h, la.astype(h.dtype))
        return y + jnp.einsum("btr,bro->bto", lo, lb.astype(h.dtype))

    def attend(x, lp, ck, cv):
        """attention out + FFN for one layer given its (updated) cache.

        int8 caches: the per-slot scale commutes past both contractions
        — K scales multiply the scores, V scales pre-multiply the probs
        — so the dequantized K/V matrices are never materialized and the
        MXU reads int8-sized operands."""
        q = proj(_rmsnorm(x, lp["attn_norm"], cfg.eps), lp, "wq")
        if "bq" in lp:  # Qwen2-family projection bias, pre-RoPE
            q = q + lp["bq"].astype(q.dtype)
        q = q.reshape(B, T, cfg.heads, cfg.head_dim)
        q = _apply_rope(q, cos, sin)
        # grouped-query attention without materializing repeated K/V
        qg = q.reshape(B, T, cfg.kv_heads, cfg.q_groups, cfg.head_dim)
        if (cfg.kv_quant and cfg.attn_kernel and T == 1
                and _attn_kernel_ok(cfg, S)):
            # fused Pallas flash-decode over the int8 cache (opt-in;
            # see ops/decode_attn.py STATUS for when it pays)
            from ..ops.decode_attn import decode_attend_int8

            out = decode_attend_int8(qg.astype(jnp.bfloat16), ck, cv,
                                     mask[:, 0, :])
            x = x + proj(out.astype(cfg_dt).reshape(
                B, T, cfg.heads * cfg.head_dim), lp, "wo")
            h = _rmsnorm(x, lp["ffn_norm"], cfg.eps)
            return x + proj(
                jax.nn.silu(proj(h, lp, "w_gate")) * proj(h, lp, "w_up"),
                lp, "w_down")
        kv = (lambda c: c["q"].astype(cfg_dt)) if cfg.kv_quant else (
            lambda c: c)
        scores = jnp.einsum("btkgh,bskh->bkgts", qg, kv(ck),
                            preferred_element_type=jnp.float32)
        if cfg.kv_quant:
            scores = scores * ck["s"].transpose(0, 2, 1)[:, :, None, None, :]
        scores = scores / np.sqrt(cfg.head_dim)
        scores = jnp.where(mask[:, None, None, :, :], scores, neg)
        probs = jax.nn.softmax(scores, axis=-1)
        if cfg.kv_quant:
            probs = probs * cv["s"].transpose(0, 2, 1)[:, :, None, None, :]
        out = jnp.einsum("bkgts,bskh->btkgh", probs.astype(cfg_dt), kv(cv))
        x = x + proj(out.reshape(B, T, cfg.heads * cfg.head_dim), lp, "wo")
        h = _rmsnorm(x, lp["ffn_norm"], cfg.eps)
        x = x + proj(jax.nn.silu(proj(h, lp, "w_gate"))
                     * proj(h, lp, "w_up"), lp, "w_down")
        return x

    def new_kv(x, lp):
        h = _rmsnorm(x, lp["attn_norm"], cfg.eps)
        k, v = proj(h, lp, "wk"), proj(h, lp, "wv")
        if "bk" in lp:
            k = k + lp["bk"].astype(k.dtype)
            v = v + lp["bv"].astype(v.dtype)
        k = k.reshape(B, T, cfg.kv_heads, cfg.head_dim)
        v = v.reshape(B, T, cfg.kv_heads, cfg.head_dim)
        k, v = _apply_rope(k, cos, sin), v
        if cfg.kv_quant:
            return _kv_quantize(k), _kv_quantize(v)
        return k, v

    layer_params = {k: params[k] for k in
                    ("attn_norm", "ffn_norm", "wq", "wk", "wv", "wo",
                     "w_gate", "w_up", "w_down", "bq", "bk", "bv")
                    if k in params}
    if lora is not None:
        # select each row's factors ONCE (gather over the adapter axis);
        # the (L, B, in, r) results slice per layer exactly like the
        # stacked weights, in both the scan and the unrolled paths.
        for t, bank in lora["banks"].items():
            layer_params[t + ":la"] = jnp.take(bank["a"], lora["aid"],
                                               axis=1)
            layer_params[t + ":lb"] = jnp.take(bank["b"], lora["aid"],
                                               axis=1)

    if write_slot is None:
        # prefill/training: caches flow xs -> ys (the bulk [0,T) write IS
        # the scan output; nothing smaller to write).
        def layer_step(x, scanned):
            lp, ck, cv = scanned
            k, v = new_kv(x, lp)
            write = lambda c, n: jax.tree.map(
                lambda d, s: jax.lax.dynamic_update_slice(
                    d, s, (0,) * d.ndim), c, n)
            ck, cv = write(ck, k), write(cv, v)
            return attend(x, lp, ck, cv), (ck, cv)

        step = jax.checkpoint(layer_step) if remat else layer_step
        x, (cache_k, cache_v) = jax.lax.scan(
            step, x, (layer_params, cache_k, cache_v))
        return x, cache_k, cache_v

    # decode: the full (L,...) caches are updated in place and each layer
    # writes ONLY its new (B,1,KVH,hd) row — an xs->ys layout would
    # rewrite every layer's whole (B,S) slice per token, turning each
    # step into a full-cache HBM pass.
    unroll = cfg.decode_unroll
    if unroll is None:
        # auto: the scan path's per-layer dynamic-slice copy costs
        # ~2 extra slab passes of HBM; the unrolled path carries a
        # small fixed scheduling cost. Crossover measured at ~10 MB
        # per-layer K slab (see DecoderConfig.decode_unroll).
        plane = 1 if cfg.kv_quant else jnp.dtype(cfg.dtype).itemsize
        unroll = (B * S * cfg.kv_heads * cfg.head_dim * plane
                  >= 10 * 2 ** 20)
    if unroll:
        # Static layer indices: `d[i]` is a zero-copy view of the
        # stacked cache and the dynamic_update_slice aliases in place,
        # so per-step HBM traffic is exactly one cache read (the
        # attention contractions) + one row write. The lax.scan path
        # below reads layer i out of the carry with a DYNAMIC index,
        # which XLA materializes as a (B,S,KVH,hd) copy per layer
        # (the isolated attention chain runs at ~600 GB/s while the
        # full scan-path step implied ~126 GB/s on the cache term).
        for i in range(cfg.num_layers):
            lp = jax.tree.map(lambda p: p[i], layer_params)
            k, v = new_kv(x, lp)
            write = lambda c, n, _i=i: jax.tree.map(
                lambda d, s: jax.lax.dynamic_update_slice(
                    d, s[None], (_i, 0, write_slot) + (0,) * (d.ndim - 3)),
                c, n)
            cache_k, cache_v = write(cache_k, k), write(cache_v, v)
            view = lambda c, _i=i: jax.tree.map(lambda d: d[_i], c)
            x = attend(x, lp, view(cache_k), view(cache_v))
        return x, cache_k, cache_v

    def dec_step(carry, scanned):
        x, full_k, full_v = carry
        lp, i = scanned
        k, v = new_kv(x, lp)
        write = lambda c, n: jax.tree.map(
            lambda d, s: jax.lax.dynamic_update_slice(
                d, s[None], (i, 0, write_slot) + (0,) * (d.ndim - 3)),
            c, n)
        layer = lambda c: jax.tree.map(
            lambda d: jax.lax.dynamic_slice(
                d, (i,) + (0,) * (d.ndim - 1), (1,) + d.shape[1:])[0], c)
        full_k, full_v = write(full_k, k), write(full_v, v)
        return (attend(x, lp, layer(full_k), layer(full_v)),
                full_k, full_v), None

    (x, cache_k, cache_v), _ = jax.lax.scan(
        dec_step, (x, cache_k, cache_v),
        (layer_params, jnp.arange(cfg.num_layers, dtype=jnp.int32)))
    return x, cache_k, cache_v


def _project(params: Dict[str, Any], cfg: DecoderConfig,
             hidden: jax.Array) -> jax.Array:
    """final RMSNorm + LM head -> f32 logits."""
    h = _rmsnorm(hidden, params["final_norm"], cfg.eps)
    return _mm(h, params["lm_head"]).astype(jnp.float32)


def prefill(params: Dict[str, Any], cfg: DecoderConfig, ids: jax.Array,
            prompt_len: jax.Array, cache_k: jax.Array, cache_v: jax.Array,
            lora: Optional[Dict[str, Any]] = None,
            ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Run the prompt; return (last-token logits (B,V), cache', cache').

    `ids` is right-padded; `prompt_len` (B,) selects each row's final
    real token so only B rows hit the LM head (never (B,T,V))."""
    B, T = ids.shape
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    x, cache_k, cache_v = forward(params, cfg, ids, positions,
                                  cache_k, cache_v, lora=lora)
    last = jnp.take_along_axis(
        x, (prompt_len - 1)[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    return _project(params, cfg, last), cache_k, cache_v


def decode_step(params: Dict[str, Any], cfg: DecoderConfig,
                token: jax.Array, pos: jax.Array, slot: jax.Array,
                cache_k: jax.Array, cache_v: jax.Array,
                slot_positions: Optional[jax.Array] = None,
                lora: Optional[Dict[str, Any]] = None,
                ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One token per row at per-row position `pos` (B,), written at the
    shared scalar cache `slot`. Returns (logits (B,V), cache', cache')."""
    x, cache_k, cache_v = forward(
        params, cfg, token[:, None], pos[:, None],
        cache_k, cache_v, write_slot=slot, slot_positions=slot_positions,
        lora=lora)
    return _project(params, cfg, x[:, 0]), cache_k, cache_v


@partial(jax.jit, static_argnums=(1,))
def score_continuations(params: Dict[str, Any], cfg: DecoderConfig,
                        ids: jax.Array, prompt_len: jax.Array,
                        total_len: jax.Array) -> jax.Array:
    """Exact log P(continuation | prompt) for C candidates in ONE
    teacher-forced forward.

    ids (C, T): each row = the SAME prompt followed by one candidate
    continuation, right-padded; prompt_len/total_len (C,) delimit the
    scored span. Returns (C,) summed token log-probs — argmax is a
    GUARANTEED-valid choice (the constrained-decoding answer for
    enum/classification structured outputs: instead of hoping sampling
    emits a valid string and retrying, score the finite candidate set;
    parity+: the reference leans on OpenAI's server-side structured
    output, openai.py:115-166)."""
    C, T = ids.shape
    z1, z2 = init_kv_cache(cfg, C, T)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None],
                                 (C, T))
    x, _, _ = forward(params, cfg, ids, positions, z1, z2)
    lp = jax.nn.log_softmax(_project(params, cfg, x)[:, :-1], axis=-1)
    tok_lp = jnp.take_along_axis(
        lp, ids[:, 1:, None].astype(jnp.int32), axis=-1)[..., 0]  # (C,T-1)
    j = jnp.arange(T - 1, dtype=jnp.int32)[None, :]
    m = ((j >= prompt_len[:, None] - 1)
         & (j < total_len[:, None] - 1)).astype(tok_lp.dtype)
    return jnp.sum(tok_lp * m, axis=1)


# ---------------------------------------------------------------- sampling


def topk_logits(logits: jax.Array, top_k: int) -> Tuple[jax.Array, jax.Array]:
    """Sampling candidate set: top-k (values, indices), sorted desc.

    One definition shared by `sample_logits` and the speculative
    verifier's `_filtered_probs` so the drafted and plain paths draw
    from the SAME truncated distribution. Large vocabularies use
    `approx_max_k` — see `sample_logits`."""
    k = min(top_k, logits.shape[-1])
    if logits.shape[-1] >= 4096:
        return jax.lax.approx_max_k(logits, k, recall_target=0.99)
    return jax.lax.top_k(logits, k)


def sample_logits(logits: jax.Array, rng: jax.Array, *,
                  temperature: float, top_k: int, top_p: float) -> jax.Array:
    """Temperature -> top-k -> nucleus within the top-k -> categorical.

    top-k first keeps the nucleus sort to a static-k slice instead of a
    full-vocab sort (vocab-sized sorts are hostile to the TPU; `k` is
    static so this is one small `lax.top_k`). temperature==0 is argmax.

    Large vocabularies use `approx_max_k` (the TPU-native tiled
    reduction): exact top-k over a 32k vocab costs ~0.6 ms/step at
    batch 64 — a quarter of the whole decode step — while the approx
    pass (recall_target 0.99, then exact-sorted within the candidate
    set) is near-free. Any true top-k member it misses is deep in the
    tail the top-p cut discards anyway.
    """
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    vals, idx = topk_logits(logits / temperature, top_k)  # sorted desc
    if top_p < 1.0:
        probs = jax.nn.softmax(vals, axis=-1)
        csum = jnp.cumsum(probs, axis=-1)
        keep = (csum - probs) < top_p  # first token always kept
        vals = jnp.where(keep, vals, -jnp.inf)
    choice = jax.random.categorical(rng, vals, axis=-1)
    return jnp.take_along_axis(idx, choice[:, None], axis=1)[:, 0].astype(
        jnp.int32)


# -------------------------------------------------------------- generation


@partial(jax.jit, static_argnums=(1, 4, 8, 9, 10, 12, 13))
def generate_logprobs(params: Dict[str, Any], cfg: DecoderConfig,
                      ids: jax.Array, prompt_len: jax.Array, max_new: int,
                      eos_id: int, pad_id: int, rng: jax.Array,
                      temperature: float = 0.0, top_k: int = 64,
                      top_p: float = 1.0,
                      lora: Optional[Dict[str, Any]] = None,
                      presence: float = 0.0, frequency: float = 0.0,
                      constraint: Optional[Dict[str, Any]] = None,
                      logit_bias: Optional[jax.Array] = None,  # (V,) f32
                      ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """`generate` that also returns each emitted token's RAW model
    log-probability (log-softmax of the unscaled logits — temperature/
    top-k/top-p shape the sampling, not the reported number, matching
    the OpenAI logprobs convention). lps (B, max_new) f32, 0.0 at pad
    positions. Same compiled program cost — one extra (B,) gather and
    buffer per step."""
    B, T = ids.shape
    eos = jnp.asarray(eos_id, jnp.int32)
    pad = jnp.asarray(pad_id, jnp.int32)
    # cache sized to this request: prompt slots [0,T) + one slot per
    # decode step. Generated tokens live at slot T+step for EVERY row
    # (one scalar dynamic_update_slice per step); slot_pos carries each
    # slot's true per-row position for the visibility mask — prompt pad
    # slots get 2**30 so no query ever attends them.
    S = T + max_new
    if cfg.kv_quant and cfg.attn_kernel:
        # round the slot axis up so the fused decode kernel tiles it
        # exactly; the extra slots carry slot_pos > every query position
        # (slot T+j has position pl+j, and queries stop at pl+max_new-1)
        # so they are never visible and never written.
        from ..ops.decode_attn import pick_block

        if pick_block(S) is None:
            S = -(-S // 256) * 256
    cache_k, cache_v = init_kv_cache(cfg, B, S)
    s_idx = jnp.arange(S, dtype=jnp.int32)[None, :]
    pl = prompt_len.astype(jnp.int32)[:, None]
    slot_pos = jnp.where(
        s_idx < T,
        jnp.where(s_idx < pl, s_idx, jnp.asarray(2 ** 30, jnp.int32)),
        pl + (s_idx - T))
    logits, cache_k, cache_v = prefill(
        params, cfg, ids, prompt_len, cache_k, cache_v, lora=lora)

    # OpenAI-law sampling penalties (presence/frequency are STATIC, so
    # the counts plane and its per-step update exist only when used):
    # logits - presence*[count>0] - frequency*count over ALL text so
    # far (prompt included). Reported logprobs stay RAW model numbers
    # (the OpenAI convention) — penalties shape sampling only.
    penalize = presence != 0.0 or frequency != 0.0
    rows_b = jnp.arange(B, dtype=jnp.int32)
    # grammar constraint (models/constrain.py): per-row DFA state; each
    # step masks the sampling logits to the grammar's allowed tokens
    # (plus eos exactly in accepting states), then steps the DFA by the
    # consumed token — output is schema-valid by construction.
    vocab_iota = (jnp.arange(cfg.vocab_size, dtype=jnp.int32)
                  if constraint is not None else None)
    if penalize:
        in_prompt = (jnp.arange(T, dtype=jnp.int32)[None, :]
                     < prompt_len[:, None]).astype(jnp.int32)
        counts0 = jnp.zeros((B, cfg.vocab_size), jnp.int32
                            ).at[rows_b[:, None], ids].add(in_prompt)
    else:
        counts0 = jnp.zeros((B, 1), jnp.int32)  # placeholder carry

    def emit(logits, counts, gstate, step, done, rng):
        sample_from = logits
        if logit_bias is not None:  # OpenAI logit_bias: additive, (V,)
            sample_from = sample_from + logit_bias[None, :].astype(
                sample_from.dtype)
        if penalize:  # compose WITH logit_bias, not instead of it
            sample_from = (sample_from
                           - presence * (counts > 0).astype(logits.dtype)
                           - frequency * counts.astype(logits.dtype))
        if constraint is not None:
            allowed = constraint["table"][gstate] >= 0       # (B, V)
            allowed = jnp.logical_or(
                allowed, jnp.logical_and(
                    constraint["accept"][gstate][:, None],
                    vocab_iota[None, :] == eos))
            sample_from = jnp.where(allowed, sample_from,
                                    jnp.asarray(-1e30, sample_from.dtype))
        tok = sample_logits(sample_from, jax.random.fold_in(rng, step),
                            temperature=temperature, top_k=top_k,
                            top_p=top_p)
        lp = jnp.take_along_axis(jax.nn.log_softmax(logits, axis=-1),
                                 tok[:, None], axis=1)[:, 0]
        return (jnp.where(done, pad, tok),
                jnp.where(done, jnp.asarray(0.0, jnp.float32), lp))

    def cond(st):
        step, done = st[0], st[1]
        return jnp.logical_and(step < max_new, ~jnp.all(done))

    def body(st):
        (step, done, tok, tok_lp, pos, out, lps, counts, gstate,
         ck, cv, rng) = st
        out = jax.lax.dynamic_update_slice(out, tok[None, :], (step, 0))
        lps = jax.lax.dynamic_update_slice(lps, tok_lp[None, :], (step, 0))
        newly_done = jnp.logical_or(done, tok == eos)
        if penalize:  # the consumed token joins "the text so far"
            counts = counts.at[rows_b, tok].add(
                (~newly_done).astype(jnp.int32))
        if constraint is not None:
            gstate = jnp.where(
                newly_done, gstate,
                constraint["table"][gstate, jnp.clip(tok, 0, None)])
            gstate = jnp.maximum(gstate, 0)  # never index with DEAD
        logits, ck, cv = decode_step(params, cfg, tok, pos, T + step,
                                     ck, cv, slot_positions=slot_pos,
                                     lora=lora)
        nxt, nlp = emit(logits, counts, gstate, step, newly_done, rng)
        # rows that just emitted eos stop: their buffered token stays pad
        return (step + 1, newly_done, nxt, nlp,
                jnp.where(newly_done, pos, pos + 1), out, lps, counts,
                gstate, ck, cv, rng)

    gstate0 = jnp.zeros((B,), jnp.int32)
    first, first_lp = emit(logits, counts0, gstate0, max_new,
                           jnp.zeros((B,), bool), rng)
    out0 = jnp.full((max_new, B), pad, jnp.int32)
    lps0 = jnp.zeros((max_new, B), jnp.float32)
    st = (jnp.asarray(0, jnp.int32), jnp.zeros((B,), bool), first,
          first_lp, prompt_len.astype(jnp.int32), out0, lps0, counts0,
          gstate0, cache_k, cache_v, rng)
    step, done, tok, tok_lp, pos, out, lps, *_ = jax.lax.while_loop(
        cond, body, st)
    out = out.T  # (B, max_new)
    lps = jnp.where(out != pad, lps.T, 0.0)
    return out, jnp.sum(out != pad, axis=1), lps


def generate(params: Dict[str, Any], cfg: DecoderConfig,
             ids: jax.Array, prompt_len: jax.Array, max_new: int,
             eos_id: int, pad_id: int, rng: jax.Array,
             temperature: float = 0.0, top_k: int = 64,
             top_p: float = 1.0,
             lora: Optional[Dict[str, Any]] = None,
             presence: float = 0.0, frequency: float = 0.0,
             constraint: Optional[Dict[str, Any]] = None,
             logit_bias: Optional[jax.Array] = None,
             ) -> Tuple[jax.Array, jax.Array]:
    """Fused batch generation: prefill + `lax.while_loop` decode in ONE
    dispatch. Returns (tokens (B, max_new) int32 — pad_id after each
    row's eos — and n_generated (B,)).

    eos_id / pad_id ride the carry as traced values; shapes depend only
    on (cfg, B, T, max_new, sampling knobs), so one compilation serves
    every prompt. (`generate_logprobs` returns per-token log-probs too,
    from the same compiled program.)"""
    out, n, _ = generate_logprobs(params, cfg, ids, prompt_len, max_new,
                                  eos_id, pad_id, rng, temperature,
                                  top_k, top_p, lora, presence, frequency,
                                  constraint, logit_bias)
    return out, n


def make_decode_step(params: Dict[str, Any], cfg: DecoderConfig):
    """Jitted single-token step for streaming (`LocalLLM.stream`): one
    device dispatch per emitted token, compiled once. Unpadded rows only
    (slot == position — true for the B=1 streaming path), so the default
    slot layout applies."""
    @partial(jax.jit, static_argnums=(5, 6, 7))
    def _step(token, pos, cache_k, cache_v, rng,
              temperature: float, top_k: int, top_p: float):
        logits, cache_k, cache_v = decode_step(
            params, cfg, token, pos, pos[0], cache_k, cache_v)
        nxt = sample_logits(logits, rng, temperature=temperature,
                            top_k=top_k, top_p=top_p)
        return nxt, cache_k, cache_v

    return _step
