"""LoRA fine-tuning for the decoder: rank-r adapters on the attention
projections, trained with the base frozen.

Parity+: the reference has NO training tier — its local generation
quality is whatever checkpoint it downloads (HF local client,
app/core/models/huggingface/huggingface.py:17-22). This closes the
adaptation loop on-chip: a 7B-class base (optionally weight-only int8,
models/decoder.py) stays frozen in HBM while only the O(r*(in+out))
adapter factors train — optimizer state shrinks by ~1000x versus full
fine-tuning, so adaptation fits the same single chip that serves.

TPU-first design:
  * adapters keep the decoder's STACKED-layer layout ((L, in, r) and
    (L, r, out)) so the same `lax.scan` runs wrapped layers — no
    per-layer Python, no second forward implementation: `decoder._mm`
    recognizes the {"w","a","b","s"} leaf and adds `x@a@b*s` without
    ever materializing the (in, out) product;
  * the base may be the int8 weight-only tree — LoRA-over-quantized
    composes (QLoRA-style serving: frozen int8 base + bf16 factors);
  * training takes gradients ONLY through the (a, b) factors: the
    optimizer sees a tree that is just the adapters, so AdamW moments
    cost megabytes, not gigabytes.

`lora_merge` folds the factors back into plain matrices for zero-cost
serving once adaptation is done.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .decoder import DecoderConfig, _project, forward
from .train import TrainState

DEFAULT_TARGETS = ("wq", "wk", "wv", "wo")


def _base(w: Any) -> jax.Array:
    """Dense view of a (possibly quantized) base matmul weight.
    Quantized leaves carry one scale per OUTPUT channel (the squeezed
    contraction axis, quantize_decoder_params): q (L, in, out), s
    (L, out)."""
    if isinstance(w, dict):  # {"q","s"} weight-only int8
        return (w["q"].astype(jnp.float32)
                * w["s"][..., None, :].astype(jnp.float32))
    return w


def lora_init(rng: jax.Array, params: Dict[str, Any], *, r: int = 8,
              alpha: float = 16.0,
              targets: Sequence[str] = DEFAULT_TARGETS) -> Dict[str, Any]:
    """Wrap each target projection as {"w": base, "a", "b", "s"}.

    a ~ N(0, 1/in), b = 0 — the wrapped model computes EXACTLY the base
    model at init (asserted in tests). s = alpha/r in a (L,1,1) leaf so
    the layer scan can carry it."""
    out = dict(params)
    keys = iter(jax.random.split(rng, len(targets)))
    for name in targets:
        w = params[name]
        leaf = w["q"] if isinstance(w, dict) else w
        L, fan_in, fan_out = leaf.shape
        a = (jax.random.normal(next(keys), (L, fan_in, r), jnp.float32)
             / np.sqrt(fan_in)).astype(jnp.bfloat16)
        b = jnp.zeros((L, r, fan_out), jnp.bfloat16)
        s = jnp.full((L, 1, 1), alpha / r, jnp.float32)
        out[name] = {"w": w, "a": a, "b": b, "s": s}
    return out


def lora_adapters(params: Dict[str, Any]) -> Dict[str, Any]:
    """The trainable sub-tree: {name: {"a", "b"}} for wrapped leaves."""
    return {name: {"a": w["a"], "b": w["b"]}
            for name, w in params.items()
            if isinstance(w, dict) and "a" in w}


def lora_apply(params: Dict[str, Any],
               adapters: Dict[str, Any]) -> Dict[str, Any]:
    """Graft adapter factors back onto the wrapped tree (pure)."""
    out = dict(params)
    for name, ab in adapters.items():
        out[name] = {**params[name], "a": ab["a"], "b": ab["b"]}
    return out


def lora_merge(params: Dict[str, Any]) -> Dict[str, Any]:
    """Fold every adapter into a plain dense matrix (w + a@b*s) for
    zero-overhead serving. Quantized bases dequantize in the fold (the
    merged matrix can be re-quantized with quantize_decoder_params)."""
    out = {}
    for name, w in params.items():
        if isinstance(w, dict) and "a" in w:
            merged = (_base(w["w"]).astype(jnp.float32)
                      + (w["a"].astype(jnp.float32)
                         @ w["b"].astype(jnp.float32)) * w["s"])
            ref = w["w"]["q"] if isinstance(w["w"], dict) else w["w"]
            dt = ref.dtype if ref.dtype != jnp.int8 else jnp.bfloat16
            out[name] = merged.astype(dt)
        else:
            out[name] = w
    return out


def lora_wrap_with(params: Dict[str, Any], adapters: Dict[str, Any], *,
                   alpha: float = 16.0) -> Dict[str, Any]:
    """Wrap a base tree with ALREADY-TRAINED factors (e.g. from
    `load_adapters`) — rank comes from the factor shapes. A scale
    embedded in the artifact wins over the `alpha` fallback (it is the
    strength the factors were trained at)."""
    out = dict(params)
    for name, ab in adapters.items():
        L, _, r = ab["a"].shape
        s = ab.get("s")
        if s is None:
            s = jnp.full((L, 1, 1), alpha / r, jnp.float32)
        out[name] = {"w": params[name], "a": ab["a"], "b": ab["b"], "s": s}
    return out


def lora_banks(adapter_trees: Sequence[Dict[str, Any]], *,
               alpha: float = 16.0,
               dtype=jnp.bfloat16) -> Dict[str, Dict[str, jax.Array]]:
    """Stack N adapter artifacts into per-row-selectable serving banks.

    Input: a list of `load_adapters`-shaped trees ({target: {"a":
    (L, in, r_i), "b": (L, r_i, out), optional "s": (L, 1, 1)}}).
    Output: {target: {"a": (L, N+1, in, R), "b": (L, N+1, R, out)}}
    where R = max rank (shorter adapters zero-pad — zero columns are
    exact no-ops) and index 0 is the ZERO adapter, i.e. the base
    model. Each adapter's scale (or alpha/r fallback) folds into its
    "b" factors, so serving applies plain x@a@b.

    `decoder.forward(..., lora={"aid": row_indices, "banks": ...})`
    then serves N fine-tunes from one frozen base in a single batch —
    the multi-LoRA pattern the reference would need N model-server
    instances for (one Ollama model per fine-tune)."""
    targets: Dict[str, Dict[str, list]] = {}
    names = sorted({t for tree in adapter_trees for t in tree})
    if not names:
        return {}
    rmax = max(tree[t]["a"].shape[-1]
               for tree in adapter_trees for t in tree if t in tree)
    for t in names:
        a_rows, b_rows = [], []
        for tree in adapter_trees:
            ab = tree.get(t)
            if ab is None:
                a_rows.append(None)
                b_rows.append(None)
                continue
            L, fan_in, r = ab["a"].shape
            out = ab["b"].shape[-1]
            s = ab.get("s")
            s = (jnp.full((L, 1, 1), alpha / r, jnp.float32)
                 if s is None else s)
            a = jnp.zeros((L, fan_in, rmax), dtype).at[:, :, :r].set(
                ab["a"].astype(dtype))
            b = jnp.zeros((L, rmax, out), dtype).at[:, :r, :].set(
                (ab["b"].astype(jnp.float32) * s).astype(dtype))
            a_rows.append(a)
            b_rows.append(b)
        L = next(x for x in a_rows if x is not None).shape[0]
        fan_in = next(x for x in a_rows if x is not None).shape[1]
        out = next(x for x in b_rows if x is not None).shape[2]
        za = jnp.zeros((L, fan_in, rmax), dtype)
        zb = jnp.zeros((L, rmax, out), dtype)
        a_stack = [za] + [za if a is None else a for a in a_rows]
        b_stack = [zb] + [zb if b is None else b for b in b_rows]
        targets[t] = {"a": jnp.stack(a_stack, axis=1),
                      "b": jnp.stack(b_stack, axis=1)}
    return targets


def save_adapters(adapters: Dict[str, Any], path: str, *,
                  wrapped: Dict[str, Any] = None) -> None:
    """npz of the adapter factors alone (megabytes — the artifact a
    fine-tune ships; the base checkpoint is unchanged by design).

    Pass the `wrapped` tree to embed each target's trained scale s
    (alpha/r): without it, whoever loads the artifact must supply the
    SAME alpha the training run used or the adapter applies at the
    wrong strength."""
    flat = {}
    for name, ab in adapters.items():
        flat[f"{name}.a"] = np.asarray(ab["a"].astype(jnp.float32))
        flat[f"{name}.b"] = np.asarray(ab["b"].astype(jnp.float32))
        if wrapped is not None and isinstance(wrapped.get(name), dict):
            flat[f"{name}.s"] = np.asarray(wrapped[name]["s"], np.float32)
    np.savez(path, **flat)


def load_adapters(path: str, dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Inverse of save_adapters; graft with `lora_apply` (training
    shape) or `lora_wrap_with` (serving). Scales stay f32."""
    raw = np.load(path)
    out: Dict[str, Any] = {}
    for key in raw.files:
        name, part = key.rsplit(".", 1)
        dt = jnp.float32 if part == "s" else dtype
        out.setdefault(name, {})[part] = jnp.asarray(raw[key], dt)
    return out


def make_lora_train_step(cfg: DecoderConfig, optimizer, *,
                         remat: bool = True) -> Callable:
    """Causal-LM step that differentiates ONLY the adapter factors.

    state.params holds just the adapters; the frozen wrapped tree is a
    closure-free explicit argument so it can live sharded on device:
    step(state, frozen_params, batch) -> (state, metrics)."""

    def loss_fn(adapters, frozen, batch):
        params = lora_apply(frozen, adapters)
        ids, mask = batch["ids"], batch["mask"]
        B, T = ids.shape
        z = jnp.zeros((cfg.num_layers, B, T, cfg.kv_heads, cfg.head_dim),
                      jnp.dtype(cfg.dtype))
        positions = jnp.broadcast_to(
            jnp.arange(T, dtype=jnp.int32)[None], (B, T))
        x, _, _ = forward(params, cfg, ids, positions, z, z, remat=remat)
        logits = _project(params, cfg, x)[:, :-1]
        targets = ids[:, 1:]
        lp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(lp, targets[..., None], axis=-1)[..., 0]
        m = mask[:, 1:].astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(m), 1.0)
        loss = jnp.sum(nll * m) / denom
        acc = jnp.sum((jnp.argmax(logits, -1) == targets) * m) / denom
        return loss, acc

    def train_step(state: TrainState, frozen, batch
                   ) -> Tuple[TrainState, dict]:
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, frozen, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        adapters = optax.apply_updates(state.params, updates)
        return (TrainState(params=adapters, opt_state=opt_state,
                           step=state.step + 1),
                {"loss": loss, "accuracy": acc})

    return train_step
