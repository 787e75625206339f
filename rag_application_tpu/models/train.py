"""Encoder training: contrastive fine-tuning on TPU meshes.

The reference has no training loop — its embedding quality is whatever
the remote model serves. A production retrieval stack needs to fine-tune
its encoder on its own corpus (the capability the reference outsources to
"pick a better model name"). This module implements the standard recipe:
InfoNCE over in-batch negatives (both directions), AdamW, bf16 forward /
f32 optimizer state, sharded DP over the `data` axis with optional tensor
parallelism over `model` (parallel/mesh.py rules). With the batch sharded,
XLA inserts the all-gather of the paired embeddings for the (B, B) logit
matrix automatically — in-batch negatives span the *global* batch.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from ..parallel.mesh import batch_sharding, param_shardings
from .encoder import EncoderState


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array


def make_optimizer(lr: float = 1e-4, weight_decay: float = 0.01):
    return optax.adamw(lr, weight_decay=weight_decay)


def contrastive_loss(za: jax.Array, zb: jax.Array,
                     temperature: float = 0.05) -> jax.Array:
    """Symmetric InfoNCE with in-batch negatives."""
    logits = za @ zb.T / temperature  # (B, B)
    labels = jnp.arange(za.shape[0])
    loss_a = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    loss_b = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    return jnp.mean(loss_a + loss_b) * 0.5


def matryoshka_contrastive_loss(
    za: jax.Array,
    zb: jax.Array,
    dims: Tuple[int, ...],
    temperature: float = 0.05,
) -> jax.Array:
    """Matryoshka representation learning: the InfoNCE objective applied
    at every prefix granularity (each prefix renormalized), so ranking
    information concentrates in the leading dimensions.

    This is what makes the engine's matryoshka cascade and the int8
    prefix scan (`IndexConfig.scan_prefix_dim`) *work*: the reference
    gets this property from its served model (qdrant_handler.py:148-150
    just slices), while here the encoder is trained for it. The full-dim
    loss is always included as the last term.
    """
    full = za.shape[-1]
    levels = sorted({min(d, full) for d in tuple(dims) + (full,)})
    total = jnp.zeros(())
    for d in levels:
        pa = za[:, :d]
        pb = zb[:, :d]
        pa = pa / jnp.maximum(jnp.linalg.norm(pa, axis=-1, keepdims=True), 1e-12)
        pb = pb / jnp.maximum(jnp.linalg.norm(pb, axis=-1, keepdims=True), 1e-12)
        total = total + contrastive_loss(pa, pb, temperature)
    return total / len(levels)


def make_train_step(
    model,
    optimizer,
    *,
    temperature: float = 0.05,
    matryoshka_dims: Tuple[int, ...] = (),
) -> Callable:
    """Returns train_step(state, batch) -> (state, metrics).

    batch = dict(ids_a, mask_a, ids_b, mask_b): two views of each pair
    (query/passage, or augmentations). Non-empty `matryoshka_dims`
    switches to the MRL objective (prefix-level InfoNCE at each dim).
    """

    def loss_fn(params, batch):
        za = model.apply(params, batch["ids_a"], batch["mask_a"])
        zb = model.apply(params, batch["ids_b"], batch["mask_b"])
        if matryoshka_dims:
            loss = matryoshka_contrastive_loss(za, zb, matryoshka_dims,
                                               temperature)
        else:
            loss = contrastive_loss(za, zb, temperature)
        acc = jnp.mean(
            jnp.argmax(za @ zb.T, axis=-1) == jnp.arange(za.shape[0])
        )
        return loss, acc

    def train_step(state: TrainState, batch) -> Tuple[TrainState, dict]:
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            {"loss": loss, "accuracy": acc},
        )

    return train_step


def make_lm_train_step(cfg, optimizer, *, remat: bool = True) -> Callable:
    """Causal-LM training step for the decoder (models/decoder.py):
    next-token cross-entropy with a padding mask, AdamW, per-layer
    rematerialization (trade FLOPs for HBM so depth scales).

    batch = dict(ids (B,T) int32 right-padded, mask (B,T) bool). The
    training forward reuses the inference `forward` with a T-sized cache
    (positions [0,T) written in one slice); logits over all positions,
    shifted targets. The reference has no training tier at all — its
    generation quality is the checkpoint it downloads; this closes the
    same loop the encoder trainer closes for retrieval."""
    import jax.numpy as jnp

    from .decoder import _project, forward

    def loss_fn(params, batch):
        ids, mask = batch["ids"], batch["mask"]
        B, T = ids.shape
        z = jnp.zeros((cfg.num_layers, B, T, cfg.kv_heads, cfg.head_dim),
                      jnp.dtype(cfg.dtype))
        positions = jnp.broadcast_to(
            jnp.arange(T, dtype=jnp.int32)[None], (B, T))
        x, _, _ = forward(params, cfg, ids, positions, z, z, remat=remat)
        logits = _project(params, cfg, x)[:, :-1]  # predict t+1
        targets = ids[:, 1:]
        lp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(lp, targets[..., None], axis=-1)[..., 0]
        m = mask[:, 1:].astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(m), 1.0)
        loss = jnp.sum(nll * m) / denom
        acc = jnp.sum((jnp.argmax(logits, -1) == targets) * m) / denom
        return loss, acc

    def train_step(state: TrainState, batch) -> Tuple[TrainState, dict]:
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=params, opt_state=opt_state,
                       step=state.step + 1),
            {"loss": loss, "accuracy": acc},
        )

    return train_step


def shard_lm_train_setup(mesh: Mesh, params, cfg, optimizer, *,
                         remat: bool = True):
    """Decoder-LM twin of `shard_train_setup`: params DP-replicated /
    TP-sharded by the same megatron-style rule, batch over `data`.
    Returns (state, jitted_step, batch_sharding)."""
    p_shard = param_shardings(mesh, params)
    params = jax.device_put(params, p_shard)
    opt_state = optimizer.init(params)
    state = TrainState(params=params, opt_state=opt_state,
                       step=jnp.zeros((), dtype=jnp.int32))
    jitted = jax.jit(make_lm_train_step(cfg, optimizer, remat=remat))
    return state, jitted, batch_sharding(mesh)


def save_train_state(state: TrainState, path: str) -> None:
    """Orbax checkpoint of params + optimizer state (the reference has no
    training, hence no model checkpointing to mirror; this is standard
    JAX practice for the encoder fine-tuning loop)."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, {"params": state.params,
                          "opt_state": state.opt_state,
                          "step": state.step}, force=True)


def load_train_state(path: str, optimizer, template: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, item={
            "params": template.params,
            "opt_state": template.opt_state,
            "step": template.step,
        })
    return TrainState(params=restored["params"],
                      opt_state=restored["opt_state"],
                      step=restored["step"])


def shard_train_setup(
    mesh: Mesh,
    enc: EncoderState,
    optimizer,
    *,
    temperature: float = 0.05,
    matryoshka_dims: Tuple[int, ...] = (),
):
    """Place params/opt-state on the mesh and jit the sharded train step.

    Returns (state, jitted_step, batch_sharding) — the caller shards each
    batch leaf with `jax.device_put(x, batch_sharding)`.
    """
    p_shard = param_shardings(mesh, enc.params)
    params = jax.device_put(enc.params, p_shard)
    opt_state = optimizer.init(params)
    state = TrainState(params=params, opt_state=opt_state,
                       step=jnp.zeros((), dtype=jnp.int32))

    step_fn = make_train_step(enc.model, optimizer, temperature=temperature,
                              matryoshka_dims=matryoshka_dims)
    b_shard = batch_sharding(mesh)

    jitted = jax.jit(step_fn)
    return state, jitted, b_shard
