"""JAX encoders: text (768-d, v1 parity) and multimodal (2048-d, v2 parity).

Replaces the reference's delegated embedding services:
  * v1 dense 768-d via ModelRouter -> Ollama/HF/OpenAI HTTP
    (app/core/embedding/embedding_handler.py:71-98; app/core/models/
    huggingface/huggingface.py:165-170 — mean-pooled last hidden state).
  * v2 multimodal 2048-d via message-style `/embeddings` POST
    (IndexerAPI/src/core/model/model_handler.py:131-169; AgentAPI/app/
    embed/embed.py:63-79).

Architecture is a standard pre-LN transformer encoder tuned for the MXU:
all matmuls in bf16 with f32 accumulation, static shapes, mean pooling
over the attention mask exactly like the reference's HF client. The
multimodal variant patch-embeds images and prepends them as tokens to
the same tower (single-tower fusion), projecting to 2048-d.

Token-level outputs (`return_tokens=True`) feed the late-interaction
reranker (parity: jina-colbert-v2 rerank, qdrant_handler.py:20,388-412).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import EncoderConfig


class TransformerLayer(nn.Module):
    hidden: int
    heads: int
    mlp_dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask):
        # mask: (B, L) bool -> additive attention bias
        h = nn.LayerNorm(dtype=self.dtype)(x)
        attn_mask = mask[:, None, None, :]  # (B, 1, 1, L)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads,
            qkv_features=self.hidden,
            dtype=self.dtype,
            deterministic=True,
        )(h, h, mask=attn_mask)
        x = x + h
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(self.mlp_dim, dtype=self.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.hidden, dtype=self.dtype)(h)
        return x + h


class TextEncoder(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, ids, mask, *, return_tokens: bool = False):
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        x = nn.Embed(c.vocab_size, c.hidden_dim, dtype=dtype,
                     name="token_embed")(ids)
        pos = nn.Embed(c.max_len, c.hidden_dim, dtype=dtype,
                       name="pos_embed")(jnp.arange(ids.shape[1]))
        x = x + pos[None, :, :]
        for i in range(c.num_layers):
            x = TransformerLayer(c.hidden_dim, c.num_heads, c.mlp_dim,
                                 dtype=dtype, name=f"layer_{i}")(x, mask)
        x = nn.LayerNorm(dtype=dtype, name="final_ln")(x)
        tokens = nn.Dense(c.out_dim, dtype=dtype, name="proj")(x)
        # Mean pooling over valid tokens (parity: huggingface.py:165-170).
        m = mask[..., None].astype(jnp.float32)
        pooled = jnp.sum(tokens.astype(jnp.float32) * m, axis=1) / jnp.maximum(
            jnp.sum(m, axis=1), 1.0
        )
        pooled = pooled / jnp.maximum(
            jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12
        )
        if return_tokens:
            return pooled, tokens.astype(jnp.float32)
        return pooled


class MultimodalEncoder(nn.Module):
    """Single-tower multimodal encoder: image and audio patches as
    prefix tokens (ImageBind-style).

    Parity surface: the v2 2048-d multimodal embedding endpoint that
    accepts interleaved text+image content (model_handler.py:131-169)
    plus ImageBind's audio modality (imagebind_handler.py:23-32 —
    there a waveform->mel->ViT path; here the host computes the log-mel
    (models/audio.py) and the same tower patch-embeds it).
    """

    cfg: EncoderConfig
    patch_size: int = 16
    image_size: int = 224
    audio_frames: int = 256
    audio_mels: int = 128

    @nn.compact
    def __call__(self, ids, mask, images=None, image_mask=None,
                 audio=None, audio_mask=None,
                 *, return_tokens: bool = False):
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        x = nn.Embed(c.vocab_size, c.hidden_dim, dtype=dtype,
                     name="token_embed")(ids)
        pos = nn.Embed(c.max_len, c.hidden_dim, dtype=dtype,
                       name="pos_embed")(jnp.arange(ids.shape[1]))
        x = x + pos[None, :, :]
        full_mask = mask

        if images is not None:
            # images: (B, H, W, 3) -> patch tokens (B, P, hidden)
            p = self.patch_size
            patches = nn.Conv(c.hidden_dim, (p, p), strides=(p, p),
                              dtype=dtype, name="patch_embed")(images)
            b, ph, pw, h = patches.shape
            patches = patches.reshape(b, ph * pw, h)
            ppos = self.param(
                "patch_pos", nn.initializers.normal(0.02),
                (ph * pw, c.hidden_dim),
            ).astype(dtype)
            patches = patches + ppos[None, :, :]
            if image_mask is None:
                image_mask = jnp.ones((b,), dtype=bool)
            pmask = jnp.broadcast_to(image_mask[:, None], (b, ph * pw))
            x = jnp.concatenate([patches, x], axis=1)
            full_mask = jnp.concatenate([pmask, mask], axis=1)

        if audio is not None:
            # audio: (B, frames, mels) log-mel -> patch tokens, same
            # tower (the spectrogram is a 1-channel image to the MXU)
            p = self.patch_size
            spec = audio[..., None]  # (B, T, M, 1)
            apatches = nn.Conv(c.hidden_dim, (p, p), strides=(p, p),
                               dtype=dtype, name="audio_patch_embed")(spec)
            b, at, am, h = apatches.shape
            apatches = apatches.reshape(b, at * am, h)
            apos = self.param(
                "audio_patch_pos", nn.initializers.normal(0.02),
                (at * am, c.hidden_dim),
            ).astype(dtype)
            apatches = apatches + apos[None, :, :]
            if audio_mask is None:
                audio_mask = jnp.ones((b,), dtype=bool)
            amask = jnp.broadcast_to(audio_mask[:, None], (b, at * am))
            x = jnp.concatenate([apatches, x], axis=1)
            full_mask = jnp.concatenate([amask, full_mask], axis=1)

        for i in range(c.num_layers):
            x = TransformerLayer(c.hidden_dim, c.num_heads, c.mlp_dim,
                                 dtype=dtype, name=f"layer_{i}")(x, full_mask)
        x = nn.LayerNorm(dtype=dtype, name="final_ln")(x)
        tokens = nn.Dense(c.out_dim, dtype=dtype, name="proj")(x)
        m = full_mask[..., None].astype(jnp.float32)
        pooled = jnp.sum(tokens.astype(jnp.float32) * m, axis=1) / jnp.maximum(
            jnp.sum(m, axis=1), 1.0
        )
        pooled = pooled / jnp.maximum(
            jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12
        )
        if return_tokens:
            return pooled, tokens.astype(jnp.float32)
        return pooled


@dataclass
class EncoderState:
    model: nn.Module
    params: Any
    cfg: EncoderConfig


def init_encoder(cfg: Optional[EncoderConfig] = None, *, seed: int = 0,
                 multimodal: bool = False, max_len: int = 128) -> EncoderState:
    cfg = cfg or EncoderConfig()
    if multimodal:
        model = MultimodalEncoder(cfg)
        dummy_img = jnp.zeros((1, model.image_size, model.image_size, 3),
                              dtype=jnp.float32)
        dummy_audio = jnp.zeros((1, model.audio_frames, model.audio_mels),
                                dtype=jnp.float32)
    else:
        model = TextEncoder(cfg)
    ids = jnp.zeros((1, max_len), dtype=jnp.int32)
    mask = jnp.ones((1, max_len), dtype=bool)
    if multimodal:
        params = model.init(jax.random.PRNGKey(seed), ids, mask, dummy_img,
                            None, dummy_audio)
    else:
        params = model.init(jax.random.PRNGKey(seed), ids, mask)
    return EncoderState(model=model, params=params, cfg=cfg)
