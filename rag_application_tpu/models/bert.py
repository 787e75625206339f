"""Faithful BERT-family encoder (post-LN) + HF weight import.

Parity: the reference's HF local client runs BERT-family sentence
encoders with mean-pooled last hidden state (app/core/models/huggingface/
huggingface.py:95-97,165-170). The framework's default `TextEncoder` is a
pre-LN tower tuned for training from scratch; this module is the exact
BERT computation (embeddings LayerNorm, post-LN blocks, erf GELU) so
existing HF checkpoints (MiniLM, BERT, MPNet-style) produce the same
embeddings on TPU. `convert_hf_state_dict` maps a torch state dict onto
the flax parameter tree; equivalence vs `transformers.BertModel` is
asserted in tests with shared random weights.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class BertLayer(nn.Module):
    hidden: int
    heads: int
    mlp_dim: int
    eps: float = 1e-12

    @nn.compact
    def __call__(self, x, mask):
        attn_mask = mask[:, None, None, :]
        a = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.hidden,
            deterministic=True, name="attn",
        )(x, x, mask=attn_mask)
        x = nn.LayerNorm(epsilon=self.eps, name="attn_ln")(x + a)
        f = nn.Dense(self.mlp_dim, name="ffn_in")(x)
        f = nn.gelu(f, approximate=False)
        f = nn.Dense(self.hidden, name="ffn_out")(f)
        return nn.LayerNorm(epsilon=self.eps, name="ffn_ln")(x + f)


class BertEncoder(nn.Module):
    vocab_size: int
    hidden: int
    num_layers: int
    heads: int
    mlp_dim: int
    max_len: int = 512
    type_vocab: int = 2
    eps: float = 1e-12

    @nn.compact
    def __call__(self, ids, mask, *, return_tokens: bool = False):
        x = nn.Embed(self.vocab_size, self.hidden, name="word_emb")(ids)
        pos = nn.Embed(self.max_len, self.hidden, name="pos_emb")(
            jnp.arange(ids.shape[1]))
        typ = nn.Embed(self.type_vocab, self.hidden, name="type_emb")(
            jnp.zeros_like(ids))
        x = x + pos[None, :, :] + typ
        x = nn.LayerNorm(epsilon=self.eps, name="emb_ln")(x)
        for i in range(self.num_layers):
            x = BertLayer(self.hidden, self.heads, self.mlp_dim,
                          eps=self.eps, name=f"layer_{i}")(x, mask)
        m = mask[..., None].astype(jnp.float32)
        pooled = jnp.sum(x.astype(jnp.float32) * m, axis=1) / jnp.maximum(
            jnp.sum(m, axis=1), 1.0)
        pooled = pooled / jnp.maximum(
            jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)
        if return_tokens:
            return pooled, x.astype(jnp.float32)
        return pooled


def convert_hf_state_dict(state_dict: Dict[str, Any], *, hidden: int,
                          heads: int, num_layers: int) -> Dict[str, Any]:
    """torch BERT state dict -> flax params for BertEncoder.

    Accepts `bert.`-prefixed or bare keys (BertModel.state_dict()).
    """
    head_dim = hidden // heads

    def get(key: str) -> np.ndarray:
        for k in (key, f"bert.{key}"):
            if k in state_dict:
                v = state_dict[k]
                return np.asarray(v.detach().cpu().numpy()
                                  if hasattr(v, "detach") else v)
        raise KeyError(key)

    params: Dict[str, Any] = {
        "word_emb": {"embedding": get("embeddings.word_embeddings.weight")},
        "pos_emb": {"embedding": get("embeddings.position_embeddings.weight")},
        "type_emb": {"embedding": get("embeddings.token_type_embeddings.weight")},
        "emb_ln": {"scale": get("embeddings.LayerNorm.weight"),
                   "bias": get("embeddings.LayerNorm.bias")},
    }
    for i in range(num_layers):
        p = f"encoder.layer.{i}."

        def qkv(name):
            w = get(p + f"attention.self.{name}.weight")  # (H, H) out,in
            b = get(p + f"attention.self.{name}.bias")
            return {"kernel": w.T.reshape(hidden, heads, head_dim),
                    "bias": b.reshape(heads, head_dim)}

        out_w = get(p + "attention.output.dense.weight")  # (H, H)
        params[f"layer_{i}"] = {
            "attn": {
                "query": qkv("query"),
                "key": qkv("key"),
                "value": qkv("value"),
                "out": {"kernel": out_w.T.reshape(heads, head_dim, hidden),
                        "bias": get(p + "attention.output.dense.bias")},
            },
            "attn_ln": {"scale": get(p + "attention.output.LayerNorm.weight"),
                        "bias": get(p + "attention.output.LayerNorm.bias")},
            "ffn_in": {"kernel": get(p + "intermediate.dense.weight").T,
                       "bias": get(p + "intermediate.dense.bias")},
            "ffn_out": {"kernel": get(p + "output.dense.weight").T,
                        "bias": get(p + "output.dense.bias")},
            "ffn_ln": {"scale": get(p + "output.LayerNorm.weight"),
                       "bias": get(p + "output.LayerNorm.bias")},
        }
    return {"params": jax.tree.map(jnp.asarray, params)}


def load_hf_encoder(model_dir_or_state: Any, config: Optional[Dict] = None):
    """Build (BertEncoder, params) from a HF checkpoint directory or an
    in-memory state dict + config. Directory loading uses transformers
    (local files only — the framework never downloads)."""
    if isinstance(model_dir_or_state, str):
        import json
        import os

        import torch

        with open(os.path.join(model_dir_or_state, "config.json")) as f:
            config = json.load(f)
        weights = os.path.join(model_dir_or_state, "pytorch_model.bin")
        st_path = os.path.join(model_dir_or_state, "model.safetensors")
        if os.path.exists(weights):
            state = torch.load(weights, map_location="cpu")
        elif os.path.exists(st_path):
            # modern checkpoints ship safetensors only (the transformers
            # default save format since 4.35)
            from safetensors.torch import load_file

            state = load_file(st_path)
        else:
            raise FileNotFoundError(
                f"no pytorch_model.bin or model.safetensors in "
                f"{model_dir_or_state}")
    else:
        state = model_dir_or_state
        assert config is not None
    model = BertEncoder(
        vocab_size=config["vocab_size"],
        hidden=config["hidden_size"],
        num_layers=config["num_hidden_layers"],
        heads=config["num_attention_heads"],
        mlp_dim=config["intermediate_size"],
        max_len=config.get("max_position_embeddings", 512),
        type_vocab=config.get("type_vocab_size", 2),
        eps=config.get("layer_norm_eps", 1e-12),
    )
    params = convert_hf_state_dict(
        state, hidden=config["hidden_size"],
        heads=config["num_attention_heads"],
        num_layers=config["num_hidden_layers"])
    return model, params
