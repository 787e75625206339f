"""Fused Pallas decode-attention kernel (ops/decode_attn.py) vs a host
oracle, across GQA geometries.

Regression anchor: the block-diagonal query layout must emit dims in
(k, g, j, d) order before the (C, P) reshape — the bkjgd transposition
shipped broken for every KVH > 1 (caught by the C=32 tune_attn run:
max|Δ| 3.0 vs the XLA paths' 0.006).

Parity: the kernel computes models/decoder.attend's kv_quant math
(scores * k_scale / sqrt(hd), masked softmax, probs * v_scale @ v);
the reference's decode attention is torch SDPA inside HF
LlamaForCausalLM (app/core/models/huggingface/huggingface.py:195-260).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rag_application_tpu.ops.decode_attn import (
    decode_attend_int8,
    pick_block,
    supported,
)


def _quant(x):
    s = np.maximum(np.abs(x).max(-1), 1e-12) / 127.0
    q = np.clip(np.round(x / s[..., None]), -127, 127).astype(np.int8)
    return {"q": jnp.asarray(q), "s": jnp.asarray(s, jnp.float32)}


def _oracle(q, ck, cv, mask, hd):
    kf = np.asarray(ck["q"], np.float32) * np.asarray(ck["s"])[..., None]
    vf = np.asarray(cv["q"], np.float32) * np.asarray(cv["s"])[..., None]
    qf = np.asarray(q, np.float32)
    sc = np.einsum("bokgh,bskh->bkgs", qf, kf) / np.sqrt(hd)
    sc = np.where(mask[:, None, None, :], sc, -1e30)
    p = np.exp(sc - sc.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bkgs,bskh->bkgh", p, vf)


@pytest.mark.parametrize("B,KVH,G,HD,S", [
    (4, 4, 2, 64, 256),    # the measured production geometry (C=8)
    (4, 8, 4, 128, 256),   # the fat C=32 geometry (llama-8B-like)
    (2, 2, 2, 64, 512),
    (4, 1, 4, 128, 128),   # KVH=1: the one case the old layout got right
])
def test_kernel_matches_oracle(B, KVH, G, HD, S):
    assert supported(seq_len=S, kv_heads=KVH, head_dim=HD)
    r = np.random.default_rng(0)
    q = jnp.asarray(r.standard_normal((B, 1, KVH, G, HD)), jnp.bfloat16)
    ck = _quant(r.standard_normal((B, S, KVH, HD)))
    cv = _quant(r.standard_normal((B, S, KVH, HD)))
    mask = r.integers(0, 2, (B, S)).astype(bool)
    mask[:, :4] = True  # never a fully-masked row
    out = np.asarray(decode_attend_int8(q, ck, cv, jnp.asarray(mask)),
                     np.float32)[:, 0]
    ref = _oracle(q, ck, cv, mask, HD)
    assert np.abs(out - ref).max() < 5e-2  # bf16 probs round-trip


def test_fully_masked_prefix_blocks():
    """Blocks whose every slot is masked must not poison the online
    softmax (the exp(NEG-NEG)=1 resurrection case)."""
    B, KVH, G, HD, S = 2, 2, 2, 64, 256
    r = np.random.default_rng(1)
    q = jnp.asarray(r.standard_normal((B, 1, KVH, G, HD)), jnp.bfloat16)
    ck = _quant(r.standard_normal((B, S, KVH, HD)))
    cv = _quant(r.standard_normal((B, S, KVH, HD)))
    mask = np.zeros((B, S), bool)
    mask[:, -3:] = True  # only the tail block has visible slots
    out = np.asarray(decode_attend_int8(q, ck, cv, jnp.asarray(mask)),
                     np.float32)[:, 0]
    ref = _oracle(q, ck, cv, mask, HD)
    assert np.abs(out - ref).max() < 5e-2


def test_geometry_gate():
    assert not supported(seq_len=100, kv_heads=4, head_dim=64)  # S%32
    assert not supported(seq_len=256, kv_heads=3, head_dim=25)  # P%128
    assert pick_block(1024) == 512


def test_decoder_kernel_path_matches_einsum_path():
    """generate() with attn_kernel=True is token-identical (greedy) to
    the XLA einsum path on a kv_quant decoder."""
    from rag_application_tpu.models.decoder import (
        DecoderConfig,
        generate,
        init_decoder_params,
    )

    mk = lambda k: DecoderConfig(
        vocab_size=128, hidden=256, num_layers=2, heads=4, kv_heads=2,
        mlp_dim=96, max_len=256, dtype="float32", kv_quant=True,
        attn_kernel=k)
    params = init_decoder_params(jax.random.PRNGKey(2), mk(False))
    ids = np.zeros((2, 32), np.int32)
    ids[0, :5] = [3, 9, 27, 81, 110]
    ids[1, :7] = [2, 4, 8, 16, 32, 64, 127]
    plen = np.asarray([5, 7], np.int32)
    outs = []
    for kernel in (False, True):
        out, n = generate(params, mk(kernel), ids, plen, 24, -1, 0,
                          jax.random.PRNGKey(0), 0.0)
        outs.append(np.asarray(out))
    np.testing.assert_array_equal(outs[0], outs[1])
