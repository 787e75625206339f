"""Pallas fused decode attention over the int8 KV cache (T=1 GQA step).

XLA cannot make int8 KV attention bandwidth-proportional: every einsum
variant measured on-chip (`examples/tune_attn.py`) runs the int8 cache
at bf16 time (~0.75 ms at b64/S896/L8) because the s8->bf16 dequant is
materialized at bf16 width before the contraction. This kernel reads
the int8 bytes exactly once:

    grid (B/B_blk, S/S_blk); each program streams contiguous
    (B_blk, S_blk, KVH*hd) int8 cache tiles through VMEM, converts
    in-register, and runs a flash-decode online softmax across the
    S blocks. B_blk rows per program amortize the per-program cost —
    the first cut ran one (row, block) per program and 3584 programs/
    step cost more in fixed overhead (~1.6 us each) than the DMA.

Two tricks keep each tile to a few MXU dots with no lane surgery
(hd=64 < 128 lanes would otherwise force sub-lane slicing):

  * block-diagonal query: q (KVH, G, hd) is laid out as a
    (KVH*hd, KVH*G) matrix whose column (k, g) carries q[k, g] in rows
    [k*hd, (k+1)*hd) and zeros elsewhere — one (S_blk, P) x (P, C) dot
    then yields EVERY head's scores at once (the zero-padding wastes
    MXU flops, which are ~3 orders of magnitude away from being the
    bottleneck; the cache bytes are).
  * scale expansion by matmul: the per-(slot, kv-head) int8 scales
    (S_blk, KVH) are spread to score columns with a tiny constant
    (KVH, C) 0/1 matrix — a dot instead of a lane-repeat relayout.

The output accumulator is (B_blk, C, P); only the (k, g) row's own
head-k lane band is meaningful, extracted by a diagonal einsum in the
wrapper (a (B, C, P) tensor — negligible).

Parity: this computes exactly `models/decoder.attend`'s kv_quant math
(scores * k_scale / sqrt(hd), masked softmax, probs * v_scale @ v) —
the reference's decode attention is torch SDPA inside HF
`LlamaForCausalLM` (app/core/models/huggingface/huggingface.py:195-260).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import use_interpret

NEG = -1.0e30

# per-plane int8 VMEM budget for one (B_blk, S_blk, P) cache tile; the
# bf16 converts roughly triple it and double-buffering adds the next
# tile, keeping the total well under the ~16 MB scoped default.
_TILE_BYTES = 1 << 21


def _kernel(k8_ref, ks_ref, v8_ref, vs_ref, qbd_ref, mask_ref, out_ref,
            acc_ref, m_ref, l_ref, *, n_blocks: int, kv_heads: int,
            q_groups: int, inv_sqrt_hd: float):
    sb = pl.program_id(1)
    C = kv_heads * q_groups

    @pl.when(sb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG)
        l_ref[...] = jnp.zeros_like(l_ref)

    # mixed s8 x bf16 dot: the int8 tile feeds the MXU directly — an
    # explicit astype(bf16) forces a (32,128)->(16,128) tile relayout
    # of the whole cache block, which dominated the first cut's time.
    raw = jax.lax.dot_general(                       # (Bb, S_blk, C)
        k8_ref[...], qbd_ref[...], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    # expand (Bb, S_blk, KVH) scales to score columns: E[k,c] = [c//G==k]
    row = jax.lax.broadcasted_iota(jnp.int32, (kv_heads, C), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (kv_heads, C), 1)
    expand = (col // q_groups == row).astype(jnp.float32)
    ks_e = jax.lax.dot_general(ks_ref[...], expand, (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    vis = mask_ref[...]                              # (Bb, S_blk, 1)
    scores = raw * ks_e * inv_sqrt_hd
    scores = jnp.where(vis > 0.0, scores, NEG)

    m_old = m_ref[...]                               # (Bb, C)
    m_new = jnp.maximum(m_old, jnp.max(scores, axis=1))
    alpha = jnp.exp(m_old - m_new)                   # (Bb, C)
    # vis guard: a fully-masked prefix keeps m at NEG, where exp(0)=1
    # would resurrect masked slots — multiply them away explicitly.
    p = jnp.exp(scores - m_new[:, None, :]) * vis    # (Bb, S_blk, C)
    l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=1)
    m_ref[...] = m_new
    vs_e = jax.lax.dot_general(vs_ref[...], expand, (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    pv = (p * vs_e).astype(jnp.bfloat16)
    pvv = jax.lax.dot_general(                       # (Bb, C, P)
        pv, v8_ref[...], (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    acc_ref[...] = acc_ref[...] * alpha[:, :, None] + pvv

    @pl.when(sb == n_blocks - 1)
    def _flush():
        out_ref[...] = acc_ref[...] / jnp.maximum(
            l_ref[...], 1e-30)[:, :, None]


def pick_block(s: int) -> Optional[int]:
    """Largest supported S block that tiles the cache exactly."""
    for blk in (512, 256, 128, 64, 32):
        if s % blk == 0:
            return blk
    return None


def _pick_tiles(batch: int, seq_len: int, packed: int
                ) -> Optional[Tuple[int, int]]:
    s_blk = pick_block(seq_len)
    if s_blk is None:
        return None
    for b_blk in (8, 4, 2, 1):
        if batch % b_blk == 0 and b_blk * s_blk * packed <= _TILE_BYTES:
            return b_blk, s_blk
    return None


def supported(*, seq_len: int, kv_heads: int, head_dim: int) -> bool:
    """Whether the fused kernel covers this cache geometry (callers
    fall back to the XLA einsum path otherwise)."""
    return (kv_heads * head_dim) % 128 == 0 and pick_block(seq_len) is not None


def decode_attend_int8(qg: jax.Array, ck: dict, cv: dict,
                       mask: jax.Array) -> jax.Array:
    """Fused T=1 GQA attention against an int8 KV cache.

    qg   (B, 1, KVH, G, hd) bf16 — rope'd queries
    ck/cv {"q": (B, S, KVH, hd) int8, "s": (B, S, KVH) f32}
    mask (B, S) bool — slot visibility for the single query token
    returns (B, 1, KVH, G, hd) attention output, qg.dtype.
    """
    B, _, KVH, G, hd = qg.shape
    S = ck["q"].shape[1]
    P, C = KVH * hd, KVH * G
    tiles = _pick_tiles(B, S, P)
    if tiles is None or P % 128 != 0:
        raise ValueError(f"unsupported cache geometry B={B} S={S} P={P}")
    b_blk, s_blk = tiles
    n_blocks = S // s_blk

    # block-diagonal query: rows (k, d), cols (j, g), nonzero iff k == j
    eye = jnp.eye(KVH, dtype=qg.dtype)
    qbd = jnp.einsum("bkgd,kj->bkdjg", qg[:, 0], eye).reshape(B, P, C)
    k8 = ck["q"].reshape(B, S, P)
    v8 = cv["q"].reshape(B, S, P)
    vis = mask.astype(jnp.float32)[:, :, None]       # (B, S, 1)

    out_full = pl.pallas_call(
        functools.partial(_kernel, n_blocks=n_blocks, kv_heads=KVH,
                          q_groups=G, inv_sqrt_hd=1.0 / np.sqrt(hd)),
        grid=(B // b_blk, n_blocks),
        in_specs=[
            pl.BlockSpec((b_blk, s_blk, P), lambda b, s: (b, s, 0)),
            pl.BlockSpec((b_blk, s_blk, KVH), lambda b, s: (b, s, 0)),
            pl.BlockSpec((b_blk, s_blk, P), lambda b, s: (b, s, 0)),
            pl.BlockSpec((b_blk, s_blk, KVH), lambda b, s: (b, s, 0)),
            pl.BlockSpec((b_blk, P, C), lambda b, s: (b, 0, 0)),
            pl.BlockSpec((b_blk, s_blk, 1), lambda b, s: (b, s, 0)),
        ],
        out_specs=pl.BlockSpec((b_blk, C, P), lambda b, s: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, C, P), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((b_blk, C, P), jnp.float32),
            pltpu.VMEM((b_blk, C), jnp.float32),
            pltpu.VMEM((b_blk, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # the bf16 converts of the int8 tiles + the f32 score tile
            # overflow the 16 MB scoped-vmem default at the largest
            # (b_blk=8, s_blk=512) tiling; v5e has 128 MB of VMEM.
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=use_interpret(),
    )(k8, ck["s"], v8, cv["s"], qbd, vis)

    # row (k, g) of out_full holds its head's output in lane band k
    of = out_full.reshape(B, KVH, G, KVH, hd)
    out = jnp.einsum("bkgjh,kj->bkgh", of, jnp.eye(KVH, dtype=jnp.float32))
    return out[:, None].astype(qg.dtype)
