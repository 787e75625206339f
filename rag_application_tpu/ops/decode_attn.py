"""Pallas fused decode attention over the int8 KV cache (T=1 GQA step).

STATUS (measured, v5e-1, b64/S1024/L8 = 512 folded rows): OPT-IN. The
kernel matches XLA but does not beat it, and the stage-isolation probe
says why — the score dot ALONE costs 0.79 of the 0.85 ms total. At
C = heads = 8 output channels per row, every MXU pass computes 128
rows to use 8; the kernel, XLA's bf16 einsum (0.80), and XLA's int8
einsum (0.80) are ALL bound by the same thin-GEMM pass count, which is
why int8 vs bf16 cache bytes never changed the time (tune_attn). On
this geometry int8 KV buys CAPACITY (2x tokens in HBM), not speed.

The "kernel wins at fat geometries" hypothesis is REFUTED (measured
r2-cont, v5e-1, tune_attn at KVH=8/G=4/hd=128 -> C=32, BL=256,
S=1024): XLA's bf16 einsum runs the cache read at 914 GB/s —
effectively HBM-saturated — so there is nothing left for a kernel to
reclaim; every int8 variant (XLA 1.16 ms, mixed 1.21, this kernel
1.27) lands ON TOP of the 1.18 ms bf16 time instead of halving it
(the halved bytes are spent on conversion/relayout, ~460 GB/s
effective). Conclusion: at thin C the floor is MXU passes, at fat C
it's HBM — in BOTH regimes XLA's einsum is already at the wall, so
the kernel stays opt-in and int8 KV remains a capacity feature.
That tune run also exposed a layout bug (block-diagonal query built
bkjgd instead of bkgjd — wrong output for every KVH > 1), fixed and
pinned by tests/test_decode_attn.py.

Things tried that did NOT move the floor (kept for the record):
fewer/bigger programs (448 -> 64), mixed s8 x bf16 dots vs astype
(the astype relayout DID cost ~0.3 ms — avoid it anyway), s8 x s8
with quantized probs, and the (Bb, C, S)-lanes layout below (the
first (Bb, S, C) cut ran the softmax chain at 6% lane occupancy —
also worth avoiding, just not the dominant term).

This kernel reads the int8 bytes exactly once:

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
_TILE_BYTES = 1 << 22


def _kernel(k8_ref, ks_ref, v8_ref, vs_ref, qbd_ref, mask_ref, out_ref,
            acc_ref, m_ref, l_ref, *, n_blocks: int, kv_heads: int,
            q_groups: int, inv_sqrt_hd: float):
    """One (batch-tile, S-block) step. Layout rules this obeys:

    * scores/softmax tensors are (Bb, C, S_blk) — S ON LANES. The first
      cut used (Bb, S_blk, C) and its whole elementwise chain ran at
      C/128 = 6% lane occupancy, which (not the dots, not the DMA) was
      the kernel's floor.
    * the int8 tiles feed the MXU via mixed s8 x bf16 dots — an
      explicit astype(bf16) forces a (32,128)->(16,128) tile relayout
      of the whole cache block.
    * per-(slot, kv-head) scales arrive pre-transposed (Bb, KVH, S_blk)
      and spread over the G query groups by a FREE leading-dim reshape
      of the score tile, not a lane relayout.
    """
    sb = pl.program_id(1)
    C = kv_heads * q_groups
    Bb = acc_ref.shape[0]

    @pl.when(sb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG)
        l_ref[...] = jnp.zeros_like(l_ref)

    s_blk = k8_ref.shape[1]
    raw = jax.lax.dot_general(                       # (Bb, C, S_blk)
        qbd_ref[...], k8_ref[...], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    # (Bb, C, S) -> (Bb, KVH, G, S) is a leading-dim reshape (free);
    # the (Bb, KVH, 1, S) scale broadcast covers every query group.
    ks_t = ks_ref[...][:, :, None, :]                # (Bb, KVH, 1, S)
    scores = raw.reshape(Bb, kv_heads, q_groups, s_blk) * ks_t
    scores = (scores * inv_sqrt_hd).reshape(Bb, C, s_blk)
    vis = mask_ref[...]                              # (Bb, 1, S_blk)
    scores = jnp.where(vis > 0.0, scores, NEG)

    m_old = m_ref[...]                               # (Bb, C, 1)
    m_new = jnp.maximum(m_old, jnp.max(scores, axis=2, keepdims=True))
    alpha = jnp.exp(m_old - m_new)                   # (Bb, C, 1)
    # vis guard: a fully-masked prefix keeps m at NEG, where exp(0)=1
    # would resurrect masked slots — multiply them away explicitly.
    p = jnp.exp(scores - m_new) * vis                # (Bb, C, S_blk)
    l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=2, keepdims=True)
    m_ref[...] = m_new
    vs_t = vs_ref[...][:, :, None, :]                # (Bb, KVH, 1, S)
    pv = (p.reshape(Bb, kv_heads, q_groups, s_blk) * vs_t
          ).reshape(Bb, C, s_blk).astype(jnp.bfloat16)
    pvv = jax.lax.dot_general(                       # (Bb, C, P)
        pv, v8_ref[...], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    acc_ref[...] = acc_ref[...] * alpha + pvv

    @pl.when(sb == n_blocks - 1)
    def _flush():
        out_ref[...] = acc_ref[...] / jnp.maximum(l_ref[...], 1e-30)


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
    for b_blk in (16, 8, 4, 2, 1):
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

    # block-diagonal query: qbd[b, (k, g), (j, d)] = q[b, k, g, d]·[k==j]
    # — the (C, P) reshape groups (k, g) and (j, d), so the einsum MUST
    # emit dims in bkgjd order (bkjgd scrambles any KVH > 1; regression
    # test: tests/test_decode_attn.py)
    eye = jnp.eye(KVH, dtype=qg.dtype)
    qbd = jnp.einsum("bkgd,kj->bkgjd", qg[:, 0], eye).reshape(B, C, P)
    k8 = ck["q"].reshape(B, S, P)
    v8 = cv["q"].reshape(B, S, P)
    # scales and mask pre-transposed so the kernel's score tile keeps
    # S on the lane dim end to end (see _kernel docstring)
    ks_t = ck["s"].transpose(0, 2, 1)                # (B, KVH, S)
    vs_t = cv["s"].transpose(0, 2, 1)
    vis = mask.astype(jnp.float32)[:, None, :]       # (B, 1, S)

    out_full = pl.pallas_call(
        functools.partial(_kernel, n_blocks=n_blocks, kv_heads=KVH,
                          q_groups=G, inv_sqrt_hd=1.0 / np.sqrt(hd)),
        grid=(B // b_blk, n_blocks),
        in_specs=[
            pl.BlockSpec((b_blk, s_blk, P), lambda b, s: (b, s, 0)),
            pl.BlockSpec((b_blk, KVH, s_blk), lambda b, s: (b, 0, s)),
            pl.BlockSpec((b_blk, s_blk, P), lambda b, s: (b, s, 0)),
            pl.BlockSpec((b_blk, KVH, s_blk), lambda b, s: (b, 0, s)),
            pl.BlockSpec((b_blk, C, P), lambda b, s: (b, 0, 0)),
            pl.BlockSpec((b_blk, 1, s_blk), lambda b, s: (b, 0, s)),
        ],
        out_specs=pl.BlockSpec((b_blk, C, P), lambda b, s: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, C, P), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((b_blk, C, P), jnp.float32),
            pltpu.VMEM((b_blk, C, 1), jnp.float32),
            pltpu.VMEM((b_blk, C, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # the bf16 converts of the int8 tiles + the f32 score tile
            # overflow the 16 MB scoped-vmem default at the largest
            # (b_blk=8, s_blk=512) tiling; v5e has 128 MB of VMEM.
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=use_interpret(),
    )(k8, ks_t, v8, vs_t, qbd, vis)

    # row (k, g) of out_full holds its head's output in lane band k
    of = out_full.reshape(B, KVH, G, KVH, hd)
    out = jnp.einsum("bkgjh,kj->bkgh", of, jnp.eye(KVH, dtype=jnp.float32))
    return out[:, None].astype(qg.dtype)
