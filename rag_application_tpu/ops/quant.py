"""Quantization + matryoshka-view ops.

Parity targets:
  * int8 symmetric quantization `clip(round(x*127), -127, 127)` — the
    reference quantizes dense vectors this way before upserting the
    `quantized` named vector (app/core/vector_store/qdrant/
    qdrant_handler.py:144-146).
  * matryoshka prefix views {64,128,256} of the 768-d vector
    (qdrant_handler.py:148-150). The reference stores them as separate
    vectors; here they are zero-copy column slices of one array, so we
    only precompute per-row inverse prefix norms to turn prefix inner
    products into true cosines.

A Pallas kernel fuses quantize+norms in one pass over the insert batch on
TPU; the identical math runs as plain XLA on CPU (tests, virtual mesh).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import round_up, use_interpret


def quantize_int8(x: jax.Array) -> jax.Array:
    """Symmetric int8 quantization of unit-norm vectors (clip(round(x*127)))."""
    scaled = jnp.round(x.astype(jnp.float32) * 127.0)
    return jnp.clip(scaled, -127, 127).astype(jnp.int8)


def dequantize_int8(x: jax.Array) -> jax.Array:
    """Inverse of :func:`quantize_int8` (up to rounding)."""
    return x.astype(jnp.float32) / 127.0


def matryoshka_inv_norms(
    x: jax.Array, dims: Sequence[int]
) -> jax.Array:
    """Per-row inverse L2 norms of each prefix view.

    Args:
      x: (N, d) row-normalized vectors.
      dims: prefix dims, e.g. (64, 128, 256).

    Returns: (N, len(dims)) f32; column j scales `q[:dims_j] . x[:dims_j]`
    into a cosine similarity.
    """
    if not dims:
        return jnp.zeros((x.shape[0], 0), dtype=jnp.float32)
    xf = x.astype(jnp.float32)
    sq = xf * xf
    # static prefix-slice sums — cumsum over the feature axis compiles
    # pathologically for wide rows and dims are few/static anyway
    cols = [
        jax.lax.rsqrt(jnp.maximum(jnp.sum(sq[:, :d], axis=-1), 1e-12))
        for d in dims
    ]
    return jnp.stack(cols, axis=-1)


def _prep_kernel(x_ref, norm_ref, int8_ref, inv_ref, *, dims: Tuple[int, ...]):
    x = x_ref[:].astype(jnp.float32)
    # L2-normalize the full vector.
    inv_full = jax.lax.rsqrt(jnp.maximum(jnp.sum(x * x, axis=-1, keepdims=True), 1e-12))
    xn = x * inv_full
    norm_ref[:] = xn.astype(norm_ref.dtype)
    # int8 view of the normalized vector.
    int8_ref[:] = jnp.clip(jnp.round(xn * 127.0), -127, 127).astype(jnp.int8)
    # Inverse prefix norms of the normalized vector. Static prefix slices
    # (dims are compile-time) — cumsum has no Mosaic TPU lowering.
    sq = xn * xn
    for j, d in enumerate(dims):
        prefix_sq = jnp.sum(sq[:, :d], axis=-1)
        inv_ref[:, j] = jax.lax.rsqrt(jnp.maximum(prefix_sq, 1e-12))


def prepare_vectors(
    x: jax.Array,
    dims: Sequence[int],
    *,
    out_dtype=jnp.bfloat16,
    block_rows: int = 1024,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One fused pass over an insert batch: normalize + int8 + prefix norms.

    This is the device-side half of index insert: it produces all derived
    views the cascade needs (normalized bf16 storage, int8 copy, matryoshka
    inverse prefix norms) reading the input exactly once.

    Args:
      x: (N, d) raw embeddings.
      dims: matryoshka prefix dims.

    Returns: (normalized (N, d) out_dtype, int8 (N, d), inv_norms (N, len(dims)) f32)
    """
    n, d = x.shape
    dims = tuple(dims)
    # Tile over row blocks: always pad rows to a multiple of block_rows so
    # each grid step stages exactly one (block_rows, d) block in VMEM.
    rows = min(block_rows, round_up(max(n, 8), 8))
    padded = round_up(max(n, rows), rows)
    if padded != n:
        x = jnp.pad(x, ((0, padded - n), (0, 0)), constant_values=1.0)
    grid = (padded // rows,)

    import functools

    kernel = functools.partial(_prep_kernel, dims=dims)
    norm, int8, inv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (rows, len(dims)), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((padded, d), out_dtype),
            jax.ShapeDtypeStruct((padded, d), jnp.int8),
            jax.ShapeDtypeStruct((padded, len(dims)), jnp.float32),
        ),
        interpret=use_interpret(),
    )(x)
    return norm[:n], int8[:n], inv[:n]


def prepare_vectors_xla(
    x: jax.Array, dims: Sequence[int], *, out_dtype=jnp.bfloat16
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Pure-XLA reference implementation of :func:`prepare_vectors`."""
    xf = x.astype(jnp.float32)
    inv_full = jax.lax.rsqrt(
        jnp.maximum(jnp.sum(xf * xf, axis=-1, keepdims=True), 1e-12)
    )
    xn = xf * inv_full
    return (
        xn.astype(out_dtype),
        quantize_int8(xn),
        matryoshka_inv_norms(xn, dims),
    )
