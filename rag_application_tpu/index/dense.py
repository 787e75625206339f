"""HBM-resident dense vector index shard.

Replaces the reference's per-user Qdrant collection with 6 named vectors
(dense 768-d, int8 copy, matryoshka {64,128,256}, sparse — app/core/
vector_store/qdrant/qdrant_handler.py:58-98). Storage here is:

  * ``vecs``     (cap, d)  bf16 L2-normalized — the single source of truth.
  * ``int8``     (cap, d)  int8 symmetric quantization of ``vecs``.
  * ``inv_norms``(cap, M)  f32 inverse prefix norms — the matryoshka
                 "vectors" are zero-copy column slices of ``vecs``; only
                 their norms are materialized. This is why the index hits
                 Qdrant-equal (actually lower) memory: 768-d bf16 + int8 +
                 3 f32 norms = 2316 B/row vs Qdrant's fp32 dense + int8 +
                 3 fp32 matryoshka copies (4868 B/row).
  * ``live``     (cap,) bool — tombstone mask (delete = mask out).

Capacity grows by doubling with a device-side copy; rows are internal ids
aligned with the SparseIndex and the host payload store.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import IndexConfig
from ..ops.quant import prepare_vectors_xla, quantize_int8
from ..ops.topk import blocked_topk, gather_rescore
import functools


def _insert_update_impl(vecs, int8, inv_norms, live, x, start, *, dims):
    """One compiled index update: derive all views of the batch and
    splice them into the capacity arrays at ``start``."""
    norm, i8, inv = prepare_vectors_xla(x.astype(jnp.float32), dims,
                                        out_dtype=vecs.dtype)
    n = x.shape[0]
    vecs = jax.lax.dynamic_update_slice_in_dim(vecs, norm, start, 0)
    int8 = jax.lax.dynamic_update_slice_in_dim(int8, i8, start, 0)
    inv_norms = jax.lax.dynamic_update_slice_in_dim(inv_norms, inv, start, 0)
    live = jax.lax.dynamic_update_slice_in_dim(
        live, jnp.ones((n,), dtype=bool), start, 0
    )
    return vecs, int8, inv_norms, live


# Donating variant (the default — no copies of the capacity arrays) and
# a non-donating twin used while a checkpoint snapshot PINS the current
# buffers (index/checkpoint.py captures references under the mutation
# lock and pulls them to host after releasing it; donation would
# invalidate those references mid-pull).
_insert_update = functools.partial(
    jax.jit, static_argnames=("dims",), donate_argnums=(0, 1, 2, 3)
)(_insert_update_impl)
_insert_update_nodonate = functools.partial(
    jax.jit, static_argnames=("dims",))(_insert_update_impl)


def _insert_update_single_impl(plane, inv_norms, live, x, start, *, dims,
                               keep):
    """Single-plane update for the reduced storage modes: keep="int8"
    (capacity mode, no bf16 plane) or keep="bf16" (no quantized table)."""
    norm, i8, inv = prepare_vectors_xla(x.astype(jnp.float32), dims,
                                        out_dtype=jnp.bfloat16)
    n = x.shape[0]
    plane = jax.lax.dynamic_update_slice_in_dim(
        plane, i8 if keep == "int8" else norm, start, 0)
    inv_norms = jax.lax.dynamic_update_slice_in_dim(inv_norms, inv, start, 0)
    live = jax.lax.dynamic_update_slice_in_dim(
        live, jnp.ones((n,), dtype=bool), start, 0
    )
    return plane, inv_norms, live


_insert_update_single = functools.partial(
    jax.jit, static_argnames=("dims", "keep"), donate_argnums=(0, 1, 2)
)(_insert_update_single_impl)
_insert_update_single_nodonate = functools.partial(
    jax.jit, static_argnames=("dims", "keep"))(_insert_update_single_impl)


def _insert_update_int8_scaled_impl(plane, recip, inv_norms, live, x, start,
                                    *, dims):
    """Capacity-mode insert with per-row max-abs int8 scaling: the row
    quantizes at s_r = 127/max|x_r| (full int8 range regardless of dim)
    and `recip` stores 1/s_r, so cosine = (q_f32 . int8_row) * recip."""
    xf = x.astype(jnp.float32)
    xn = xf * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(xf * xf, axis=-1, keepdims=True), 1e-24))
    _, _, inv = prepare_vectors_xla(xf, dims, out_dtype=jnp.bfloat16)
    amax = jnp.maximum(jnp.max(jnp.abs(xn), axis=-1, keepdims=True), 1e-12)
    i8 = jnp.clip(jnp.round(xn * (127.0 / amax)), -127, 127).astype(jnp.int8)
    n = x.shape[0]
    plane = jax.lax.dynamic_update_slice_in_dim(plane, i8, start, 0)
    recip = jax.lax.dynamic_update_slice_in_dim(
        recip, (amax[:, 0] / 127.0).astype(jnp.float32), start, 0)
    inv_norms = jax.lax.dynamic_update_slice_in_dim(inv_norms, inv, start, 0)
    live = jax.lax.dynamic_update_slice_in_dim(
        live, jnp.ones((n,), dtype=bool), start, 0
    )
    return plane, recip, inv_norms, live


_insert_update_int8_scaled = functools.partial(
    jax.jit, static_argnames=("dims",), donate_argnums=(0, 1, 2, 3)
)(_insert_update_int8_scaled_impl)
_insert_update_int8_scaled_nodonate = functools.partial(
    jax.jit, static_argnames=("dims",))(_insert_update_int8_scaled_impl)


def _prefix_update_impl(prefix_int8, x, start, *, prefix_dim):
    """Derive + splice the contiguous prefix scan table: int8 of the
    renormalized first `prefix_dim` columns (so the raw int8 dot IS the
    prefix cosine, no inverse-norm multiply in the scan kernel)."""
    xp = x.astype(jnp.float32)[:, :prefix_dim]
    xp = xp * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(xp * xp, axis=-1, keepdims=True), 1e-12))
    i8 = jnp.clip(jnp.round(xp * 127.0), -127, 127).astype(jnp.int8)
    return jax.lax.dynamic_update_slice_in_dim(prefix_int8, i8, start, 0)


_prefix_update = functools.partial(
    jax.jit, static_argnames=("prefix_dim",), donate_argnums=(0,)
)(_prefix_update_impl)
_prefix_update_nodonate = functools.partial(
    jax.jit, static_argnames=("prefix_dim",))(_prefix_update_impl)


class DenseIndex:
    def __init__(self, config: Optional[IndexConfig] = None):
        self.cfg = config or IndexConfig()
        cap = self.cfg.initial_capacity
        d = self.cfg.dim
        m = len(self.cfg.matryoshka_dims)
        dtype = jnp.bfloat16
        if not self.cfg.store_bf16 and not self.cfg.store_int8:
            raise ValueError("at least one of store_bf16/store_int8 required")
        self.vecs = (jnp.zeros((cap, d), dtype=dtype)
                     if self.cfg.store_bf16 else None)
        self.int8 = (jnp.zeros((cap, d), dtype=jnp.int8)
                     if self.cfg.store_int8 else None)
        self.inv_norms = jnp.zeros((cap, m), dtype=jnp.float32)
        # capacity-mode per-row dequantization factors (config flag):
        # cosine = (q . int8_row) * int8_recip[row]
        self.int8_recip = (
            jnp.zeros((cap,), dtype=jnp.float32)
            if (self.cfg.store_int8 and not self.cfg.store_bf16
                and self.cfg.int8_per_row_scale) else None)
        self.live = jnp.zeros((cap,), dtype=bool)
        p = self.cfg.scan_prefix_dim
        if p and (p % 128 != 0 or p >= d):
            raise ValueError(
                f"scan_prefix_dim must be a multiple of 128 below dim, got {p}")
        self.prefix_int8 = jnp.zeros((cap, p), dtype=jnp.int8) if p else None
        self.size = 0  # rows [0, size) are allocated (live unless deleted)
        # False until the first delete(): lets the fused scan drop the
        # live-mask load + select entirely when size == capacity (the
        # aligned capacity-mode bench layout) — see FusedSearcher
        self.has_deletes = False
        # >0: a checkpoint snapshot holds references to the current
        # buffers — inserts switch to non-donating jits so those
        # references stay valid while the snapshot pulls them to host
        # (index/checkpoint.py pins under the mutation lock, releases
        # the lock, pulls, then unpins)
        self._pins = 0

    def pin(self) -> None:
        self._pins += 1

    def unpin(self) -> None:
        self._pins = max(0, self._pins - 1)

    @property
    def capacity(self) -> int:
        plane = self.vecs if self.vecs is not None else self.int8
        return plane.shape[0]

    @property
    def dim(self) -> int:
        return self.cfg.dim

    def _grow(self, needed: int) -> None:
        new_cap = self.capacity
        while new_cap < needed:
            new_cap *= 2
        pad = new_cap - self.capacity
        if self.vecs is not None:
            self.vecs = jnp.pad(self.vecs, ((0, pad), (0, 0)))
        if self.int8 is not None:
            self.int8 = jnp.pad(self.int8, ((0, pad), (0, 0)))
        self.inv_norms = jnp.pad(self.inv_norms, ((0, pad), (0, 0)))
        if self.int8_recip is not None:
            self.int8_recip = jnp.pad(self.int8_recip, (0, pad))
        self.live = jnp.pad(self.live, (0, pad))
        if self.prefix_int8 is not None:
            self.prefix_int8 = jnp.pad(self.prefix_int8, ((0, pad), (0, 0)))

    def insert(self, embeddings: jax.Array | np.ndarray) -> np.ndarray:
        """Normalize + derive views + append a batch. Returns row ids.

        The whole update is one compiled, buffer-donating program — no
        per-op dispatches, no copies of the capacity arrays. Half-width
        inputs (f16/bf16) upload as-is and cast on device — feeding f16
        halves host->device traffic on thin attaches.
        """
        x = jnp.asarray(embeddings)
        if x.dtype not in (jnp.float16, jnp.bfloat16, jnp.float32):
            x = x.astype(jnp.float32)
        n = x.shape[0]
        if self.size + n > self.capacity:
            self._grow(self.size + n)
        start = self.size
        pinned = self._pins > 0
        if self.vecs is not None and self.int8 is not None:
            upd = _insert_update_nodonate if pinned else _insert_update
            self.vecs, self.int8, self.inv_norms, self.live = upd(
                self.vecs, self.int8, self.inv_norms, self.live,
                x, np.int32(start), dims=self.cfg.matryoshka_dims,
            )
        elif self.int8 is not None:  # capacity mode
            if self.int8_recip is not None:
                upd = (_insert_update_int8_scaled_nodonate if pinned
                       else _insert_update_int8_scaled)
                (self.int8, self.int8_recip, self.inv_norms,
                 self.live) = upd(
                    self.int8, self.int8_recip, self.inv_norms, self.live,
                    x, np.int32(start), dims=self.cfg.matryoshka_dims,
                )
            else:
                upd = (_insert_update_single_nodonate if pinned
                       else _insert_update_single)
                self.int8, self.inv_norms, self.live = upd(
                    self.int8, self.inv_norms, self.live, x, np.int32(start),
                    dims=self.cfg.matryoshka_dims, keep="int8",
                )
        else:
            upd = (_insert_update_single_nodonate if pinned
                   else _insert_update_single)
            self.vecs, self.inv_norms, self.live = upd(
                self.vecs, self.inv_norms, self.live, x, np.int32(start),
                dims=self.cfg.matryoshka_dims, keep="bf16",
            )
        if self.prefix_int8 is not None:
            upd = _prefix_update_nodonate if pinned else _prefix_update
            self.prefix_int8 = upd(
                self.prefix_int8, x, np.int32(start),
                prefix_dim=self.cfg.scan_prefix_dim)
        self.size += n
        return np.arange(start, start + n)

    def delete(self, rows) -> None:
        """Tombstone rows (parity: reset_document / DETACH DELETE re-ingest)."""
        rows = jnp.asarray(rows)
        self.live = self.live.at[rows].set(False)
        self.has_deletes = True

    @property
    def fully_live(self) -> bool:
        """True when the live mask is provably all-ones over the whole
        capacity (every slot allocated, nothing ever deleted) — the
        fused scan then skips mask DMA + select per strip."""
        return self.size == self.capacity and not self.has_deletes

    # ---------------------------------------------------------------- query

    def _mask(self, filter_mask: Optional[jax.Array]) -> jax.Array:
        if filter_mask is None:
            return self.live
        return jnp.logical_and(self.live, filter_mask)

    def normalize_queries(self, queries) -> jax.Array:
        q = jnp.asarray(queries, dtype=jnp.float32)
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        return q

    def search(
        self,
        queries,
        k: int,
        *,
        filter_mask: Optional[jax.Array] = None,
        approx: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        """Exact (or per-block approx) full-precision search. In capacity
        mode (no bf16 plane) this scans the int8 table — exact up to
        quantization, with scores rescaled back to cosines (the int8
        dot of two 127-scaled unit rows is ~127^2 x cosine)."""
        if self.vecs is None:
            vals, ids = self.search_int8(queries, k,
                                         filter_mask=filter_mask,
                                         approx=approx)
            # per-row scaled table: the scan already multiplied by the
            # row recip, leaving only the query quantization factor
            scale = (1.0 / 127.0 if self.int8_recip is not None
                     else 1.0 / (127.0 * 127.0))
            return vals * scale, ids
        q = self.normalize_queries(queries).astype(self.vecs.dtype)
        return blocked_topk(
            self.vecs, q, k,
            block_size=self.cfg.block_size,
            valid_n=self.size,
            filter_mask=self._mask(filter_mask),
            approx=approx,
            recall_target=self.cfg.approx_recall_target,
        )

    def search_int8(self, queries, k: int, *,
                    filter_mask: Optional[jax.Array] = None,
                    approx: bool = True) -> Tuple[jax.Array, jax.Array]:
        """Quantized candidate generation (parity: Qdrant int8 prefetch,
        qdrant_handler.py:333-344)."""
        if self.int8 is None:
            raise ValueError("store_int8=False: no quantized table")
        q = self.normalize_queries(queries)
        q8 = quantize_int8(q)
        return blocked_topk(
            self.int8, q8, k,
            block_size=self.cfg.block_size,
            valid_n=self.size,
            # per-row scaled rows need the recip multiply to rank
            inv_norms=self.int8_recip,
            filter_mask=self._mask(filter_mask),
            approx=approx,
            recall_target=self.cfg.approx_recall_target,
        )

    def search_matryoshka(self, queries, k: int, level: int, *,
                          filter_mask: Optional[jax.Array] = None,
                          approx: bool = True) -> Tuple[jax.Array, jax.Array]:
        """Prefix-view candidate generation at matryoshka level ``level``."""
        if self.vecs is None:
            raise ValueError(
                "store_bf16=False: matryoshka prefix views need the bf16 "
                "plane (the int8 table is full-dim only)")
        dim = self.cfg.matryoshka_dims[level]
        q = self.normalize_queries(queries).astype(self.vecs.dtype)
        return blocked_topk(
            self.vecs, q, k,
            block_size=self.cfg.block_size,
            valid_n=self.size,
            prefix_dim=dim,
            inv_norms=self.inv_norms[:, level],
            filter_mask=self._mask(filter_mask),
            approx=approx,
            recall_target=self.cfg.approx_recall_target,
        )

    def rescore(self, queries, candidates: jax.Array,
                candidate_valid: Optional[jax.Array] = None,
                *, level: Optional[int] = None) -> jax.Array:
        """Exact rescore of candidate rows (the `exact: True` final stage).

        With ``level`` set, rescoring happens in the matryoshka prefix view
        at that level (cosine via inverse prefix norms) — this is how the
        cascade refines candidates without re-scanning the corpus.
        """
        q = self.normalize_queries(queries)
        safe = jnp.clip(candidates, 0, self.capacity - 1)
        table = self.vecs if self.vecs is not None else self.int8
        if level is None:
            scores = gather_rescore(table, q, safe,
                                    candidate_valid=candidate_valid)
            scores = scores * self._rescore_scale(safe)
        else:
            dim = self.cfg.matryoshka_dims[level]
            scores = gather_rescore(table[:, :dim], q[:, :dim], safe,
                                    candidate_valid=candidate_valid)
            scores = scores * self._rescore_scale(safe)
            scores = scores * self.inv_norms[safe, level]
        in_range = jnp.logical_and(candidates >= 0, candidates < self.size)
        return jnp.where(in_range, scores, -jnp.inf)

    def _rescore_scale(self, safe_rows):
        """Per-candidate dequantization factor for the rescore table."""
        if self.vecs is not None:
            return 1.0
        if self.int8_recip is not None:
            return self.int8_recip[safe_rows]
        return 1.0 / 127.0
