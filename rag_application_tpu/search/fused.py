"""Single-dispatch hybrid search: the whole funnel as ONE jitted program.

`search/hybrid.py` stitches the funnel from separately-jitted stages —
correct, but each stage is a device dispatch, and on remote-attached
TPUs dispatch latency dominates small-corpus queries. This module traces
the *entire* funnel (matryoshka cascade, int8 scan, BM25, RRF, exact
rescore) into one XLA program keyed by a hashable `FusedSpec`, so a
query batch costs exactly one dispatch. The logical corpus size is a
traced scalar: incremental inserts never trigger recompilation, only
capacity doubling does.

This is the engine behind the benchmark path and the Collection facade.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FunnelConfig
from ..ops.bm25 import bm25_topk
from ..ops.quant import quantize_int8
from ..ops.rrf import INVALID_ID, first_occurrence_mask
from ..ops.topk import NEG_INF, blocked_topk, gather_rescore


class FusedSpec(NamedTuple):
    """Static configuration of one compiled funnel variant."""

    k: int
    matryoshka_dims: Tuple[int, ...]  # () disables the cascade
    matryoshka_limits: Tuple[int, ...]
    dense_limit: int
    quantized_limit: int
    sparse_limit: int  # 0 disables the sparse branch
    sparse_pool: int
    rrf_k: int
    block_size: int
    recall_target: float
    use_int8: bool = True
    has_filter: bool = False
    # "xla": blocked_topk (lax.approx_max_k per block). "pallas": fused
    # scan kernel (ops.fused_topk) — no score-matrix HBM traffic.
    scan_impl: str = "xla"
    scan_block_rows: int = 8192
    # >0: the int8 candidate scan reads the contiguous prefix table
    # (IndexConfig.scan_prefix_dim) instead of the full-dim int8 copy —
    # d/prefix times less MXU work and HBM traffic, recovered by the
    # exact rescore.
    scan_prefix_dim: int = 0
    # approx_max_k over the scan's candidate sheet (safe: the funnel
    # exact-rescores the union anyway)
    scan_approx_sheet: bool = False
    # >0: tile the scan's query dim (ops.fused_topk q_block) — the
    # (q_block, block_rows) score tile is the VMEM limiter, so tiling
    # lets big batches keep the full corpus block.
    scan_q_block: int = 0
    # >1: column-strip reduce inside the scan kernel (ops.fused_topk
    # strips) — smaller live score tile, VMEM headroom for larger blocks
    scan_strips: int = 1
    # each strip emits its own 128 survivors (ops.fused_topk
    # strip_outputs): candidate density decoupled from block size
    scan_strip_outputs: bool = False
    # "dense": final exact dense rescore orders the union (Qdrant
    # parity). "rrf": fuse the dense-exact ranking with the BM25
    # ranking (FunnelConfig.final_fusion).
    final_fusion: str = "dense"

    @classmethod
    def from_funnel(cls, f: FunnelConfig, dims: Tuple[int, ...], *,
                    k: int, block_size: int, use_sparse: bool,
                    use_matryoshka: bool, has_filter: bool,
                    sparse_pool: int = 1024,
                    recall_target: float = 0.95,
                    scan_impl: str = "xla") -> "FusedSpec":
        return cls(
            k=k,
            matryoshka_dims=tuple(dims) if use_matryoshka else (),
            matryoshka_limits=tuple(f.matryoshka_limits),
            dense_limit=f.dense_limit,
            quantized_limit=f.quantized_limit,
            sparse_limit=f.sparse_limit if use_sparse else 0,
            sparse_pool=sparse_pool,
            rrf_k=f.rrf_k,
            block_size=block_size,
            recall_target=recall_target,
            has_filter=has_filter,
            scan_impl=scan_impl,
            use_int8=f.quantized_limit > 0,
            final_fusion=getattr(f, "final_fusion", "dense"),
        )


def _prefix_rescore(vecs, inv_norms, q, ids, valid, dim: int, level: int,
                    keep: int):
    """Rescore candidate ids in the matryoshka view at `level`, keep top."""
    safe = jnp.where(valid, ids, 0)
    scores = gather_rescore(vecs[:, :dim], q[:, :dim], safe)
    scores = scores * inv_norms[safe, level]
    scores = jnp.where(valid, scores, NEG_INF)
    k_eff = min(keep, ids.shape[-1])
    top, pos = jax.lax.top_k(scores, k_eff)
    return top, jnp.take_along_axis(ids, pos, axis=-1)


def _exact_rescore(vecs, q, ids, valid, keep: int):
    safe = jnp.where(valid, ids, 0)
    scores = gather_rescore(vecs, q, safe)
    scores = jnp.where(valid, scores, NEG_INF)
    k_eff = min(keep, ids.shape[-1])
    top, pos = jax.lax.top_k(scores, k_eff)
    return top, jnp.take_along_axis(ids, pos, axis=-1)


def fused_core(
    vecs: jax.Array,            # (cap, d) bf16 normalized
    int8: jax.Array,            # (cap, d) int8
    inv_norms: jax.Array,       # (cap, M) f32
    live: Optional[jax.Array],  # (cap,) bool; None = provably all-live
                                # (DenseIndex.fully_live) — the scan
                                # skips mask DMA + select per strip
    valid_n: jax.Array,         # scalar int32 — logical size
    queries: jax.Array,         # (Q, d) f32 (unnormalized ok)
    filter_mask: Optional[jax.Array],   # (cap,) bool or None
    sparse_arrays: Optional[Tuple[jax.Array, jax.Array, jax.Array]],
    sparse_queries: Optional[Tuple[jax.Array, jax.Array, jax.Array]],
    spec: FusedSpec,
    prefix_int8: Optional[jax.Array] = None,  # (cap, scan_prefix_dim)
    int8_recip: Optional[jax.Array] = None,   # (cap,) capacity-mode per-row
                                              # dequant factors (dense.py)
) -> Tuple[jax.Array, jax.Array]:
    """The funnel body, traceable inline — `fused_hybrid` jits it for
    the single-chip engine and `parallel.search.sharded_fused_hybrid`
    runs it per shard inside shard_map, so the multi-chip funnel is the
    single-chip funnel by construction (same candidate stages, same
    scoring path). Returns (scores (Q,k), ids (Q,k)); invalid slots have
    score -inf and id INVALID_ID."""
    q = queries.astype(jnp.float32)
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    # capacity mode (store_bf16=False): no bf16 plane — the int8 table
    # doubles as the exact-rescore source. With per-row scaling
    # (int8_recip) the dequant factor is per candidate; otherwise the
    # global 1/127 (rows normalized before quantization).
    rescore_table = vecs if vecs is not None else int8
    cap_scaled = vecs is None and int8_recip is not None
    rescore_scale = 1.0 if vecs is not None else 1.0 / 127.0
    qb = q.astype(vecs.dtype) if vecs is not None else q

    def candidate_rescale(safe_ids):
        """Per-candidate dequantization factor for gathered rescores."""
        if cap_scaled:
            return int8_recip[safe_ids]
        return rescore_scale

    mask = live
    if spec.has_filter and filter_mask is not None:
        mask = (filter_mask if mask is None
                else jnp.logical_and(mask, filter_mask))

    def corpus_scan(table, qs, limit, *, prefix_dim=None, inv=None):
        """Full-corpus candidate scan via the selected engine. `live` is
        False beyond the logical size, so the mask alone bounds the scan."""
        if spec.scan_impl == "pallas":
            from ..ops.fused_topk import fused_scan_topk

            return fused_scan_topk(
                table, qs, limit,
                block_rows=spec.scan_block_rows,
                prefix_dim=prefix_dim, inv_norms=inv, mask=mask,
                approx_sheet=spec.scan_approx_sheet,
                q_block=spec.scan_q_block or None,
                strips=spec.scan_strips,
                strip_outputs=spec.scan_strip_outputs,
            )
        return blocked_topk(
            table, qs, limit,
            block_size=spec.block_size, valid_n=valid_n,
            prefix_dim=prefix_dim, inv_norms=inv, filter_mask=mask,
            approx=True, recall_target=spec.recall_target,
        )

    branches = []  # (vals, ids) candidate lists for the final union
    rrf_lists = []

    # --- matryoshka cascade ---
    if spec.matryoshka_dims:
        assert vecs is not None, "matryoshka cascade needs the bf16 plane"
        m = spec.matryoshka_limits
        vals, ids = corpus_scan(
            vecs, qb, m[0],
            prefix_dim=spec.matryoshka_dims[0], inv=inv_norms[:, 0],
        )
        for level in range(1, len(spec.matryoshka_dims)):
            if level >= len(m):
                break
            vals, ids = _prefix_rescore(
                vecs, inv_norms, q, ids, jnp.isfinite(vals),
                spec.matryoshka_dims[level], level, m[level],
            )
        vals, ids = _exact_rescore(vecs, q, ids, jnp.isfinite(vals),
                                   spec.dense_limit)
        branches.append((vals, ids))

    # --- int8 branch ---
    if spec.use_int8:
        if spec.scan_prefix_dim and prefix_int8 is not None:
            # prefix scan table: renormalized prefix quantized at insert;
            # renormalize the query prefix too for full int8 resolution
            # (per-query scaling never changes the ranking)
            qp = q[:, : spec.scan_prefix_dim]
            qp = qp / jnp.maximum(
                jnp.linalg.norm(qp, axis=-1, keepdims=True), 1e-12)
            i_vals, i_ids = corpus_scan(prefix_int8, quantize_int8(qp),
                                        spec.quantized_limit)
            # prefix scores are coarse: refine with an exact rescore
            valid = jnp.isfinite(i_vals)
            safe = jnp.where(valid, i_ids, 0)
            rs = gather_rescore(rescore_table, q, safe) \
                * candidate_rescale(safe)
            rs = jnp.where(valid, rs, NEG_INF)
            keep = min(spec.dense_limit, i_ids.shape[-1])
            i_vals, pos = jax.lax.top_k(rs, keep)
            i_ids = jnp.take_along_axis(i_ids, pos, axis=-1)
        else:
            q8 = quantize_int8(q)
            i_vals, i_ids = corpus_scan(
                int8, q8, spec.quantized_limit,
                inv=int8_recip if cap_scaled else None)
            # the scan's values ARE full-dim int8 dots — rank-select the
            # refine set directly from them instead of re-gathering the
            # bf16 rows (the reference's int8->dense refine only chooses
            # candidates; the union below still gets the exact:True
            # rescore, qdrant_handler.py:333-344,363-372)
            keep = min(spec.dense_limit, i_ids.shape[-1])
            i_vals, pos = jax.lax.top_k(i_vals, keep)
            i_ids = jnp.take_along_axis(i_ids, pos, axis=-1)
        rrf_lists.append((i_ids, jnp.isfinite(i_vals)))
        branches.append((i_vals, i_ids))

    # --- sparse BM25 branch ---
    if spec.sparse_limit and sparse_arrays is not None:
        post_docs, post_w, doc_packed = sparse_arrays
        q_rows, q_terms, q_valid = sparse_queries
        n_sparse = doc_packed.shape[0] - 1
        # live ∧ payload filter, row-aligned (None = nothing masked)
        fm = mask[:n_sparse] if mask is not None else None
        sp_vals, sp_ids = bm25_topk(
            post_docs, post_w, doc_packed,
            q_rows, q_terms, q_valid, spec.sparse_limit,
            pool=spec.sparse_pool, filter_mask=fm,
        )
        sp_valid = jnp.isfinite(sp_vals)
        rrf_lists.append((sp_ids, sp_valid))
        branches.append((jnp.where(sp_valid, 0.0, NEG_INF), sp_ids))

    # --- RRF of quantized + sparse (qdrant_handler.py:357-360) ---
    # NOTE: rrf_fuse outputs are by construction members of its input
    # lists, every one of which is already in the union below, and
    # final_fusion="dense" rescores the deduped union exactly — so
    # materializing the fused list cannot change the output (same holds
    # for Qdrant's prefetch=[matryoshka, rrf] + exact rescore). The
    # fusion is skipped here; `ops.rrf.rrf_fuse` remains the public RRF
    # surface (and the sharded-merge path), validated by tests/test_rrf.py.
    del rrf_lists

    # --- final exact rescore over deduped union (:363-372) ---
    all_ids = jnp.concatenate([ids for _, ids in branches], axis=-1)
    all_valid = jnp.concatenate(
        [jnp.isfinite(v) for v, _ in branches], axis=-1
    )
    all_ids = jnp.where(all_valid, all_ids, INVALID_ID)
    keep = first_occurrence_mask(all_ids) & (all_ids != INVALID_ID)
    safe_ids = jnp.where(keep, all_ids, 0)
    scores = gather_rescore(rescore_table, q, safe_ids) \
        * candidate_rescale(safe_ids)
    scores = jnp.where(keep, scores, NEG_INF)

    if spec.final_fusion == "dbsf" and spec.sparse_limit and \
            sparse_arrays is not None:
        # Distribution-based SCORE fusion (the analogue of Qdrant's
        # DBSF mode): min-max normalize each leg's scores per query and
        # sum. Unlike rank-RRF, a leg whose scores barely separate (an
        # untrained dense encoder ranking near-uniformly) contributes
        # near-uniform normalized scores and cannot dilute a leg with a
        # decisive winner (BM25 on rare-term keyword queries) — the
        # failure mode behind the realdocs Pokemon needles (r5).
        big = jnp.float32(3e38)
        # dense cosines have no natural zero -> per-query min-max over
        # the kept union (degenerate all-equal spread -> full weight)
        lo = jnp.min(jnp.where(keep, scores, big), axis=-1,
                     keepdims=True)
        hi = jnp.max(jnp.where(keep, scores, -big), axis=-1,
                     keepdims=True)
        den = hi - lo
        dn = jnp.where(den > 1e-9,
                       (scores - lo) / jnp.maximum(den, 1e-9), 1.0)
        # BM25 DOES have a natural zero (no term match), so the sparse
        # leg normalizes by ratio-to-max: the runner-up of a 2-element
        # list keeps its true relative weight instead of being zeroed
        # (min-max floored the "Malipatel" chunk to 0 behind a
        # stopword-heavy top hit — r5 subset regression)
        sp_member = (all_ids[:, :, None] == sp_ids[:, None, :]) \
            & sp_valid[:, None, :]
        shi = jnp.max(jnp.where(sp_valid, sp_vals, 0.0), axis=-1,
                      keepdims=True)
        s_norm = jnp.maximum(sp_vals, 0.0) / jnp.maximum(shi, 1e-9)
        sval = jnp.sum(jnp.where(sp_member, s_norm[:, None, :], 0.0),
                       axis=-1)
        fused = dn + sval
        # dense score as an epsilon tie-break; -inf slots stay -inf
        scores = jnp.where(keep, fused, NEG_INF) + \
            jnp.where(keep, scores * 1e-6, scores)

    if spec.final_fusion == "rrf" and spec.sparse_limit and \
            sparse_arrays is not None:
        # Reciprocal-rank fusion of the dense-exact ranking with the
        # BM25 ranking. Dense rank: position of each kept union slot in
        # the exact-rescore ordering (duplicates/invalid sit at the
        # -inf tail, so they never inflate a kept slot's rank). Sparse
        # rank: the candidate's position in the BM25 top list.
        order = jnp.argsort(-scores, axis=-1)
        dense_rank = jnp.argsort(order, axis=-1).astype(jnp.float32)
        rrf = 1.0 / (spec.rrf_k + 1.0 + dense_rank)
        sp_member = (all_ids[:, :, None] == sp_ids[:, None, :]) \
            & sp_valid[:, None, :]
        sp_rank = jnp.argmax(sp_member, axis=-1).astype(jnp.float32)
        in_sparse = jnp.any(sp_member, axis=-1)
        rrf = rrf + jnp.where(in_sparse,
                              1.0 / (spec.rrf_k + 1.0 + sp_rank), 0.0)
        # dense score as an epsilon tie-break; -inf slots stay -inf
        scores = jnp.where(keep, rrf, NEG_INF) + \
            jnp.where(keep, scores * 1e-6, scores)

    k_eff = min(spec.k, all_ids.shape[-1])
    top_scores, pos = jax.lax.top_k(scores, k_eff)
    top_ids = jnp.take_along_axis(all_ids, pos, axis=-1)
    top_ids = jnp.where(jnp.isfinite(top_scores), top_ids, INVALID_ID)
    return top_scores, top_ids


fused_hybrid = functools.partial(jax.jit, static_argnames=("spec",))(fused_core)


class FusedSearcher:
    """Binds a DenseIndex (+ optional SparseIndex) to the fused pipeline.

    Drop-in faster engine for the Collection facade: same results as
    `hybrid_search`, one device dispatch per query batch.
    """

    def __init__(self, dense, sparse=None, funnel: Optional[FunnelConfig] = None,
                 *, scan_impl: Optional[str] = None,
                 scan_block_rows: Optional[int] = None,
                 scan_approx_sheet: Optional[bool] = None,
                 scan_q_block: Optional[int] = None,
                 scan_strips: Optional[int] = None,
                 scan_strip_outputs: Optional[bool] = None):
        # NOTE: the kernel bins along the 128 VPU lanes — bin size is
        # tuned via scan_block_rows (bins/block is fixed at 128).
        # Engine knobs default to the funnel config's (FunnelConfig
        # scan_*), which default to the tuned TPU operating point with
        # "auto" impl selection.
        self.dense = dense
        self.sparse = sparse
        self.funnel = funnel or FunnelConfig()
        f = self.funnel
        self.scan_impl = scan_impl if scan_impl is not None else \
            getattr(f, "scan_impl", "auto")
        self.scan_block_rows = scan_block_rows if scan_block_rows is not None \
            else getattr(f, "scan_block_rows", 16384)
        self.scan_approx_sheet = scan_approx_sheet if scan_approx_sheet \
            is not None else getattr(f, "scan_approx_sheet", True)
        self.scan_q_block = scan_q_block if scan_q_block is not None else \
            getattr(f, "scan_q_block", 1024)
        self.scan_strips = scan_strips if scan_strips is not None else \
            getattr(f, "scan_strips", 1)
        self.scan_strip_outputs = scan_strip_outputs \
            if scan_strip_outputs is not None \
            else getattr(f, "scan_strip_outputs", False)

    def _resolved_engine(self) -> Tuple[str, int]:
        """(impl, block_rows) with "auto" and the dim clamp applied."""
        impl = self.scan_impl
        if impl == "auto":
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        block = self.scan_block_rows
        d = self.dense.cfg.dim
        if impl == "pallas" and d > 768:
            # keep the (block, d) slab + (q_block, block) tile in VMEM
            block = min(block, max(4096, (16384 * 768 // d) // 128 * 128))
        return impl, block

    def prepare(self, query_embeddings, query_texts=None, *,
                upload_dtype=None):
        """Host-side query prep + device upload, separated from execution
        so serving loops can overlap/pre-stage transfers.

        `upload_dtype="float16"` halves the host->device bytes on thin
        attaches (the funnel normalizes and casts in f32 on device; the
        scan quantizes queries to int8 anyway, so the precision cost is
        below the bf16 storage floor).

        `upload_dtype="int8"` quarters the bytes vs f32: queries are
        symmetrically quantized per row at 127/max|x| on the host. The
        per-query scale needs no wire slot — fused_core renormalizes
        every query on device, which cancels any per-row scalar. The
        quantized query feeds ALL funnel stages including the exact
        rescore, so final scores carry the query-quantization noise
        (~0.006 cosine stddev at 768-d); measure recall before making it
        a serving default (docs/serving.md)."""
        q = np.asarray(query_embeddings)
        if upload_dtype == "int8":
            q32 = q.astype(np.float32)
            s = np.max(np.abs(q32), axis=-1, keepdims=True)
            q = np.clip(np.round(q32 * (127.0 / np.maximum(s, 1e-12))),
                        -127, 127).astype(np.int8)
        elif upload_dtype is not None:
            q = q.astype(upload_dtype)
        elif q.dtype not in (np.float16, np.float32):
            q = q.astype(np.float32)
        q = jax.device_put(jnp.asarray(q))
        sparse_queries = None
        if (self.sparse is not None and query_texts is not None
                and len(self.sparse) > 0):
            sparse_queries = self.sparse.encode_queries(list(query_texts))
        return q, sparse_queries

    def _build_spec(self, k: int, *, use_sparse: bool,
                    use_matryoshka: bool, has_filter: bool,
                    funnel: Optional[FunnelConfig]):
        """(spec, sparse_arrays) shared by the vector-wire and
        tokens-wire execution paths."""
        f = funnel or self.funnel
        d = self.dense
        if d.vecs is None:  # capacity mode: prefix views unavailable
            use_matryoshka = False
        sparse_arrays = None
        sparse_pool = 1024
        if use_sparse:
            dv = self.sparse.device_arrays()
            sparse_arrays = (dv["post_docs"], dv["post_weights"],
                             dv["doc_packed"])
            sparse_pool = self.sparse.cfg.candidate_pool
        impl, block_rows = self._resolved_engine()
        spec = FusedSpec.from_funnel(
            f, d.cfg.matryoshka_dims, k=k, block_size=d.cfg.block_size,
            use_sparse=use_sparse, use_matryoshka=use_matryoshka,
            has_filter=has_filter, sparse_pool=sparse_pool,
            recall_target=d.cfg.approx_recall_target,
            scan_impl=impl,
        )._replace(scan_block_rows=block_rows,
                   scan_approx_sheet=self.scan_approx_sheet,
                   scan_q_block=self.scan_q_block,
                   scan_strips=self.scan_strips,
                   scan_strip_outputs=self.scan_strip_outputs,
                   scan_prefix_dim=(d.cfg.scan_prefix_dim
                                    if d.prefix_int8 is not None else 0))
        if d.int8 is None:  # store_int8=False: no quantized scan table
            spec = spec._replace(use_int8=False)
        if not (spec.matryoshka_dims or spec.use_int8 or spec.sparse_limit):
            raise ValueError(
                "no funnel branch available: enable matryoshka (needs the "
                "bf16 plane), int8 (store_int8=True), or the sparse index")
        return spec, sparse_arrays

    def search_prepared(self, prepared, k: int = 10, *, filter_mask=None,
                        use_matryoshka: bool = True,
                        funnel: Optional[FunnelConfig] = None):
        """Execute the fused funnel on pre-staged query tensors."""
        from ..utils.observability import METRICS

        q, sparse_queries = prepared
        METRICS.inc("search_queries", q.shape[0])
        d = self.dense
        spec, sparse_arrays = self._build_spec(
            k, use_sparse=sparse_queries is not None,
            use_matryoshka=use_matryoshka,
            has_filter=filter_mask is not None, funnel=funnel)
        # provably all-live tables drop the mask plane from the scan
        # (skips the per-strip mask DMA + select inside the kernel)
        live = None if (filter_mask is None and d.fully_live) else d.live
        scores, ids = fused_hybrid(
            d.vecs, d.int8, d.inv_norms, live,
            np.int32(d.size), q,
            jnp.asarray(filter_mask) if filter_mask is not None else None,
            sparse_arrays, sparse_queries, spec,
            prefix_int8=d.prefix_int8,
            int8_recip=getattr(d, "int8_recip", None),
        )
        return scores, ids

    # ------------------------------------------------------ tokens wire
    #
    # Real clients send TEXT, not vectors (reference:
    # app/api/v1/endpoints/query.py:19-35). Uploading int32 token ids
    # instead of f16 vectors cuts wire bytes ~6x at 768-d (T=32 -> 128 B
    # vs 1536 B/query) and moves the encoder forward onto the device in
    # the SAME dispatch as the funnel — the serving-path composition
    # measured by bench.py's e2e_tokens leg.

    def bind_encoder(self, model, params, *, pad_id: int = 0) -> None:
        """Attach the on-device query encoder for the tokens-wire path.
        `model.apply(params, ids, mask)` must yield (Q, dim) embeddings
        (models/encoder.py::TextEncoder)."""
        self._enc_model = model
        self._enc_params = params
        self._enc_pad = pad_id
        self._tok_jit = {}

    def prepare_tokens(self, token_ids, query_texts=None, attn_mask=None):
        """Upload int32 token ids (+ host-side sparse query encoding).
        `attn_mask` overrides the default `ids != pad_id` mask (real
        tokenizers emit one; bench token matrices have no pad)."""
        ids = jax.device_put(jnp.asarray(token_ids, dtype=jnp.int32))
        if attn_mask is not None:
            attn_mask = jax.device_put(jnp.asarray(attn_mask, dtype=bool))
        sparse_queries = None
        if (self.sparse is not None and query_texts is not None
                and len(self.sparse) > 0):
            sparse_queries = self.sparse.encode_queries(list(query_texts))
        return ids, attn_mask, sparse_queries

    def search_tokens_prepared(self, prepared, k: int = 10, *,
                               filter_mask=None, use_matryoshka: bool = True,
                               funnel: Optional[FunnelConfig] = None):
        """ONE dispatch: encoder forward + the fused funnel."""
        if getattr(self, "_enc_model", None) is None:
            raise ValueError("call bind_encoder(model, params) first")
        ids, attn_mask, sparse_queries = prepared
        d = self.dense
        spec, sparse_arrays = self._build_spec(
            k, use_sparse=sparse_queries is not None,
            use_matryoshka=use_matryoshka,
            has_filter=filter_mask is not None, funnel=funnel)
        fn = self._tok_jit.get(spec)
        if fn is None:
            model, pad = self._enc_model, self._enc_pad

            def program(params, ids, amask, vecs, int8, inv_norms, live,
                        size, fm, sparse_arrays, sparse_queries,
                        prefix_int8, int8_recip):
                mask = (ids != pad) if amask is None else amask
                q = model.apply(params, ids, mask).astype(jnp.float32)
                return fused_core(vecs, int8, inv_norms, live, size, q,
                                  fm, sparse_arrays, sparse_queries, spec,
                                  prefix_int8=prefix_int8,
                                  int8_recip=int8_recip)

            fn = self._tok_jit[spec] = jax.jit(program)
        live = None if (filter_mask is None and d.fully_live) else d.live
        return fn(self._enc_params, ids, attn_mask, d.vecs, d.int8,
                  d.inv_norms, live, np.int32(d.size),
                  jnp.asarray(filter_mask) if filter_mask is not None
                  else None,
                  sparse_arrays, sparse_queries, d.prefix_int8,
                  getattr(d, "int8_recip", None))

    def search_tokens(self, token_ids, query_texts=None, k: int = 10, *,
                      attn_mask=None, filter_mask=None,
                      use_matryoshka: bool = True,
                      funnel: Optional[FunnelConfig] = None):
        """Text-in search: token ids cross the wire, the device encodes
        and retrieves in one program."""
        prepared = self.prepare_tokens(token_ids, query_texts, attn_mask)
        return self.search_tokens_prepared(
            prepared, k, filter_mask=filter_mask,
            use_matryoshka=use_matryoshka, funnel=funnel)

    def search(self, query_embeddings, query_texts=None, k: int = 10, *,
               filter_mask=None, use_matryoshka: bool = True,
               funnel: Optional[FunnelConfig] = None):
        prepared = self.prepare(query_embeddings, query_texts)
        return self.search_prepared(
            prepared, k, filter_mask=filter_mask,
            use_matryoshka=use_matryoshka, funnel=funnel)
