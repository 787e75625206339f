"""Pallas fused similarity-scan + top-k: no score matrix in HBM.

The XLA path (`ops.topk.blocked_topk`) materializes each (Q, block)
score tile in HBM before reducing it — at batch 1024 over a 1M corpus
that is ~4 GB of score traffic per query batch, several times the corpus
itself. This kernel keeps the scores in VMEM: each grid step

    1. DMAs one corpus block (B, d) into VMEM (the only HBM read),
    2. runs the MXU contraction against the resident query block,
    3. bin-max reduces the (Q, B) tile to (Q, bins) candidates
       (the PartialReduce recipe behind `lax.approx_max_k` — one
       survivor per bin; a true top-k element is lost only when two
       land in the same 64-wide bin of the same block),
    4. writes just the (Q, bins) maxima + indices.

The caller top-ks the (Q, num_blocks * bins) candidate sheet (~100x
smaller than the score matrix) and exact-rescores winners. Works for
bf16 (cosine, optional matryoshka prefix via zero-padded queries +
inverse prefix norms) and int8 (MXU int8 x int8 -> int32) corpora.

Matryoshka note: prefix dims < 128 lanes would break tiling, so prefix
scoring loads the first 128-column tile and zero-pads the query beyond
the prefix — the dot then equals the prefix dot at full tile speed.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import cdiv, round_up, use_interpret

NEG = -3.0e38  # python float: becomes an inline kernel constant, not a captured array


LANES = 128  # bins per block == the VPU lane count

# cap on the live candidate-sheet bytes (f32 vals + s32 ids) before
# fused_scan_topk chunks the query axis — see the chunking note in the
# function body. 1 GB keeps 10M x 768 runs well inside HBM next to the
# 7.2 GiB capacity table; 1M-scale runs (31 blocks x 8192 q = 260 MB)
# never chunk, so the production 1M path compiles identically.
_SHEET_BYTES_BUDGET = 1 << 30


def _packed_fits(d: int, block_rows: int) -> bool:
    """Packed int32 bin-max is exact iff |score|*rows + rows fits int32
    (|score| <= d*127*127 for int8 x int8 dots)."""
    rows = block_rows // LANES
    max_abs = d * 127 * 127
    # bound covers both real scores (max_abs*rows + rows) and the
    # sentinel (-(max_abs+1)*rows)
    return (max_abs + 1) * rows < 2**31


def _scan_kernel(c_ref, q_ref, inv_ref, mask_ref, vals_ref, idx_ref,
                 *, valid_n: int | None, block_rows: int,
                 int8_mode: bool, packed: bool = False,
                 packed_scaled: bool = False, strips: int = 1,
                 strip_outputs: bool = False):
    i = pl.program_id(0)
    q = q_ref[:]

    qn = q.shape[0]
    # strip_outputs: each strip emits its own LANES survivors (output
    # bins = strips*LANES), so bins stay block_rows/strips/LANES rows
    # wide — candidate DENSITY is decoupled from block size (big blocks
    # keep small bins). Without it, strips combine via a running max
    # into one LANES-wide output (bins span the whole block).
    rows_total = block_rows // (LANES * strips if strip_outputs
                                else LANES)
    lane = jax.lax.broadcasted_iota(jnp.int32, (qn, LANES), 1)
    acc = jnp.int32 if int8_mode else jnp.float32

    def strip_scores(s):
        """(Q, bs) scores + validity for column strip s of the block.
        `valid` is None when every row is in-bounds and unmasked (the
        fully-live aligned-capacity fast path) — callers then skip the
        mask select entirely, trimming the VPU chain that runs under
        the MXU contraction."""
        bs = block_rows // strips
        c = c_ref[pl.ds(s * bs, bs), :] if strips > 1 else c_ref[:]
        scores = jax.lax.dot_general(
            q, c, (((1,), (1,)), ((), ())), preferred_element_type=acc)
        valid = None
        if valid_n is not None:
            col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
            valid = col + s * bs + i * block_rows < valid_n
        if mask_ref is not None:
            mrow = (mask_ref[pl.ds(s * bs, bs)] if strips > 1
                    else mask_ref[:])
            m2 = jnp.broadcast_to(mrow[None, :], scores.shape)
            valid = m2 if valid is None else jnp.logical_and(valid, m2)
        return scores, valid, bs

    # Bin along lanes: flat column c = r*LANES + lane, so the reshape
    # (Q, B) -> (Q, B/LANES, LANES) preserves the minor-dim tiling (an
    # arbitrary minor-dim split is an unsupported Mosaic shape cast).
    # Bin `lane` holds the strided columns {lane, lane+128, ...}; the
    # sublane reduce takes each bin's max. `strips` > 1 splits the block
    # into column strips reduced immediately, so only a (Q, B/strips)
    # score tile is ever live — VMEM headroom for larger corpus blocks.
    if packed:
        # int8 fast path: pack (score, rows-1-row) into one int32 so a
        # single sublane max yields the bin max AND its row — one reduce
        # pass instead of max + compare + select (same winners incl.
        # min-row tie-breaking; verified vs the general path on TPU).
        # Sentinel = -(max_abs+1): strictly below any real score AND
        # covered by the _packed_fits overflow bound when multiplied by
        # `rows` (a fixed -(2^24)+1 sentinel overflows int32 at
        # rows > 128, flipping masked slots positive). Row ids are
        # block-global so strip maxima combine with one running max.
        sentinel = -(c_ref.shape[-1] * 127 * 127 + 1)
        best = None
        for s in range(strips):
            scores, valid, bs = strip_scores(s)
            sv = scores if valid is None else \
                jnp.where(valid, scores, sentinel)
            s3 = sv.reshape(qn, bs // LANES, LANES)
            row = jax.lax.broadcasted_iota(jnp.int32, s3.shape, 1)
            if not strip_outputs:
                row = row + s * (bs // LANES)
            m = jnp.max(s3 * rows_total + (rows_total - 1 - row), axis=1)
            if strip_outputs:
                vals = m // rows_total
                local_row = (rows_total - 1) - (m - vals * rows_total)
                vals_ref[0, :, pl.ds(s * LANES, LANES)] = jnp.where(
                    vals <= sentinel, NEG, vals.astype(jnp.float32))
                idx_ref[0, :, pl.ds(s * LANES, LANES)] = (
                    local_row * LANES + lane + s * bs + i * block_rows)
            else:
                best = m if best is None else jnp.maximum(best, m)
        if strip_outputs:
            return
        vals = best // rows_total
        local_row = (rows_total - 1) - (best - vals * rows_total)
        vals_ref[0] = jnp.where(vals <= sentinel, NEG,
                                vals.astype(jnp.float32))
        idx_ref[0] = local_row * LANES + lane + i * block_rows
        return

    if packed_scaled:
        # capacity-mode fast path (int8 table with a per-row f32
        # reciprocal scale): the int packing above needs integer scores,
        # but a FLOAT score packs too — map the f32 score to a
        # total-order int32 key (b ^ ((b>>31) & 0x7fffffff): identity on
        # positives, mantissa-flip on negatives — the classic radix-sort
        # float key, self-inverse), clear the low row_bits of mantissa,
        # and OR the (rows-1-row) tie-break in. ONE sublane max then
        # yields bin max + row, same as the packed path; the general
        # path's three reduce passes (max, hit-compare, row-min) and
        # their live tiles go away. Keys lose row_bits of mantissa
        # (block 32768 -> 8 bits -> 15-bit mantissa keys, well above the
        # int8 quantization noise); the funnel exact-rescores the
        # candidate union anyway. Near-ties inside the truncation window
        # break toward the smaller row like the general path.
        row_bits = max(1, (rows_total - 1).bit_length())
        rmask = (1 << row_bits) - 1
        int_min = jnp.int32(-(2**31))

        def decode(m):
            local_row = (rows_total - 1) - jnp.bitwise_and(m, rmask)
            keyc = jnp.bitwise_and(m, jnp.int32(~rmask))
            b2 = keyc ^ jnp.bitwise_and(keyc >> 31, jnp.int32(0x7FFFFFFF))
            vals = jax.lax.bitcast_convert_type(b2, jnp.float32)
            dead = m <= (int_min | jnp.int32(rmask))
            return jnp.where(dead, NEG, vals), local_row

        best = None
        for s in range(strips):
            scores, valid, bs = strip_scores(s)
            invr = (inv_ref[pl.ds(s * bs, bs)] if strips > 1
                    else inv_ref[:])
            f = scores.astype(jnp.float32) * invr[None, :]
            b = jax.lax.bitcast_convert_type(f, jnp.int32)
            key = b ^ jnp.bitwise_and(b >> 31, jnp.int32(0x7FFFFFFF))
            key = jnp.bitwise_and(key, jnp.int32(~rmask))
            if valid is not None:
                # INT_MIN sentinel: below every finite float key even
                # after the row OR (most-negative finite key is
                # ~ -2.14e9 + 2^23)
                key = jnp.where(valid, key, int_min)
            k3 = key.reshape(qn, bs // LANES, LANES)
            row = jax.lax.broadcasted_iota(jnp.int32, k3.shape, 1)
            if not strip_outputs:
                row = row + s * (bs // LANES)
            enc = jnp.bitwise_or(k3, (rows_total - 1 - row) & rmask)
            m = jnp.max(enc, axis=1)
            if strip_outputs:
                vals, local_row = decode(m)
                vals_ref[0, :, pl.ds(s * LANES, LANES)] = vals
                idx_ref[0, :, pl.ds(s * LANES, LANES)] = (
                    local_row * LANES + lane + s * bs + i * block_rows)
            else:
                best = m if best is None else jnp.maximum(best, m)
        if strip_outputs:
            return
        vals, local_row = decode(best)
        vals_ref[0] = vals
        idx_ref[0] = local_row * LANES + lane + i * block_rows
        return

    best_m = None
    best_row = None
    for s in range(strips):
        scores, valid, bs = strip_scores(s)
        scores = scores.astype(jnp.float32)
        if inv_ref is not None:
            invr = (inv_ref[pl.ds(s * bs, bs)] if strips > 1
                    else inv_ref[:])
            scores = scores * invr[None, :]
        if valid is not None:
            scores = jnp.where(valid, scores, NEG)
        s3 = scores.reshape(qn, bs // LANES, LANES)
        m = jnp.max(s3, axis=1)  # (Q, LANES)
        iota = jax.lax.broadcasted_iota(jnp.int32, s3.shape, 1)
        if not strip_outputs:
            iota = iota + s * (bs // LANES)
        hit = s3 == m[:, None, :]
        local_row = jnp.min(jnp.where(hit, iota, rows_total), axis=1)
        if strip_outputs:
            vals_ref[0, :, pl.ds(s * LANES, LANES)] = m
            idx_ref[0, :, pl.ds(s * LANES, LANES)] = (
                local_row * LANES + lane + s * bs + i * block_rows)
        elif best_m is None:
            best_m, best_row = m, local_row
        else:
            better = m > best_m
            best_row = jnp.where(better, local_row, best_row)
            best_m = jnp.maximum(m, best_m)
    if strip_outputs:
        return
    vals_ref[0] = best_m
    idx_ref[0] = best_row * LANES + lane + i * block_rows


@functools.partial(
    jax.jit,
    static_argnames=("k", "bins", "block_rows", "valid_n", "prefix_dim",
                     "approx_sheet", "select", "q_block", "strips",
                     "strip_outputs"),
)
def fused_scan_topk(
    corpus: jax.Array,
    queries: jax.Array,
    k: int,
    *,
    bins: int = LANES,  # fixed at 128 per block (lane binning); kept in the
                        # signature for call-site clarity — tune bin size
                        # via block_rows instead (bin size = block_rows/128)
    block_rows: int = 8192,
    valid_n: Optional[int] = None,
    prefix_dim: Optional[int] = None,
    inv_norms: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    approx_sheet: bool = False,  # approx_max_k over the candidate sheet
                                 # (fine when an exact rescore follows)
    select: bool = True,  # False: return the raw (Q, nb*bins) candidate
                          # sheet instead of top-k — profiling/composition
                          # hook (callers then select or merge themselves)
    strips: int = 1,  # split each block into column strips reduced
                      # immediately — only a (Q, B/strips) score tile is
                      # live, freeing VMEM for larger blocks
    strip_outputs: bool = False,  # each strip emits its own LANES
                      # survivors (output sheet = nb*strips*LANES): big
                      # blocks keep small bins, so candidate density —
                      # and with it recall — is decoupled from the
                      # block/VMEM geometry
    q_block: Optional[int] = None,  # tile the query dim: the (q_block, B)
                                    # score tile is the VMEM limiter, so
                                    # tiling decouples batch size from
                                    # block_rows (batch 2048 keeps the
                                    # 16384-row corpus block instead of
                                    # halving it). Grid order is
                                    # (block, q_tile) with q innermost, so
                                    # each corpus slab is DMAed once and
                                    # reused across query tiles.
) -> Tuple[jax.Array, jax.Array]:
    """Approximate top-k via fused scan. Returns (vals (Q,k), idx (Q,k)).

    `valid_n` is static here (the kernel bakes the bound); pass the
    capacity-padded corpus and mask tombstones via `mask` for sizes that
    change often.
    """
    if bins != LANES:
        raise ValueError(
            f"bins is fixed at {LANES} (lane binning); tune candidate "
            f"density via block_rows instead")
    n, d = corpus.shape
    q_count = queries.shape[0]
    int8_mode = corpus.dtype == jnp.int8

    # The per-block candidate sheets materialize at (nb, Q, 128) f32 +
    # s32 (+ one layout copy before the select) — at capacity scale x
    # big batches that is multi-GB of HLO temps NEXT TO the resident
    # table (10M rows x Q=8192 = 7.2 GB; measured compile OOM, r4).
    # Chunk the query axis into separate kernel calls inside the same
    # trace: each chunk's sheets die after its select, so peak temps
    # scale with the chunk, the funnel stays ONE dispatch, and MXU work
    # is unchanged (the (block, q_tile) grid re-reads corpus slabs per
    # query tile either way).
    if select:
        nb_est = cdiv(n, block_rows)
        bo_est = LANES * strips if strip_outputs else LANES
        if 8 * nb_est * q_count * bo_est > _SHEET_BYTES_BUDGET:
            step = max(q_block or 1024, 128)
            qc = max(step, (_SHEET_BYTES_BUDGET // (8 * nb_est * bo_est))
                     // step * step)
            if qc < q_count:
                # trace-time telemetry (like last_path below): tests
                # assert the chunk path actually engaged rather than
                # comparing a jit-cache replay to itself
                fused_scan_topk.last_chunk = qc
                vs, ids = [], []
                for s in range(0, q_count, qc):
                    v, i = fused_scan_topk(
                        corpus, queries[s:s + qc], k, bins=bins,
                        block_rows=block_rows, valid_n=valid_n,
                        prefix_dim=prefix_dim, inv_norms=inv_norms,
                        mask=mask, approx_sheet=approx_sheet,
                        select=True, strips=strips,
                        strip_outputs=strip_outputs,
                        q_block=q_block if q_block and q_block < qc
                        else None)
                    vs.append(v)
                    ids.append(i)
                return jnp.concatenate(vs), jnp.concatenate(ids)

    q_orig = q_count
    if q_block is not None and q_block < q_count:
        nq = cdiv(q_count, q_block)
        if nq * q_block != q_count:
            queries = jnp.pad(queries, ((0, nq * q_block - q_count), (0, 0)))
            q_count = nq * q_block
    else:
        q_block = None

    # prefix scoring: load only the first ceil(prefix/128)*128 columns and
    # zero the query tail so the dot equals the prefix dot.
    d_load = d
    if prefix_dim is not None and prefix_dim < d:
        d_load = min(d, round_up(prefix_dim, 128))
        queries = queries[:, :d_load]
        if prefix_dim < d_load:
            col = jnp.arange(d_load)
            queries = jnp.where(col[None, :] < prefix_dim, queries, 0)
    else:
        prefix_dim = None

    nb = cdiv(n, block_rows)
    padded = nb * block_rows
    if padded != n:
        if corpus.nbytes > 256 * 1024 * 1024:
            import logging

            # the pad materializes a second copy of the table — at multi-
            # GiB corpora that transient can OOM the chip (keep the index
            # capacity a multiple of block_rows to avoid it)
            logging.getLogger("rag_application_tpu.ops").warning(
                "fused_scan_topk: corpus rows (%d) not a multiple of "
                "block_rows (%d) — padding copies the %.1f GiB table; "
                "align the index capacity to avoid the transient",
                n, block_rows, corpus.nbytes / 2**30)
        corpus = jnp.pad(corpus, ((0, padded - n), (0, 0)))
        if inv_norms is not None:
            inv_norms = jnp.pad(inv_norms, (0, padded - n))
        if mask is not None:
            mask = jnp.pad(mask, (0, padded - n))
        if valid_n is None:
            valid_n = n

    if block_rows % (strips * LANES):
        raise ValueError(
            f"block_rows {block_rows} not divisible by strips*{LANES}")
    use_packed = (int8_mode and inv_norms is None
                  and _packed_fits(d_load, block_rows // strips
                                   if strip_outputs else block_rows))
    use_packed_scaled = int8_mode and inv_norms is not None
    # telemetry for bench/perf assertions: which reduce variant this
    # trace selected (the capacity-mode bench asserts packed_scaled is
    # actually engaged rather than assuming it)
    fused_scan_topk.last_path = (
        "packed_scaled" if use_packed_scaled
        else "packed" if use_packed
        else "int8_general" if int8_mode else "f32")
    kernel = functools.partial(
        _scan_kernel,
        valid_n=valid_n,
        block_rows=block_rows,
        int8_mode=int8_mode,
        packed=use_packed,
        packed_scaled=use_packed_scaled,
        strips=strips,
        strip_outputs=strip_outputs,
    )
    bins_out = LANES * strips if strip_outputs else LANES

    qb = q_block if q_block is not None else q_count
    nq = q_count // qb
    in_specs = [
        pl.BlockSpec((block_rows, d_load), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((qb, d_load), lambda i, j: (j, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [corpus[:, :d_load] if d_load != corpus.shape[1] else corpus,
            queries]
    if inv_norms is not None:
        in_specs.append(
            pl.BlockSpec((block_rows,), lambda i, j: (i,),
                         memory_space=pltpu.VMEM)
        )
        args.append(inv_norms.astype(jnp.float32))
    if mask is not None:
        in_specs.append(
            pl.BlockSpec((block_rows,), lambda i, j: (i,),
                         memory_space=pltpu.VMEM)
        )
        args.append(mask)

    def wrapped(*refs):
        c_ref, q_ref = refs[0], refs[1]
        pos = 2
        inv_ref = None
        mask_ref = None
        if inv_norms is not None:
            inv_ref = refs[pos]
            pos += 1
        if mask is not None:
            mask_ref = refs[pos]
            pos += 1
        vals_ref, idx_ref = refs[-2], refs[-1]
        kernel(c_ref, q_ref, inv_ref, mask_ref, vals_ref, idx_ref)

    vals, idx = pl.pallas_call(
        wrapped,
        grid=(nb, nq),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, qb, bins_out), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qb, bins_out), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb, q_count, bins_out), jnp.float32),
            jax.ShapeDtypeStruct((nb, q_count, bins_out), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            # the (Q, B) score tile + its int32 twin live on the kernel
            # stack; the default 16 MB scoped-vmem budget is too small
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=use_interpret(),
    )(*args)

    sheet_vals = jnp.transpose(vals, (1, 0, 2)).reshape(q_count,
                                                        nb * bins_out)
    sheet_idx = jnp.transpose(idx, (1, 0, 2)).reshape(q_count,
                                                      nb * bins_out)
    if q_orig != q_count:
        sheet_vals = sheet_vals[:q_orig]
        sheet_idx = sheet_idx[:q_orig]
    if not select:
        return sheet_vals, sheet_idx
    k_eff = min(k, nb * bins_out)
    if approx_sheet and nb * bins_out > 2 * k_eff:
        top, pos = jax.lax.approx_max_k(sheet_vals, k_eff)
    else:
        top, pos = jax.lax.top_k(sheet_vals, k_eff)
    out_idx = jnp.take_along_axis(sheet_idx, pos, axis=-1)
    top = jnp.where(top <= NEG, -jnp.inf, top)
    return top, out_idx
