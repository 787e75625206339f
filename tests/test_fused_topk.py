import jax.numpy as jnp
import numpy as np
import pytest

from rag_application_tpu.config import FunnelConfig, IndexConfig
from rag_application_tpu.index.dense import DenseIndex
from rag_application_tpu.ops.fused_topk import fused_scan_topk
from rag_application_tpu.search.fused import FusedSearcher


def normed(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_fused_scan_recall(rng):
    n, d, q, k = 1000, 128, 8, 10
    corpus = normed(rng, n, d)
    queries = corpus[:q] + 0.02 * rng.standard_normal((q, d)).astype(np.float32)
    vals, idx = fused_scan_topk(jnp.asarray(corpus), jnp.asarray(queries), k,
                                block_rows=256)
    exact = np.argsort(-(queries @ corpus.T), axis=-1)[:, :k]
    idx = np.asarray(idx)
    recall = np.mean([np.isin(exact[i], idx[i]).mean() for i in range(q)])
    assert recall >= 0.9
    assert (idx[:, 0] == np.arange(q)).all()


def test_fused_scan_mask_and_padding(rng):
    n, d = 900, 128  # not a multiple of block_rows
    corpus = normed(rng, n, d)
    queries = corpus[:4]
    mask = np.zeros(n, dtype=bool)
    mask[::3] = True
    vals, idx = fused_scan_topk(jnp.asarray(corpus), jnp.asarray(queries), 5,
                                block_rows=256,
                                mask=jnp.asarray(mask))
    assert (np.asarray(idx) % 3 == 0).all()


def test_fused_scan_int8(rng):
    corpus = normed(rng, 500, 128)
    queries = corpus[:4]
    c8 = np.clip(np.round(corpus * 127), -127, 127).astype(np.int8)
    q8 = np.clip(np.round(queries * 127), -127, 127).astype(np.int8)
    vals, idx = fused_scan_topk(jnp.asarray(c8), jnp.asarray(q8), 5,
                                block_rows=256)
    assert (np.asarray(idx)[:, 0] == np.arange(4)).all()


def test_fused_scan_prefix(rng):
    corpus = normed(rng, 600, 256)
    queries = corpus[:4]
    inv = (1.0 / np.linalg.norm(corpus[:, :64], axis=-1)).astype(np.float32)
    vals, idx = fused_scan_topk(jnp.asarray(corpus), jnp.asarray(queries), 5,
                                block_rows=256, prefix_dim=64,
                                inv_norms=jnp.asarray(inv))
    ref = np.argsort(-(queries[:, :64] @ (corpus[:, :64] * inv[:, None]).T),
                     axis=-1)[:, :5]
    idx = np.asarray(idx)
    recall = np.mean([np.isin(ref[i], idx[i]).mean() for i in range(4)])
    assert recall >= 0.9


def test_pipeline_with_pallas_scan_matches_xla(rng):
    dense = DenseIndex(IndexConfig(dim=128, matryoshka_dims=(32, 64),
                                   initial_capacity=1024, block_size=512))
    embs = (rng.standard_normal((700, 128))
            * np.exp(-0.02 * np.arange(128))).astype(np.float32)
    dense.insert(embs)
    funnel = FunnelConfig(matryoshka_limits=(32, 24), dense_limit=16,
                          quantized_limit=32, sparse_limit=0, final_limit=10)
    queries = embs[:6] + 0.01 * rng.standard_normal((6, 128)).astype(np.float32)

    sx = FusedSearcher(dense, None, funnel, scan_impl="xla")
    sp = FusedSearcher(dense, None, funnel, scan_impl="pallas",
                       scan_block_rows=256)
    vx, ix = sx.search(queries, None, 10)
    vp, ip = sp.search(queries, None, 10)

    ix, ip = np.asarray(ix), np.asarray(ip)
    vx, vp = np.asarray(vx), np.asarray(vp)
    # same top results (both engines feed exact rescore)
    overlap = np.mean([np.isin(ix[i][np.isfinite(vx[i])],
                               ip[i][np.isfinite(vp[i])]).mean()
                       for i in range(6)])
    assert overlap >= 0.9, overlap
    assert (ip[:, 0] == ix[:, 0]).all()


def test_prefix_scan_table_contents(rng):
    """prefix_int8 rows = int8 of the renormalized first-p columns."""
    dense = DenseIndex(IndexConfig(dim=256, matryoshka_dims=(64, 128),
                                   initial_capacity=512, block_size=256,
                                   scan_prefix_dim=128))
    x = (rng.standard_normal((300, 256))
         * np.exp(-0.02 * np.arange(256))).astype(np.float32)
    dense.insert(x)
    got = np.asarray(dense.prefix_int8[:300])
    xp = x[:, :128]
    xp = xp / np.linalg.norm(xp, axis=-1, keepdims=True)
    want = np.clip(np.round(xp * 127), -127, 127).astype(np.int8)
    # bf16-free path: derived from raw f32 on insert, must match exactly
    assert np.abs(got.astype(np.int32) - want.astype(np.int32)).max() <= 1
    # rows beyond size stay zero
    assert not np.asarray(dense.prefix_int8[300:]).any()


def test_prefix_scan_dim_validation():
    with pytest.raises(ValueError):
        DenseIndex(IndexConfig(dim=256, scan_prefix_dim=100))
    with pytest.raises(ValueError):
        DenseIndex(IndexConfig(dim=128, scan_prefix_dim=128))


def test_fused_prefix_scan_recall(rng):
    """Funnel with the contiguous prefix scan keeps exact-rescore recall
    on a spectrally-decaying corpus (the realistic energy profile)."""
    cfg = IndexConfig(dim=256, matryoshka_dims=(64, 128),
                      initial_capacity=1024, block_size=512,
                      scan_prefix_dim=128)
    dense = DenseIndex(cfg)
    embs = (rng.standard_normal((800, 256))
            * np.exp(-0.01 * np.arange(256))).astype(np.float32)
    dense.insert(embs)
    queries = embs[:8] + 0.02 * rng.standard_normal((8, 256)).astype(np.float32)
    funnel = FunnelConfig(matryoshka_limits=(32, 24), dense_limit=16,
                          quantized_limit=64, sparse_limit=0, final_limit=10)

    s_pref = FusedSearcher(dense, None, funnel, scan_impl="pallas",
                           scan_block_rows=256)
    vals, ids = s_pref.search(queries, None, 10, use_matryoshka=False)
    ids = np.asarray(ids)
    # exact oracle
    qn = queries / np.linalg.norm(queries, axis=-1, keepdims=True)
    cn = embs / np.linalg.norm(embs, axis=-1, keepdims=True)
    exact = np.argsort(-(qn @ cn.T), axis=-1)[:, :10]
    recall = np.mean([np.isin(exact[i], ids[i]).mean() for i in range(8)])
    assert recall >= 0.9, recall
    assert (ids[:, 0] == np.arange(8)).all()


def test_prefix_table_survives_checkpoint(rng, tmp_path):
    from rag_application_tpu.config import Config, SparseConfig
    from rag_application_tpu.index.checkpoint import (load_collection,
                                                      save_collection)
    from rag_application_tpu.store.collection import Collection

    cfg = Config()
    cfg.index = IndexConfig(dim=256, matryoshka_dims=(64, 128),
                            initial_capacity=256, block_size=256,
                            scan_prefix_dim=128)
    cfg.sparse = SparseConfig(candidate_pool=64, max_query_terms=8)
    col = Collection("ck", cfg)
    x = (rng.standard_normal((100, 256))
         * np.exp(-0.01 * np.arange(256))).astype(np.float32)
    col.store_document_vectors("d1", [{"text": f"t{i}"} for i in range(100)], x)
    save_collection(col, str(tmp_path / "ck"))
    col2 = load_collection(str(tmp_path / "ck"), cfg)
    a = np.asarray(col.dense.prefix_int8[:100]).astype(np.int32)
    b = np.asarray(col2.dense.prefix_int8[:100]).astype(np.int32)
    # restored table re-derived from bf16 vecs: within quantization step
    assert np.abs(a - b).max() <= 1


def test_approx_sheet_recall(rng):
    """approx_max_k sheet select keeps candidates (exact rescore follows)."""
    corpus = normed(rng, 4096, 128)
    queries = corpus[:8]
    c8 = np.clip(np.round(corpus * 127), -127, 127).astype(np.int8)
    q8 = np.clip(np.round(queries * 127), -127, 127).astype(np.int8)
    ve, ie = fused_scan_topk(jnp.asarray(c8), jnp.asarray(q8), 64,
                             block_rows=256, approx_sheet=False)
    va, ia = fused_scan_topk(jnp.asarray(c8), jnp.asarray(q8), 64,
                             block_rows=256, approx_sheet=True)
    ie, ia = np.asarray(ie), np.asarray(ia)
    overlap = np.mean([np.isin(ie[i], ia[i]).mean() for i in range(8)])
    assert overlap >= 0.9, overlap
    assert (ia[:, 0] == np.arange(8)).all()


def test_packed_sentinel_no_overflow_at_large_blocks(rng):
    """rows = block_rows/128 > 128 used to overflow the fixed sentinel
    (sentinel*rows wrapped positive), returning masked rows as hits."""
    n, d = 1 << 16, 128  # block 32768 -> rows=256; d=128 passes _packed_fits
    corpus = normed(rng, n, d)
    c8 = np.clip(np.round(corpus * 127), -127, 127).astype(np.int8)
    q8 = c8[:4]
    mask = np.zeros(n, dtype=bool)
    mask[: n // 2] = True  # entire second half masked out
    vals, idx = fused_scan_topk(jnp.asarray(c8), jnp.asarray(q8), 64,
                                block_rows=32768, mask=jnp.asarray(mask))
    idx, vals = np.asarray(idx), np.asarray(vals)
    ok = np.isfinite(vals)
    assert ok.any()
    assert (idx[ok] < n // 2).all(), "masked rows leaked into results"
    assert (idx[:, 0] == np.arange(4)).all()


def test_q_block_tiling_matches_untiled(rng):
    """q_block tiles the query dim across the grid (VMEM decoupling for
    big batches); results must be identical, including ragged batches."""
    n, d = 3000, 128
    corpus = normed(rng, n, d)
    c8 = np.clip(np.round(corpus * 127), -127, 127).astype(np.int8)
    queries = normed(rng, 20, d)
    q8 = np.clip(np.round(queries * 127), -127, 127).astype(np.int8)
    mask = rng.random(n) > 0.1
    for kwargs in (dict(), dict(mask=jnp.asarray(mask))):
        v0, i0 = fused_scan_topk(jnp.asarray(c8), jnp.asarray(q8), 10,
                                 block_rows=512, **kwargs)
        for qb in (8, 16, 20, 64):  # divides, ragged, ==Q, >Q
            v1, i1 = fused_scan_topk(jnp.asarray(c8), jnp.asarray(q8), 10,
                                     block_rows=512, q_block=qb, **kwargs)
            np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
            np.testing.assert_allclose(np.asarray(v0), np.asarray(v1))
    # bf16 + inv_norms (cosine) path
    inv = jnp.asarray(1.0 / np.linalg.norm(corpus, axis=1))
    cb = jnp.asarray(corpus, dtype=jnp.bfloat16)
    v0, i0 = fused_scan_topk(cb, jnp.asarray(queries), 10, block_rows=512,
                             inv_norms=inv)
    v1, i1 = fused_scan_topk(cb, jnp.asarray(queries), 10, block_rows=512,
                             inv_norms=inv, q_block=8)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_searcher_q_block_matches(rng):
    cfg = IndexConfig(dim=128, matryoshka_dims=(), initial_capacity=2048)
    dense = DenseIndex(cfg)
    corpus = normed(rng, 1500, 128)
    dense.insert(corpus)
    queries = corpus[:16] + 0.01 * rng.standard_normal((16, 128)).astype(np.float32)
    f = FunnelConfig(dense_limit=16, quantized_limit=16, sparse_limit=0,
                     final_limit=10)
    s0 = FusedSearcher(dense, None, f, scan_impl="pallas", scan_block_rows=256)
    s1 = FusedSearcher(dense, None, f, scan_impl="pallas", scan_block_rows=256,
                       scan_q_block=8)
    v0, i0 = s0.search(queries, None, 10, use_matryoshka=False)
    v1, i1 = s1.search(queries, None, 10, use_matryoshka=False)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_sheet_mode_matches_select(rng):
    """select=False returns the raw candidate sheet; its top-k must equal
    the selected output (profiling/composition hook)."""
    import jax

    n, d = 3000, 128
    corpus = normed(rng, n, d)
    c8 = np.clip(np.round(corpus * 127), -127, 127).astype(np.int8)
    q8 = np.clip(np.round(normed(rng, 12, d) * 127), -127, 127).astype(np.int8)
    sv, si = fused_scan_topk(jnp.asarray(c8), jnp.asarray(q8), 10,
                             block_rows=512, select=False)
    assert sv.shape == si.shape == (12, (3072 // 512) * 128)
    v0, i0 = fused_scan_topk(jnp.asarray(c8), jnp.asarray(q8), 10,
                             block_rows=512)
    top, pos = jax.lax.top_k(sv, 10)
    idx = jnp.take_along_axis(si, pos, axis=-1)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(idx))


def test_int8_scaled_packed_matches_exact(rng):
    """Capacity-mode scan (int8 table + per-row f32 reciprocal) rides the
    float-packed single-pass reduce; winners must match the exact scaled
    brute force up to mantissa-truncation ties, and the strips/q_block
    variants must match the base kernel exactly."""
    n, d, k = 2000, 128, 10
    x = (rng.standard_normal((n, d)) * np.exp(-0.02 * np.arange(d))
         ).astype(np.float32)
    amax = np.abs(x).max(axis=1)
    c8 = np.clip(np.round(x * (127.0 / amax[:, None])), -127, 127
                 ).astype(np.int8)
    recip = (amax / 127.0).astype(np.float32)
    queries = normed(rng, 12, d)
    q8 = np.clip(np.round(queries * 127), -127, 127).astype(np.int8)

    exact = (q8.astype(np.float32) @ c8.astype(np.float32).T) * recip[None, :]
    exact_top = np.sort(exact, axis=-1)[:, -k:][:, ::-1]

    v0, i0 = fused_scan_topk(jnp.asarray(c8), jnp.asarray(q8), k,
                             block_rows=256,
                             inv_norms=jnp.asarray(recip))
    # scores are mantissa-truncated keys: equal to exact within 2^-15 rel
    got = np.take_along_axis(exact, np.asarray(i0), axis=-1)
    np.testing.assert_allclose(np.asarray(v0), got, rtol=2e-4)
    # bin-max candidate recall vs exact top-k (one survivor per 2-row bin
    # at block 256 -> near-exact here)
    ex_ids = np.argsort(-exact, axis=-1)[:, :k]
    rec = np.mean([np.isin(ex_ids[i], np.asarray(i0)[i]).mean()
                   for i in range(12)])
    assert rec >= 0.9
    np.testing.assert_allclose(np.asarray(v0)[:, 0], exact_top[:, 0],
                               rtol=2e-4)

    for kwargs in (dict(strips=2), dict(q_block=8),
                   dict(strips=2, q_block=4)):
        v1, i1 = fused_scan_topk(jnp.asarray(c8), jnp.asarray(q8), k,
                                 block_rows=256,
                                 inv_norms=jnp.asarray(recip), **kwargs)
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        np.testing.assert_allclose(np.asarray(v0), np.asarray(v1))


def test_int8_scaled_packed_mask_and_negatives(rng):
    """Masked rows must never surface, and all-negative score regions
    (the mantissa-flipped key branch) must still rank correctly."""
    n, d = 600, 128
    x = -np.abs(rng.standard_normal((n, d))).astype(np.float32)  # all-neg dots
    amax = np.abs(x).max(axis=1)
    c8 = np.clip(np.round(x * (127.0 / amax[:, None])), -127, 127
                 ).astype(np.int8)
    recip = (amax / 127.0).astype(np.float32)
    q = np.abs(normed(rng, 4, d)).astype(np.float32)  # positive queries
    q8 = np.clip(np.round(q * 127), -127, 127).astype(np.int8)
    mask = rng.random(n) > 0.5
    v, i = fused_scan_topk(jnp.asarray(c8), jnp.asarray(q8), 5,
                           block_rows=256, inv_norms=jnp.asarray(recip),
                           mask=jnp.asarray(mask))
    i = np.asarray(i)
    assert mask[i].all()
    exact = (q8.astype(np.float32) @ c8.astype(np.float32).T) * recip[None, :]
    exact = np.where(mask[None, :], exact, -np.inf)
    # every returned value is negative and the top-1 is the masked argmax
    assert (np.asarray(v) < 0).all()
    np.testing.assert_array_equal(i[:, 0], np.argmax(exact, axis=-1))


def test_query_chunked_select_matches_unchunked(monkeypatch):
    """The sheet-budget query chunking (added after the 10M x Q=8192
    funnel-compile HBM OOM) must return exactly the unchunked result."""
    import numpy as np

    import rag_application_tpu.ops.fused_topk as ft

    rng = np.random.default_rng(5)
    corpus = jnp.asarray(rng.standard_normal((4096, 128)), jnp.float32)
    queries = jnp.asarray(rng.standard_normal((512, 128)), jnp.float32)
    base = ft.fused_scan_topk(corpus, queries, 10, block_rows=1024,
                              q_block=128)
    monkeypatch.setattr(ft, "_SHEET_BYTES_BUDGET", 8 * 4 * 128 * 128)
    # fused_scan_topk is jit-cached: same shapes/statics replay the
    # cached executable and never re-read the patched budget — clear
    # the cache so the call re-traces through the chunk branch, and
    # assert via the trace-time marker that the branch actually ran
    import jax

    jax.clear_caches()
    ft.fused_scan_topk.last_chunk = None
    chunked = ft.fused_scan_topk(corpus, queries, 10, block_rows=1024,
                                 q_block=128)
    assert ft.fused_scan_topk.last_chunk == 128  # chunk path engaged
    np.testing.assert_array_equal(np.asarray(base[1]),
                                  np.asarray(chunked[1]))
    np.testing.assert_allclose(np.asarray(base[0]), np.asarray(chunked[0]),
                               rtol=1e-6)


@pytest.mark.parametrize("mode", ["packed", "packed_scaled", "f32"])
def test_strip_outputs_sheet_exact(rng, mode):
    """strip_outputs: each strip emits its own 128 survivors — the
    survivor set must equal the brute-force per-(block, strip, lane)
    argmax for all three kernel paths, decoupling candidate density
    from block size."""
    n, d, Q, block, strips = 2048, 64, 8, 512, 2
    if mode == "f32":
        corpus = rng.standard_normal((n, d)).astype(np.float32)
        queries = rng.standard_normal((Q, d)).astype(np.float32)
        inv = None
    else:
        corpus = rng.integers(-127, 128, (n, d)).astype(np.int8)
        queries = rng.integers(-127, 128, (Q, d)).astype(np.int8)
        inv = ((0.5 + rng.random(n)).astype(np.float32)
               if mode == "packed_scaled" else None)
    scores = (queries.astype(np.float32) @ corpus.astype(np.float32).T)
    if inv is not None:
        scores = scores * inv[None, :]
    v, i = fused_scan_topk(
        jnp.asarray(corpus), jnp.asarray(queries), n, block_rows=block,
        strips=strips, strip_outputs=True,
        inv_norms=jnp.asarray(inv) if inv is not None else None,
        select=False)
    got_i, got_v = np.asarray(i), np.asarray(v)
    assert got_i.shape == (Q, (n // block) * strips * 128)
    bs = block // strips
    ref = set()
    for b in range(n // block):
        for s in range(strips):
            base = b * block + s * bs
            seg = scores[:, base:base + bs].reshape(Q, -1, 128)
            for qi in range(Q):
                for lane in range(128):
                    r = int(np.argmax(seg[qi, :, lane]))
                    ref.add((qi, base + r * 128 + lane))
    mine = {(qi, int(got_i[qi, j])) for qi in range(Q)
            for j in range(got_i.shape[1])}
    assert mine == ref
    for qi in range(Q):
        np.testing.assert_allclose(got_v[qi], scores[qi, got_i[qi]],
                                   rtol=2e-4)
