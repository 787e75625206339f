import jax.numpy as jnp
import numpy as np
import pytest

from rag_application_tpu.ops.topk import blocked_topk, gather_rescore, merge_topk


def brute_force_topk(corpus, queries, k):
    scores = queries @ corpus.T
    idx = np.argsort(-scores, axis=-1)[:, :k]
    vals = np.take_along_axis(scores, idx, axis=-1)
    return vals, idx


def normed(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_single_block_exact(rng):
    corpus = normed(rng, 500, 64)
    queries = normed(rng, 7, 64)
    vals, idx = blocked_topk(
        jnp.asarray(corpus), jnp.asarray(queries), 10, approx=False
    )
    ref_vals, ref_idx = brute_force_topk(corpus, queries, 10)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-5)


def test_multi_block_exact(rng):
    corpus = normed(rng, 1000, 32)
    queries = normed(rng, 5, 32)
    vals, idx = blocked_topk(
        jnp.asarray(corpus), jnp.asarray(queries), 8, block_size=128, approx=False
    )
    ref_vals, ref_idx = brute_force_topk(corpus, queries, 8)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-5)


def test_non_multiple_block_padding(rng):
    corpus = normed(rng, 777, 16)
    queries = normed(rng, 3, 16)
    vals, idx = blocked_topk(
        jnp.asarray(corpus), jnp.asarray(queries), 5, block_size=256, approx=False
    )
    ref_vals, ref_idx = brute_force_topk(corpus, queries, 5)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)


def test_valid_n_excludes_padding_rows(rng):
    corpus = normed(rng, 100, 16)
    # Poison the tail: rows beyond valid_n have huge scores but must not appear.
    corpus[90:] = 100.0
    queries = normed(rng, 4, 16)
    vals, idx = blocked_topk(
        jnp.asarray(corpus), jnp.asarray(queries), 5, valid_n=90, approx=False
    )
    assert np.asarray(idx).max() < 90


def test_filter_mask(rng):
    corpus = normed(rng, 300, 16)
    queries = normed(rng, 2, 16)
    mask = np.zeros(300, dtype=bool)
    mask[::3] = True
    vals, idx = blocked_topk(
        jnp.asarray(corpus),
        jnp.asarray(queries),
        7,
        block_size=128,
        filter_mask=jnp.asarray(mask),
        approx=False,
    )
    assert np.all(np.asarray(idx) % 3 == 0)
    allowed = np.where(mask)[0]
    sub_vals, sub_idx = brute_force_topk(corpus[allowed], queries, 7)
    np.testing.assert_array_equal(np.asarray(idx), allowed[sub_idx])


def test_prefix_dim_with_inv_norms(rng):
    corpus = normed(rng, 400, 64)
    queries = normed(rng, 3, 64)
    prefix = corpus[:, :16]
    inv = (1.0 / np.linalg.norm(prefix, axis=-1)).astype(np.float32)
    vals, idx = blocked_topk(
        jnp.asarray(corpus),
        jnp.asarray(queries),
        6,
        prefix_dim=16,
        inv_norms=jnp.asarray(inv),
        approx=False,
    )
    # Reference: cosine over the renormalized prefix view.
    ref_scores = queries[:, :16] @ (prefix * inv[:, None]).T
    ref_idx = np.argsort(-ref_scores, axis=-1)[:, :6]
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)


def test_int8_scoring(rng):
    corpus = normed(rng, 200, 32)
    queries = normed(rng, 2, 32)
    c8 = np.clip(np.round(corpus * 127), -127, 127).astype(np.int8)
    q8 = np.clip(np.round(queries * 127), -127, 127).astype(np.int8)
    vals, idx = blocked_topk(jnp.asarray(c8), jnp.asarray(q8), 5, approx=False)
    ref_scores = q8.astype(np.int32) @ c8.astype(np.int32).T
    ref_idx = np.argsort(-ref_scores, axis=-1, kind="stable")[:, :5]
    ref_vals = np.take_along_axis(ref_scores, ref_idx, axis=-1)
    np.testing.assert_allclose(np.sort(np.asarray(vals)), np.sort(ref_vals.astype(np.float32)))


def test_merge_topk():
    va = jnp.array([[3.0, 1.0]])
    ia = jnp.array([[10, 11]], dtype=jnp.int32)
    vb = jnp.array([[2.0, 0.5]])
    ib = jnp.array([[20, 21]], dtype=jnp.int32)
    v, i = merge_topk(va, ia, vb, ib, 3)
    np.testing.assert_allclose(np.asarray(v), [[3.0, 2.0, 1.0]])
    np.testing.assert_array_equal(np.asarray(i), [[10, 20, 11]])


def test_gather_rescore(rng):
    corpus = normed(rng, 50, 24)
    queries = normed(rng, 4, 24)
    cand = np.tile(np.arange(10, dtype=np.int32), (4, 1))
    scores = gather_rescore(
        jnp.asarray(corpus), jnp.asarray(queries), jnp.asarray(cand)
    )
    ref = queries @ corpus[:10].T
    np.testing.assert_allclose(np.asarray(scores), ref, rtol=1e-5, atol=1e-6)


def test_k_larger_than_block(rng):
    corpus = normed(rng, 600, 16)
    queries = normed(rng, 2, 16)
    vals, idx = blocked_topk(
        jnp.asarray(corpus), jnp.asarray(queries), 64, block_size=128, approx=False
    )
    ref_vals, ref_idx = brute_force_topk(corpus, queries, 64)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
