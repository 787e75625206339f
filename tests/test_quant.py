import jax.numpy as jnp
import numpy as np

from rag_application_tpu.ops.quant import (
    dequantize_int8,
    matryoshka_inv_norms,
    prepare_vectors,
    prepare_vectors_xla,
    quantize_int8,
)


def test_quantize_parity_with_reference_formula(rng):
    """Reference: clip(round(x*127)) on normalized vectors (qdrant_handler.py:144-146)."""
    x = rng.standard_normal((32, 64)).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    q = np.asarray(quantize_int8(jnp.asarray(x)))
    ref = np.clip(np.round(x * 127), -127, 127).astype(np.int8)
    np.testing.assert_array_equal(q, ref)


def test_dequantize_roundtrip(rng):
    x = rng.standard_normal((8, 16)).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    back = np.asarray(dequantize_int8(quantize_int8(jnp.asarray(x))))
    assert np.abs(back - x).max() < 1 / 127


def test_matryoshka_inv_norms(rng):
    x = rng.standard_normal((10, 64)).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    inv = np.asarray(matryoshka_inv_norms(jnp.asarray(x), (8, 16, 32)))
    for j, d in enumerate((8, 16, 32)):
        ref = 1.0 / np.linalg.norm(x[:, :d], axis=-1)
        np.testing.assert_allclose(inv[:, j], ref, rtol=1e-4)


def test_prepare_vectors_matches_xla(rng):
    x = rng.standard_normal((48, 128)).astype(np.float32) * 3.0
    dims = (16, 32, 64)
    n_p, i_p, v_p = prepare_vectors(jnp.asarray(x), dims, block_rows=16)
    n_x, i_x, v_x = prepare_vectors_xla(jnp.asarray(x), dims)
    np.testing.assert_allclose(
        np.asarray(n_p, dtype=np.float32), np.asarray(n_x, dtype=np.float32), atol=1e-2
    )
    np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_x))
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_x), rtol=1e-4)


def test_prepare_vectors_normalizes(rng):
    x = rng.standard_normal((8, 32)).astype(np.float32) * 10
    n, _, _ = prepare_vectors_xla(jnp.asarray(x), (8,))
    norms = np.linalg.norm(np.asarray(n, dtype=np.float32), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-2)
