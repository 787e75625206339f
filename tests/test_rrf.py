import jax.numpy as jnp
import numpy as np

from rag_application_tpu.ops.rrf import INVALID_ID, first_occurrence_mask, rrf_fuse


def host_rrf(lists, rrf_k):
    """Oracle: dict-based RRF over ranked id lists."""
    scores = {}
    for ids in lists:
        for rank, i in enumerate(ids):
            if i is None:
                continue
            scores[i] = scores.get(i, 0.0) + 1.0 / (rrf_k + rank + 1)
    return sorted(scores.items(), key=lambda kv: -kv[1])


def test_first_occurrence_mask():
    ids = jnp.array([[5, 3, 5, 7, 3]])
    mask = np.asarray(first_occurrence_mask(ids))
    np.testing.assert_array_equal(mask, [[True, True, False, True, False]])


def test_rrf_matches_host_oracle():
    dense = [3, 1, 4, 1_000]
    sparse = [4, 9, 3]
    la = (jnp.array([dense]), jnp.ones((1, 4), dtype=bool))
    lb = (jnp.array([sparse]), jnp.ones((1, 3), dtype=bool))
    scores, ids = rrf_fuse([la, lb], k=5, rrf_k=60)
    expected = host_rrf([dense, sparse], 60)
    got = list(zip(np.asarray(ids)[0], np.asarray(scores)[0]))
    for (eid, esc), (gid, gsc) in zip(expected, got):
        assert eid == gid
        np.testing.assert_allclose(esc, gsc, rtol=1e-5)


def test_rrf_qdrant_constant():
    """rrf_k=2 reproduces Qdrant's server-side fusion weighting."""
    la = (jnp.array([[7, 8]]), jnp.ones((1, 2), dtype=bool))
    lb = (jnp.array([[8, 7]]), jnp.ones((1, 2), dtype=bool))
    scores, ids = rrf_fuse([la, lb], k=2, rrf_k=2)
    # Both docs: 1/3 + 1/4 — tie; both scores equal.
    np.testing.assert_allclose(np.asarray(scores)[0], [1 / 3 + 1 / 4] * 2)


def test_rrf_invalid_slots_ignored():
    la = (jnp.array([[3, 99]]), jnp.array([[True, False]]))
    lb = (jnp.array([[42, 3]]), jnp.array([[False, True]]))
    scores, ids = rrf_fuse([la, lb], k=4, rrf_k=60)
    ids = np.asarray(ids)[0]
    assert 99 not in ids and 42 not in ids
    assert ids[0] == 3  # appears in both lists
    # padding slots
    assert np.all(ids[1:] == INVALID_ID)


def test_rrf_batched():
    ids_a = jnp.array([[1, 2], [5, 6]])
    ids_b = jnp.array([[2, 3], [6, 7]])
    valid = jnp.ones((2, 2), dtype=bool)
    scores, ids = rrf_fuse([(ids_a, valid), (ids_b, valid)], k=3, rrf_k=60)
    assert np.asarray(ids)[0, 0] == 2
    assert np.asarray(ids)[1, 0] == 6


def test_rrf_pads_to_k():
    """(Q, k) contract: slots beyond the union get -inf/INVALID_ID."""
    import jax.numpy as jnp

    la = (jnp.asarray([[1, 2]]), jnp.asarray([[True, True]]))
    lb = (jnp.asarray([[2, 3]]), jnp.asarray([[True, True]]))
    scores, ids = rrf_fuse([la, lb], k=8, rrf_k=60)
    assert scores.shape == (1, 8) and ids.shape == (1, 8)
    import numpy as np

    s, i = np.asarray(scores[0]), np.asarray(ids[0])
    assert np.isfinite(s[:3]).all()
    assert (~np.isfinite(s[3:])).all()
    assert (i[3:] == INVALID_ID).all()
