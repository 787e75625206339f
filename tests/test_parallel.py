import importlib.util

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_application_tpu.parallel.mesh import make_mesh, param_shardings
from rag_application_tpu.parallel.search import (
    shard_corpus,
    sharded_topk,
    sharded_topk_dryrun,
)


def test_make_mesh_shapes():
    mesh = make_mesh(8, model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh = make_mesh(8)
    assert dict(mesh.shape) == {"data": 8, "model": 1}


def test_param_shardings_rules():
    mesh = make_mesh(8, model=2)
    params = {
        "kernel": jnp.zeros((16, 64)),
        "bias": jnp.zeros((7,)),
        "odd": jnp.zeros((3, 5)),
    }
    shards = param_shardings(mesh, params)
    assert shards["kernel"].spec == jax.sharding.PartitionSpec(None, "model")
    assert shards["bias"].spec == jax.sharding.PartitionSpec()
    assert shards["odd"].spec == jax.sharding.PartitionSpec()


def test_sharded_topk_matches_single_device(rng):
    mesh = make_mesh(8)
    n, d, q, k = 8 * 64, 32, 6, 7
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    queries = corpus[:q] + 0.05 * rng.standard_normal((q, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=-1, keepdims=True)

    sharded = shard_corpus(mesh, corpus)
    vals, idx = sharded_topk(mesh, sharded, jnp.asarray(queries), k,
                             valid_n=n, approx=False)
    ref = np.argsort(-(queries @ corpus.T), axis=-1)[:, :k]
    np.testing.assert_array_equal(np.asarray(idx), ref)


def test_sharded_topk_ragged_tail(rng):
    """Logical size not divisible by shard count: padding rows excluded."""
    mesh = make_mesh(8)
    n_logical, d, k = 100, 16, 5
    corpus = rng.standard_normal((n_logical, d)).astype(np.float32)
    queries = corpus[:3]
    sharded = shard_corpus(mesh, corpus)  # pads to 104 rows
    vals, idx = sharded_topk(mesh, sharded, jnp.asarray(queries), k,
                             valid_n=n_logical, approx=False)
    assert np.asarray(idx).max() < n_logical
    assert (np.asarray(idx)[:, 0] == np.arange(3)).all()


def test_dryrun_helper():
    mesh = make_mesh(8)
    sharded_topk_dryrun(mesh)


def test_graft_entry_contract():
    spec = importlib.util.spec_from_file_location("graft", "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 768)
    assert np.isfinite(np.asarray(out)).all()


def test_graft_dryrun_multichip():
    spec = importlib.util.spec_from_file_location("graft", "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
