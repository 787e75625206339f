import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rag_application_tpu.config import EncoderConfig
from rag_application_tpu.models.encoder import init_encoder
from rag_application_tpu.models.train import (
    TrainState,
    contrastive_loss,
    load_train_state,
    make_optimizer,
    make_train_step,
    save_train_state,
    shard_train_setup,
)
from rag_application_tpu.parallel.mesh import make_mesh

TINY = EncoderConfig(vocab_size=128, hidden_dim=32, num_layers=1, num_heads=4,
                     mlp_dim=64, max_len=16, out_dim=16, dtype="float32")


def make_batch(rng, b=8):
    return {
        "ids_a": jnp.asarray(rng.integers(0, 128, (b, 16)), dtype=jnp.int32),
        "mask_a": jnp.ones((b, 16), dtype=bool),
        "ids_b": jnp.asarray(rng.integers(0, 128, (b, 16)), dtype=jnp.int32),
        "mask_b": jnp.ones((b, 16), dtype=bool),
    }


def test_contrastive_loss_perfect_alignment():
    z = jnp.eye(4)
    loss = float(contrastive_loss(z, z, temperature=0.01))
    assert loss < 0.01  # aligned pairs -> near-zero loss


def test_train_loss_decreases(rng):
    enc = init_encoder(TINY, max_len=16)
    opt = make_optimizer(lr=1e-3)
    step = jax.jit(make_train_step(enc.model, opt))
    state = TrainState(params=enc.params, opt_state=opt.init(enc.params),
                       step=jnp.zeros((), jnp.int32))
    batch = make_batch(rng)
    losses = []
    for _ in range(5):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 5


def test_sharded_train_setup(rng):
    mesh = make_mesh(8, model=2)
    enc = init_encoder(TINY, max_len=16)
    opt = make_optimizer()
    state, step, b_shard = shard_train_setup(mesh, enc, opt)
    batch = {k: jax.device_put(v, b_shard)
             for k, v in make_batch(rng, b=16).items()}
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))


def test_train_state_checkpoint_roundtrip(rng, tmp_path):
    enc = init_encoder(TINY, max_len=16)
    opt = make_optimizer(lr=1e-3)
    step = jax.jit(make_train_step(enc.model, opt))
    state = TrainState(params=enc.params, opt_state=opt.init(enc.params),
                       step=jnp.zeros((), jnp.int32))
    batch = make_batch(rng)
    state, _ = step(state, batch)
    path = str(tmp_path / "ckpt")
    save_train_state(state, path)

    template = TrainState(params=enc.params, opt_state=opt.init(enc.params),
                          step=jnp.zeros((), jnp.int32))
    restored = load_train_state(path, opt, template)
    assert int(restored.step) == 1
    # continuing from the restored state matches continuing from original
    s1, m1 = step(state, batch)
    s2, m2 = step(restored, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)


def test_matryoshka_loss_levels():
    from rag_application_tpu.models.train import matryoshka_contrastive_loss

    rng = np.random.default_rng(0)
    za = jnp.asarray(rng.standard_normal((8, 16)), dtype=jnp.float32)
    # aligned pairs: MRL loss of (za, za) must be below a shuffled pairing
    perm = jnp.asarray(rng.permutation(8))
    good = matryoshka_contrastive_loss(za, za, (4, 8))
    bad = matryoshka_contrastive_loss(za, za[perm], (4, 8))
    assert float(good) < float(bad)
    # duplicate / overflow dims collapse to unique levels <= full
    a = matryoshka_contrastive_loss(za, za, (4, 4, 8, 16, 99))
    b = matryoshka_contrastive_loss(za, za, (4, 8))
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)


def test_train_step_matryoshka_decreases(rng):
    enc = init_encoder(TINY, max_len=16)
    opt = make_optimizer(lr=1e-2)
    step = jax.jit(make_train_step(enc.model, opt, matryoshka_dims=(4, 8)))
    state = TrainState(params=enc.params, opt_state=opt.init(enc.params),
                       step=jnp.zeros((), dtype=jnp.int32))
    batch = make_batch(rng)
    batch["ids_b"] = batch["ids_a"]  # identical views -> learnable signal
    first = None
    for _ in range(12):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first
