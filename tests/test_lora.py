"""LoRA adapters for the decoder (models/lora.py).

Beyond-parity: the reference has no training tier (SURVEY §2.1 HF local
client serves downloaded checkpoints as-is); here a frozen —
optionally int8 — base adapts on-chip through rank-r factors.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rag_application_tpu.models.decoder import (
    DecoderConfig,
    generate,
    init_decoder_params,
    init_kv_cache,
    prefill,
    quantize_decoder_params,
)
from rag_application_tpu.models.lora import (
    lora_adapters,
    lora_apply,
    lora_init,
    lora_merge,
    make_lora_train_step,
)
from rag_application_tpu.models.train import TrainState, make_optimizer

CFG = DecoderConfig(vocab_size=64, hidden=32, num_layers=2, heads=4,
                    kv_heads=2, mlp_dim=64, max_len=64, dtype="float32")
BASE = init_decoder_params(jax.random.PRNGKey(0), CFG)


def _logits(params, ids):
    ck, cv = init_kv_cache(CFG, ids.shape[0])
    return np.asarray(prefill(params, CFG, jnp.asarray(ids),
                              jnp.asarray([ids.shape[1]] * ids.shape[0]),
                              ck, cv)[0])


def test_init_is_identity():
    """b = 0 at init: the wrapped model IS the base model, bit-exact."""
    ids = np.random.default_rng(0).integers(0, 64, (2, 9)).astype(np.int32)
    wrapped = lora_init(jax.random.PRNGKey(1), BASE, r=4)
    assert (_logits(wrapped, ids) == _logits(BASE, ids)).all()


def test_merge_equals_wrapped():
    """With nonzero factors, folding a@b*s into the dense matrix gives
    the same function as the wrapped forward."""
    rng = jax.random.PRNGKey(2)
    wrapped = lora_init(rng, BASE, r=4)
    ads = lora_adapters(wrapped)
    ads = jax.tree.map(
        lambda v: v + 0.03 * jax.random.normal(rng, v.shape, jnp.float32
                                               ).astype(v.dtype), ads)
    wrapped = lora_apply(wrapped, ads)
    merged = lora_merge(wrapped)
    assert not isinstance(merged["wq"], dict)
    ids = np.random.default_rng(1).integers(0, 64, (2, 7)).astype(np.int32)
    lw, lm = _logits(wrapped, ids), _logits(merged, ids)
    scale = max(np.abs(lw).max(), 1.0)
    np.testing.assert_allclose(lm, lw, atol=2e-3 * scale)


def test_lora_overfits_with_frozen_base():
    """Adapter-only training drives next-token accuracy on a fixed
    sequence toward 1 while every base weight stays bit-identical, and
    fused generation completes the memorized sequence."""
    seq = np.asarray(
        [1, 7, 3, 9, 2, 8, 4, 6, 1, 7, 3, 9, 2, 8, 4, 6], np.int32)
    batch = {"ids": jnp.asarray(np.tile(seq, (4, 1))),
             "mask": jnp.ones((4, len(seq)), bool)}
    wrapped = lora_init(jax.random.PRNGKey(3), BASE, r=8, alpha=16.0)
    opt = make_optimizer(lr=3e-2)
    step = jax.jit(make_lora_train_step(CFG, opt, remat=False))
    ads = lora_adapters(wrapped)
    state = TrainState(params=ads, opt_state=opt.init(ads),
                       step=jnp.zeros((), jnp.int32))
    first = None
    for _ in range(120):
        state, m = step(state, wrapped, batch)
        if first is None:
            first = float(m["loss"])
    assert float(m["loss"]) < 0.35 * first
    assert float(m["accuracy"]) > 0.8

    # base weights are untouched by construction AND by value
    trained = lora_apply(wrapped, state.params)
    for name in ("wq", "wk", "wv", "wo"):
        assert (np.asarray(trained[name]["w"])
                == np.asarray(BASE[name])).all()
    assert not (np.asarray(trained["wq"]["b"]) == 0).all()

    # the adapted model continues the memorized cycle
    out, _ = generate(trained, CFG, jnp.asarray(seq[None, :8]),
                      jnp.asarray([8]), 8, -1, 0, jax.random.PRNGKey(0),
                      0.0)
    assert (np.asarray(out)[0] == seq[8:]).mean() > 0.7


def test_sharded_lora_step_matches_single_device():
    """The adapter step runs with the wrapped tree TP-sharded over the
    8-device mesh (the factors shard by the same generic rule); one
    step's loss/updated adapters equal the single-device step."""
    from rag_application_tpu.parallel.mesh import make_mesh, param_shardings

    wrapped = lora_init(jax.random.PRNGKey(5), BASE, r=4)
    opt = make_optimizer(lr=1e-3)
    step = jax.jit(make_lora_train_step(CFG, opt, remat=False))
    ads = lora_adapters(wrapped)
    batch = {"ids": jnp.asarray(np.random.default_rng(3).integers(
        0, 64, (8, 12)), jnp.int32), "mask": jnp.ones((8, 12), bool)}
    st0 = TrainState(params=ads, opt_state=opt.init(ads),
                     step=jnp.zeros((), jnp.int32))
    base_state, base_m = step(st0, wrapped, batch)

    mesh = make_mesh(8, model=2)
    sh_wrapped = jax.device_put(wrapped, param_shardings(mesh, wrapped))
    sh_ads = lora_adapters(sh_wrapped)
    st = TrainState(params=sh_ads, opt_state=opt.init(sh_ads),
                    step=jnp.zeros((), jnp.int32))
    st, m = step(st, sh_wrapped, batch)
    np.testing.assert_allclose(float(m["loss"]), float(base_m["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(st.params["wq"]["b"], np.float32),
        np.asarray(base_state.params["wq"]["b"], np.float32),
        atol=1e-5)


def test_adapter_save_load_roundtrip(tmp_path):
    from rag_application_tpu.models.lora import load_adapters, save_adapters

    wrapped = lora_init(jax.random.PRNGKey(6), BASE, r=4)
    ads = lora_adapters(wrapped)
    ads = jax.tree.map(lambda v: v + 1.0, ads)  # nonzero everywhere
    p = str(tmp_path / "adapters.npz")
    save_adapters(ads, p)
    back = load_adapters(p, dtype=jnp.bfloat16)
    for name in ads:
        for part in ("a", "b"):
            np.testing.assert_allclose(
                np.asarray(back[name][part], np.float32),
                np.asarray(ads[name][part], np.float32), rtol=1e-2)
    # grafting restores a functional model
    _ = _logits(lora_apply(wrapped, back), np.zeros((1, 4), np.int32))


def test_saved_scale_wins_over_alpha_fallback(tmp_path):
    """The npz embeds the trained scale s = alpha/r, so serving with a
    different (default) alpha still applies the adapter at its trained
    strength."""
    from rag_application_tpu.models.lora import (
        load_adapters,
        lora_wrap_with,
        save_adapters,
    )

    wrapped = lora_init(jax.random.PRNGKey(7), BASE, r=4, alpha=32.0)
    ads = lora_adapters(wrapped)
    ads = jax.tree.map(lambda v: v + 0.05, ads)
    wrapped = lora_apply(wrapped, ads)
    p = str(tmp_path / "a32.npz")
    save_adapters(lora_adapters(wrapped), p, wrapped=wrapped)

    rewrapped = lora_wrap_with(BASE, load_adapters(p), alpha=16.0)
    assert float(rewrapped["wq"]["s"][0, 0, 0]) == 32.0 / 4  # stored s
    ids = np.random.default_rng(4).integers(0, 64, (1, 5)).astype(np.int32)
    lw, lr = _logits(wrapped, ids), _logits(rewrapped, ids)
    scale = max(np.abs(lw).max(), 1.0)
    np.testing.assert_allclose(lr, lw, atol=2e-3 * scale)


def test_lora_over_quantized_base():
    """QLoRA-style composition: int8 frozen base + bf16 factors. The
    wrapped forward runs through the same _mm recursion and merge
    produces a dense bf16 tree."""
    qbase = quantize_decoder_params(BASE)
    wrapped = lora_init(jax.random.PRNGKey(4), qbase, r=4)
    assert isinstance(wrapped["wq"]["w"], dict)  # still quantized inside
    ids = np.random.default_rng(2).integers(0, 64, (1, 6)).astype(np.int32)
    lq = _logits(qbase, ids)
    lw = _logits(wrapped, ids)
    np.testing.assert_allclose(lw, lq, atol=1e-5)  # b=0 identity
    merged = lora_merge(wrapped)
    assert merged["wq"].dtype == jnp.bfloat16
