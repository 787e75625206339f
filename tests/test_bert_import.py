import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from rag_application_tpu.models.bert import (  # noqa: E402
    BertEncoder,
    convert_hf_state_dict,
    load_hf_encoder,
)

CFG = dict(vocab_size=128, hidden_size=32, num_hidden_layers=2,
           num_attention_heads=4, intermediate_size=64,
           max_position_embeddings=48, type_vocab_size=2,
           layer_norm_eps=1e-12)


@pytest.fixture(scope="module")
def torch_bert():
    config = transformers.BertConfig(
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0, **CFG)
    torch.manual_seed(0)
    model = transformers.BertModel(config)
    model.eval()
    return model


def test_flax_matches_torch_bert(torch_bert):
    """Same random weights -> same mean-pooled embeddings (rtol 1e-4)."""
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, (3, 16)).astype(np.int64)
    mask = np.ones((3, 16), dtype=np.int64)
    mask[1, 10:] = 0  # ragged

    with torch.no_grad():
        out = torch_bert(input_ids=torch.tensor(ids),
                         attention_mask=torch.tensor(mask))
        h = out.last_hidden_state.numpy()
    m = mask[..., None].astype(np.float32)
    ref = (h * m).sum(1) / m.sum(1)
    ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)

    model, params = load_hf_encoder(torch_bert.state_dict(), config=CFG)
    got = np.asarray(model.apply(
        params, jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(mask.astype(bool))))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_token_outputs_match(torch_bert):
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 128, (2, 12)).astype(np.int64)
    mask = np.ones((2, 12), dtype=np.int64)
    with torch.no_grad():
        ref = torch_bert(input_ids=torch.tensor(ids),
                         attention_mask=torch.tensor(mask)
                         ).last_hidden_state.numpy()
    model, params = load_hf_encoder(torch_bert.state_dict(), config=CFG)
    _, tokens = model.apply(params, jnp.asarray(ids.astype(np.int32)),
                            jnp.asarray(mask.astype(bool)),
                            return_tokens=True)
    np.testing.assert_allclose(np.asarray(tokens), ref, rtol=1e-3, atol=1e-4)


def test_convert_rejects_missing_keys():
    with pytest.raises(KeyError):
        convert_hf_state_dict({}, hidden=32, heads=4, num_layers=1)
