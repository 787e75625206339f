"""Cross-modal retrieval quality harness (evals/multimodal.py) and the
Embedder image branch — the measured counterpart of the reference's
ImageBind client (app/core/models/imagebind/imagebind_handler.py:23-32).
"""

import numpy as np
import pytest

from rag_application_tpu.config import EncoderConfig
from rag_application_tpu.evals.multimodal import (
    Scene, all_scenes, evaluate_multimodal, render_audio, render_image)
from rag_application_tpu.models.embedder import Embedder
from rag_application_tpu.models.encoder import init_encoder

TINY = EncoderConfig(vocab_size=512, hidden_dim=32, num_layers=1,
                     num_heads=4, mlp_dim=64, max_len=32, out_dim=32,
                     dtype="float32")


@pytest.fixture(scope="module")
def mm_embedder():
    state = init_encoder(TINY, multimodal=True, max_len=32)
    return Embedder(cfg=TINY, state=state, batch_size=4, max_len=32)


def test_scene_space_is_compositional():
    scenes = all_scenes()
    assert len(scenes) == 4 * 4 * 2 * 5
    assert len({s.caption for s in scenes}) == len(scenes)


def test_renderers_are_attribute_sensitive():
    a = Scene("circle", "red", "large", "center")
    img_a = render_image(a, 64)
    assert img_a.shape == (64, 64, 3) and 0 <= img_a.min() <= img_a.max() <= 1
    # changing any single attribute changes the render
    for other in [Scene("square", "red", "large", "center"),
                  Scene("circle", "blue", "large", "center"),
                  Scene("circle", "red", "small", "center"),
                  Scene("circle", "red", "large", "top left")]:
        assert np.abs(render_image(other, 64) - img_a).max() > 0.1
        assert np.abs(render_audio(other) - render_audio(a)).max() > 0.5


def test_encode_image_shapes_and_units(mm_embedder):
    imgs = np.stack([render_image(s, mm_embedder.state.model.image_size)
                     for s in all_scenes()[:3]])
    vecs = mm_embedder.encode_image(imgs)
    assert vecs.shape == (3, 32)
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0, rtol=1e-4)
    # single-image convenience + determinism
    again = mm_embedder.encode_image(imgs[0])
    np.testing.assert_allclose(again[0], vecs[0], atol=1e-5)


def test_encode_image_requires_multimodal():
    text_emb = Embedder(cfg=TINY, batch_size=2, max_len=32)
    assert not text_emb.supports_images
    with pytest.raises(ValueError, match="multimodal"):
        text_emb.encode_image(np.zeros((224, 224, 3)))


def test_cross_modal_retrieval_beats_chance(mm_embedder):
    """Short training must already lift held-out text->image /
    text->audio retrieval far above chance — the measured ImageBind
    capability (full numbers: python -m rag_application_tpu.evals
    .multimodal, recorded in docs/multimodal.md)."""
    res = evaluate_multimodal(steps=120, embedder=mm_embedder, seed=0)
    n = res["n_test"]
    assert n >= 30
    chance5 = res["chance_at_5"]
    assert res["text_to_image_recall_at_5"] >= 4 * chance5, res
    assert res["text_to_audio_recall_at_5"] >= 4 * chance5, res
    assert res["image_to_audio_recall_at_5"] >= 2 * chance5, res
