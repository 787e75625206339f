"""Audio modality: WAV -> log-mel -> multimodal-tower embedding.

Parity surface: ImageBind's audio embeddings
(app/core/models/imagebind/imagebind_handler.py:23-32) — the modality
the round-1 encoder lacked. Ingest routes audio files into searchable
chunks instead of the failed ledger.
"""

import asyncio
import io
import wave as wave_mod

import numpy as np
import pytest

from rag_application_tpu.config import (
    Config,
    EncoderConfig,
    FunnelConfig,
    IndexConfig,
    SparseConfig,
)
from rag_application_tpu.ingest.pipeline import IngestPipeline
from rag_application_tpu.models import audio
from rag_application_tpu.models.embedder import Embedder
from rag_application_tpu.models.encoder import init_encoder
from rag_application_tpu.store.collection import Collection

TINY_MM = EncoderConfig(vocab_size=512, hidden_dim=32, num_layers=1,
                        num_heads=4, mlp_dim=64, max_len=32, out_dim=32,
                        dtype="float32")


def make_wav(freq=440.0, seconds=0.5, sr=16000, width=2, channels=1):
    t = np.arange(int(sr * seconds)) / sr
    x = 0.5 * np.sin(2 * np.pi * freq * t)
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(sr)
        if width == 2:
            pcm = (x * 32767).astype("<i2")
        elif width == 1:
            pcm = ((x * 127) + 128).astype(np.uint8)
        else:
            pcm = (x * (2 ** (8 * width - 1) - 1)).astype("<i4")
        if channels > 1:
            pcm = np.repeat(pcm[:, None], channels, axis=1).reshape(-1)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


# -------------------------------------------------------------- front-end

def test_decode_wav_widths_and_channels():
    for width in (1, 2, 4):
        x, sr = audio.decode_wav(make_wav(width=width))
        assert sr == 16000 and len(x) == 8000
        assert np.abs(x).max() == pytest.approx(0.5, abs=0.02)
    x, sr = audio.decode_wav(make_wav(channels=2))
    assert len(x) == 8000  # stereo averaged to mono


def test_decode_wav_rejects_garbage():
    with pytest.raises(ValueError):
        audio.decode_wav(b"\x00\x01not audio" * 10)


def test_resample_halves_length():
    x = np.sin(np.linspace(0, 100, 32000)).astype(np.float32)
    y = audio.resample(x, 32000, 16000)
    assert len(y) == 16000


def test_log_mel_peaks_track_frequency():
    """A higher tone must excite higher mel bins."""
    lo, _ = audio.decode_wav(make_wav(freq=300))
    hi, _ = audio.decode_wav(make_wav(freq=3000))
    m_lo = audio.log_mel(lo).mean(axis=0)
    m_hi = audio.log_mel(hi).mean(axis=0)
    assert int(np.argmax(m_lo)) < int(np.argmax(m_hi))


def test_wav_to_features_fixed_shape():
    feats = audio.wav_to_features(make_wav(seconds=0.2))
    assert feats.shape == (audio.N_FRAMES, audio.N_MELS)
    feats_long = audio.wav_to_features(make_wav(seconds=5.0))
    assert feats_long.shape == (audio.N_FRAMES, audio.N_MELS)
    assert abs(float(feats.mean())) < 0.1  # normalized


# --------------------------------------------------------------- encoder

@pytest.fixture(scope="module")
def mm_embedder():
    state = init_encoder(TINY_MM, multimodal=True, max_len=32)
    return Embedder(state, batch_size=2, max_len=32)


def test_encode_audio_shape_and_discrimination(mm_embedder):
    f1 = audio.wav_to_features(make_wav(freq=300))
    f2 = audio.wav_to_features(make_wav(freq=3000))
    vecs = mm_embedder.encode_audio(np.stack([f1, f2]))
    assert vecs.shape == (2, 32)
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0, rtol=1e-4)
    # different clips embed differently; identical clips identically
    again = mm_embedder.encode_audio(f1)
    np.testing.assert_allclose(again[0], vecs[0], atol=1e-5)
    assert float(vecs[0] @ vecs[1]) < 0.999


def test_encode_audio_requires_multimodal():
    text_emb = Embedder(cfg=TINY_MM, batch_size=2, max_len=32)
    assert not text_emb.supports_audio
    with pytest.raises(ValueError, match="multimodal"):
        text_emb.encode_audio(np.zeros((audio.N_FRAMES, audio.N_MELS)))


# ---------------------------------------------------------------- ingest

def small_config():
    cfg = Config()
    cfg.index = IndexConfig(dim=32, matryoshka_dims=(8, 16),
                            initial_capacity=16)
    cfg.sparse = SparseConfig(candidate_pool=64, max_query_terms=8)
    cfg.funnel = FunnelConfig(matryoshka_limits=(8, 6), dense_limit=5,
                              quantized_limit=5, sparse_limit=5, final_limit=5)
    return cfg


def test_audio_ingest_and_retrieval(mm_embedder):
    """Audio files index as searchable chunks; query-by-audio self-
    retrieves the right clip."""
    col = Collection("user_a", small_config())
    pipe = IngestPipeline(col, mm_embedder)
    r1 = asyncio.run(pipe.ingest_file("low_tone.wav", make_wav(freq=300)))
    r2 = asyncio.run(pipe.ingest_file("high_tone.wav", make_wav(freq=2500)))
    assert r1.failed_tasks == 0 and r1.chunks == 1
    assert r2.failed_tasks == 0 and r2.chunks == 1

    q = mm_embedder.encode_audio(
        audio.wav_to_features(make_wav(freq=2500)))[0]
    hits = col.hybrid_search(q, limit=2, use_matryoshka=False)
    assert hits and hits[0].payload["filename"] == "high_tone.wav"
    assert hits[0].payload["source"] == "audio"


def test_audio_with_transcriber_indexes_text(mm_embedder):
    col = Collection("user_a", small_config())
    pipe = IngestPipeline(
        col, mm_embedder,
        audio_transcriber=lambda data: "a meeting about quarterly revenue")
    res = asyncio.run(pipe.ingest_file("meeting.wav", make_wav()))
    assert res.failed_tasks == 0
    row = col.payloads.rows_where(document_id="meeting.wav")[0]
    assert "quarterly revenue" in col.payloads.get(row)["text"]


def test_audio_without_multimodal_encoder_fails_into_ledger():
    text_emb = Embedder(cfg=TINY_MM, batch_size=2, max_len=32)
    col = Collection("user_a", small_config())
    pipe = IngestPipeline(col, text_emb)
    res = asyncio.run(pipe.ingest_file("clip.wav", make_wav()))
    assert res.chunks == 0 and res.failed_tasks == 1


def test_audio_decoder_hook(mm_embedder):
    """Compressed formats ride the decoder hook (bytes -> waveform, sr)."""
    col = Collection("user_a", small_config())
    pipe = IngestPipeline(
        col, mm_embedder,
        audio_decoder=lambda data: (
            np.sin(np.linspace(0, 600 * np.pi, 24000)).astype(np.float32),
            24000))
    res = asyncio.run(pipe.ingest_file("clip.mp3", b"\xff\xfbFAKEMP3DATA"))
    assert res.failed_tasks == 0 and res.chunks == 1
