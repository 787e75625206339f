"""Native FLAC codec roundtrips (ingest/flac.py).

Parity anchor: the reference routes compressed audio through external
system decoders (IndexerAPI/src/core/processors/utils.py media path);
here FLAC decodes natively so the audio pipeline needs no hook.
"""

import numpy as np
import pytest

from rag_application_tpu.ingest.flac import (
    FLACError, decode_flac, decode_flac_pcm, encode_flac)
from rag_application_tpu.models import audio as audio_mod


def _sig(n, channels, bps, seed=0):
    rng = np.random.default_rng(seed)
    amp = (1 << (bps - 1)) - 1
    t = np.arange(n)[:, None]
    x = 0.4 * np.sin(2 * np.pi * 440 * t / 16000 + np.arange(channels))
    x = x + 0.05 * rng.standard_normal((n, channels))
    return np.clip(x * amp, -amp, amp).astype(np.int64)


@pytest.mark.parametrize("mode", ["verbatim", "fixed0", "fixed1",
                                  "fixed2", "auto"])
def test_roundtrip_subframe_modes(mode):
    pcm = _sig(3000, 2, 16)
    blob = encode_flac(pcm, 16000, block_size=1024, subframe=mode)
    out, sr, bps = decode_flac_pcm(blob)
    assert sr == 16000 and bps == 16
    np.testing.assert_array_equal(out, pcm)


@pytest.mark.parametrize("bps", [8, 16, 24])
def test_roundtrip_bit_depths(bps):
    pcm = _sig(1500, 1, bps, seed=bps)
    blob = encode_flac(pcm, 44100, bps=bps, block_size=512)
    out, sr, obps = decode_flac_pcm(blob)
    assert (sr, obps) == (44100, bps)
    np.testing.assert_array_equal(out, pcm)


def test_constant_subframe():
    pcm = np.full((2048, 1), -123, np.int64)
    blob = encode_flac(pcm, 16000, subframe="auto")
    out, _, _ = decode_flac_pcm(blob)
    np.testing.assert_array_equal(out, pcm)
    # constant coding is tiny vs verbatim's 16 bits/sample
    assert len(blob) < 200


@pytest.mark.parametrize("stereo", ["left_side", "right_side", "mid_side"])
def test_stereo_decorrelation(stereo):
    pcm = _sig(2000, 2, 16, seed=7)
    blob = encode_flac(pcm, 16000, block_size=1000, stereo=stereo)
    out, _, _ = decode_flac_pcm(blob)
    np.testing.assert_array_equal(out, pcm)


def test_rice_escape_partition():
    # near-zero residuals pick param 0; one 3e4 spike forces the raw
    # escape (quotient > 48) — decoder must take the 5-bit-raw branch
    pcm = np.zeros((600, 1), np.int64)
    pcm[300, 0] = 30000
    blob = encode_flac(pcm, 16000, block_size=600, subframe="fixed0")
    out, _, _ = decode_flac_pcm(blob)
    np.testing.assert_array_equal(out, pcm)


def test_decode_flac_mono_float():
    pcm = _sig(1600, 2, 16, seed=3)
    wave, sr = decode_flac(encode_flac(pcm, 16000))
    assert sr == 16000 and wave.shape == (1600,)
    ref = (pcm.astype(np.float32) / 32768.0).mean(axis=1)
    np.testing.assert_allclose(wave, ref, atol=1e-7)


def test_audio_features_dispatch_flac():
    pcm = _sig(16000, 1, 16, seed=5)
    feats = audio_mod.wav_to_features(encode_flac(pcm, 16000))
    assert feats.shape == (audio_mod.N_FRAMES, audio_mod.N_MELS)
    assert np.isfinite(feats).all() and feats.std() > 0.1


def test_crc_corruption_detected():
    blob = bytearray(encode_flac(_sig(800, 1, 16), 16000))
    blob[-20] ^= 0x40                     # flip a bit inside frame data
    with pytest.raises(FLACError):
        decode_flac_pcm(bytes(blob))


def test_not_flac_rejected():
    with pytest.raises(FLACError):
        decode_flac_pcm(b"RIFF....WAVE")


def test_truncated_stream_rejected():
    blob = encode_flac(_sig(4096, 1, 16), 16000)
    with pytest.raises(FLACError):
        decode_flac_pcm(blob[:len(blob) // 2])


def test_unknown_total_samples_decodes_fully():
    """STREAMINFO total_samples == 0 means 'unknown' (streamed/pipe
    encodes) — the decode must NOT truncate to zero samples."""
    pcm = _sig(2500, 1, 16)
    blob = bytearray(encode_flac(pcm, 16000, block_size=1024))
    # STREAMINFO body starts at byte 8; body[10:18] packs sr/ch/bps/total,
    # total = low 36 bits. Zero them.
    bits = int.from_bytes(blob[18:26], "big")
    blob[18:26] = (bits & ~((1 << 36) - 1)).to_bytes(8, "big")
    out, sr, bps = decode_flac_pcm(bytes(blob))
    assert out.shape[0] == 2500
    np.testing.assert_array_equal(out[:, 0], pcm[:, 0])
