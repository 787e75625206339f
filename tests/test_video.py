"""Native MJPEG-AVI video ingest (ingest/video.py).

The reference's video processor is a stub returning None; these tests
pin the exceed-parity path — frames extracted natively from the RIFF
container and described through the VLM page hook — plus the stub-parity
failure for codecs outside native scope.
"""

import asyncio
import struct

import numpy as np
import pytest

from rag_application_tpu.ingest.video import (
    VideoError, extract_frames, frame_timestamps, probe_avi)

# minimal JPEG-looking payloads: extraction passes bytes through
# verbatim (the DCTDecode contract), so SOI + marker + unique tail is
# enough to identify each frame
def jpeg_blob(i):
    return b"\xff\xd8\xff\xe0" + b"JFIF\x00" + bytes([i]) * 10 + b"\xff\xd9"


def chunk(fourcc, payload):
    pad = b"\x00" if len(payload) & 1 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def lst(list_type, inner):
    return chunk(b"LIST", list_type + inner)


def build_avi(frames, codec=b"MJPG", w=32, h=24, usec=40_000):
    avih = struct.pack("<IIIIIIIIIIIIII", usec, 0, 0, 0x10, len(frames),
                       0, 1, 0, w, h, 0, 0, 0, 0)
    strh = b"vids" + codec + b"\x00" * 48
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_probe_and_extract_all_frames():
    frames = [jpeg_blob(i) for i in range(5)]
    avi = build_avi(frames)
    info = probe_avi(avi)
    assert info["frames"] == 5 and (info["width"], info["height"]) == (32, 24)
    assert info["codecs"] == ["MJPG"]
    got = extract_frames(avi, max_frames=8)
    assert got == frames                       # byte-verbatim passthrough


def test_even_sampling_includes_first():
    frames = [jpeg_blob(i) for i in range(24)]
    got = extract_frames(build_avi(frames), max_frames=4)
    assert len(got) == 4 and got[0] == frames[0]
    idx = [frames.index(g) for g in got]
    assert idx == sorted(idx) and idx[-1] >= 18   # spans the tail
    ts = frame_timestamps(probe_avi(build_avi(frames)), 4)
    assert ts[0] == 0.0 and ts[1] > 0.0


def test_rec_list_interleaved_frames():
    """Interleaved AVIs wrap each frame's chunks in a 'rec ' LIST inside
    movi (AVI 1.0) — frames must still be found one level down."""
    frames = [jpeg_blob(i) for i in range(3)]
    avih = struct.pack("<IIIIIIIIIIIIII", 40_000, 0, 0, 0x10, len(frames),
                       0, 1, 0, 32, 24, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", b"vids" + b"MJPG"
                                    + b"\x00" * 48)))
    movi = lst(b"movi", b"".join(
        lst(b"rec ", chunk(b"00dc", f) + chunk(b"01wb", b"\x00" * 8))
        for f in frames))
    body = b"AVI " + hdrl + movi
    avi = b"RIFF" + struct.pack("<I", len(body)) + body
    assert extract_frames(avi, max_frames=8) == frames


def test_non_avi_and_foreign_codec_raise():
    with pytest.raises(VideoError):
        extract_frames(b"\x00\x00\x00\x18ftypisom" + b"\x00" * 64)  # MP4
    # AVI whose frames are not JPEG (e.g. raw DIB) -> unsupported codec
    avi = build_avi([b"\x00" * 32], codec=b"DIB ")
    with pytest.raises(VideoError):
        extract_frames(avi)


def test_video_ingest_describes_frames():
    """End-to-end: MJPEG AVI -> per-frame VLM description -> chunks."""
    from rag_application_tpu.ingest.pipeline import IngestPipeline
    from rag_application_tpu.models.embedder import Embedder
    from rag_application_tpu.store.collection import Collection
    from tests.test_pdf import TINY, small_config

    frames = [jpeg_blob(i) for i in range(6)]
    seen = []

    def describer(img):
        seen.append(img)
        return f"frame showing scene {len(seen)} of a factory tour"

    col = Collection("vid", small_config())
    emb = Embedder(cfg=TINY, batch_size=4, max_len=32)
    pipe = IngestPipeline(col, emb, page_describer=describer)
    res = asyncio.run(pipe.ingest_file(
        "tour.avi", build_avi(frames), document_id="vid1"))
    assert res.failed_tasks == 0 and res.chunks == 6
    assert seen == frames                # the VLM hook got raw JPEGs
    rows = col.payloads.rows_where(document_id="vid1")
    texts = sorted(str(col.payloads.get(r)["text"]) for r in rows)
    assert len(texts) == 6 and "factory tour" in texts[0]


def test_video_without_vlm_fails_into_ledger():
    """Stub parity: no describer -> ledgered failure, never a silent drop
    (reference file_processors video branch returns None)."""
    from rag_application_tpu.ingest.pipeline import IngestPipeline
    from rag_application_tpu.models.embedder import Embedder
    from rag_application_tpu.store.collection import Collection
    from tests.test_pdf import TINY, small_config

    col = Collection("vid2", small_config())
    emb = Embedder(cfg=TINY, batch_size=4, max_len=32)
    pipe = IngestPipeline(col, emb)
    res = asyncio.run(pipe.ingest_file(
        "tour.avi", build_avi([jpeg_blob(0)]), document_id="v2"))
    assert res.chunks == 0 and pipe.queue.failed
    assert "page_describer" in pipe.queue.failed[-1].error
