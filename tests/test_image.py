"""Native PNG decode (models/image.py) and image embeddings through the
OpenAI-compat endpoint — the reference's interleaved text+image
embedding surface (IndexerAPI model_handler.py:131-169, ImageBind
vision modality imagebind_handler.py:23-32).
"""

import asyncio
import base64
import io

import numpy as np
import pytest

from rag_application_tpu.models.image import (
    PNGError, decode_png, png_to_input, resize_raster)

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def pil_png(arr: np.ndarray, mode: str) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(arr, mode).save(buf, "PNG")
    return buf.getvalue()


def test_decode_rgb_roundtrip():
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    out = decode_png(pil_png(arr, "RGB"))
    np.testing.assert_allclose(out, arr / 255.0, atol=1e-6)


def test_decode_gray_and_rgba():
    rng = np.random.default_rng(1)
    g = rng.integers(0, 256, (33, 47), dtype=np.uint8)
    out = decode_png(pil_png(g, "L"))
    np.testing.assert_allclose(out[..., 0], g / 255.0, atol=1e-6)
    assert (out[..., 0] == out[..., 1]).all()
    rgba = rng.integers(0, 256, (20, 20, 4), dtype=np.uint8)
    out = decode_png(pil_png(rgba, "RGBA"))
    np.testing.assert_allclose(out, rgba[..., :3] / 255.0, atol=1e-6)


def test_decode_palette_and_1bit():
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    pal = Image.fromarray(arr, "RGB").convert(
        "P", palette=Image.Palette.ADAPTIVE)
    buf = io.BytesIO()
    pal.save(buf, "PNG")
    out = decode_png(buf.getvalue())
    ref = np.asarray(pal.convert("RGB"), np.uint8)
    np.testing.assert_allclose(out, ref / 255.0, atol=1e-6)
    # 1-bit bilevel (what ingest/pdf.py's scanned-page PNGs contain);
    # NB Image.fromarray(bool, "1") is lossy — go via uint8 + convert
    bits = (rng.random((16, 40)) < 0.5)
    im1 = Image.fromarray((bits * 255).astype(np.uint8)).convert("1")
    buf1 = io.BytesIO()
    im1.save(buf1, "PNG")
    out = decode_png(buf1.getvalue())
    np.testing.assert_allclose(out[..., 0], bits.astype(np.float32),
                               atol=1e-6)


def test_own_make_png_decodes():
    from rag_application_tpu.ingest.pdf import _make_png

    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, (18, 22, 3), dtype=np.uint8)
    out = decode_png(_make_png(rgb.tobytes(), 22, 18, 8, "rgb"))
    np.testing.assert_allclose(out, rgb / 255.0, atol=1e-6)


def test_resize_and_garbage():
    img = np.zeros((10, 30, 3), np.float32)
    img[:, 15:] = 1.0
    r = resize_raster(img, 8)
    assert r.shape == (8, 8, 3) and r[0, 0, 0] == 0.0 and r[0, 7, 0] == 1.0
    with pytest.raises(PNGError):
        decode_png(b"not a png")


def test_embeddings_endpoint_image_blocks():
    """Image content blocks reach the multimodal tower (fused with the
    caption) instead of being silently dropped."""
    import httpx

    from rag_application_tpu.api.app import build_app
    from rag_application_tpu.api.http import HTTPServer
    from rag_application_tpu.llm.router import LLMRouter, Provider
    from rag_application_tpu.models.embedder import Embedder
    from rag_application_tpu.models.encoder import init_encoder
    from tests.test_api import TINY, small_config

    state_enc = init_encoder(TINY, multimodal=True, max_len=16)
    emb = Embedder(cfg=TINY, state=state_enc, batch_size=4, max_len=16)
    rng = np.random.default_rng(0)
    png = pil_png(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8), "RGB")
    url = "data:image/png;base64," + base64.b64encode(png).decode()

    async def main():
        router, state = build_app(small_config(), llm=LLMRouter(Provider.STUB),
                                  embedder=emb)
        server = HTTPServer(router, port=0)
        port = await server.start()
        try:
            async with httpx.AsyncClient(
                    base_url=f"http://127.0.0.1:{port}", timeout=60) as c:
                body = {"input": [
                    "plain text row",
                    [{"type": "text", "text": "a photo"},
                     {"type": "image_url", "image_url": {"url": url}}],
                    [{"type": "text", "text": "a photo"}],
                ]}
                r = await c.post("/v1/embeddings", json=body)
                assert r.status_code == 200, r.text
                data = r.json()["data"]
                assert len(data) == 3
                v_img = np.asarray(data[1]["embedding"])
                v_txt = np.asarray(data[2]["embedding"])
                # the image block must change the embedding...
                assert float(v_img @ v_txt) < 0.999
                # ...and match the local fused encoding exactly
                local = emb.encode_image(
                    png_to_input(png, emb.state.model.image_size),
                    texts=["a photo"])[0]
                np.testing.assert_allclose(v_img, local, atol=1e-5)
        finally:
            await server.stop()

    asyncio.run(main())


def test_malformed_png_raises_pngerror_not_struct_error():
    """Truncated IHDR / bad PLTE must surface as PNGError so the
    endpoint's text-only fallback applies (not an unhandled 500)."""
    magic = b"\x89PNG\r\n\x1a\n"
    # truncated IHDR body (struct.error inside)
    bad1 = magic + b"\x00\x00\x00\x0dIHDR" + b"\x00\x00\x00\x10"
    with pytest.raises(PNGError):
        decode_png(bad1)
    # PLTE whose length is not a multiple of 3 (reshape ValueError)
    import struct as _s
    ihdr = _s.pack(">IIBBBBB", 4, 4, 8, 3, 0, 0, 0)
    bad2 = (magic + _s.pack(">I", len(ihdr)) + b"IHDR" + ihdr + b"\0" * 4
            + _s.pack(">I", 4) + b"PLTE" + b"\x01\x02\x03\x04" + b"\0" * 4)
    with pytest.raises(PNGError):
        decode_png(bad2)
    # absurd declared dimensions rejected before allocation
    ihdr3 = _s.pack(">IIBBBBB", 100_000, 100_000, 8, 2, 0, 0, 0)
    bad3 = (magic + _s.pack(">I", len(ihdr3)) + b"IHDR" + ihdr3 + b"\0" * 4)
    with pytest.raises(PNGError):
        decode_png(bad3)


def test_unfilter_vectorized_matches_all_filters():
    """Force every encoder filter type through a PIL encode (optimize
    picks Paeth/Sub/Avg on gradients) and roundtrip exactly."""
    rng = np.random.default_rng(7)
    # smooth gradient -> PIL picks predictive filters
    y = np.linspace(0, 255, 64)[:, None]
    x = np.linspace(0, 255, 48)[None, :]
    arr = np.stack([(y + x) / 2, y * np.ones_like(x), np.ones_like(y) * x],
                   axis=-1).astype(np.uint8)
    arr[20:30] = rng.integers(0, 256, (10, 48, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr, "RGB").save(buf, "PNG", optimize=True)
    out = decode_png(buf.getvalue())
    np.testing.assert_allclose(out, arr / 255.0, atol=1e-6)
