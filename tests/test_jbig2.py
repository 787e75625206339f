"""Native JBIG2 generic-region decoding (ingest/jbig2.py + native/jbig2.c)
and its PDF integration — MQ-coded scanned pages reach the VLM hook
without poppler (reference: pdf2image rasterization,
IndexerAPI/src/core/processors/utils.py:16-22).

No real-world JBIG2 fixture ships with the reference, so the decoder is
validated against this module's own spec-following MQ/generic encoder
(bit-exact roundtrips across templates, TPGDON, composition operators)
and against Pillow's independent libtiff G4 encoder for the MMR path.
"""

import struct
import zlib

import numpy as np
import pytest

from rag_application_tpu.ingest.jbig2 import (
    JBIG2Error, decode_embedded, decode_generic, decode_jbig2_params,
    encode_embedded, encode_generic)


def text_like(h=64, w=96, seed=0):
    rng = np.random.default_rng(seed)
    bm = np.zeros((h, w), np.uint8)
    bm[h // 6:h // 3, 5:w - 16] = 1            # a "bar of text"
    bm[h // 2:h - 4, w // 2:w // 2 + 4] = 1    # a vertical stroke
    bm[rng.integers(0, h, 150), rng.integers(0, w, 150)] = 1
    return bm


@pytest.mark.parametrize("template", [0, 1, 2, 3])
def test_generic_roundtrip_templates(template):
    bm = text_like()
    data = encode_generic(bm, template=template)
    out = decode_generic(data, 96, 64, template=template)
    np.testing.assert_array_equal(out, bm)


@pytest.mark.parametrize("template", [0, 2])
def test_generic_roundtrip_tpgdon(template):
    # long identical-row runs exercise the typical-prediction rows
    bm = text_like()
    bm[40:60] = bm[40]
    data = encode_generic(bm, template=template, tpgdon=True)
    out = decode_generic(data, 96, 64, template=template, tpgdon=True)
    np.testing.assert_array_equal(out, bm)
    # typical prediction should pay off on the repeated rows
    assert len(data) < len(encode_generic(bm, template=template)) + 16


def test_generic_roundtrip_dense_noise():
    # incompressible input is the MQ coder's adversarial case
    for seed in range(3):
        bm = (np.random.default_rng(seed).random((48, 56)) < 0.5
              ).astype(np.uint8)
        np.testing.assert_array_equal(
            decode_generic(encode_generic(bm), 56, 48), bm)


def test_generic_all_white_all_black():
    for v in (0, 1):
        bm = np.full((32, 40), v, np.uint8)
        np.testing.assert_array_equal(
            decode_generic(encode_generic(bm), 40, 32), bm)


def test_embedded_page_roundtrip():
    bm = text_like(seed=3)
    page = decode_embedded(encode_embedded(bm, tpgdon=True))
    np.testing.assert_array_equal(page, bm)


def test_embedded_mmr_region():
    PIL = pytest.importorskip("PIL")  # noqa: F841
    from tests.test_ccitt import g4_encode

    bm = text_like(seed=4)
    blob = encode_embedded(bm, mmr_data=g4_encode(bm))
    np.testing.assert_array_equal(decode_embedded(blob), bm)


def test_embedded_xnor_composition_inverts():
    bm = text_like(seed=5)
    # page default 0, XNOR with the region = NOT(region)
    page = decode_embedded(encode_embedded(bm, op=3))
    np.testing.assert_array_equal(page, 1 - bm)


def test_symbol_coded_stream_unsupported():
    bm = text_like()
    blob = bytearray(encode_embedded(bm))
    # retag the region segment (offset: after 30-byte page-info segment,
    # segment type byte is at +4 of the next header) as a text region
    assert blob[11 + 19 + 4] == 39
    blob[11 + 19 + 4] = 6
    with pytest.raises(JBIG2Error, match="text region"):
        decode_embedded(bytes(blob))
    assert decode_jbig2_params(bytes(blob), b"", 96, 64) is None


def test_params_adapter_black_is_zero():
    bm = np.zeros((16, 16), np.uint8)
    bm[4:12, 4:12] = 1
    samples = decode_jbig2_params(encode_embedded(bm), b"", 16, 16)
    rows = np.unpackbits(
        np.frombuffer(samples, np.uint8).reshape(16, 2), axis=1)
    np.testing.assert_array_equal(rows, 1 - bm)  # ink -> 0


def test_pdf_scanned_jbig2_page_to_png():
    """A scanned-style PDF whose page image is JBIG2 yields a PNG for
    the VLM (previously: None + pdf_rasterizer demanded)."""
    from rag_application_tpu.ingest.pdf import extract_page_images

    bitmap = np.zeros((32, 64), np.uint8)
    bitmap[8:24, 16:48] = 1
    jb = encode_embedded(bitmap, tpgdon=True)
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /Resources << /XObject "
            b"<< /Im0 4 0 R >> >> /MediaBox [0 0 612 792] /Contents 5 0 R >>"),
        4: (f"<< /Subtype /Image /Width 64 /Height 32 /BitsPerComponent 1 "
            f"/ColorSpace /DeviceGray /Filter /JBIG2Decode "
            f"/Length {len(jb)} >>\nstream\n".encode() + jb
            + b"\nendstream"),
        5: b"<< /Length 0 >>\nstream\n\nendstream",
    }
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode() + b"0000000000 65535 f \n"
    for num in range(1, len(objs) + 1):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref}\n%%EOF").encode()

    images = extract_page_images(bytes(out))
    assert len(images) == 1 and images[0] is not None
    mime, png = images[0]
    assert mime == "image/png" and png[:8] == b"\x89PNG\r\n\x1a\n"
    idat_at = png.index(b"IDAT")
    length = struct.unpack(">I", png[idat_at - 4:idat_at])[0]
    raw = zlib.decompress(png[idat_at + 4:idat_at + 4 + length])
    stride = 64 // 8 + 1
    rows = np.frombuffer(raw, np.uint8).reshape(32, stride)[:, 1:]
    bits = np.unpackbits(rows, axis=1)[:, :64]
    np.testing.assert_array_equal(bits, 1 - bitmap)  # gray: 0 = black


def test_garbage_rejected():
    with pytest.raises(JBIG2Error):
        decode_embedded(b"\x00\x01\x02")
    with pytest.raises(JBIG2Error):
        decode_embedded(b"")


def test_huge_declared_dimensions_rejected():
    """Untrusted segment dims must raise JBIG2Error (-> rasterizer
    fallback), not a multi-GB MemoryError."""
    from rag_application_tpu.ingest.jbig2 import decode_generic

    with pytest.raises(JBIG2Error):
        decode_generic(b"\x00" * 16, 100_000, 100_000)
