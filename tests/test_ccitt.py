"""Native CCITT Group 3/4 fax decoding (ingest/ccitt.py) and its PDF
integration — scanned-fax pages reach the VLM hook without poppler
(reference: pdf2image rasterization, IndexerAPI processors/utils.py:16-22).

Ground truth comes from Pillow's libtiff Group-4 ENCODER (tests only —
the decoder under test is pure stdlib): random bitmaps round-trip
through TIFF/G4 strips into `decode_ccitt` and must match exactly.
"""

import io
import struct
import zlib

import numpy as np
import pytest

from rag_application_tpu.ingest.ccitt import (
    CCITTError,
    decode_ccitt,
    decode_ccitt_params,
)

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def g4_encode(bitmap: np.ndarray) -> bytes:
    """bitmap (H, W) of {0,1}, 1 = black ink -> raw G4 strip bytes."""
    h, w = bitmap.shape
    # Pillow writes G4 with photometric=1 (MinIsBlack), so the codec's
    # "black runs" are the 1-bits of the mode-"1" array: ink maps to 255
    im = Image.fromarray((bitmap * 255).astype(np.uint8)).convert("1")
    buf = io.BytesIO()
    im.save(buf, "TIFF", compression="group4", strip_size=1 << 30)
    buf.seek(0)
    tif = Image.open(buf)
    offsets = tif.tag_v2[273]
    counts = tif.tag_v2[279]
    assert len(offsets) == 1, "expected a single strip"
    raw = buf.getvalue()
    return raw[offsets[0]:offsets[0] + counts[0]]


def unpack(packed: bytes, w: int, h: int) -> np.ndarray:
    rows = np.frombuffer(packed, dtype=np.uint8).reshape(h, -1)
    bits = np.unpackbits(rows, axis=1)[:, :w]
    return bits


@pytest.mark.parametrize("shape,density,seed", [
    ((16, 64), 0.5, 0),
    ((23, 100), 0.1, 1),     # sparse ink, non-multiple-of-8 width
    ((8, 1728), 0.02, 2),    # default fax width, long white runs
    ((40, 33), 0.9, 3),      # dense ink
])
def test_g4_roundtrip_vs_pillow(shape, density, seed):
    rng = np.random.default_rng(seed)
    bitmap = (rng.random(shape) < density).astype(np.uint8)
    data = g4_encode(bitmap)
    packed, n = decode_ccitt(data, columns=shape[1], rows=shape[0], k=-1)
    assert n == shape[0]
    np.testing.assert_array_equal(unpack(packed, shape[1], n), bitmap)


def test_g4_structured_patterns():
    """Exercises pass/horizontal/vertical modes deterministically:
    vertical stripes, a checkerboard, and long constant runs."""
    w, h = 96, 24
    cases = []
    stripes = np.zeros((h, w), np.uint8)
    stripes[:, ::7] = 1
    cases.append(stripes)
    checker = np.indices((h, w)).sum(axis=0) % 2
    cases.append(checker.astype(np.uint8))
    blocky = np.zeros((h, w), np.uint8)
    blocky[4:12, 16:80] = 1
    cases.append(blocky)
    for bitmap in cases:
        data = g4_encode(bitmap)
        packed, n = decode_ccitt(data, columns=w, rows=h, k=-1)
        np.testing.assert_array_equal(unpack(packed, w, n), bitmap)


def test_g3_1d_hand_built():
    """K=0 modified-Huffman row built from the code tables by hand:
    white 4 (1011), black 2 (11), white 58 -> 0b00001100 0b00111111...
    Use table values directly: white4='1011', black2='11',
    white10='00111' on a 16-col row."""
    # row: 4 white, 2 black, 10 white  (16 columns)
    bits = "1011" + "11" + "00111"
    data = int(bits + "0" * (8 - len(bits) % 8), 2).to_bytes(
        (len(bits) + 7) // 8, "big")
    packed, n = decode_ccitt(data, columns=16, rows=1, k=0)
    assert n == 1
    row = unpack(packed, 16, 1)[0]
    np.testing.assert_array_equal(
        row, [0, 0, 0, 0, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0])


def test_truncated_stream_salvages_rows():
    rng = np.random.default_rng(4)
    bitmap = (rng.random((20, 64)) < 0.3).astype(np.uint8)
    data = g4_encode(bitmap)
    packed, n = decode_ccitt(data[: len(data) // 2], columns=64, k=-1)
    assert 0 < n < 20
    np.testing.assert_array_equal(unpack(packed, 64, n), bitmap[:n])


def test_garbage_raises():
    # all-zero bits match no 2D mode code and no EOL — the first row
    # must fail loudly (fax codes carry no redundancy, so SOME byte
    # soup decodes "successfully"; zeros provably cannot)
    with pytest.raises(CCITTError):
        decode_ccitt(b"\x00\x00\x00\x00", columns=64, rows=4, k=-1)


def test_decode_params_adapter_black_is_zero():
    bitmap = np.zeros((4, 16), np.uint8)
    bitmap[1, 2:9] = 1
    data = g4_encode(bitmap)
    samples = decode_ccitt_params(data, {"K": -1, "Columns": 16}, 16, 4)
    assert samples is not None
    got = unpack(samples, 16, 4)
    # adapter emits 1-bpc GRAY: ink -> 0 (black)
    np.testing.assert_array_equal(got, 1 - bitmap)


def test_pdf_scanned_ccitt_page_to_png():
    """A scanned-style PDF whose page image is CCITT G4 yields a PNG
    for the VLM (previously: None + pdf_rasterizer demanded)."""
    from rag_application_tpu.ingest.pdf import extract_page_images

    bitmap = np.zeros((32, 64), np.uint8)
    bitmap[8:24, 16:48] = 1
    g4 = g4_encode(bitmap)
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /Resources << /XObject "
            b"<< /Im0 4 0 R >> >> /MediaBox [0 0 612 792] /Contents 5 0 R >>"),
        4: (f"<< /Subtype /Image /Width 64 /Height 32 /BitsPerComponent 1 "
            f"/ColorSpace /DeviceGray /Filter /CCITTFaxDecode "
            f"/DecodeParms << /K -1 /Columns 64 /Rows 32 >> "
            f"/Length {len(g4)} >>\nstream\n".encode() + g4
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
    # decode the PNG IDAT and check the ink landed where it should
    idat_at = png.index(b"IDAT")
    length = struct.unpack(">I", png[idat_at - 4:idat_at])[0]
    raw = zlib.decompress(png[idat_at + 4:idat_at + 4 + length])
    stride = 64 // 8 + 1
    rows = np.frombuffer(raw, np.uint8).reshape(32, stride)[:, 1:]
    bits = np.unpackbits(rows, axis=1)[:, :64]
    np.testing.assert_array_equal(bits, 1 - bitmap)  # gray: 0 = black
