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


def test_symbol_text_roundtrip():
    """Symbol-dictionary + text-region page (the dominant real-world
    scanned-PDF coding) roundtrips bit-exact through the fixture
    encoder (T.88 6.4/6.5 arithmetic path)."""
    from rag_application_tpu.ingest.jbig2 import encode_symbol_text

    rng = np.random.default_rng(7)
    glyphs = [
        (rng.random((12, 8)) < 0.5).astype(np.uint8),   # two height
        (rng.random((12, 10)) < 0.4).astype(np.uint8),  # classes +
        (rng.random((9, 7)) < 0.6).astype(np.uint8),    # mixed widths
        (rng.random((9, 9)) < 0.3).astype(np.uint8),
    ]
    placements = [(0, 3, 2), (1, 15, 2), (2, 30, 4), (3, 40, 4),
                  (0, 3, 20), (2, 16, 22), (1, 28, 20), (3, 2, 11)]
    page = decode_embedded(encode_symbol_text(glyphs, placements, 56, 36))
    ref = np.zeros((36, 56), np.uint8)
    for sid, x, y in placements:
        g = glyphs[sid]
        ref[y:y + g.shape[0], x:x + g.shape[1]] |= g
    np.testing.assert_array_equal(page, ref)


def test_symbol_text_single_symbol_and_reuse():
    from rag_application_tpu.ingest.jbig2 import encode_symbol_text

    glyph = np.zeros((6, 5), np.uint8)
    glyph[1:5, 1:4] = 1
    # one symbol stamped many times (SYMCODELEN edge: 1 symbol)
    placements = [(0, 5 * i, 3 * i) for i in range(6)]
    page = decode_embedded(encode_symbol_text([glyph], placements, 40, 24))
    ref = np.zeros((24, 40), np.uint8)
    for _sid, x, y in placements:
        ref[y:y + 6, x:x + 5] |= glyph
    np.testing.assert_array_equal(page, ref)


def test_huffman_flag_flip_never_decodes_garbage():
    """Flipping SDHUFF on an arithmetic-coded stream yields a stream
    whose Huffman parse is inconsistent — it must raise JBIG2Error
    (-> rasterizer fallback), never return a wrong page. (Until r5
    Huffman raised unconditionally; now it decodes, so this pins the
    malformed-stream behavior instead.)"""
    from rag_application_tpu.ingest.jbig2 import _segment, encode_symbol_text

    glyph = np.ones((4, 4), np.uint8)
    blob = bytearray(encode_symbol_text([glyph], [(0, 0, 0)], 8, 8))
    # symbol dict payload starts after the 30-byte page-info segment
    # + its 11-byte header: flip SDHUFF (bit 0 = low byte of u16 flags)
    sd_flags_lo = 30 + 11 + 1
    assert blob[sd_flags_lo - 1] == 0 and blob[sd_flags_lo] == 0
    blob[sd_flags_lo] |= 1
    with pytest.raises(JBIG2Error):
        decode_embedded(bytes(blob))
    assert decode_jbig2_params(bytes(blob), b"", 8, 8) is None

    # a Huffman text region with no referred symbols also raises
    page_info = struct.pack(">IIII", 8, 8, 0, 0) + b"\x01\x00\x00"
    region = struct.pack(">IIII", 8, 8, 0, 0) + b"\x00"
    tr = region + struct.pack(">H", 1) + struct.pack(">I", 1)  # SBHUFF=1
    stream = (_segment(0, 48, 1, page_info) + _segment(1, 6, 1, tr)
              + _segment(2, 49, 1, b""))
    with pytest.raises(JBIG2Error, match="no symbols|short|exhausted"):
        decode_embedded(stream)


def test_params_adapter_black_is_zero():
    bm = np.zeros((16, 16), np.uint8)
    bm[4:12, 4:12] = 1
    samples = decode_jbig2_params(encode_embedded(bm), b"", 16, 16)
    rows = np.unpackbits(
        np.frombuffer(samples, np.uint8).reshape(16, 2), axis=1)
    np.testing.assert_array_equal(rows, 1 - bm)  # ink -> 0


def _scanned_pdf(jb: bytes, w: int, h: int) -> bytes:
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /Resources << /XObject "
            b"<< /Im0 4 0 R >> >> /MediaBox [0 0 612 792] /Contents 5 0 R >>"),
        4: (f"<< /Subtype /Image /Width {w} /Height {h} /BitsPerComponent 1 "
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
    return bytes(out)


def test_pdf_scanned_symbol_coded_page_to_png():
    """A scanned PDF whose page is symbol-coded (dictionary + text
    region — what jbig2enc emits for real scans) decodes natively to a
    PNG for the VLM hook."""
    from rag_application_tpu.ingest.jbig2 import encode_symbol_text
    from rag_application_tpu.ingest.pdf import extract_page_images

    glyph_a = np.zeros((10, 8), np.uint8)
    glyph_a[2:8, 2:6] = 1
    glyph_b = np.zeros((10, 6), np.uint8)
    glyph_b[1:9, 2:4] = 1
    placements = [(0, 4, 4), (1, 16, 4), (0, 26, 4), (1, 4, 18)]
    jb = encode_symbol_text([glyph_a, glyph_b], placements, 40, 32)
    images = extract_page_images(_scanned_pdf(jb, 40, 32))
    assert len(images) == 1 and images[0] is not None
    mime, png = images[0]
    assert mime == "image/png" and png[:8] == b"\x89PNG\r\n\x1a\n"
    idat_at = png.index(b"IDAT")
    length = struct.unpack(">I", png[idat_at - 4:idat_at])[0]
    raw = zlib.decompress(png[idat_at + 4:idat_at + 4 + length])
    rows = np.frombuffer(raw, np.uint8).reshape(32, 40 // 8 + 1)[:, 1:]
    bits = np.unpackbits(rows, axis=1)[:, :40]
    ref = np.zeros((32, 40), np.uint8)
    for sid, x, y in placements:
        g = [glyph_a, glyph_b][sid]
        ref[y:y + g.shape[0], x:x + g.shape[1]] |= g
    np.testing.assert_array_equal(bits, 1 - ref)  # gray: 0 = black


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


def test_halftone_roundtrip():
    """Pattern-dictionary + halftone-region page (T.88 6.6/6.7
    arithmetic path) roundtrips bit-exact through the fixture encoder:
    gray-code bitplanes on one MQ stream, grid cells stamp patterns."""
    from rag_application_tpu.ingest.jbig2 import encode_halftone

    rng = np.random.default_rng(11)
    # 6 gray levels of increasing ink density, 4x4 square cells
    patterns = [(rng.random((4, 4)) < (lvl / 5.0)).astype(np.uint8)
                for lvl in range(6)]
    gray = rng.integers(0, 6, size=(7, 9))          # HGH x HGW grid
    page = decode_embedded(encode_halftone(
        gray, patterns, page_w=9 * 4, page_h=7 * 4))
    ref = np.zeros((7 * 4, 9 * 4), np.uint8)
    for m in range(7):
        for n in range(9):
            ref[m * 4:(m + 1) * 4, n * 4:(n + 1) * 4] |= \
                patterns[int(gray[m, n])]
    np.testing.assert_array_equal(page, ref)


def test_halftone_two_patterns_single_plane():
    """HBPP edge: 2 patterns -> one bitplane, no gray-code chaining."""
    from rag_application_tpu.ingest.jbig2 import encode_halftone

    white = np.zeros((3, 3), np.uint8)
    black = np.ones((3, 3), np.uint8)
    gray = np.array([[0, 1, 0], [1, 0, 1]])
    page = decode_embedded(encode_halftone(
        gray, [white, black], page_w=9, page_h=6))
    ref = np.kron(gray, np.ones((3, 3), np.int64)).astype(np.uint8)
    np.testing.assert_array_equal(page, ref)


def test_halftone_mmr_and_skip_unsupported():
    """MMR pattern dicts and HENABLESKIP regions raise (-> rasterizer
    fallback), they must not misdecode."""
    from rag_application_tpu.ingest.jbig2 import encode_halftone

    pats = [np.zeros((3, 3), np.uint8), np.ones((3, 3), np.uint8)]
    blob = bytearray(encode_halftone(
        np.array([[0, 1]]), pats, page_w=6, page_h=3))
    # segment 1 payload starts after its 11-byte header + page-info
    # segment (11 + 19); flip the pattern dictionary's HDMMR bit
    pd_payload_off = (11 + 19) + 11
    blob2 = bytearray(blob)
    blob2[pd_payload_off] |= 1
    with pytest.raises(JBIG2Error):
        decode_embedded(bytes(blob2))


def test_halftone_mixed_pattern_shapes_raise_jbig2error():
    """Patterns merged from multiple dicts may disagree in shape; the
    stamp loop would broadcast-error (ValueError), bypassing the
    JBIG2Error -> rasterizer fallback in decode_jbig2_params."""
    from rag_application_tpu.ingest.jbig2 import _decode_halftone_region

    payload = struct.pack(">IIiiB", 8, 8, 0, 0, 0)  # region info only
    pats = [np.zeros((2, 2), np.uint8), np.zeros((3, 3), np.uint8)]
    with pytest.raises(JBIG2Error):
        _decode_halftone_region(payload, pats)


def test_refinement_roundtrip():
    """Lossy generic pass + refinement region (type 43, T.88 6.3
    arithmetic path) corrects the page to the exact target bitmap."""
    from rag_application_tpu.ingest.jbig2 import encode_refined_page

    final = text_like(seed=5)
    base = final.copy()
    rng = np.random.default_rng(9)          # "lossy" base: flip 5% bits
    flip = rng.random(base.shape) < 0.05
    base[flip] ^= 1
    page = decode_embedded(encode_refined_page(base, final))
    np.testing.assert_array_equal(page, final)


def test_refinement_template1_roundtrip():
    from rag_application_tpu.ingest.jbig2 import encode_refined_page

    final = text_like(h=32, w=48, seed=6)
    base = np.zeros_like(final)             # refine from an empty page
    page = decode_embedded(encode_refined_page(base, final, template=1))
    np.testing.assert_array_equal(page, final)


def test_refinement_tpgron_unsupported():
    from rag_application_tpu.ingest.jbig2 import encode_refined_page

    final = text_like(h=16, w=16, seed=7)
    blob = bytearray(encode_refined_page(final, final))
    # segment 2 (refinement) payload: skip seg0 (11+19) + seg1 header
    # (11) + seg1 payload (17 region + 1 flags + 8 AT + MQ data)...
    # easier: find the refinement flags byte = region-info(17) after
    # the type-43 segment header; locate by scanning for the segment
    # number 2 header prefix
    import struct as _s
    hdr = _s.pack(">IB", 2, 43)
    off = bytes(blob).find(hdr)
    assert off > 0
    flags_at = off + 11 + 17                 # header + region info
    blob[flags_at] |= 2                      # set TPGRON
    with pytest.raises(JBIG2Error):
        decode_embedded(bytes(blob))


def test_text_region_sbrefine_roundtrip():
    """SBREFINE instances (6.4.11): a placement carrying a target
    bitmap refines the dictionary symbol in-stream — including a size
    change — and lands bit-exact."""
    from rag_application_tpu.ingest.jbig2 import encode_symbol_text

    rng = np.random.default_rng(13)
    glyph = (rng.random((10, 8)) < 0.45).astype(np.uint8)
    # same-size refinement: a few flipped pixels
    tweaked = glyph.copy()
    tweaked[2:5, 3:6] ^= 1
    # size-changing refinement (RDW=+2, RDH=-2)
    bigger = (rng.random((8, 10)) < 0.4).astype(np.uint8)
    placements = [(0, 0, 0), (0, 12, 0, tweaked), (0, 26, 0, bigger),
                  (0, 0, 14)]
    page = decode_embedded(encode_symbol_text([glyph], placements, 40, 24))
    ref = np.zeros((24, 40), np.uint8)
    for sid, x, y, *t in placements:
        b = np.asarray(t[0], np.uint8) if t else glyph
        ref[y:y + b.shape[0], x:x + b.shape[1]] |= b
    np.testing.assert_array_equal(page, ref)


def test_symbol_dict_refagg_roundtrip():
    """Refinement/aggregate symbol dictionaries (6.5.8.2, REFAGGNINST=1):
    a second dictionary refines an imported symbol; the text region sees
    both the import and the refined symbol."""
    import struct as _s

    from rag_application_tpu.ingest.jbig2 import (
        _NOMINAL_AT, _ArithEncoder, _segment)

    rng = np.random.default_rng(17)
    glyph = (rng.random((10, 8)) < 0.45).astype(np.uint8)
    target = glyph.copy()
    target[1:6, 2:7] ^= 1

    at = b"".join(_s.pack(">bb", ax, ay) for ax, ay in _NOMINAL_AT[0])
    rat_pairs = [(-1, -1), (-1, -1)]
    rat = b"".join(_s.pack(">bb", ax, ay) for ax, ay in rat_pairs)

    # dict A: one normally-coded symbol, exported
    a = _ArithEncoder()
    a.encode_int("IADH", 10)
    a.encode_int("IADW", 8)
    a.encode_generic(glyph)
    a.encode_int("IADW", None)
    a.encode_int("IAEX", 0)
    a.encode_int("IAEX", 1)
    sd_a = _s.pack(">H", 0) + at + _s.pack(">II", 1, 1) + a.flush()

    # dict B: REFAGG (flags bit 1), one refined symbol from import 0,
    # exports import + new (SBSYMCODELEN = ceil(log2(1+1)) = 1)
    b = _ArithEncoder()
    b.encode_int("IADH", 10)
    b.encode_int("IADW", 8)
    b.encode_int("IAAI", 1)
    b.encode_iaid(0, 1)
    b.encode_int("IARDX", 0)
    b.encode_int("IARDY", 0)
    b.encode_refine(target, glyph, template=0, at=rat_pairs)
    b.encode_int("IADW", None)
    b.encode_int("IAEX", 0)
    b.encode_int("IAEX", 2)
    sd_b = _s.pack(">H", 2) + at + rat + _s.pack(">II", 2, 1) + b.flush()

    # text region over dict B's exports: glyph at x=0, target at x=10
    t = _ArithEncoder()
    t.encode_int("IADT", 0)
    t.encode_int("IADT", 0)
    t.encode_int("IAFS", 0)
    t.encode_iaid(0, 1)
    t.encode_int("IADS", 10 - (0 + 8 - 1))
    t.encode_iaid(1, 1)
    t.encode_int("IADS", None)
    region_info = _s.pack(">IIII", 24, 12, 0, 0) + b"\x00"
    tr = (region_info + _s.pack(">H", 1 << 4)
          + _s.pack(">I", 2) + t.flush())

    page_info = _s.pack(">IIII", 24, 12, 0, 0) + b"\x01" + b"\x00\x00"
    blob = (_segment(0, 48, 1, page_info)
            + _segment(1, 0, 1, sd_a)
            + _segment(2, 0, 1, sd_b, refs=(1,))
            + _segment(3, 6, 1, tr, refs=(2,))
            + _segment(4, 49, 1, b""))
    page = decode_embedded(blob)
    ref = np.zeros((12, 24), np.uint8)
    ref[:10, 0:8] |= glyph
    ref[:10, 10:18] |= target
    np.testing.assert_array_equal(page, ref)


# ----------------------------------------------- Huffman forms (r5)

def _place_ref(syms, places, w, h):
    ref = np.zeros((h, w), np.uint8)
    for sid, x, y in places:
        s = syms[sid]
        ref[y:y + s.shape[0], x:x + s.shape[1]] |= s
    return ref


def test_huffman_symbol_text_roundtrip(rng):
    """SDHUFF=1 + SBHUFF=1 with standard Annex B tables: multi-height
    dictionary, uncompressed collective bitmaps, runcode symbol-ID
    table — decodes to the exact placement."""
    from rag_application_tpu.ingest.jbig2 import encode_symbol_text_huffman

    syms = [(rng.random((6, 5)) < 0.5).astype(np.uint8),
            (rng.random((6, 4)) < 0.5).astype(np.uint8),
            (rng.random((8, 7)) < 0.4).astype(np.uint8)]
    places = [(0, 2, 1), (1, 10, 1), (2, 3, 12), (0, 14, 12), (1, 25, 3)]
    blob = encode_symbol_text_huffman(syms, places, page_w=40, page_h=24)
    np.testing.assert_array_equal(decode_embedded(blob),
                                  _place_ref(syms, places, 40, 24))


def test_huffman_custom_code_table(rng):
    """DS routed through a referred type-53 custom code table (B.2):
    the segment parses and the selector-3 path engages."""
    from rag_application_tpu.ingest.jbig2 import encode_symbol_text_huffman

    syms = [(rng.random((5, 6)) < 0.5).astype(np.uint8),
            (rng.random((5, 3)) < 0.5).astype(np.uint8)]
    places = [(0, 1, 2), (1, 9, 2), (0, 30, 2), (1, 5, 9)]
    blob = encode_symbol_text_huffman(syms, places, page_w=40, page_h=16,
                                      custom_ds=True)
    np.testing.assert_array_equal(decode_embedded(blob),
                                  _place_ref(syms, places, 40, 16))


def test_huffman_many_symbols_wide_codes(rng):
    """20 glyphs -> 5-bit symbol codes; several height classes."""
    from rag_application_tpu.ingest.jbig2 import encode_symbol_text_huffman

    syms = [(rng.random((3 + (i % 4), 2 + (i % 5))) < 0.5
             ).astype(np.uint8) for i in range(20)]
    places = [(i, (i % 8) * 9 + 1, (i // 8) * 9 + 1) for i in range(20)]
    blob = encode_symbol_text_huffman(syms, places, page_w=80, page_h=32)
    np.testing.assert_array_equal(decode_embedded(blob),
                                  _place_ref(syms, places, 80, 32))


def test_huffman_refinement_combo_raises(rng):
    """SDHUFF + REFAGG and SBHUFF + SBREFINE stay on the rasterizer
    hook (raise), never misdecode."""
    from rag_application_tpu.ingest.jbig2 import (
        _decode_symbol_dict, _decode_text_region)

    # symbol dict flags: SDHUFF | REFAGG
    with pytest.raises(JBIG2Error):
        _decode_symbol_dict(struct.pack(">H", 3) + b"\x00" * 16, [])
    # text region flags: SBHUFF | SBREFINE
    payload = (struct.pack(">IIII", 8, 8, 0, 0) + b"\x00"
               + struct.pack(">H", 3) + b"\x00" * 8)
    with pytest.raises(JBIG2Error):
        _decode_text_region(payload, [np.ones((2, 2), np.uint8)])


def test_standard_tables_self_consistent():
    """Every Annex B standard table round-trips values across its lines
    (canonical code assignment + range arithmetic agree between the
    encode and decode sides)."""
    from rag_application_tpu.ingest.jbig2 import (
        _BitReader, _BitWriterMSB, _STD_TABLE_SPECS, _std_table)

    for tno in range(1, 16):
        t = _std_table(tno)
        vals = []
        for p, r, lo, *s in _STD_TABLE_SPECS[tno][0]:
            sign = s[0] if s else 1
            if sign > 0:
                vals += [lo] + ([lo + 1, lo + (1 << min(r, 10)) - 1]
                                if r > 0 else [])
            else:
                vals += [lo, lo - 5]
        if _STD_TABLE_SPECS[tno][1]:
            vals.append(None)
        bw = _BitWriterMSB()
        for v in vals:
            t.encode(bw, v)
        br = _BitReader(bw.flush())
        got = [t.decode(br) for _ in vals]
        assert got == vals, f"table B.{tno}: {got} != {vals}"
