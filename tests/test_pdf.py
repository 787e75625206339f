"""Native PDF parsing + page-split ingest (ingest/pdf.py).

Parity surface: per-page PDF splitting + text extraction, the
reference's headline ingest flow (IndexerAPI file_processor.py:150-184,
processors/utils.py:16-22 — pypdf + pdf2image there, stdlib here).
"""

import asyncio
import os
import struct
import zlib

import numpy as np
import pytest

from rag_application_tpu.config import EncoderConfig
from rag_application_tpu.ingest.pdf import (
    FontDecoder,
    Lexer,
    Name,
    PDFDocument,
    PDFError,
    Ref,
    extract_pages,
    is_pdf,
    page_count,
)
from rag_application_tpu.ingest.pipeline import IngestPipeline
from rag_application_tpu.ingest.queue import NonRetryableError
from rag_application_tpu.models.embedder import Embedder
from rag_application_tpu.store.collection import Collection

from fixtures.make_fixtures import build_pdf, text_page

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
TINY = EncoderConfig(vocab_size=512, hidden_dim=32, num_layers=1, num_heads=4,
                     mlp_dim=64, max_len=32, out_dim=32, dtype="float32")


def small_config():
    from rag_application_tpu.config import (
        Config, FunnelConfig, IndexConfig, SparseConfig)

    cfg = Config()
    cfg.index = IndexConfig(dim=32, matryoshka_dims=(8, 16),
                            initial_capacity=16)
    cfg.sparse = SparseConfig(candidate_pool=64, max_query_terms=8)
    cfg.funnel = FunnelConfig(matryoshka_limits=(8, 6), dense_limit=5,
                              quantized_limit=5, sparse_limit=5, final_limit=5)
    return cfg


# ------------------------------------------------------------------- lexer

def test_lexer_tokens():
    lex = Lexer(rb"/Name 12 -3.5 (lit\(eral\)) <48656C6C6F> [1 2] << /K 3 >> R")
    assert lex.next() == Name("Name")
    assert lex.next() == 12
    assert lex.next() == -3.5
    assert lex.next() == b"lit(eral)"
    assert lex.next() == b"Hello"
    assert lex.next() == "["


def test_literal_string_escapes():
    lex = Lexer(rb"(a\101\12b\nc\\d(nested)e)")
    s = lex.next()
    assert s == b"aA\nb\nc\\d(nested)e"


def test_name_hex_escape():
    lex = Lexer(rb"/A#42C")
    assert lex.next() == Name("ABC")


# ------------------------------------------------------------ classic xref

def test_classic_pdf_pages_and_text():
    pdf = build_pdf([
        text_page(["Alpha line one.", "Alpha line two."]),
        text_page(["Beta page."]),
    ])
    assert is_pdf(pdf)
    assert page_count(pdf) == 2
    pages = extract_pages(pdf)
    assert pages[0] == "Alpha line one.\nAlpha line two."
    assert pages[1] == "Beta page."


def test_uncompressed_and_tj_array():
    content = (b"BT /F1 12 Tf 72 720 Td "
               b"[(Ker) -40 (ned) -400 (words)] TJ T* (next) ' ET")
    pdf = build_pdf([content], compress=False)
    pages = extract_pages(pdf)
    # -40 is glyph kerning (no space); -400 is an inter-word gap
    assert pages[0] == "Kerned words\nnext"


def test_startxref_corruption_recovers_via_scan():
    pdf = build_pdf([text_page(["Recoverable text."])])
    broken = pdf.replace(b"startxref", b"stxxxxref")
    pages = extract_pages(broken)
    assert pages == ["Recoverable text."]


def test_not_a_pdf_raises():
    with pytest.raises(PDFError):
        PDFDocument(b"\x00\x01\x02 definitely not a pdf")


def test_encrypted_pdf_garbage_encrypt_dict_raises():
    pdf = build_pdf([text_page(["secret"])])
    broken = pdf.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 3 0 R")
    # object 3 is the font dict — not a valid security handler
    with pytest.raises(PDFError, match="[Ee]ncrypt"):
        PDFDocument(broken)


# ------------------------------------------------- standard encryption

def build_encrypted_pdf(lines, variant, user_pwd=b"", owner_pwd=b""):
    """Classic-xref PDF whose streams/strings are encrypted with the
    standard security handler (pdf_crypt.py primitives drive both the
    fixture construction here and the decrypt under test)."""
    import hashlib

    from rag_application_tpu.ingest.pdf_crypt import (
        StandardSecurityHandler, _pad_password, aes_cbc_encrypt,
        file_key_r2_r4, hash_r6, rc4, user_check_bytes)

    id0 = bytes(range(16))
    P = -44
    if variant in ("rc4_40", "rc4_128"):
        R, V, klen = (2, 1, 5) if variant == "rc4_40" else (3, 2, 16)
        h = hashlib.md5(_pad_password(owner_pwd or user_pwd)).digest()
        if R >= 3:
            for _ in range(50):
                h = hashlib.md5(h).digest()
        okey = h[:klen]
        O = rc4(okey, _pad_password(user_pwd))
        if R >= 3:
            for i in range(1, 20):
                O = rc4(bytes(b ^ i for b in okey), O)
        key = file_key_r2_r4(user_pwd, O, P, id0, R, klen, True)
        U = user_check_bytes(key, id0, R)
        if R >= 3:
            U += b"\x00" * 16
        enc = {"Filter": "Standard", "V": V, "R": R, "Length": klen * 8,
               "P": P, "O": O, "U": U}
        enc_body = (f"<< /Filter /Standard /V {V} /R {R} /Length {klen * 8} "
                    f"/P {P} /O <{O.hex()}> /U <{U.hex()}> >>")
    elif variant == "aes128":
        R, V, klen = 4, 4, 16
        h = hashlib.md5(_pad_password(owner_pwd or user_pwd)).digest()
        for _ in range(50):
            h = hashlib.md5(h).digest()
        okey = h[:klen]
        O = rc4(okey, _pad_password(user_pwd))
        for i in range(1, 20):
            O = rc4(bytes(b ^ i for b in okey), O)
        key = file_key_r2_r4(user_pwd, O, P, id0, R, klen, True)
        U = user_check_bytes(key, id0, R) + b"\x00" * 16
        enc = {"Filter": "Standard", "V": V, "R": R, "Length": 128,
               "P": P, "O": O, "U": U,
               "CF": {"StdCF": {"CFM": Name("AESV2"), "Length": 16}},
               "StmF": Name("StdCF"), "StrF": Name("StdCF")}
        enc_body = (f"<< /Filter /Standard /V 4 /R 4 /Length 128 /P {P} "
                    f"/O <{O.hex()}> /U <{U.hex()}> "
                    f"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
                    f"/StmF /StdCF /StrF /StdCF >>")
    elif variant == "aes256":
        file_key = bytes(range(32, 64))
        vsalt, ksalt = b"VSALT--1", b"KSALT--2"
        U = hash_r6(user_pwd, vsalt, b"") + vsalt + ksalt
        UE = aes_cbc_encrypt(hash_r6(user_pwd, ksalt, b""),
                             b"\x00" * 16, file_key)
        ovs, oks = b"OVSALT-3", b"OKSALT-4"
        O = hash_r6(owner_pwd, ovs, U[:48]) + ovs + oks
        OE = aes_cbc_encrypt(hash_r6(owner_pwd, oks, U[:48]),
                             b"\x00" * 16, file_key)
        enc = {"Filter": "Standard", "V": 5, "R": 6, "Length": 256,
               "P": P, "O": O, "U": U, "OE": OE, "UE": UE,
               "CF": {"StdCF": {"CFM": Name("AESV3"), "Length": 32}},
               "StmF": Name("StdCF"), "StrF": Name("StdCF")}
        enc_body = (f"<< /Filter /Standard /V 5 /R 6 /Length 256 /P {P} "
                    f"/O <{O.hex()}> /U <{U.hex()}> "
                    f"/OE <{OE.hex()}> /UE <{UE.hex()}> "
                    f"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
                    f"/StmF /StdCF /StrF /StdCF >>")
    else:
        raise ValueError(variant)

    if user_pwd or owner_pwd:
        handler = None  # password-protected fixture: no encryptor needed
        # encrypt with a throwaway handler built via empty-pwd math is
        # impossible; derive the file key directly instead
        class _H:
            pass
        handler = _H()
        if variant == "aes256":
            handler_key = file_key
        else:
            handler_key = file_key_r2_r4(user_pwd, enc["O"], P, id0,
                                         enc["R"], klen, True)

        def enc_stream(data, num, gen):
            sec = StandardSecurityHandler.__new__(StandardSecurityHandler)
            sec.v = enc["V"]
            sec.key = handler_key
            sec.stm_method = sec.str_method = (
                "aes" if variant in ("aes128", "aes256") else "rc4")
            return sec.encrypt_stream(data, num, gen)

        def enc_string(data, num, gen):
            sec = StandardSecurityHandler.__new__(StandardSecurityHandler)
            sec.v = enc["V"]
            sec.key = handler_key
            sec.stm_method = sec.str_method = (
                "aes" if variant in ("aes128", "aes256") else "rc4")
            return sec.encrypt_string(data, num, gen)
    else:
        # empty password: the real handler authenticates and encrypts —
        # this exercises the production auth path during construction
        handler = StandardSecurityHandler(enc, id0)
        enc_stream = handler.encrypt_stream
        enc_string = handler.encrypt_string

    content = text_page(lines)
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: (b"<< /Type /Pages /Kids [4 0 R] /Count 1 "
            b"/Resources << /Font << /F1 3 0 R >> >> >>"),
        3: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        4: (b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R "
            b"/MediaBox [0 0 612 792] >>"),
    }
    enc_content = enc_stream(zlib.compress(content), 5, 0)
    objs[5] = (f"<< /Length {len(enc_content)} /Filter /FlateDecode "
               f">>\nstream\n".encode() + enc_content + b"\nendstream")
    title = enc_string(b"Secret Title", 6, 0)
    objs[6] = b"<< /Title <" + title.hex().encode() + b"> >>"
    objs[7] = enc_body.encode()

    out = bytearray(b"%PDF-1.6\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_off = len(out)
    n = max(objs) + 1
    out += f"xref\n0 {n}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, n):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {n} /Root 1 0 R /Encrypt 7 0 R "
            f"/Info 6 0 R /ID [<{id0.hex()}> <{id0.hex()}>] >>\n"
            f"startxref\n{xref_off}\n%%EOF").encode()
    return bytes(out)


@pytest.mark.parametrize("variant", ["rc4_40", "rc4_128", "aes128",
                                     "aes256"])
def test_encrypted_empty_password_decrypts(variant):
    pdf = build_encrypted_pdf(["classified alpha", "bravo 42"], variant)
    doc = PDFDocument(pdf)
    assert doc.crypt is not None
    pages = extract_pages(pdf)
    assert pages == ["classified alpha\nbravo 42"]
    info = doc.resolve(doc.trailer["Info"])
    assert info["Title"] == b"Secret Title"
    # the /Encrypt dictionary's own strings must stay raw
    enc = doc.resolve(doc.trailer["Encrypt"])
    assert enc["U"] == doc.crypt.u


@pytest.mark.parametrize("variant", ["rc4_128", "aes256"])
def test_encrypted_real_password_raises(variant):
    pdf = build_encrypted_pdf(["classified"], variant,
                              user_pwd=b"hunter2", owner_pwd=b"hunter2")
    with pytest.raises(PDFError, match="password"):
        PDFDocument(pdf)


def test_pure_python_aes_matches_cryptography():
    """Cross-check the stdlib AES fallback against the cryptography
    wheel on CBC vectors (both directions, 128/256-bit keys)."""
    cryptography = pytest.importorskip("cryptography")
    _ = cryptography
    from cryptography.hazmat.primitives.ciphers import (
        Cipher, algorithms, modes)

    from rag_application_tpu.ingest import pdf_crypt

    if not hasattr(pdf_crypt, "_expand_key"):
        # fast path active: force-exercise the fallback by reloading
        # with the wheel masked
        import importlib
        import sys
        import unittest.mock as mock
        with mock.patch.dict(sys.modules, {"cryptography": None}):
            fallback = importlib.reload(pdf_crypt)
        try:
            for key_len in (16, 32):
                key = bytes(range(key_len))
                iv = bytes(range(100, 116))
                data = bytes(range(48)) * 2
                ctx = Cipher(algorithms.AES(key), modes.CBC(iv)).encryptor()
                want = ctx.update(data) + ctx.finalize()
                assert fallback.aes_cbc_encrypt(key, iv, data) == want
                assert fallback.aes_cbc_decrypt(key, iv, want) == data
        finally:
            importlib.reload(pdf_crypt)


# ----------------------------------------------- xref streams / ObjStm

def build_modern_pdf(use_predictor=True):
    """PDF 1.5 layout: catalog/pages/page/font inside an /ObjStm,
    cross-reference stream with /W [1 2 1] (optionally PNG-predicted),
    Type0 font with a ToUnicode CMap (bfchar + bfrange)."""
    tounicode = (b"/CIDInit /ProcSet findresource begin\n"
                 b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
                 b"2 beginbfchar\n<0001> <0048>\n<0002> <0069>\nendbfchar\n"
                 b"1 beginbfrange\n<0010> <0019> <0030>\nendbfrange\n"
                 b"endcmap end")
    inner = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R /Resources "
            b"<< /Font << /F1 4 0 R >> >> /MediaBox [0 0 612 792] >>"),
        4: (b"<< /Type /Font /Subtype /Type0 /BaseFont /Fake-Identity-H "
            b"/ToUnicode 7 0 R >>"),
    }
    header, body = [], bytearray()
    for num, b in inner.items():
        header.append(f"{num} {len(body)}")
        body += b + b" "
    head = (" ".join(header) + " ").encode()
    stm_z = zlib.compress(head + bytes(body))
    content = b"BT /F1 12 Tf 72 720 Td <00010002> Tj 0 -14 Td <001000110019> Tj ET"
    content_z = zlib.compress(content)
    tounicode_z = zlib.compress(tounicode)

    out = bytearray(b"%PDF-1.5\n")
    offsets = {}

    def add_obj(num, dict_bytes, stream=None):
        offsets[num] = len(out)
        out.extend(f"{num} 0 obj\n".encode() + dict_bytes)
        if stream is not None:
            out.extend(b"\nstream\n" + stream + b"\nendstream")
        out.extend(b"\nendobj\n")

    add_obj(5, (f"<< /Type /ObjStm /N {len(inner)} /First {len(head)} "
                f"/Length {len(stm_z)} /Filter /FlateDecode >>").encode(),
            stm_z)
    add_obj(6, f"<< /Length {len(content_z)} /Filter /FlateDecode >>".encode(),
            content_z)
    add_obj(7, f"<< /Length {len(tounicode_z)} /Filter /FlateDecode >>".encode(),
            tounicode_z)

    xref_off = len(out)
    entries = [bytes([0]) + struct.pack(">H", 0) + bytes([255])]
    for idx in range(4):  # objects 1-4 live in ObjStm 5
        entries.append(bytes([2]) + struct.pack(">H", 5) + bytes([idx]))
    for n in (5, 6, 7):
        entries.append(bytes([1]) + struct.pack(">H", offsets[n]) + bytes([0]))
    entries.append(bytes([1]) + struct.pack(">H", xref_off) + bytes([0]))
    raw = b"".join(entries)
    if use_predictor:
        row_len = 4
        rows = [raw[i:i + row_len] for i in range(0, len(raw), row_len)]
        pred, prev = bytearray(), bytes(row_len)
        for r in rows:
            pred.append(2)  # PNG Up
            pred.extend((r[i] - prev[i]) & 0xFF for i in range(row_len))
            prev = r
        xdata = zlib.compress(bytes(pred))
        parms = " /DecodeParms << /Predictor 12 /Columns 4 >>"
    else:
        xdata = zlib.compress(raw)
        parms = ""
    add_obj(8, (f"<< /Type /XRef /Size 9 /W [1 2 1] /Root 1 0 R /Length "
                f"{len(xdata)} /Filter /FlateDecode{parms} >>").encode(),
            xdata)
    out.extend(f"startxref\n{xref_off}\n%%EOF".encode())
    return bytes(out)


@pytest.mark.parametrize("predictor", [False, True])
def test_xref_stream_objstm_tounicode(predictor):
    pdf = build_modern_pdf(predictor)
    # bfchar: 0001->H, 0002->i; bfrange: 0010..0019 -> '0'..'9'
    assert extract_pages(pdf) == ["Hi\n019"]


def test_indirect_ref_parsing():
    pdf = build_pdf([text_page(["x"])])
    doc = PDFDocument(pdf)
    root = doc.resolve(doc.trailer["Root"])
    assert str(root["Type"]) == "Catalog"
    assert isinstance(root["Pages"], Ref)


# -------------------------------------------------------- font decoding

def test_differences_encoding():
    class FakeDoc:
        def resolve(self, x):
            return x

    font = {
        "Subtype": Name("Type1"),
        "Encoding": {"Differences": [65, Name("alpha"), Name("eacute"),
                                     200, Name("uni20AC")]},
    }
    # Differences: 65->'alpha' (not in the mini-AGL -> empty),
    # 66->'eacute', 200->'uni20AC'
    dec = FontDecoder(FakeDoc(), font)
    assert dec.decode(b"C") == "C"          # unmapped code: latin-1
    assert dec.decode(b"\x41") == ""        # alpha: unmapped glyph name
    assert dec.decode(bytes([66])) == "é"
    assert dec.decode(bytes([200])) == "€"
    assert dec.decode(b"C\x41" + bytes([66])) == "Cé"


# ----------------------------------------------------- pipeline wiring

def run(coro):
    return asyncio.run(coro)


@pytest.fixture(scope="module")
def embedder():
    return Embedder(cfg=TINY, batch_size=4, max_len=32)


def test_fixture_pdf_end_to_end(embedder):
    """The checked-in fixture ingests through /ingest/file semantics to
    per-page indexed, searchable content."""
    data = open(os.path.join(FIXTURES, "sample.pdf"), "rb").read()
    col = Collection("user_t", small_config())
    pipe = IngestPipeline(col, embedder)
    res = run(pipe.ingest_file("sample.pdf", data))
    assert res.failed_tasks == 0
    assert res.pages == 3 and res.chunks == 3
    rows = col.payloads.rows_where(document_id="sample.pdf")
    by_page = {col.payloads.get(r)["page_number"]: col.payloads.get(r)["text"]
               for r in rows}
    assert "Hohmann transfers" in by_page[1]
    assert "Porkchop plots" in by_page[2]
    assert "aerobraking" in by_page[3]
    # searchable: self-retrieval on the indexed page-2 text
    q = embedder.encode([by_page[2]])[0]
    hits = col.hybrid_search(q, by_page[2], limit=2)
    assert hits and hits[0].payload["page_number"] == 2


def test_binary_garbage_fails_loudly(embedder):
    col = Collection("user_t", small_config())
    pipe = IngestPipeline(col, embedder)
    res = run(pipe.ingest_file("blob.bin", b"\x00\xff\xfe\x01" * 200))
    assert res.chunks == 0
    assert res.failed_tasks == 1  # NonRetryable -> ledger, not mojibake


def test_scanned_pdf_without_rasterizer_fails(embedder):
    # a PDF whose only content is a non-text drawing op
    pdf = build_pdf([b"72 720 m 100 100 l S"])
    col = Collection("user_t", small_config())
    pipe = IngestPipeline(col, embedder)
    res = run(pipe.ingest_file("scan.pdf", pdf))
    assert res.chunks == 0 and res.failed_tasks == 1


def test_scanned_pdf_with_rasterizer_uses_vlm(embedder):
    pdf = build_pdf([b"72 720 m 100 100 l S"])
    col = Collection("user_t", small_config())
    pipe = IngestPipeline(
        col, embedder,
        pdf_rasterizer=lambda data, page_no: b"IMAGEBYTES%d" % page_no,
        page_describer=lambda img: "a scanned diagram of a turbine")
    res = run(pipe.ingest_file("scan.pdf", pdf))
    assert res.failed_tasks == 0 and res.chunks == 1
    row = col.payloads.rows_where(document_id="scan.pdf")[0]
    assert "turbine" in col.payloads.get(row)["text"]


def test_real_reference_fixture_if_present():
    """Robustness check against a real-world PDF when the reference tree
    is available (not checked in here)."""
    path = "/root/reference/Temp_Files/docs/ragas_papers.pdf"
    if not os.path.exists(path):
        pytest.skip("reference fixture unavailable")
    pages = extract_pages(open(path, "rb").read())
    assert len(pages) == 8
    assert "Retrieval Augmented Generation" in pages[0]
    assert sum(len(p) for p in pages) > 20_000


# ------------------------------------------------------------- filters

def test_filters_roundtrip():
    import zlib as _z

    from rag_application_tpu.ingest.pdf import (
        _a85_decode, _lzw_decode, _png_predictor, _rl_decode)

    # RunLength: literal run + repeat run + EOD
    data = bytes([2]) + b"abc" + bytes([257 - 4]) + b"x" + bytes([128])
    assert _rl_decode(data) == b"abc" + b"x" * 4

    # ASCII85 (with and without <~ ~> wrapper)
    import base64
    payload = b"hello pdf filter world"
    enc = base64.a85encode(payload)
    assert _a85_decode(enc) == payload
    assert _a85_decode(b"<~" + enc + b"~>") == payload

    # LZW: decode a stream produced by a tiny reference encoder
    def lzw_encode(raw):
        table = {bytes([i]): i for i in range(256)}
        next_code = 258
        nbits = 9
        out_bits = []
        w = b""
        out_bits.append((256, 9))  # clear
        for ch in raw:
            wc = w + bytes([ch])
            if wc in table:
                w = wc
            else:
                out_bits.append((table[w], nbits))
                table[wc] = next_code
                next_code += 1
                if next_code + 0 >= (1 << nbits) and nbits < 12:
                    nbits += 1
                w = bytes([ch])
        if w:
            out_bits.append((table[w], nbits))
        out_bits.append((257, nbits))  # EOD
        buf = 0
        bits = 0
        by = bytearray()
        for code, nb in out_bits:
            buf = (buf << nb) | code
            bits += nb
            while bits >= 8:
                bits -= 8
                by.append((buf >> bits) & 0xFF)
        if bits:
            by.append((buf << (8 - bits)) & 0xFF)
        return bytes(by)

    raw = b"TOBEORNOTTOBEORTOBEORNOT" * 4
    assert _lzw_decode(lzw_encode(raw)) == raw

    # PNG Up predictor row chain
    rows = [bytes([10, 20, 30, 40]), bytes([11, 22, 33, 44])]
    pred = bytearray()
    prev = bytes(4)
    for r in rows:
        pred.append(2)
        pred.extend((r[i] - prev[i]) & 0xFF for i in range(4))
        prev = r
    assert _png_predictor(bytes(pred), 1, 8, 4) == b"".join(rows)


def test_parser_never_crashes_on_mutations():
    """Bit-flipped/truncated PDFs must raise PDFError (or parse) —
    never escape with an arbitrary exception."""
    import random

    base = build_pdf([text_page(["stable text here"]),
                      text_page(["second page"])])
    rng = random.Random(0)
    for trial in range(60):
        data = bytearray(base)
        kind = trial % 3
        if kind == 0:  # flip bytes
            for _ in range(rng.randint(1, 8)):
                data[rng.randrange(len(data))] = rng.randrange(256)
        elif kind == 1:  # truncate
            data = data[: rng.randrange(6, len(data))]
        else:  # splice garbage
            pos = rng.randrange(len(data))
            data[pos:pos] = bytes(rng.randrange(256) for _ in range(16))
        try:
            pages = extract_pages(bytes(data))
            assert isinstance(pages, list)
        except PDFError:
            pass


# ----------------------------------------------------- embedded images

def build_image_pdf(img_dict: bytes, img_stream: bytes,
                    extra_objs=()) -> bytes:
    """One-page PDF whose only content draws an Image XObject /Im1
    (the shape of a scanned document: no text operators at all)."""
    content = b"q 612 0 0 792 0 0 cm /Im1 Do Q"
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/MediaBox [0 0 612 792] "
            b"/Resources << /XObject << /Im1 5 0 R >> >> >>"),
        4: (b"<< /Length %d >>\nstream\n" % len(content)
            + content + b"\nendstream"),
        5: (img_dict + b"\nstream\n" + img_stream + b"\nendstream"),
    }
    for num, body in extra_objs:
        objs[num] = body
    out = bytearray(b"%PDF-1.5\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_off = len(out)
    n = max(objs) + 1
    out += b"xref\n0 %d\n" % n + b"0000000000 65535 f \n"
    for num in range(1, n):
        out += b"%010d 00000 n \n" % offsets.get(num, 0)
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\n"
            b"startxref\n%d\n%%%%EOF" % (n, xref_off))
    return bytes(out)


def decode_png(png: bytes):
    """-> (width, height, bit_depth, color_type, raw rows w/o filter
    bytes). Only filter type 0 appears in our encoder's output."""
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    pos, chunks = 8, {}
    while pos < len(png):
        ln = int.from_bytes(png[pos:pos + 4], "big")
        tag = png[pos + 4:pos + 8]
        body = png[pos + 8:pos + 8 + ln]
        crc = int.from_bytes(png[pos + 8 + ln:pos + 12 + ln], "big")
        assert zlib.crc32(tag + body) & 0xFFFFFFFF == crc, tag
        chunks.setdefault(tag, b"")
        chunks[tag] += body
        pos += 12 + ln
    w = int.from_bytes(chunks[b"IHDR"][0:4], "big")
    h = int.from_bytes(chunks[b"IHDR"][4:8], "big")
    depth, ctype = chunks[b"IHDR"][8], chunks[b"IHDR"][9]
    raw = zlib.decompress(chunks[b"IDAT"])
    ncomp = 3 if ctype == 2 else 1
    row = (w * ncomp * depth + 7) // 8
    rows = []
    for r in range(h):
        assert raw[r * (row + 1)] == 0  # filter None
        rows.append(raw[r * (row + 1) + 1:(r + 1) * (row + 1)])
    return w, h, depth, ctype, b"".join(rows), chunks.get(b"PLTE")


def test_scanned_pdf_embedded_gray_image_to_png():
    from rag_application_tpu.ingest.pdf import extract_page_images

    samples = bytes((x * 7 + y * 3) & 0xFF
                    for y in range(8) for x in range(6))
    comp = zlib.compress(samples)
    pdf = build_image_pdf(
        b"<< /Subtype /Image /Width 6 /Height 8 /BitsPerComponent 8 "
        b"/ColorSpace /DeviceGray /Filter /FlateDecode /Length %d >>"
        % len(comp), comp)
    (got,) = extract_page_images(pdf)
    assert got is not None and got[0] == "image/png"
    w, h, depth, ctype, raw, _ = decode_png(got[1])
    assert (w, h, depth, ctype) == (6, 8, 8, 0)
    assert raw == samples
    # and the page itself extracts no text (it IS a scan)
    assert extract_pages(pdf) == [""]


def test_scanned_pdf_dct_passthrough_is_jpeg():
    from rag_application_tpu.ingest.pdf import extract_page_images

    fake_jpeg = b"\xff\xd8\xff\xe0" + b"JFIFDATA" * 20 + b"\xff\xd9"
    pdf = build_image_pdf(
        b"<< /Subtype /Image /Width 100 /Height 100 /BitsPerComponent 8 "
        b"/ColorSpace /DeviceRGB /Filter /DCTDecode /Length %d >>"
        % len(fake_jpeg), fake_jpeg)
    (got,) = extract_page_images(pdf)
    assert got == ("image/jpeg", fake_jpeg)


def test_scanned_pdf_indexed_palette_png():
    from rag_application_tpu.ingest.pdf import extract_page_images

    # 4x2, 8-bit indexed into a 3-entry RGB palette
    samples = bytes([0, 1, 2, 1, 2, 0, 1, 0])
    comp = zlib.compress(samples)
    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    pdf = build_image_pdf(
        b"<< /Subtype /Image /Width 4 /Height 2 /BitsPerComponent 8 "
        b"/ColorSpace [/Indexed /DeviceRGB 2 <%s>] "
        b"/Filter /FlateDecode /Length %d >>"
        % (palette.hex().encode(), len(comp)), comp)
    (got,) = extract_page_images(pdf)
    assert got is not None and got[0] == "image/png"
    w, h, depth, ctype, raw, plte = decode_png(got[1])
    assert (w, h, depth, ctype) == (4, 2, 8, 3)
    assert raw == samples and plte == palette


def test_scanned_pdf_ccitt_image_unconvertible():
    from rag_application_tpu.ingest.pdf import extract_page_images

    pdf = build_image_pdf(
        b"<< /Subtype /Image /Width 8 /Height 8 /BitsPerComponent 1 "
        b"/ColorSpace /DeviceGray /Filter /CCITTFaxDecode /Length 4 >>",
        b"\x00\x01\x02\x03")
    assert extract_page_images(pdf) == [None]


def test_scanned_pdf_embedded_image_feeds_vlm(embedder):
    """End-to-end: image-only PDF + page_describer, NO rasterizer hook —
    the native embedded-image extraction must carry the VLM flow
    (parity: pdf2image rasterize + VLM, utils.py:16-22)."""
    samples = bytes(range(64))
    comp = zlib.compress(samples)
    pdf = build_image_pdf(
        b"<< /Subtype /Image /Width 8 /Height 8 /BitsPerComponent 8 "
        b"/ColorSpace /DeviceGray /Filter /FlateDecode /Length %d >>"
        % len(comp), comp)
    seen = {}

    def describer(img):
        seen["img"] = img
        return "a scanned invoice from ACME Corp"

    col = Collection("user_t", small_config())
    pipe = IngestPipeline(col, embedder, page_describer=describer)
    res = run(pipe.ingest_file("scan.pdf", pdf))
    assert res.failed_tasks == 0 and res.chunks == 1
    assert seen["img"][:8] == b"\x89PNG\r\n\x1a\n"
    row = col.payloads.rows_where(document_id="scan.pdf")[0]
    assert "ACME" in col.payloads.get(row)["text"]


def test_scanned_pdf_image_without_describer_fails(embedder):
    samples = zlib.compress(bytes(range(64)))
    pdf = build_image_pdf(
        b"<< /Subtype /Image /Width 8 /Height 8 /BitsPerComponent 8 "
        b"/ColorSpace /DeviceGray /Filter /FlateDecode /Length %d >>"
        % len(samples), samples)
    col = Collection("user_t", small_config())
    pipe = IngestPipeline(col, embedder)
    res = run(pipe.ingest_file("scan.pdf", pdf))
    assert res.chunks == 0 and res.failed_tasks == 1
