"""Content-based file type detection (parity: python-magic 2KB sniff,
file_processor.py:60-64; magika, IndexerAPI utils.py:68-79)."""

import io
import zipfile

from rag_application_tpu.ingest.filetype import detect_mime
from rag_application_tpu.ingest.pipeline import classify_file


def _zip_with(*names):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for n in names:
            z.writestr(n, b"x")
    return buf.getvalue()


def test_magic_numbers():
    assert detect_mime(b"%PDF-1.7 rest") == "application/pdf"
    assert detect_mime(b"\x89PNG\r\n\x1a\nxxxx") == "image/png"
    assert detect_mime(b"\xff\xd8\xff\xe0junk") == "image/jpeg"
    assert detect_mime(b"GIF89a....") == "image/gif"
    assert detect_mime(b"PAR1....") == "application/x-parquet"
    assert detect_mime(b"\x00" * 100) == "application/octet-stream"


def test_riff_and_mp4():
    assert detect_mime(b"RIFF\x00\x00\x00\x00WEBPVP8 ") == "image/webp"
    assert detect_mime(b"RIFF\x00\x00\x00\x00WAVEfmt ") == "audio/wav"
    assert detect_mime(b"\x00\x00\x00\x18ftypmp42more") == "video/mp4"


def test_ooxml_zip_refinement():
    xlsx = _zip_with("[Content_Types].xml", "xl/workbook.xml")
    docx = _zip_with("[Content_Types].xml", "word/document.xml")
    assert "spreadsheetml" in detect_mime(xlsx)
    assert "wordprocessingml" in detect_mime(docx)
    assert detect_mime(_zip_with("random.bin")) == "application/zip"


def test_text_heuristics():
    assert detect_mime(b'{"a": 1}') == "application/json"
    assert detect_mime(b"<html><body>x</body></html>") == "text/html"
    assert detect_mime(b"a,b,c\n1,2,3\n4,5,6\n") == "text/csv"
    assert detect_mime(b"# Title\n\nbody text") == "text/markdown"
    assert detect_mime(b"plain words here\nand more\n") == "text/plain"


def test_classify_uses_content_mime():
    """No useful extension -> content decides the route."""
    assert classify_file("blob", detect_mime(b"%PDF-1.4")) == "unstructured"
    assert classify_file("blob", detect_mime(b"a,b\n1,2\n3,4\n")) == "structured"
    assert classify_file("blob", detect_mime(b"\x89PNG\r\n\x1a\n")) == "image"
    assert classify_file("blob", detect_mime(b"ID3\x03tag")) == "media"
    assert classify_file("blob", detect_mime(b"just some words")) == "direct"
    # extension still wins when present
    assert classify_file("notes.txt", "application/pdf") == "direct"


def test_pipeline_routes_sniffed_csv(tmp_path):
    import asyncio

    from rag_application_tpu.config import IngestConfig, KGConfig
    from rag_application_tpu.ingest.pipeline import IngestPipeline
    from rag_application_tpu.kg.store import KGStore
    from rag_application_tpu.models.embedder import Embedder
    from rag_application_tpu.store.collection import Collection

    from test_ingest import TINY, small_config

    col = Collection("t", small_config())
    emb = Embedder(cfg=TINY, batch_size=4, max_len=32)
    kg = KGStore(KGConfig(max_degree=8), dim=32)
    pipe = IngestPipeline(col, emb, kg=kg,
                          config=IngestConfig(chunk_chars=200,
                                              max_concurrency=4))
    # extensionless upload, CSV content -> structured route
    res = asyncio.run(pipe.ingest_file("upload-42", b"name,age\nalice,30\nbob,25\n",
                                       document_id="sniffed"))
    rows = col.payloads.rows_where(document_id="sniffed")
    assert rows and col.payloads.get(rows[0])["source"] == "structured"
    assert res.failed_tasks == 0


def test_weak_magic_vs_text():
    """Ambiguous 2-3 byte prefixes must not hijack ordinary text."""
    assert detect_mime(b"BM25 scoring notes for the sparse index\n") == "text/plain"
    assert detect_mime(b"ID3 tags explained\nand more text\n") == "text/plain"
    # real binary payloads with those prefixes still detect
    assert detect_mime(b"BM" + bytes(range(64))) == "image/bmp"
    assert detect_mime(b"ID3\x03\x00" + bytes(64)) == "audio/mpeg"


def test_octet_stream_does_not_suppress_sniffing(tmp_path):
    import asyncio

    from rag_application_tpu.config import IngestConfig
    from rag_application_tpu.ingest.pipeline import IngestPipeline
    from rag_application_tpu.models.embedder import Embedder
    from rag_application_tpu.store.collection import Collection

    from test_ingest import TINY, small_config

    col = Collection("t2", small_config())
    emb = Embedder(cfg=TINY, batch_size=4, max_len=32)
    pipe = IngestPipeline(col, emb, config=IngestConfig(chunk_chars=200,
                                                        max_concurrency=4))
    res = asyncio.run(pipe.ingest_file(
        "blob", b"name,age\nalice,30\nbob,25\n", document_id="oct",
        mime="application/octet-stream"))
    rows = col.payloads.rows_where(document_id="oct")
    assert rows and col.payloads.get(rows[0])["source"] == "structured"
    assert res.failed_tasks == 0


def test_sniffed_tsv_parses_columns(tmp_path):
    import asyncio

    from rag_application_tpu.config import IngestConfig, KGConfig
    from rag_application_tpu.ingest.pipeline import IngestPipeline
    from rag_application_tpu.kg.store import KGStore
    from rag_application_tpu.models.embedder import Embedder
    from rag_application_tpu.store.collection import Collection

    from test_ingest import TINY, small_config

    col = Collection("t3", small_config())
    emb = Embedder(cfg=TINY, batch_size=4, max_len=32)
    kg = KGStore(KGConfig(max_degree=8), dim=32)
    pipe = IngestPipeline(col, emb, kg=kg,
                          config=IngestConfig(chunk_chars=200,
                                              max_concurrency=4))
    res = asyncio.run(pipe.ingest_file(
        "export", b"name\tage\nalice\t30\nbob\t25\n", document_id="tsv"))
    assert res.failed_tasks == 0
    # both columns made it into the KG (sep=',' would yield one column)
    assert kg.stats()["column"] == 2
