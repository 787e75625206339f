"""Native docx/pptx extraction (ingest/office.py).

Parity surface: markitdown office conversion
(IndexerAPI/src/core/markitdown/markdown_handler.py:9-58) — here
stdlib zip + XML, per-page/per-slide.
"""

import asyncio
import io
import os
import zipfile

import pytest

from rag_application_tpu.config import EncoderConfig
from rag_application_tpu.ingest.office import (
    OfficeError,
    extract_docx_pages,
    extract_pages,
    extract_pptx_pages,
    is_ooxml,
    ooxml_kind,
)
from rag_application_tpu.ingest.pipeline import IngestPipeline
from rag_application_tpu.models.embedder import Embedder
from rag_application_tpu.store.collection import Collection

from fixtures.make_fixtures import build_docx, build_pptx

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


def test_kind_detection():
    docx = build_docx([["hello"]])
    pptx = build_pptx([["hello"]])
    assert is_ooxml(docx) and is_ooxml(pptx)
    assert ooxml_kind(docx) == "docx"
    assert ooxml_kind(pptx) == "pptx"
    assert ooxml_kind(b"plain text") == ""


def test_docx_page_split():
    docx = build_docx([["First page para one.", "Para two."],
                       ["Second page."]])
    pages = extract_docx_pages(docx)
    assert len(pages) == 2
    assert pages[0] == "First page para one.\nPara two."
    assert pages[1] == "Second page."


def test_docx_table_rows():
    w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    doc = (f'<?xml version="1.0"?><w:document xmlns:w="{w}"><w:body>'
           '<w:tbl><w:tr><w:tc><w:p><w:r><w:t>name</w:t></w:r></w:p></w:tc>'
           '<w:tc><w:p><w:r><w:t>age</w:t></w:r></w:p></w:tc></w:tr>'
           '<w:tr><w:tc><w:p><w:r><w:t>ada</w:t></w:r></w:p></w:tc>'
           '<w:tc><w:p><w:r><w:t>36</w:t></w:r></w:p></w:tc></w:tr></w:tbl>'
           "</w:body></w:document>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("word/document.xml", doc)
    pages = extract_docx_pages(buf.getvalue())
    assert pages == ["name\tage\nada\t36"]


def test_docx_nested_table_not_duplicated():
    """A table inside a table cell must appear ONCE (iterating all
    descendants emitted nested rows as sibling rows AND re-walked their
    paragraphs through the outer cell — triplicating the text)."""
    w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    inner = (f'<w:tbl xmlns:w="{w}"><w:tr><w:tc><w:p><w:r>'
             f'<w:t>NESTED</w:t></w:r></w:p></w:tc></w:tr></w:tbl>')
    doc = (f'<w:document xmlns:w="{w}"><w:body>'
           f'<w:tbl><w:tr><w:tc><w:p><w:r><w:t>outer</w:t></w:r></w:p>'
           f'{inner}</w:tc></w:tr></w:tbl>'
           f'</w:body></w:document>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr("word/document.xml", doc)
    pages = extract_docx_pages(buf.getvalue())
    joined = "\n".join(pages)
    assert joined.count("NESTED") == 1, joined
    assert joined.count("outer") == 1


def test_docx_mid_paragraph_page_break_splits_text():
    """Text after an in-paragraph page break belongs to the NEXT page
    (and multiple breaks in one paragraph create multiple pages)."""
    w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    doc = (f'<w:document xmlns:w="{w}"><w:body>'
           f'<w:p><w:r><w:t>end of ch1 </w:t></w:r>'
           f'<w:r><w:br w:type="page"/><w:t>ch2 intro </w:t></w:r>'
           f'<w:r><w:br w:type="page"/><w:t>ch3 intro</w:t></w:r></w:p>'
           f'</w:body></w:document>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr("word/document.xml", doc)
    pages = extract_docx_pages(buf.getvalue())
    assert pages == ["end of ch1", "ch2 intro", "ch3 intro"]


def test_pptx_slide_order():
    pptx = build_pptx([["slide one"], ["slide two"], ["slide three"]])
    pages = extract_pptx_pages(pptx)
    assert pages == ["slide one", "slide two", "slide three"]


def test_pptx_slide_numeric_sort():
    """slide10 must sort after slide9 (numeric, not lexicographic)."""
    pptx = build_pptx([[f"slide {i}"] for i in range(1, 12)])
    pages = extract_pptx_pages(pptx)
    assert pages[8] == "slide 9"
    assert pages[9] == "slide 10"


def test_bad_zip_raises():
    with pytest.raises(OfficeError):
        extract_docx_pages(b"PK\x03\x04garbage")
    with pytest.raises(OfficeError):
        extract_pages(b"PK\x03\x04garbage" + b"\x00" * 100)


# ------------------------------------------------------ pipeline wiring

@pytest.fixture(scope="module")
def embedder():
    return Embedder(cfg=TINY, batch_size=4, max_len=32)


def test_fixture_docx_end_to_end(embedder):
    data = open(os.path.join(FIXTURES, "sample.docx"), "rb").read()
    col = Collection("user_t", small_config())
    pipe = IngestPipeline(col, embedder)
    res = asyncio.run(pipe.ingest_file("sample.docx", data))
    assert res.failed_tasks == 0 and res.pages == 2
    rows = col.payloads.rows_where(document_id="sample.docx")
    texts = {col.payloads.get(r)["page_number"]: col.payloads.get(r)["text"]
             for r in rows}
    assert "Revenue grew nine percent" in texts[1]
    assert "regional results" in texts[2]


def test_fixture_pptx_end_to_end(embedder):
    data = open(os.path.join(FIXTURES, "sample.pptx"), "rb").read()
    col = Collection("user_t", small_config())
    pipe = IngestPipeline(col, embedder)
    res = asyncio.run(pipe.ingest_file("sample.pptx", data))
    assert res.failed_tasks == 0 and res.pages == 2
    rows = col.payloads.rows_where(document_id="sample.pptx")
    texts = [col.payloads.get(r)["text"] for r in rows]
    assert any("retrieval engine" in t for t in texts)


def test_real_reference_fixtures_if_present():
    docx_path = "/root/reference/IndexerAPI/pre-tests/Vivek Malipatel - Resume.docx"
    pptx_path = "/root/reference/IndexerAPI/pre-tests/Intro To ML - Slide.pptx"
    if not (os.path.exists(docx_path) and os.path.exists(pptx_path)):
        pytest.skip("reference fixtures unavailable")
    docx_pages = extract_pages(open(docx_path, "rb").read())
    assert len(docx_pages) >= 2
    assert any("EDUCATION" in p for p in docx_pages)
    pptx_pages = extract_pages(open(pptx_path, "rb").read())
    assert len(pptx_pages) == 21
