"""Regenerates the checked-in document fixtures (run from repo root:
python tests/fixtures/make_fixtures.py). Keeping the generator next to
the binaries documents exactly what they contain."""
import io
import os
import zipfile
import zlib

HERE = os.path.dirname(os.path.abspath(__file__))


def build_pdf(pages, compress=True):
    """Classic-xref PDF, one Helvetica font, FlateDecode contents."""
    objs = {}
    n_pages = len(pages)
    page_nums = [4 + 2 * i for i in range(n_pages)]
    kids = " ".join(f"{n} 0 R" for n in page_nums)
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} "
               f"/Resources << /Font << /F1 3 0 R >> >> >>").encode()
    objs[3] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    for i, content in enumerate(pages):
        raw = zlib.compress(content) if compress else content
        filt = " /Filter /FlateDecode" if compress else ""
        objs[4 + 2 * i] = (f"<< /Type /Page /Parent 2 0 R /Contents "
                           f"{5 + 2 * i} 0 R /MediaBox [0 0 612 792] >>").encode()
        objs[5 + 2 * i] = (f"<< /Length {len(raw)}{filt} >>\nstream\n".encode()
                           + raw + b"\nendstream")
    out = bytearray(b"%PDF-1.4\n")
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
    out += (f"trailer\n<< /Size {n} /Root 1 0 R >>\n"
            f"startxref\n{xref_off}\n%%EOF").encode()
    return bytes(out)


def text_page(lines):
    body = " ".join(
        ("(%s) Tj 0 -14 Td" % ln.replace("\\", r"\\").replace("(", r"\(")
         .replace(")", r"\)")) for ln in lines)
    return f"BT /F1 12 Tf 72 720 Td {body} ET".encode()


DOCX_NS = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'
PPTX_NS = 'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"'


def build_docx(pages):
    """Minimal docx: one <w:p> per line, explicit page breaks between
    `pages` entries."""
    paras = []
    for i, lines in enumerate(pages):
        if i:
            paras.append('<w:p><w:r><w:br w:type="page"/></w:r></w:p>')
        for ln in lines:
            paras.append(f"<w:p><w:r><w:t>{ln}</w:t></w:r></w:p>")
    doc = (f'<?xml version="1.0"?><w:document {DOCX_NS}><w:body>'
           + "".join(paras) + "</w:body></w:document>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml",
                   '<?xml version="1.0"?><Types '
                   'xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>')
        z.writestr("word/document.xml", doc)
    return buf.getvalue()


def build_pptx(slides):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml",
                   '<?xml version="1.0"?><Types '
                   'xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>')
        for i, lines in enumerate(slides, 1):
            paras = "".join(
                f"<a:p><a:r><a:t>{ln}</a:t></a:r></a:p>" for ln in lines)
            z.writestr(f"ppt/slides/slide{i}.xml",
                       f'<?xml version="1.0"?><p:sld '
                       f'xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" '
                       f'{PPTX_NS}><p:cSld><p:spTree><p:sp><p:txBody>{paras}'
                       f"</p:txBody></p:sp></p:spTree></p:cSld></p:sld>")
    return buf.getvalue()


def main():
    pdf = build_pdf([
        text_page(["Orbital mechanics primer, part one.",
                   "Hohmann transfers minimize delta-v."]),
        text_page(["Page two covers launch windows.",
                   "Porkchop plots chart arrival energy."]),
        text_page(["Page three is about aerobraking."]),
    ])
    open(os.path.join(HERE, "sample.pdf"), "wb").write(pdf)

    docx = build_docx([
        ["Quarterly report overview.", "Revenue grew nine percent."],
        ["Second page lists regional results."],
    ])
    open(os.path.join(HERE, "sample.docx"), "wb").write(docx)

    pptx = build_pptx([
        ["Kickoff deck", "Team introductions"],
        ["Roadmap", "Ship the retrieval engine"],
    ])
    open(os.path.join(HERE, "sample.pptx"), "wb").write(pptx)
    print("wrote sample.pdf sample.docx sample.pptx")


if __name__ == "__main__":
    main()
