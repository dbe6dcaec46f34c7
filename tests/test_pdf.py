"""M3 PDF extraction: from-scratch FlateDecode + Tj/TJ subset
(reference extract_txt/pdf_mine, app/indexer/pdfparser.py:21-70)."""

import zlib

import pyarrow as pa


def _pdf(payload_streams: list[tuple[bytes, bool]]) -> bytes:
    """Assemble a minimal PDF: [(content_bytes, compress?)] → file bytes."""
    out = [b"%PDF-1.4\n"]
    for i, (content, compress) in enumerate(payload_streams):
        if compress:
            data = zlib.compress(content)
            filt = b" /Filter /FlateDecode"
        else:
            data = content
            filt = b""
        out.append(
            b"%d 0 obj\n<< /Length %d%s >>\nstream\n" % (i + 1, len(data), filt)
        )
        out.append(data)
        out.append(b"\nendstream\nendobj\n")
    out.append(b"%%EOF\n")
    return b"".join(out)


CONTENT = (b"BT /F1 12 Tf (Hello World) Tj T* (second line) Tj ET\n"
           b"BT [(arr) -250 (ay part)] TJ ET")


def test_pdf_text_uncompressed():
    from pears_lite_ray.text.pdf import is_pdf, pdf_text

    doc = _pdf([(CONTENT, False)])
    assert is_pdf(doc)
    t = pdf_text(doc)
    assert "Hello World" in t
    assert "second line" in t
    assert "array part" in t            # TJ array strings concatenate
    assert t.index("Hello") < t.index("second")
    # T* and ET emit line structure
    assert "Hello World\nsecond line" in t


def test_pdf_text_flate_and_escapes():
    from pears_lite_ray.text.pdf import pdf_text

    content = rb"BT (par\(en\) and \\back \101 octal) Tj ET"
    doc = _pdf([(content, True)])
    t = pdf_text(doc)
    assert "par(en) and \\back A octal" in t


def test_pdf_text_multiple_streams_and_hex():
    from pears_lite_ray.text.pdf import pdf_text

    s1 = b"BT (page one) Tj ET"
    s2 = b"BT <706167652074776f> Tj ET"  # 'page two' hex string
    t = pdf_text(_pdf([(s1, True), (s2, False)]))
    assert "page one" in t and "page two" in t
    assert t.index("page one") < t.index("page two")


def test_pdf_text_garbage_is_empty():
    from pears_lite_ray.text.pdf import pdf_text

    assert pdf_text(b"not a pdf at all") == ""
    # unsupported filter → stream skipped, no raise
    doc = (b"%PDF-1.4\n1 0 obj << /Filter /LZWDecode >>\nstream\n"
           b"\x00\x01\x02\nendstream\nendobj\n")
    assert pdf_text(doc) == ""


def test_extract_record_pdf_branch():
    from pears_lite_ray.text.extract import extract_record

    words = ("the quick brown fox jumps over the lazy dog and the rain "
             "in spain falls mainly on the plain with more of the words")
    content = b"BT (" + words.encode() + b") Tj ET"
    doc = _pdf([(content, True)])
    rec = extract_record(doc, ("en",), url="https://x.example/report.pdf")
    assert rec["ok"], rec
    assert rec["title"] == "report.pdf"       # url basename (pdfparser.py:55)
    assert words in rec["body"]
    assert rec["snippet"] == rec["body"][:300]  # no comma replacement
    assert rec["text"].startswith("report.pdf ")


def test_extract_stage_mixes_pdf_and_html(ray_session):
    """A corpus batch with both content types indexes both."""
    import numpy as np

    from pears_lite_ray.stages.extract import ExtractStage

    words = ("the water mill stands by the river and the miller grinds "
             "the grain for all of the village in the morning light")
    pdf_payload = _pdf([(b"BT (" + words.encode() + b") Tj ET", True)])
    html_payload = (
        "<html><head><title>A Page</title></head><body><p>"
        + words + " " + words + "</p></body></html>"
    ).encode()
    batch = pa.table(
        {
            "url": pa.array(
                ["https://a.example/doc.pdf", "https://a.example/page"],
                pa.string(),
            ),
            "warc_ts": pa.array([0, 0], pa.timestamp("us")),
            "html": pa.array([pdf_payload, html_payload], pa.binary()),
        }
    )
    out = ExtractStage(("en",))(batch)
    titles = dict(zip(out["url"].to_pylist(), out["title"].to_pylist()))
    assert titles["https://a.example/doc.pdf"] == "doc.pdf"
    assert titles["https://a.example/page"] == "A Page"
    texts = dict(zip(out["url"].to_pylist(), out["text"].to_pylist()))
    assert words in texts["https://a.example/doc.pdf"]
