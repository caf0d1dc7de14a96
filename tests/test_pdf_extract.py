"""PDF branch (X4) unit tests: text-object parsing, Flate streams,
line/block reconstruction, reading order, escapes."""

import zlib

from neurostore_text_extraction_spark.functions.pdf_extract import extract_pdf, is_pdf
from neurostore_text_extraction_spark.sources.pages import generate_row


def _pdf(content: bytes, flate: bool = False) -> bytes:
    if flate:
        body = zlib.compress(content)
        filt = b" /Filter /FlateDecode"
    else:
        body, filt = content, b""
    return (
        b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(body)).encode() + filt
        + b" >>\nstream\n" + body + b"\nendstream\nendobj\ntrailer\n%%EOF\n"
    )


def test_is_pdf():
    assert is_pdf(b"%PDF-1.4 ...")
    assert not is_pdf(b"<html>")


def test_simple_lines_and_blocks():
    content = (
        b"BT /F1 12 Tf\n"
        b"1 0 0 1 72 740 Tm (First line of block one.) Tj\n"
        b"1 0 0 1 72 726 Tm (Second line of block one.) Tj\n"
        b"1 0 0 1 72 684 Tm (Block two starts here.) Tj\n"  # 42pt gap
        b"ET"
    )
    text, spans = extract_pdf(_pdf(content))
    assert text == (
        "First line of block one. Second line of block one."
        "\n\nBlock two starts here."
    )
    assert [k for _, _, k in spans] == ["para", "para"]


def test_flate_stream():
    content = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (Compressed hello world.) Tj ET"
    text, _ = extract_pdf(_pdf(content, flate=True))
    assert text == "Compressed hello world."


def test_reading_order_out_of_stream_order():
    # emitted bottom-up in the stream; must come out top-down
    content = (
        b"BT /F1 12 Tf\n"
        b"1 0 0 1 72 600 Tm (bottom line) Tj\n"
        b"1 0 0 1 72 700 Tm (top line) Tj\n"
        b"ET"
    )
    text, _ = extract_pdf(_pdf(content))
    assert text.index("top line") < text.index("bottom line")


def test_escapes_and_td_t_star():
    content = (
        b"BT /F1 12 Tf 14 TL 1 0 0 1 72 700 Tm (Paren \\(inside\\) kept) Tj\n"
        b"T* (next line via T-star) '\n"
        b"ET"
    )
    text, _ = extract_pdf(_pdf(content))
    assert "Paren (inside) kept" in text
    assert "next line via T-star" in text


def test_generator_pdf_goldens():
    n = 0
    for i in range(500):
        r = generate_row(i)
        if r["golden_kind"] != "pdf":
            continue
        n += 1
        text, spans = extract_pdf(r["html"])
        assert text == r["golden_text"]
    assert n > 5


def test_truncated_pdf_no_crash():
    text, spans = extract_pdf(b"%PDF-1.4 truncated nonsense")
    assert text == "" and spans == []
