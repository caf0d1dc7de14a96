"""Minimal deterministic PDF text extraction — stdlib only (X4).

pdfminer-style layout analysis, re-specified from scratch for the
subset of PDFs our corpus contains (generator-produced and simple
fixtures): text objects with Tf/Td/TD/Tm/Tj/TJ/' operators inside
(optionally FlateDecode-compressed) content streams.

Reading-order reconstruction: each text-showing operator is stamped
with its current (x, y); glyph runs are clustered into lines by
y-proximity, lines sorted top-down (descending y — PDF y grows up),
runs within a line sorted left-to-right, lines grouped into blocks by
vertical gap. Pure function of the input bytes.
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)
_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj(.*?)endobj", re.DOTALL)

# text operators within a decoded content stream
_TOKEN_RE = re.compile(
    rb"""
    (?P<str>\((?:\\.|[^()\\])*\))      # literal string
  | (?P<hex><[0-9A-Fa-f\s]*>)         # hex string
  | (?P<num>[-+]?\d*\.?\d+)
  | (?P<op>[A-Za-z]{1,3}\*?|'|"|\[|\])
    """,
    re.VERBOSE,
)

_ESCAPES = {
    b"n": "\n", b"r": "\r", b"t": "\t", b"b": "\b", b"f": "\f",
    b"(": "(", b")": ")", b"\\": "\\",
}


def _decode_pdf_string(raw: bytes) -> str:
    out = []
    i = 0
    body = raw[1:-1]
    while i < len(body):
        c = body[i : i + 1]
        if c == b"\\" and i + 1 < len(body):
            nxt = body[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                i += 2
                continue
            if nxt.isdigit():  # octal escape
                oct_digits = body[i + 1 : i + 4]
                m = re.match(rb"[0-7]{1,3}", oct_digits)
                if m:
                    out.append(chr(int(m.group(), 8)))
                    i += 1 + len(m.group())
                    continue
            i += 1
            continue
        out.append(c.decode("latin-1"))
        i += 1
    return "".join(out)


def _iter_content_streams(data: bytes):
    for m in _STREAM_RE.finditer(data):
        body = m.group(1)
        # look back for the dict header to detect FlateDecode
        header_start = data.rfind(b"<<", 0, m.start())
        header = data[header_start : m.start()] if header_start != -1 else b""
        if b"FlateDecode" in header:
            try:
                body = zlib.decompress(body)
            except zlib.error:
                continue
        if b"BT" in body or b"Tj" in body or b"TJ" in body:
            yield body


def _runs_from_stream(stream: bytes):
    """Yield (x, y, text) runs from one content stream."""
    _pending: list[str] = []
    x = y = 0.0
    tlx = tly = 0.0  # text-line start (for T*)
    leading = 12.0
    stack: list[float] = []
    in_array = False
    for m in _TOKEN_RE.finditer(stream):
        if m.group("num") is not None:
            stack.append(float(m.group("num")))
            continue
        if m.group("str") is not None or m.group("hex") is not None:
            if m.group("str") is not None:
                txt = _decode_pdf_string(m.group("str"))
            else:
                hx = re.sub(rb"\s", b"", m.group("hex"))[1:-1]
                if len(hx) % 2:
                    hx += b"0"
                txt = bytes.fromhex(hx.decode("ascii")).decode("latin-1")
            if in_array:
                yield (x, y, txt)
            else:
                _pending.append(txt)
            continue
        op = m.group("op").decode("latin-1")
        if op == "[":
            in_array = True
            stack.clear()
            continue
        if op == "]":
            continue
        if op == "TJ":
            in_array = False
            stack.clear()
            _pending.clear()
            continue
        if op in ("Td", "TD"):
            if len(stack) >= 2:
                tx, ty = stack[-2], stack[-1]
                tlx += tx
                tly += ty
                x, y = tlx, tly
                if op == "TD":
                    leading = -ty if ty else leading
            stack.clear()
            _pending.clear()
            continue
        if op == "Tm":
            if len(stack) >= 6:
                tlx, tly = stack[-2], stack[-1]
                x, y = tlx, tly
            stack.clear()
            _pending.clear()
            continue
        if op == "TL":
            if stack:
                leading = stack[-1]
            stack.clear()
            continue
        if op == "T*":
            tly -= leading
            x, y = tlx, tly
            stack.clear()
            _pending.clear()
            continue
        if op in ("Tj", "'", '"'):
            if op in ("'", '"'):
                tly -= leading
                x, y = tlx, tly
            if _pending:
                yield (x, y, _pending[-1])
            stack.clear()
            _pending.clear()
            continue
        if op == "BT":
            x = y = tlx = tly = 0.0
            stack.clear()
            _pending.clear()
            continue
        # any other operator consumes its operands
        stack.clear()
        if op not in ("Tf",):
            _pending.clear()


def extract_pdf(data: bytes) -> tuple[str, list[tuple[int, int, str]]]:
    """Extract text + spans from PDF bytes (see module docstring)."""
    runs: list[tuple[float, float, int, str]] = []
    page_no = 0
    for stream in _iter_content_streams(data):
        for x, y, txt in _runs_from_stream(stream):
            if txt.strip():
                runs.append((x, y, page_no, txt))
        page_no += 1
    if not runs:
        return "", []
    # cluster into lines: same page, |Δy| <= 2
    runs.sort(key=lambda r: (r[2], -r[1], r[0]))
    lines: list[list[tuple[float, float, str]]] = []
    cur_line: list[tuple[float, float, str]] = []
    cur_y = None
    cur_page = None
    line_meta: list[tuple[int, float]] = []
    for x, y, p, txt in runs:
        if cur_y is None or p != cur_page or abs(y - cur_y) > 2.0:
            if cur_line:
                lines.append(cur_line)
                line_meta.append((cur_page, cur_y))
            cur_line = []
            cur_y, cur_page = y, p
        cur_line.append((x, y, txt))
    if cur_line:
        lines.append(cur_line)
        line_meta.append((cur_page, cur_y))
    # blocks: consecutive lines with vertical gap <= 1.8 * median gap
    texts = []
    for ln in lines:
        ln.sort(key=lambda r: r[0])
        texts.append(" ".join(t for _, _, t in ln).strip())
    gaps = []
    for i in range(1, len(lines)):
        if line_meta[i][0] == line_meta[i - 1][0]:
            gaps.append(abs(line_meta[i - 1][1] - line_meta[i][1]))
    # lower median: with few gaps, bias toward the line leading so a
    # single large block gap still splits
    med_gap = sorted(gaps)[(len(gaps) - 1) // 2] if gaps else 14.0
    blocks: list[str] = []
    cur: list[str] = []
    for i, t in enumerate(texts):
        if i > 0:
            new_block = line_meta[i][0] != line_meta[i - 1][0] or abs(
                line_meta[i - 1][1] - line_meta[i][1]
            ) > 1.8 * max(med_gap, 1.0)
            if new_block and cur:
                blocks.append(" ".join(cur))
                cur = []
        cur.append(t)
    if cur:
        blocks.append(" ".join(cur))
    out_parts: list[str] = []
    spans: list[tuple[int, int, str]] = []
    pos = 0
    for b in blocks:
        b = " ".join(b.split())
        if not b:
            continue
        if out_parts:
            pos += 2
        start = pos
        pos += len(b)
        out_parts.append(b)
        spans.append((start, pos, "para"))
    return "\n\n".join(out_parts), spans


def is_pdf(data: bytes) -> bool:
    return data[:5] == b"%PDF-"
