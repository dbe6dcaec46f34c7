"""Minimal PDF text extraction (M3 ↔ app/indexer/pdfparser.py:21-29).

The reference runs pdfminer's layout analysis and concatenates every
``LTTextContainer.get_text()``. pdfminer is not in this environment, so
this is a from-scratch extractor for the common machine-generated subset:

* objects with ``/FlateDecode`` streams are inflated with stdlib zlib;
  uncompressed streams pass through; any other filter is skipped;
* content streams (those containing a ``BT`` text block) are scanned for
  the text-showing operators ``Tj``, ``'``, ``"`` and ``TJ`` (array form);
  literal strings handle the ``\\``-escapes and nested parentheses of the
  PDF spec, hex strings decode pairwise;
* the line operators ``Td  TD  T*  '  "`` and block end ``ET`` emit
  newlines, approximating pdfminer's per-container line structure.

Documented limitations (deterministic, never raising): no encryption, no
object streams (/ObjStm), no LZW/ASCII85 filters, CID/Type0 fonts decode
as latin-1 bytes (garbage in → garbage out, as with any single-byte
assumption). For the corpora this engine targets — simple generated PDFs
in a crawl — the subset covers the text payload; everything else extracts
as empty and the language gate drops the document, mirroring the
reference's error path (pdfparser.py:50-53 returns empty body on a failed
mine).
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"stream\r?\n", re.DOTALL)
_ESCAPES = {
    ord("n"): "\n", ord("r"): "\r", ord("t"): "\t", ord("b"): "\b",
    ord("f"): "\f", ord("("): "(", ord(")"): ")", ord("\\"): "\\",
}


def is_pdf(payload: bytes) -> bool:
    return payload[:5] == b"%PDF-"


def _iter_streams(payload: bytes):
    """(dict_bytes, stream_bytes) per indirect object with a stream."""
    pos = 0
    while True:
        m = _STREAM_RE.search(payload, pos)
        if not m:
            return
        start = m.end()
        end = payload.find(b"endstream", start)
        if end < 0:
            return
        # the object dictionary sits between the last '<<' run and 'stream'
        head = payload.rfind(b"<<", 0, m.start())
        dict_bytes = payload[head:m.start()] if head >= 0 else b""
        raw = payload[start:end]
        # the EOL before 'endstream' is markup, not stream data — but a
        # compressed stream may legitimately END with 0x0A/0x0D, so prefer
        # the declared /Length and only then strip one EOL
        lm = re.search(rb"/Length\s+(\d+)", dict_bytes)
        if lm and int(lm.group(1)) <= len(raw):
            raw = raw[: int(lm.group(1))]
        elif raw.endswith(b"\r\n"):
            raw = raw[:-2]
        elif raw.endswith((b"\n", b"\r")):
            raw = raw[:-1]
        yield dict_bytes, raw
        pos = end + len(b"endstream")


def _inflate(dict_bytes: bytes, stream: bytes) -> bytes | None:
    if b"/FlateDecode" in dict_bytes:
        try:
            return zlib.decompress(stream)
        except zlib.error:
            return None
    if b"/Filter" in dict_bytes:
        return None  # unsupported filter
    return stream


def _literal_string(data: bytes, i: int) -> tuple[str, int]:
    """Parse a ``(...)`` literal starting at ``data[i] == '('``."""
    out: list[str] = []
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth:
        b = data[i]
        if b == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in _ESCAPES:
                out.append(_ESCAPES[e])
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                j = i
                while j < min(i + 3, n) and 0x30 <= data[j] <= 0x37:
                    j += 1
                out.append(chr(int(data[i:j], 8) & 0xFF))
                i = j
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:
                out.append(chr(e))
                i += 1
        elif b == 0x28:
            depth += 1
            out.append("(")
            i += 1
        elif b == 0x29:
            depth -= 1
            if depth:
                out.append(")")
            i += 1
        else:
            out.append(chr(b))
            i += 1
    return "".join(out), i


def _hex_string(data: bytes, i: int) -> tuple[str, int]:
    end = data.find(b">", i + 1)
    if end < 0:
        return "", len(data)
    hx = re.sub(rb"\s", b"", data[i + 1:end])
    if len(hx) % 2:
        hx += b"0"
    try:
        return bytes.fromhex(hx.decode("ascii")).decode("latin-1"), end + 1
    except ValueError:
        return "", end + 1


_OP_RE = re.compile(rb"[A-Za-z'\"*]+")


def _content_text(data: bytes) -> str:
    """Text-showing scan of one content stream."""
    out: list[str] = []
    pending: list[str] = []   # strings seen since the last operator
    i, n = 0, len(data)
    in_text = False
    while i < n:
        b = data[i]
        if b == 0x28:  # (
            s, i = _literal_string(data, i)
            pending.append(s)
        elif b == 0x3C:  # <
            if i + 1 < n and data[i + 1] == 0x3C:  # << dict
                i += 2
            else:
                s, i = _hex_string(data, i)
                pending.append(s)
        elif (0x41 <= b <= 0x5A) or (0x61 <= b <= 0x7A) or b in (0x27, 0x22, 0x2A):
            m = _OP_RE.match(data, i)
            op = m.group(0)
            i = m.end()
            if op == b"BT":
                in_text = True
                pending.clear()
            elif op == b"ET":
                in_text = False
                if out and not out[-1].endswith("\n"):
                    out.append("\n")
                pending.clear()
            elif in_text:
                if op in (b"Tj", b"TJ"):
                    out.extend(pending)
                elif op == b"'":
                    out.append("\n")
                    out.extend(pending)
                elif op == b'"':
                    out.append("\n")
                    out.extend(pending)
                elif op in (b"Td", b"TD", b"T*"):
                    if out and not out[-1].endswith("\n"):
                        out.append("\n")
                pending.clear()
            else:
                pending.clear()
        else:
            i += 1
    return "".join(out)


def pdf_text(payload: bytes) -> str:
    """Concatenated text of every content stream (page order = stream
    order, matching pdfminer's page loop at pdfparser.py:23-27)."""
    if not is_pdf(payload):
        return ""
    parts: list[str] = []
    for dict_bytes, stream in _iter_streams(payload):
        data = _inflate(dict_bytes, stream)
        if data is None or b"BT" not in data:
            continue
        t = _content_text(data)
        if t:
            parts.append(t)
    return "".join(parts)
