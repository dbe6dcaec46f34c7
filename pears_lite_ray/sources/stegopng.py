"""Steganographic CSV-in-PNG pod reader (SURVEY S8 ↔ reference
``app/pod_finder/index_pod_file.py:24-40`` ``convert_img_to_csv`` +
``parse_line``).

Reference semantics: a shared pod file is a PNG whose pixels carry one
character each — ``chr((255-r) + (255-g) + (255-b))`` — with the LAST
pixel reserved (transparency marker, discarded). The decoded text is a
';'-delimited CSV; ``parse_line`` reads per row
``fields[1]=url, [2]=title, [3]=snippet, [4]=vector, [5]=freqs,
[6]=cc ("True"/other)``.

The reference decodes with PIL (absent in this environment), so the PNG
container itself is (de)serialized here from the published spec with
stdlib ``zlib`` + ``struct``: 8-bit RGB/RGBA, scanline filters 0-4 on
read, filter 0 on write. Decode is vectorized numpy (one pass per filter
row, one ``255*3 - (r+g+b)`` kernel for the payload) — a shared pod image
is small (one row per shared url), so this is a driver-side source like
csvdocs; the downstream indexing pipeline stays distributed.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def write_png_rgb(path: str, pixels: np.ndarray) -> None:
    """Minimal PNG writer: ``pixels`` is (h, w, 3) uint8, filter 0 rows."""
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    with open(path, "wb") as f:
        f.write(_PNG_SIG)
        f.write(_chunk(b"IHDR", ihdr))
        f.write(_chunk(b"IDAT", zlib.compress(raw, 9)))
        f.write(_chunk(b"IEND", b""))


def _unfilter(raw: bytes, w: int, h: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering → (h, w*bpp) uint8."""
    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1)
        pos += 1 + stride
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:  # None
            out[y] = line
        elif ftype == 2:  # Up
            out[y] = line + prev
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: left-dependent scan
            cur = out[y]
            cur[:] = line
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                if ftype == 1:
                    cur[x] = (cur[x] + a) & 0xFF
                elif ftype == 3:
                    cur[x] = (cur[x] + ((a + b) >> 1)) & 0xFF
                else:
                    c = int(out[y - 1][x - bpp]) if (x >= bpp and y) else 0
                    p = a + b - c
                    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
                    cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"unsupported PNG filter {ftype}")
    return out


def read_png_pixels_bytes(data: bytes) -> np.ndarray:
    """(h, w, channels) uint8 for an 8-bit grayscale (type 0), RGB (type 2)
    or RGBA (type 6) PNG, decoded from an in-memory buffer."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG file")
    pos, w = 8, 0
    idat = bytearray()
    h = bit_depth = color_type = 0
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type = struct.unpack_from(">IIBB", payload)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if bit_depth != 8 or color_type not in (0, 2, 6):
        raise ValueError(f"unsupported PNG (depth={bit_depth}, type={color_type})")
    bpp = {0: 1, 2: 3, 6: 4}[color_type]
    flat = _unfilter(zlib.decompress(bytes(idat)), w, h, bpp)
    return flat.reshape(h, w, bpp)


def read_png_pixels(path: str) -> np.ndarray:
    """(h, w, channels) uint8 for an 8-bit PNG file (see the bytes variant)."""
    with open(path, "rb") as f:
        return read_png_pixels_bytes(f.read())


def encode_png_bytes(pixels: np.ndarray) -> bytes:
    """In-memory PNG encoder: (h, w) uint8 → 8-bit grayscale (type 0),
    (h, w, 3) uint8 → 8-bit RGB (type 2); filter-0 scanlines."""
    if pixels.ndim == 2:
        color_type, h, w = 0, pixels.shape[0], pixels.shape[1]
    elif pixels.ndim == 3 and pixels.shape[2] == 3:
        color_type, h, w = 2, pixels.shape[0], pixels.shape[1]
    else:
        raise ValueError("expected (h, w) gray or (h, w, 3) RGB uint8")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    return (_PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, 9)) + _chunk(b"IEND", b""))


def decode_stego_csv(path: str) -> str:
    """PNG → CSV text, the reference's pixels→chars loop vectorized:
    per pixel ``chr(765 - r - g - b)``; the last pixel is discarded."""
    px = read_png_pixels(path)[:, :, :3]
    vals = 765 - px.reshape(-1, 3).astype(np.int64).sum(axis=1)
    return "".join(chr(int(v)) for v in vals[:-1])


def encode_stego_csv(path: str, text: str, width: int = 256) -> None:
    """Inverse of :func:`decode_stego_csv` (the orchard-side sharer): each
    char becomes one RGB pixel with ``(255-r)+(255-g)+(255-b) == ord(c)``
    (codepoints ≤ 765), a final reserved pixel is appended, and rows are
    padded with ``'\\n'`` (blank CSV lines, skipped by the parser)."""
    codes = [ord(c) for c in text]
    if any(c > 765 for c in codes):
        raise ValueError("stego PNG carries codepoints ≤ 765 only")
    w = min(width, len(codes) + 1)
    h = -(-(len(codes) + 1) // w)
    pad = w * h - 1 - len(codes)
    codes += [ord("\n")] * pad
    arr = np.zeros((w * h, 3), dtype=np.uint8)
    c = np.array(codes + [0], dtype=np.int64)  # reserved pixel decodes to NUL
    arr[:, 0] = 255 - np.minimum(c, 255)
    c = np.maximum(c - 255, 0)
    arr[:, 1] = 255 - np.minimum(c, 255)
    arr[:, 2] = 255 - np.maximum(c - 255, 0)
    write_png_rgb(path, arr.reshape(h, w, 3))


def parse_pod_csv(text: str) -> pa.Table:
    """';'-CSV rows → (url, title, snippet, vector, freqs, cc) — the
    reference's ``parse_line`` field layout; blank lines are padding."""
    cols: dict[str, list] = {k: [] for k in
                             ("url", "title", "snippet", "vector", "freqs")}
    cc: list[bool] = []
    for line in text.split("\n"):
        if not line.strip():
            continue
        fields = line.split(";")
        if len(fields) < 7:
            raise ValueError(f"pod CSV row needs 7 fields, got {len(fields)}")
        cols["url"].append(fields[1])
        cols["title"].append(fields[2])
        cols["snippet"].append(fields[3])
        cols["vector"].append(fields[4])
        cols["freqs"].append(fields[5])
        cc.append(fields[6] == "True")
    out = {k: pa.array(v, pa.string()) for k, v in cols.items()}
    out["cc"] = pa.array(cc, pa.bool_())
    return pa.table(out)


def stego_to_docs(path: str, lang: str = "en") -> pa.Table:
    """Decoded pod rows as corpus-schema documents (url, warc_ts, title,
    text, lang, doctype) ready for the indexing pipeline — text is the
    shared snippet (the reference stores ``snippet=title`` on import,
    pod_finder/controllers.py:126-128, keeping whatever the CSV carried)."""
    t = parse_pod_csv(decode_stego_csv(path))
    n = t.num_rows
    return pa.table(
        {
            "url": t["url"],
            "warc_ts": pa.array([0] * n, pa.timestamp("us")),
            "title": t["title"],
            "text": t["snippet"],
            "lang": pa.array([lang] * n, pa.string()),
            "doctype": pa.array(["pod"] * n, pa.string()),
        }
    )


def read_stego_docs(path: str, lang: str = "en"):
    """→ ray.data.Dataset of document rows (driver-side decode like the
    csvdocs source; a pod share is one small image)."""
    import ray.data as rd

    return rd.from_arrow(stego_to_docs(path, lang))
