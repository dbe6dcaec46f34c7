"""Posting-list compression: delta + varbyte, with block-max metadata.

Replaces the reference's pickled dict-of-pipe-strings positional index
(``app/indexer/posix.py:5-28``; positions stored as ``"p1|p2|..."`` strings)
with compressed byte streams. All encode/decode paths are vectorized numpy —
no per-integer Python loops (the loops below are over *byte positions*,
bounded by 10).

Varbyte convention: little-endian 7-bit groups; MSB set = continuation,
final byte has MSB clear.

Block layout (block-max WAND): postings are cut into blocks of
``block_size``; each block re-bases its first doc_id (stored as a delta from
0) so blocks decode independently; per block we keep
``(last_doc, max_score, doc_off, tf_off, n)`` where ``max_score`` is the
exact maximum BM25 term score within the block (computed at encode time from
tf, doclen, df, N, avgdl).
"""

from __future__ import annotations

import numpy as np

_THRESHOLDS = [1 << (7 * k) for k in range(1, 10)]  # 2^7 .. 2^63


def varbyte_encode(values: np.ndarray) -> bytes:
    """Encode a uint64 array to varbyte bytes (vectorized)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    nb = np.ones(v.shape, dtype=np.int64)
    for t in _THRESHOLDS:
        nb += v >= t
    ends = np.cumsum(nb)
    total = int(ends[-1])
    out = np.zeros(total, dtype=np.uint8)
    starts = ends - nb
    rem = v.copy()
    active = np.arange(v.size)
    j = 0
    while active.size:
        idx = starts[active] + j
        byte = (rem[active] & np.uint64(0x7F)).astype(np.uint8)
        cont = (j + 1) < nb[active]
        out[idx] = byte | (cont.astype(np.uint8) << 7)
        rem[active] = rem[active] >> np.uint64(7)
        active = active[cont]
        j += 1
    return out.tobytes()


def varbyte_decode(buf: bytes | memoryview | np.ndarray, count: int | None = None) -> np.ndarray:
    """Decode varbyte bytes → uint64 array (vectorized)."""
    arr = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if arr.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.nonzero(arr < 128)[0]
    if count is not None:
        ends = ends[:count]
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    vals = np.zeros(ends.size, dtype=np.uint64)
    maxlen = int(lengths.max())
    for j in range(maxlen):
        mask = lengths > j
        idx = starts[mask] + j
        vals[mask] |= (arr[idx].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * j)
    return vals


def delta_encode(sorted_vals: np.ndarray) -> np.ndarray:
    """Strictly-increasing int array → gaps (first value kept absolute)."""
    v = np.ascontiguousarray(sorted_vals, dtype=np.uint64)
    if v.size == 0:
        return v
    out = np.empty_like(v)
    out[0] = v[0]
    np.subtract(v[1:], v[:-1], out=out[1:])
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(gaps, dtype=np.uint64)


def bm25_idf(df: np.ndarray | float, n_docs: float) -> np.ndarray | float:
    """Lucene-style BM25 idf: ln(1 + (N - df + 0.5)/(df + 0.5))."""
    return np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_tf_norm(tf, doclen, avgdl, k1, b):
    """tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) — float64."""
    tf = np.asarray(tf, dtype=np.float64)
    doclen = np.asarray(doclen, dtype=np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * doclen / avgdl))


def encode_posting_list(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    doclens: np.ndarray,
    *,
    df_total: int,
    n_docs: int,
    avgdl: float,
    k1: float,
    b: float,
    block_size: int,
    positions: list[np.ndarray] | None = None,
) -> dict:
    """Encode one term's postings (sorted by doc_id) into segment columns.

    Returns dict with: df, cf, doc_bytes, tf_bytes, pos_bytes,
    block_last_doc, block_max_score, block_doc_off, block_tf_off, block_n.
    ``df_total`` is the term's global df (may exceed len(doc_ids) when a
    salted sub-list is being encoded — the caller passes the true df so
    max_score bounds stay correct).
    """
    n = int(doc_ids.size)
    idf = float(bm25_idf(float(df_total), float(n_docs)))
    scores = idf * bm25_tf_norm(tfs, doclens, avgdl, k1, b)

    doc_chunks: list[bytes] = []
    tf_chunks: list[bytes] = []
    blast, bmax, bdoc, btf, bn = [], [], [], [], []
    doc_off = 0
    tf_off = 0
    for s in range(0, n, block_size):
        e = min(s + block_size, n)
        gaps = delta_encode(doc_ids[s:e])
        db = varbyte_encode(gaps)
        tb = varbyte_encode(tfs[s:e].astype(np.uint64))
        doc_chunks.append(db)
        tf_chunks.append(tb)
        blast.append(int(doc_ids[e - 1]))
        bmax.append(float(scores[s:e].max()))
        bdoc.append(doc_off)
        btf.append(tf_off)
        bn.append(e - s)
        doc_off += len(db)
        tf_off += len(tb)

    pos_bytes = b""
    if positions is not None:
        # stream: per posting varbyte(npos) then varbyte(delta(positions))
        parts: list[np.ndarray] = []
        for p in positions:
            p = np.ascontiguousarray(p, dtype=np.uint64)
            parts.append(np.array([p.size], dtype=np.uint64))
            if p.size:
                parts.append(delta_encode(p))
        pos_bytes = varbyte_encode(np.concatenate(parts)) if parts else b""

    return {
        "df": n,
        "cf": int(tfs.sum()),
        "doc_bytes": b"".join(doc_chunks),
        "tf_bytes": b"".join(tf_chunks),
        "pos_bytes": pos_bytes,
        "block_last_doc": blast,
        "block_max_score": bmax,
        "block_doc_off": bdoc,
        "block_tf_off": btf,
        "block_n": bn,
    }


def decode_posting_list(row: dict) -> tuple[np.ndarray, np.ndarray]:
    """Decode a full posting list row → (doc_ids, tfs), both sorted by doc."""
    doc_arr = np.frombuffer(row["doc_bytes"], dtype=np.uint8)
    tf_arr = np.frombuffer(row["tf_bytes"], dtype=np.uint8)
    offs_d = list(row["block_doc_off"]) + [doc_arr.size]
    offs_t = list(row["block_tf_off"]) + [tf_arr.size]
    docs_out, tfs_out = [], []
    for i in range(len(row["block_n"])):
        gaps = varbyte_decode(doc_arr[offs_d[i]:offs_d[i + 1]])
        docs_out.append(delta_decode(gaps))
        tfs_out.append(varbyte_decode(tf_arr[offs_t[i]:offs_t[i + 1]]))
    return (
        np.concatenate(docs_out).astype(np.int64),
        np.concatenate(tfs_out).astype(np.int64),
    )


def decode_block(row: dict, i: int) -> tuple[np.ndarray, np.ndarray]:
    """Decode block ``i`` only (independent of other blocks)."""
    doc_arr = np.frombuffer(row["doc_bytes"], dtype=np.uint8)
    tf_arr = np.frombuffer(row["tf_bytes"], dtype=np.uint8)
    offs_d = list(row["block_doc_off"]) + [doc_arr.size]
    offs_t = list(row["block_tf_off"]) + [tf_arr.size]
    gaps = varbyte_decode(doc_arr[offs_d[i]:offs_d[i + 1]])
    tfs = varbyte_decode(tf_arr[offs_t[i]:offs_t[i + 1]])
    return delta_decode(gaps).astype(np.int64), tfs.astype(np.int64)


def decode_positions(pos_bytes: bytes, df: int) -> list[np.ndarray]:
    """Decode the positions stream → one int64 array per posting."""
    if not pos_bytes:
        return []
    flat = varbyte_decode(pos_bytes)
    out: list[np.ndarray] = []
    i = 0
    for _ in range(df):
        npos = int(flat[i]); i += 1
        out.append(np.cumsum(flat[i:i + npos], dtype=np.uint64).astype(np.int64))
        i += npos
    return out
