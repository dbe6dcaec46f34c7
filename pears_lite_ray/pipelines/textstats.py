"""Text-analysis operators over ``documents`` (training-data pipeline set).

* quality     — per-doc quality metrics (token counts, type/token ratio,
                stopword ratio, mean token length). SQL-oracle-checked.
* token_count — whitespace + BPE-ish regex token counts. SQL-oracle-checked.
* langid      — n-gram/stopword-heuristic language ID. Rows-only (the
                heuristic tables aren't SQL).
* fingerprint — winnowing document fingerprint (rolling hash, window
                minima). Rows-only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .common import SQL_STOPWORDS, SQL_TOKENS, STOPWORDS, read_documents, round6, tokens_per_row

# BPE-ish subtoken splitter: runs of letters, digits, or a single other
# non-space char — SQL-expressible with regexp_extract_all.
BPE_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

FP_WINDOW = 4
FP_NGRAM = 3

_STOPSET = frozenset(STOPWORDS)

# tiny per-language stopword tables for the heuristic language scorer
# (analog of the reference's per-language stopword files,
# app/static/ling/stopwords/*; langdetect gate at htmlparser.py:105-108)
_LANG_MARKERS = {
    "en": frozenset("the and of to in is was for with that this from are be not".split()),
    "de": frozenset("und der die das ist nicht mit von auf für eine wird nach bei".split()),
    "fr": frozenset("le la les et des une dans pour sur avec est que qui pas".split()),
    "es": frozenset("el la los las y de en que por con para una es del no".split()),
}


def q_quality(sf_dir: str):
    """Quality-score components per doc (vectorizable per batch)."""

    def score(batch: pa.Table) -> pa.Table:
        toks, counts = tokens_per_row(batch)
        texts = batch["text"].to_pylist()
        n_types, n_stop, tok_chars = [], [], []
        for words in toks:
            n_types.append(len(set(words)))
            n_stop.append(sum(1 for w in words if w in _STOPSET))
            tok_chars.append(sum(len(w) for w in words))
        n_tokens = counts.astype(np.float64)
        safe = np.maximum(n_tokens, 1.0)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
                "n_tokens": pa.array(counts, pa.int64()),
                "n_types": pa.array(n_types, pa.int64()),
                "stop_ratio": pa.array(
                    round6(np.array(n_stop, np.float64) / safe), pa.float64()
                ),
                "mean_token_len": pa.array(
                    round6(np.array(tok_chars, np.float64) / safe), pa.float64()
                ),
            }
        )

    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


def q_token_count(sf_dir: str):
    """Whitespace-word and BPE-ish-subtoken counts per doc."""
    import re

    bpe = re.compile(BPE_RE)

    def count(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ws = [len(t.split()) for t in texts]
        sub = [len(bpe.findall(t.lower())) for t in texts]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_ws_tokens": pa.array(ws, pa.int64()),
                "n_bpe_tokens": pa.array(sub, pa.int64()),
            }
        )

    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        count, batch_format="pyarrow"
    )


def q_langid(sf_dir: str):
    """Stopword-marker language scores; prediction = argmax marker hit rate
    (ties → 'und' order of the marker table). Rows-only driver check."""

    def lid(batch: pa.Table) -> pa.Table:
        toks, counts = tokens_per_row(batch)
        preds, confs = [], []
        for words in toks:
            if not words:
                preds.append("unknown")
                confs.append(0.0)
                continue
            wset = words
            best_lang, best = "unknown", 0.0
            for lang, markers in _LANG_MARKERS.items():
                hits = sum(1 for w in wset if w in markers)
                rate = hits / len(words)
                if rate > best:
                    best_lang, best = lang, rate
            preds.append(best_lang if best > 0.02 else "unknown")
            confs.append(round(best, 6))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "pred_lang": pa.array(preds, pa.string()),
                "confidence": pa.array(confs, pa.float64()),
            }
        )

    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        lid, batch_format="pyarrow"
    )


def q_fingerprint(sf_dir: str):
    """Winnowing fingerprints (Schleimer et al. 2003): FNV hashes of 3-gram
    shingles, minimum per sliding window of 4 → characteristic set.
    Returns per-doc fingerprint count + a stable 64-bit digest."""
    import hashlib

    from .dedup import _shingle_hashes

    def fp(batch: pa.Table) -> pa.Table:
        toks, _ = tokens_per_row(batch)
        n_out, dig_out = [], []
        for words in toks:
            hs = _shingle_hashes(words, FP_NGRAM)
            if hs.size == 0:
                n_out.append(0)
                dig_out.append(0)
                continue
            if hs.size <= FP_WINDOW:
                mins = {int(hs.min())}
            else:
                w = np.lib.stride_tricks.sliding_window_view(hs, FP_WINDOW)
                mins = set(int(v) for v in w.min(axis=1))
            sel = np.array(sorted(mins), dtype=np.uint64)
            digest = int.from_bytes(
                hashlib.blake2b(sel.tobytes(), digest_size=8).digest(), "big"
            ) & ((1 << 63) - 1)
            n_out.append(len(mins))
            dig_out.append(digest)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_fingerprints": pa.array(n_out, pa.int64()),
                "fp_digest": pa.array(dig_out, pa.int64()),
            }
        )

    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        fp, batch_format="pyarrow"
    )


QUERIES = {
    "quality": q_quality,
    "token_count": q_token_count,
    "langid": q_langid,
    "fingerprint": q_fingerprint,
}

ORACLE_SQL = {
    "quality": f"""
WITH base AS (SELECT doc_id, text, {SQL_TOKENS} AS t FROM documents)
SELECT doc_id,
       length(text) AS n_chars,
       len(t) AS n_tokens,
       len(list_distinct(t)) AS n_types,
       round(len(list_filter(t, x -> list_contains({SQL_STOPWORDS}, x)))::DOUBLE
             / greatest(len(t), 1), 6) AS stop_ratio,
       round(list_sum(list_transform(t, x -> length(x)))::DOUBLE
             / greatest(len(t), 1), 6) AS mean_token_len
FROM base""",
    "token_count": f"""
SELECT doc_id,
       len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS n_ws_tokens,
       len(regexp_extract_all(lower(text), '{BPE_RE}')) AS n_bpe_tokens
FROM documents""",
}
