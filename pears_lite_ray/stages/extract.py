"""Extraction stage: html:binary → doc rows (actor pool, SURVEY §2.3 M1/M2/M9).

The reference fuses extraction into a sequential per-URL loop
(``mk_page_vector.py:35-73``); here it is a stateful ``map_batches`` stage:
classifier stoplists are constructed once per actor in ``__init__`` (the
reference reloads resources per call — SURVEY §2.4 T1), batches are Arrow
in / Arrow out.

``doc_id`` is deterministic under any parallelism: the low 63 bits of
blake2b(url). The reference instead uses arrival-order matrix row indices
(``mk_page_vector.py:55``), which cannot be reproduced by a parallel build;
SURVEY §4.3 fixes the contract. Within-batch url-duplicates are dropped
(latest ``warc_ts`` wins); cross-batch duplicates are resolved in the
dedup/stats pass (see index/build.py).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..text.extract import extract_record


def url_doc_id(url: str) -> int:
    """Deterministic 63-bit doc id from the url (stable under parallelism)."""
    return int.from_bytes(hashlib.blake2b(url.encode(), digest_size=8).digest(), "big") & ((1 << 63) - 1)


def doc_ids_for_urls(urls) -> np.ndarray:
    return np.fromiter((url_doc_id(u) for u in urls), dtype=np.int64, count=len(urls))


DOC_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("title", pa.string()),
        ("snippet", pa.string()),
        ("lang", pa.string()),
        ("pod", pa.string()),
        ("doctype", pa.string()),
        ("text", pa.string()),
    ]
)


def _dedup_batch(t: pa.Table) -> pa.Table:
    """Keep one row per doc_id within the batch: max warc_ts, then last."""
    ids = t["doc_id"].to_numpy()
    if ids.size == len(np.unique(ids)):
        return t
    ts = t["warc_ts"].cast(pa.int64()).to_numpy()
    order = np.lexsort((np.arange(ids.size), ts, ids))  # by id, ts asc, pos
    ids_sorted = ids[order]
    last_of_group = np.r_[ids_sorted[1:] != ids_sorted[:-1], True]
    return t.take(pa.array(order[last_of_group]))


class ExtractStage:
    """html → (doc_id, url, warc_ts, title, snippet, lang, text).

    Rows failing extraction (no title object / unsupported language —
    htmlparser.py:91,105-108) are dropped, as the reference skips them.
    """

    def __init__(self, installed_languages: tuple[str, ...] = ("en",)):
        self.languages = tuple(installed_languages)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..index.pods import pod_of_url

        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        ts = batch["warc_ts"].to_pylist()
        keep_url, keep_ts, titles, snippets, langs, texts = [], [], [], [], [], []
        for u, h, t in zip(urls, htmls, ts):
            rec = extract_record(h, self.languages, url=u)
            if not rec["ok"]:
                continue
            keep_url.append(u)
            keep_ts.append(t)
            titles.append(rec["title"])
            snippets.append(rec["snippet"])
            langs.append(rec["lang"])
            texts.append(rec["text"])
        out = pa.Table.from_arrays(
            [
                pa.array(doc_ids_for_urls(keep_url), pa.int64()),
                pa.array(keep_url, pa.string()),
                pa.array(keep_ts, pa.timestamp("us")),
                pa.array(titles, pa.string()),
                pa.array(snippets, pa.string()),
                pa.array(langs, pa.string()),
                pa.array([pod_of_url(u) for u in keep_url], pa.string()),
                # crawled pages are doctype 'url' (mk_page_vector.py:59)
                pa.array(["url"] * len(keep_url), pa.string()),
                pa.array(texts, pa.string()),
            ],
            schema=DOC_SCHEMA,
        )
        return _dedup_batch(out)


class PassthroughExtract:
    """Adapter for pre-extracted corpora (e.g. the testdata ``documents``
    table): text is already plain; title/snippet derived like the reference's
    local-docs path (``mk_page_vector.py:76-101``: snippet = doc[:500])."""

    def __init__(self, url_prefix: str = "doc://", snippet_chars: int = 500):
        self.url_prefix = url_prefix
        self.snippet_chars = snippet_chars

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        cols = set(batch.column_names)
        if "doc_id" in cols:
            # keep the source's own doc_id: already unique + deterministic
            ids = batch["doc_id"].to_numpy()
            urls = [f"{self.url_prefix}{i}" for i in ids]
        else:
            # url-keyed text corpus (e.g. the CSV source): hash the url,
            # same contract as the html path
            urls = batch["url"].to_pylist()
            ids = doc_ids_for_urls(urls)
        ts = (
            batch["warc_ts"].cast(pa.timestamp("us"))
            if "warc_ts" in cols
            else pa.array(np.zeros(len(urls), dtype=np.int64), pa.timestamp("us"))
        )
        titles = (
            batch["title"].to_pylist() if "title" in cols
            else [t[:60] for t in texts]
        )
        langs = (
            batch["lang"].to_pylist() if "lang" in cols else ["en"] * len(texts)
        )
        # pods: explicit column > constant default (the reference's default
        # keyword pod is 'home', utils.py:44)
        pods = (
            batch["pod"].to_pylist() if "pod" in cols else ["home"] * len(texts)
        )
        # local-doc default doctype is 'doc' (controllers.py:63-65); the CSV
        # source ships its own 'csv' column
        doctypes = (
            batch["doctype"].to_pylist() if "doctype" in cols
            else ["doc"] * len(texts)
        )
        out = pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(urls, pa.string()),
                ts,
                pa.array(titles, pa.string()),
                pa.array([t[: self.snippet_chars] for t in texts], pa.string()),
                pa.array(langs, pa.string()),
                pa.array(pods, pa.string()),
                pa.array(doctypes, pa.string()),
                pa.array(texts, pa.string()),
            ],
            schema=DOC_SCHEMA,
        )
        return _dedup_batch(out)
