"""Pseudo-XML ``<doc>`` corpus source (SURVEY S2 ↔ app/utils.py:71-83,
re-parsed at app/indexer/controllers.py:201-219).

Reference line protocol, reimplemented:

* a line starting with ``<doc`` opens a document; ``url="..."`` and
  ``title="..."`` attributes are extracted by regex;
* every following line that does not contain ``</doc`` is appended to the
  body as ``line + ' '``;
* a line containing ``</doc`` closes the document.

Distribution shape: one FILE is the parse unit (documents never span
files), so the Dataset is ``read_binary_files(paths)`` → a ``map_batches``
that splits each file's bytes into document rows — parallel across files,
streaming, no driver-side parsing. This is the partitioning assumption the
operator relies on (same as the reference, which indexes one docfile per
request).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_URL_RE = re.compile(r'url="([^"]*)"')
_TITLE_RE = re.compile(r'title="([^"]*)"')


def parse_doc_lines(content: str) -> tuple[list[str], list[str], list[str]]:
    """(urls, titles, bodies) from one file's text — the reference's exact
    state machine (controllers.py:201-219: body lines joined with ' ')."""
    urls: list[str] = []
    titles: list[str] = []
    bodies: list[str] = []
    url = title = ""
    doc = ""
    for line in content.split("\n"):
        if line[:4] == "<doc":
            m = _URL_RE.search(line)
            url = m.group(1) if m else ""
            m = _TITLE_RE.search(line)
            title = m.group(1) if m else ""
            doc = ""
        elif "</doc" not in line:
            doc += line + " "
        else:
            urls.append(url)
            titles.append(title)
            bodies.append(doc)
    return urls, titles, bodies


def _files_to_docs(batch: pa.Table) -> pa.Table:
    urls_all, titles_all, texts_all = [], [], []
    for payload in batch["bytes"].to_pylist():
        urls, titles, bodies = parse_doc_lines(payload.decode("utf-8"))
        urls_all.extend(urls)
        titles_all.extend(titles)
        # unconditional title + ' ' + body (mk_page_vector.py:82)
        texts_all.extend(f"{t} {b}" for t, b in zip(titles, bodies))
    n = len(urls_all)
    return pa.table(
        {
            "url": pa.array(urls_all, pa.string()),
            "warc_ts": pa.array(np.zeros(n, dtype=np.int64), pa.timestamp("us")),
            "title": pa.array(titles_all, pa.string()),
            "text": pa.array(texts_all, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "doctype": pa.array(["doc"] * n, pa.string()),
        }
    )


def read_xml_docs(paths: list[str] | str):
    """→ ray.data.Dataset of corpus-schema rows, one parse task per file.

    ``text = title + ' ' + body`` mirrors the reference's indexing input
    (mk_page_vector.compute_vectors_local_docs receives title and doc and
    vectorizes ``title + ' ' + doc``, mk_page_vector.py:76-101)."""
    import ray.data as rd

    return rd.read_binary_files(paths).map_batches(
        _files_to_docs, batch_format="pyarrow"
    )
