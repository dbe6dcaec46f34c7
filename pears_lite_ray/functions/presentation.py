"""Result-presentation helpers + per-row predicates (SURVEY M16/M17).

* ``beautify_title`` / ``beautify_snippet`` — the reference's emoji doctype
  prefix and query-word ``<b>`` highlighting (``app/utils.py:285-309``),
  minus the Flask static-asset pathing (no web layer here).
* ``is_cc`` — the CC-license heuristic (``app/indexer/detect_open.py:9-33``:
  known-open site in the url OR a CC logo image in the html). Note: in the
  reference this predicate's result is computed but never used downstream
  (``cc`` is always passed False at htmlparser.py:84); kept for parity as a
  batch predicate.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_DOCTYPE_EMOJI = {
    "stat": "📈 STAT: ",
    "doc": "📝 DOC: ",
    "url": "🌏 URL: ",
    "ind": "☺️  IND: ",
    "map": "📍 MAP: ",
}

_OPEN_SITES = ("wikipedia.org", "stackoverflow.com")
_CC_MARKS = ("creativecommons.org", "cc-by")
_IMG_SRC_RE = re.compile(rb"<img\b[^>]*\bsrc\s*=\s*['\"]([^'\"]*)['\"]",
                         re.IGNORECASE)


def beautify_title(title: str, doctype: str) -> str:
    return _DOCTYPE_EMOJI.get(doctype, "") + title


def beautify_snippet(snippet: str, query: str) -> str:
    out = snippet
    for w in query.split():
        out = out.replace(w, f"<b>{w}</b>")
        out = out.replace(w.title(), f"<b>{w.title()}</b>")
    return out


def is_cc(url: str, html: bytes) -> bool:
    if any(s in url for s in _OPEN_SITES):
        return True
    for m in _IMG_SRC_RE.finditer(html):
        src = m.group(1).decode("utf-8", "replace")
        if any(c in src for c in _CC_MARKS):
            return True
    return False


def cc_flags_batch(batch: pa.Table) -> pa.Table:
    """map_batches predicate: adds ``is_cc:bool`` per row."""
    flags = np.fromiter(
        (is_cc(u, h) for u, h in zip(batch["url"].to_pylist(),
                                     batch["html"].to_pylist())),
        dtype=bool, count=len(batch),
    )
    return batch.append_column("is_cc", pa.array(flags, pa.bool_()))


def assemble_csv_table(csv_path: str, rows: list, doctype: str) -> str:
    """K5 (score_pages.py:160-183): render the hit rows of a spreadsheet
    as the reference's striped HTML table — header row from the CSV
    columns, first 10 hit rows, and for doctype 'map' a leading
    OpenStreetMap pin column built from the first two cells (lat/lon).

    Presentation-layer parity: the markup (classes, inline styles, the
    JS/noscript pin link) matches the reference so a UI drop-in renders
    identically; rows are the string indices aggregate_csv produced."""
    from ..sources.csvdocs import read_csv_table

    t = read_csv_table(csv_path)
    cols = t.column_names
    cells = [t[c].to_pylist() for c in cols]
    table = "<table class='table table-striped w-100'><thead><tr>"
    if doctype == "map":
        table += ("<th scope='col' style='word-wrap:break-word; "
                  "max-width:500px'>www</th>")
    for c in cols:
        table += ("<th scope='col' style='word-wrap:break-word; "
                  "max-width:500px'>" + c + "</th>")
    table += "</tr></thead>"
    for ridx in [int(r) for r in rows][:10]:
        r = [cells[c][ridx] for c in range(len(cols))]
        table += "<tr class='w-100'>"
        if doctype == "map":
            link = ("https://www.openstreetmap.org/#map=19/"
                    + str(r[0]) + "/" + str(r[1]))
            table += (
                """<td><a href="#" onClick="console.log('""" + link
                + """'); window.open('""" + link
                + """', 'pagename', 'resizable,height=560,width=560,"""
                + """top=200,left=800');return false;">📍</a>"""
                + """<noscript>You need Javascript to use the previous """
                + """link or use <a href='""" + link
                + """' target="_blank">📍</a></noscript></td>"""
            )
        for cell in r:
            table += ("<td style='word-wrap:break-word; max-width:500px'>"
                      + str(cell) + "</td>")
        table += "</tr>"
    table += "</table>"
    return table
