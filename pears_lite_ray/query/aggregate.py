"""CSV hit aggregation (K4 ↔ app/search/score_pages.py:136-155).

CSV-sourced documents carry urls of the form ``<file>.csv#<title> [<row>]``
(one doc per spreadsheet row — sources/csvdocs.py). After scoring, hits
from the same spreadsheet collapse back to their source file: per file (in
first-hit order) the row indices of every hit plus the first (best-ranked)
hit url. Non-CSV hits pass through in rank order.

Per-query, k ≤ 50 rows — driver-side list work by design (the reference's
``aggregate_csv`` operates on bestURLs' output, already capped at 50).
"""

from __future__ import annotations

import re

_ROW_RE = re.compile(r".*\[")


def aggregate_csv(best_urls: list[str]) -> tuple[list[str], list[list]]:
    """→ (non_csv_urls, [[csv_name, first_url, row_indices], ...]).

    Faithful to the reference: csv membership = ``'.csv#' in url``; the
    per-file row list uses SUBSTRING matching of the file name (a hit
    matches every csv_name contained in its url), and row indices are the
    text after the last '[' with the trailing ']' stripped."""
    urls = [u for u in best_urls if ".csv#" not in u]
    csv_names = [re.sub(r"#.*", "", u) for u in best_urls if ".csv#" in u]
    ordered: list[str] = []
    for c in csv_names:
        if c not in ordered:
            ordered.append(c)
    csvs: list[list] = []
    for csv_name in ordered:
        rows = [_ROW_RE.sub("", u)[:-1] for u in best_urls if csv_name in u]
        first_url = ""
        for u in best_urls:
            if csv_name in u:
                first_url = u
                break
        csvs.append([csv_name, first_url, rows])
    return urls, csvs
