"""Link extraction (SURVEY M18 ↔ app/indexer/htmlparser.py:54-74).

The reference HEAD-checks the url then collects every ``<a href>``:
absolute http(s) links WITHOUT a fragment pass through verbatim, anything
else is resolved against the page url with ``urljoin`` (including
fragment-bearing absolute links — the reference's quirk at
htmlparser.py:71-72 re-joins those too; preserved).

No HTTP here (offline corpus engine): the function takes the page's html
and url. At dataset scale it runs inside ``map_batches`` over (url, html)
batches — a pure vectorizable per-row map (crawl-frontier support)."""

from __future__ import annotations

import re
from urllib.parse import urljoin

_HREF_RE = re.compile(
    r"<a\b[^>]*?\bhref\s*=\s*(\"([^\"]*)\"|'([^']*)'|([^\s>]+))",
    re.IGNORECASE | re.DOTALL,
)


def extract_links(html: str, url: str) -> list[str]:
    """Every anchor's href, in document order (duplicates kept, as the
    reference's list-append does)."""
    links: list[str] = []
    for m in _HREF_RE.finditer(html):
        href = m.group(2) or m.group(3) or m.group(4) or ""
        if href.startswith("http") and "#" not in href:
            links.append(href)
        else:
            links.append(urljoin(url, href))
    return links
