"""Browser-bookmarks source (SURVEY S3 ↔ reference ``app/utils.py:86-102``
``readBookmarks``).

The reference walks a Netscape bookmarks-HTML export with BeautifulSoup:
every ``<dt>`` whose next element is an ``<h3>`` names the current folder,
and every other ``<dt>``'s ``<a href>`` is collected when the current
folder equals the requested keyword (case-insensitive). Re-implemented on
stdlib ``html.parser`` (no bs4 in this environment) with the same flat
walk semantics — a folder stays "current" until the next ``<h3>``.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pyarrow as pa


class _BookmarkWalker(HTMLParser):
    def __init__(self) -> None:
        super().__init__()
        self._in_h3 = False
        self._in_a = False
        self._h3_text: list[str] = []
        self._a_text: list[str] = []
        self._a_href: str | None = None
        self.folder = ""
        # (folder, href, name) in document order
        self.links: list[tuple[str, str, str]] = []

    def handle_starttag(self, tag, attrs):
        if tag == "h3":
            self._in_h3 = True
            self._h3_text = []
        elif tag == "a":
            self._in_a = True
            self._a_text = []
            self._a_href = dict(attrs).get("href")

    def handle_endtag(self, tag):
        if tag == "h3" and self._in_h3:
            self._in_h3 = False
            self.folder = "".join(self._h3_text).strip()
        elif tag == "a" and self._in_a:
            self._in_a = False
            if self._a_href:
                self.links.append(
                    (self.folder, self._a_href, "".join(self._a_text).strip())
                )

    def handle_data(self, data):
        if self._in_h3:
            self._h3_text.append(data)
        if self._in_a:
            self._a_text.append(data)


def read_bookmarks(path: str, keyword: str) -> list[str]:
    """Hrefs of links filed under the ``keyword`` folder (case-insensitive)
    — the reference's return value (a url list fed to its indexer)."""
    with open(path, encoding="utf-8", errors="replace") as f:
        walker = _BookmarkWalker()
        walker.feed(f.read())
    kw = keyword.lower()
    return [href for folder, href, _ in walker.links if folder.lower() == kw]


def bookmarks_table(path: str, keyword: str | None = None) -> pa.Table:
    """All bookmark links as (url, title, pod) rows — pod = the folder
    name, matching the engine's pod-column convention; ``keyword``
    restricts to one folder like the reference."""
    with open(path, encoding="utf-8", errors="replace") as f:
        walker = _BookmarkWalker()
        walker.feed(f.read())
    rows = walker.links
    if keyword is not None:
        kw = keyword.lower()
        rows = [r for r in rows if r[0].lower() == kw]
    return pa.table(
        {
            "url": pa.array([r[1] for r in rows], pa.string()),
            "title": pa.array([r[2] for r in rows], pa.string()),
            "pod": pa.array([r[0] for r in rows], pa.string()),
        }
    )
