"""HTML → text extraction: title + jusText-style boilerplate removal.

Reimplements (from the published jusText algorithm, Pomikálek 2011, and the
reference's call parameters) what the reference computes in
``app/indexer/htmlparser.py``:

* ``remove_boilerplates`` (htmlparser.py:16-30): jusText with
  ``max_link_density=0.3, stopwords_low=0.1, stopwords_high=0.3,
  length_low=30, length_high=100``; non-boilerplate paragraph texts are
  concatenated, **each followed by one space** (trailing space kept).
* ``extract_html`` (htmlparser.py:78-110): ``title`` is the raw string
  content of ``<title>`` ("" when absent); the indexed text is
  ``title + " " + body_str`` (mk_page_vector.py:50); ``snippet`` is
  ``body_str[:300].replace(',', '-')`` (htmlparser.py:109); pages whose
  detected language is not installed are rejected with empty title
  (htmlparser.py:105-108).

The HTML segmentation uses the stdlib ``html.parser`` (bs4/lxml/justext are
not available in this environment); fixtures generate HTML whose paragraph
classification is unambiguous, so the invariant *extract(html) == text*
byte-identical per url is testable end-to-end.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

from ..config import (
    JUSTEXT_LENGTH_HIGH,
    JUSTEXT_LENGTH_LOW,
    JUSTEXT_MAX_LINK_DENSITY,
    JUSTEXT_STOPWORDS_HIGH,
    JUSTEXT_STOPWORDS_LOW,
)
from ..lang import STOPWORDS, detect_language

_BLOCK_TAGS = frozenset(
    """address article aside blockquote body caption center col colgroup dd
    div dl dt fieldset figure footer form h1 h2 h3 h4 h5 h6 header hr html li
    main menu nav ol p pre section table tbody td tfoot th thead tr ul""".split()
)
_SKIP_TAGS = frozenset({"script", "style", "select", "noscript", "template"})
_HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})
_WS_RE = re.compile(r"\s+")

MAX_HEADING_DISTANCE = 200  # chars (jusText default)


@dataclass
class Paragraph:
    text_chunks: list[str] = field(default_factory=list)
    chars_in_links: int = 0
    is_heading: bool = False
    cf_class: str = ""     # context-free: good|bad|short|neargood
    final_class: str = ""  # after context-sensitive revision

    @property
    def text(self) -> str:
        return _WS_RE.sub(" ", "".join(self.text_chunks)).strip()

    @property
    def length(self) -> int:
        return len(self.text)

    def words(self) -> list[str]:
        return self.text.split()

    @property
    def link_density(self) -> float:
        length = self.length
        return 0.0 if length == 0 else self.chars_in_links / length


class _ParagraphParser(HTMLParser):
    """Segment HTML into jusText-style paragraphs + capture <title>."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.paragraphs: list[Paragraph] = []
        self.title: str | None = None
        self._current = Paragraph()
        self._skip_depth = 0
        self._link_depth = 0
        self._heading_depth = 0
        self._in_title = False

    def _flush(self) -> None:
        if self._current.text:
            self.paragraphs.append(self._current)
        self._current = Paragraph()
        self._current.is_heading = self._heading_depth > 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag == "title":
            self._in_title = True
            return
        if tag == "a":
            self._link_depth += 1
        if tag in _HEADING_TAGS:
            self._heading_depth += 1
        if tag in _BLOCK_TAGS:
            self._flush()
        if tag == "br":
            # single <br> = space; paragraph break handled by block tags
            self._current.text_chunks.append(" ")

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag == "title":
            self._in_title = False
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        if tag in _HEADING_TAGS:
            self._heading_depth = max(0, self._heading_depth - 1)
            self._flush()
        elif tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        if self._in_title:
            self.title = data if self.title is None else self.title + data
            return
        if data:
            self._current.text_chunks.append(data)
            if self._link_depth:
                self._current.chars_in_links += len(_WS_RE.sub(" ", data).strip())

    def close(self) -> None:  # flush trailing paragraph
        super().close()
        self._flush()


def segment_paragraphs(html: str) -> tuple[str | None, list[Paragraph]]:
    p = _ParagraphParser()
    p.feed(html)
    p.close()
    return p.title, p.paragraphs


def _classify_context_free(
    p: Paragraph,
    stoplist: frozenset[str],
    *,
    max_link_density: float,
    stopwords_low: float,
    stopwords_high: float,
    length_low: int,
    length_high: int,
) -> str:
    if p.link_density > max_link_density:
        return "bad"
    if "\xa9" in p.text or "&copy" in p.text:
        return "bad"
    length = p.length
    if length < length_low:
        return "bad" if p.chars_in_links > 0 else "short"
    toks = [w.lower() for w in p.words()]
    density = sum(1 for t in toks if t in stoplist) / len(toks) if toks else 0.0
    if density >= stopwords_high:
        return "good" if length > length_high else "neargood"
    if density >= stopwords_low:
        return "neargood"
    return "bad"


def _neighbour(classes: list[str], i: int, step: int, ignore_neargood: bool) -> str:
    j = i + step
    while 0 <= j < len(classes):
        c = classes[j]
        if c in ("good", "bad") or (c == "neargood" and not ignore_neargood):
            return c
        j += step
    return "bad"


def classify_paragraphs(
    paragraphs: list[Paragraph],
    lang: str = "en",
    *,
    max_link_density: float = JUSTEXT_MAX_LINK_DENSITY,
    stopwords_low: float = JUSTEXT_STOPWORDS_LOW,
    stopwords_high: float = JUSTEXT_STOPWORDS_HIGH,
    length_low: int = JUSTEXT_LENGTH_LOW,
    length_high: int = JUSTEXT_LENGTH_HIGH,
    no_headings: bool = False,
) -> None:
    """Context-free classification + context-sensitive revision (jusText)."""
    stoplist = STOPWORDS.get(lang, STOPWORDS["en"])
    for p in paragraphs:
        p.cf_class = _classify_context_free(
            p,
            stoplist,
            max_link_density=max_link_density,
            stopwords_low=stopwords_low,
            stopwords_high=stopwords_high,
            length_low=length_low,
            length_high=length_high,
        )

    classes = [p.cf_class for p in paragraphs]
    final = list(classes)

    # heading promotion: a short heading within MAX_HEADING_DISTANCE chars of
    # a following good paragraph becomes neargood
    if not no_headings:
        for i, p in enumerate(paragraphs):
            if p.is_heading and classes[i] == "short":
                dist = 0
                for j in range(i + 1, len(paragraphs)):
                    if dist > MAX_HEADING_DISTANCE:
                        break
                    if classes[j] == "good":
                        final[i] = "neargood"
                        break
                    dist += paragraphs[j].length

    # revise "short"
    base = list(final)
    for i, c in enumerate(base):
        if c != "short":
            continue
        prev = _neighbour(base, i, -1, ignore_neargood=True)
        nxt = _neighbour(base, i, +1, ignore_neargood=True)
        if prev == "good" and nxt == "good":
            final[i] = "good"
        elif prev == "bad" and nxt == "bad":
            final[i] = "bad"
        elif (prev == "bad" and _neighbour(base, i, -1, ignore_neargood=False) == "neargood") or (
            nxt == "bad" and _neighbour(base, i, +1, ignore_neargood=False) == "neargood"
        ):
            final[i] = "good"
        else:
            final[i] = "bad"

    # revise "neargood"
    for i, c in enumerate(base):
        if c != "neargood":
            continue
        prev = _neighbour(base, i, -1, ignore_neargood=True)
        nxt = _neighbour(base, i, +1, ignore_neargood=True)
        final[i] = "bad" if (prev == "bad" and nxt == "bad") else "good"

    for p, fc in zip(paragraphs, final):
        p.final_class = fc


def remove_boilerplates(html: str, lang: str = "en", **params) -> str:
    """Body text: kept paragraphs joined, each followed by one space
    (reference: htmlparser.py:27-30)."""
    _, paragraphs = segment_paragraphs(html)
    classify_paragraphs(paragraphs, lang, **params)
    out = []
    for p in paragraphs:
        if p.final_class == "good":
            out.append(p.text + " ")
    return "".join(out)


def extract_pdf_record(
    payload: bytes,
    installed_languages: tuple[str, ...] = ("en",),
    url: str = "",
) -> dict:
    """PDF branch (M3 — reference extract_txt, pdfparser.py:32-70):
    body = mined text, title = url basename, snippet = body[:300] (the
    PDF path does NOT do the html path's comma replacement), same
    language gate. An empty mine → language '' → rejected, matching the
    reference's empty-body error return."""
    from .pdf import pdf_text

    body = pdf_text(payload)
    title = url.split("/")[-1]
    language = detect_language(body)
    if language not in installed_languages:
        return {"title": "", "body": body, "text": "", "snippet": "",
                "lang": language, "ok": False,
                "error": "language-not-supported"}
    snippet = body[:300]
    return {"title": title, "body": body, "text": title + " " + body,
            "snippet": snippet, "lang": language, "ok": True, "error": ""}


def extract_record(
    html_bytes: bytes,
    installed_languages: tuple[str, ...] = ("en",),
    url: str = "",
) -> dict:
    """Full extraction for one page (reference: extract_html,
    htmlparser.py:78-110 + text join mk_page_vector.py:50).

    Returns ``title, body, text, snippet, lang, ok, error``; on a rejected
    page (no title tag object / unsupported language) ``ok`` is False and
    ``text`` is "" — the reference skips such documents. PDF payloads
    (``%PDF-`` magic) take the pdfparser branch, as the reference's
    content-type dispatch does (indexer controllers → extract_txt).
    """
    if html_bytes[:5] == b"%PDF-":
        return extract_pdf_record(html_bytes, installed_languages, url)
    html = html_bytes.decode("utf-8", errors="replace")
    title_raw, paragraphs = segment_paragraphs(html)
    if title_raw is None:
        return {"title": "", "body": "", "text": "", "snippet": "",
                "lang": "", "ok": False, "error": "no-title"}
    title = title_raw
    # body extraction runs with the install language's stoplist (reference
    # passes LANG: htmlparser.py:96)
    classify_paragraphs(paragraphs, installed_languages[0])
    body = "".join(p.text + " " for p in paragraphs if p.final_class == "good")
    language = detect_language(title + " " + body)
    if language not in installed_languages:
        return {"title": "", "body": body, "text": "", "snippet": "",
                "lang": language, "ok": False, "error": "language-not-supported"}
    snippet = body[:300].replace(",", "-")
    text = title + " " + body
    return {"title": title, "body": body, "text": text, "snippet": snippet,
            "lang": language, "ok": True, "error": ""}
