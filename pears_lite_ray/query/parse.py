"""Query DSL parsing + stopword strip (SURVEY §2.3 M12/M13).

Faithful reimplementation of the reference semantics:

* stopword strip happens BEFORE DSL parsing, using the install language's
  stopword list (``app/search/controllers.py:55``);
* ``parse_query`` (``app/utils.py:260-281``): a trailing ``" -xx"`` (two
  chars) selects the language; ``?word`` sets doctype ``ind`` and keeps the
  word; ``!word`` sets doctype ``word`` and DROPS the word; a query that is
  exactly ``/`` means doctype ``doc``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from ..lang import STOPWORDS

_LANG_RE = re.compile(r"(.*) -(..\s*)$")


@dataclass
class ParsedQuery:
    query: str
    doctype: str | None
    lang: str


def strip_stopwords(query: str, lang: str = "en") -> str:
    stop = STOPWORDS.get(lang, frozenset())
    return " ".join(w for w in query.split() if w not in stop)


def parse_query(query: str, default_lang: str = "en") -> ParsedQuery:
    lang = default_lang
    doctype: str | None = None
    clean: list[str] = []
    m = _LANG_RE.search(query)
    if m:
        query = m.group(1)
        lang = m.group(2).strip()
    for w in query.split():
        if w.startswith("?"):
            doctype = "ind"
            clean.append(w[1:])
        elif w.startswith("!"):
            doctype = w[1:]
        else:
            clean.append(w)
    if query.strip() == "/":
        doctype = "doc"
    return ParsedQuery(" ".join(clean), doctype, lang)
