"""Language resources: stopword lists + heuristic language ID.

The reference ships per-language stopword files
(``app/static/ling/stopwords/*``, loaded at ``app/__init__.py:58-61``) and
uses ``langdetect`` for language gating (``htmlparser.py:98-108``);
``langdetect`` is unavailable here, so the gate is a deterministic stopword-
frequency heuristic (a standard n-gram/function-word LID approach). Lists are
small, committed, and deterministic — not copied from the reference files.
"""

from __future__ import annotations

import re

_WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)

# Function words per language. EN list doubles as the jusText stoplist and the
# query stopword filter (reference strips query stopwords:
# app/search/controllers.py:55).
STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset(
        """a about above after again all am an and any are as at be because been
        before being below between both but by can did do does doing down during
        each few for from further had has have having he her here hers him his
        how i if in into is it its just me more most my no nor not now of off on
        once only or other our ours out over own same she so some such than that
        the their theirs them then there these they this those through to too
        under until up very was we were what when where which while who whom why
        will with you your yours""".split()
    ),
    "de": frozenset(
        """aber alle als also am an auch auf aus bei bin bis bist da damit dann
        das dass dein der den des dem die dies doch dort du durch ein eine einem
        einen einer es für hatte haben hier ich ihr im in ist ja jede kann kein
        können mein mit muss nach nicht noch nur oder schon sein sich sie sind
        so über um und uns unter vom von vor war was weiter wenn werden wie
        wieder wir wird zu zum zur""".split()
    ),
    "fr": frozenset(
        """au aux avec ce ces dans de des du elle en et eux il ils je la le les
        leur lui ma mais me même mes moi mon ne nos notre nous on ou où par pas
        pour qu que qui sa se ses son sur ta te tes toi ton tu un une vos votre
        vous""".split()
    ),
}


def words(text: str) -> list[str]:
    return _WORD_RE.findall(text.lower())


def stopword_density(tokens: list[str], lang: str = "en") -> float:
    """Fraction of tokens that are stopwords (jusText's stop_density)."""
    if not tokens:
        return 0.0
    stop = STOPWORDS.get(lang, frozenset())
    return sum(1 for t in tokens if t in stop) / len(tokens)


def detect_language(text: str, default: str = "un") -> str:
    """Heuristic LID: language whose stopword list covers the most tokens.

    Deterministic tie-break: higher coverage wins, then lexicographic
    language code. Returns ``default`` when no list matches any token.
    """
    toks = words(text)
    if not toks:
        return default
    best_lang, best_hits = default, 0
    for lc in sorted(STOPWORDS):
        hits = sum(1 for t in toks if t in STOPWORDS[lc])
        if hits > best_hits:
            best_lang, best_hits = lc, hits
    return best_lang if best_hits > 0 else default
