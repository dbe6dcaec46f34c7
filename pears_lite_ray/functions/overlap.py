"""Auxiliary overlap/similarity kernels the reference ships but does not
wire into the default scoring path — provided for drop-in parity
(SURVEY Q6/Q7/Q8):

* Q6 ``score_url_overlap`` — character-set Dice between the query and the
  url's last path element (overlap_calculation.py:22-29; commented out of
  score_pages in the reference).
* Q7 ``dice_overlap``     — word-set Dice between two strings
  (overlap_calculation.py:42-48; unused in the reference).
* Q8 ``cosine_similarity`` — dense cosine with the reference's zero-norm
  guard (utils.py:176-185; the generic kernel behind its matrix helpers).

All are pure per-pair functions: at dataset scale they run inside
``map_batches`` over whatever pair/column layout the caller has (see
functions/presentation.py for the same pattern).
"""

from __future__ import annotations

import re
import string

import numpy as np

_LAST_ELEM_RE = re.compile(r".*/([^/]+)")


def jaccard_sets(a: set, b: set) -> float:
    """(overlap_calculation.py:12-14)."""
    c = a & b
    return float(len(c)) / (len(a) + len(b) - len(c))


def dice_sets(a: set, b: set) -> float:
    """(overlap_calculation.py:17-19)."""
    c = a & b
    return float(2 * len(c)) / (len(a) + len(b))


def score_url_overlap(query: str, url: str) -> float:
    """Q6: Dice over CHARACTER sets of the query and the url's last path
    element (overlap_calculation.py:22-29)."""
    url = url.rstrip("/")
    m = _LAST_ELEM_RE.search(url)
    if m:
        url = m.group(1)
    return dice_sets(set(query.lower()), set(url.lower()))


def dice_overlap(s1: str, s2: str) -> float:
    """Q7: Dice over word sets, punctuation REMOVED (not spaced — the
    reference's two functions differ here; overlap_calculation.py:42-48)."""
    s1 = "".join(c for c in s1 if c not in string.punctuation)
    s2 = "".join(c for c in s2 if c not in string.punctuation)
    return dice_sets(set(s1.lower().split()), set(s2.lower().split()))


def cosine_similarity(v1: np.ndarray, v2: np.ndarray) -> float:
    """Q8: dense cosine with the reference's length-mismatch → 0.0 guard
    (utils.py:176-182). Like the reference, a zero vector yields NaN —
    downstream fused scoring zeroes NaN totals (score_pages.py:110)."""
    v1 = np.asarray(v1, dtype=np.float64)
    v2 = np.asarray(v2, dtype=np.float64)
    if v1.shape != v2.shape:
        return 0.0
    with np.errstate(invalid="ignore", divide="ignore"):
        return float(
            np.dot(v1, v2) / (np.sqrt(np.dot(v1, v1)) * np.sqrt(np.dot(v2, v2)))
        )


def _string_to_dict(s: str) -> dict:
    """``"term:freq term:freq"`` → dict (utils.py:165-173; malformed
    elements — no ':' or empty halves — are skipped, like the reference)."""
    d = {}
    for e in s.rstrip(" ").split():
        if ":" in e:
            pair = e.split(":")  # "a:b:c" keeps pair[1], like the reference
            if pair[0] != "" and pair[1] != "":
                d[pair[0]] = pair[1]
    return d


def term_cosine(q: str, d1: dict, d2_s: str) -> tuple[float, float]:
    """Q8: legacy sparse term-dict cosine + query coverage
    (term_cosine.py:9-42, not called from the reference's search path).

    ``d1`` is the query's term→freq dict, ``d2_s`` the doc's serialized
    ``term:freq`` string. Vectors are laid out over the UNION of the two
    key sets (return_keys), integer-cast (mk_vector), L2-normalised with
    the zero-vector pass-through guard (utils.py:140-144, so an empty
    side yields NaN cosine exactly like the reference), and
    ``coverage = |binarised overlap| / len(q.split())``."""
    d2 = _string_to_dict(d2_s)
    dims = sorted(set(d1) | set(d2))  # set order is score-invariant
    v1 = np.array([int(d1.get(k, 0)) for k in dims], dtype=np.float64)
    v2 = np.array([int(d2.get(k, 0)) for k in dims], dtype=np.float64)
    coverage = float(((v1 > 0) & (v2 > 0)).sum()) / len(q.split())
    n1, n2 = np.linalg.norm(v1), np.linalg.norm(v2)
    u1 = v1 / n1 if n1 else v1
    u2 = v2 / n2 if n2 else v2
    return cosine_similarity(u1, u2), coverage
