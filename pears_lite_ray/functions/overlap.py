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
