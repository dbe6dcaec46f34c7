"""Deliberately naive single-process oracle (SURVEY §5.2 tier 2).

A dict-of-lists index + straight-line BM25 and pears-fusion scoring, written
independently of the engine's codec/WAND/shuffle machinery — golden results
for rank-identity conformance: the Ray engine must match top-k doc_ids and
scores exactly (tie-break (score desc, doc_id asc)).
"""

from __future__ import annotations

import math
from collections import defaultdict

from ..query.pears import generic_overlap, phrase_score


class NaiveIndex:
    def __init__(self, tokenizer):
        self.tokenizer = tokenizer
        self.postings: dict[int, dict[int, list[int]]] = defaultdict(dict)
        self.doclen: dict[int, int] = {}
        self.meta: dict[int, tuple[str, str]] = {}
        self._doc_terms: dict[int, set[int]] = {}

    def add(self, doc_id: int, text: str, title: str = "", snippet: str = ""):
        # re-add replaces (duplicate-url winner semantics), never appends
        for tid in self._doc_terms.pop(doc_id, ()):
            self.postings[tid].pop(doc_id, None)
        ids, pos = self.tokenizer.encode_ids_positions(text)
        self.doclen[doc_id] = len(ids)
        self.meta[doc_id] = (title, snippet)
        for tid, p in zip(ids, pos):
            self.postings[tid].setdefault(doc_id, []).append(p)
        self._doc_terms[doc_id] = set(ids)

    @property
    def n_docs(self) -> int:
        return len(self.doclen)

    @property
    def avgdl(self) -> float:
        return sum(self.doclen.values()) / len(self.doclen) if self.doclen else 0.0

    def bm25_scores(self, query: str, k1: float = 1.2, b: float = 0.75,
                    conjunctive: bool = False) -> dict[int, float]:
        ids, _ = self.tokenizer.encode_ids_positions(query)
        distinct = list(dict.fromkeys(ids))
        scores: dict[int, float] = defaultdict(float)
        matched: dict[int, int] = defaultdict(int)
        n, avgdl = self.n_docs, self.avgdl
        for tid in distinct:
            plist = self.postings.get(tid, {})
            df = len(plist)
            if df == 0:
                continue
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            for doc_id, positions in plist.items():
                tf = len(positions)
                dl = self.doclen[doc_id]
                scores[doc_id] += idf * tf * (k1 + 1.0) / (
                    tf + k1 * (1.0 - b + b * dl / avgdl)
                )
                matched[doc_id] += 1
        if conjunctive:
            present = [t for t in distinct if self.postings.get(t)]
            scores = {d: s for d, s in scores.items() if matched[d] == len(distinct) and len(present) == len(distinct)}
        return dict(scores)

    def bm25_topk(self, query: str, k: int, **kw) -> list[tuple[int, float]]:
        scores = self.bm25_scores(query, **kw)
        return sorted(scores.items(), key=lambda t: (-t[1], t[0]))[:k]

    def pears_topk(self, query: str, k: int, pieces: list[str] | None = None
                   ) -> list[tuple[int, float]]:
        """Reference fusion scoring via the same transcription used by the
        engine but over the naive dict postings."""
        if pieces is None:
            pieces = self.tokenizer.encode_pieces(query)
        ids, _ = self.tokenizer.encode_ids_positions(query)
        # group into words by ▁ prefix
        word_groups: list[list[int]] = []
        for piece, tid in zip(pieces, ids):
            if piece.startswith("▁") or not word_groups:
                word_groups.append([tid])
            else:
                word_groups[-1].append(tid)
        distinct = list(dict.fromkeys(ids))
        if not distinct:
            return []
        all_docs = sorted({d for t in distinct for d in self.postings.get(t, {})})
        scores: dict[int, float] = {}
        for d in all_docs:
            comp = sum(1 for t in distinct if d in self.postings.get(t, {})) / len(distinct)
            if comp < 0.3:
                continue
            s = comp
            if all(d in self.postings.get(t, {}) for t in distinct):
                groups = tuple(
                    tuple(tuple(self.postings[t][d]) for t in grp)
                    for grp in word_groups
                )
                s += phrase_score(list(groups))
            title, snippet = self.meta.get(d, ("", ""))
            snip = generic_overlap(query, f"{title} {snippet}")
            s += snip
            if snip == 1.0:
                s += 1.0
            if s > 0:
                scores[d] = s
        return sorted(scores.items(), key=lambda t: (-t[1], t[0]))[:k]
