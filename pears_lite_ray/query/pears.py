"""The reference's fusion scoring mode ("pears"), reimplemented exactly.

``score_docs`` (score_pages.py:96-114): final = posix phrase score (only for
docs in the conjunctive candidate set) + completeness + snippet overlap
(+1 bonus when snippet overlap == 1.0), zeroed when NaN or completeness
< 0.3. The cosine DS_scores are computed by the reference but NOT added to
the fused score (quirk preserved: score_pages.py:101-109 never adds
``DS_scores``).

* completeness (overlap_calculation.py:50-63): fraction of the query's
  distinct in-vocab pieces that occur in the doc (binarized vector overlap).
* snippet overlap = generic_overlap(query, title+' '+snippet)
  (overlap_calculation.py:31-40): word-set overlap with punctuation mapped
  to spaces, divided by |distinct query words|.
* posix (overlap_calculation.py:65-154): conjunctive intersection (J4),
  subword-aware phrase scoring: a word counts 1.0 iff every non-initial
  subword occurs at position exactly prev+1; result is the mean over
  deduplicated query words (enforce_subwords=True path).

Because any doc with completeness < 0.3 scores 0 (and completeness 0 for
docs matching no query piece), the candidate set is exactly the docs
matching ≥ 0.3 of the distinct query pieces — computable from postings
without scanning the docs table.
"""

from __future__ import annotations

import string

import numpy as np

from .. import codec

_PUNCT_TABLE = str.maketrans({c: " " for c in string.punctuation})

# Max contribution of the snippet component to a fused score: overlap ≤ 1.0
# plus the +1.0 exact-overlap bonus (score_pages.py:104-107). Bound used
# for candidate pruning before the metadata join.
SNIPPET_BOUND = 2.0


def generic_overlap(q: str, s: str) -> float:
    """Word-set overlap / |query words| (overlap_calculation.py:31-40)."""
    q_words = q.lower().translate(_PUNCT_TABLE).split()
    s_words = set(s.lower().translate(_PUNCT_TABLE).split())
    if not q_words:
        return 0.0
    qset = set(q_words)
    return len(qset & s_words) / len(qset)


def phrase_score(word_groups: list[tuple[tuple[int, ...], ...]]) -> float:
    """posix_score_seq with enforce_subwords=True
    (overlap_calculation.py:65-122).

    ``word_groups``: one entry per query word; each entry is a tuple of
    per-subword position tuples within the candidate doc. Repeated words are
    deduplicated (the reference uses ``set``; the mean is order-invariant).
    """
    seen = set()
    words = []
    for w in word_groups:
        if w not in seen:
            seen.add(w)
            words.append(w)
    if len(words) == 1 and len(words[0]) == 1:
        return 1.0
    scores = []
    for word in words:
        prev = np.asarray(word[0], dtype=np.int64)
        matched = True
        for sub in word[1:]:
            cur = np.asarray(sub, dtype=np.int64)
            conseq = cur[np.isin(cur - 1, prev)]
            if conseq.size == 0:
                matched = False
                break
            prev = conseq
        scores.append(1.0 if matched else 0.0)
    return float(np.mean(scores)) if scores else 0.0


def group_pieces_into_words(pieces: list[str], ids: list[int]) -> list[list[int]]:
    """Group query piece ids into words by the ``▁`` prefix
    (overlap_calculation.py:143-148). Only in-vocab pieces appear (callers
    drop OOV ids first, mirroring the reference's warning path)."""
    words: list[list[int]] = []
    for piece, tid in zip(pieces, ids):
        if piece.startswith("▁") or not words:
            words.append([tid])
        else:
            words[-1].append(tid)
    return words


class PearsEvaluator:
    """One query's fused scoring state (score_pages.py:96-114), decoded
    once and reused across the meta-less candidate pass and the final
    scored pass.

    Round-2 performance shape (fixes the 23.6 s/4-query hot spot):
    * doc/tf streams decode once per distinct term; POSITION streams decode
      only when the conjunctive candidate set is non-empty and the query
      has a multi-subword or multi-word shape — and then stay as one flat
      numpy array + offsets per term, sliced per candidate (no per-posting
      Python tuples).
    * word groups deduplicate by token-id tuple — equivalent to the
      reference's position-tuple set-dedup (overlap_calculation.py:69-71):
      identical words share position tuples, distinct words can't collide
      on them (a position holds one token).
    * completeness and the fused sum are vectorized over candidates.
    """

    def __init__(
        self,
        word_groups: list[list[int]],
        segment_rows: dict[int, dict],
        completeness_threshold: float = 0.3,
    ):
        self.threshold = completeness_threshold
        self.word_groups = word_groups
        distinct_ids: list[int] = []
        for grp in word_groups:
            for tid in grp:
                if tid not in distinct_ids:
                    distinct_ids.append(tid)
        self.distinct_ids = distinct_ids
        self.n_query_terms = len(distinct_ids)
        self._rows = segment_rows
        self._docs: dict[int, np.ndarray] = {}
        self._tfs: dict[int, np.ndarray] = {}
        self._pos: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for tid in distinct_ids:
            row = segment_rows.get(tid)
            if row is None or row["df"] == 0:
                self._docs[tid] = np.empty(0, np.int64)
                self._tfs[tid] = np.empty(0, np.int64)
                continue
            docs, tfs, _ = codec.decode_posting_list(row)
            self._docs[tid] = docs
            self._tfs[tid] = tfs
        self.candidates, self.cand_completeness, self._conj_mask = (
            self._candidates()
        )
        self._posix = self._phrase_scores()

    def _candidates(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        if self.n_query_terms == 0:
            e = np.empty(0, np.int64)
            return e, np.empty(0, np.float64), np.empty(0, bool)
        all_docs = np.unique(
            np.concatenate([self._docs[t] for t in self.distinct_ids])
        )
        if all_docs.size == 0:
            return all_docs, np.empty(0, np.float64), np.empty(0, bool)
        match_count = np.zeros(all_docs.size, dtype=np.int64)
        for tid in self.distinct_ids:
            match_count += np.isin(all_docs, self._docs[tid],
                                   assume_unique=True)
        completeness = match_count / self.n_query_terms
        cand_mask = completeness >= self.threshold
        return (
            all_docs[cand_mask],
            completeness[cand_mask],
            match_count[cand_mask] == self.n_query_terms,
        )

    def _positions(self, tid: int) -> tuple[np.ndarray, np.ndarray]:
        """(flat positions, offsets) for a term — decoded on first use."""
        if tid not in self._pos:
            row = self._rows[tid]
            docs, tfs = self._docs[tid], self._tfs[tid]
            if len(row["pos_bytes"]):
                counts, flat = codec.decode_positions_stream(
                    codec.varbyte_decode(row["pos_bytes"]), docs.size,
                    counts=tfs.astype(np.int64),
                )
            else:
                counts = np.zeros(docs.size, dtype=np.int64)
                flat = np.empty(0, np.int64)
            self._pos[tid] = (flat, np.r_[0, np.cumsum(counts)])
        return self._pos[tid]

    def _phrase_scores(self) -> np.ndarray:
        """posix phrase score per conjunctive candidate (posix_score_seq,
        enforce_subwords=True — overlap_calculation.py:65-122)."""
        conj_docs = self.candidates[self._conj_mask]
        out = np.zeros(conj_docs.size, dtype=np.float64)
        if conj_docs.size == 0:
            return out
        seen: set[tuple[int, ...]] = set()
        uniq_groups: list[list[int]] = []
        for grp in self.word_groups:
            key = tuple(grp)
            if key not in seen:
                seen.add(key)
                uniq_groups.append(grp)
        if len(uniq_groups) == 1 and len(uniq_groups[0]) == 1:
            out[:] = 1.0
            return out
        word_ok = np.zeros((len(uniq_groups), conj_docs.size), dtype=np.float64)
        # per-term row index of every conjunctive candidate (one
        # searchsorted per term, not one per (term, doc))
        idx = {
            tid: np.searchsorted(self._docs[tid], conj_docs)
            for tid in self.distinct_ids
        }
        for g, grp in enumerate(uniq_groups):
            if len(grp) == 1:
                # single-subword word: present (conjunctive) → matches
                word_ok[g, :] = 1.0
                continue
            flat0, offs0 = self._positions(grp[0])
            j0 = idx[grp[0]]
            for c in range(conj_docs.size):
                prev = flat0[offs0[j0[c]]:offs0[j0[c] + 1]]
                matched = True
                for tid in grp[1:]:
                    flat, offs = self._positions(tid)
                    j = idx[tid][c]
                    cur = flat[offs[j]:offs[j + 1]]
                    conseq = cur[np.isin(cur - 1, prev)]
                    if conseq.size == 0:
                        matched = False
                        break
                    prev = conseq
                word_ok[g, c] = 1.0 if matched else 0.0
        return word_ok.mean(axis=0)

    def base_scores(self) -> np.ndarray:
        """posix + completeness per candidate (everything except the
        snippet component), vectorized. The snippet component is bounded
        by SNIPPET_BOUND, so callers can top-k-prune on base scores before
        paying the per-candidate metadata/overlap cost."""
        s = self.cand_completeness.copy()
        s[self._conj_mask] += self._posix
        return s

    def scores(
        self,
        query: str,
        doc_meta: "dict[int, tuple[str, str]] | None",
        mask: np.ndarray | None = None,
    ) -> dict[int, float]:
        """Fused score per candidate doc; ``doc_meta=None`` skips the
        snippet component (used by the candidate pass). ``mask`` restricts
        scoring to a candidate subset (bound-based pruning)."""
        s = self.base_scores()
        out: dict[int, float] = {}
        idx = np.nonzero(mask)[0] if mask is not None else range(self.candidates.size)
        for i in idx:
            d = int(self.candidates[i])
            v = float(s[i])
            if doc_meta is not None:
                title, snippet = doc_meta.get(d, ("", ""))
                snip = generic_overlap(query, f"{title} {snippet}")
                v += snip
                if snip == 1.0:
                    v += 1.0
            if np.isnan(v) or self.cand_completeness[i] < self.threshold:
                v = 0.0
            out[d] = v
        return out


def pears_scores(
    query: str,
    word_groups: list[list[int]],
    segment_rows: dict[int, dict],
    doc_meta: "dict[int, tuple[str, str]] | None",
    completeness_threshold: float = 0.3,
) -> dict[int, float]:
    """Fused document scores for one query (score_pages.py:96-114) —
    convenience wrapper over :class:`PearsEvaluator` for one-shot callers."""
    if not word_groups:
        return {}
    ev = PearsEvaluator(word_groups, segment_rows, completeness_threshold)
    if ev.candidates.size == 0:
        return {}
    return ev.scores(query, doc_meta)
