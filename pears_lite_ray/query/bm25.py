"""BM25 top-k scorers over compressed segments.

Two implementations with identical results (cross-checked in tests):

* :func:`exact_topk` — decode every candidate posting fully, vectorized
  accumulation (the baseline; also used for batch/dataset-scale scoring).
* :class:`BlockMaxWand` — document-at-a-time Block-Max WAND (Ding &
  Suel 2011) over the per-block upper bounds stored in the segments;
  skips blocks that cannot beat the running threshold.

Scoring: ``score(d) = Σ_t idf(t) · tf_norm(tf, dl)`` with the Lucene-style
idf (codec.bm25_idf), k1/b from the index stats (north_rule: 1.2 / 0.75).

Top-k contract (SURVEY §7.6 / K1): ``(score desc, doc_id asc)``, scores
compared exactly (float64); ``conjunctive=True`` restricts candidates to
docs containing ALL query terms (the reference's posting-intersection
semantics, overlap_calculation.py:133-137).
"""

from __future__ import annotations

import heapq

import numpy as np

from .. import codec


class DecodedCache:
    """Bounded cache of decoded per-term score contributions.

    A term's ``(doc_ids, idf·tf_norm)`` vectors are CONSTANT for a given
    index, and decoding a stopword-class list (~n_docs varbyte values ×3
    streams + tf_norm) dominates exact scoring — so the engine keeps the
    big lists decoded. Only lists with ≥ ``min_list`` postings are kept
    (small lists decode in microseconds); the budget is counted in cached
    POSTINGS (~16 B each) and the cache evicts wholesale when exceeded,
    the same simple strategy as SegmentStore's row cache. Index lifetime
    contract matches the engine's other caches: a rebuilt index needs a
    fresh QueryEngine."""

    def __init__(self, max_postings: int = 4_000_000, min_list: int = 10_000):
        self._d: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self._total = 0
        self.max_postings = max_postings
        self.min_list = min_list

    def get(self, term_id: int):
        return self._d.get(term_id)

    def put(self, term_id: int, docs: np.ndarray, contrib: np.ndarray) -> None:
        if docs.size < self.min_list:
            return
        if self._total + docs.size > self.max_postings:
            self._d.clear()
            self._total = 0
            if docs.size > self.max_postings:
                return
        self._d[term_id] = (docs, contrib)
        self._total += docs.size


def _accumulate(rows: list[dict], n_docs: int, avgdl: float, k1: float, b: float,
                conjunctive: bool = False, cache: DecodedCache | None = None):
    """Union-decode all lists → (doc_ids, scores, nterms_matched)."""
    all_docs, all_scores = [], []
    for row in rows:
        hit = cache.get(int(row["term_id"])) if cache is not None else None
        if hit is not None:
            docs, contrib = hit
        else:
            docs, tfs, dls = codec.decode_posting_list(row)
            idf = codec.bm25_idf(float(row["df"]), float(n_docs))
            contrib = idf * codec.bm25_tf_norm(tfs, dls, avgdl, k1, b)
            if cache is not None:
                cache.put(int(row["term_id"]), docs, contrib)
        all_docs.append(docs)
        all_scores.append(contrib)
    docs = np.concatenate(all_docs)
    scores = np.concatenate(all_scores)
    # stable argsort + reduceat instead of np.unique + ufunc.at: ~2.3×
    # faster at list-union sizes. Numerically equivalent up to float
    # summation order, NOT bit-identical: add.at sums strictly
    # sequentially while reduceat uses pairwise (blocked) summation, so
    # docs matching ≥3 query terms can differ in the last ulp. The 6-dp
    # round6 applied before every oracle compare and the (score desc,
    # doc_id asc) tie-break both operate on the rounded values, so the
    # contract is the ROUNDED score, not the raw float bit pattern.
    order = np.argsort(docs, kind="stable")
    d = docs[order]
    s = scores[order]
    first = np.r_[True, d[1:] != d[:-1]] if d.size else np.empty(0, bool)
    starts = np.nonzero(first)[0]
    uniq = d[first]
    agg = np.add.reduceat(s, starts) if starts.size else np.empty(0, np.float64)
    counts = np.diff(np.r_[starts, d.size])
    if conjunctive:
        keep = counts == len(rows)
        return uniq[keep], agg[keep], counts[keep]
    return uniq, agg, counts


def topk_select(doc_ids: np.ndarray, scores: np.ndarray, k: int):
    """(score desc, doc_id asc) top-k — the K1 tie-break contract.

    O(n) selection instead of a full lexsort of the candidate union (a
    stopword-class query unions ~n_docs candidates; sorting them all to
    take 10 dominated the query): np.partition finds the k-th largest
    score, docs strictly above it all qualify, ties AT the boundary fill
    the remainder by smallest doc_id — exact same output as the lexsort."""
    n = scores.size
    if k <= 0:
        return doc_ids[:0], scores[:0]
    if k < n:
        kth = np.partition(scores, n - k)[n - k]
        above = scores > kth
        sel = np.nonzero(above)[0]
        need = k - sel.size
        if need > 0:
            eq_idx = np.nonzero(scores == kth)[0]
            if eq_idx.size > need:
                eq_idx = eq_idx[np.argsort(doc_ids[eq_idx], kind="stable")[:need]]
            sel = np.concatenate([sel, eq_idx])
        doc_ids, scores = doc_ids[sel], scores[sel]
    order = np.lexsort((doc_ids, -scores))[:k]
    return doc_ids[order], scores[order]


def exact_topk(rows: list[dict], k: int, n_docs: int, avgdl: float,
               k1: float, b: float, conjunctive: bool = False,
               exclude: np.ndarray | None = None,
               cache: DecodedCache | None = None):
    if not rows:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    docs, scores, _ = _accumulate(rows, n_docs, avgdl, k1, b, conjunctive,
                                  cache=cache)
    if exclude is not None and exclude.size:
        keep = ~np.isin(docs, exclude, assume_unique=False)
        docs, scores = docs[keep], scores[keep]
    return topk_select(docs, scores, k)


class _Cursor:
    """Posting-list cursor with block skipping."""

    __slots__ = ("row", "idf", "blast", "bmax", "nblocks", "block_i",
                 "docs", "tfs", "dls", "pos", "cur_doc", "max_score", "k1",
                 "b", "avgdl", "ord")

    def __init__(self, row: dict, idf: float, avgdl: float, k1: float, b: float,
                 ord_: int = 0):
        self.row = row
        self.ord = ord_
        self.idf = idf
        self.avgdl = avgdl
        self.k1 = k1
        self.b = b
        self.blast = np.asarray(row["block_last_doc"], dtype=np.int64)
        self.bmax = np.asarray(row["block_max_tfnorm"], dtype=np.float64) * idf
        self.nblocks = len(self.blast)
        self.block_i = -1
        self.docs = self.tfs = self.dls = None
        self.pos = 0
        self.cur_doc = -1
        self.max_score = float(self.bmax.max()) if self.nblocks else 0.0
        self._load_block(0)

    def _load_block(self, i: int) -> None:
        if i >= self.nblocks:
            self.cur_doc = np.iinfo(np.int64).max
            return
        self.block_i = i
        self.docs, self.tfs, self.dls = codec.decode_block(self.row, i)
        self.pos = 0
        self.cur_doc = int(self.docs[0])

    def block_max_for(self, d: int) -> float:
        """Upper bound of the block that would contain doc >= current pivot."""
        i = int(np.searchsorted(self.blast, d))
        if i >= self.nblocks:
            return 0.0
        return float(self.bmax[i])

    def block_last_for(self, d: int) -> int:
        i = int(np.searchsorted(self.blast, d))
        if i >= self.nblocks:
            return np.iinfo(np.int64).max
        return int(self.blast[i])

    def next_geq(self, target: int) -> int:
        if self.cur_doc >= target:
            return self.cur_doc
        i = int(np.searchsorted(self.blast, target))
        if i != self.block_i:
            self._load_block(i)
            if self.cur_doc == np.iinfo(np.int64).max:
                return self.cur_doc
        j = int(np.searchsorted(self.docs, target, side="left"))
        if j >= self.docs.size:  # target beyond this block (can't happen after block seek)
            self._load_block(self.block_i + 1)
            return self.cur_doc
        self.pos = j
        self.cur_doc = int(self.docs[j])
        return self.cur_doc

    def advance(self) -> int:
        self.pos += 1
        if self.pos >= self.docs.size:
            self._load_block(self.block_i + 1)
        else:
            self.cur_doc = int(self.docs[self.pos])
        return self.cur_doc

    def score_current(self) -> float:
        tf = float(self.tfs[self.pos])
        dl = float(self.dls[self.pos])
        return self.idf * tf * (self.k1 + 1.0) / (
            tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)
        )


_MAXDOC = np.iinfo(np.int64).max


class BlockMaxWand:
    def __init__(self, rows: list[dict], n_docs: int, avgdl: float,
                 k1: float, b: float, exclude: np.ndarray | None = None):
        self.exclude = exclude if exclude is not None else np.empty(0, np.int64)
        self.cursors = [
            _Cursor(r, float(codec.bm25_idf(float(r["df"]), float(n_docs))),
                    avgdl, k1, b, ord_=i)
            for i, r in enumerate(rows) if r["df"] > 0
        ]

    def topk(self, k: int):
        # heap of (score, -doc_id): root = weakest hit under the tie-break
        heap: list[tuple[float, int]] = []
        cursors = [c for c in self.cursors if c.cur_doc != _MAXDOC]
        while True:
            cursors = [c for c in cursors if c.cur_doc != _MAXDOC]
            if not cursors:
                break
            cursors.sort(key=lambda c: c.cur_doc)
            threshold = heap[0][0] if len(heap) >= k else -1.0
            # find pivot: first cursor where cumulative global UB > threshold
            # ties (score == threshold) must still be evaluated: a tying doc
            # with smaller doc_id outranks the heap root under (score desc,
            # doc_id asc) — so compare with >=, and only skip blocks strictly
            # below the threshold.
            acc = 0.0
            pivot_idx = -1
            for i, c in enumerate(cursors):
                acc += c.max_score
                if acc >= threshold and acc > 0.0:
                    pivot_idx = i
                    break
            if pivot_idx < 0:
                break  # no document can beat or tie the threshold
            pivot_doc = cursors[pivot_idx].cur_doc
            # absorb cursors already AT the pivot doc into the pivot group:
            # otherwise the skip branch can cap next_doc at
            # cursors[pivot_idx+1].cur_doc == pivot_doc and never advance.
            while (pivot_idx + 1 < len(cursors)
                   and cursors[pivot_idx + 1].cur_doc == pivot_doc):
                pivot_idx += 1
            # block-max refinement over cursors[0..pivot]
            block_ub = sum(c.block_max_for(pivot_doc) for c in cursors[: pivot_idx + 1])
            if block_ub < threshold:
                # skip: advance past the earliest block boundary ≤ pivot
                next_doc = min(c.block_last_for(pivot_doc) for c in cursors[: pivot_idx + 1]) + 1
                if pivot_idx + 1 < len(cursors):
                    next_doc = min(next_doc, cursors[pivot_idx + 1].cur_doc)
                for c in cursors[: pivot_idx + 1]:
                    c.next_geq(next_doc)
                continue
            if cursors[0].cur_doc == pivot_doc:
                # sum in ORIGINAL query-term order (cursor.ord), matching the
                # exact scorer's accumulation order — float addition is not
                # associative, and a different order can flip exact ties
                # into ulp-level near-ties, breaking the (score desc,
                # doc_id asc) contract vs exact_topk.
                at_pivot = []
                for c in cursors:
                    if c.cur_doc != pivot_doc:
                        break
                    at_pivot.append(c)
                score = 0.0
                for c in sorted(at_pivot, key=lambda c: c.ord):
                    score += c.score_current()
                item = (score, -pivot_doc)
                if self.exclude.size:
                    j = int(np.searchsorted(self.exclude, pivot_doc))
                    if j < self.exclude.size and int(self.exclude[j]) == pivot_doc:
                        item = None  # tombstoned: cursors still advance below
                if item is None:
                    pass
                elif len(heap) < k:
                    heapq.heappush(heap, item)
                elif item > heap[0]:
                    heapq.heapreplace(heap, item)
                for c in cursors:
                    if c.cur_doc != pivot_doc:
                        break
                    c.advance()
            else:
                # advance the lagging cursor with the largest global UB to the
                # pivot. Only cursors strictly BEHIND the pivot are eligible —
                # picking the pivot cursor itself would make next_geq a no-op
                # and spin the loop forever.
                behind = [i for i in range(pivot_idx + 1)
                          if cursors[i].cur_doc < pivot_doc]
                best = max(behind, key=lambda i: cursors[i].max_score)
                cursors[best].next_geq(pivot_doc)
        out = sorted(heap, key=lambda t: (-t[0], -t[1]))
        return (
            np.array([-d for _, d in out], dtype=np.int64),
            np.array([s for s, _ in out], dtype=np.float64),
        )


def wand_topk(rows: list[dict], k: int, n_docs: int, avgdl: float,
              k1: float, b: float, exclude: np.ndarray | None = None):
    if not rows:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    return BlockMaxWand(rows, n_docs, avgdl, k1, b, exclude=exclude).topk(k)
