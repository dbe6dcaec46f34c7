"""QueryEngine: top-k search over a built index (SURVEY §3.4 query path).

Modes:
* ``bm25`` (default; north_rule): block-max WAND over compressed segments,
  k1=1.2, b=0.75, tie-break (score desc, doc_id asc).
* ``pears``: the reference's fusion scoring (see query/pears.py) —
  stopword strip + DSL parse mirror the reference's search controller
  (app/search/controllers.py:55 → score_pages.run:232-250).

The engine is a stateful object (segment dataset handles, stats, tokenizer)
intended to live inside a ``map_batches`` actor for batch query evaluation,
or be used directly for interactive queries.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..config import DEFAULT_TOP_K
from ..index.segments import DocStore, IndexStats, SegmentStore
from ..vocab import Vocab, make_tokenizer
from . import bm25, pears
from .parse import parse_query, strip_stopwords

RESULT_SCHEMA = pa.schema(
    [
        ("rank", pa.int32()),
        ("doc_id", pa.int64()),
        ("score", pa.float64()),
        ("url", pa.string()),
        ("title", pa.string()),
        ("snippet", pa.string()),
        ("doctype", pa.string()),
    ]
)


class QueryEngine:
    def __init__(self, index_dir: str, mode: str = "bm25",
                 strip_query_stopwords: bool | None = None):
        self._index_dir = index_dir
        self.stats = IndexStats(os.path.join(index_dir, "stats.json"))
        self.segments = SegmentStore(os.path.join(index_dir, "segments"),
                                     self.stats.n_shards)
        self.docs = DocStore(os.path.join(index_dir, "staging"))
        # tombstoned docs (D1: deletes never renumber — maintenance.py)
        from ..index.maintenance import load_tombstones

        self.tombstones = load_tombstones(index_dir)
        self.mode = mode

        # the reference strips query stopwords before scoring
        # (controllers.py:55); default on for pears fidelity, off for bm25.
        self.strip = (mode == "pears") if strip_query_stopwords is None else strip_query_stopwords
        vocab = (
            Vocab.load(self.stats.vocab_path)
            if self.stats.tokenizer == "spm" else None
        )
        self.tokenizer = make_tokenizer(self.stats.tokenizer, vocab)
        # hot-term decoded contributions (stopword-class lists dominate
        # exact scoring); same engine-lifetime contract as the row cache
        self.decoded_cache = bm25.DecodedCache()

    # -- query prep ---------------------------------------------------------
    def _prep(self, query: str):
        # stopwords are stripped from the RAW query string with the install
        # language BEFORE DSL parsing, matching the reference's order
        # (controllers.py:55 strips before score_pages sees the query) —
        # '?the' keeps its '?' marker word intact rather than being reduced
        # to a bare stopword first.
        if self.strip:
            query = strip_stopwords(query, self.stats.languages[0])
        parsed = parse_query(query, default_lang=self.stats.languages[0])
        q = parsed.query
        pieces = self.tokenizer.encode_pieces(q)
        ids, _ = self.tokenizer.encode_ids_positions(q)
        return parsed, q, pieces, ids

    # -- pod routing (Q9) ---------------------------------------------------
    @property
    def pod_router(self):
        if getattr(self, "_pod_router", None) is None:
            from ..index.pods import PodRouter

            vocab = self.tokenizer.vocab if hasattr(self.tokenizer, "vocab") else None
            self._pod_router = PodRouter(self._index_dir, vocab)
        return self._pod_router

    def warmup(self) -> int:
        """Hoist the cold-query cost: parse all segment-shard parquet
        footers up front (SegmentStore.warmup) so the first real query
        pays only pruned row-group reads. → #shards opened."""
        return self.segments.warmup()

    def route_pods(self, query: str, top: int = 3, floor: float = 0.01) -> list[str]:
        """Top-``top`` pods by centroid cosine; ALL pods when the best score
        is < ``floor`` (reference score_pages.py:65-93)."""
        _, _, _, ids = self._prep(query)
        return self.pod_router.route(np.array(ids, dtype=np.int64), top, floor)

    def find_pods(self, query: str, top: int = 10) -> list[str]:
        """Pod-finder scoring (Q12): top-10 pods by centroid cosine, no
        all-pods fallback (the reference's pod_finder ranks candidate pods
        to subscribe to rather than routing a search)."""
        _, _, _, ids = self._prep(query)
        return self.pod_router.route(np.array(ids, dtype=np.int64), top,
                                     floor=-1.0)

    # -- scoring ------------------------------------------------------------
    def search_scores(self, query: str, k: int = DEFAULT_TOP_K,
                      conjunctive: bool = False, use_wand: bool = False,
                      pods: list[str] | None = None):
        # default scorer is the VECTORIZED exact accumulator: decoding a
        # whole list is 3 numpy calls, so it beats the document-at-a-time
        # Python WAND loop by ~10× at in-memory list sizes (measured 851 ms
        # vs 241 ms p50 pre-vectorization, ~25 ms after). Block-max WAND
        # (use_wand=True) is the scale path when lists stop fitting in one
        # read — its skipping avoids decoding cold blocks entirely.
        """→ (doc_ids, scores) under the (score desc, doc_id asc) contract."""
        _, q, pieces, ids = self._prep(query)
        distinct = list(dict.fromkeys(ids))
        if not distinct:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        rows_by_id = self.segments.lookup(distinct)
        rows = [rows_by_id[t] for t in distinct if t in rows_by_id]
        if self.mode == "pears":
            return self._pears_scores(q, pieces, ids, rows_by_id, k)
        if conjunctive and len(rows) < len(distinct):
            # a query term absent from the corpus empties the intersection
            # (reference: posindex[w] is an empty dict → empty candidate set)
            return np.empty(0, np.int64), np.empty(0, np.float64)
        excl = self.tombstones if self.tombstones.size else None
        if pods is not None:
            # pod restriction (Q9 pruning): score candidates, keep docs of
            # the routed pods only — exact path (pruning + WAND skipping
            # compose poorly; routed scoring stays vectorized)
            if not rows:
                # every query term absent from the corpus: _accumulate's
                # np.concatenate would raise on its empty list
                return np.empty(0, np.int64), np.empty(0, np.float64)
            docs, scores, counts = bm25._accumulate(
                rows, self.stats.n_docs, self.stats.avgdl,
                self.stats.k1, self.stats.b, conjunctive=conjunctive,
                cache=self.decoded_cache,
            )
            keep = self.pod_router.doc_mask(docs, pods)
            if excl is not None:
                keep &= ~np.isin(docs, excl)
            return bm25.topk_select(docs[keep], scores[keep], k)
        if conjunctive or not use_wand:
            return bm25.exact_topk(rows, k, self.stats.n_docs, self.stats.avgdl,
                                   self.stats.k1, self.stats.b,
                                   conjunctive=conjunctive, exclude=excl,
                                   cache=self.decoded_cache)
        return bm25.wand_topk(rows, k, self.stats.n_docs, self.stats.avgdl,
                              self.stats.k1, self.stats.b, exclude=excl)

    def _pears_scores(self, q, pieces, ids, rows_by_id, k):
        if self.stats.tokenizer == "spm":
            word_groups = pears.group_pieces_into_words(pieces, ids)
        else:
            word_groups = [[t] for t in dict.fromkeys(ids)]
        # snippet component needs title+snippet for candidate docs: one
        # evaluator decodes postings/positions once, yields the candidate
        # set, then rescoring with metadata reuses the decoded state. The
        # metadata join + snippet overlap is bound-pruned: with the snippet
        # component ≤ SNIPPET_BOUND, any candidate whose base (posix +
        # completeness) + bound falls below the kth-best base can never
        # reach the top k — so the per-doc metadata/overlap cost is paid
        # for a few hundred docs, not every 0.3-completeness candidate.
        if not word_groups:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        ev = pears.PearsEvaluator(word_groups, rows_by_id)
        if ev.candidates.size == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        alive = (
            ~np.isin(ev.candidates, self.tombstones)
            if self.tombstones.size else np.ones(ev.candidates.size, dtype=bool)
        )
        mask = alive.copy()
        base = ev.base_scores()
        n_alive = int(alive.sum())
        if n_alive > k:
            ab = base[alive]
            kth = np.partition(ab, ab.size - k)[ab.size - k]
            mask &= (base + pears.SNIPPET_BOUND) >= kth
        cand = ev.candidates[mask]
        if cand.size == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        meta_tbl = self.docs.lookup(cand)
        meta = {
            int(r["doc_id"]): (r["title"] or "", r["snippet"] or "")
            for r in meta_tbl.to_pylist()
        }
        full = ev.scores(q, doc_meta=meta, mask=mask)
        doc_ids = np.array(sorted(full), dtype=np.int64)
        scores = np.array([full[int(d)] for d in doc_ids], dtype=np.float64)
        keep = scores > 0  # bestURLs keeps positive scores only (K1)
        return bm25.topk_select(doc_ids[keep], scores[keep], k)

    # -- full search with metadata join (J1) --------------------------------
    def search(self, query: str, k: int = DEFAULT_TOP_K, **kw) -> pa.Table:
        """Top-k + metadata join. A DSL doctype (``!word`` / ``?word`` /
        ``/``, M12) filters the RESULT rows, as the reference's ``output``
        does post-scoring (score_pages.py:197,213)."""
        parsed = parse_query(query, default_lang=self.stats.languages[0])
        doc_ids, scores = self.search_scores(query, k, **kw)
        if doc_ids.size == 0:
            return RESULT_SCHEMA.empty_table()
        meta = self.docs.lookup(doc_ids)
        lut = {int(r["doc_id"]): r for r in meta.to_pylist()}
        if parsed.doctype is not None:
            keep = np.array(
                [lut.get(int(d), {}).get("doctype") == parsed.doctype
                 for d in doc_ids],
                dtype=bool,
            )
            doc_ids, scores = doc_ids[keep], scores[keep]
            if doc_ids.size == 0:
                return RESULT_SCHEMA.empty_table()
        rows = {
            "rank": np.arange(doc_ids.size, dtype=np.int32),
            "doc_id": doc_ids,
            "score": scores,
            "url": [lut.get(int(d), {}).get("url", "") for d in doc_ids],
            "title": [lut.get(int(d), {}).get("title", "") for d in doc_ids],
            "snippet": [lut.get(int(d), {}).get("snippet", "") for d in doc_ids],
            "doctype": [lut.get(int(d), {}).get("doctype", "") for d in doc_ids],
        }
        return pa.table(rows, schema=RESULT_SCHEMA)


    def search_aggregated(self, query: str, k: int = DEFAULT_TOP_K, **kw):
        """Search + CSV hit aggregation (K4: score_pages.py:136-155):
        returns ``(results_table, csvs)`` where CSV-sourced hits are
        removed from the table and collapsed per source file into
        ``[csv_name, first_hit_url, row_indices]`` in first-hit order."""
        from .aggregate import aggregate_csv

        res = self.search(query, k, **kw)
        urls = res["url"].to_pylist()
        plain_urls, csvs = aggregate_csv(urls)
        keep = np.array([u in set(plain_urls) for u in urls], dtype=bool)
        return res.filter(pa.array(keep)), csvs


class BatchQueryStage:
    """Actor-pool stage for dataset-scale query evaluation:
    a query table batch in → result rows out (one per hit)."""

    def __init__(self, index_dir: str, mode: str = "bm25"):
        self.engine = QueryEngine(index_dir, mode=mode)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, scores = [], [], [], []
        for qid, q, k in zip(
            batch["query_id"].to_pylist(),
            batch["query"].to_pylist(),
            batch["k"].to_pylist(),
        ):
            d, s = self.engine.search_scores(q, int(k))
            qids.extend([qid] * d.size)
            ranks.extend(range(d.size))
            docs.extend(d.tolist())
            scores.extend(s.tolist())
        return pa.table(
            {
                "query_id": pa.array(qids, pa.int32()),
                "rank": pa.array(ranks, pa.int32()),
                "doc_id": pa.array(docs, pa.int64()),
                "score": pa.array(scores, pa.float64()),
            }
        )
