"""Segment + docs readers for the query path.

The term-hash partition layout (``segments/termhash=<h>/``) makes a term
lookup a direct shard read with a parquet predicate — no index scan
(SURVEY §4.3 "build shuffle key"). The reference instead unpickles the whole
positional index per query (``overlap_calculation.py:125``:
``load_posix(pod_name)``).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

SEGMENT_ROW_KEYS = [
    "term_id", "df", "cf", "doc_bytes", "tf_bytes", "dl_bytes", "pos_bytes",
    "block_last_doc", "block_max_tfnorm", "block_doc_off", "block_tf_off",
    "block_dl_off", "block_n",
]


class IndexStats:
    def __init__(self, path: str):
        with open(path) as f:
            d = json.load(f)
        self.n_docs: int = d["n_docs"]
        self.avgdl: float = d["avgdl"]
        self.k1: float = d.get("k1", 1.2)
        self.b: float = d.get("b", 0.75)
        self.tokenizer: str = d.get("tokenizer", "spm")
        self.vocab_path: str | None = d.get("vocab_path")
        self.languages: tuple[str, ...] = tuple(d.get("languages", ("en",)))
        self.keep_positions: bool = d.get("keep_positions", True)
        self.n_shards: int = d.get("n_shards", 16)
        self.raw = d


class _ShardFooters:
    """Footer cache + row-group pruner for one ``termhash=<h>`` shard.

    The parquet footers (schema + per-row-group term_id min/max stats) are
    parsed ONCE per shard and kept; a term lookup then reads only the row
    groups whose [min, max] ranges cover a requested term — no dataset
    re-discovery, no footer re-parse, no full-shard scan per query. This
    is what separates the cold first query (footer parse + first row
    groups) from warm steady-state (pruned row-group reads only)."""

    def __init__(self, path: str):
        import pyarrow.parquet as pq

        files = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.endswith(".parquet")
        )
        self._pf = [pq.ParquetFile(f) for f in files]
        fi, rgi, mins, maxs = [], [], [], []
        for i, pf in enumerate(self._pf):
            md = pf.metadata
            # row-group stats index by parquet LEAF column (lists expand
            # to .list.element leaves) — locate term_id by leaf path, not
            # arrow top-level position
            col = next(
                j for j in range(md.num_columns)
                if md.schema.column(j).path.split(".")[0] == "term_id"
            )
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(col).statistics
                fi.append(i)
                rgi.append(g)
                if st is not None and st.has_min_max:
                    mins.append(st.min)
                    maxs.append(st.max)
                else:  # no stats → never prunable
                    mins.append(-(1 << 62))
                    maxs.append(1 << 62)
        self._fi = np.array(fi, dtype=np.int64)
        self._rgi = np.array(rgi, dtype=np.int64)
        self._min = np.array(mins, dtype=np.int64)
        self._max = np.array(maxs, dtype=np.int64)

    def read(self, ts: list[int]) -> pa.Table | None:
        want = np.array(ts, dtype=np.int64)
        hit = np.zeros(self._fi.size, dtype=bool)
        for t in want:
            hit |= (self._min <= t) & (t <= self._max)
        if not hit.any():
            return None
        tabs = []
        for i in np.unique(self._fi[hit]):
            rgs = self._rgi[hit & (self._fi == i)]
            t = self._pf[i].read_row_groups(
                rgs.tolist(), columns=SEGMENT_ROW_KEYS
            )
            tabs.append(
                t.filter(
                    pc.is_in(t["term_id"],
                             value_set=pa.array(want, pa.int64()))
                )
            )
        return pa.concat_tables(tabs) if tabs else None


class SegmentStore:
    """Posting-list lookup over the sharded segments directory.

    An instance is bound to ONE index version: footers, dataset handles
    and term rows are cached for the store's lifetime, so after a
    ``compact``/``merge`` rewrites the segments, construct a fresh
    ``QueryEngine`` (the maintenance verbs already work on directories,
    not live stores)."""

    CACHE_CAP = 4096  # term rows kept hot (the reference re-unpickles the
    #                   ENTIRE index per query — overlap_calculation.py:125)

    def __init__(self, segments_dir: str, n_shards: int):
        self.dir = segments_dir
        self.n_shards = n_shards
        self._partitioned = any(
            name.startswith("termhash=") for name in os.listdir(segments_dir)
        )
        self._shard_ds: dict[int, pads.Dataset] = {}
        self._footers: dict[int, _ShardFooters | None] = {}
        self._row_cache: dict[int, dict | None] = {}

    def _footers_for_shard(self, shard: int) -> _ShardFooters | None:
        if shard in self._footers:
            return self._footers[shard]
        path = os.path.join(self.dir, f"termhash={shard}")
        fo = _ShardFooters(path) if os.path.isdir(path) else None
        self._footers[shard] = fo
        return fo

    def warmup(self) -> int:
        """Parse every shard's footers up front (cold-cost hoist for
        latency-sensitive serving). → #shards opened."""
        if not self._partitioned:
            return 0
        n = 0
        for shard in range(self.n_shards):
            if self._footers_for_shard(shard) is not None:
                n += 1
        return n

    def _dataset_for_shard(self, shard: int) -> pads.Dataset | None:
        if shard in self._shard_ds:
            return self._shard_ds[shard]
        path = os.path.join(self.dir, f"termhash={shard}") if self._partitioned else self.dir
        ds = pads.dataset(path, format="parquet") if os.path.exists(path) else None
        self._shard_ds[shard] = ds
        return ds

    def lookup(self, term_ids: list[int]) -> dict[int, dict]:
        """term_id → segment row dict (missing terms absent from the result)."""
        out: dict[int, dict] = {}
        by_shard: dict[int, list[int]] = {}
        for t in term_ids:
            t = int(t)
            if t in self._row_cache:  # None = known-absent
                row = self._row_cache[t]
                if row is not None:
                    out[t] = row
                continue
            by_shard.setdefault(t % self.n_shards, []).append(t)
        if not by_shard:
            return out
        fetched: dict[int, dict] = {}
        for shard, ts in by_shard.items():
            if self._partitioned:
                fo = self._footers_for_shard(shard)
                tbl = fo.read(ts) if fo is not None else None
            else:
                ds = self._dataset_for_shard(shard)
                tbl = None
                if ds is not None:
                    tbl = ds.to_table(
                        columns=SEGMENT_ROW_KEYS,
                        filter=pc.field("term_id").isin(
                            pa.array(ts, pa.int64())
                        ),
                    )
            if tbl is None:
                continue
            for row in tbl.to_pylist():
                fetched[int(row["term_id"])] = row
        if len(self._row_cache) > self.CACHE_CAP:
            self._row_cache.clear()
        for ts in by_shard.values():
            for t in ts:
                self._row_cache[t] = fetched.get(t)
        out.update(fetched)
        return out


META_COLS = ["doc_id", "url", "warc_ts", "title", "snippet", "lang", "pod", "doctype", "doclen"]


class DocStore:
    """Point lookups for doc metadata (J1: result assembly joins the hit
    list with doc metadata — reference score_pages.py:187-229).

    Reads a column projection of the staging parquet directly — the build
    writes no separate docs table. Rows sharing a doc_id (cross-partition
    url duplicates) are resolved at lookup: winner = max warc_ts, tie-break
    url asc (the same total order the postings build uses)."""

    def __init__(self, docs_dir: str):
        self.ds = pads.dataset(docs_dir, format="parquet")
        names = set(self.ds.schema.names)
        self.columns = [c for c in META_COLS if c in names]

    @staticmethod
    def _resolve(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        if ids.size == len(np.unique(ids)):
            return t
        df = t.select(["doc_id", "warc_ts", "url"]).to_pandas()
        keep = (
            df.sort_values(["doc_id", "warc_ts", "url"],
                           ascending=[True, False, True], kind="stable")
            .drop_duplicates("doc_id", keep="first").index.to_numpy()
        )
        return t.take(pa.array(np.sort(keep)))

    def lookup(self, doc_ids: np.ndarray) -> pa.Table:
        t = self.ds.to_table(
            columns=self.columns,
            filter=pc.field("doc_id").isin(pa.array(np.asarray(doc_ids, dtype=np.int64))),
        )
        return self._resolve(t)

    def scan(self, columns: list[str] | None = None) -> pa.Table:
        return self._resolve(self.ds.to_table(columns=columns or self.columns))
