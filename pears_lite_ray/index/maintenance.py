"""Index maintenance: tombstone deletes + segment compaction (SURVEY §2.9).

The reference deletes a document by removing its matrix row, DECREMENTING
every higher row index in SQLite and rebuilding the whole positional index
(``app/api/controllers.py:61-106``) — ids are renumbered, so concurrent
readers break. Here doc_ids are stable url hashes: a delete appends to a
tombstone set (O(1), no index touch) that the query engine masks out;
``compact`` later rebuilds the segments without the tombstoned docs and
clears the set. Ids are NEVER renumbered.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np

from ..config import BM25_B, BM25_K1, BuildConfig
from ..stages.extract import url_doc_id

TOMBSTONE_FILE = "tombstones.json"


def tombstone_path(index_dir: str) -> str:
    return os.path.join(index_dir, TOMBSTONE_FILE)


def load_tombstones(index_dir: str) -> np.ndarray:
    p = tombstone_path(index_dir)
    if not os.path.exists(p):
        return np.empty(0, dtype=np.int64)
    with open(p) as f:
        return np.array(sorted(set(json.load(f)["doc_ids"])), dtype=np.int64)


def delete_urls(index_dir: str, urls: list[str]) -> np.ndarray:
    """Tombstone the docs for ``urls``; returns the full tombstone set.

    Resolves ids two ways and unions them: the url hash (the normal case —
    doc_id IS the hash of the indexed url) plus a staging url→doc_id
    lookup, which catches docs whose url was RENAMED after indexing
    (rename_url is metadata-only, so a renamed doc's id stays the hash of
    its ORIGINAL url and the plain hash of its current url would silently
    miss it)."""
    ids = set(int(i) for i in load_tombstones(index_dir))
    ids.update(url_doc_id(u) for u in urls)
    staging = os.path.join(index_dir, "staging")
    if os.path.isdir(staging):
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        t = pads.dataset(staging, format="parquet").to_table(
            columns=["doc_id"],
            filter=pc.field("url").isin(list(urls)),
        )
        ids.update(int(i) for i in t["doc_id"].to_pylist())
    out = np.array(sorted(ids), dtype=np.int64)
    with open(tombstone_path(index_dir), "w") as f:
        json.dump({"doc_ids": [int(i) for i in out]}, f)
    return out


def delete_doc_ids(index_dir: str, doc_ids) -> np.ndarray:
    ids = set(int(i) for i in load_tombstones(index_dir))
    ids.update(int(i) for i in doc_ids)
    out = np.array(sorted(ids), dtype=np.int64)
    with open(tombstone_path(index_dir), "w") as f:
        json.dump({"doc_ids": [int(i) for i in out]}, f)
    return out


def compact(index_dir: str, cfg: BuildConfig | None = None) -> dict:
    """Rebuild segments + stats from staging minus tombstones; clear the set.

    Runs the same explode → (term, salt) shuffle → merge pipeline as the
    build, with a tombstone filter pushed into the staging scan. Writes to
    ``segments.compact`` then swaps — readers opened before the swap keep
    their snapshot. Completed staging partitions are untouched (the
    manifest lineage survives compaction).
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    from ..stages.postings import explode_partials
    from . import build as B

    cfg = cfg or BuildConfig(out_dir=index_dir)
    if cfg.out_dir != index_dir:
        raise ValueError("cfg.out_dir must equal index_dir")
    tombs = load_tombstones(index_dir)
    with open(cfg.stats_path) as f:
        old_stats = json.load(f)

    tomb_arr = pa.array(tombs)

    def drop_tombstoned(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(pc.is_in(t["doc_id"], value_set=tomb_arr)))

    # cross-partition duplicate-url winners must be re-resolved: compaction
    # rebuilds from STAGING, which still holds loser rows the original build
    # filtered out (build_index → _filter_winners). Without this, a
    # compaction would resurrect loser postings and double-count their
    # doc_ids in n/avgdl.
    _, dup_ids, winner_ts, winner_url = B.dedup_and_stats(cfg)

    # recompute N / avgdl over surviving WINNER docs (one metadata scan)
    nb = B._meta_blocks(cfg)
    meta_cols = ["doc_id", "doclen"]
    if dup_ids.size:
        meta_cols.append("warc_ts")
        if winner_url or winner_ts is None:  # distributed argmax needs both
            meta_cols.append("url")
    agg = (
        B._filter_winners(
            B._staging_ds(cfg, meta_cols, nb)
            .map_batches(drop_tombstoned, batch_format="pyarrow"),
            dup_ids, winner_ts, winner_url,
        )
        .aggregate(Count(alias_name="n"), Sum("doclen", alias_name="sum_dl"))
    )
    n = int(agg["n"] or 0)
    sum_dl = int(agg["sum_dl"] or 0)
    avgdl = (sum_dl / n) if n else 0.0

    post_cols = list(B.POSTING_COLS)
    if dup_ids.size:
        post_cols.append("warc_ts")
        if winner_url or winner_ts is None:  # distributed argmax needs both
            post_cols.append("url")
    post = B._filter_winners(
        B._staging_ds(cfg, post_cols).map_batches(
            drop_tombstoned, batch_format="pyarrow"
        ),
        dup_ids, winner_ts, winner_url,
    )
    keep_pos = bool(old_stats.get("keep_positions", True))
    salt_bits, hot_frac = cfg.salt_bits, cfg.hot_frac
    partials = post.map_batches(
        lambda t: explode_partials(t, keep_positions=keep_pos,
                                   salt_bits=salt_bits, hot_frac=hot_frac),
        batch_format="pyarrow", batch_size=cfg.batch_size * 8,
    )
    kw = dict(avgdl=avgdl, k1=BM25_K1, b=BM25_B, block_size=cfg.block_size,
              n_shards=cfg.n_shards, keep_positions=keep_pos)
    # same two-stage merge as build_index, dispatched on the INDEX's
    # tokenizer (recorded in stats at build time): bounded SPM vocab →
    # per-group map_groups, open word vocab → segment-vectorized buckets
    segments = B.merge_partials_to_segments(
        partials, kw, merge_parts=B._merge_partitions(cfg),
        salt_bits=salt_bits,
        tokenizer=old_stats.get("tokenizer", cfg.tokenizer),
    )
    new_dir = cfg.segments_dir + ".compact"
    shutil.rmtree(new_dir, ignore_errors=True)
    try:
        segments.write_parquet(new_dir, partition_cols=["termhash"])
    except TypeError:
        segments.write_parquet(new_dir)

    old_dir = cfg.segments_dir + ".old"
    shutil.rmtree(old_dir, ignore_errors=True)
    os.rename(cfg.segments_dir, old_dir)
    os.rename(new_dir, cfg.segments_dir)
    shutil.rmtree(old_dir, ignore_errors=True)

    new_stats = dict(old_stats) | {
        "n_docs": n, "avgdl": avgdl, "total_postings": sum_dl,
        "compacted_tombstones": int(tombs.size),
    }
    with open(cfg.stats_path, "w") as f:
        json.dump(new_stats, f, indent=1)
    p = tombstone_path(index_dir)
    if os.path.exists(p):
        os.remove(p)
    return new_stats
