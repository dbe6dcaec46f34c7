"""Index union: import a foreign index and merge it (SURVEY S7).

The reference "subscribes" to a pod by downloading a pre-vectorized index
file and inserting its rows one at a time
(``app/pod_finder/controllers.py:113-212``). Here importing a foreign index
is a UNION of two already-built segment tables: read both as Ray datasets,
``ds.union``, re-group by term — ``ConcatSubSegments`` already merges
arbitrary per-term sub-lists (ordered ranges concatenate; overlapping
ranges fall back to an exact re-merge), so cross-index doc interleaving
needs no special path. Stats recombine additively; duplicate doc_ids across
indexes (same url indexed in both) keep the first occurrence
deterministically in the merge.
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa
import ray.data as rd

from ..config import BM25_B, BM25_K1, BuildConfig
from ..stages.postings import ConcatSubSegments


def _merged_doc_stats(dir_a: str, dir_b: str) -> tuple[int, int]:
    """(n_docs, total_postings) of the union, counting each distinct doc_id
    ONCE. A doc present in both indexes keeps index A's posting rows in the
    merge (union lists A first; the fallback merge's stable sort keeps the
    first occurrence), so its doclen is taken from A. Distributed: one
    groupby over the light (doc_id, doclen) columns of both stagings."""
    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Max, Sum

    def tag(src_a: bool):
        def f(t: pa.Table) -> pa.Table:
            dl = t["doclen"].cast(pa.int64())
            null = pa.nulls(len(t), pa.int64())
            return pa.table(
                {
                    "doc_id": t["doc_id"],
                    "dl_a": dl if src_a else null,
                    "dl_b": null if src_a else dl,
                }
            )
        return f

    ds = (
        rd.read_parquet(os.path.join(dir_a, "staging"),
                        columns=["doc_id", "doclen"])
        .map_batches(tag(True), batch_format="pyarrow")
        .union(
            rd.read_parquet(os.path.join(dir_b, "staging"),
                            columns=["doc_id", "doclen"])
            .map_batches(tag(False), batch_format="pyarrow")
        )
        .groupby("doc_id")
        .aggregate(Max("dl_a", alias_name="dl_a"),
                   Max("dl_b", alias_name="dl_b"))
    )

    def pick(t: pa.Table) -> pa.Table:
        dl = pc.coalesce(t["dl_a"], t["dl_b"])
        return pa.table({"one": pa.nulls(len(t), pa.int64()).fill_null(1),
                         "dl": dl})

    agg = ds.map_batches(pick, batch_format="pyarrow").aggregate(
        Count(alias_name="n"), Sum("dl", alias_name="sum_dl")
    )
    return int(agg["n"] or 0), int(agg["sum_dl"] or 0)


def merge_indexes(dir_a: str, dir_b: str, out_dir: str,
                  cfg: BuildConfig | None = None) -> dict:
    """Union two built indexes into ``out_dir`` (segments + staging + stats)."""
    cfg = cfg or BuildConfig(out_dir=out_dir)
    os.makedirs(out_dir, exist_ok=True)

    stats = {}
    for d in (dir_a, dir_b):
        with open(os.path.join(d, "stats.json")) as f:
            stats[d] = json.load(f)
    sa, sb = stats[dir_a], stats[dir_b]
    if sa.get("tokenizer") != sb.get("tokenizer"):
        raise ValueError("cannot union indexes built with different tokenizers")
    n, total = _merged_doc_stats(dir_a, dir_b)
    avgdl = total / n if n else 0.0
    keep_pos = bool(sa.get("keep_positions", True)) and bool(sb.get("keep_positions", True))

    segs = rd.read_parquet(os.path.join(dir_a, "segments")).union(
        rd.read_parquet(os.path.join(dir_b, "segments"))
    )
    concat = ConcatSubSegments(
        avgdl=avgdl, k1=BM25_K1, b=BM25_B, block_size=cfg.block_size,
        n_shards=cfg.n_shards, keep_positions=keep_pos,
    )

    def merge_group(t: pa.Table) -> pa.Table:
        # ALWAYS take the exact decode+re-encode path: the union changes
        # avgdl, and block_max bounds baked with a smaller avgdl would
        # under-estimate the new tf-norms — inadmissible for WAND pruning.
        # Exact re-encoding restores tight, correct bounds; a union is rare
        # and costs the same as a compaction.
        return concat._fallback_merge(t)

    merged = segs.groupby("term_id").map_groups(merge_group, batch_format="pyarrow")
    seg_out = os.path.join(out_dir, "segments")
    shutil.rmtree(seg_out, ignore_errors=True)
    try:
        merged.write_parquet(seg_out, partition_cols=["termhash"])
    except TypeError:
        merged.write_parquet(seg_out)

    # staging union (doc metadata for lookups)
    stage_out = os.path.join(out_dir, "staging")
    if os.path.abspath(stage_out) not in (
        os.path.abspath(os.path.join(dir_a, "staging")),
        os.path.abspath(os.path.join(dir_b, "staging")),
    ):
        shutil.rmtree(stage_out, ignore_errors=True)
        rd.read_parquet(os.path.join(dir_a, "staging")).union(
            rd.read_parquet(os.path.join(dir_b, "staging"))
        ).write_parquet(stage_out)

    # tombstones carry into the union: segments of either input may still
    # hold postings of tombstoned-but-not-compacted docs, so the merged
    # index must keep masking them until its own compaction (D1 semantics).
    from .maintenance import load_tombstones, tombstone_path

    tomb = sorted(
        set(int(i) for i in load_tombstones(dir_a))
        | set(int(i) for i in load_tombstones(dir_b))
    )
    if tomb:
        with open(tombstone_path(out_dir), "w") as f:
            json.dump({"doc_ids": tomb}, f)

    new_stats = dict(sa) | {
        "n_docs": n,
        "avgdl": avgdl,
        "total_postings": total,
        "merged_from": [dir_a, dir_b],
    }
    with open(os.path.join(out_dir, "stats.json"), "w") as f:
        json.dump(new_stats, f, indent=1)
    return new_stats
