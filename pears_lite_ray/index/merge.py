"""Index union: import a foreign index and merge it (SURVEY S7).

The reference "subscribes" to a pod by downloading a pre-vectorized index
file and inserting its rows one at a time
(``app/pod_finder/controllers.py:113-212``). Here importing a foreign index
is a UNION of two already-built segment tables: read both as Ray datasets,
``ds.union``, re-group by term — ``ConcatSubSegments`` already merges
arbitrary per-term sub-lists (ordered ranges concatenate; overlapping
ranges fall back to an exact re-merge), so cross-index doc interleaving
needs no special path. Stats recombine additively.

Duplicate doc_ids across indexes (same url indexed in both) resolve to a
SINGLE winner — index A by precedence: identical-content copies collapse
via the merge's byte-identical first-occurrence dedup, and copies with
DIFFERENT content (detected by a distributed content-signature scan; only
the conflicting ids reach the driver) drop index B's postings and staging
rows, so postings, doclens and stats all describe A's version.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..config import BM25_B, BM25_K1, BuildConfig
from ..stages.postings import ConcatSubSegments


def _staging_partitions(*dirs: str) -> int:
    """Data-sized hash-shuffle partition count from the staging dirs' byte
    size (default 200 partitions spawn dozens of aggregator actors for a
    metadata shuffle — see pipelines/common.shuffle_partitions)."""
    import ray

    total = 0
    for d in dirs:
        p = os.path.join(d, "staging")
        # walk RECURSIVELY: the build writes per-wave subdirectories
        # (staging/wave-<id>/*.parquet) — a flat listdir sees zero bytes
        # and silently collapses the shuffle to its floor partition count
        for root, _, files in os.walk(p):
            total += sum(
                os.path.getsize(os.path.join(root, f))
                for f in files if f.endswith(".parquet")
            )
    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return int(max(8, min(total // (64 << 20), 4 * cpus)))


#: Ceiling on the doc_ids-in-both-indexes-with-different-content set that
#: the union broadcasts to every term-merge task (8 B/id ≈ 40 MB at the
#: cap). A foreign-pod import (S7, the reference's use case) is
#: mostly-disjoint, so conflicts are re-crawled pages — rare by nature;
#: hitting the cap means the inputs are the same corpus re-crawled, where
#: a staging-level rebuild (hash-partitioned winner shuffle, no broadcast)
#: is the right tool.
MERGE_CONFLICTS_CAP = 5_000_000


def _union_doc_scan(dir_a: str, dir_b: str) -> tuple[int, int, "np.ndarray"]:
    """ONE pass over both stagings → (n_docs, total_postings, conflicts).

    Counting each distinct doc_id ONCE: a doc present in both indexes keeps
    index A's posting rows in the merge (union lists A first; the fallback
    merge's stable sort keeps the first occurrence), so its doclen is taken
    from A. ``conflicts`` = doc_ids present in BOTH indexes with DIFFERENT
    tokenized content, detected by an FNV-1a signature over the doc's
    term_ids bytes (vectorized batch kernel) xor-folded with doclen —
    identical-content shares need no exclusion because their postings are
    byte-identical and the merge's first-occurrence dedup is exact.

    Fused on purpose: doc stats and conflict detection each need a
    groupby(doc_id) over both stagings; doing them separately pays the scan
    and the all-to-all twice. One scan emits (doc_id, dl_a/b, sig_a/b), one
    hash shuffle groups it, and the per-doc grouped table (tiny: 5 ints per
    distinct doc, object-store-resident) feeds both consumers — only the
    conflicting ids (re-crawled content — rare) reach the driver."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Max, Sum

    from ..pipelines.common import fnv1a_slices

    def tag(src_a: bool):
        def f(t: pa.Table) -> pa.Table:
            col = t["term_ids"]
            arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            lens = arr.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
            buf = np.ascontiguousarray(flat).view(np.uint8)
            byte_lens = lens * 8
            starts = np.r_[np.int64(0), np.cumsum(byte_lens)[:-1]]
            h = fnv1a_slices(buf, starts, byte_lens)
            sig = (h ^ t["doclen"].cast(pa.int64()).to_numpy().astype(np.uint64)
                   ).view(np.int64)
            sig_col = pa.array(sig, pa.int64())
            dl = t["doclen"].cast(pa.int64())
            null = pa.nulls(len(t), pa.int64())
            return pa.table(
                {
                    "doc_id": t["doc_id"],
                    "dl_a": dl if src_a else null,
                    "dl_b": null if src_a else dl,
                    "sig_a": sig_col if src_a else null,
                    "sig_b": null if src_a else sig_col,
                }
            )
        return f

    cols = ["doc_id", "doclen", "term_ids"]
    per_doc = (
        rd.read_parquet(os.path.join(dir_a, "staging"), columns=cols)
        .map_batches(tag(True), batch_format="pyarrow")
        .union(
            rd.read_parquet(os.path.join(dir_b, "staging"), columns=cols)
            .map_batches(tag(False), batch_format="pyarrow")
        )
        .groupby("doc_id", num_partitions=_staging_partitions(dir_a, dir_b))
        .aggregate(Max("dl_a", alias_name="dl_a"),
                   Max("dl_b", alias_name="dl_b"),
                   Max("sig_a", alias_name="sig_a"),
                   Max("sig_b", alias_name="sig_b"))
        .materialize()
    )

    def keep_conflicts(t: pa.Table) -> pa.Table:
        both = pc.and_(pc.is_valid(t["sig_a"]), pc.is_valid(t["sig_b"]))
        diff = pc.not_equal(t["sig_a"], t["sig_b"])
        return t.select(["doc_id"]).filter(pc.and_(both, diff))

    conf_ds = per_doc.map_batches(keep_conflicts, batch_format="pyarrow")
    n_conf = conf_ds.count()
    if n_conf > MERGE_CONFLICTS_CAP:
        raise ValueError(
            f"index union found {n_conf:,} conflicting doc_ids (same id, "
            f"different content in both inputs) — above the "
            f"{MERGE_CONFLICTS_CAP:,} broadcast cap. The union's winner "
            f"resolution broadcasts the conflict set to every term-merge "
            f"task; a conflict set this large means the inputs are "
            f"re-crawls of the SAME corpus, not a foreign-pod import. "
            f"Rebuild from the union of the stagings instead "
            f"(index/build.py), which resolves winners with a "
            f"hash-partitioned shuffle and never broadcasts."
        )
    parts = conf_ds.take_all()
    conflicts = np.array(sorted(int(r["doc_id"]) for r in parts), dtype=np.int64)

    def pick(t: pa.Table) -> pa.Table:
        dl = pc.coalesce(t["dl_a"], t["dl_b"])
        return pa.table({"one": pa.nulls(len(t), pa.int64()).fill_null(1),
                         "dl": dl})

    agg = per_doc.map_batches(pick, batch_format="pyarrow").aggregate(
        Count(alias_name="n"), Sum("dl", alias_name="sum_dl")
    )
    return int(agg["n"] or 0), int(agg["sum_dl"] or 0), conflicts


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
    # doc_ids in both indexes with DIFFERENT content: index A wins; B's
    # postings/staging rows for those ids are dropped below
    n, total, conflicts = _union_doc_scan(dir_a, dir_b)
    avgdl = total / n if n else 0.0
    keep_pos = bool(sa.get("keep_positions", True)) and bool(sb.get("keep_positions", True))

    def tag_src(val: int):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(
                "src", pa.array(np.full(len(t), val, dtype=np.int8))
            )
        return f

    segs = rd.read_parquet(os.path.join(dir_a, "segments")).map_batches(
        tag_src(0), batch_format="pyarrow"
    ).union(
        rd.read_parquet(os.path.join(dir_b, "segments")).map_batches(
            tag_src(1), batch_format="pyarrow"
        )
    )
    concat = ConcatSubSegments(
        avgdl=avgdl, k1=BM25_K1, b=BM25_B, block_size=cfg.block_size,
        n_shards=cfg.n_shards, keep_positions=keep_pos,
    )
    # broadcast the conflict set ONCE (ray.put → zero-copy local fetch per
    # task) instead of closure-capturing the array, which would ship it
    # with every serialized term-merge task
    import ray as _ray

    excl_ref = _ray.put(conflicts) if conflicts.size else None

    def merge_group(t: pa.Table) -> pa.Table:
        # ALWAYS take the exact decode+re-encode path: the union changes
        # avgdl, and block_max bounds baked with a smaller avgdl would
        # under-estimate the new tf-norms — inadmissible for WAND pruning.
        # Exact re-encoding restores tight, correct bounds; a union is rare
        # and costs the same as a compaction.
        excl = _ray.get(excl_ref) if excl_ref is not None else None
        return concat._fallback_merge(t, exclude_src1=excl)

    # data-size the sort-shuffle: the partitioned-parquet read yields one
    # micro-block per termhash dir and the groupby barrier pays per block
    merged = (
        segs.repartition(_staging_partitions(dir_a, dir_b))
        .groupby("term_id")
        .map_groups(merge_group, batch_format="pyarrow")
    )
    seg_out = os.path.join(out_dir, "segments")
    shutil.rmtree(seg_out, ignore_errors=True)
    try:
        merged.write_parquet(seg_out, partition_cols=["termhash"])
    except TypeError:
        merged.write_parquet(seg_out)

    # staging union (doc metadata for lookups); B's rows for conflicting
    # doc_ids drop so lookups see the winner's (A's) metadata
    stage_out = os.path.join(out_dir, "staging")
    if os.path.abspath(stage_out) not in (
        os.path.abspath(os.path.join(dir_a, "staging")),
        os.path.abspath(os.path.join(dir_b, "staging")),
    ):
        shutil.rmtree(stage_out, ignore_errors=True)
        b_staging = rd.read_parquet(os.path.join(dir_b, "staging"))
        if conflicts.size:
            def drop_conflicts(t: pa.Table) -> pa.Table:
                keep = ~np.isin(t["doc_id"].to_numpy(), _ray.get(excl_ref))
                return t.filter(pa.array(keep))

            b_staging = b_staging.map_batches(drop_conflicts,
                                              batch_format="pyarrow")
        rd.read_parquet(os.path.join(dir_a, "staging")).union(
            b_staging
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
