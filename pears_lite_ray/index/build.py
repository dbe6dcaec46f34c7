"""Index build driver: corpus parquet → staged tokenized docs → docs table +
stats + compressed sharded segments (SURVEY §3.4, §7.1).

Three phases, all Ray Data pipelines (streaming, no full materialization):

1. **Stage** (per input partition, resumable): read_parquet →
   ExtractStage (actor pool) → TokenizeStage (actor pool) →
   write_parquet(staging/part-i). The staging dataset is the checkpoint;
   completed partitions are skipped on resume via manifests.
2. **Dedup + stats** (metadata-only columns): find doc_ids seen in more than
   one row (cross-partition url duplicates; J3 ↔ mk_page_vector.py:37),
   resolve winners (max warc_ts, deterministic tie-break), and compute
   global N / avgdl — needed before segment encoding (BM25 tf-norm).
3. **Build**: staging → drop duplicate losers → docs table write; explode to
   per-batch partial posting lists → groupby(term_id) shuffle →
   per-term merge+encode → sharded segments write.

The dup winner set is assumed SMALL relative to the corpus (it is read
driver-side); the loser filter is a vectorized np.isin inside map_batches —
a broadcast semi-join, not a shuffle.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..config import BM25_B, BM25_K1, BuildConfig
from ..stages.fused import FusedExtractTokenize
from ..stages.postings import (
    ConcatSubSegments,
    concat_subsegments_bucket,
    explode_partials,
    merge_partials_bucket,
)
from ..state.manifest import BuildManifest

META_COLS = ["doc_id", "url", "warc_ts", "title", "snippet", "lang", "pod", "doctype", "doclen"]
POSTING_COLS = ["doc_id", "doclen", "term_ids", "positions"]


def _pool_concurrency(setting, n_pools: int = 2):
    """Resolve "auto" actor-pool sizing against the live cluster.

    Returns a FIXED pool size: (CPUs - 2 reserved for the read/write task
    operators) / n_pools. An autoscaling (1, max) pool ramps up too slowly
    to matter within a wave (measured 14 s vs 5.5 s on a 32-CPU build) —
    the wave is the unit of work and saturates immediately, so start every
    actor up front.
    """
    if setting != "auto":
        return setting
    cpus = int(ray.cluster_resources().get("CPU", 4))
    return max(1, (cpus - 2) // n_pools)


def _input_mode(path: str) -> str:
    schema = pq.ParquetFile(path).schema_arrow
    return "html" if "html" in schema.names else "text"


def _dir_bytes(d: str) -> int:
    total = 0
    for root, _, files in os.walk(d):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def stage_partitions(input_paths: list[str], cfg: BuildConfig, report: dict) -> None:
    """Phase 1: extract+tokenize input partitions into staging/ (resume-aware).

    Pending files are processed in **waves** (``files_per_wave`` inputs per
    pipeline) so actor pools are reused across files instead of being torn
    down per file; each wave is one checkpoint unit (its staging dir is
    rewritten atomically-enough: deleted before reprocessing, manifests
    written only after the write completes)."""
    import hashlib
    import shutil

    manifest = BuildManifest(cfg.manifest_dir)
    mode = _input_mode(input_paths[0])
    pending = [
        (part, path)
        for part, path in enumerate(input_paths)
        if not manifest.is_done(part, path)
    ]
    report["stage_partitions_skipped_on_resume"] = len(input_paths) - len(pending)
    # a wave must feed every actor AND amortize the per-wave fixed cost:
    # each wave spawns a fresh actor pool (vocab load per actor) and pays a
    # Ray job ramp. At CPUs files/wave a 32-CPU build ran 8 waves of ~6 s
    # work + ~3 s overhead each — ~30% of the stage. 8× CPUs per wave keeps
    # the checkpoint unit at ~1 min of work while the overhead amortizes;
    # resume granularity stays per-wave (cfg.extra["files_per_wave"]
    # overrides for finer checkpoints on flaky clusters).
    default_wave = max(8, 8 * int(ray.cluster_resources().get("CPU", 8)))
    per_wave = int(cfg.extra.get("files_per_wave", default_wave))
    for w in range(0, len(pending), per_wave):
        wave = pending[w:w + per_wave]
        wave_paths = [p for _, p in wave]
        wave_id = hashlib.blake2b("\n".join(wave_paths).encode(), digest_size=6).hexdigest()
        out_dir = os.path.join(cfg.staging_dir, f"wave-{wave_id}")
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.perf_counter()
        ds = rd.read_parquet(wave_paths)
        # one fused actor pool: extract+tokenize never ship the intermediate
        # text column through the object store (see stages/fused.py)
        ds = ds.map_batches(
            FusedExtractTokenize,
            fn_constructor_kwargs={
                "vocab_path": cfg.vocab_path,
                "kind": cfg.tokenizer,
                "installed_languages": cfg.languages,
                "mode": mode,
            },
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            concurrency=_pool_concurrency(cfg.extract_concurrency, n_pools=1),
            num_cpus=1,
        )
        ds.write_parquet(out_dir)
        rows_out = sum(
            pq.ParquetFile(os.path.join(out_dir, f)).metadata.num_rows
            for f in os.listdir(out_dir) if f.endswith(".parquet")
        )
        wall = time.perf_counter() - t0
        for part, path in wave:
            manifest.mark_done(part, path,
                               rows_in=pq.ParquetFile(path).metadata.num_rows,
                               rows_out=rows_out, output_dir=out_dir,
                               wall_sec=wall)


def _staging_ds(cfg: BuildConfig, columns: list[str], blocks: int | None = None):
    kw = {"override_num_blocks": blocks} if blocks else {}
    return rd.read_parquet(cfg.staging_dir, columns=columns, **kw)


def _meta_blocks(cfg: BuildConfig) -> int:
    """Block count for metadata-only scans, sized by DATA VOLUME (64 MB
    target blocks), clamped to [4, 4×CPUs]. Sizing by CPU count instead
    makes shuffle cost quadratic in cluster size on small data (P map × P
    reduce exchanges of near-empty partitions): a 30k-row groupby measured
    7 s with 32 partitions vs 1.2 s with 8 on this machine."""
    cpus = int(ray.cluster_resources().get("CPU", 4))
    by_size = _dir_bytes(cfg.staging_dir) // (2 << 20)
    return int(max(4, min(by_size, 4 * cpus)))


def merge_partials_to_segments(partials, merge_kwargs: dict, *,
                               merge_parts: int, salt_bits: int,
                               tokenizer: str):
    """The two-stage posting merge ((term_id, salt) → term_id), dispatched
    on the VOCABULARY SHAPE of the tokenizer:

    - **Bounded vocab** (``spm``: the 16k-piece reference vocabulary) —
      per-group ``groupby(...).map_groups(...)``. The group count is
      vocab-bounded (≤ 16k × 2**salt_bits) INDEPENDENT of corpus size, so
      the per-group Python-call overhead is a constant, and Ray's sort
      shuffle keeps full input-block-width parallelism. Measured at 512k
      docs / 32 CPUs: 26 s vs 42 s for the bucketed path (whose sequential
      whole-bucket decode/encode kernels serialize more work per task).
    - **Open vocab** (``regex`` word tokenizer: ``term_id`` is a 63-bit
      content hash, vocab.py:173) — SEGMENT-VECTORIZED buckets
      (``common.segmented_group_map``): one UDF call per term-hash bucket,
      not per term. Per-group calls here would be O(distinct terms) =
      O(10⁸⁺) at web scale, dominated by the df=1 long tail — the SURVEY
      §4.3 pathology. Measured at 512k docs / 32 CPUs: merge stage 256 s
      per-group → 57 s bucketed (4.5×).

    Both paths produce byte-identical SEGMENT_SCHEMA rows
    (tests/test_salted.py pins bucket ≡ per-group)."""
    from ..stages.postings import MergeTermGroup

    if tokenizer == "spm":
        merger = MergeTermGroup(**merge_kwargs)
        sub = partials.groupby(["term_id", "salt"]).map_groups(
            lambda t: merger(t), batch_format="pyarrow"
        )
        if salt_bits > 0:
            concat = ConcatSubSegments(**merge_kwargs)
            return sub.groupby("term_id").map_groups(
                lambda t: concat(t), batch_format="pyarrow"
            )
        return sub

    from ..pipelines.common import segmented_group_map

    sub = segmented_group_map(
        partials, ["term_id", "salt"],
        lambda t, s: merge_partials_bucket(t, s, **merge_kwargs),
        num_partitions=merge_parts,
    )
    if salt_bits > 0:
        concat = ConcatSubSegments(**merge_kwargs)
        # stage-2: tiny shuffle over ≤ 2**salt_bits encoded rows per term;
        # single-row (cold-term) groups pass through byte-identical in one
        # vectorized filter, ordered hot-term sub-ranges concatenate
        # without re-encoding
        return segmented_group_map(
            sub, "term_id",
            lambda t, s: concat_subsegments_bucket(t, s, concat),
            num_partitions=merge_parts,
        )
    return sub


def _merge_partitions(cfg: BuildConfig) -> int:
    """Partition count for the posting-merge shuffles: data-sized (32 MB
    of staging payload per partition — partials are varbyte-compressed,
    roughly the staging term/position volume) but never BELOW 2×CPUs.

    The lower clamp is load-bearing: after the segment-vectorized merge
    (one UDF call per partition-bucket) the merge COMPUTE runs in exactly
    this many tasks, so a small-corpus byte estimate of 8 would leave
    24 of 32 cores idle through the most expensive build stage — measured
    512k-doc word-mode-path builds: 98 s at 8 partitions vs 42 s at
    2×CPUs, same window. The upper clamp (4×CPUs) still bounds near-empty-partition
    shuffle overhead on small data; at cluster scale the byte term
    dominates and CPUs = cluster-wide CPU count."""
    cpus = int(ray.cluster_resources().get("CPU", 4))
    by_size = _dir_bytes(cfg.staging_dir) // (32 << 20)
    return int(max(2 * cpus, min(by_size, 4 * cpus)))


# Duplicate groups above this many ROWS are not pulled driver-side: the
# "dups are rare" broadcast-filter fast path gives way to a distributed
# groupby(doc_id) winner resolution (a dup-heavy crawl — 30-50% url dups
# is common at scale — would otherwise OOM the driver).
DUP_DRIVER_ROW_CAP = 1_000_000


def dedup_and_stats(cfg: BuildConfig) -> tuple[dict, np.ndarray, dict | None, dict | None]:
    """Phase 2 → (stats, dup_doc_ids_sorted, winner_ts, winner_url).

    One groupby over the doc_id column finds cross-partition duplicates; one
    unfiltered aggregate computes row/token totals; dup groups (rare) are
    pulled driver-side with a parquet predicate and the totals adjusted by
    the losers — no second filtered scan of the staging data.

    ``winner_ts is None`` signals the DISTRIBUTED path: the duplicate set
    exceeded DUP_DRIVER_ROW_CAP, nothing dup-related was pulled to the
    driver, stats were computed by a distributed per-doc winner aggregate,
    and the caller must resolve winners with ``_filter_winners(ds,
    dup_ids, None, None)`` (a groupby(doc_id) argmax) instead of the
    broadcast filter."""
    nb = _meta_blocks(cfg)
    per_block_cap = max(1, DUP_DRIVER_ROW_CAP // nb)

    def summarize(t: pa.Table) -> pa.Table:
        """Per grouped block: one totals row (doc_id = -1), one dup-count
        marker row (doc_id = -2: cnt = #dup ids, dl = #dup rows), and the
        dup rows themselves ONLY while the block is under the driver-pull
        cap — an over-cap block emits just its marker, so the driver pull
        stays bounded no matter how dup-heavy the corpus is."""
        dups = t.filter(pc.greater(t["cnt"], 1))
        head = pa.table(
            {
                "doc_id": pa.array([-1, -2], pa.int64()),
                "cnt": pa.array(
                    [int(pc.sum(t["cnt"]).as_py() or 0), dups.num_rows],
                    pa.int64(),
                ),
                "dl": pa.array(
                    [int(pc.sum(t["dl"]).as_py() or 0),
                     int(pc.sum(dups["cnt"]).as_py() or 0)],
                    pa.int64(),
                ),
            }
        )
        if dups.num_rows > per_block_cap:
            return head
        return pa.concat_tables([head, dups.select(["doc_id", "cnt", "dl"])])

    summary = (
        _staging_ds(cfg, ["doc_id", "doclen"], nb)
        # data-sized partitions: the default 200-partition hash aggregate
        # spawns up to 64 aggregator actors for a metadata-column shuffle
        .groupby("doc_id", num_partitions=nb)
        .aggregate(Count(alias_name="cnt"), Sum("doclen", alias_name="dl"))
        .map_batches(summarize, batch_format="pyarrow")
        .to_pandas()
    )
    totals = summary[summary["doc_id"] == -1]
    markers = summary[summary["doc_id"] == -2]
    dup_pdf = summary[summary["doc_id"] >= 0]
    n_dup_ids = int(markers["cnt"].sum())
    n_dup_rows = int(markers["dl"].sum())
    n = int(totals["cnt"].sum())
    sum_dl = int(totals["dl"].sum())

    if n_dup_ids != len(dup_pdf) or n_dup_rows > DUP_DRIVER_ROW_CAP:
        # over the cap: resolve winners distributed — one metadata-column
        # groupby picks each doc's (warc_ts desc, url asc) winner and
        # aggregates exact n / sum_dl; no dup data touches the driver
        agg = (
            _filter_winners(
                _staging_ds(cfg, ["doc_id", "warc_ts", "url", "doclen"], nb),
                np.array([0], dtype=np.int64), None, None,
                num_partitions=nb,
            )
            .aggregate(Count(alias_name="n"), Sum("doclen", alias_name="sum_dl"))
        )
        n_win = int(agg["n"] or 0)
        dl_win = int(agg["sum_dl"] or 0)
        stats = {
            "n_docs": n_win,
            "avgdl": (dl_win / n_win) if n_win else 0.0,
            "total_postings": dl_win,
            "n_duplicate_doc_ids": n_dup_ids,
            "dup_resolution": "distributed",
        }
        return stats, np.array([0], dtype=np.int64), None, None

    dup_ids = np.sort(dup_pdf["doc_id"].to_numpy()) if len(dup_pdf) else np.empty(0, np.int64)

    winner_ts: dict[int, int] = {}
    winner_url: dict[int, str] = {}
    if dup_ids.size:
        # duplicate groups are rare: pull their LIGHT columns driver-side
        # (no term_ids/positions lists — reading the full staging schema
        # through an isin predicate cost seconds) and resolve winners:
        # max warc_ts, tie-break url asc — a total order, deterministic
        # under any parallelism.
        full = (
            rd.read_parquet(
                cfg.staging_dir,
                columns=["doc_id", "warc_ts", "url", "doclen"],
                filter=pc.field("doc_id").isin(pa.array(dup_ids)),
            )
            .to_pandas()
        )
        full["warc_ts"] = full["warc_ts"].astype("int64")
        ordered = full.sort_values(["doc_id", "warc_ts", "url"],
                                   ascending=[True, False, True], kind="stable")
        win = ordered.drop_duplicates("doc_id", keep="first")
        winner_ts = dict(zip(win["doc_id"], win["warc_ts"]))
        # url tie-break only needed where the winning warc_ts is ambiguous
        ts_amb = ordered.groupby("doc_id")["warc_ts"].apply(
            lambda s: (s == s.iloc[0]).sum() > 1
        )
        for d in ts_amb[ts_amb].index:
            winner_url[int(d)] = win.loc[win["doc_id"] == d, "url"].iloc[0]
        # subtract the losers from the all-rows totals
        n -= len(full) - len(win)
        sum_dl -= int(full["doclen"].sum()) - int(win["doclen"].sum())

    stats = {
        "n_docs": n,
        "avgdl": (sum_dl / n) if n else 0.0,
        "total_postings": sum_dl,
        "n_duplicate_doc_ids": int(dup_ids.size),
    }
    return stats, dup_ids, winner_ts, winner_url


def _filter_winners(ds, dup_ids: np.ndarray, winner_ts: dict | None,
                    winner_url: dict | None, num_partitions: int | None = None):
    """Drop duplicate-id LOSER rows via the broadcast winner-key maps — a
    semi-join as a stateless filter, no union / re-shipping of winner rows.

    Rows whose (doc_id, warc_ts[, url]) equals the winner key pass through
    where they already are. Exact-identity duplicates (same id, ts AND url
    in different partitions) both survive here; the term merge drops the
    repeat deterministically (identical rows ⇒ identical postings).

    ``winner_ts is None`` = the DISTRIBUTED path (dup set over
    DUP_DRIVER_ROW_CAP): each doc's (warc_ts desc, url asc) winner row is
    kept by a segment kernel — an honest full shuffle of ``ds``, the right
    cost in a dup-heavy crawl where no broadcast fits, with one UDF call
    per hash bucket rather than per doc (a dup-heavy crawl has ~N groups;
    see ``pipelines.common.segmented_group_map``)."""
    if not dup_ids.size:
        return ds
    if winner_ts is None:
        import ray

        from ..pipelines.common import segmented_group_map

        if num_partitions is None:
            cpus = int(ray.cluster_resources().get("CPU", 4))
            num_partitions = 4 * cpus

        def pick_winner_bucket(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
            # Staging invariant: warc_ts is non-null (every source writer
            # stamps it). Arrow's sort places nulls LAST regardless of
            # direction, which would silently give null-ts rows a
            # different rank under (warc_ts desc, url asc) than the
            # broadcast path's int64 cast (which refuses nulls) — fail
            # loudly instead of diverging.
            if tbl["warc_ts"].null_count:
                raise ValueError(
                    "null warc_ts in staging rows — the duplicate-winner "
                    "rule (warc_ts desc, url asc) requires non-null "
                    "timestamps at this stage boundary"
                )
            mask = np.zeros(tbl.num_rows, dtype=bool)
            mask[starts] = True
            out = tbl.filter(pa.array(mask))
            return out.drop_columns(
                [c for c in ("warc_ts", "url") if c in out.column_names]
            )

        return segmented_group_map(
            ds,
            "doc_id",
            pick_winner_bucket,
            num_partitions=num_partitions,
            sort_keys=[
                ("doc_id", "ascending"),
                ("warc_ts", "descending"),
                ("url", "ascending"),
            ],
        )
    dup_set = pa.array(dup_ids)

    def keep_winners(t: pa.Table) -> pa.Table:
        isdup = pc.is_in(t["doc_id"], value_set=dup_set).to_numpy(zero_copy_only=False)
        if not isdup.any():
            return t.drop_columns([c for c in ("warc_ts", "url") if c in t.column_names])
        ids = t["doc_id"].to_numpy()
        ts = t["warc_ts"].cast(pa.int64()).to_numpy()
        urls = t["url"].to_pylist() if winner_url else None
        keep = np.ones(len(t), dtype=bool)
        for i in np.nonzero(isdup)[0]:
            d = int(ids[i])
            if ts[i] != winner_ts.get(d, ts[i]):
                keep[i] = False
            elif urls is not None and d in winner_url and urls[i] != winner_url[d]:
                keep[i] = False
        out = t.filter(pa.array(keep))
        return out.drop_columns([c for c in ("warc_ts", "url") if c in out.column_names])

    return ds.map_batches(keep_winners, batch_format="pyarrow")


def build_index(input_paths: list[str], cfg: BuildConfig) -> dict:
    """Full build. Returns the build report (also written to out_dir)."""
    os.makedirs(cfg.out_dir, exist_ok=True)
    report: dict = {"input_files": len(input_paths), "tokenizer": cfg.tokenizer}
    t_start = time.perf_counter()

    t0 = time.perf_counter()
    stage_partitions(input_paths, cfg, report)
    report["stage_sec"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    stats, dup_ids, winner_ts, winner_url = dedup_and_stats(cfg)
    report["dedup_stats_sec"] = round(time.perf_counter() - t0, 3)

    # no separate docs-table write: doc metadata lives in the staging
    # parquet (DocStore reads a projection of it and resolves duplicate-id
    # winners at lookup time — one fewer full read+write of the corpus
    # metadata per build)
    report["docs_sec"] = 0.0

    # segments
    t0 = time.perf_counter()
    post_cols = list(POSTING_COLS)
    if dup_ids.size:  # winner filter needs the timestamp (and url on ties)
        post_cols.append("warc_ts")
        if winner_url or winner_ts is None:  # distributed argmax needs both
            post_cols.append("url")
    post = _staging_ds(cfg, post_cols)
    post = _filter_winners(post, dup_ids, winner_ts, winner_url)
    keep_pos = cfg.keep_positions
    # bigger bundles than the actor stages: explode is ~40 ms per 512 rows,
    # so task-dispatch overhead dominates at small batch sizes — and larger
    # batches also collapse more postings per partial row before the shuffle
    salt_bits, hot_frac = cfg.salt_bits, cfg.hot_frac
    partials = post.map_batches(
        lambda t: explode_partials(t, keep_positions=keep_pos,
                                   salt_bits=salt_bits, hot_frac=hot_frac),
        batch_format="pyarrow",
        batch_size=cfg.batch_size * 8,
    )
    merge_kwargs = dict(
        avgdl=stats["avgdl"], k1=BM25_K1, b=BM25_B,
        block_size=cfg.block_size, n_shards=cfg.n_shards,
        keep_positions=keep_pos,
    )
    segments = merge_partials_to_segments(
        partials, merge_kwargs, merge_parts=_merge_partitions(cfg),
        salt_bits=salt_bits, tokenizer=cfg.tokenizer,
    )
    try:
        segments.write_parquet(cfg.segments_dir, partition_cols=["termhash"])
    except TypeError:  # older Ray without partition_cols
        segments.write_parquet(cfg.segments_dir)
    report["segments_sec"] = round(time.perf_counter() - t0, 3)

    # pods table (Q9/A1): per-pod centroid for query routing. Skippable
    # (extra={"skip_pods": True}) for throwaway sub-builds that only score
    # BM25 — merge/compact/SPM benchmark legs — where the extra Ray job is
    # pure fixed cost.
    if not cfg.extra.get("skip_pods"):
        t0 = time.perf_counter()
        from ..vocab import Vocab
        from .pods import build_pods_table

        vocab = Vocab.load(cfg.vocab_path) if cfg.tokenizer == "spm" else None
        build_pods_table(cfg, vocab)
        report["pods_sec"] = round(time.perf_counter() - t0, 3)

    report.update(stats)
    report["k1"] = BM25_K1
    report["b"] = BM25_B
    report["block_size"] = cfg.block_size
    report["n_shards"] = cfg.n_shards
    report["total_sec"] = round(time.perf_counter() - t_start, 3)
    if report["total_sec"] > 0:
        report["docs_per_sec"] = round(stats["n_docs"] / report["total_sec"], 1)
        report["postings_per_sec"] = round(stats["total_postings"] / report["total_sec"], 1)
    report["staging_bytes"] = _dir_bytes(cfg.staging_dir)
    report["segments_bytes"] = _dir_bytes(cfg.segments_dir)

    with open(cfg.stats_path, "w") as f:
        json.dump(
            dict(stats) | {
                "k1": BM25_K1, "b": BM25_B,
                "tokenizer": cfg.tokenizer,
                "vocab_path": cfg.vocab_path,
                "languages": list(cfg.languages),
                "keep_positions": cfg.keep_positions,
                "n_shards": cfg.n_shards,
                "block_size": cfg.block_size,
            },
            f, indent=1,
        )
    with open(os.path.join(cfg.out_dir, "build_report.json"), "w") as f:
        json.dump(report, f, indent=1)
    return report
