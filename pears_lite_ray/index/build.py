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
from ..stages.extract import ExtractStage, PassthroughExtract
from ..stages.postings import MergeTermGroup, explode_partials
from ..stages.tokenize import TokenizeStage
from ..state.manifest import BuildManifest

META_COLS = ["doc_id", "url", "warc_ts", "title", "snippet", "lang", "doclen"]
POSTING_COLS = ["doc_id", "doclen", "term_ids", "positions"]


def _pool_concurrency(setting, n_pools: int = 2):
    """Resolve "auto" actor-pool sizing against the live cluster.

    Min stays at 1 so the pools plus the read/write task operators always fit
    in the CPU budget; max splits the CPUs (minus a 2-CPU reserve for the
    task operators) across the ``n_pools`` stateful stages.
    """
    if setting != "auto":
        return setting
    cpus = int(ray.cluster_resources().get("CPU", 4))
    return (1, max(1, (cpus - 2) // n_pools))


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
    per_wave = int(cfg.extra.get("files_per_wave", 8))
    for w in range(0, len(pending), per_wave):
        wave = pending[w:w + per_wave]
        wave_paths = [p for _, p in wave]
        wave_id = hashlib.blake2b("\n".join(wave_paths).encode(), digest_size=6).hexdigest()
        out_dir = os.path.join(cfg.staging_dir, f"wave-{wave_id}")
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.perf_counter()
        ds = rd.read_parquet(wave_paths)
        if mode == "html":
            ds = ds.map_batches(
                ExtractStage,
                fn_constructor_kwargs={"installed_languages": cfg.languages},
                batch_format="pyarrow",
                batch_size=cfg.batch_size,
                concurrency=_pool_concurrency(cfg.extract_concurrency),
                num_cpus=1,
            )
        else:
            ds = ds.map_batches(PassthroughExtract, batch_format="pyarrow",
                                batch_size=cfg.batch_size, concurrency=2)
        ds = ds.map_batches(
            TokenizeStage,
            fn_constructor_kwargs={"vocab_path": cfg.vocab_path, "kind": cfg.tokenizer},
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            concurrency=_pool_concurrency(cfg.tokenize_concurrency),
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


def _staging_ds(cfg: BuildConfig, columns: list[str]):
    return rd.read_parquet(cfg.staging_dir, columns=columns)


def dedup_and_stats(cfg: BuildConfig) -> tuple[dict, np.ndarray, pa.Table | None]:
    """Phase 2 → (stats, loser_doc_ids_sorted, winners_table[staging schema])."""
    meta = _staging_ds(cfg, ["doc_id", "warc_ts", "doclen"])
    dup_pdf = (
        meta.groupby("doc_id")
        .aggregate(Count(alias_name="cnt"))
        .map_batches(lambda t: t.filter(pc.greater(t["cnt"], 1)), batch_format="pyarrow")
        .to_pandas()
    )
    dup_ids = np.sort(dup_pdf["doc_id"].to_numpy()) if len(dup_pdf) else np.empty(0, np.int64)

    winners: pa.Table | None = None
    if dup_ids.size:
        # duplicate rows are rare: pull them driver-side and resolve exactly
        # (winner = max warc_ts, tie-break url asc then first-read — a total
        # order, so the result is deterministic under any parallelism).
        refs = rd.read_parquet(
            cfg.staging_dir, filter=pc.field("doc_id").isin(pa.array(dup_ids))
        ).to_arrow_refs()
        tbls = [t for t in ray.get(refs) if t.num_rows]
        full = pa.concat_tables(tbls).combine_chunks()
        key = full.select(["doc_id", "warc_ts", "url"]).to_pandas()
        keep = (
            key.sort_values(["doc_id", "warc_ts", "url"],
                            ascending=[True, False, True], kind="stable")
            .drop_duplicates("doc_id", keep="first")
            .index.to_numpy()
        )
        winners = full.take(pa.array(np.sort(keep)))

    # stats over non-dup rows + winner rows
    if dup_ids.size:
        id_set = pa.array(dup_ids)
        base = meta.map_batches(
            lambda t: t.filter(pc.invert(pc.is_in(t["doc_id"], value_set=id_set))),
            batch_format="pyarrow",
        )
    else:
        base = meta
    agg = base.aggregate(Count(alias_name="n"), Sum("doclen", alias_name="sum_dl"))
    n = int(agg["n"] or 0)
    sum_dl = int(agg["sum_dl"] or 0)
    if winners is not None:
        n += winners.num_rows
        sum_dl += int(pc.sum(winners["doclen"]).as_py() or 0)
    stats = {
        "n_docs": n,
        "avgdl": (sum_dl / n) if n else 0.0,
        "total_postings": sum_dl,
        "n_duplicate_doc_ids": int(dup_ids.size),
    }
    return stats, dup_ids, winners


def _drop_losers(ds, dup_ids: np.ndarray, winners: pa.Table | None, columns: list[str]):
    """Semi-anti-join against the (small, broadcast) duplicate id set, then
    union the resolved winner rows back in."""
    if not dup_ids.size or winners is None:
        return ds
    id_set = pa.array(dup_ids)

    def drop(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(pc.is_in(t["doc_id"], value_set=id_set)))

    ds = ds.map_batches(drop, batch_format="pyarrow")
    return ds.union(rd.from_arrow(winners.select(columns)))


def build_index(input_paths: list[str], cfg: BuildConfig) -> dict:
    """Full build. Returns the build report (also written to out_dir)."""
    os.makedirs(cfg.out_dir, exist_ok=True)
    report: dict = {"input_files": len(input_paths), "tokenizer": cfg.tokenizer}
    t_start = time.perf_counter()

    t0 = time.perf_counter()
    stage_partitions(input_paths, cfg, report)
    report["stage_sec"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    stats, dup_ids, winners = dedup_and_stats(cfg)
    report["dedup_stats_sec"] = round(time.perf_counter() - t0, 3)

    # docs table
    t0 = time.perf_counter()
    docs = _staging_ds(cfg, META_COLS)
    docs = _drop_losers(docs, dup_ids, winners, META_COLS)
    docs.write_parquet(cfg.docs_dir)
    report["docs_sec"] = round(time.perf_counter() - t0, 3)

    # segments
    t0 = time.perf_counter()
    post = _staging_ds(cfg, POSTING_COLS)
    post = _drop_losers(post, dup_ids, winners, POSTING_COLS)
    keep_pos = cfg.keep_positions
    partials = post.map_batches(
        lambda t: explode_partials(t, keep_positions=keep_pos),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )
    merger = MergeTermGroup(
        avgdl=stats["avgdl"], k1=BM25_K1, b=BM25_B,
        block_size=cfg.block_size, n_shards=cfg.n_shards,
        keep_positions=keep_pos,
    )

    def merge_group(t: pa.Table) -> pa.Table:
        return merger(t)

    segments = partials.groupby("term_id").map_groups(merge_group, batch_format="pyarrow")
    try:
        segments.write_parquet(cfg.segments_dir, partition_cols=["termhash"])
    except TypeError:  # older Ray without partition_cols
        segments.write_parquet(cfg.segments_dir)
    report["segments_sec"] = round(time.perf_counter() - t0, 3)

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
    report["docs_bytes"] = _dir_bytes(cfg.docs_dir)

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
