"""Resumable partitioned export of the operator-suite pipelines.

The build pipeline has manifests+resume (state/manifest.py); this gives the
SAME contract to the driver-facing operator pipelines ("resumable output:
partitioned parquet, a failed run skips finished partitions, never one
giant file"):

* PER-DOC pipelines (quality, token_count, langid, fingerprint, simhash,
  docs_table — one output row per input doc, no cross-doc state) shard by
  ``doc_id % n_shards``: each shard reads a filtered projection, runs the
  pipeline over just its slice, writes ``out_dir/shard=<i>/`` and stamps a
  manifest with the input fingerprint. A re-run (after a crash or an input
  refresh) recomputes only shards whose manifest is missing or stale.
* CROSS-DOC pipelines (dedup pair ops, kNN, events — outputs depend on the
  whole corpus) cannot shard without changing semantics; they run once and
  stream to a partitioned parquet directory (one file per block, Ray's
  write path) stamped with a single manifest. Re-runs skip when the
  manifest matches; the honest unit of resume is the whole op.

At 100 TB the per-doc path is the workhorse: shards are independent jobs
over disjoint row sets, so a 256-node fleet can run them as separate
submissions and any lost shard re-runs alone.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

from ..pipelines.common import documents_path

# one output row per input doc, no cross-doc state → shardable by doc_id
PER_DOC = frozenset(
    ["quality", "token_count", "langid", "fingerprint", "simhash",
     "docs_table"]
)

# underscore prefix: pyarrow/parquet dataset readers skip '_'-prefixed
# files, so the manifest can live inside the partition directory
_MANIFEST = "_manifest.json"


def _fingerprint(sf_dir: str) -> dict:
    p = documents_path(sf_dir)
    st = os.stat(p)
    return {"input": os.path.abspath(p), "size": st.st_size,
            "mtime_ns": st.st_mtime_ns}


def _manifest_path(d: str) -> str:
    return os.path.join(d, _MANIFEST)


def _is_done(d: str, fp: dict) -> bool:
    try:
        with open(_manifest_path(d)) as f:
            return json.load(f)["fingerprint"] == fp
    except (OSError, KeyError, json.JSONDecodeError):
        return False


def _stamp(d: str, fp: dict, rows: int) -> None:
    with open(_manifest_path(d) + ".tmp", "w") as f:
        json.dump({"fingerprint": fp, "rows": rows}, f)
    os.replace(_manifest_path(d) + ".tmp", _manifest_path(d))


def _clean_partition(d: str) -> None:
    """Remove a stale/partial partition before recomputing it. Ray 2.49's
    ``write_parquet`` APPENDS with fresh per-run UUID filenames, so a
    crashed or invalidated shard re-written without this cleanup would
    hold BOTH the leftover files and the new copy — duplicated rows in
    exactly the resume scenario the manifest exists for."""
    import shutil

    shutil.rmtree(d, ignore_errors=True)


def _shard_pipeline(fn, sf_dir: str, shard: int, n_shards: int):
    """Build a per-doc pipeline over the ``doc_id % n_shards == shard``
    slice: the doc_shard context makes read_documents apply the slice
    filter right after the read, so shard COMPUTE (tokenize/hash/score)
    is proportional to the slice. Construction is eager enough: the
    filter op is baked into the lazy plan inside the context."""
    from ..pipelines.common import doc_shard

    with doc_shard(shard, n_shards):
        return fn(sf_dir)


def export_pipeline(name: str, fn, sf_dir: str, out_dir: str,
                    n_shards: int = 8) -> dict:
    """Export one queries() pipeline to ``out_dir`` resumably.

    Returns {"computed": [...], "skipped": [...]} shard labels."""
    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)
    fp = _fingerprint(sf_dir)
    computed, skipped = [], []
    if name in PER_DOC:
        for i in range(n_shards):
            d = os.path.join(out_dir, f"shard={i}")
            if _is_done(d, fp):
                skipped.append(f"shard={i}")
                continue
            _clean_partition(d)
            os.makedirs(d, exist_ok=True)
            out = _shard_pipeline(fn, sf_dir, i, n_shards)
            if isinstance(out, pa.Table):  # defensive: all per-doc
                out = rd.from_arrow(out)   # entries return Datasets today
            out.write_parquet(d)
            files = sum(1 for f in os.listdir(d) if f.endswith(".parquet"))
            _stamp(d, fp, files)
            computed.append(f"shard={i}")
    else:
        d = os.path.join(out_dir, "full")
        if _is_done(d, fp):
            skipped.append("full")
        else:
            _clean_partition(d)
            os.makedirs(d, exist_ok=True)
            out = fn(sf_dir)
            if isinstance(out, pa.Table):
                out = rd.from_arrow(out)
            out.write_parquet(d)
            _stamp(d, fp, -1)
            computed.append("full")
    return {"computed": computed, "skipped": skipped}


def main() -> None:
    """CLI: ``python -m pears_lite_ray.state.export <name> <sf_dir> <out>``
    — resumably export one driver pipeline to partitioned parquet."""
    import argparse

    import ray

    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("sf_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--shards", type=int, default=8)
    args = ap.parse_args()
    if not ray.is_initialized():  # CLI scripts own their session
        ray.init(address="local", include_dashboard=False)
    import __ray_entry__ as entrymod

    fn = entrymod.queries()[args.name]
    res = export_pipeline(args.name, fn, args.sf_dir, args.out_dir,
                          n_shards=args.shards)
    print(json.dumps(res))
    ray.shutdown()


if __name__ == "__main__":
    main()
