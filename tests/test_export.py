"""Resumable partitioned export of operator pipelines (state/export.py):
per-doc pipelines shard by doc_id hash with per-shard manifests; re-runs
skip completed shards; output unions back to the unsharded pipeline."""

import json
import os

import pyarrow.dataset as pads
import pytest


@pytest.fixture(scope="module")
def export_docs_dir(ray_session, tmp_path_factory):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(5)
    words = "alpha bravo charlie delta echo fox golf hotel".split()
    texts = [" ".join(rng.choice(words, size=30)) for _ in range(120)]
    d = tmp_path_factory.mktemp("export_docs")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(120), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * 120, pa.string()),
            }
        ),
        os.path.join(str(d), "documents.parquet"),
    )
    return str(d)


def test_export_per_doc_sharded_and_resumable(export_docs_dir, tmp_path):
    from pears_lite_ray.pipelines.textstats import q_quality
    from pears_lite_ray.state.export import export_pipeline

    out = str(tmp_path / "quality_out")
    r1 = export_pipeline("quality", q_quality, export_docs_dir, out, n_shards=4)
    assert len(r1["computed"]) == 4 and not r1["skipped"]
    for i in range(4):
        assert os.path.exists(os.path.join(out, f"shard={i}", "_manifest.json"))

    # exported union == the unsharded pipeline
    exported = pads.dataset(out, format="parquet").to_table()
    direct = q_quality(export_docs_dir).to_pandas().sort_values("doc_id")
    got = exported.to_pandas().sort_values("doc_id")
    assert got.reset_index(drop=True).equals(direct.reset_index(drop=True))
    # shards actually partition by doc_id hash
    s0 = pads.dataset(os.path.join(out, "shard=0")).to_table()
    assert all(d % 4 == 0 for d in s0["doc_id"].to_pylist())

    # full re-run: everything skipped
    r2 = export_pipeline("quality", q_quality, export_docs_dir, out, n_shards=4)
    assert not r2["computed"] and len(r2["skipped"]) == 4

    # kill one shard's manifest (the crash-mid-shard scenario: partial
    # parquet leftovers, no manifest) → only that shard recomputes, and the
    # recompute must NOT append alongside the leftovers (write_parquet
    # appends with fresh UUID filenames — the shard dir is cleaned first)
    os.remove(os.path.join(out, "shard=2", "_manifest.json"))
    r3 = export_pipeline("quality", q_quality, export_docs_dir, out, n_shards=4)
    assert r3["computed"] == ["shard=2"]
    assert len(r3["skipped"]) == 3
    s2 = pads.dataset(os.path.join(out, "shard=2")).to_table()
    ids2 = sorted(s2["doc_id"].to_pylist())
    assert ids2 == sorted(set(ids2)), "resumed shard duplicated rows"
    assert ids2 == [d for d in range(120) if d % 4 == 2]

    # input change invalidates manifests (fingerprint mismatch)
    m = json.load(open(os.path.join(out, "shard=0", "_manifest.json")))
    m["fingerprint"]["size"] += 1
    json.dump(m, open(os.path.join(out, "shard=0", "_manifest.json"), "w"))
    r4 = export_pipeline("quality", q_quality, export_docs_dir, out, n_shards=4)
    assert r4["computed"] == ["shard=0"]
    s0b = pads.dataset(os.path.join(out, "shard=0")).to_table()
    ids0 = sorted(s0b["doc_id"].to_pylist())
    assert ids0 == sorted(set(ids0)), "invalidated shard duplicated rows"

    # whole-dataset union is still exactly the unsharded pipeline after
    # both resume paths
    exported2 = pads.dataset(out, format="parquet").to_table()
    got2 = exported2.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got2.equals(direct.reset_index(drop=True))


def test_export_cross_doc_single_unit(export_docs_dir, tmp_path):
    from pears_lite_ray.pipelines.dedup import q_simhash, q_exact_dedup
    from pears_lite_ray.state.export import export_pipeline

    out = str(tmp_path / "dedup_out")
    r1 = export_pipeline("exact_dedup", q_exact_dedup, export_docs_dir, out)
    assert r1["computed"] == ["full"]
    r2 = export_pipeline("exact_dedup", q_exact_dedup, export_docs_dir, out)
    assert r2["skipped"] == ["full"]
    t = pads.dataset(os.path.join(out, "full")).to_table()
    assert t.num_rows == 120
    assert set(t.column_names) == {"doc_id", "text_md5", "canonical_doc_id"}
