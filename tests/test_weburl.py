"""URL-hygiene operators (url_dedup / domain_cap) + overlapping chunking:
planted-collision semantics and DuckDB-oracle parity on a small corpus."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _tbl(x) -> pa.Table:
    import ray.data as rd

    if isinstance(x, rd.Dataset):
        return pa.Table.from_pandas(x.to_pandas())
    return x


@pytest.fixture(scope="module")
def url_docs_dir(tmp_path_factory):
    """documents.parquet with a source column: 4 sources × 30 docs (4 | 100,
    so ids 100 apart share both source and path key → canonical collisions),
    plus
    text lengths chosen to hit every chunking edge (shorter than one
    window, exactly one window, one char over)."""
    n = 120
    texts = []
    for i in range(n):
        if i == 0:
            texts.append("x" * 10)        # < one window → 1 chunk
        elif i == 1:
            texts.append("y" * 200)       # exactly one window → 1 chunk
        elif i == 2:
            texts.append("z" * 201)       # one over → 2 chunks (2nd len 51)
        else:
            texts.append(("w%d " % i) * (10 + i % 37))
    d = tmp_path_factory.mktemp("urldocs")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
                "source": pa.array([f"s{i % 4}" for i in range(n)], pa.string()),
            }
        ),
        os.path.join(str(d), "documents.parquet"),
    )
    return str(d)


def _oracle(sf_dir, key):
    import duckdb

    from pears_lite_ray import pipelines

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(sf_dir, 'documents.parquet')}'"
    )
    return con.sql(pipelines.all_oracle_sql()[key]).arrow()


def test_canonicalize_rules():
    from pears_lite_ray.functions.urlnorm import canonicalize_urls

    got = canonicalize_urls(pa.array([
        "HTTP://WWW.Ex.Example.ORG/p/7/?utm_source=feed#top",
        "https://ex.example.org/p/7",
        "http://ex.example.org/p/7/",
    ])).to_pylist()
    assert got == ["https://ex.example.org/p/7"] * 3


def test_url_dedup_collides_mod100_and_matches_oracle(ray_session, url_docs_dir):
    from pears_lite_ray.pipelines.weburl import q_url_dedup

    out = _tbl(q_url_dedup(url_docs_dir)).to_pandas().sort_values("doc_id")
    gold = _oracle(url_docs_dir, "url_dedup").to_pandas().sort_values("doc_id")
    for c in ("url", "canonical_url", "canonical_doc_id"):
        assert (out[c].to_numpy() == gold[c].to_numpy()).all(), c
    # path key is doc_id % 100 and source key doc_id % 4 with 4 | 100, so
    # ids 100 apart share source AND path → same canonical → min id wins
    byid = out.set_index("doc_id")
    assert byid.loc[100, "canonical_doc_id"] == 0
    assert byid.loc[100, "canonical_url"] == byid.loc[0, "canonical_url"]
    assert byid.loc[119, "canonical_doc_id"] == 19
    assert byid.loc[50, "canonical_doc_id"] == 50  # no id 100 apart in range


def test_domain_cap_ranks_and_matches_oracle(ray_session, url_docs_dir):
    from pears_lite_ray.pipelines.weburl import DOMAIN_CAP_K, q_domain_cap

    out = _tbl(q_domain_cap(url_docs_dir)).to_pandas().sort_values("doc_id")
    gold = _oracle(url_docs_dir, "domain_cap").to_pandas().sort_values("doc_id")
    for c in ("domain", "domain_rank", "kept"):
        assert (out[c].to_numpy() == gold[c].to_numpy()).all(), c
    # 30 docs per domain, K kept each
    kept = out.groupby("domain")["kept"].sum()
    assert (kept == DOMAIN_CAP_K).all()
    # rank is doc_id order within the domain: doc 0,4,8 → ranks 1,2,3
    byid = out.set_index("doc_id")
    assert list(byid.loc[[0, 4, 8], "domain_rank"]) == [1, 2, 3]


def test_chunk_overlap_edges_and_matches_oracle(ray_session, url_docs_dir):
    from pears_lite_ray.pipelines.textstats import q_chunk_overlap

    out = (
        _tbl(q_chunk_overlap(url_docs_dir))
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    gold = (
        _oracle(url_docs_dir, "chunk_overlap")
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    assert len(out) == len(gold)
    for c in ("chunk_id", "chunk_start", "chunk_len", "chunk_text"):
        assert (out[c].to_numpy() == gold[c].to_numpy()).all(), c
    g = out.groupby("doc_id")
    assert g.size().loc[0] == 1 and g.size().loc[1] == 1   # ≤ window → 1 chunk
    two = out[out.doc_id == 2]
    assert list(two.chunk_len) == [200, 51]                # 201 chars → 200+51
    assert list(two.chunk_start) == [0, 150]
    # overlap: chunk i+1 repeats the last 50 chars of chunk i
    assert two.iloc[0].chunk_text[150:] == two.iloc[1].chunk_text[:50]


def test_curriculum_order_rank_and_ntile(ray_session, tmp_path):
    """23 docs, k=10 → quotient 2 remainder 3: DuckDB ntile gives the first
    3 buckets 3 rows and the rest 2 — the engine's broadcast-offset rank +
    bucket formula must agree exactly, including equal-length tie-breaks."""
    import duckdb

    from pears_lite_ray import pipelines
    from pears_lite_ray.pipelines.textstats import q_curriculum_order

    n = 23
    lens = [(i * 7) % 5 + 3 for i in range(n)]  # heavy length collisions
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(["x" * L for L in lens], pa.string()),
                "n_chars": pa.array(lens, pa.int64()),
            }
        ),
        os.path.join(str(tmp_path), "documents.parquet"),
    )
    out = (
        _tbl(q_curriculum_order(str(tmp_path)))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(str(tmp_path), 'documents.parquet')}'"
    )
    gold = (
        con.sql(pipelines.all_oracle_sql()["curriculum_order"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in ("n_chars", "global_rank", "bucket"):
        assert (out[c].to_numpy() == gold[c].to_numpy()).all(), c
    sizes = out.groupby("bucket").size()
    assert list(sizes) == [3, 3, 3, 2, 2, 2, 2, 2, 2, 2]
    assert sorted(out.global_rank) == list(range(1, n + 1))


def test_event_zscore_flags_planted_outlier(ray_session, tmp_path):
    """One value far outside its type's distribution must flag, and every
    z must match the DuckDB sum-of-squares oracle exactly at 6dp."""
    import duckdb

    from pears_lite_ray import pipelines
    from pears_lite_ray.pipelines.events import q_event_zscore

    n = 400
    vals = [50.0 + (i % 21) - 10 for i in range(n)]   # tight band around 50
    vals[7] = 5000.0                                  # planted outlier
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(
                    np.arange(n) * 1_000_000, pa.int64()
                ).cast(pa.timestamp("us")),
                "user_id": pa.array([i % 13 for i in range(n)], pa.int64()),
                "event_type": pa.array(
                    ["click" if i % 2 else "view" for i in range(n)], pa.string()
                ),
                "value": pa.array(vals, pa.float64()),
            }
        ),
        os.path.join(str(tmp_path), "events.parquet"),
    )
    out = (
        _tbl(q_event_zscore(str(tmp_path)))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{os.path.join(str(tmp_path), 'events.parquet')}'"
    )
    gold = (
        con.sql(pipelines.all_oracle_sql()["event_zscore"])
        .df()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert (out["z"].to_numpy() == gold["z"].to_numpy()).all()
    assert (out["is_outlier"].to_numpy() == gold["is_outlier"].to_numpy()).all()
    byid = out.set_index("event_id")
    assert bool(byid.loc[7, "is_outlier"])
    assert int(out["is_outlier"].sum()) == 1


def test_sliding_window_replicas_and_oracle(ray_session, tmp_path):
    """Every event must land in exactly 4 hopping windows (1h window,
    15-min slide) and the per-window aggregates must match the DuckDB
    replicate-and-group oracle exactly."""
    import duckdb

    from pears_lite_ray import pipelines
    from pears_lite_ray.pipelines.events import q_sliding_window

    n = 300
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(
                    (np.arange(n, dtype=np.int64) * 61_000_000
                     + 3_600_000_000),
                    pa.int64(),
                ).cast(pa.timestamp("us")),
                "user_id": pa.array([i % 9 for i in range(n)], pa.int64()),
                "event_type": pa.array(
                    ["click" if i % 3 else "view" for i in range(n)],
                    pa.string(),
                ),
                "value": pa.array(
                    [float((i * 13) % 97) for i in range(n)], pa.float64()
                ),
            }
        ),
        os.path.join(str(tmp_path), "events.parquet"),
    )
    out = (
        _tbl(q_sliding_window(str(tmp_path)))
        .to_pandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{os.path.join(str(tmp_path), 'events.parquet')}'"
    )
    gold = (
        con.sql(pipelines.all_oracle_sql()["sliding_window"])
        .df()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    assert len(out) == len(gold)
    for c in ("n_events", "sum_value"):
        assert (out[c].to_numpy() == gold[c].to_numpy()).all(), c
    # replication invariant: total window-events = 4 x raw events
    assert int(out["n_events"].sum()) == 4 * n


def test_source_top_terms_grouped_topk(ray_session, url_docs_dir):
    """Per-source top-k under (count desc, term asc): matches the DuckDB
    window-ranked oracle and the planted repetition dominates its source."""
    import duckdb

    from pears_lite_ray import pipelines
    from pears_lite_ray.pipelines.textstats import (
        TOP_TERMS_PER_SOURCE,
        q_source_top_terms,
    )

    out = (
        _tbl(q_source_top_terms(url_docs_dir))
        .to_pandas()
        .sort_values(["source", "rank"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(url_docs_dir, 'documents.parquet')}'"
    )
    gold = (
        con.sql(pipelines.all_oracle_sql()["source_top_terms"])
        .df()
        .sort_values(["source", "rank"])
        .reset_index(drop=True)
    )
    assert len(out) == len(gold)
    for c in ("source", "term", "cnt", "rank"):
        assert (out[c].to_numpy() == gold[c].to_numpy()).all(), c
    assert (out.groupby("source").size() <= TOP_TERMS_PER_SOURCE).all()


def test_weighted_sample_without_replacement(ray_session, url_docs_dir):
    """Efraimidis-Spirakis selection matches the DuckDB ln(u)/w oracle
    exactly, the output has no repeats, and heavier docs are favored: the
    selected docs' mean weight exceeds the corpus mean."""
    import duckdb

    from pears_lite_ray import pipelines
    from pears_lite_ray.pipelines.textstats import (
        WEIGHTED_SAMPLE_K,
        q_weighted_sample,
    )

    out = (
        _tbl(q_weighted_sample(url_docs_dir))
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(url_docs_dir, 'documents.parquet')}'"
    )
    gold = (
        con.sql(pipelines.all_oracle_sql()["weighted_sample"])
        .df()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert len(out) == len(gold) == WEIGHTED_SAMPLE_K
    for c in ("doc_id", "n_chars", "u", "key", "rank"):
        assert (out[c].to_numpy() == gold[c].to_numpy()).all(), c
    assert out["doc_id"].is_unique
    corpus_mean = con.sql("SELECT avg(n_chars) FROM documents").fetchone()[0]
    assert out["n_chars"].mean() > corpus_mean


def test_compression_ratio_orders_redundancy(ray_session, tmp_path):
    """A constant-character doc must compress far better than a
    high-entropy one, ratios are deterministic, and byte counts are
    exact."""
    import zlib

    from pears_lite_ray.pipelines.textstats import ZLIB_LEVEL, q_compression_ratio

    rng = np.random.RandomState(3)
    texts = [
        "a" * 4000,                                               # redundant
        "".join(chr(33 + rng.randint(0, 90)) for _ in range(4000)),  # noisy
        "the quick brown fox jumps over the lazy dog. " * 80,     # prose-ish
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(3), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        os.path.join(str(tmp_path), "documents.parquet"),
    )
    out = (
        _tbl(q_compression_ratio(str(tmp_path)))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = [len(zlib.compress(t.encode(), ZLIB_LEVEL)) for t in texts]
    assert list(out["n_compressed"]) == exp
    assert list(out["n_bytes"]) == [len(t.encode()) for t in texts]
    r = out.set_index("doc_id")["ratio"]
    assert r.loc[0] < r.loc[2] < r.loc[1]
    assert r.loc[0] < 0.01 and r.loc[1] > 0.8
