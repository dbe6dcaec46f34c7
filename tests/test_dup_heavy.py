"""Dup-heavy builds: above DUP_DRIVER_ROW_CAP the build must resolve
duplicate-url winners with a distributed groupby(doc_id) argmax instead of
the driver-side pull (round-2 VERDICT: a 30-50%-dup crawl breaks the
'dups are rare' assumption)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pears_lite_ray.config import BuildConfig
from pears_lite_ray.sources.fixtures import generate_corpus, generate_queries


def _build(paths, out, **kw):
    from pears_lite_ray.index.build import build_index

    build_index(paths, BuildConfig(out_dir=out, **kw))
    return out


def test_dup_heavy_distributed_winners(ray_session, tmp_path_factory, monkeypatch):
    """50%-duplicate corpus (every url re-crawled later with DIFFERENT
    content): the distributed path must (a) pick the same winners as a
    corpus holding only the re-crawls, and (b) score identically to the
    broadcast path on the same input."""
    from pears_lite_ray.index import build as B
    from pears_lite_ray.query.engine import QueryEngine

    base = generate_corpus(60, seed=9)
    # unique urls only (drop the fixture's own dup rows)
    urls = base["url"].to_pylist()
    seen, keep = set(), []
    for i, u in enumerate(urls):
        if u not in seen:
            seen.add(u)
            keep.append(i)
    base = base.take(pa.array(keep))

    d0 = str(tmp_path_factory.mktemp("dup_src0"))
    p0 = os.path.join(d0, "orig.parquet")
    pq.write_table(base, p0)
    ia = str(tmp_path_factory.mktemp("dup_idx_probe"))
    _build([p0], ia)
    staged_urls = set(
        pq.read_table(os.path.join(ia, "staging"), columns=["url"])
        ["url"].to_pylist()
    )

    # re-crawl copy: +1 day, content rolled among the gate-passing rows
    urls = base["url"].to_pylist()
    html = base["html"].to_pylist()
    text = base["text"].to_pylist()
    idx = [i for i, u in enumerate(urls) if u in staged_urls]
    assert len(idx) > 10
    r_html, r_text = list(html), list(text)
    for pos, i in enumerate(idx):
        j = idx[(pos + 1) % len(idx)]
        r_html[i], r_text[i] = html[j], text[j]
    ts = base["warc_ts"].cast(pa.int64()).to_numpy() + 86_400_000_000
    recrawl = (
        base.set_column(base.schema.get_field_index("warc_ts"), "warc_ts",
                        pa.array(ts, pa.int64()).cast(pa.timestamp("us")))
        .set_column(base.schema.get_field_index("html"), "html",
                    pa.array(r_html, pa.binary()))
        .set_column(base.schema.get_field_index("text"), "text",
                    pa.array(r_text, pa.string()))
    )

    # originals and re-crawls in SEPARATE input partitions: within-batch
    # dups resolve at extract, so cross-PARTITION dups are what exercises
    # the dedup/winner machinery
    d1 = str(tmp_path_factory.mktemp("dup_src1"))
    p_orig = os.path.join(d1, "part-orig.parquet")
    p_re = os.path.join(d1, "part-recrawl.parquet")
    pq.write_table(base, p_orig)
    pq.write_table(recrawl, p_re)
    p_win = os.path.join(d1, "winners.parquet")
    pq.write_table(recrawl, p_win)

    # files_per_wave=1 keeps the two partitions in separate staging waves
    # (one wave would coalesce them into a single extract batch, where the
    # within-batch dedup already resolves the urls)
    wave1 = {"extra": {"files_per_wave": 1}}
    idx_bcast = _build([p_orig, p_re],
                       str(tmp_path_factory.mktemp("dup_idx_b")), **wave1)
    monkeypatch.setattr(B, "DUP_DRIVER_ROW_CAP", 0)
    idx_dist = _build([p_orig, p_re],
                      str(tmp_path_factory.mktemp("dup_idx_d")), **wave1)
    monkeypatch.undo()
    idx_win = _build([p_win], str(tmp_path_factory.mktemp("dup_idx_w")))

    import json
    sd = json.load(open(os.path.join(idx_dist, "stats.json")))
    assert sd.get("dup_resolution") == "distributed"

    eng_b = QueryEngine(idx_bcast)
    eng_d = QueryEngine(idx_dist)
    eng_w = QueryEngine(idx_win)
    assert eng_d.stats.n_docs == eng_w.stats.n_docs == eng_b.stats.n_docs
    assert eng_d.stats.avgdl == pytest.approx(eng_w.stats.avgdl)

    queries = generate_queries()
    for q, k in zip(queries["query"].to_pylist(), queries["k"].to_pylist()):
        dd, sd_ = eng_d.search_scores(q, int(k))
        dw, sw = eng_w.search_scores(q, int(k))
        db, sb = eng_b.search_scores(q, int(k))
        assert dd.tolist() == dw.tolist() == db.tolist(), q
        assert np.allclose(sd_, sw, atol=1e-12) and np.allclose(sd_, sb, atol=1e-12), q
