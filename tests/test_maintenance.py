"""D1 index maintenance: tombstone deletes + compaction, ids never renumber
(unlike the reference's row-index decrement, api/controllers.py:61-106)."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from pears_lite_ray.config import BuildConfig
from pears_lite_ray.sources.fixtures import HOT_TERM, generate_queries
from pears_lite_ray.stages.extract import url_doc_id


@pytest.fixture(scope="module")
def maint_index(ray_session, small_corpus_dir, tmp_path_factory):
    from pears_lite_ray.index.build import build_index

    out = str(tmp_path_factory.mktemp("maint_idx"))
    paths = sorted(
        os.path.join(small_corpus_dir, f)
        for f in os.listdir(small_corpus_dir) if f.endswith(".parquet")
    )
    build_index(paths, BuildConfig(out_dir=out))
    return out, paths


def _some_hot_urls(out: str, k: int = 5) -> list[str]:
    from pears_lite_ray.query.engine import QueryEngine

    eng = QueryEngine(out)
    res = eng.search(HOT_TERM, k)
    return res["url"].to_pylist()


def test_tombstoned_docs_vanish_from_results(maint_index):
    from pears_lite_ray.index.maintenance import delete_urls, load_tombstones
    from pears_lite_ray.query.engine import QueryEngine

    out, _ = maint_index
    victims = _some_hot_urls(out, 5)
    victim_ids = {url_doc_id(u) for u in victims}
    before = QueryEngine(out).search_scores(HOT_TERM, 50)[0]
    assert victim_ids & set(before.tolist())

    delete_urls(out, victims)
    assert set(load_tombstones(out).tolist()) == victim_ids
    eng = QueryEngine(out)  # reload picks up tombstones
    for q in [HOT_TERM, "village market", "river mountain"]:
        for wand in (False, True):
            docs, _ = eng.search_scores(q, 50, use_wand=wand)
            assert not (victim_ids & set(docs.tolist())), (q, wand)
        dp, _ = eng.search_scores(q, 50)  # pears mode too
    pe = QueryEngine(out, mode="pears")
    docs, _ = pe.search_scores(HOT_TERM, 50)
    assert not (victim_ids & set(docs.tolist()))


def test_compaction_equals_fresh_build(maint_index, tmp_path_factory, ray_session):
    """After compact, results are rank+score-identical to a FRESH build over
    the corpus minus the deleted urls."""
    import pyarrow as pa

    from pears_lite_ray.index.build import build_index
    from pears_lite_ray.index.maintenance import (
        compact,
        load_tombstones,
    )
    from pears_lite_ray.query.engine import QueryEngine

    out, paths = maint_index
    victims = set(load_tombstones(out).tolist())
    assert victims, "runs after the delete test (module-ordered)"

    stats = compact(out)
    assert stats["compacted_tombstones"] == len(victims)
    assert not os.path.exists(os.path.join(out, "tombstones.json"))

    # fresh build over corpus minus victims
    filt_dir = str(tmp_path_factory.mktemp("filtered_corpus"))
    for i, p in enumerate(paths):
        t = pq.read_table(p)
        ids = np.array([url_doc_id(u) for u in t["url"].to_pylist()])
        keep = ~np.isin(ids, np.array(sorted(victims), dtype=np.int64))
        pq.write_table(t.filter(pa.array(keep)), os.path.join(filt_dir, f"c{i}.parquet"))
    fresh = str(tmp_path_factory.mktemp("fresh_idx"))
    build_index(
        sorted(os.path.join(filt_dir, f) for f in os.listdir(filt_dir)),
        BuildConfig(out_dir=fresh),
    )

    ec, ef = QueryEngine(out), QueryEngine(fresh)
    assert ec.stats.n_docs == ef.stats.n_docs
    assert ec.stats.avgdl == pytest.approx(ef.stats.avgdl)
    queries = generate_queries()
    for q, k in zip(queries["query"].to_pylist(), queries["k"].to_pylist()):
        dc, sc = ec.search_scores(q, int(k))
        df_, sf = ef.search_scores(q, int(k))
        assert dc.tolist() == df_.tolist(), q
        assert np.allclose(sc, sf, atol=1e-12), q


def test_compaction_preserves_cross_partition_dup_winners(ray_session, tmp_path_factory):
    """A url indexed in TWO input files with different warc_ts and different
    text: the build keeps the later-ts winner; compaction (even with zero
    tombstones) must re-resolve the same winner from staging, not resurrect
    the loser's postings or double-count its doc_id in n/avgdl."""
    import pyarrow as pa

    from pears_lite_ray.index.build import build_index
    from pears_lite_ray.index.maintenance import compact
    from pears_lite_ray.query.engine import QueryEngine
    from pears_lite_ray.sources.fixtures import generate_queries, write_corpus

    corpus = str(tmp_path_factory.mktemp("dup_corpus"))
    paths = write_corpus(corpus, 80, n_files=2, seed=303)
    # plant a cross-file duplicate: copy row 0 of file 0 into file 1 with a
    # LATER timestamp and different html/text (the winner-to-be)
    t0 = pq.read_table(paths[0])
    t1 = pq.read_table(paths[1])
    dup_url = t0["url"][0].as_py()
    loser_ts = t0["warc_ts"][0].as_py()
    winner_row = pa.table(
        {
            "url": pa.array([dup_url], pa.string()),
            "warc_ts": pa.array(
                [int(t0["warc_ts"].cast(pa.int64())[0].as_py()) + 10_000_000],
                pa.timestamp("us"),
            ),
            "html": t1.select(["html"]).slice(0, 1)["html"],
            "text": t1.select(["text"]).slice(0, 1)["text"],
            "lang": pa.array(["en"], pa.string()),
        }
    )
    pq.write_table(
        pa.concat_tables([t1, winner_row.cast(t1.schema)]), paths[1]
    )

    out = str(tmp_path_factory.mktemp("dup_idx"))
    build_index(paths, BuildConfig(out_dir=out))
    eng_before = QueryEngine(out)
    stats_before = dict(n=eng_before.stats.n_docs, avg=eng_before.stats.avgdl)
    queries = generate_queries()
    before = {
        (q, int(k)): eng_before.search_scores(q, int(k))
        for q, k in zip(queries["query"].to_pylist(), queries["k"].to_pylist())
    }

    new_stats = compact(out)  # no tombstones: must be a semantic no-op
    assert new_stats["n_docs"] == stats_before["n"]
    assert new_stats["avgdl"] == pytest.approx(stats_before["avg"])
    eng_after = QueryEngine(out)
    for (q, k), (d_b, s_b) in before.items():
        d_a, s_a = eng_after.search_scores(q, k)
        assert d_a.tolist() == d_b.tolist(), q
        assert np.allclose(s_a, s_b, atol=1e-12), q
