"""End-to-end conformance: Ray build → BM25/pears query vs the naive oracle
(FIXTURES.md §3 golden contract: rank-identical top-k, tie-break
(score desc, doc_id asc)), plus parallelism invariance and resume."""

import json
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from pears_lite_ray.config import BuildConfig
from pears_lite_ray.sources.fixtures import (
    HOT_TERM,
    PHRASE,
    RARE_TERM,
    generate_queries,
)
from pears_lite_ray.stages.extract import url_doc_id


@pytest.fixture(scope="module")
def built_index(ray_session, small_corpus_dir, tmp_path_factory):
    from pears_lite_ray.index.build import build_index

    out = str(tmp_path_factory.mktemp("index"))
    paths = sorted(
        os.path.join(small_corpus_dir, f)
        for f in os.listdir(small_corpus_dir)
        if f.endswith(".parquet")
    )
    report = build_index(paths, BuildConfig(out_dir=out))
    return out, report, paths


@pytest.fixture(scope="module")
def oracle(small_corpus_dir, spm_tokenizer):
    from pears_lite_ray.oracle.naive import NaiveIndex
    from pears_lite_ray.text.extract import extract_record

    idx = NaiveIndex(spm_tokenizer)
    seen = {}
    for f in sorted(os.listdir(small_corpus_dir)):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(small_corpus_dir, f))
        for i in range(t.num_rows):
            url = t["url"][i].as_py()
            rec = extract_record(t["html"][i].as_py())
            if not rec["ok"]:
                continue
            ts = t["warc_ts"][i].value
            if url in seen and seen[url] >= ts:
                continue  # dedup: latest warc_ts wins
            seen[url] = ts
            idx.add(url_doc_id(url), rec["text"], rec["title"], rec["snippet"])
    return idx


def test_build_report_sane(built_index, oracle):
    _, report, _ = built_index
    assert report["n_docs"] == oracle.n_docs
    assert report["avgdl"] == pytest.approx(oracle.avgdl)
    assert report["n_docs"] > 200


def test_docs_table_unique_ids(built_index):
    from pears_lite_ray.index.segments import DocStore

    out, _, _ = built_index
    t = DocStore(os.path.join(out, "staging")).scan()
    ids = t["doc_id"].to_numpy()
    assert len(np.unique(ids)) == len(ids)


def test_segment_df_matches_oracle(built_index, oracle, spm_tokenizer):
    from pears_lite_ray.index.segments import SegmentStore

    out, _, _ = built_index
    store = SegmentStore(os.path.join(out, "segments"), 16)
    for word in [HOT_TERM, RARE_TERM, "river"]:
        ids, _ = spm_tokenizer.encode_ids_positions(word)
        rows = store.lookup(ids)
        for tid in ids:
            odf = len(oracle.postings.get(tid, {}))
            edf = rows[tid]["df"] if tid in rows else 0
            assert edf == odf, f"{word}/{tid}: engine df {edf} != oracle {odf}"


@pytest.mark.parametrize("conjunctive", [False, True])
def test_bm25_rank_identity_vs_oracle(built_index, oracle, conjunctive):
    from pears_lite_ray.query.engine import QueryEngine

    out, _, _ = built_index
    eng = QueryEngine(out, mode="bm25")
    queries = generate_queries()
    for qid, q, k in zip(
        queries["query_id"].to_pylist(),
        queries["query"].to_pylist(),
        queries["k"].to_pylist(),
    ):
        docs, scores = eng.search_scores(q, k, conjunctive=conjunctive,
                                         use_wand=not conjunctive)
        golden = oracle.bm25_topk(q, k, conjunctive=conjunctive)
        assert docs.tolist() == [d for d, _ in golden], f"q{qid} '{q}' doc mismatch"
        assert np.allclose(scores, [s for _, s in golden], rtol=0, atol=1e-9), \
            f"q{qid} '{q}' score mismatch"


def test_wand_equals_exact(built_index):
    from pears_lite_ray.query.engine import QueryEngine

    out, _, _ = built_index
    eng = QueryEngine(out, mode="bm25")
    # includes the full fixture query set: 'quasar' k=10 once drove the WAND
    # pivot loop into a spin when two cursors sat on the same pivot doc
    fixture_qs = generate_queries()["query"].to_pylist()
    for q in [HOT_TERM, f"{HOT_TERM} river village", " ".join(PHRASE),
              RARE_TERM, "market bridge stone harvest winter", *fixture_qs]:
        for k in (3, 10, 50):
            dw, sw = eng.search_scores(q, k, use_wand=True)
            de, se = eng.search_scores(q, k, use_wand=False)
            assert dw.tolist() == de.tolist(), (q, k)
            assert np.allclose(sw, se, atol=1e-12), (q, k)


def test_pears_rank_identity_vs_oracle(built_index, oracle):
    from pears_lite_ray.query.engine import QueryEngine

    out, _, _ = built_index
    eng = QueryEngine(out, mode="pears")
    for q in [HOT_TERM, " ".join(PHRASE), f"{RARE_TERM}", "village market"]:
        docs, scores = eng.search_scores(q, 50)
        golden = oracle.pears_topk(q, 50)
        assert docs.tolist() == [d for d, _ in golden], f"'{q}' doc mismatch"
        assert np.allclose(scores, [s for _, s in golden], atol=1e-9), q


def test_phrase_scoring_discriminates(built_index, oracle):
    """PHRASE words appear adjacently only in designated docs: those docs get
    the +1 phrase component in pears mode."""
    from pears_lite_ray.query.engine import QueryEngine

    out, _, _ = built_index
    eng = QueryEngine(out, mode="pears")
    q = " ".join(PHRASE)
    docs, scores = eng.search_scores(q, 50)
    assert docs.size > 0
    # top hit should include full phrase + completeness 1.0 → score ≥ 2
    assert scores[0] >= 2.0


def test_resume_skips_completed_partitions(built_index, ray_session):
    from pears_lite_ray.index.build import build_index

    out, report1, paths = built_index
    report2 = build_index(paths, BuildConfig(out_dir=out))
    assert report2["stage_partitions_skipped_on_resume"] == len(paths)
    assert report2["n_docs"] == report1["n_docs"]


def test_parallelism_invariance(ray_session, small_corpus_dir, built_index,
                                tmp_path_factory):
    """Same input at a different batch size / wave grouping → identical
    segments content and identical query results."""
    from pears_lite_ray.index.build import build_index
    from pears_lite_ray.query.engine import QueryEngine

    out1, _, paths = built_index
    out2 = str(tmp_path_factory.mktemp("index_p2"))
    cfg = BuildConfig(out_dir=out2, batch_size=37,
                      tokenize_concurrency=1, extract_concurrency=1)
    cfg.extra["files_per_wave"] = 1
    build_index(paths, cfg)

    with open(os.path.join(out1, "stats.json")) as f:
        s1 = json.load(f)
    with open(os.path.join(out2, "stats.json")) as f:
        s2 = json.load(f)
    assert s1["n_docs"] == s2["n_docs"]
    assert s1["avgdl"] == pytest.approx(s2["avgdl"])

    e1, e2 = QueryEngine(out1), QueryEngine(out2)
    queries = generate_queries()
    for q, k in zip(queries["query"].to_pylist(), queries["k"].to_pylist()):
        d1, sc1 = e1.search_scores(q, k)
        d2, sc2 = e2.search_scores(q, k)
        assert d1.tolist() == d2.tolist(), q
        assert np.allclose(sc1, sc2, atol=0), q
