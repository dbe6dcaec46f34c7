"""S4 CSV source: reference row→doc projection semantics
(app/indexer/controllers.py:224-264) + end-to-end indexability."""

import os

import pyarrow.parquet as pq
import pytest

from pears_lite_ray.sources.csvdocs import csv_to_docs

CSV = """name;role;homepage
Ada;engineer;https://a.example/ada
;unknown;nobody
Grace;admiral;https://g.example/grace
"""


@pytest.fixture()
def csv_path(tmp_path):
    p = tmp_path / "people.csv"
    p.write_text(CSV)
    return str(p)


def test_row_projection_semantics(csv_path):
    t = csv_to_docs(csv_path)
    # empty-first-cell row skipped (NaN rule)
    assert t.num_rows == 2
    assert t["title"][0].as_py() == "People: Ada [0]"
    assert t["url"][0].as_py() == "people.csv#People: Ada [0]"
    text = t["text"][0].as_py()
    assert text.startswith("People: Ada [0] name: Ada. role: engineer. ")
    # '/' spaced out, reference-style
    assert "https: /  / a.example / ada" in text
    assert t["doctype"][0].as_py() == "csv"
    # second kept row keeps its ORIGINAL row number
    assert t["title"][1].as_py() == "People: Grace [2]"


def test_csv_docs_index_end_to_end(ray_session, csv_path, tmp_path):
    from pears_lite_ray.config import BuildConfig
    from pears_lite_ray.index.build import build_index
    from pears_lite_ray.query.engine import QueryEngine

    corpus = str(tmp_path / "csv_corpus")
    os.makedirs(corpus)
    pq.write_table(csv_to_docs(csv_path), os.path.join(corpus, "docs.parquet"))
    out = str(tmp_path / "csv_idx")
    rep = build_index(
        [os.path.join(corpus, "docs.parquet")],
        BuildConfig(out_dir=out, tokenizer="regex", vocab_path=None),
    )
    assert rep["n_docs"] == 2
    eng = QueryEngine(out)
    res = eng.search("admiral", 10)
    assert res.num_rows == 1
    assert "Grace" in res["title"][0].as_py()


def test_doctype_filter_in_search(ray_session, csv_path, tmp_path):
    """DSL doctype (!word) filters results post-scoring, output()-style."""
    import pyarrow as pa

    from pears_lite_ray.config import BuildConfig
    from pears_lite_ray.index.build import build_index
    from pears_lite_ray.query.engine import QueryEngine

    corpus = str(tmp_path / "mixed_corpus")
    os.makedirs(corpus)
    csv_docs = csv_to_docs(csv_path)
    plain = pa.table(
        {
            "url": pa.array(["doc://plain/1"], pa.string()),
            "warc_ts": pa.array([0], pa.timestamp("us")),
            "title": pa.array(["Plain note"], pa.string()),
            "text": pa.array(["an admiral wrote a plain note"], pa.string()),
            "lang": pa.array(["en"], pa.string()),
            "doctype": pa.array(["doc"], pa.string()),
        }
    )
    pq.write_table(csv_docs, os.path.join(corpus, "csv.parquet"))
    pq.write_table(plain, os.path.join(corpus, "plain.parquet"))
    out = str(tmp_path / "mixed_idx")
    # one file per schema variant; waves are per-file so schemas never mix
    build_index(
        [os.path.join(corpus, "csv.parquet")],
        BuildConfig(out_dir=out, tokenizer="regex", vocab_path=None),
    )
    cfg2 = BuildConfig(out_dir=out, tokenizer="regex", vocab_path=None)
    build_index(
        [os.path.join(corpus, "csv.parquet"), os.path.join(corpus, "plain.parquet")],
        cfg2,
    )
    eng = QueryEngine(out)
    both = eng.search("admiral", 10)
    assert set(both["doctype"].to_pylist()) == {"csv", "doc"}
    only_csv = eng.search("admiral !csv", 10)
    assert set(only_csv["doctype"].to_pylist()) == {"csv"}
    only_doc = eng.search("admiral !doc", 10)
    assert set(only_doc["doctype"].to_pylist()) == {"doc"}
