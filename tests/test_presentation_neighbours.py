"""M16/M17 presentation + Q13 document neighbours."""

import os

import pytest

from pears_lite_ray.functions.presentation import (
    beautify_snippet,
    beautify_title,
    cc_flags_batch,
    is_cc,
)


def test_beautify_title_emoji_prefixes():
    assert beautify_title("Hello", "url") == "🌏 URL: Hello"
    assert beautify_title("Hello", "doc") == "📝 DOC: Hello"
    assert beautify_title("Hello", "csv") == "Hello"  # no emoji for csv


def test_beautify_snippet_highlights_both_cases():
    out = beautify_snippet("the Cat sat on the cat mat", "cat")
    assert out == "the <b>Cat</b> sat on the <b>cat</b> mat"


def test_is_cc_rules():
    assert is_cc("https://en.wikipedia.org/wiki/X", b"")
    assert not is_cc("https://example.com/", b"<html></html>")
    assert is_cc("https://example.com/",
                 b"<img src='https://creativecommons.org/l.png'>")
    assert is_cc("https://example.com/", b'<img alt="x" src="/img/cc-by.svg">')


def test_cc_flags_batch():
    import pyarrow as pa

    t = pa.table(
        {
            "url": pa.array(["https://stackoverflow.com/q/1", "https://x.org/"]),
            "html": pa.array([b"", b"<p>no</p>"], pa.binary()),
        }
    )
    out = cc_flags_batch(t)
    assert out["is_cc"].to_pylist() == [True, False]


def test_neighbour_docs(ray_session, small_corpus_dir, tmp_path_factory):
    import pyarrow.parquet as pq

    from pears_lite_ray.config import BuildConfig
    from pears_lite_ray.index.build import build_index
    from pears_lite_ray.query.neighbours import neighbour_docs

    out = str(tmp_path_factory.mktemp("nbr_idx"))
    paths = sorted(
        os.path.join(small_corpus_dir, f)
        for f in os.listdir(small_corpus_dir) if f.endswith(".parquet")
    )
    build_index(paths, BuildConfig(out_dir=out))
    # pick an indexed url
    t = pq.read_table(os.path.join(out, "staging"), columns=["doc_id", "url"])
    url = t["url"][0].as_py()
    target = t["doc_id"][0].as_py()

    res = neighbour_docs(out, url, k=10)
    assert 0 < res.num_rows <= 10
    assert target not in res["doc_id"].to_pylist()  # self excluded
    cos = res["cos"].to_pylist()
    assert cos == sorted(cos, reverse=True)
    assert all(-1.0001 <= c <= 1.0001 for c in cos)

    with pytest.raises(KeyError):
        neighbour_docs(out, "https://not.indexed/xyz")
