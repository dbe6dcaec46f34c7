"""Extraction tests: jusText-style classifier branches + the per-row
invariant extract(html) == text, byte-identical per url (BASELINE.json
``input_hint``; reference htmlparser.py:16-30,78-110)."""

import pyarrow.parquet as pq

from pears_lite_ray.sources.fixtures import generate_corpus, generate_queries, write_corpus
from pears_lite_ray.text.extract import (
    classify_paragraphs,
    extract_record,
    remove_boilerplates,
    segment_paragraphs,
)

GOOD_PARA = ("the river and the mountain of the village is in the valley and "
             "it was a harvest for the people with the stone by the bridge")


def _classes(html):
    _, paras = segment_paragraphs(html)
    classify_paragraphs(paras, "en")
    return [(p.text[:25], p.final_class) for p in paras]


def test_good_paragraph_kept():
    html = f"<html><body><p>{GOOD_PARA}</p></body></html>"
    assert remove_boilerplates(html) == GOOD_PARA + " "


def test_high_link_density_dropped():
    html = ('<html><body><div><a href="/a">Home</a> <a href="/b">About</a> '
            f'<a href="/c">Contact page link</a></div><p>{GOOD_PARA}</p></body></html>')
    out = remove_boilerplates(html)
    assert "Home" not in out and GOOD_PARA in out


def test_no_stopword_filler_dropped():
    html = (f"<html><body><p>{GOOD_PARA}</p>"
            "<div>zorblax quux fnord glitchspan vortexcore bitmask hexdump</div>"
            "</body></html>")
    out = remove_boilerplates(html)
    assert "zorblax" not in out and GOOD_PARA in out


def test_short_between_goods_promoted():
    html = (f"<html><body><p>{GOOD_PARA}</p><p>A short note</p>"
            f"<p>{GOOD_PARA}</p></body></html>")
    cls = dict(_classes(html))
    assert cls["A short note"] == "good"


def test_short_between_bads_dropped():
    html = ("<html><body><div>zorblax quux fnord glitchspan vortexcore bitmask</div>"
            "<p>All rights reserved</p>"
            "<div>heapcrush loopgate forkbomb nullrange segfault regspill</div>"
            "</body></html>")
    cls = dict(_classes(html))
    assert cls["All rights reserved"] == "bad"


def test_script_and_title_excluded_from_body():
    html = (f"<html><head><title>T</title><script>var x=1;</script></head>"
            f"<body><p>{GOOD_PARA}</p></body></html>")
    title, paras = segment_paragraphs(html)
    assert title == "T"
    assert all("var x" not in p.text for p in paras)


def test_extract_record_semantics():
    html = (f"<html><head><title>My page</title></head><body>"
            f"<p>{GOOD_PARA}, with a comma</p></body></html>").encode()
    rec = extract_record(html)
    assert rec["ok"]
    # text = title + " " + body (mk_page_vector.py:50), body keeps commas
    assert rec["text"].startswith("My page " + GOOD_PARA)
    assert "," in rec["text"]
    # snippet = body[:300] with commas → '-' (htmlparser.py:109)
    assert "," not in rec["snippet"]
    assert rec["snippet"] == rec["body"][:300].replace(",", "-")


def test_missing_title_rejected():
    rec = extract_record(b"<html><body><p>hello</p></body></html>")
    assert not rec["ok"] and rec["text"] == ""


def test_language_gate_rejects_german():
    html = ("<html><head><title>wasser und garten</title></head><body>"
            "<p>und der die das ist nicht mit von auf wasser garten haus und "
            "der die das ist nicht mit von auf wasser garten haus</p>"
            "</body></html>").encode()
    rec = extract_record(html, installed_languages=("en",))
    assert not rec["ok"] and rec["error"] == "language-not-supported"


def test_corpus_invariant_byte_identical():
    """The headline per-row invariant over the full fixture corpus."""
    t = generate_corpus(200)
    n_en = 0
    for i in range(t.num_rows):
        rec = extract_record(t["html"][i].as_py())
        if t["lang"][i].as_py() == "en":
            assert rec["ok"], (i, rec["error"])
            assert rec["text"] == t["text"][i].as_py(), f"row {i} text mismatch"
            n_en += 1
        else:
            assert not rec["ok"]
    assert n_en > 150


def test_corpus_determinism_and_files(tmp_path):
    a = generate_corpus(50)
    b = generate_corpus(50)
    assert a.equals(b)
    paths = write_corpus(str(tmp_path), 50, n_files=3)
    total = sum(pq.read_table(p).num_rows for p in paths)
    assert total == a.num_rows
    # duplicate urls exist (dedup exercise)
    t = generate_corpus(300)
    assert len(set(t["url"].to_pylist())) < t.num_rows


def test_query_fixture_shape():
    q = generate_queries()
    assert q.num_rows >= 8 and set(q.column_names) == {"query_id", "query", "k"}
