"""CLI driver (`python -m pears_lite_ray ...`) — the ray-job-submit entry
surface: build → search → delete → compact in-process against the smoke
corpus, asserting each subcommand's JSON-able payload."""

import io
import json
import sys

from pears_lite_ray.cli import main

SF = "/root/testdata/sf0.001/documents.parquet"


def _run(argv):
    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    try:
        rc = main(argv)
    finally:
        sys.stdout = old
    assert rc == 0
    return json.loads(buf.getvalue())


def test_cli_build_search_delete_compact(ray_session, tmp_path):
    idx = str(tmp_path / "idx")
    report = _run(["build", SF, "--out", idx, "--tokenizer", "regex"])
    assert report["n_docs"] == 500 and report["total_sec"] > 0

    res = _run(["search", "data merge", "--index", idx, "-k", "5"])
    assert len(res["results"]) == 5
    top_url = res["results"][0]["url"]

    # delete_urls unions the plain url-hash id with the staging-resolved
    # doc_id; for a table-assigned doc_id the hash entry is inert, so two
    # tombstone ids cover one real doc
    out = _run(["delete", top_url, "--index", idx])
    assert out["tombstones"] >= 1

    res2 = _run(["search", "data merge", "--index", idx, "-k", "5"])
    assert all(r["url"] != top_url for r in res2["results"])

    rep2 = _run(["compact", "--index", idx])
    assert rep2["n_docs"] == 499

    res3 = _run(["search", "data merge", "--index", idx, "-k", "5"])
    assert [r["url"] for r in res3["results"]] == [r["url"] for r in res2["results"]]
