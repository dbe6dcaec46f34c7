"""Crawl-side batch analogs (SURVEY §2 S5/S6/W5): reference-semantics
conformance for the robots gate, the spider frontier, and the HTML cache
layout (reference: app/indexer/{access,spider,caching}.py)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pears_lite_ray.pipelines.crawlside import (
    CSS_LINK,
    FRONTIER_MAX_DEPTH,
    FRONTIER_SEED_MOD,
    cache_paths_for,
    fnv1a_str,
    parse_disallowed,
    q_cache_paths,
    q_link_frontier,
    q_robots_filter,
    robots_txt_for,
    write_html_cache,
)


@pytest.fixture(scope="module")
def crawl_docs_dir(tmp_path_factory):
    """120 docs across 6 sources — enough for several domains per robots
    policy bucket and a multi-hop frontier."""
    n = 120
    d = tmp_path_factory.mktemp("crawldocs")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array([f"body text {i}" for i in range(n)],
                                 pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array([f"site{i % 6}" for i in range(n)],
                                   pa.string()),
            }
        ),
        os.path.join(str(d), "documents.parquet"),
    )
    return str(d)


# --- S6 robots gate ---------------------------------------------------------


def test_parse_disallowed_reference_semantics():
    # transcription of access.py:17-33: section gating on 'User-agent: *',
    # 'Disallow: /' appends the domain itself, other rules join under it
    robots = (
        "User-agent: BadBot\n"
        "Disallow: /secret\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /p/1\n"
        "Disallow: /\n"
        "Disallow: /p/*7\n"
        "\n"
        "User-agent: Other\n"
        "Disallow: /other\n"
    )
    got = parse_disallowed("https://h.example.org", robots)
    assert got == [
        "https://h.example.org/p/1",
        "https://h.example.org",
        "https://h.example.org/p/*7",
    ]


def test_parse_disallowed_no_star_section():
    assert parse_disallowed("https://h", "User-agent: BadBot\nDisallow: /x\n") == []


def test_robots_txt_policy_is_hash_stable():
    # same domain → same policy text; decoy section always present
    for dom in ("a.example.org", "b.example.org", "site0.example.org"):
        txt = robots_txt_for(dom)
        assert txt == robots_txt_for(dom)
        assert txt.startswith("User-agent: BadBot")
        r = fnv1a_str(dom) % 4
        assert ("User-agent: *" in txt) == (r != 0)


def test_robots_filter_pipeline(ray_session, crawl_docs_dir):
    out = q_robots_filter(crawl_docs_dir).to_pandas()
    assert len(out) == 120
    by_dom = out.groupby("domain")
    for dom, g in by_dom:
        r = fnv1a_str(dom) % 4
        n_rules = {0: 0, 1: 1, 2: 1, 3: 2}[r]
        assert (g["n_rules"] == n_rules).all()
        # the reference quirk: allowed iff NO rules exist, match irrelevant
        assert (g["ref_allowed"] == (n_rules == 0)).all()
        if r == 0:
            assert not g["matched"].any()
        if r == 2:  # 'Disallow: /' → the domain pattern matches every url
            assert g["matched"].all() and not g["allowed"].any()
        if r == 3:  # wildcard '/p/.*7' → exactly urls with a 7 after /p/
            exp = g["url"].str.contains(r"/p/\d*7")
            assert (g["matched"] == exp).all()
    # modern semantics always: allowed == ~matched
    assert (out["allowed"] == ~out["matched"]).all()


# --- S5 spider frontier ------------------------------------------------------


def test_link_frontier_matches_sequential_bfs(ray_session, crawl_docs_dir):
    n = 120
    # sequential BFS with the same synthesized edge rule
    edges: dict[int, list[int]] = {i: [] for i in range(n)}
    for i in range(n):
        for j in (1, 2, 3):
            if (i + j) % 11 != 3:
                edges[i].append((i * 31 + 97 * j) % n)
    depth = {i: 0 for i in range(n) if i % FRONTIER_SEED_MOD == 0}
    frontier = list(depth)
    for d in range(1, FRONTIER_MAX_DEPTH + 1):
        nxt = []
        for s in frontier:
            for t in edges[s]:
                if t not in depth:
                    depth[t] = d
                    nxt.append(t)
        frontier = nxt
    got = q_link_frontier(crawl_docs_dir).to_pandas()
    assert dict(zip(got["doc_id"], got["depth"])) == depth


# --- W5 html cache -----------------------------------------------------------


def test_cache_paths_reference_mapping():
    urls = pa.array(
        [
            "http://Site.example.org/p/5",        # page without suffix
            "https://www.h.example.org/p/12/",    # trailing slash → index
            "https://h.example.org/p/3?utm=1#x",  # query/fragment dropped
            "https://h.example.org/a/b.html",     # suffix already present
        ]
    )
    netloc, paths = cache_paths_for(urls)
    assert netloc.to_pylist() == [
        "Site.example.org", "www.h.example.org",
        "h.example.org", "h.example.org",
    ]
    assert paths.to_pylist() == [
        "html_cache/Site.example.org/p/5.html",
        "html_cache/www.h.example.org/p/12/index.html",
        "html_cache/h.example.org/p/3.html",
        "html_cache/h.example.org/a/b.html",
    ]


def test_cache_paths_pipeline_sizes(ray_session, crawl_docs_dir):
    out = q_cache_paths(crawl_docs_dir).to_pandas()
    assert len(out) == 120
    # size = len(css-injected page): constant + len(str(doc_id)) + len(text)
    row = out[out["doc_id"] == 7].iloc[0]
    assert row["n_chars_cached"] > len("body text 7")
    assert row["cache_path"].startswith("html_cache/")


def test_write_html_cache_roundtrip(ray_session, crawl_docs_dir, tmp_path):
    out_dir = str(tmp_path / "cache")
    n = write_html_cache(crawl_docs_dir, out_dir)
    assert n == 120
    import pyarrow.dataset as pads

    t = pads.dataset(out_dir, format="parquet", partitioning="hive").to_table()
    assert t.num_rows == 120
    html = t["html"].to_pylist()
    assert all(CSS_LINK in h for h in html)
    # bucketed layout, not one file per page
    assert 1 <= len(os.listdir(out_dir)) <= 16
