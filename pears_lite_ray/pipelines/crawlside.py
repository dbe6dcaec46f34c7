"""Crawl-side operators re-expressed as batch pipelines (SURVEY §2 S5/S6/W5).

The reference's spider, robots gate and HTML cache are live-web machinery
(urlopen / requests / local file writes); a batch engine sees the crawl as
DATA — a link graph, a robots table, a cache layout — so each op becomes a
dataset transform with the reference's decision semantics preserved:

* ``link_frontier`` (S5) — the spider's BFS frontier
  (``app/indexer/spider.py:40-58`` ``get_links``: queue seeds, expand a
  page's links, skip ``'#'`` links, bound the walk) as PRUNED
  LEVEL-SYNCHRONOUS distributed BFS: each level is one equi-join of the
  frontier against the edge table, a per-level distinct, and an anti-join
  against the visited set — so first discovery IS the shortest depth and
  the visited set is the answer. The reference's ``max_pages`` visit cap
  is inherently sequential (it depends on queue order); the batch analog
  bounds the walk by DEPTH instead.
* ``robots_filter`` (S6) — the robots.txt gate
  (``app/indexer/access.py:7-41`` ``robotcheck``) as a per-domain grouped
  predicate: parse the domain's robots.txt honoring ``User-agent`` section
  gating, build the disallow patterns exactly as the reference does
  (``Disallow: /`` appends the domain itself; other rules join under the
  domain; ``*`` becomes ``.*``; match = unanchored ``re.search`` on the
  url), and evaluate each pattern VECTORIZED over the whole domain group.
  ``ref_allowed`` preserves the reference's quirk verbatim: ``robotcheck``
  returns False whenever the ``*`` section has ANY disallow rule, whether
  or not one matches the url (access.py:35-41); ``allowed`` is the
  rule-matching semantics a crawler actually wants.
* ``cache_paths`` (W5) — the HTML cache sink
  (``app/indexer/caching.py:16-46`` ``cache_file``): url → cache-path
  mapping (netloc directory + path dirs; empty page → ``index.html``;
  non-``.html`` page gets the suffix appended) plus the ``</head>`` css
  injection, emitted as (url, cache_path, size) rows. The actual sink
  (``write_html_cache``) writes the cached pages as PARQUET partitioned by
  a domain-hash bucket — one-file-per-page is a filesystem DoS at crawl
  scale; a bucketed columnar cache keeps domain locality and scales to
  10^12 pages.

The testdata ``documents`` table carries no url/html/link columns, so —
exactly like the url_dedup / csv / stego / multimodal entries — urls,
robots policies and the link graph are synthesized DETERMINISTICALLY from
(doc_id, source) and replicated by the DuckDB oracles rule-for-rule.

Scale notes: ``robots_filter`` is a stateless zero-shuffle map (the gate
needs no cross-row state; a real-world robots table — one row per domain,
10^8 rows — would reach it by equi-join on domain, never a driver
broadcast or a skew-carrying domain groupby). ``link_frontier``'s
per-level join partitions on src doc_id; the edge table never moves to
the driver.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.urlnorm import (
    SQL_CANONICALIZE,
    SQL_SYNTH_URL,
    canonicalize_urls,
    registered_domains,
    synth_urls,
)
from .common import (
    documents_path,
    read_documents,
    shuffle_partitions,
    sql_fnv1a,
)

# ---------------------------------------------------------------------------
# S6: robots gate


def fnv1a_str(s: str) -> int:
    h = 0xCBF29CE484222325
    for b in s.encode():
        h = ((h ^ b) * 0x100000001B3) % (1 << 64)
    return h


_DECOY = "User-agent: BadBot\nDisallow: /private\n\n"


def robots_txt_for(domain: str) -> str:
    """Deterministic robots.txt per domain (FNV-1a(domain) % 4 picks the
    policy); every file carries a decoy non-``*`` section the parser must
    skip. The SQL oracle replicates the NET rules per policy id."""
    r = fnv1a_str(domain) % 4
    if r == 0:
        return _DECOY  # no 'User-agent: *' section at all
    lines = ["User-agent: *"]
    if r == 1:
        lines.append("Disallow: /p/1")
    elif r == 2:
        lines.append("Disallow: /")
    else:
        lines += ["Disallow: /p/*7", "Disallow: /admin"]
    return _DECOY + "\n".join(lines) + "\n"


def parse_disallowed(domain_url: str, robots: str) -> list[str]:
    """Reference ``robotcheck`` parse semantics (access.py:17-33):
    section gating on ``User-agent: *``; ``Disallow: /`` appends the domain
    itself; other rules strip the leading slash and join under the domain."""
    disallowed: list[str] = []
    parse = False
    for line in robots.splitlines():
        if "User-agent: *" in line:
            parse = True
        elif "User-agent" in line and parse:
            parse = False
        elif line == "Disallow: /" and parse:
            disallowed.append(domain_url)
        elif "Disallow:" in line and parse:
            m = re.search(r"Disallow:\s*(.+)", line)
            if m:
                u = m.group(1)
                if u[0] == "/":
                    u = u[1:]
                disallowed.append(domain_url + "/" + u)
    return disallowed


def q_robots_filter(sf_dir: str):
    """(doc_id, url, domain, n_rules, matched, ref_allowed, allowed) —
    canonical url gated by its domain's robots policy.

    STATELESS map, no shuffle: the policy derives deterministically from
    the domain, so each batch parses robots.txt once per unique domain it
    holds and evaluates each rule as one vectorized regex pass over that
    domain's row mask. (With a materialized robots TABLE instead of a
    derivable policy, this becomes a broadcast lookup for a small table or
    an equi-join on domain — never a groupby: domain groups carry the
    crawl's host skew, and the gate needs no cross-row state.)"""

    def gate(batch: pa.Table) -> pa.Table:
        urls_arr = canonicalize_urls(synth_urls(batch["doc_id"], batch["source"]))
        domains = registered_domains(urls_arr)
        doms = np.asarray(domains.to_pylist(), dtype=object)
        n = len(batch)
        matched = np.zeros(n, dtype=bool)
        n_rules = np.zeros(n, dtype=np.int64)
        for domain in np.unique(doms):  # few uniques per batch
            rules = parse_disallowed(
                "https://" + domain, robots_txt_for(domain)
            )
            mask = doms == domain
            n_rules[mask] = len(rules)
            if not rules:
                continue
            sub = urls_arr.filter(pa.array(mask))
            hit = np.zeros(int(mask.sum()), dtype=bool)
            for pat in rules:  # ≤2 rules: one vectorized regex pass each
                hit |= pc.match_substring_regex(
                    sub, pat.replace("*", ".*")
                ).to_numpy(zero_copy_only=False)
            matched[mask] = hit
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "url": urls_arr,
                "domain": domains,
                "n_rules": pa.array(n_rules, pa.int64()),
                "matched": pa.array(matched, pa.bool_()),
                # reference quirk: blocked iff ANY rule exists (access.py:38)
                "ref_allowed": pa.array(n_rules == 0, pa.bool_()),
                "allowed": pa.array(~matched, pa.bool_()),
            }
        )

    return read_documents(sf_dir, columns=["doc_id", "source"]).map_batches(
        gate, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# S5: spider frontier

FRONTIER_SEED_MOD = 101     # seeds: doc_id % 101 == 0
FRONTIER_MAX_DEPTH = 3
_EDGE_FANOUT = (1, 2, 3)    # dst_j = (src*31 + 97*j) % n_docs
_EDGE_SKIP_MOD = 11         # mirror of the spider's "'#' in link" skip
_EDGE_SKIP_RES = 3


#: Frontier scrub block width: ~32 MiB of (int64, int64) rows. Level
#: widths must follow the LEVEL's size — a web-graph frontier is
#: corpus-sized by depth 2-3, so a fixed small partition count would
#: funnel the whole frontier through a handful of blocks.
_FRONTIER_ROWS_PER_BLOCK = 2_000_000


def q_link_frontier(sf_dir: str):
    """(doc_id, depth) — docs reachable from the seed set within
    FRONTIER_MAX_DEPTH hops of the synthesized link graph; depth is the
    shortest hop count (BFS).

    PRUNED level-synchronous BFS: each level expands only docs first
    discovered at the previous depth (a ``left_anti`` join against the
    visited set), so levels shrink as the reachable set saturates and the
    result is the visited set itself — first discovery IS the shortest
    depth, no final corpus-wide groupby-min, and resident state is the
    O(V) visited set plus ONE level rather than all D levels at once."""
    n_docs = pq.ParquetFile(documents_path(sf_dir)).metadata.num_rows
    parts = shuffle_partitions(sf_dir)

    def edges_batch(batch: pa.Table) -> pa.Table:
        src = batch["doc_id"].to_numpy()
        srcs, dsts = [], []
        for j in _EDGE_FANOUT:
            keep = (src + j) % _EDGE_SKIP_MOD != _EDGE_SKIP_RES
            srcs.append(src[keep])
            dsts.append((src[keep] * 31 + 97 * j) % n_docs)
        return pa.table(
            {
                "src": pa.array(np.concatenate(srcs), pa.int64()),
                "dst": pa.array(np.concatenate(dsts), pa.int64()),
            }
        )

    def seeds_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        ids = ids[ids % FRONTIER_SEED_MOD == 0]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "depth": pa.array(np.zeros(ids.size, np.int64), pa.int64()),
            }
        )

    def _compact(ds):
        # seeds are sparse: most map blocks are EMPTY, and Ray 2.49
        # serializes groupby-aggregate empties schema-less, which the join
        # operator's hash shuffle rejects ("No match ... for key field
        # reference") — same quirk as dedup._scrub, and only a fixed-count
        # repartition CONCATENATES the empties away (a row-target
        # repartition passes 0-row blocks through untouched). Size the
        # count from the LEVEL's actual rows so a corpus-sized frontier
        # gets corpus-sized width instead of a fixed small constant; the
        # extra materialize holds one (int64, int64) level, and the level
        # is then probed twice (expand join + anti-join) without
        # recompute.
        m = ds.materialize()
        n = int(max(1, min(parts, m.count() // _FRONTIER_ROWS_PER_BLOCK + 1)))
        return m.repartition(n).materialize()

    docs = read_documents(sf_dir, columns=["doc_id"])
    edges = docs.map_batches(edges_batch, batch_format="pyarrow").materialize()
    frontier = _compact(docs.map_batches(seeds_batch, batch_format="pyarrow"))
    visited = frontier  # union-of-materialized chain: O(V) resident total

    for depth in range(1, FRONTIER_MAX_DEPTH + 1):
        if frontier.count() == 0:  # free on a materialized dataset
            break

        def level_rows(t: pa.Table, d: int = depth) -> pa.Table:
            # distinct dst at this level's depth (count() only forces the
            # vectorized hash aggregate — no per-group UDF calls)
            return pa.table(
                {
                    "doc_id": t["dst"],
                    "depth": pa.array(np.full(t.num_rows, d, np.int64)),
                }
            )

        reach = _compact(
            edges.join(
                frontier.select_columns(["doc_id"]),
                join_type="inner",
                num_partitions=parts,
                on=("src",),
                right_on=("doc_id",),
            )
            .groupby("dst", num_partitions=parts)
            .count()
            .map_batches(level_rows, batch_format="pyarrow")
        )
        if reach.count() == 0:
            break
        # prune already-visited docs: first discovery = shortest depth
        frontier = _compact(
            reach.join(
                visited.select_columns(["doc_id"]),
                join_type="left_anti",
                num_partitions=parts,
                on=("doc_id",),
            )
        )
        # both sides are materialized: the union concatenates block lists
        visited = visited.union(frontier).materialize()

    return visited


# ---------------------------------------------------------------------------
# W5: html cache layout

CSS_LINK = (
    '<link rel="stylesheet" type="text/css" href="/static/css/offline.css"/>\n'
)
_HTML_PRE = "<html><head><title>doc "
_HTML_MID = "</title>" + CSS_LINK + "</head><body>"
_HTML_SUF = "</body></html>"
_CACHED_CONST_LEN = len(_HTML_PRE) + len(_HTML_MID) + len(_HTML_SUF)


def cache_paths_for(urls: pa.Array | pa.ChunkedArray) -> tuple[pa.Array, pa.Array]:
    """(netloc, cache_path) per raw url — the reference's ``cache_file``
    mapping (caching.py:27-46): dirs = netloc + path dirs; empty page →
    ``index.html``; page without the ``.html`` suffix gets it appended."""
    after = pc.replace_substring_regex(urls, r"^https?://", "")
    netloc = pc.replace_substring_regex(after, r"/.*$", "")
    path = pc.replace_substring_regex(after, r"^[^/]*", "")
    path = pc.replace_substring_regex(path, r"[?#].*$", "")
    page = pc.replace_substring_regex(path, r"^.*/", "")
    dirp = pc.replace_substring_regex(path, r"[^/]*$", "")
    page = pc.if_else(
        pc.equal(page, ""),
        pa.scalar("index.html"),
        pc.if_else(
            pc.ends_with(page, pattern=".html"),
            page,
            pc.binary_join_element_wise(page, ".html", ""),
        ),
    )
    cache_path = pc.binary_join_element_wise(
        pa.array(["html_cache/"] * len(urls)), netloc, dirp, page, ""
    )
    fix = lambda a: a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
    return fix(netloc), fix(cache_path)


def q_cache_paths(sf_dir: str):
    """(doc_id, url, cache_path, n_chars_cached) — cache layout + size of
    the css-injected cached page for every document."""

    def layout(batch: pa.Table) -> pa.Table:
        urls = synth_urls(batch["doc_id"], batch["source"])
        _, cache_path = cache_paths_for(urls)
        id_len = pc.utf8_length(pc.cast(batch["doc_id"], pa.string()))
        n = pc.add(
            pc.add(pc.utf8_length(batch["text"]), id_len),
            pa.scalar(_CACHED_CONST_LEN, pa.int32()),
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "url": urls,
                "cache_path": cache_path,
                "n_chars_cached": pc.cast(n, pa.int64()),
            }
        )

    return read_documents(
        sf_dir, columns=["doc_id", "source", "text"]
    ).map_batches(layout, batch_format="pyarrow")


CACHE_BUCKETS = 16


def write_html_cache(sf_dir: str, out_dir: str) -> int:
    """The actual W5 sink: cached (css-injected) page text written as
    parquet PARTITIONED by a domain-hash bucket — domain locality without
    one-file-per-page. Returns the number of cached rows."""

    def build(batch: pa.Table) -> pa.Table:
        urls = synth_urls(batch["doc_id"], batch["source"])
        netloc, cache_path = cache_paths_for(urls)
        ids = pc.cast(batch["doc_id"], pa.string())
        html = pc.binary_join_element_wise(
            pa.array([_HTML_PRE] * len(batch)),
            ids,
            pa.array([_HTML_MID] * len(batch)),
            batch["text"],
            pa.array([_HTML_SUF] * len(batch)),
            "",
        )
        uniq: dict[str, int] = {}
        bucket = np.empty(len(batch), np.int64)
        for i, d in enumerate(netloc.to_pylist()):  # few uniques per batch
            if d not in uniq:
                uniq[d] = fnv1a_str(d) % CACHE_BUCKETS
            bucket[i] = uniq[d]
        return pa.table(
            {
                "url": urls,
                "cache_path": cache_path,
                "html": html,
                "bucket": pa.array(bucket, pa.int64()),
            }
        )

    ds = read_documents(
        sf_dir, columns=["doc_id", "source", "text"]
    ).map_batches(build, batch_format="pyarrow")
    ds.write_parquet(out_dir, partition_cols=["bucket"])
    import pyarrow.dataset as pads

    return pads.dataset(out_dir, format="parquet", partitioning="hive").count_rows()


# ---------------------------------------------------------------------------
# oracles

_SQL_CANON_RAW = SQL_CANONICALIZE.format(url="raw")

_SQL_ROBOTS = f"""
WITH u AS (SELECT doc_id, {SQL_SYNTH_URL} AS raw FROM documents),
c AS (SELECT doc_id, {_SQL_CANON_RAW} AS url FROM u),
cd AS (SELECT doc_id, url,
              regexp_replace(regexp_replace(url, '^https://', ''),
                             '/.*$', '') AS domain
       FROM c),
h AS (SELECT domain, {sql_fnv1a('domain')} % 4 AS r
      FROM (SELECT DISTINCT domain FROM cd)),
rules AS (SELECT domain,
                 CASE WHEN r = 0 THEN CAST([] AS VARCHAR[])
                      WHEN r = 1 THEN ['https://' || domain || '/p/1']
                      WHEN r = 2 THEN ['https://' || domain]
                      ELSE ['https://' || domain || '/p/.*7',
                            'https://' || domain || '/admin'] END AS pats
          FROM h)
SELECT cd.doc_id, cd.url, cd.domain,
       len(r.pats)::BIGINT AS n_rules,
       len(list_filter(r.pats, __rp -> regexp_matches(cd.url, __rp))) > 0
         AS matched,
       (len(r.pats) = 0) AS ref_allowed,
       NOT (len(list_filter(r.pats,
                            __rq -> regexp_matches(cd.url, __rq))) > 0)
         AS allowed
FROM cd JOIN rules r ON cd.domain = r.domain
"""

_SQL_FRONTIER = f"""
WITH RECURSIVE
n AS (SELECT count(*) AS c FROM documents),
e AS (SELECT d.doc_id AS src,
             (d.doc_id * 31 + 97 * t.j) % n.c AS dst
      FROM documents d, n, range(1, {len(_EDGE_FANOUT) + 1}) t(j)
      WHERE (d.doc_id + t.j) % {_EDGE_SKIP_MOD} <> {_EDGE_SKIP_RES}),
f(doc_id, depth) AS (
  SELECT doc_id, 0::BIGINT FROM documents
  WHERE doc_id % {FRONTIER_SEED_MOD} = 0
  UNION
  SELECT e.dst, f.depth + 1 FROM f JOIN e ON e.src = f.doc_id
  WHERE f.depth < {FRONTIER_MAX_DEPTH})
SELECT doc_id, min(depth)::BIGINT AS depth FROM f GROUP BY doc_id
"""

_SQL_CACHE = f"""
WITH u AS (SELECT doc_id, text, {SQL_SYNTH_URL} AS url FROM documents),
p AS (SELECT doc_id, text, url,
             regexp_replace(url, '^https?://', '') AS after0
      FROM u),
q AS (SELECT doc_id, text, url,
             regexp_replace(after0, '/.*$', '') AS netloc,
             regexp_replace(regexp_replace(after0, '^[^/]*', ''),
                            '[?#].*$', '') AS path
      FROM p),
r AS (SELECT doc_id, text, url, netloc,
             regexp_replace(path, '^.*/', '') AS page,
             regexp_replace(path, '[^/]*$', '') AS dirp
      FROM q)
SELECT doc_id, url,
       'html_cache/' || netloc || dirp ||
       (CASE WHEN page = '' THEN 'index.html'
             WHEN page LIKE '%.html' THEN page
             ELSE page || '.html' END) AS cache_path,
       ({_CACHED_CONST_LEN} + length(CAST(doc_id AS VARCHAR)) + length(text)
        )::BIGINT AS n_chars_cached
FROM r
"""

QUERIES = {
    "robots_filter": q_robots_filter,
    "link_frontier": q_link_frontier,
    "cache_paths": q_cache_paths,
}

ORACLE_SQL = {
    "robots_filter": _SQL_ROBOTS,
    "link_frontier": _SQL_FRONTIER,
    "cache_paths": _SQL_CACHE,
}
