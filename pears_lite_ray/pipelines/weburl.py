"""URL-level corpus hygiene operators (web training-data pipeline).

* ``url_dedup``  — canonical-url exact dedup (RefinedWeb §3.1 dedups on the
  normalized url before any content pass): synthesize the messy url, derive
  its canonical form (``functions/urlnorm.py``), and attach the canonical
  (min doc_id) holder to every member of a canonical-url group — the same
  one-shuffle grouped-map shape as ``dedup.q_exact_dedup`` (J3), with the
  url kernel in place of the content hash.
* ``domain_cap`` — per-registered-domain frequency cap (C4/CCNet-style
  domain balancing): rank each domain's docs by doc_id and flag the first
  ``DOMAIN_CAP_K`` as kept.

Scale notes: both groupbys hash-partition on a string key whose group
sizes mirror the crawl's host skew. url groups are small by nature (a
canonical url recrawled a handful of times); domain groups are NOT — a
100 TB crawl has domains with 10⁸ docs, so ``domain_cap``'s grouped rank
assumes a domain's (doc_id, domain) rows fit one task (~16 bytes/doc →
1.6 GB for 10⁸ docs: near the edge). Above that, keep the same output by
ranking in two stages: per-block partial counts → prefix offsets per
(domain, block) → block-local rank + offset; the K-kept SET alone needs
only a per-block partial top-K merge. Documented here per the
no-silent-assumptions rule; the tested path is the grouped map.

Both entries are hash-exact against DuckDB oracles that replicate the url
synthesis and the normalization regex chain string-for-string.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.urlnorm import (
    SQL_CANONICALIZE,
    SQL_SYNTH_URL,
    canonicalize_urls,
    registered_domains,
    synth_urls,
)
from .common import (
    read_documents,
    segment_broadcast_min,
    segment_rank,
    segmented_group_map,
    shuffle_partitions,
)

DOMAIN_CAP_K = 15


def _with_urls(batch: pa.Table) -> pa.Table:
    urls = synth_urls(batch["doc_id"], batch["source"])
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "url": urls,
            "canonical_url": canonicalize_urls(urls),
        }
    )


def q_url_dedup(sf_dir: str):
    """(doc_id, url, canonical_url, canonical_doc_id) — canonical_doc_id =
    min doc_id among docs sharing the canonical url.

    Segment-vectorized grouped map (``common.segmented_group_map``): url
    groups are tiny and numerous (nearly one per document), so a per-group
    UDF call is Python-call-bound; one reduceat per hash bucket does the
    same min-per-group across every group at once."""

    def attach_canonical(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        canon = segment_broadcast_min(tbl["doc_id"].to_numpy(), starts)
        return tbl.append_column("canonical_doc_id", pa.array(canon, pa.int64()))

    return segmented_group_map(
        read_documents(sf_dir, columns=["doc_id", "source"]).map_batches(
            _with_urls, batch_format="pyarrow"
        ),
        "canonical_url",
        attach_canonical,
        num_partitions=shuffle_partitions(sf_dir),
    )


def q_domain_cap(sf_dir: str):
    """(doc_id, domain, domain_rank, kept) — rank within the registered
    domain by doc_id asc; kept = rank ≤ DOMAIN_CAP_K.

    Partitioning assumption (documented scale caveat): one registered
    domain's rows land in one hash bucket, so a mega-domain (a blogspot.com
    at crawl scale) must fit a task. The cap semantics only need rank ≤ K
    though, so the scale escape is a two-pass variant: per-(domain, salt)
    partial rank + a domain-level offset join — same shape as the
    curriculum histogram offsets; switch when a domain's row bytes approach
    the block size."""

    def domain_batch(batch: pa.Table) -> pa.Table:
        urls = synth_urls(batch["doc_id"], batch["source"])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "domain": registered_domains(canonicalize_urls(urls)),
            }
        )

    def rank_bucket(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        rank = segment_rank(tbl.num_rows, starts)
        return pa.table(
            {
                "doc_id": tbl["doc_id"],
                "domain": tbl["domain"],
                "domain_rank": pa.array(rank, pa.int64()),
                "kept": pa.array(rank <= DOMAIN_CAP_K, pa.bool_()),
            }
        )

    return segmented_group_map(
        read_documents(sf_dir, columns=["doc_id", "source"]).map_batches(
            domain_batch, batch_format="pyarrow"
        ),
        "domain",
        rank_bucket,
        num_partitions=shuffle_partitions(sf_dir),
        sort_keys=[("domain", "ascending"), ("doc_id", "ascending")],
    )


_SQL_CANON = SQL_CANONICALIZE.format(url="url")

_SQL_URL_DEDUP = f"""
WITH u AS (SELECT doc_id, {SQL_SYNTH_URL} AS url FROM documents),
c AS (SELECT doc_id, url, {_SQL_CANON} AS canonical_url FROM u)
SELECT doc_id, url, canonical_url,
       min(doc_id) OVER (PARTITION BY canonical_url) AS canonical_doc_id
FROM c
"""

_SQL_DOMAIN_CAP = f"""
WITH u AS (SELECT doc_id, {SQL_SYNTH_URL} AS url FROM documents),
c AS (SELECT doc_id,
             regexp_replace(regexp_replace({_SQL_CANON}, '^https://', ''),
                            '/.*$', '') AS domain
      FROM u),
r AS (SELECT doc_id, domain,
             row_number() OVER (PARTITION BY domain ORDER BY doc_id)
               AS domain_rank
      FROM c)
SELECT doc_id, domain, domain_rank,
       (domain_rank <= {DOMAIN_CAP_K}) AS kept
FROM r
"""

QUERIES = {
    "url_dedup": q_url_dedup,
    "domain_cap": q_domain_cap,
}

ORACLE_SQL = {
    "url_dedup": _SQL_URL_DEDUP,
    "domain_cap": _SQL_DOMAIN_CAP,
}
