"""The composed end-to-end curation pipeline: what a user actually runs
before tokenizing a crawl into a training set.

``curate`` chains the suite's building blocks — exact dedup winners
(J3 / ``dedup.q_exact_dedup``), the Gopher quality gate
(``textstats.q_gopher_quality``), the leakage-safe hash split
(``textstats.q_stratified_split``) and token counting — but FUSED: one
corpus pass computes md5 + gopher metrics + token count + split bucket
per batch, and ONE hash shuffle (on text_md5) resolves dedup winners.
Run as separate entries those stages cost four corpus reads and two
shuffles; composition is itself the operator here, and the DuckDB oracle
replicates the fused semantics end-to-end.

Output: (doc_id, split, n_tokens) for every SURVIVING doc — the exact-dup
canonical holder that passes the Gopher gate — ready to feed
``pack_sequences``.

Scale shape: stateless scoring map (vectorized kernels, no state), one
data-sized groupby on the md5 key (group sizes = duplicate multiplicity,
small by nature), nothing driver-side.
"""

from __future__ import annotations

import re as _re

import numpy as np
import pyarrow as pa

from .common import (
    SQL_STOPWORDS,
    md5_hex,
    read_documents,
    round6,
    sql_mix64,
    tokens_per_row,
)
from .textstats import (
    GOPHER_MAX_MWL,
    GOPHER_MAX_SYMBOL_RATIO,
    GOPHER_MAX_WORDS,
    GOPHER_MIN_ALPHA_RATIO,
    GOPHER_MIN_MWL,
    GOPHER_MIN_STOP_HITS,
    GOPHER_MIN_WORDS,
    SPLIT_BUCKETS,
    SPLIT_TEST_LT,
    SPLIT_VALID_LT,
    _STOPSET,
)

_ALPHA = _re.compile(r"[a-zA-Z]")


def q_curate(sf_dir: str):
    """(doc_id, split, n_tokens) for docs surviving dedup + quality."""
    from .common import mix64

    def score(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ids = batch["doc_id"].to_numpy()
        md5s, keeps = [], []
        for text in texts:
            words = text.split()
            wc = len(words)
            safe = max(wc, 1)
            mwl = float(round6(sum(len(w) for w in words) / safe))
            sym = float(round6(
                (text.count("#") + text.count("...")) / safe
            ))
            al = float(round6(
                sum(1 for w in words if _ALPHA.search(w)) / safe
            ))
            lowered = {w.lower() for w in words}
            st = sum(1 for s in _STOPSET if s in lowered)
            keeps.append(
                GOPHER_MIN_WORDS <= wc <= GOPHER_MAX_WORDS
                and GOPHER_MIN_MWL <= mwl <= GOPHER_MAX_MWL
                and sym <= GOPHER_MAX_SYMBOL_RATIO
                and al >= GOPHER_MIN_ALPHA_RATIO
                and st >= GOPHER_MIN_STOP_HITS
            )
            md5s.append(md5_hex(text))
        _, counts = tokens_per_row(batch)
        bucket = (mix64(ids.astype(np.uint64)) % np.uint64(SPLIT_BUCKETS)
                  ).astype(np.int64)
        split = np.where(
            bucket < SPLIT_TEST_LT, "test",
            np.where(bucket < SPLIT_VALID_LT, "valid", "train"),
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "text_md5": pa.array(md5s, pa.string()),
                "keep": pa.array(keeps, pa.bool_()),
                "n_tokens": pa.array(counts, pa.int64()),
                "split": pa.array(split, pa.string()),
            }
        )

    def winners(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy()
        is_canon = ids == ids.min()
        t = group.filter(pa.array(is_canon & group["keep"].to_numpy(
            zero_copy_only=False)))
        return t.select(["doc_id", "split", "n_tokens"])

    return (
        read_documents(sf_dir, columns=["doc_id", "text"])
        .map_batches(score, batch_format="pyarrow")
        .groupby("text_md5")
        .map_groups(winners, batch_format="pyarrow")
    )


_SQL_CURATE = f"""
WITH base AS (
  SELECT doc_id, text, md5(text) AS m,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS w
  FROM documents
),
g AS (
  SELECT doc_id, m,
         len(w) AS wc,
         greatest(len(w), 1) AS safe,
         coalesce(list_sum(list_transform(w, x -> length(x))), 0) AS chars,
         (length(text) - length(replace(text, '#', '')))
           + (length(text) - length(replace(text, '...', ''))) // 3 AS n_sym,
         len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]'))) AS n_alpha,
         len(list_intersect({SQL_STOPWORDS},
             list_distinct(list_transform(w, x -> lower(x))))) AS stop_hits,
         len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '')) AS n_tokens,
         min(doc_id) OVER (PARTITION BY md5(text)) AS canonical,
         ({sql_mix64('doc_id::UBIGINT')} % {SPLIT_BUCKETS})::BIGINT AS bucket
  FROM base
)
SELECT doc_id,
       CASE WHEN bucket < {SPLIT_TEST_LT} THEN 'test'
            WHEN bucket < {SPLIT_VALID_LT} THEN 'valid'
            ELSE 'train' END AS split,
       n_tokens
FROM g
WHERE doc_id = canonical
  AND wc BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
  AND round(chars::DOUBLE / safe, 6) BETWEEN {GOPHER_MIN_MWL} AND {GOPHER_MAX_MWL}
  AND round(n_sym::DOUBLE / safe, 6) <= {GOPHER_MAX_SYMBOL_RATIO}
  AND round(n_alpha::DOUBLE / safe, 6) >= {GOPHER_MIN_ALPHA_RATIO}
  AND stop_hits >= {GOPHER_MIN_STOP_HITS}
"""

QUERIES = {"curate": q_curate}
ORACLE_SQL = {"curate": _SQL_CURATE}
