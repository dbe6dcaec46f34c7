"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in the library code it calls) calls ``ray.init()`` /
``ray.shutdown()``.

* ``entry()`` — flagship pipeline on /root/testdata/sf0.001: full
  inverted-index build over the ``documents`` table (extract → tokenize →
  postings explode → term groupby shuffle → compressed block-max segments)
  followed by batch BM25 top-k evaluation of the fixed query set.
* ``queries()`` — one callable per implemented operator pipeline
  (SURVEY.md §2 + the training-data operator set: dedup, similarity
  search, text analysis, index maintenance, multimodal stages).
* ``oracle_sql()`` — DuckDB SQL equivalents where expressible: 53 of the
  63 entries are SQL-exact, including the as-of and range joins
  (window-ranked / inequality-join replicas), exact per-type value
  quantiles, the per-source corpus-composition report, SimHash / winnowing fingerprints /
  language-ID (list_reduce FNV-1a), the pears fusion scoring, batch
  search, near-dup cluster assignment (recursive CTE), PII redaction
  (shared RE2 patterns), the multimodal stages (ord() byte extraction),
  the HyperLogLog distinct sketch (register-exact splitmix64 replica),
  the Count-Min bigram sketch (counter-exact replica), Bloom-filter
  decontamination (bit-position-exact replica),
  DSIR importance weights (integer micro-nat log-ratios) and TF-IDF
  keyword extraction. Rows-only by nature: MinHash/LSH/IVF/IVF-PQ ANN
  (hash permutations / trained quantizers), distributed k-means
  (iterative), pod routing (feature-hash centroids) and the
  SPM-tokenizer BM25 path (per-word Viterbi segmentation) —
  pytest-conformance-tested.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship: build the documents index at sf0.001 and evaluate the fixed
    BM25 query set; returns (query_id, doc_id, score) rows."""
    from pears_lite_ray.pipelines import fulltext

    return fulltext.q_bm25_topk(SF_SMOKE)


def queries() -> dict[str, Callable[[str], Any]]:
    from pears_lite_ray import pipelines

    return pipelines.all_queries()


def oracle_sql() -> dict[str, str]:
    from pears_lite_ray import pipelines

    return pipelines.all_oracle_sql()
