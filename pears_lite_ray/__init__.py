"""pears_lite_ray — a Ray-Data-native inverted-index build + BM25 query engine.

A from-scratch reimplementation of the query/data-processing capabilities of
PeARSearch/PeARS-lite (reference surveyed in SURVEY.md) as an idiomatic
Ray Data pipeline: Arrow-zero-copy ``map_batches`` stages, actor pools for
stateful work (tokenizer, extractor), an explicit ``groupby(term_id)`` build
shuffle with partial posting-list pre-encoding, delta+varbyte-compressed
segments with block-max metadata, and a block-max WAND BM25 top-k scorer.

No code is copied from the reference; file:line citations in docstrings point
at the behavior being reimplemented.
"""

__version__ = "0.1.0"

import logging as _logging


class _SchemaHashNoiseFilter(_logging.Filter):
    """Drop Ray Data's per-reduce-task "Failed to hash the schemas"
    warning: pyarrow 16 schemas WITH key-value metadata are unhashable, so
    any block read from metadata-bearing parquet (the shared testdata
    files) triggers it inside fused ReadParquet->SplitBlocks operators —
    upstream of anything a pipeline can strip. Harmless (Ray falls back to
    full schema unification) but it drowned round-1's bench logs; our own
    stages already strip schema metadata at the read boundary."""

    def filter(self, record: _logging.LogRecord) -> bool:  # noqa: A003
        return "Failed to hash the schemas" not in record.getMessage()


# applies in every process that imports the package — including Ray
# workers, which import it to deserialize the pipeline callables. The
# filter must sit on the EMITTING logger (logger filters don't inherit).
_logging.getLogger(
    "ray.data._internal.arrow_ops.transform_pyarrow"
).addFilter(_SchemaHashNoiseFilter())
