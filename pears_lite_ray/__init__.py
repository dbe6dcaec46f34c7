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
