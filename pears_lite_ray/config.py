"""Build/query configuration constants.

BM25 parameters fixed by BASELINE.json ``north_rule`` (k1=1.2, b=0.75).
Reference facts cited from the SURVEY: the reference's vocabulary is the
16k-piece SentencePiece unigram vocab (``app/__init__.py:33-36``), and its
jusText extraction parameters are at ``app/indexer/htmlparser.py:19-26``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

# SPM vocab (plain text, piece\tlogprob): the full 16k unigram vocab is
# vendored under resources/ so deployments never depend on an external
# mount (transcribed from the reference's public vocab file,
# app/api/models/en/enwiki.lite.16k.vocab).
REFERENCE_VOCAB = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "resources", "enwiki.lite.16k.vocab"
)

# BM25 (north_rule)
BM25_K1 = 1.2
BM25_B = 0.75

# Top-k default mirrors the reference's 50-doc cap (score_pages.py:117-135).
DEFAULT_TOP_K = 50

# jusText-style classifier parameters (htmlparser.py:19-26).
JUSTEXT_MAX_LINK_DENSITY = 0.3
JUSTEXT_STOPWORDS_LOW = 0.1
JUSTEXT_STOPWORDS_HIGH = 0.3
JUSTEXT_LENGTH_LOW = 30
JUSTEXT_LENGTH_HIGH = 100

# Index layout
N_TERM_SHARDS = 16          # segments/termhash=<h>/ directories
BLOCK_SIZE = 128            # postings per block-max block
# Skew splitting (SURVEY §4.3): a term whose in-batch df exceeds
# HOT_BATCH_FRACTION × batch docs is salted into 2**SALT_BITS doc-range
# buckets keyed by the top bits of doc_id (uniform hash → balanced, ordered,
# disjoint ranges; stage-2 merge is a concatenation).
SALT_BITS = 4
HOT_BATCH_FRACTION = 0.8


@dataclass
class BuildConfig:
    """Configuration for one index build."""

    out_dir: str
    tokenizer: str = "spm"            # "spm" | "regex"
    vocab_path: str = REFERENCE_VOCAB
    languages: tuple[str, ...] = ("en",)
    keep_positions: bool = True       # positions only needed for "pears" scoring
    n_shards: int = N_TERM_SHARDS
    block_size: int = BLOCK_SIZE
    salt_bits: int = SALT_BITS          # 0 disables skew splitting
    hot_frac: float = HOT_BATCH_FRACTION
    # actor-pool sizing; (min, max) autoscaling pools. "auto" resolves at
    # build time from the cluster CPU count, keeping min-actors small enough
    # that the pools can never starve the read/write task operators of CPUs
    # (with two pools at min=2 on a 4-CPU cluster the pipeline deadlocks:
    # 4 actors hold every CPU and the ReadParquet tasks never schedule).
    tokenize_concurrency: tuple[int, int] | int | str = "auto"
    extract_concurrency: tuple[int, int] | int | str = "auto"
    # bundle size for the actor stages: rows per task. Small enough that a
    # wave of input files splits into ≥ actor-count bundles (2048 left the
    # 32-CPU extract pool 8-wide on 2000-row files), large enough to keep
    # per-call overhead negligible.
    batch_size: int = 512
    extra: dict = field(default_factory=dict)

    @property
    def segments_dir(self) -> str:
        return os.path.join(self.out_dir, "segments")

    @property
    def docs_dir(self) -> str:
        return os.path.join(self.out_dir, "docs")

    @property
    def staging_dir(self) -> str:
        return os.path.join(self.out_dir, "staging")

    @property
    def stats_path(self) -> str:
        return os.path.join(self.out_dir, "stats.json")

    @property
    def manifest_dir(self) -> str:
        return os.path.join(self.out_dir, "manifest")
