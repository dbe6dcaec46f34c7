"""Shared helpers for the driver-facing pipelines.

The word tokenization here is the SQL-reproducible one (RegexTokenizer,
``[a-z0-9]+`` over lowercased text); DuckDB mirrors it with
``list_filter(regexp_split_to_array(lower(text),'[^a-z0-9]+'), x -> x<>'')``.
"""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np
import pyarrow as pa
import ray.data as rd

WORD_RE = re.compile(r"[a-z0-9]+")

# The DuckDB expression equivalent to WORD_RE.findall(text.lower()).
SQL_TOKENS = "list_filter(regexp_split_to_array(lower(text),'[^a-z0-9]+'), x -> x <> '')"

# A fixed 25-word English stopword list shared by the quality/lang pipelines
# and their SQL oracles (the reference ships per-language stopword files,
# app/static/ling/stopwords/*; this is the pipeline-side analog).
STOPWORDS = (
    "the a an and or of to in is was for on with as it at by this that "
    "from are be not"
).split()
SQL_STOPWORDS = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"


def pool(n_pools: int = 1) -> tuple[int, int]:
    """Actor-pool (min, max) that can never starve task operators: min 1,
    max = (cluster CPUs - 2 reserved for read/write tasks) / n_pools."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return (1, max(1, (cpus - 2) // n_pools))


def documents_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "documents.parquet")


def embeddings_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "embeddings.parquet")


def read_documents(sf_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(documents_path(sf_dir), columns=columns)


def read_embeddings(sf_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(embeddings_path(sf_dir), columns=columns)


def tokenize_words(text: str) -> list[str]:
    return WORD_RE.findall(text.lower())


def md5_hex(text: str) -> str:
    return hashlib.md5(text.encode()).hexdigest()


def tokens_per_row(batch: pa.Table) -> tuple[list[list[str]], np.ndarray]:
    """→ (per-row token lists, per-row counts) for a batch with ``text``."""
    texts = batch["text"].to_pylist()
    toks = [tokenize_words(t) for t in texts]
    counts = np.fromiter((len(t) for t in toks), dtype=np.int64, count=len(toks))
    return toks, counts


def round6(x: np.ndarray) -> np.ndarray:
    """Round half AWAY from zero at 6dp — DuckDB's round() semantics.

    numpy's np.round is half-to-even; ratios of integers with power-of-two
    denominators land exactly on the .5 boundary of the 7th digit (e.g.
    1/128 = 0.0078125) and the two conventions then disagree.
    """
    x = np.asarray(x, dtype=np.float64)
    return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6
