"""Document/query vectorization kernels (SURVEY §2.3 M5/M6/M7).

The reference builds doc vectors as ``count(piece) × (-logprob)^5`` over the
SPM vocab, applies a winner-take-all threshold, then L2-normalizes
(``app/indexer/vectorizer.py:29-76``; power-5 call sites
``mk_page_vector.py:30,111``). All three re-expressed as batched numpy
kernels over Arrow list columns; usable inside ``map_batches`` or driver-side
(query vectors).

Quirk fidelity (M6): ``wta`` zeroes entries strictly below the k-th largest
value. On BOTH reference call paths it is a no-op — documents pass
``top_words = VEC_SIZE`` (nothing is below the 16000th value of a 16000-dim
vector) and queries pass the *character length* of the tokenized query
while all weights are ≥ 0, so the k-th value is 0 and nothing is strictly
below it. Kept for capability parity, tested for exactly that behavior.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..vocab import Vocab


def piece_weights(vocab: Vocab, power: float = 5.0) -> np.ndarray:
    """Per-piece weight: (-logprob)^power (reference readers.py:12 stores the
    negated logprob; power 5 at mk_page_vector.py:30)."""
    return np.asarray(vocab.weight, dtype=np.float64) ** power


def count_vector(term_ids: np.ndarray, size: int,
                 weights: np.ndarray | None = None) -> np.ndarray:
    """CountVectorizer-equivalent (M5): dense tf vector, optionally
    weighted elementwise."""
    v = np.bincount(np.asarray(term_ids, dtype=np.int64), minlength=size).astype(np.float64)
    if weights is not None:
        v *= weights
    return v


def wta(vec: np.ndarray, top_words: int) -> np.ndarray:
    """Winner-take-all (M6): zero entries strictly below the k-th largest.
    See module docstring — a documented no-op on the reference call paths."""
    if top_words >= vec.size:
        return vec
    kth = np.partition(vec, vec.size - top_words)[vec.size - top_words]
    out = vec.copy()
    out[out < kth] = 0.0
    return out


def l2_normalize(vec: np.ndarray) -> np.ndarray:
    """M7 (vectorizer.py:73-76 / utils.py:140-144)."""
    n = np.linalg.norm(vec)
    return vec / n if n > 0 else vec


def doc_vectors_batch(batch: pa.Table, vocab: Vocab,
                      power: float = 5.0) -> np.ndarray:
    """Batched M5→M7 over a tokenized batch's ``term_ids`` list column:
    one bincount per row, one weight multiply, row-L2 — the reference's
    per-doc ``compute_vec`` (mk_page_vector.py:29-32) vectorized."""
    w = piece_weights(vocab, power)
    col = batch["term_ids"]
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    lens = arr.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
    out = np.zeros((len(lens), vocab.size), dtype=np.float64)
    row_idx = np.repeat(np.arange(len(lens)), lens)
    np.add.at(out, (row_idx, flat), 1.0)
    out *= w[None, :]
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return out / norms


def query_vector(query: str, tokenizer, vocab: Vocab, power: float = 5.0) -> np.ndarray:
    """M14 (compute_query_vectors, mk_page_vector.py:105-113): tokenize +
    weight + the query-side WTA no-op + L2."""
    ids, _ = tokenizer.encode_ids_positions(query)
    v = count_vector(np.array(ids, dtype=np.int64), vocab.size,
                     piece_weights(vocab, power))
    v = wta(v, top_words=len(tokenizer(query)))  # char length — the quirk
    return l2_normalize(v)
