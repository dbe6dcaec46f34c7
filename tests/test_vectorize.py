"""Vectorizer kernels (M5/M6/M7/M14) incl. the documented WTA no-op quirk."""

import numpy as np
import pyarrow as pa
import pytest

from pears_lite_ray.functions.vectorize import (
    count_vector,
    doc_vectors_batch,
    l2_normalize,
    piece_weights,
    query_vector,
    wta,
)
from pears_lite_ray.vocab import SpmTokenizer, Vocab

PIECES = [("<unk>", 0.0), ("▁the", -2.0), ("▁cat", -5.0), ("▁dog", -6.0),
          ("s", -3.0)]


@pytest.fixture(scope="module")
def vocab():
    return Vocab([p for p, _ in PIECES], [lp for _, lp in PIECES])


def test_count_vector_weighted(vocab):
    w = piece_weights(vocab)
    assert w[1] == pytest.approx(2.0 ** 5)
    v = count_vector(np.array([1, 1, 2]), vocab.size, w)
    assert v[1] == pytest.approx(2 * 32.0)
    assert v[2] == pytest.approx(5.0 ** 5)
    assert v[0] == 0.0


def test_wta_doc_path_is_noop(vocab):
    """Docs pass top_words = VEC_SIZE → nothing below the k-th value."""
    v = count_vector(np.array([1, 2, 3]), vocab.size, piece_weights(vocab))
    assert np.array_equal(wta(v, vocab.size), v)


def test_wta_query_path_is_noop(vocab):
    """Queries pass the CHARACTER length of the tokenized text; weights ≥ 0
    → the k-th value is 0 and nothing is strictly below it."""
    tok = SpmTokenizer(vocab)
    q = "the cat"
    v = count_vector(np.array(tok.encode_ids_positions(q)[0]), vocab.size,
                     piece_weights(vocab))
    assert np.array_equal(wta(v, top_words=len(tok(q))), v)


def test_wta_discriminates_when_genuinely_small_k():
    v = np.array([5.0, 1.0, 3.0, 0.5])
    out = wta(v, 2)
    assert out.tolist() == [5.0, 0.0, 3.0, 0.0]


def test_query_vector_unit_norm(vocab):
    tok = SpmTokenizer(vocab)
    v = query_vector("the cat dogs", tok, vocab)
    assert np.linalg.norm(v) == pytest.approx(1.0)
    assert v[1] > 0 and v[2] > 0


def test_doc_vectors_batch_matches_scalar(vocab):
    tok = SpmTokenizer(vocab)
    texts = ["the cat", "dogs the the", "cat cat cat"]
    rows = [tok.encode_ids_positions(t)[0] for t in texts]
    batch = pa.table({"term_ids": pa.array(rows, pa.list_(pa.int64()))})
    got = doc_vectors_batch(batch, vocab)
    for i, ids in enumerate(rows):
        want = l2_normalize(
            count_vector(np.array(ids), vocab.size, piece_weights(vocab))
        )
        assert np.allclose(got[i], want, atol=1e-12), texts[i]
