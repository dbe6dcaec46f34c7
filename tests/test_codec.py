"""Codec unit tests: varbyte/delta roundtrip, block-max metadata (SURVEY §5.2)."""

import numpy as np
import pytest

from pears_lite_ray import codec


def test_varbyte_known_vectors():
    # FIXTURES.md §4: single value, dense run, 2^28 gap
    assert codec.varbyte_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert codec.varbyte_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert codec.varbyte_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    big = np.array([1 << 28], dtype=np.uint64)
    enc = codec.varbyte_encode(big)
    assert len(enc) == 5
    assert np.array_equal(codec.varbyte_decode(enc), big)


@pytest.mark.parametrize("n", [0, 1, 7, 1000])
def test_varbyte_roundtrip_random(n):
    rng = np.random.RandomState(n)
    vals = rng.randint(0, 1 << 62, size=n).astype(np.uint64) if n else np.empty(0, np.uint64)
    assert np.array_equal(codec.varbyte_decode(codec.varbyte_encode(vals)), vals)


def test_delta_roundtrip():
    v = np.array([5, 6, 100, 2**40, 2**40 + 1], dtype=np.uint64)
    assert np.array_equal(codec.delta_decode(codec.delta_encode(v)), v)


def _sample_list(n=500, seed=0):
    rng = np.random.RandomState(seed)
    docs = np.unique(rng.randint(0, 1 << 40, size=n).astype(np.uint64))
    m = docs.size
    tfs = rng.randint(1, 20, size=m).astype(np.uint64)
    dls = rng.randint(20, 200, size=m)
    return docs, tfs, dls


def test_posting_list_roundtrip_and_blocks():
    docs, tfs, dls = _sample_list()
    row = codec.encode_posting_list(
        docs, tfs, dls, avgdl=60.0, k1=1.2, b=0.75, block_size=128,
    )
    d2, t2, l2 = codec.decode_posting_list(row)
    assert np.array_equal(d2, docs.astype(np.int64))
    assert np.array_equal(t2, tfs.astype(np.int64))
    assert np.array_equal(l2, dls.astype(np.int64))
    # blocks decode independently and block-max bounds are exact maxima
    scores = codec.bm25_tf_norm(tfs, dls, 60.0, 1.2, 0.75)
    for i in range(len(row["block_n"])):
        bd, bt, bl = codec.decode_block(row, i)
        s, e = i * 128, min((i + 1) * 128, docs.size)
        assert np.array_equal(bd, docs[s:e].astype(np.int64))
        assert row["block_last_doc"][i] == int(docs[e - 1])
        assert row["block_max_tfnorm"][i] == pytest.approx(scores[s:e].max())


def test_positions_stream_roundtrip():
    docs, tfs, dls = _sample_list(50, seed=3)
    rng = np.random.RandomState(7)
    positions = [np.sort(rng.choice(500, size=int(t), replace=False)) for t in tfs]
    row = codec.encode_posting_list(
        docs, tfs, dls, avgdl=50.0,
        k1=1.2, b=0.75, block_size=16, positions=positions,
    )
    dec = codec.decode_positions(row["pos_bytes"], row["df"])
    assert len(dec) == len(positions)
    for a, b in zip(dec, positions):
        assert np.array_equal(a, b.astype(np.int64))


def test_bm25_math():
    # df == N/2 → idf = ln(1 + (N/2+0.5)/(N/2+0.5)) = ln 2
    assert codec.bm25_idf(50.0, 100.0) == pytest.approx(np.log(2.0))
    # tf→∞ ⇒ norm → k1+1
    assert codec.bm25_tf_norm(1e9, 100, 100.0, 1.2, 0.75) == pytest.approx(2.2, rel=1e-6)


def test_varbyte_single_byte_fast_path():
    import numpy as np

    from pears_lite_ray import codec

    # all-single-byte stream takes the bytes-are-values shortcut
    vals = np.arange(1, 128, dtype=np.uint64)
    buf = codec.varbyte_encode(vals)
    np.testing.assert_array_equal(codec.varbyte_decode(buf), vals)
    # count-limited prefix of a mixed stream where the prefix is 1-byte
    mixed = np.array([5, 9, 300, 7], dtype=np.uint64)
    mbuf = codec.varbyte_encode(mixed)
    np.testing.assert_array_equal(
        codec.varbyte_decode(mbuf, 2), np.array([5, 9], np.uint64)
    )
    np.testing.assert_array_equal(codec.varbyte_decode(mbuf), mixed)


def test_topk_select_boundary_ties_match_lexsort():
    import numpy as np

    from pears_lite_ray.query.bm25 import topk_select

    rng = np.random.default_rng(5)
    for _ in range(20):
        n = int(rng.integers(5, 400))
        # few distinct scores -> many exact ties at the k-th boundary
        scores = rng.integers(0, 6, n).astype(np.float64) / 3.0
        docs = rng.permutation(n).astype(np.int64)
        for k in (1, 3, 10, n, n + 5):
            d, s = topk_select(docs.copy(), scores.copy(), k)
            order = np.lexsort((docs, -scores))[:k]
            np.testing.assert_array_equal(d, docs[order])
            np.testing.assert_array_equal(s, scores[order])


def test_topk_select_degenerate_k():
    import numpy as np

    from pears_lite_ray.query.bm25 import topk_select

    docs = np.array([3, 1, 2], np.int64)
    scores = np.array([0.5, 0.9, 0.1])
    for k in (0, -1):
        d, s = topk_select(docs, scores, k)
        assert d.size == 0 and s.size == 0


def test_decoded_cache_budget_eviction():
    import numpy as np

    from pears_lite_ray.query.bm25 import DecodedCache

    c = DecodedCache(max_postings=100, min_list=10)
    small = np.arange(5, dtype=np.int64)
    c.put(1, small, small.astype(np.float64))
    assert c.get(1) is None  # below min_list: never cached
    big = np.arange(60, dtype=np.int64)
    c.put(2, big, big.astype(np.float64))
    assert c.get(2) is not None
    c.put(3, big, big.astype(np.float64))  # 120 > 100: wholesale eviction
    assert c.get(2) is None and c.get(3) is not None
    c.put(4, np.arange(200, dtype=np.int64), np.zeros(200))
    assert c.get(4) is None  # single list over budget is not kept
