"""Property tests (hypothesis) for the byte-level kernels everything else
sits on: varbyte codec round-trips, batched-FNV == per-byte FNV, the
bucketed pair combine == a naive dict combine."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pears_lite_ray import codec
from pears_lite_ray.pipelines.common import (
    distinct_per_row,
    fnv1a_slices,
    shingle_stream,
    word_hash_stream,
)


@given(st.lists(st.integers(min_value=0, max_value=(1 << 63) - 1), max_size=200))
@settings(max_examples=50, deadline=None)
def test_varbyte_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    buf = codec.varbyte_encode(arr)
    out = codec.varbyte_decode(buf)
    assert np.array_equal(out, arr)
    assert len(buf) == int(codec.varbyte_byte_lengths(arr).sum())


def _fnv_ref(data: bytes) -> int:
    h = 0xCBF29CE484222325
    for b in data:
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


@given(st.lists(st.binary(min_size=0, max_size=40), min_size=1, max_size=30))
@settings(max_examples=50, deadline=None)
def test_fnv1a_slices_matches_per_byte(chunks):
    buf = np.frombuffer(b"".join(chunks), dtype=np.uint8)
    lengths = np.array([len(c) for c in chunks], dtype=np.int64)
    starts = np.r_[0, np.cumsum(lengths)[:-1]]
    got = fnv1a_slices(buf, starts, lengths)
    want = [_fnv_ref(c) for c in chunks]
    assert got.tolist() == want


_WORD = st.text(alphabet="abcxyz019", min_size=1, max_size=8)


@given(st.lists(st.lists(_WORD, max_size=15), min_size=1, max_size=8))
@settings(max_examples=40, deadline=None)
def test_shingle_stream_matches_reference_shape(rows):
    n = 3
    r, hs = shingle_stream(rows, n)
    # per-row counts and values match a straight per-row loop
    for i, words in enumerate(rows):
        mine = hs[r == i]
        want = [
            _fnv_ref((" ".join(words[j:j + n]) + " ").encode())
            for j in range(max(0, len(words) - n + 1))
        ]
        assert mine.tolist() == want, (i, words)


@given(st.lists(st.lists(_WORD, max_size=12), min_size=1, max_size=6))
@settings(max_examples=40, deadline=None)
def test_distinct_per_row_counts(rows):
    r, hs = word_hash_stream(rows)
    rd_, vd, cnt = distinct_per_row(r, hs)
    for i, words in enumerate(rows):
        mask = rd_ == i
        from collections import Counter

        want = Counter(_fnv_ref(w.encode()) for w in words)
        got = dict(zip(vd[mask].tolist(), cnt[mask].tolist()))
        assert got == dict(want), (i, words)
        assert sorted(got) == vd[mask].tolist()  # sorted within row


@given(st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1),
                min_size=1, max_size=50))
@settings(max_examples=40, deadline=None)
def test_mix64_sql_replica_matches_numpy(values):
    """The splitmix64 finalizer (HLL registers, CMS columns, Bloom bit
    positions) must agree bit-for-bit between the numpy kernel and its
    DuckDB replica for arbitrary 64-bit inputs."""
    import duckdb

    from pears_lite_ray.pipelines.sketches import _mix64, _sql_mix64

    arr = np.array(values, dtype=np.uint64)
    got_np = _mix64(arr)
    con = duckdb.connect()
    con.execute("CREATE TABLE v(h UBIGINT)")
    con.executemany("INSERT INTO v VALUES (?)", [(int(x),) for x in values])
    got_sql = [r[0] for r in
               con.execute(f"SELECT {_sql_mix64('h')} FROM v").fetchall()]
    assert [int(x) for x in got_np] == [int(x) for x in got_sql]


@given(st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1),
                min_size=1, max_size=200))
@settings(max_examples=25, deadline=None)
def test_hll_register_state_is_merge_invariant(values):
    """Registers built from any split of the hash stream and merged by
    elementwise max equal the single-pass registers (the HLL merge law)."""
    from pears_lite_ray.pipelines.sketches import HLL_M, _hll_ranks

    arr = np.array(values, dtype=np.uint64)
    whole = np.zeros(HLL_M, dtype=np.int64)
    j, r = _hll_ranks(arr)
    np.maximum.at(whole, j, r)
    cut = len(values) // 2
    merged = np.zeros(HLL_M, dtype=np.int64)
    for part in (arr[:cut], arr[cut:]):
        if part.size:
            regs = np.zeros(HLL_M, dtype=np.int64)
            j, r = _hll_ranks(part)
            np.maximum.at(regs, j, r)
            merged = np.maximum(merged, regs)
    assert (whole == merged).all()
