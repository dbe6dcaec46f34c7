"""``common.segmented_group_map`` — the segment-vectorized replacement for
per-tiny-group ``groupby(k).map_groups(fn)`` (Ray calls the UDF once PER
GROUP, ray/data/grouped_data.py::_apply_udf_to_groups; corpus-keyed
groupbys have ~one group per row, so per-group calls are the bottleneck
and, at web scale, billions of Python invocations).

Property under test: for any key column (string or int) and any segment
kernel, the output matches the per-group reference computed with pandas.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from pears_lite_ray.pipelines.common import (
    key_buckets,
    segment_broadcast_min,
    segment_rank,
    segmented_group_map,
    string_fnv,
)


def test_key_buckets_stable_across_chunking():
    arr = pa.array(["alpha", "beta", "alpha", "gamma", "beta"], pa.string())
    b = key_buckets(arr, 7)
    assert b[0] == b[2] and b[1] == b[4]
    chunked = pa.chunked_array([arr.slice(0, 2), arr.slice(2)])
    np.testing.assert_array_equal(b, key_buckets(chunked, 7))
    # int keys route through mix64
    ints = pa.array([5, 9, 5, 1], pa.int64())
    bi = key_buckets(ints, 16)
    assert bi[0] == bi[2]
    assert ((bi >= 0) & (bi < 16)).all()


def test_string_fnv_matches_scalar_fnv():
    # scalar FNV-1a reference
    def fnv(s: str) -> int:
        h = 0xCBF29CE484222325
        for ch in s.encode():
            h = ((h ^ ch) * 0x100000001B3) % (1 << 64)
        return h

    vals = ["", "a", "ab", "pears", "p" * 40]
    got = string_fnv(pa.array(vals, pa.string()))
    assert [int(x) for x in got] == [fnv(v) for v in vals]


def test_segment_helpers():
    vals = np.array([5, 3, 9, 2, 2, 7], dtype=np.int64)
    starts = np.array([0, 2, 5])
    np.testing.assert_array_equal(
        segment_broadcast_min(vals, starts), [3, 3, 2, 2, 2, 7]
    )
    np.testing.assert_array_equal(segment_rank(6, starts), [1, 2, 1, 2, 3, 1])


def test_count_le_lex_matches_bruteforce():
    from pears_lite_ray.pipelines.events import _count_le_lex

    rng = np.random.default_rng(3)
    for _ in range(5):
        ru = np.sort(rng.integers(0, 8, 60))
        # ts sorted within each user segment: sort pairs lexicographically
        rts = rng.integers(0, 50, 60)
        order = np.lexsort((rts, ru))
        ru, rts = ru[order], rts[order]
        qu = rng.integers(0, 8, 40)
        qts = rng.integers(0, 50, 40)
        got = _count_le_lex(ru, rts, qu, qts)
        want = [
            int(((ru < u) | ((ru == u) & (rts <= t))).sum())
            for u, t in zip(qu, qts)
        ]
        np.testing.assert_array_equal(got, want)


def _reference_min(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out["minv"] = out.groupby("k")["v"].transform("min")
    return out.sort_values(["k", "v"]).reset_index(drop=True)


def test_segmented_group_map_matches_per_group(ray_session):
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 60, 700)
    skeys = [f"key-{int(v)}" for v in keys]
    vals = rng.integers(0, 1_000_000, 700).astype(np.int64)
    tbl = pa.table({"k": pa.array(skeys, pa.string()), "v": pa.array(vals)})
    ds = rd.from_arrow(tbl).repartition(6)

    def seg_min(t: pa.Table, starts: np.ndarray) -> pa.Table:
        return t.append_column(
            "minv",
            pa.array(segment_broadcast_min(t["v"].to_numpy(), starts), pa.int64()),
        )

    got = (
        segmented_group_map(ds, "k", seg_min, num_partitions=4)
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    ref = _reference_min(pd.DataFrame({"k": skeys, "v": vals}))
    pd.testing.assert_frame_equal(got, ref)
    assert "_bucket" not in got.columns


def test_segmented_group_map_int_key_and_rank(ray_session):
    rng = np.random.default_rng(11)
    keys = rng.integers(0, 40, 400).astype(np.int64)
    vals = rng.permutation(400).astype(np.int64)
    ds = rd.from_arrow(pa.table({"k": pa.array(keys), "v": pa.array(vals)}))

    def seg_rank(t: pa.Table, starts: np.ndarray) -> pa.Table:
        return t.append_column(
            "r", pa.array(segment_rank(t.num_rows, starts), pa.int64())
        )

    got = (
        segmented_group_map(
            ds,
            "k",
            seg_rank,
            num_partitions=3,
            sort_keys=[("k", "ascending"), ("v", "ascending")],
        )
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    ref = pd.DataFrame({"k": keys, "v": vals}).sort_values(["k", "v"])
    ref["r"] = ref.groupby("k").cumcount() + 1
    ref = ref.reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref)
