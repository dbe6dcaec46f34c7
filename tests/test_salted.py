"""Skew splitting (SURVEY §4.3 / §5.2 item 5): hot terms salt into doc-range
buckets; the two-stage merge must produce results identical to the unsalted
path."""

import os

import numpy as np
import pyarrow as pa
import pytest

from pears_lite_ray import codec
from pears_lite_ray.config import BuildConfig
from pears_lite_ray.stages.postings import (
    ConcatSubSegments,
    MergeTermGroup,
    concat_subsegments_bucket,
    explode_partials,
    merge_partials_bucket,
)

MERGE_KW = dict(avgdl=50.0, k1=1.2, b=0.75, block_size=16, n_shards=16,
                keep_positions=True)


def _tok_batch(n_docs: int, seed: int = 5) -> pa.Table:
    """Synthetic tokenized batch: term 1 in EVERY doc (hot), term 2 rare."""
    rng = np.random.RandomState(seed)
    ids, pos, dl, docs = [], [], [], []
    for i in range(n_docs):
        doc_id = int(rng.randint(0, 1 << 62))
        terms = [1] * int(rng.randint(1, 4)) + ([2] if i % 37 == 0 else [])
        rng.shuffle(terms)
        ids.append(terms)
        pos.append(list(range(len(terms))))
        dl.append(len(terms))
        docs.append(doc_id)
    return pa.table(
        {
            "doc_id": pa.array(docs, pa.int64()),
            "term_ids": pa.array(ids, pa.list_(pa.int64())),
            "positions": pa.array(pos, pa.list_(pa.int32())),
            "doclen": pa.array(dl, pa.int32()),
        }
    )


def test_explode_salts_hot_terms_only():
    batch = _tok_batch(500)
    out = explode_partials(batch, keep_positions=True, salt_bits=3, hot_frac=0.5)
    t = out.to_pandas()
    hot = t[t.term_id == 1]
    cold = t[t.term_id == 2]
    assert len(hot) > 1, "hot term must split into multiple salt buckets"
    assert set(cold["salt"]) == {0}
    assert hot["salt"].nunique() == len(hot)  # one row per bucket in a batch
    # postings count preserved
    assert hot["n"].sum() == 500
    unsalted = explode_partials(batch, keep_positions=True, salt_bits=0).to_pandas()
    assert unsalted[unsalted.term_id == 1]["n"].sum() == 500


def _merge_groups(partials: pa.Table, by_salt: bool) -> dict[int, dict]:
    m = MergeTermGroup(**MERGE_KW)
    t = partials.to_pandas()
    keys = ["term_id", "salt"] if by_salt else ["term_id"]
    out = {}
    subrows = []
    for _, g in t.groupby(keys):
        sub = m(pa.Table.from_pandas(g, preserve_index=False))
        subrows.append(sub)
    return subrows


def test_salted_two_stage_equals_direct():
    batch1 = _tok_batch(400, seed=1)
    batch2 = _tok_batch(400, seed=2)
    salted = pa.concat_tables([
        explode_partials(b, keep_positions=True, salt_bits=3, hot_frac=0.5)
        for b in (batch1, batch2)
    ])
    plain = pa.concat_tables([
        explode_partials(b, keep_positions=True, salt_bits=0)
        for b in (batch1, batch2)
    ])

    # direct: one merge per term
    direct = {}
    for sub in _merge_groups(plain, by_salt=False):
        direct[sub["term_id"][0].as_py()] = sub

    # two-stage: merge per (term, salt), then concat per term
    subs: dict[int, list[pa.Table]] = {}
    for sub in _merge_groups(salted, by_salt=True):
        subs.setdefault(sub["term_id"][0].as_py(), []).append(sub)
    concat = ConcatSubSegments(**MERGE_KW)
    for term, rows in subs.items():
        final = concat(pa.concat_tables(rows).combine_chunks())
        want = direct[term]
        d1, t1, l1 = codec.decode_posting_list(final.to_pylist()[0])
        d2, t2, l2 = codec.decode_posting_list(want.to_pylist()[0])
        assert np.array_equal(d1, d2), f"term {term} docs differ"
        assert np.array_equal(t1, t2)
        assert np.array_equal(l1, l2)
        assert final["df"][0].as_py() == want["df"][0].as_py()
        p1 = codec.decode_positions(final["pos_bytes"][0].as_py(), final["df"][0].as_py())
        p2 = codec.decode_positions(want["pos_bytes"][0].as_py(), want["df"][0].as_py())
        assert all(np.array_equal(a, b) for a, b in zip(p1, p2))
        # block metadata still exact maxima per block
        row = final.to_pylist()[0]
        scores = codec.bm25_tf_norm(t1, l1, MERGE_KW["avgdl"], 1.2, 0.75)
        off = 0
        for bi, bn in enumerate(row["block_n"]):
            assert row["block_max_tfnorm"][bi] == pytest.approx(scores[off:off + bn].max())
            assert row["block_last_doc"][bi] == int(d1[off + bn - 1])
            off += bn


def test_concat_falls_back_on_overlap():
    """Mixed hot/cold classification → overlapping ranges → exact fallback."""
    batch = _tok_batch(300, seed=3)
    salted = explode_partials(batch, keep_positions=True, salt_bits=3, hot_frac=0.5)
    plain = explode_partials(batch, keep_positions=True, salt_bits=0)
    m = MergeTermGroup(**MERGE_KW)
    concat = ConcatSubSegments(**MERGE_KW)
    t = salted.to_pandas()
    hot = t[t.term_id == 1]
    # stage-1 merge each salted bucket, PLUS an unsalted full-range sub-list
    # (as if another batch classified the term cold) → ranges overlap
    rows = [m(pa.Table.from_pandas(g, preserve_index=False))
            for _, g in hot.groupby("salt")]
    full = m(pa.Table.from_pandas(
        plain.to_pandas()[plain.to_pandas().term_id == 1], preserve_index=False))
    merged = concat(pa.concat_tables(rows + [full]).combine_chunks())
    d, tf, dl = codec.decode_posting_list(merged.to_pylist()[0])
    # every doc exactly once (overlap duplicates dropped deterministically)
    assert len(np.unique(d)) == d.size == 300
    assert merged["df"][0].as_py() == 300


def _bucket_sorted(partials: pa.Table, keys: list[str]) -> tuple[pa.Table, np.ndarray]:
    """Emulate segmented_group_map's per-bucket input: rows sorted by the
    group keys + the group-start index array."""
    import pyarrow.compute as pc

    t = partials.combine_chunks()
    order = pc.sort_indices(t, sort_keys=[(k, "ascending") for k in keys])
    t = t.take(order)
    n = t.num_rows
    neq = np.zeros(n - 1, dtype=bool)
    for k in keys:
        col = t[k].combine_chunks()
        neq |= pc.not_equal(col.slice(1), col.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
    return t, np.r_[0, np.nonzero(neq)[0] + 1]


@pytest.mark.parametrize("keep_positions", [True, False])
def test_bucket_merge_matches_per_group(keep_positions):
    """merge_partials_bucket (one vectorized call per bucket) must be
    BYTE-IDENTICAL, column for column, to MergeTermGroup applied per
    (term_id, salt) group — including block metadata and positions."""
    kw = MERGE_KW | {"keep_positions": keep_positions}
    partials = pa.concat_tables([
        explode_partials(_tok_batch(400, seed=s), keep_positions=keep_positions,
                         salt_bits=3, hot_frac=0.5)
        for s in (1, 2, 7)
    ])
    tbl, starts = _bucket_sorted(partials, ["term_id", "salt"])
    got = merge_partials_bucket(tbl, starts, **kw)

    m = MergeTermGroup(**kw)
    per_group = []
    bounds = np.r_[starts, tbl.num_rows]
    for i in range(starts.size):
        per_group.append(m(tbl.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
                           .combine_chunks()))
    want = pa.concat_tables(per_group)
    assert got.num_rows == want.num_rows
    got_l, want_l = got.to_pylist(), want.to_pylist()
    for g, w in zip(got_l, want_l):
        assert g == w, f"term {w['term_id']} salt-group row differs"


def test_bucket_concat_matches_per_group():
    """concat_subsegments_bucket: cold terms pass through byte-identical,
    hot-term groups concatenate exactly like ConcatSubSegments."""
    partials = pa.concat_tables([
        explode_partials(_tok_batch(400, seed=s), keep_positions=True,
                         salt_bits=3, hot_frac=0.5)
        for s in (1, 2)
    ])
    tbl, starts = _bucket_sorted(partials, ["term_id", "salt"])
    sub = merge_partials_bucket(tbl, starts, **MERGE_KW)
    concat = ConcatSubSegments(**MERGE_KW)
    tbl2, starts2 = _bucket_sorted(sub, ["term_id"])
    got = concat_subsegments_bucket(tbl2, starts2, concat)

    per_group = []
    bounds = np.r_[starts2, tbl2.num_rows]
    for i in range(starts2.size):
        per_group.append(
            concat(tbl2.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
                   .combine_chunks()).select(tbl2.column_names)
        )
    want = pa.concat_tables(per_group)
    key = lambda r: r["term_id"]
    assert sorted(got.to_pylist(), key=key) == sorted(want.to_pylist(), key=key)


def test_build_salted_equals_unsalted(ray_session, small_corpus_dir, tmp_path_factory):
    from pears_lite_ray.index.build import build_index
    from pears_lite_ray.query.engine import QueryEngine
    from pears_lite_ray.sources.fixtures import generate_queries

    paths = sorted(
        os.path.join(small_corpus_dir, f)
        for f in os.listdir(small_corpus_dir) if f.endswith(".parquet")
    )
    out_s = str(tmp_path_factory.mktemp("idx_salted"))
    out_p = str(tmp_path_factory.mktemp("idx_plain"))
    build_index(paths, BuildConfig(out_dir=out_s, salt_bits=4, hot_frac=0.3))
    build_index(paths, BuildConfig(out_dir=out_p, salt_bits=0))
    es, ep = QueryEngine(out_s), QueryEngine(out_p)
    queries = generate_queries()
    for q, k in zip(queries["query"].to_pylist(), queries["k"].to_pylist()):
        ds_, ss = es.search_scores(q, int(k))
        dp, sp = ep.search_scores(q, int(k))
        assert ds_.tolist() == dp.tolist(), q
        assert np.allclose(ss, sp, atol=0), q
