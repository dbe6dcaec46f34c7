"""Deduplication operators over the ``documents`` table.

Large-scale-training-pipeline staples, each in its scalable Ray Data shape
— no driver-side materialization anywhere in these pipelines (round-2 fix):

* exact      — hash-partition on md5(text); the per-group map attaches
               the canonical winner (min doc_id) to every member row in
               one shuffle (no join, no driver state). SQL-oracle-checked.
* shingles   — 3-word-shingle inverted index → co-occurring pairs →
               exact Jaccard per pair. The shuffle ships 8-byte FNV-1a
               shingle hashes (not strings), and each doc's distinct-set
               size rides along with the exploded rows, so the final
               Jaccard is computed from the pair aggregate alone (zero
               joins, zero driver state). SQL-oracle-checked (the oracle
               self-joins on shingle strings; 64-bit hashes are
               collision-free at any testable scale). At 100 TB the same
               plan holds with a hot-shingle cap (a shingle shared by >P
               docs contributes O(P²) pairs; cap documented below).
* minhash    — 64-perm MinHash, banded LSH (8×8) candidate pairs,
               deduplicated with a pair-key groupby and verified with
               exact Jaccard via two equi-joins against the distributed
               shingle-set table (sets packed as binary blobs, the join
               key stays 8 bytes/row). Deterministic; rows-only check.
* simhash    — 64-bit SimHash fingerprint per doc (word unigrams),
               fully vectorized (batched FNV + np.add.at bit
               accumulation). SQL-oracle-checked: the oracle replicates
               FNV-1a with list_reduce over word bytes.
"""

from __future__ import annotations

import logging
import os

import numpy as np
import pyarrow as pa

from .common import (
    SQL_TOKENS,
    distinct_per_row,
    tune_shuffle_admission,
    md5_hex,
    mix64,
    pool,
    read_documents,
    round6,
    segment_broadcast_min,
    segment_pairs,
    segmented_group_map,
    shingle_stream,
    shuffle_partitions,
    sql_fnv1a,
    sql_mix64,
    tokens_per_row,
    word_hash_stream,
)

_LOG = logging.getLogger("pears_lite_ray.dedup")

JACCARD_NGRAM = 3
MINHASH_PERMS = 64
MINHASH_BANDS = 8  # 8 rows per band
# At scale: a shingle shared by more than this many docs is dropped from
# pair generation (it only produces near-universal boilerplate pairs).
# NEVER silent: each capped group emits a marker row, the reduce logs the
# aggregate drop count, and jaccard_dropped_shingles() /
# lsh_dropped_buckets() report the exact dropped set.
HOT_SHINGLE_CAP = 1000
# Floor for the equi-join partition count; joins size themselves from the
# input data (see join_partitions) because each partition costs a standing
# aggregator actor — measured: a 256-row candidate join takes 3.7 s at 2
# partitions and 6.8 s at 8 (fixed per-aggregator cost dominates small
# joins), while corpus-sized joins need partitions ∝ bytes.
JOIN_PARTITIONS = 8

_MERSENNE = np.uint64((1 << 61) - 1)


def join_partitions(sf_dir: str) -> int:
    """Data-sized partition count for corpus-keyed equi-joins — delegates
    to the shared sizing rule (pipelines/common.shuffle_partitions)."""
    from .common import shuffle_partitions

    return shuffle_partitions(sf_dir, floor=JOIN_PARTITIONS)


def _scrub(ds, n: int = JOIN_PARTITIONS):
    """Workaround for Ray 2.49's groupby().aggregate(): partitions that end
    up empty are emitted as schema-less zero-column blocks, which the join
    operator cannot hash-partition ("No match ... for key field reference").
    map_batches can't fix it (Ray skips empty blocks in map stages), but a
    repartition concatenates them away. Only ever applied to aggregate
    outputs that feed a join; the moved data is the compact aggregate, not
    the corpus."""
    return ds.repartition(n)


def _shingle_hashes(words: list[str], n: int = JACCARD_NGRAM) -> np.ndarray:
    """Distinct 64-bit FNV-1a hashes of n-word shingles (sorted).

    Single-row convenience wrapper over the batched kernel
    (:func:`shingle_stream`) — used by tests and the per-doc helpers."""
    rows, hs = shingle_stream([words], n)
    if hs.size == 0:
        return np.empty(0, dtype=np.uint64)
    return np.unique(hs)


PAIR_BUCKETS = 64


def pair_buckets(a: np.ndarray, b: np.ndarray, n: int = PAIR_BUCKETS) -> np.ndarray:
    """Deterministic bucket id per (a, b) pair — both occurrences of a pair
    hash to the same bucket, so a bucket-group combine is exact."""
    with np.errstate(over="ignore"):
        h = (a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) ^ b.astype(np.uint64)
    return (h % np.uint64(n)).astype(np.int32)


# -- exact dedup -------------------------------------------------------------

def q_exact_dedup(sf_dir: str):
    """Every doc mapped to the canonical (min doc_id) holder of its exact
    text (J3 semantics ↔ mk_page_vector.py:37, by content not url).

    ONE hash-partitioned shuffle co-locates each hash's rows; the
    per-group min is a segment kernel over every group of a bucket at once
    (``common.segmented_group_map`` — nearly every doc forms its own
    1-row group, so a per-group UDF call would be Python-call-bound).
    (Round-2 used aggregate + equi-join: same semantics, but two standing
    hash-operator actor fleets for what one grouped map does.)"""

    def hash_batch(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "text_md5": pa.array([md5_hex(t) for t in texts], pa.string()),
            }
        )

    def attach_canonical(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        canon = segment_broadcast_min(tbl["doc_id"].to_numpy(), starts)
        return tbl.append_column("canonical_doc_id", pa.array(canon, pa.int64()))

    return segmented_group_map(
        read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
            hash_batch, batch_format="pyarrow"
        ),
        "text_md5",
        attach_canonical,
        num_partitions=shuffle_partitions(sf_dir),
    )


# -- n-gram Jaccard ----------------------------------------------------------

def q_jaccard_pairs(sf_dir: str, hot_cap: int = HOT_SHINGLE_CAP):
    """All doc pairs sharing ≥1 3-word shingle, with exact Jaccard over
    distinct-shingle sets. Pair generation via the shingle inverted index
    (groupby shingle-hash → within-group pairs); each exploded row carries
    its doc's distinct-set size, so intersection counts AND set sizes come
    out of the pair combine — no cross join, no second pass over the
    corpus, no driver lookup table.

    The pair combine is a BUCKETED groupby: pair rows carry a
    ``hash(pair) % N`` bucket column, the groupby runs over N buckets and
    each group collapses its pairs with one vectorized sort+reduceat.
    Ray's built-in ``aggregate`` costs ~15 µs of per-group overhead — at
    ~1M pair groups that was 17 s of the round-1 pipeline; N=64 buckets
    make the grouping overhead negligible while the combine stays exact
    (every row of a pair shares its bucket by construction)."""

    def explode(batch: pa.Table) -> pa.Table:
        toks, _ = tokens_per_row(batch)
        ids = batch["doc_id"].to_numpy()
        rows, hs = shingle_stream(toks, JACCARD_NGRAM)
        r, v, _ = distinct_per_row(rows, hs)
        nsh_per_row = np.zeros(len(toks), dtype=np.int64)
        if r.size:
            np.add.at(nsh_per_row, r, 1)
        return pa.table(
            {
                "shingle": pa.array(v.view(np.int64), pa.int64()),
                "doc_id": pa.array(ids[r], pa.int64()),
                "nsh": pa.array(nsh_per_row[r], pa.int64()),
            }
        )

    shingle_docs = read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        explode, batch_format="pyarrow"
    )

    def pairs_of_bucket(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        # segment-vectorized pair generation (one UDF call per hash bucket,
        # not per shingle — distinct shingles ≈ corpus token count, the
        # most numerous grouping in the suite): rows sorted by
        # (shingle, doc_id); row at in-segment rank k of an m-row segment
        # pairs with the m-1-k rows after it, so all pairs of ALL shingles
        # come from repeat/cumsum index arithmetic
        n = tbl.num_rows
        docs = tbl["doc_id"].to_numpy()
        nsh = tbl["nsh"].to_numpy()
        a_idx, b_idx, hot_sizes = segment_pairs(starts, n, hot_cap)
        a, b = docs[a_idx], docs[b_idx]
        out = pa.table(
            {
                "bucket": pa.array(pair_buckets(a, b), pa.int32()),
                "doc_a": pa.array(a, pa.int64()),
                "doc_b": pa.array(b, pa.int64()),
                "na": pa.array(nsh[a_idx], pa.int64()),
                "nb": pa.array(nsh[b_idx], pa.int64()),
            }
        )
        if hot_sizes.size:
            # hot-shingle drop is REPORTED, not silent: one marker row per
            # dropped shingle rides to the bucket=-1 group, whose reduce
            # logs the aggregate count (exact set: jaccard_dropped_shingles)
            markers = pa.table(
                {
                    "bucket": pa.array(
                        np.full(hot_sizes.size, -1, np.int32), pa.int32()
                    ),
                    "doc_a": pa.array(
                        np.full(hot_sizes.size, -1, np.int64), pa.int64()
                    ),
                    "doc_b": pa.array(hot_sizes, pa.int64()),
                    "na": pa.array(np.zeros(hot_sizes.size, np.int64)),
                    "nb": pa.array(np.zeros(hot_sizes.size, np.int64)),
                }
            )
            out = pa.concat_tables([out, markers])
        return out

    def combine(group: pa.Table) -> pa.Table:
        if int(group["bucket"][0].as_py()) == -1:  # hot-shingle markers
            sizes = group["doc_b"].to_numpy()
            _LOG.warning(
                "jaccard_pairs: dropped %d hot shingles over the %d-doc cap "
                "(largest shared by %d docs); exact set via "
                "jaccard_dropped_shingles()",
                len(group), hot_cap, int(sizes.max()),
            )
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "inter": pa.array([], pa.int64()),
                             "jaccard": pa.array([], pa.float64())})
        a = group["doc_a"].to_numpy()
        b = group["doc_b"].to_numpy()
        na = group["na"].to_numpy()
        nb = group["nb"].to_numpy()
        order = np.lexsort((b, a))
        a, b, na, nb = a[order], b[order], na[order], nb[order]
        first = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        idx = np.nonzero(first)[0]
        inter = np.diff(np.r_[idx, a.size]).astype(np.float64)
        sa = na[first].astype(np.float64)
        sb = nb[first].astype(np.float64)
        jac = round6(inter / (sa + sb - inter))
        return pa.table(
            {
                "doc_a": pa.array(a[first], pa.int64()),
                "doc_b": pa.array(b[first], pa.int64()),
                "inter": pa.array(inter.astype(np.int64), pa.int64()),
                "jaccard": pa.array(jac, pa.float64()),
            }
        )

    return segmented_group_map(
        shingle_docs,
        "shingle",
        pairs_of_bucket,
        num_partitions=shuffle_partitions(sf_dir),
        sort_keys=[("shingle", "ascending"), ("doc_id", "ascending")],
    ).groupby("bucket").map_groups(combine, batch_format="pyarrow")


def jaccard_dropped_shingles(sf_dir: str, hot_cap: int = HOT_SHINGLE_CAP):
    """(shingle, n_docs) for every shingle the hot cap drops from
    q_jaccard_pairs — the no-silent-caps report. Per-batch partial
    distinct-doc counts, a tiny groupby-sum, filter > cap; output size is
    the number of boilerplate shingles, never corpus-sized."""
    from ray.data.aggregate import Sum

    def partial_counts(batch: pa.Table) -> pa.Table:
        toks, _ = tokens_per_row(batch)
        rows, hs = shingle_stream(toks, JACCARD_NGRAM)
        _, v, _ = distinct_per_row(rows, hs)
        u, cnt = np.unique(v, return_counts=True)
        return pa.table(
            {
                "shingle": pa.array(u.view(np.int64), pa.int64()),
                "n_p": pa.array(cnt, pa.int64()),
            }
        )

    from .common import shuffle_partitions

    ds = (
        read_documents(sf_dir, columns=["doc_id", "text"])
        .map_batches(partial_counts, batch_format="pyarrow")
        .groupby("shingle", num_partitions=shuffle_partitions(sf_dir))
        .aggregate(Sum("n_p", alias_name="n_docs"))
    )

    def keep_hot(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(t["n_docs"].to_numpy() > hot_cap))

    return ds.map_batches(keep_hot, batch_format="pyarrow")


# -- MinHash + LSH -----------------------------------------------------------

def minhash_perms() -> tuple[np.ndarray, np.ndarray]:
    """The fixed universal-hash coefficients (a_p, b_p) for the 64 MinHash
    permutations, derived with splitmix64's mixer instead of a numpy RNG so
    the DuckDB oracle can replicate them term-for-term:
    ``a_p = mix64(2p+1) % (M-1) + 1`` (in [1, M-1]), ``b_p = mix64(2p+2) % M``
    with M = 2^61 - 1."""
    p = np.arange(MINHASH_PERMS, dtype=np.uint64)
    a = (mix64(2 * p + np.uint64(1)) % (_MERSENNE - np.uint64(1))) + np.uint64(1)
    b = mix64(2 * p + np.uint64(2)) % _MERSENNE
    return a, b


class MinHashStage:
    """Actor-pool stage: text → 64 minhashes + band keys + the packed
    shingle-set blob (state = the fixed permutation coefficients, built
    once per actor). Fully batched: one (perms × shingles) hash matrix per
    batch, segmented min per doc (np.minimum.reduceat), vectorized FNV
    fold for band keys.

    ONE corpus pass feeds both LSH banding and exact-Jaccard verification:
    per doc the stage emits MINHASH_BANDS band rows (shset empty) plus one
    ``band = -1`` row carrying the sorted distinct shingle hashes as an
    8-byte-per-hash binary blob. The caller materializes the output once
    and splits it with two filters."""

    def __init__(self):
        self.a, self.b = minhash_perms()

    def signatures(self, toks: list[list[str]]) -> tuple[np.ndarray, list[bytes]]:
        """((n_rows, MINHASH_PERMS) int64 signatures, per-row shingle-set
        blobs)."""
        n_rows = len(toks)
        sigs = np.full((n_rows, MINHASH_PERMS), np.iinfo(np.int64).max,
                       dtype=np.int64)
        blobs = [b""] * n_rows
        rows, hs = shingle_stream(toks, JACCARD_NGRAM)
        r, v, _ = distinct_per_row(rows, hs)
        if r.size == 0:
            return sigs, blobs
        starts = np.r_[0, np.nonzero(r[1:] != r[:-1])[0] + 1]
        ends = np.r_[starts[1:], r.size]
        for s_, e_, row in zip(starts, ends, r[starts]):
            blobs[row] = v[s_:e_].tobytes()
        x = v.astype(np.uint64) % _MERSENNE
        prod = (self.a[:, None] * x[None, :] + self.b[:, None]) % _MERSENNE
        mins = np.minimum.reduceat(prod, starts, axis=1)  # (perms, docs)
        sigs[r[starts]] = mins.T.astype(np.int64)
        return sigs, blobs

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .common import FNV_BASIS, FNV_PRIME

        toks, _ = tokens_per_row(batch)
        ids = batch["doc_id"].to_numpy()
        sigs, blobs = self.signatures(toks)
        sigs = sigs.astype(np.uint64)
        rpb = MINHASH_PERMS // MINHASH_BANDS
        n = ids.size
        # band key: FNV-style fold over the band's rpb signature values
        # (vectorized over (n, bands); replaces the per-doc blake2b calls)
        keys = np.full((n, MINHASH_BANDS), FNV_BASIS, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(rpb):
                col = sigs[:, j::rpb]  # (n, bands): value j of each band
                keys = (keys ^ col) * FNV_PRIME
        keys &= np.uint64((1 << 63) - 1)
        doc_col = np.concatenate([np.repeat(ids, MINHASH_BANDS), ids])
        band_col = np.concatenate([
            np.tile(np.arange(MINHASH_BANDS, dtype=np.int32), n),
            np.full(n, -1, dtype=np.int32),
        ])
        key_col = np.concatenate([
            keys.reshape(-1).astype(np.int64), np.zeros(n, dtype=np.int64)
        ])
        blob_col = [b""] * (n * MINHASH_BANDS) + blobs
        return pa.table(
            {
                "doc_id": pa.array(doc_col, pa.int64()),
                "band": pa.array(band_col, pa.int32()),
                "band_key": pa.array(key_col, pa.int64()),
                "shset": pa.array(blob_col, pa.binary()),
            }
        )


def q_minhash_lsh(sf_dir: str, hot_cap: int = HOT_SHINGLE_CAP):
    """LSH candidate pairs (same band signature in any band), verified with
    exact shingle Jaccard — all stages distributed, ONE pass over the
    corpus: the banding stage also emits each doc's shingle-set blob; the
    materialized stage output splits into bands and sets, candidate pairs
    deduplicate with the bucketed-combine pattern (see q_jaccard_pairs),
    and two equi-joins attach both sets for the exact per-pair verify.
    SQL-oracle-exact: the permutation constants are splitmix64-derived
    (``minhash_perms``) and the DuckDB oracle replicates signatures, band
    keys (FNV fold), the hot-bucket cap and the jaccard verify
    term-for-term — including numpy's uint64 wraparound in a·x+b."""
    tune_shuffle_admission()

    media = read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        MinHashStage, batch_format="pyarrow", concurrency=pool(), num_cpus=1
    ).materialize()
    bands = media.filter(expr="band >= 0").drop_columns(["shset"])
    sets = media.filter(expr="band == -1").select_columns(["doc_id", "shset"])

    def lsh_pairs_bucket(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        # segment-vectorized candidate generation (one UDF call per hash
        # bucket, not per LSH band-bucket — band-buckets ≈ docs × bands):
        # rows sorted by (band, band_key, doc_id); within-segment pairs
        # for every band-bucket at once via segment_pairs
        docs = tbl["doc_id"].to_numpy()
        a_idx, b_idx, hot_sizes = segment_pairs(starts, tbl.num_rows, hot_cap)
        a, b = docs[a_idx], docs[b_idx]
        out = pa.table(
            {
                "bucket": pa.array(pair_buckets(a, b), pa.int32()),
                "doc_a": pa.array(a, pa.int64()),
                "doc_b": pa.array(b, pa.int64()),
            }
        )
        if hot_sizes.size:
            # reported drop (see HOT_SHINGLE_CAP): markers to bucket=-1,
            # logged in dedupe; exact set via lsh_dropped_buckets()
            out = pa.concat_tables([
                out,
                pa.table(
                    {
                        "bucket": pa.array(
                            np.full(hot_sizes.size, -1, np.int32), pa.int32()
                        ),
                        "doc_a": pa.array(
                            np.full(hot_sizes.size, -1, np.int64), pa.int64()
                        ),
                        "doc_b": pa.array(hot_sizes, pa.int64()),
                    }
                ),
            ])
        return out

    def dedupe(group: pa.Table) -> pa.Table:
        if int(group["bucket"][0].as_py()) == -1:  # hot-bucket markers
            sizes = group["doc_b"].to_numpy()
            _LOG.warning(
                "minhash_lsh: dropped %d hot LSH buckets over the %d-doc "
                "cap (largest held %d docs); exact set via "
                "lsh_dropped_buckets()",
                len(group), hot_cap, int(sizes.max()),
            )
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64())})
        a = group["doc_a"].to_numpy()
        b = group["doc_b"].to_numpy()
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        first = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        return pa.table(
            {
                "doc_a": pa.array(a[first], pa.int64()),
                "doc_b": pa.array(b[first], pa.int64()),
            }
        )

    # _scrub: a sort-groupby whose partitions hold no groups emits
    # schema-less empty blocks too (tiny corpora), which the join rejects
    cand = _scrub(
        segmented_group_map(
            bands,
            ["band", "band_key"],
            lsh_pairs_bucket,
            num_partitions=shuffle_partitions(sf_dir),
            sort_keys=[
                ("band", "ascending"),
                ("band_key", "ascending"),
                ("doc_id", "ascending"),
            ],
        )
        .groupby("bucket")
        .map_groups(dedupe, batch_format="pyarrow")
    ).materialize()  # compact candidate set; also guards the empty case
    if cand.count() == 0:
        # no candidates at all (e.g. every bucket capped or singleton):
        # the verify joins would crash on schema-less empty inputs
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})

    half = cand.join(
        sets, join_type="inner", num_partitions=JOIN_PARTITIONS,
        on=("doc_a",), right_on=("doc_id",),
    ).rename_columns({"shset": "shset_a"})
    # _scrub again: join partitions that matched nothing emit schema-less
    # empty blocks (same Ray 2.49 quirk as aggregate), which the SECOND
    # join rejects when the candidate set is sparse
    joined = _scrub(half).join(
        sets, join_type="inner", num_partitions=JOIN_PARTITIONS,
        on=("doc_b",), right_on=("doc_id",),
    ).rename_columns({"shset": "shset_b"})

    def verify(batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_numpy()
        b = batch["doc_b"].to_numpy()
        sa = batch["shset_a"].to_pylist()
        sb = batch["shset_b"].to_pylist()
        jac = np.zeros(a.size, dtype=np.float64)
        for i in range(a.size):
            ha = np.frombuffer(sa[i], dtype=np.uint64)
            hb = np.frombuffer(sb[i], dtype=np.uint64)
            inter = ha[np.isin(ha, hb, assume_unique=True)].size
            union = ha.size + hb.size - inter
            jac[i] = (inter / union) if union else 0.0
        order = np.lexsort((b, a))
        return pa.table(
            {
                "doc_a": pa.array(a[order], pa.int64()),
                "doc_b": pa.array(b[order], pa.int64()),
                "jaccard": pa.array(round6(jac[order]), pa.float64()),
            }
        )

    return joined.map_batches(verify, batch_format="pyarrow")


def lsh_dropped_buckets(sf_dir: str, hot_cap: int = HOT_SHINGLE_CAP):
    """(band, band_key, n_docs) for every LSH band bucket the hot cap drops
    from q_minhash_lsh — the no-silent-caps report (diagnostic pass; output
    is the handful of degenerate buckets, e.g. the empty-shingle-set key)."""
    from ray.data.aggregate import Count

    from .common import shuffle_partitions

    bands = (
        read_documents(sf_dir, columns=["doc_id", "text"])
        .map_batches(MinHashStage, batch_format="pyarrow",
                     concurrency=pool(), num_cpus=1)
        .filter(expr="band >= 0")
        .select_columns(["band", "band_key"])
        .groupby(["band", "band_key"],
                 num_partitions=shuffle_partitions(sf_dir))
        .aggregate(Count(alias_name="n_docs"))
    )

    def keep_hot(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(t["n_docs"].to_numpy() > hot_cap))

    return bands.map_batches(keep_hot, batch_format="pyarrow")


# -- SimHash -----------------------------------------------------------------

def q_simhash(sf_dir: str):
    """64-bit SimHash per doc over word unigram FNV hashes (weighted by tf),
    batched: one FNV pass over every word in the batch, per-(doc, distinct
    word) tf from the dedup kernel, bit accumulation via np.add.at.
    SQL-oracle-checked (the oracle folds the same FNV-1a with list_reduce)."""

    def sim(batch: pa.Table) -> pa.Table:
        toks, _ = tokens_per_row(batch)
        n_rows = len(toks)
        rows, hs = word_hash_stream(toks)
        r, v, tf = distinct_per_row(rows, hs)
        acc = np.zeros((n_rows, 64), dtype=np.int64)
        if r.size:
            bits = (
                (v[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)
            ).astype(bool)
            contrib = np.where(bits, tf[:, None], -tf[:, None])
            np.add.at(acc, r, contrib)
        fp = (
            (acc > 0).astype(np.uint64)
            << np.arange(64, dtype=np.uint64)[None, :]
        ).sum(axis=1) & np.uint64((1 << 63) - 1)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "simhash": pa.array(fp.astype(np.int64), pa.int64()),
            }
        )

    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        sim, batch_format="pyarrow"
    )


# -- duplicated-span coverage (ExactSubstr-style) ----------------------------

DUP_SPAN_K = 6


def q_dup_spans(sf_dir: str, k: int = DUP_SPAN_K):
    """Cross-document duplicated-span coverage report — the ExactSubstr
    dedup signal of Lee et al. 2021 ("Deduplicating Training Data Makes
    Language Models Better"), approximated at the k-word-gram level: a
    k-gram occurring in ≥2 distinct documents marks every one of its
    occurrences, and per doc we report how many gram starts are duplicated
    plus how many token positions the UNION of their k-wide spans covers.

    ONE corpus read, TWO shuffles, zero joins, zero driver state:

    1. per-batch gram explode — sequence-ordered FNV-1a k-gram hashes with
       0-based start positions. One extra STATS row per doc rides the same
       stream (key = doc_id, n_tokens packed as ``pos = -1 - n_tokens``)
       so doc lengths reach the final rollup without a join;
    2. ``groupby(gram)``: a group whose pos≥0 rows span ≥2 distinct docs
       re-emits those occurrence rows; stats rows (pos<0) always pass, so
       a hash collision between a doc_id key and a real gram hash cannot
       corrupt either side;
    3. ``groupby(doc_id)``: vectorized interval union of the duplicated
       spans → covered token count + 6dp fraction.

    The gram shuffle ships 24 bytes per occurrence (hash, doc, pos). At
    100 TB the plan holds unchanged: a boilerplate gram shared by millions
    of docs re-emits its occurrence list linearly — per-doc rollup, not
    pairwise — so no hot cap is needed (contrast q_jaccard_pairs)."""
    from .common import shuffle_partitions

    nparts = shuffle_partitions(sf_dir)

    def explode(batch: pa.Table) -> pa.Table:
        toks, counts = tokens_per_row(batch)
        ids = batch["doc_id"].to_numpy()
        rows, hs = shingle_stream(toks, k)
        if rows.size:
            run_start = np.flatnonzero(np.r_[True, rows[1:] != rows[:-1]])
            run_len = np.diff(np.r_[run_start, rows.size])
            pos = np.arange(rows.size, dtype=np.int64) - np.repeat(
                run_start, run_len
            )
            gram = hs.view(np.int64)
            doc = ids[rows]
        else:
            pos = np.empty(0, np.int64)
            gram = np.empty(0, np.int64)
            doc = np.empty(0, np.int64)
        return pa.table(
            {
                "gram": pa.array(np.concatenate([gram, ids]), pa.int64()),
                "doc_id": pa.array(np.concatenate([doc, ids]), pa.int64()),
                "pos": pa.array(
                    np.concatenate([pos, -1 - counts]), pa.int64()
                ),
            }
        )

    def keep_dup_bucket(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        # rows sorted by (gram, doc_id, pos); a gram segment keeps its
        # occurrence rows iff they span >= 2 distinct docs. Segment kernel
        # (one UDF call per hash bucket — distinct grams ≈ corpus tokens):
        # "first occurrence row of its (gram, doc)" marks count one doc
        n = tbl.num_rows
        pos = tbl["pos"].to_numpy()
        doc = tbl["doc_id"].to_numpy()
        occ = pos >= 0
        counts = np.diff(np.r_[starts, n])
        seg_id = np.repeat(np.arange(starts.size), counts)
        prev_diff = np.ones(n, dtype=bool)
        prev_diff[1:] = (
            (seg_id[1:] != seg_id[:-1])
            | (doc[1:] != doc[:-1])
            | ~occ[:-1]
        )
        first_occ = occ & prev_diff
        n_docs = np.add.reduceat(first_occ.astype(np.int64), starts)
        dup_row = np.repeat(n_docs >= 2, counts)
        keep = ~occ | dup_row
        return pa.table(
            {
                "doc_id": pa.array(doc[keep], pa.int64()),
                "pos": pa.array(pos[keep], pa.int64()),
            }
        )

    def coverage_bucket(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        # rows sorted by (doc_id, pos): each doc's sentinel (pos = -1-len)
        # leads, duplicated-gram starts follow ascending — covered tokens =
        # sum(min(gap, k)) + k, all as reduceat segments
        n = tbl.num_rows
        pos = tbl["pos"].to_numpy()
        counts = np.diff(np.r_[starts, n])
        occ = pos >= 0
        n_occ = np.add.reduceat(occ.astype(np.int64), starts)
        seg_id = np.repeat(np.arange(starts.size), counts)
        valid = occ[:-1] & occ[1:] & (seg_id[:-1] == seg_id[1:])
        contrib = np.where(valid, np.minimum(pos[1:] - pos[:-1], k), 0)
        cov_gap = np.add.reduceat(np.r_[contrib, 0], starts)
        covered = cov_gap + k * (n_occ > 0)
        n_tokens = (-1 - pos[starts]).astype(np.int64)
        frac = round6(covered / np.maximum(n_tokens, 1))
        return pa.table(
            {
                "doc_id": tbl["doc_id"].take(pa.array(starts)),
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "n_grams": pa.array(
                    np.maximum(n_tokens - k + 1, 0), pa.int64()
                ),
                "n_dup_grams": pa.array(n_occ, pa.int64()),
                "covered_tokens": pa.array(covered, pa.int64()),
                "dup_fraction": pa.array(frac, pa.float64()),
            }
        )

    return segmented_group_map(
        segmented_group_map(
            read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
                explode, batch_format="pyarrow"
            ),
            "gram",
            keep_dup_bucket,
            num_partitions=nparts,
            sort_keys=[
                ("gram", "ascending"),
                ("doc_id", "ascending"),
                ("pos", "ascending"),
            ],
        ),
        "doc_id",
        coverage_bucket,
        num_partitions=nparts,
        sort_keys=[("doc_id", "ascending"), ("pos", "ascending")],
    )


# -- connected components over the near-dup graph (dup clusters) -------------

# Edge threshold: a jaccard_pairs edge with 6dp-rounded Jaccard >= tau is a
# near-duplicate link; clusters are the transitive closure (the RefinedWeb /
# SlimPajama "keep one doc per cluster" assignment step).
CC_TAU = 0.5
# Alternating large-star/small-star converges in O(log^2 n) rounds (Kiveris
# et al. 2014, "Connected Components in MapReduce and Beyond"); 40 rounds
# covers any graph a 64-bit id space can hold. Hitting the cap is a bug.
CC_MAX_ROUNDS = 40


def _canon_edges(a: np.ndarray, b: np.ndarray) -> pa.Table:
    """(min, max) edge table, self-loops dropped."""
    keep = a != b
    a, b = a[keep], b[keep]
    return pa.table(
        {
            "edge_a": pa.array(np.minimum(a, b), pa.int64()),
            "edge_b": pa.array(np.maximum(a, b), pa.int64()),
        }
    )


def _dedup_edges(ds, nparts: int):
    """Distinct canonical edges via the bucketed-groupby pattern (same
    rationale as the q_jaccard_pairs pair combine: N buckets instead of one
    Ray aggregate group per edge)."""

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket",
            pa.array(
                pair_buckets(t["edge_a"].to_numpy(), t["edge_b"].to_numpy()),
                pa.int32(),
            ),
        )

    def uniq(group: pa.Table) -> pa.Table:
        a = group["edge_a"].to_numpy()
        b = group["edge_b"].to_numpy()
        keep = a != b  # self-loops carry no connectivity
        a, b = a[keep], b[keep]
        if a.size == 0:
            return pa.table(
                {
                    "edge_a": pa.array([], pa.int64()),
                    "edge_b": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        first = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        return pa.table(
            {
                "edge_a": pa.array(a[first], pa.int64()),
                "edge_b": pa.array(b[first], pa.int64()),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket", num_partitions=nparts)
        .map_groups(uniq, batch_format="pyarrow")
    )


def _large_star(edges, nparts: int):
    """Large-star: every node connects its STRICTLY LARGER neighbours to the
    minimum of its closed neighbourhood. Runs over the symmetrized edge
    list — one node-bucketed shuffle, segment-vectorized (nodes ≈ docs in
    a dup-heavy graph; one UDF call per hash bucket, not per node)."""

    def sym(t: pa.Table) -> pa.Table:
        a = t["edge_a"].to_numpy()
        b = t["edge_b"].to_numpy()
        return pa.table(
            {
                "u": pa.array(np.concatenate([a, b]), pa.int64()),
                "v": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    def star_bucket(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        # rows sorted by (u, v): v[starts] is each node's min neighbour
        n = tbl.num_rows
        u = tbl["u"].to_numpy()
        v = tbl["v"].to_numpy()
        counts = np.diff(np.r_[starts, n])
        m_seg = np.minimum(v[starts], u[starts])
        m_row = np.repeat(m_seg, counts)
        keep = v > u
        return _canon_edges(m_row[keep], v[keep])

    return segmented_group_map(
        edges.map_batches(sym, batch_format="pyarrow"),
        "u",
        star_bucket,
        num_partitions=nparts,
        sort_keys=[("u", "ascending"), ("v", "ascending")],
    )


def _small_star(edges, nparts: int):
    """Small-star: every node connects its smaller neighbours (and itself)
    to the minimum of that set. Canonical edges already point larger ->
    smaller, so the key is edge_b — one bucketed shuffle, no symmetrize,
    segment-vectorized like ``_large_star``."""

    def star_bucket(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        # rows sorted by (edge_b, edge_a): per segment, distinct edge_a
        # ascending; min = edge_a[start]; members = other distinct edge_a
        # plus the node itself
        n = tbl.num_rows
        a = tbl["edge_a"].to_numpy()
        b = tbl["edge_b"].to_numpy()
        counts = np.diff(np.r_[starts, n])
        seg_id = np.repeat(np.arange(starts.size), counts)
        fo = np.ones(n, dtype=bool)
        fo[1:] = (seg_id[1:] != seg_id[:-1]) | (a[1:] != a[:-1])
        m_seg = a[starts]
        is_start = np.zeros(n, dtype=bool)
        is_start[starts] = True
        keep = fo & ~is_start  # distinct smaller neighbours, minus the min
        mem_a = np.concatenate([m_seg[seg_id[keep]], m_seg])
        mem_b = np.concatenate([a[keep], b[starts]])
        return _canon_edges(mem_a, mem_b)

    return segmented_group_map(
        edges,
        "edge_b",
        star_bucket,
        num_partitions=nparts,
        sort_keys=[("edge_b", "ascending"), ("edge_a", "ascending")],
    )


def _edge_sig(edges) -> tuple[int, int]:
    """(count, order-independent xor-hash) of an edge Dataset — the per-round
    convergence check. The per-block partials are one row each; only those
    partials reach the driver."""

    def part(t: pa.Table) -> pa.Table:
        a = t["edge_a"].to_numpy().astype(np.uint64)
        b = t["edge_b"].to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (a * np.uint64(0x9E3779B97F4A7C15)) ^ (
                b * np.uint64(0xC2B2AE3D27D4EB4F)
            )
            h ^= h >> np.uint64(33)
        x = int(np.bitwise_xor.reduce(h)) if h.size else 0
        return pa.table(
            {
                "n": pa.array([t.num_rows], pa.int64()),
                "h": pa.array([x], pa.uint64()),
            }
        )

    n, h = 0, 0
    for row in edges.map_batches(part, batch_format="pyarrow").take_all():
        n += int(row["n"])
        h ^= int(row["h"])
    return n, h


def connected_components(edges, nparts: int | None = None,
                         max_rounds: int = CC_MAX_ROUNDS):
    """Distributed connected components over an (edge_a, edge_b) int64
    Dataset: alternating large-star / small-star rounds (Kiveris et al.
    2014) until the edge set reaches a fixpoint, at which every component
    is a star centred on its minimum node id.

    Returns a (node, label) Dataset covering every node incident to an
    edge; a node may appear in several rows (hub self-labels once per
    block) — callers finish with a per-node min, which q_dup_clusters does
    with a bucketed groupby.

    Only the EDGE SET is materialized between rounds (it must be: each
    round's input feeds two different consumers, the star shuffle and the
    convergence signature). Edges are near-dup pairs — orders of magnitude
    smaller than the corpus — and each round's shuffle moves 16-byte rows,
    so the loop holds at 100 TB corpus scale where the corpus itself never
    re-enters the iteration.

    ``nparts=None`` sizes the per-round shuffles from the EDGE data (16
    bytes/row), not the corpus: a near-dup edge set is kilobytes at bench
    scale and every extra hash partition costs a standing aggregator actor
    per round (see shuffle_partitions); at 100 TB the same rule scales the
    partition count with the actual edge bytes."""
    import ray

    edges = edges.materialize()
    n_raw = edges.count()
    if nparts is None:
        cpus = (
            int(ray.cluster_resources().get("CPU", 4))
            if ray.is_initialized()
            else 4
        )
        from .common import _SHUFFLE_PARTITION_BYTES

        nparts = int(
            max(2, min(n_raw * 16 // _SHUFFLE_PARTITION_BYTES + 1, 4 * cpus))
        )
    edges = _dedup_edges(edges, nparts).materialize()
    sig = _edge_sig(edges)
    if sig[0] == 0:
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "label": pa.array([], pa.int64()),
                }
            )
        )
    for _ in range(max_rounds):
        edges = _dedup_edges(
            _small_star(_large_star(edges, nparts), nparts), nparts
        ).materialize()
        new_sig = _edge_sig(edges)
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )

    def labels(t: pa.Table) -> pa.Table:
        a = t["edge_a"].to_numpy()
        b = t["edge_b"].to_numpy()
        return pa.table(
            {
                "node": pa.array(np.concatenate([b, a]), pa.int64()),
                "label": pa.array(np.concatenate([a, a]), pa.int64()),
            }
        )

    return edges.map_batches(labels, batch_format="pyarrow")


CC_DRIVER_EDGE_CAP = 2_000_000  # ≈32 MB of edge rows — bounded driver pull


def _driver_components(edges) -> "rd.Dataset":
    """Exact union-find over a BOUNDED edge set (min-id root convention so
    labels equal the distributed loop's star centres). Returns the same
    (node, label) shape as connected_components."""
    import ray.data as rd

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    for block in edges.iter_batches(batch_format="pyarrow"):
        for a, b in zip(block["edge_a"].to_numpy(), block["edge_b"].to_numpy()):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
    all_nodes = set(parent)
    for block in edges.iter_batches(batch_format="pyarrow"):
        all_nodes.update(int(x) for x in block["edge_a"].to_pylist())
        all_nodes.update(int(x) for x in block["edge_b"].to_pylist())
    nodes = sorted(all_nodes)
    labels = [find(n) for n in nodes]
    return rd.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "label": pa.array(labels, pa.int64()),
            }
        )
    )


def q_dup_clusters(sf_dir: str, tau: float = CC_TAU):
    """Near-duplicate CLUSTER assignment: every document labelled with the
    minimum doc_id of its connected component in the jaccard-pair graph
    (edges: 6dp Jaccard >= tau). The transitive-closure step that turns
    pairwise near-dup evidence into "keep one per cluster" — RefinedWeb /
    SlimPajama-style dedup. SQL-oracle-checked (DuckDB recursive CTE over
    the same pair graph).

    Pipeline: q_jaccard_pairs (one corpus read, two shuffles) -> threshold
    filter -> alternating-star connected components over the EDGE SET only
    -> union with per-doc self-labels -> bucketed per-doc min. Singleton
    docs appear with cluster_id = doc_id."""
    from .common import shuffle_partitions

    nparts = shuffle_partitions(sf_dir)

    def thresh(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        hit = t.filter(pc.greater_equal(t["jaccard"], pa.scalar(float(tau))))
        return pa.table(
            {"edge_a": hit["doc_a"], "edge_b": hit["doc_b"]}
        )

    edges = q_jaccard_pairs(sf_dir).map_batches(
        thresh, batch_format="pyarrow"
    ).materialize()
    # Same bounded-pull pattern as index/build.py's dup-winner resolution:
    # below CC_DRIVER_EDGE_CAP the edge set is pulled once (≤ cap × 16 B)
    # and solved with union-find — the multi-round distributed loop costs
    # several Ray jobs per round, pure fixed cost at small edge counts.
    # Above the cap (a 100 TB crawl has billions of near-dup edges) the
    # alternating-star loop runs; both paths are exact and the equality is
    # regression-tested (tests/test_dup_clusters.py).
    if edges.count() <= CC_DRIVER_EDGE_CAP:
        members = _driver_components(edges)
    else:
        # edge-sized shuffle partitions inside the CC loop (nparts=None);
        # the final per-doc label reduce below is corpus-sized (`nparts`)
        members = connected_components(edges, nparts=None)

    def self_label(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks() if isinstance(
            t["doc_id"], pa.ChunkedArray
        ) else t["doc_id"]
        return pa.table({"node": ids, "label": ids})

    everyone = members.union(
        read_documents(sf_dir, columns=["doc_id"]).map_batches(
            self_label, batch_format="pyarrow"
        )
    )

    def tag(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy()
        return t.append_column(
            "bucket", pa.array((node % nparts).astype(np.int32), pa.int32())
        )

    def min_label(group: pa.Table) -> pa.Table:
        node = group["node"].to_numpy()
        lab = group["label"].to_numpy()
        order = np.lexsort((lab, node))
        node, lab = node[order], lab[order]
        first = np.r_[True, node[1:] != node[:-1]]
        return pa.table(
            {
                "doc_id": pa.array(node[first], pa.int64()),
                "cluster_id": pa.array(lab[first], pa.int64()),
            }
        )

    return (
        everyone.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket", num_partitions=nparts)
        .map_groups(min_label, batch_format="pyarrow")
    )


QUERIES = {
    "exact_dedup": q_exact_dedup,
    "jaccard_pairs": q_jaccard_pairs,
    "minhash_lsh": q_minhash_lsh,
    "simhash": q_simhash,
    "dup_spans": q_dup_spans,
    "dup_clusters": q_dup_clusters,
}

_FNV_WORD = sql_fnv1a("w")

# Shared CTE chain producing the jaccard pair table (jp) — used verbatim by
# the jaccard_pairs oracle and, under WITH RECURSIVE, by dup_clusters.
_JACCARD_CTES = f"""toks AS (SELECT doc_id, {SQL_TOKENS} AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
  FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS u(i)
),
sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
jp AS (
  SELECT p.doc_a, p.doc_b, p.inter,
         round(p.inter::DOUBLE / (sa.nsh + sb.nsh - p.inter), 6) AS jaccard
  FROM pairs p
  JOIN sizes sa ON sa.doc_id = p.doc_a
  JOIN sizes sb ON sb.doc_id = p.doc_b
)"""

# MinHash/LSH replica: shingle FNV (trailing-space form, as shingle_stream
# hashes "w1 w2 w3 "), splitmix64-derived permutation constants
# (minhash_perms), signature = min over shingles of ((a*x mod 2^64) + b
# mod 2^64) mod M — numpy uint64 WRAPS on the multiply, so the replica
# wraps too — band key = 64-bit FNV fold of the band's 8 signature values
# masked to 63 bits, candidates = same (band, key) pairs in buckets at or
# under the hot cap, verified with exact set jaccard at 6dp.
_FNV_SHINGLE_SP = sql_fnv1a("t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' '")
_M61 = (1 << 61) - 1
_P64 = 1 << 64

_SQL_MINHASH_LSH = f"""
WITH toks AS (SELECT doc_id, {SQL_TOKENS} AS t FROM documents),
shv AS (
  SELECT DISTINCT doc_id, {_FNV_SHINGLE_SP} AS hv
  FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS u(i)
),
perms AS (
  SELECT p,
         ({sql_mix64('(2*p+1)::UBIGINT')} % {_M61 - 1}) + 1 AS a,
         {sql_mix64('(2*p+2)::UBIGINT')} % {_M61} AS b
  FROM range(0, {MINHASH_PERMS}) t(p)
),
sigs AS (
  SELECT s.doc_id, pm.p,
         min((((pm.a::UHUGEINT * (s.hv % {_M61})::UHUGEINT) % {_P64}
               + pm.b::UHUGEINT) % {_P64}) % {_M61})::BIGINT AS sig
  FROM shv s, perms pm
  GROUP BY s.doc_id, pm.p
),
sigfull AS (
  SELECT d.doc_id, pm.p,
         coalesce(sg.sig, 9223372036854775807) AS sig
  FROM documents d
  CROSS JOIN perms pm
  LEFT JOIN sigs sg ON sg.doc_id = d.doc_id AND sg.p = pm.p
),
bkeys AS (
  SELECT doc_id, (p // {MINHASH_PERMS // MINHASH_BANDS})::INTEGER AS band,
         (list_reduce(
            list_prepend(14695981039346656037::UBIGINT,
              list_transform(list(sig ORDER BY p % {MINHASH_PERMS // MINHASH_BANDS}),
                             __mhv -> __mhv::UBIGINT)),
            (__mha, __mhb) -> ((xor(__mha::UBIGINT, __mhb)::HUGEINT
                                * 1099511628211) % {_P64})::UBIGINT)
          % {1 << 63})::BIGINT AS band_key
  FROM sigfull
  GROUP BY doc_id, p // {MINHASH_PERMS // MINHASH_BANDS}
),
bsize AS (SELECT band, band_key, count(*) AS n FROM bkeys
          GROUP BY band, band_key),
cand AS (
  SELECT DISTINCT k1.doc_id AS doc_a, k2.doc_id AS doc_b
  FROM bkeys k1
  JOIN bkeys k2 ON k1.band = k2.band AND k1.band_key = k2.band_key
                AND k1.doc_id < k2.doc_id
  JOIN bsize bs ON bs.band = k1.band AND bs.band_key = k1.band_key
  WHERE bs.n <= {HOT_SHINGLE_CAP}
),
sizes AS (SELECT doc_id, count(*) AS nsh FROM shv GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS i
  FROM cand c
  JOIN shv a ON a.doc_id = c.doc_a
  JOIN shv b ON b.doc_id = c.doc_b AND b.hv = a.hv
  GROUP BY c.doc_a, c.doc_b
)
SELECT c.doc_a, c.doc_b,
       coalesce(round(coalesce(i.i, 0)::DOUBLE /
                      NULLIF(coalesce(sa.nsh, 0) + coalesce(sb.nsh, 0)
                             - coalesce(i.i, 0), 0), 6), 0.0) AS jaccard
FROM cand c
LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
LEFT JOIN sizes sa ON sa.doc_id = c.doc_a
LEFT JOIN sizes sb ON sb.doc_id = c.doc_b
"""

ORACLE_SQL = {
    "minhash_lsh": _SQL_MINHASH_LSH,
    "exact_dedup": """
SELECT doc_id, md5(text) AS text_md5,
       min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_doc_id
FROM documents""",
    "jaccard_pairs": f"""
WITH {_JACCARD_CTES}
SELECT doc_a, doc_b, inter, jaccard FROM jp""",
    # dup_clusters: transitive closure of the tau-thresholded pair graph.
    # The recursive member propagates every reachable label to each doc
    # (UNION dedups, so it terminates); min(label) per doc is the component
    # minimum — exactly the alternating-star fixpoint the engine computes.
    "dup_clusters": f"""
WITH RECURSIVE {_JACCARD_CTES},
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM jp WHERE jaccard >= {CC_TAU}
  UNION SELECT doc_b, doc_a FROM jp WHERE jaccard >= {CC_TAU}
),
lab(doc, lab) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.b, l.lab FROM lab l JOIN edges e ON e.a = l.doc
)
SELECT doc AS doc_id, min(lab) AS cluster_id FROM lab GROUP BY doc""",
    # SimHash replicated in SQL: FNV-1a per distinct word (list_reduce over
    # ord() bytes), tf-weighted bit votes, bit-majority fingerprint with the
    # sign bit masked off (bits 0..62 only, matching the engine's
    # & ((1<<63)-1)).
    "simhash": f"""
WITH toks AS (SELECT doc_id, {SQL_TOKENS} AS t FROM documents),
words AS (
  SELECT doc_id, w, count(*) AS tf
  FROM toks, UNNEST(t) AS u(w)
  GROUP BY doc_id, w
),
hashed AS (
  SELECT doc_id, {_FNV_WORD} AS h, tf FROM words
),
votes AS (
  SELECT doc_id, j,
         sum(CASE WHEN (h >> j) & 1 = 1 THEN tf ELSE -tf END) AS acc
  FROM hashed, UNNEST(range(0, 63)) AS bits(j)
  GROUP BY doc_id, j
),
fps AS (
  SELECT doc_id,
         sum(CASE WHEN acc > 0 THEN (1::HUGEINT << j::INT) ELSE 0 END)::BIGINT
           AS simhash
  FROM votes GROUP BY doc_id
)
SELECT d.doc_id, coalesce(f.simhash, 0)::BIGINT AS simhash
FROM documents d LEFT JOIN fps f ON f.doc_id = d.doc_id""",
    # dup_spans replicated on gram STRINGS (the engine groups 64-bit FNV
    # hashes — collision-free at testable scale, same argument as
    # jaccard_pairs). Interval union via the sorted-starts gap trick:
    # each duplicated start contributes min(next_start - start, K) covered
    # tokens, the last contributes K.
    "dup_spans": f"""
WITH toks AS (SELECT doc_id, {SQL_TOKENS} AS t FROM documents),
stats AS (SELECT doc_id, len(t) AS n_tokens,
                 greatest(len(t) - {DUP_SPAN_K - 1}, 0) AS n_grams
          FROM toks),
grams AS (
  SELECT doc_id, i AS pos,
         t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
         t[i+3] || ' ' || t[i+4] || ' ' || t[i+5] AS g
  FROM toks, UNNEST(generate_series(1, len(t) - {DUP_SPAN_K - 1})) AS u(i)
),
dupg AS (SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) > 1),
dup AS (SELECT doc_id, pos FROM grams JOIN dupg USING (g)),
iv AS (
  SELECT doc_id,
         least(coalesce(lead(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                          - pos, {DUP_SPAN_K}), {DUP_SPAN_K}) AS contrib
  FROM dup
),
cov AS (SELECT doc_id, count(*) AS n_dup_grams, sum(contrib) AS covered
        FROM iv GROUP BY doc_id)
SELECT s.doc_id, s.n_tokens, s.n_grams,
       coalesce(c.n_dup_grams, 0)::BIGINT AS n_dup_grams,
       coalesce(c.covered, 0)::BIGINT AS covered_tokens,
       round(coalesce(c.covered, 0)::DOUBLE / greatest(s.n_tokens, 1), 6)
         AS dup_fraction
FROM stats s LEFT JOIN cov c USING (doc_id)""",
}
