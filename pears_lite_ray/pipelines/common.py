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


def tune_shuffle_admission() -> None:
    """Shrink the CPU admission reservation of hash-shuffle/join/aggregate
    aggregator ACTORS (Ray Data reserves up to ``min(1, CPUs/2/partitions)``
    per partition, default). Several standing hash operators in one pipeline
    (two joins + an aggregate) reserve more CPUs than a small cluster has
    and the pipeline deadlocks — observed hanging at 4 CPUs with
    num_partitions=8. The reservation only gates actor admission (each
    aggregator is max_concurrency=1 regardless), so a small value trades
    nothing at sandbox scale; at cluster scale partitions — not
    reservations — bound shuffle parallelism."""
    from ray.data.context import DataContext

    ctx = DataContext.get_current()
    ctx.join_operator_actor_num_cpus_per_partition_override = 0.05
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.05
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.05


_SHUFFLE_PARTITION_BYTES = 64 << 20  # one partition per 64 MiB of input


def shuffle_partitions(sf_dir: str | None = None, floor: int = 8) -> int:
    """Data-sized ``num_partitions`` for corpus-keyed hash shuffles
    (groupby-aggregates, joins): one partition per 64 MiB of the documents
    table, clamped to [floor, 4 × cluster CPUs].

    Ray 2.49's default is ``default_hash_shuffle_parallelism = 200``
    partitions served by up to 64 standing aggregator ACTORS — several
    seconds of actor spawn per pipeline for shuffles that move kilobytes
    at bench scale. Partition counts must follow DATA SIZE, not defaults
    (same rule as index/build.py _meta_blocks)."""
    import ray

    by_size = 0
    if sf_dir is not None:
        try:
            by_size = os.path.getsize(documents_path(sf_dir)) // _SHUFFLE_PARTITION_BYTES
        except OSError:
            by_size = 0
    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return int(max(floor, min(by_size, 4 * cpus)))


def pool(n_pools: int = 1) -> tuple[int, int]:
    """Actor-pool (min, max) that can never starve task operators: min 1,
    max = (cluster CPUs - 2 reserved for read/write tasks) / n_pools."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return (1, max(1, (cpus - 2) // n_pools))


def documents_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "documents.parquet")


def cache_tag(sf_dir: str) -> str:
    """Cache key for /tmp artifacts derived from sf_dir's documents table:
    path + (size, mtime_ns) fingerprint, so a regenerated-in-place
    documents.parquet invalidates every derived index/CSV/half-corpus
    cache instead of silently serving stale results (same contract as
    state/export.py's manifest fingerprint)."""
    p = documents_path(sf_dir)
    try:
        st = os.stat(p)
        fp = f"{st.st_size}-{st.st_mtime_ns}"
    except OSError:
        fp = "nofile"
    return hashlib.md5(f"{os.path.abspath(sf_dir)}|{fp}".encode()).hexdigest()[:12]


def embeddings_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "embeddings.parquet")


def strip_schema_metadata(batch: pa.Table) -> pa.Table:
    """Drop schema-level metadata (e.g. the b'pandas' blob the testdata
    parquet carries): pyarrow 16 schemas WITH metadata are unhashable, and
    every Ray sort-reduce concat over such blocks logs "Failed to hash the
    schemas" — the spam that drowned round-1's bench logs."""
    return batch.replace_schema_metadata(None)


# (shard, n_shards) applied inside read_documents while set — lets the
# resumable exporter (state/export.py) restrict PER-DOC pipelines to a
# doc_id hash slice at the read, without touching pipeline signatures.
_DOC_SHARD: tuple[int, int] | None = None


class doc_shard:
    """Context manager: ``with doc_shard(i, n): fn(sf_dir)`` builds the
    pipeline over the ``doc_id % n == i`` slice. The filter fuses into the
    read tasks, so shard compute (tokenize/hash/score — the expensive
    part) is proportional to the slice; the scan itself is not pruned
    (hash shards touch every row group by construction)."""

    def __init__(self, shard: int, n_shards: int):
        self.val = (shard, n_shards)

    def __enter__(self):
        global _DOC_SHARD
        self._prev = _DOC_SHARD
        _DOC_SHARD = self.val

    def __exit__(self, *exc):
        global _DOC_SHARD
        _DOC_SHARD = self._prev


def read_documents(sf_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    ds = rd.read_parquet(documents_path(sf_dir), columns=columns).map_batches(
        strip_schema_metadata, batch_format="pyarrow"
    )
    if _DOC_SHARD is not None:
        shard, n = _DOC_SHARD

        def keep_shard(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy()
            return t.filter(pa.array(ids % n == shard))

        # vectorized batch filter (Ray's expr filter can't parse modulo);
        # fuses with the read tasks like any map stage
        ds = ds.map_batches(keep_shard, batch_format="pyarrow")
    return ds


def read_embeddings(sf_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(embeddings_path(sf_dir), columns=columns).map_batches(
        strip_schema_metadata, batch_format="pyarrow"
    )


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


# -- vectorized FNV-1a ------------------------------------------------------
# One batched kernel replaces the per-byte Python loops that fed the
# jaccard/minhash/simhash/fingerprint pipelines: all strings of a batch are
# laid into one uint8 buffer and hashed column-wise (iterations = max string
# length, each a numpy op over every string at once).

FNV_BASIS = np.uint64(0xCBF29CE484222325)
FNV_PRIME = np.uint64(0x100000001B3)


def fnv1a_slices(buf: np.ndarray, starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """FNV-1a of ``buf[starts[i] : starts[i]+lengths[i]]`` for every i,
    vectorized column-wise (uint64 wrap-around multiply)."""
    h = np.full(starts.size, FNV_BASIS, dtype=np.uint64)
    if starts.size == 0:
        return h
    maxlen = int(lengths.max()) if lengths.size else 0
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            m = lengths > j
            b = buf[starts[m] + j].astype(np.uint64)
            h[m] = (h[m] ^ b) * FNV_PRIME
    return h


def shingle_stream(
    toks: list[list[str]], n: int
) -> tuple[np.ndarray, np.ndarray]:
    """Sequence-ordered FNV-1a hashes of ``n``-word shingles for every row
    of a batch → (row_idx int64, hashes uint64).

    Hash input per shingle is ``w_i + ' ' + ... + w_{i+n-1} + ' '`` (every
    word followed by one space), byte-identical to hashing each word then a
    0x20 separator.
    """
    chunks: list[bytes] = []
    starts_l: list[np.ndarray] = []
    lens_l: list[np.ndarray] = []
    rows_l: list[np.ndarray] = []
    base = 0
    for r, words in enumerate(toks):
        k = len(words)
        if k >= n:
            joined = (" ".join(words) + " ").encode()
            chunks.append(joined)
            off = np.zeros(k + 1, dtype=np.int64)
            np.cumsum(
                np.fromiter((len(w) + 1 for w in words), dtype=np.int64, count=k),
                out=off[1:],
            )
            s = base + off[: k - n + 1]
            starts_l.append(s)
            lens_l.append(off[n:] - off[: k - n + 1])
            rows_l.append(np.full(k - n + 1, r, dtype=np.int64))
            base += len(joined)
    if not chunks:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    buf = np.frombuffer(b"".join(chunks), dtype=np.uint8)
    starts = np.concatenate(starts_l)
    lengths = np.concatenate(lens_l)
    rows = np.concatenate(rows_l)
    return rows, fnv1a_slices(buf, starts, lengths)


def distinct_per_row(
    rows: np.ndarray, values: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Deduplicate (row, value) pairs → (row_idx, distinct values sorted
    within row, multiplicity of each kept pair). Vectorized across the batch."""
    if rows.size == 0:
        return rows, values, np.empty(0, np.int64)
    order = np.lexsort((values, rows))
    r, v = rows[order], values[order]
    first = np.ones(r.size, dtype=bool)
    first[1:] = (r[1:] != r[:-1]) | (v[1:] != v[:-1])
    idx = np.nonzero(first)[0]
    counts = np.diff(np.r_[idx, r.size])
    return r[first], v[first], counts


def word_hash_stream(toks: list[list[str]]) -> tuple[np.ndarray, np.ndarray]:
    """FNV-1a hash of every word (no separator byte) for every row of a
    batch → (row_idx int64, hashes uint64)."""
    chunks: list[bytes] = []
    lens_l: list[np.ndarray] = []
    rows_l: list[np.ndarray] = []
    for r, words in enumerate(toks):
        if not words:
            continue
        chunks.append("".join(words).encode())
        lens_l.append(
            np.fromiter((len(w) for w in words), dtype=np.int64, count=len(words))
        )
        rows_l.append(np.full(len(words), r, dtype=np.int64))
    if not chunks:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    buf = np.frombuffer(b"".join(chunks), dtype=np.uint8)
    lengths = np.concatenate(lens_l)
    starts = np.r_[0, np.cumsum(lengths)[:-1]]
    rows = np.concatenate(rows_l)
    return rows, fnv1a_slices(buf, starts, lengths)


# DuckDB replica of fnv1a over a string's bytes (used by the simhash /
# fingerprint oracles): fold FNV-1a with list_reduce over ord() bytes,
# 64-bit wrap via HUGEINT multiply mod 2^64.
def sql_fnv1a(expr: str) -> str:
    # lambda vars deliberately obscure: DuckDB resolves plain names like
    # ``i`` against outer query columns first, silently breaking the hash
    return (
        "list_reduce(list_prepend(14695981039346656037::UBIGINT, "
        f"list_transform(range(1, length({expr})+1), "
        f"__fnvi -> ord(substr({expr}, __fnvi, 1))::UBIGINT)), "
        "(__fnva, __fnvb) -> ((xor(__fnva::UBIGINT, __fnvb)::HUGEINT "
        "* 1099511628211) % 18446744073709551616)::UBIGINT)"
    )


# splitmix64's finalizer mixer (Steele et al. 2014): avalanche for hashes
# whose top bits are biased (FNV of short similar strings), and the
# SQL-replicable way to derive pseudo-random constants (MinHash permutation
# params) — replica parity is property-tested in tests/test_property.py.
MIX_C1 = np.uint64(0xBF58476D1CE4E5B9)
MIX_C2 = np.uint64(0x94D049BB133111EB)


def mix64(h: np.ndarray) -> np.ndarray:
    h = h.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        h ^= h >> np.uint64(30)
        h *= MIX_C1
        h ^= h >> np.uint64(27)
        h *= MIX_C2
        h ^= h >> np.uint64(31)
    return h


def sql_mix64(expr: str) -> str:
    m = "18446744073709551616::UHUGEINT"
    x1 = f"xor({expr}, ({expr}) >> 30)"
    x2 = f"((({x1})::UHUGEINT * {int(MIX_C1)}::UHUGEINT) % {m})::UBIGINT"
    x3 = f"xor({x2}, ({x2}) >> 27)"
    x4 = f"((({x3})::UHUGEINT * {int(MIX_C2)}::UHUGEINT) % {m})::UBIGINT"
    return f"xor({x4}, ({x4}) >> 31)"


# -- segment-vectorized grouped map ----------------------------------------
# Ray's groupby(k).map_groups(fn) slices the sorted block and calls fn once
# PER GROUP (ray/data/grouped_data.py::_apply_udf_to_groups) — fine for a
# handful of big groups, ruinous for corpus-keyed groupbys where nearly
# every url/hash/doc forms its own 1-row group: the per-group Python call +
# slice + output concat dominates, and at web scale "N groups" is billions.
# segmented_group_map keeps the exact same semantics and the same single
# hash shuffle, but co-locates rows by a BUCKET of the key (vectorized FNV /
# splitmix hash mod n_buckets) and calls the UDF once per bucket, handing it
# the bucket's rows sorted by key plus the segment starts — so the per-group
# work happens across every group of the bucket at once via segment kernels
# (np.minimum.reduceat, np.repeat, rank = arange - repeat(starts)).


def string_fnv(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Vectorized FNV-1a per value of an Arrow string column (zero-copy
    buffer walk; null-free group keys assumed)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = col.cast(pa.large_utf8())
    off = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    buf = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return fnv1a_slices(buf, off[:-1], np.diff(off))


def key_hash(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Stable uint64 hash per key value: FNV-1a for strings, splitmix64
    mix for integers — equal keys always hash equal, in every worker
    process."""
    typ = col.type
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        return string_fnv(col)
    vals = (
        col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    ).to_numpy(zero_copy_only=False)
    return mix64(vals.astype(np.uint64))


def key_buckets(col: pa.ChunkedArray | pa.Array, n_buckets: int) -> np.ndarray:
    """Stable bucket id per key value (``key_hash`` mod n_buckets)."""
    return (key_hash(col) % np.uint64(n_buckets)).astype(np.int64)


def segmented_group_map(
    ds: rd.Dataset,
    key: str | list[str],
    fn,
    *,
    num_partitions: int,
    sort_keys: list[tuple[str, str]] | None = None,
    buckets_per_partition: int = 4,
) -> rd.Dataset:
    """``groupby(key).map_groups(per_group_fn)`` semantics with one UDF call
    per hash bucket instead of one per group.

    ``key`` may be one column or a composite list. ``fn(table, starts)``
    receives a bucket's rows sorted by ``sort_keys`` (default: the key
    columns ascending — extra keys order rows WITHIN a group, e.g.
    ``[(key, "ascending"), ("doc_id", "ascending")]`` for a per-group
    rank) and ``starts``, the row index of each group's first row. It
    returns the bucket's output table; per-group work must be expressed
    as segment kernels over ``starts`` (reduceat / repeat / arange).
    """
    keys = [key] if isinstance(key, str) else list(key)
    n_buckets = max(1, num_partitions * buckets_per_partition)

    def bucketize(batch: pa.Table) -> pa.Table:
        h = key_hash(batch[keys[0]])
        for k in keys[1:]:
            # mix after combining so composite keys avalanche
            h = mix64(h ^ key_hash(batch[k]))
        return batch.append_column(
            "_bucket",
            pa.array((h % np.uint64(n_buckets)).astype(np.int64), pa.int64()),
        )

    def per_bucket(tbl: pa.Table) -> pa.Table:
        tbl = tbl.drop_columns(["_bucket"])
        import pyarrow.compute as pc

        order = pc.sort_indices(
            tbl, sort_keys=sort_keys or [(k, "ascending") for k in keys]
        )
        tbl = tbl.take(order)
        n = tbl.num_rows
        if n == 0:
            starts = np.empty(0, dtype=np.int64)
        else:
            neq = np.zeros(n - 1, dtype=bool)
            for k in keys:
                kc = tbl[k].combine_chunks()
                neq |= pc.not_equal(kc.slice(1), kc.slice(0, n - 1)).to_numpy(
                    zero_copy_only=False
                )
            starts = np.r_[0, np.nonzero(neq)[0] + 1]
        return fn(tbl, starts)

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bucket", num_partitions=num_partitions)
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def segment_pairs(
    starts: np.ndarray, n: int, cap: int | None = None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All within-segment row-index pairs (i < j), vectorized across every
    segment at once → (a_idx, b_idx, capped_segment_sizes).

    Row at in-segment rank k of an m-row segment opens m-1-k pairs with
    the rows after it; repeat/cumsum arithmetic enumerates them without a
    per-segment loop. Segments larger than ``cap`` contribute NO pairs and
    are returned in ``capped_segment_sizes`` for explicit drop reporting.
    """
    counts = np.diff(np.r_[starts, n])
    m_r = np.repeat(counts, counts)
    k_r = np.arange(n) - np.repeat(starts, counts)
    c_r = m_r - 1 - k_r
    if cap is not None:
        c_r[m_r > cap] = 0
        capped = counts[counts > cap]
    else:
        capped = np.empty(0, dtype=np.int64)
    total = int(c_r.sum())
    a_idx = np.repeat(np.arange(n), c_r)
    base = np.repeat(np.cumsum(c_r) - c_r, c_r)
    b_idx = a_idx + 1 + (np.arange(total) - base)
    return a_idx, b_idx, capped


def segment_broadcast_min(values: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Per-segment min of ``values`` broadcast back to every row."""
    if values.size == 0:
        return values
    counts = np.diff(np.r_[starts, values.size])
    return np.repeat(np.minimum.reduceat(values, starts), counts)


def segment_rank(n: int, starts: np.ndarray) -> np.ndarray:
    """1-based rank of each row within its segment (rows already sorted)."""
    if n == 0:
        return np.empty(0, dtype=np.int64)
    counts = np.diff(np.r_[starts, n])
    return np.arange(1, n + 1, dtype=np.int64) - np.repeat(starts, counts)


def round6(x: np.ndarray) -> np.ndarray:
    """Round half AWAY from zero at 6dp — DuckDB's round() semantics.

    numpy's np.round is half-to-even; ratios of integers with power-of-two
    denominators land exactly on the .5 boundary of the 7th digit (e.g.
    1/128 = 0.0078125) and the two conventions then disagree.
    """
    x = np.asarray(x, dtype=np.float64)
    return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6
