"""Sketching / corpus-weighting operators for the training-data set.

* hll_distinct   — HyperLogLog distinct-token estimate per source
                   (Flajolet et al. 2007): the canonical MERGEABLE sketch —
                   per-batch register partials (max rank per register),
                   elementwise-max merge in a tiny ``groupby(source)``.
                   The estimator is evaluated with exact-integer register
                   sums so the oracle SQL reproduces it bit-for-bit
                   (DuckDB ``ln`` == libm ``log`` on this host, verified).
* dsir_weights   — DSIR-style importance weights (Xie et al. 2023):
                   hashed-unigram bucket counts for the raw corpus vs a
                   target slice (lang='en') in ONE corpus pass, smoothed
                   log-ratio per bucket quantized to integer micro-units
                   (order-free exact sums), broadcast via ``ray.put``,
                   then a second vectorized pass scores every document.
* tfidf_keywords — per-doc top-3 TF-IDF keyword extraction. Fully
                   distributed: tf rows from a batch combiner, df from a
                   ``groupby(term)`` over the SAME tf rows (no second
                   corpus read), an equi-join on term (no driver-side
                   vocabulary broadcast — raw-token vocabularies at
                   100 TB exceed broadcast budgets), and a per-doc top-k
                   ``map_groups``.
* cms_ngrams     — Count-Min sketch over corpus bigrams: fixed 4×1024
                   counter partials merged by sum, top-20 exact counts
                   reported next to the (always ≥) sketch estimates.
* bloom_decontaminate — benchmark decontamination through an 8 KB Bloom
                   bitset broadcast instead of the exact n-gram set,
                   exact flags emitted alongside so false positives are
                   observable data.

The reference has no sketching layer (its "stats" are exact SQLite
counts, app/api/models.py); these are the scale-path analogs a 100 TB
corpus needs. All three are SQL-oracle-checked.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .common import (
    SQL_TOKENS,
    read_documents,
    round6,
    segment_rank,
    segmented_group_map,
    shuffle_partitions,
    sql_fnv1a,
    tokens_per_row,
    word_hash_stream,
)

# ---------------------------------------------------------------- HLL ----

HLL_P = 8                      # 2^8 = 256 registers
HLL_M = 1 << HLL_P
_MASK56 = np.uint64((1 << 56) - 1)
_POW2 = (np.uint64(1) << np.arange(57, dtype=np.uint64)).astype(np.uint64)

# FNV-1a of short similar strings leaves the TOP bits heavily biased
# (measured: 3000 distinct words land in 35 of 256 registers); HLL needs
# avalanche in both the register index and the rank bits, so finalize with
# splitmix64's mixer — shared kernel + SQL replica live in common.py
# (the MinHash permutation constants derive from the same mixer).
from .common import mix64 as _mix64  # noqa: E402
from .common import sql_mix64 as _sql_mix64  # noqa: E402


def _hll_ranks(hashes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rank) per 64-bit hash: top 8 bits pick the
    register, rank = leading zeros of the remaining 56 bits + 1 (57 when
    they are all zero). Exact-integer bit-length via searchsorted over
    powers of two — no float log2 edge cases."""
    hashes = _mix64(hashes)
    j = (hashes >> np.uint64(56)).astype(np.int64)
    w = hashes & _MASK56
    bitlen = np.searchsorted(_POW2, w, side="right")
    return j, (57 - bitlen).astype(np.int64)


def _hll_estimate(regs: np.ndarray) -> float:
    """Raw estimator + linear-counting small-range correction, with the
    harmonic sum kept as an exact integer (sum of powers of two) so the
    SQL replica matches bit-for-bit."""
    v = int((regs == 0).sum())
    s_int = sum(1 << (57 - int(r)) for r in regs)  # r=0 contributes 2^57
    raw = 0.7213 / (1 + 1.079 / HLL_M) * (HLL_M * HLL_M) * 2.0**57 / float(s_int)
    if raw <= 2.5 * HLL_M and v > 0:
        return HLL_M * math.log(HLL_M / v)
    return raw


def q_hll_distinct(sf_dir: str):
    """Distinct-token count per source via HyperLogLog registers.

    Scale shape: each batch contributes at most 256 (source, register,
    rank) rows regardless of batch size — the shuffle moves O(sources ×
    256) rows total, never tokens. ``ranksum``/``n_registers_set`` are
    integer register checksums so the oracle verifies the sketch state
    itself, not only the estimate."""

    def partial(batch: pa.Table) -> pa.Table:
        toks, _ = tokens_per_row(batch)
        rows, hashes = word_hash_stream(toks)
        src = batch["source"].to_pylist()
        j, rank = _hll_ranks(hashes)
        per_src: dict[str, np.ndarray] = {}
        src_of_row = np.array([src[r] for r in rows]) if rows.size else np.array([])
        for s in set(src):
            regs = per_src.setdefault(s, np.zeros(HLL_M, dtype=np.int64))
            sel = src_of_row == s
            if sel.any():
                np.maximum.at(regs, j[sel], rank[sel])
        out_s, out_j, out_r = [], [], []
        for s, regs in sorted(per_src.items()):
            nz = np.nonzero(regs)[0]
            out_s.extend([s] * nz.size)
            out_j.extend(nz.tolist())
            out_r.extend(regs[nz].tolist())
        return pa.table(
            {
                "source": pa.array(out_s, pa.string()),
                "j": pa.array(out_j, pa.int64()),
                "r": pa.array(out_r, pa.int64()),
            }
        )

    def finalize(group: pa.Table) -> pa.Table:
        regs = np.zeros(HLL_M, dtype=np.int64)
        np.maximum.at(regs, group["j"].to_numpy(), group["r"].to_numpy())
        est = _hll_estimate(regs)
        return pa.table(
            {
                "source": pa.array([group["source"][0].as_py()], pa.string()),
                "n_registers_set": pa.array([int((regs > 0).sum())], pa.int64()),
                "ranksum": pa.array([int(regs.sum())], pa.int64()),
                "hll_distinct": pa.array(round6(np.array([est])), pa.float64()),
            }
        )

    # the partial rows are tiny; collapse the read's 64 micro-blocks to a
    # data-sized partition count before the sort-shuffle (measured: the
    # 64-block sort barrier costs 4 s at 35k rows, the merge <0.1 s)
    return (
        read_documents(sf_dir, columns=["text", "source"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(shuffle_partitions(sf_dir))
        .groupby("source")
        .map_groups(finalize, batch_format="pyarrow")
    )


# ---------------------------------------------------------- Count-Min ----

CMS_DEPTH = 4
CMS_WIDTH = 1024
CMS_TOPN = 20
# per-row salts (arbitrary odd constants, shared with the SQL replica)
CMS_SALTS = (0x243F6A8885A308D3, 0x13198A2E03707344,
             0xA4093822299F31D0, 0x082EFA98EC4E6C89)


def _cms_cols(base: np.ndarray) -> np.ndarray:
    """(depth, n) column indices: mix64(fnv ^ salt_r) % width per row."""
    out = np.empty((CMS_DEPTH, base.size), dtype=np.int64)
    for r, salt in enumerate(CMS_SALTS):
        out[r] = (_mix64(base ^ np.uint64(salt)) % np.uint64(CMS_WIDTH)).astype(
            np.int64
        )
    return out


def q_cms_ngrams(sf_dir: str):
    """Count-Min sketch (Cormode & Muthukrishnan 2005) over corpus bigrams,
    evaluated against exact counts for the top-20 bigrams: emits
    (bigram, true_n, cms_n) where cms_n = min over depth rows of the
    hashed counter — always ≥ true_n, equal absent collisions.

    Scale shape: the sketch partial is ≤ depth×width rows per batch no
    matter the batch size, the merged sketch is a FIXED 4×1024 counter
    table (the mergeable-counter analog of hll_distinct's registers), and
    only that bounded table plus the top-N exact rows reach the driver.
    The exact side is a standard combiner → groupby count. SQL-oracle-
    checked — both the counters and the min-lookup replicate exactly."""

    def bigram_stream(batch: pa.Table) -> list[str]:
        toks, _ = tokens_per_row(batch)
        grams: list[str] = []
        for words in toks:
            grams.extend(
                f"{words[i]} {words[i + 1]}" for i in range(len(words) - 1)
            )
        return grams

    from .common import fnv1a_slices

    def gram_hashes(grams: list[str]) -> np.ndarray:
        if not grams:
            return np.empty(0, dtype=np.uint64)
        buf = np.frombuffer("".join(grams).encode(), dtype=np.uint8)
        lens = np.fromiter((len(g.encode()) for g in grams), dtype=np.int64,
                           count=len(grams))
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        return fnv1a_slices(buf, starts, lens)

    def cms_partial(batch: pa.Table) -> pa.Table:
        grams = bigram_stream(batch)
        counters = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
        if grams:
            cols = _cms_cols(gram_hashes(grams))
            for r in range(CMS_DEPTH):
                np.add.at(counters[r], cols[r], 1)
        rr, cc = np.nonzero(counters)
        return pa.table(
            {
                "r": pa.array(rr.astype(np.int64), pa.int64()),
                "c": pa.array(cc.astype(np.int64), pa.int64()),
                "n": pa.array(counters[rr, cc], pa.int64()),
            }
        )

    def cms_reduce(group: pa.Table) -> pa.Table:
        return pa.table(
            {
                "r": pa.array([group["r"][0].as_py()], pa.int64()),
                "c": pa.array([group["c"][0].as_py()], pa.int64()),
                "n": pa.array([int(group["n"].to_numpy().sum())], pa.int64()),
            }
        )

    def exact_partial(batch: pa.Table) -> pa.Table:
        grams = bigram_stream(batch)
        if not grams:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        uniq, cnt = np.unique(np.array(grams, dtype=object), return_counts=True)
        return pa.table(
            {
                "bigram": pa.array(uniq.tolist(), pa.string()),
                "n": pa.array(cnt, pa.int64()),
            }
        )

    def exact_reduce(group: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bigram": pa.array([group["bigram"][0].as_py()], pa.string()),
                "n": pa.array([int(group["n"].to_numpy().sum())], pa.int64()),
            }
        )

    docs = read_documents(sf_dir, columns=["text"])
    sketch_rows = (
        docs.map_batches(cms_partial, batch_format="pyarrow")
        .repartition(shuffle_partitions(sf_dir))
        .groupby(["r", "c"])
        .map_groups(cms_reduce, batch_format="pyarrow")
        .take_all()
    )  # ≤ CMS_DEPTH × CMS_WIDTH rows by construction — bounded driver pull
    counters = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
    for row in sketch_rows:
        counters[row["r"], row["c"]] = row["n"]

    top = (
        read_documents(sf_dir, columns=["text"])
        .map_batches(exact_partial, batch_format="pyarrow")
        .repartition(shuffle_partitions(sf_dir))
        .groupby("bigram")
        .map_groups(exact_reduce, batch_format="pyarrow")
        .sort(["n", "bigram"], descending=[True, False])
        .limit(CMS_TOPN)
        .take_all()
    )
    grams = [row["bigram"] for row in top]
    true_n = [int(row["n"]) for row in top]
    cols = _cms_cols(gram_hashes(grams)) if grams else np.empty((CMS_DEPTH, 0))
    cms_n = [
        int(min(counters[r, cols[r, i]] for r in range(CMS_DEPTH)))
        for i in range(len(grams))
    ]
    return pa.table(
        {
            "bigram": pa.array(grams, pa.string()),
            "true_n": pa.array(true_n, pa.int64()),
            "cms_n": pa.array(cms_n, pa.int64()),
        }
    )


# -------------------------------------------------------------- Bloom ----

BLOOM_M = 1 << 16          # bits — an 8 KB broadcast object
BLOOM_K = 3
BLOOM_SALTS = (0x452821E638D01377, 0xBE5466CF34E90C6C, 0xC0AC29B7C97C50DD)
BLOOM_NGRAM = 5
BLOOM_BENCH_MOD = 97       # same held-out benchmark rows as `decontaminate`


def _bloom_positions(h: np.ndarray) -> np.ndarray:
    """(BLOOM_K, n) bit positions: mix64(h ^ salt_k) % M."""
    out = np.empty((BLOOM_K, h.size), dtype=np.int64)
    for k, salt in enumerate(BLOOM_SALTS):
        out[k] = (_mix64(h ^ np.uint64(salt)) % np.uint64(BLOOM_M)).astype(np.int64)
    return out


def q_bloom_decontaminate(sf_dir: str):
    """Benchmark decontamination through a Bloom filter: the broadcast
    object is a FIXED 8 KB bitset instead of the benchmark's full n-gram
    hash set — the variant that still broadcasts when the benchmark suite
    has billions of distinct n-grams. Emits both the Bloom flag and the
    exact flag so false positives are observable data, never silent:
    ``n_bloom_hits ≥ n_hits`` always, and every exactly-contaminated doc
    is Bloom-flagged (no false negatives, the Bloom guarantee).
    SQL-oracle-checked — bit positions replicate via the splitmix64
    replica, membership via a distinct-position anti-join-free count."""
    from .common import distinct_per_row, shingle_stream
    from .textstats import _bench_hash_set

    # bounded driver pull (DECONTAM_BENCH_HASH_CAP), same as decontaminate
    bench, _truncated = _bench_hash_set(sf_dir, BLOOM_BENCH_MOD, BLOOM_NGRAM)
    bits = np.zeros(BLOOM_M, dtype=bool)
    if bench.size:
        bits[_bloom_positions(bench.view(np.uint64)).ravel()] = True

    class BloomStage:
        def __init__(self, bits: np.ndarray, bench_sorted: np.ndarray):
            self.bits = bits
            self.bench = bench_sorted.view(np.uint64)

        def __call__(self, batch: pa.Table) -> pa.Table:
            toks, _ = tokens_per_row(batch)
            rows, hs = shingle_stream(toks, BLOOM_NGRAM)
            n_bloom = np.zeros(len(toks), dtype=np.int64)
            n_exact = np.zeros(len(toks), dtype=np.int64)
            if rows.size:
                r, v, _ = distinct_per_row(rows, hs)
                pos = _bloom_positions(v)
                hit = self.bits[pos].all(axis=0)
                np.add.at(n_bloom, r[hit], 1)
                np.add.at(n_exact, r[np.isin(v, self.bench)], 1)
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "n_bloom_hits": pa.array(n_bloom, pa.int64()),
                    "bloom_contaminated": pa.array(n_bloom > 0, pa.bool_()),
                    "n_hits": pa.array(n_exact, pa.int64()),
                    "contaminated": pa.array(n_exact > 0, pa.bool_()),
                }
            )

    from .common import pool

    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        BloomStage,
        fn_constructor_kwargs={"bits": bits, "bench_sorted": bench},
        batch_format="pyarrow",
        concurrency=pool(),
        num_cpus=1,
    )


# --------------------------------------------------------------- DSIR ----

DSIR_BUCKETS = 1024
DSIR_TARGET_LANG = "en"


def _dsir_lambda_micro(n_raw: np.ndarray, n_tgt: np.ndarray) -> np.ndarray:
    """Per-bucket importance log-ratio ln(p_target/p_raw) with add-one
    smoothing, quantized to integer micro-nats (round half away from zero,
    = DuckDB round(x*1e6, 0)) so per-doc sums are order-free exact."""
    r_tot = int(n_raw.sum())
    t_tot = int(n_tgt.sum())
    lam = np.array(
        [
            math.log(
                ((int(t) + 1) / (t_tot + DSIR_BUCKETS))
                / ((int(r) + 1) / (r_tot + DSIR_BUCKETS))
            )
            for r, t in zip(n_raw, n_tgt)
        ]
    )
    return np.rint(round6(lam) * 1e6).astype(np.int64)


def q_dsir_weights(sf_dir: str):
    """DSIR hashed-unigram importance weight per document, target domain =
    ``lang='en'`` documents of the same corpus.

    Pass 1 is one corpus read emitting ≤1024 (bucket, n_raw, n_tgt) rows
    per batch (the combiner bounds the shuffle by bucket count, not
    tokens); the reduced 1024-row table is pulled to the driver — bounded
    by construction — converted to integer micro-nat log-ratios and
    broadcast with ``ray.put``. Pass 2 re-reads the corpus and scores each
    document with an exact integer sum over its token buckets."""
    import ray

    bucket_rows = (
        read_documents(sf_dir, columns=["text", "lang"])
        .map_batches(_dsir_partial, batch_format="pyarrow")
        .repartition(shuffle_partitions(sf_dir))
        .groupby("b")
        .map_groups(_dsir_reduce, batch_format="pyarrow")
        .take_all()
    )  # ≤ DSIR_BUCKETS rows by construction — bounded driver pull
    n_raw = np.zeros(DSIR_BUCKETS, dtype=np.int64)
    n_tgt = np.zeros(DSIR_BUCKETS, dtype=np.int64)
    for row in bucket_rows:
        n_raw[row["b"]] = row["n_raw"]
        n_tgt[row["b"]] = row["n_tgt"]
    lam_ref = ray.put(_dsir_lambda_micro(n_raw, n_tgt))

    class Score:
        def __init__(self):
            self.lam = ray.get(lam_ref)  # once per actor/task slot

        def __call__(self, batch: pa.Table) -> pa.Table:
            toks, counts = tokens_per_row(batch)
            rows, hashes = word_hash_stream(toks)
            b = (hashes % np.uint64(DSIR_BUCKETS)).astype(np.int64)
            w = np.zeros(len(toks), dtype=np.int64)
            np.add.at(w, rows, self.lam[b])
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "n_tokens": pa.array(counts, pa.int64()),
                    "dsir_logw_u": pa.array(w, pa.int64()),
                    "dsir_logw": pa.array(
                        round6(w.astype(np.float64) / 1e6), pa.float64()
                    ),
                }
            )

    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        Score(), batch_format="pyarrow"
    )


def _dsir_partial(batch: pa.Table) -> pa.Table:
    toks, _ = tokens_per_row(batch)
    rows, hashes = word_hash_stream(toks)
    b = (hashes % np.uint64(DSIR_BUCKETS)).astype(np.int64)
    lang = batch["lang"].to_pylist()
    is_tgt = np.array([lang[r] == DSIR_TARGET_LANG for r in rows], dtype=bool) \
        if rows.size else np.zeros(0, dtype=bool)
    n_raw = np.bincount(b, minlength=DSIR_BUCKETS)
    n_tgt = np.bincount(b[is_tgt], minlength=DSIR_BUCKETS)
    nz = np.nonzero(n_raw)[0]
    return pa.table(
        {
            "b": pa.array(nz, pa.int64()),
            "n_raw": pa.array(n_raw[nz], pa.int64()),
            "n_tgt": pa.array(n_tgt[nz], pa.int64()),
        }
    )


def _dsir_reduce(group: pa.Table) -> pa.Table:
    return pa.table(
        {
            "b": pa.array([group["b"][0].as_py()], pa.int64()),
            "n_raw": pa.array([int(group["n_raw"].to_numpy().sum())], pa.int64()),
            "n_tgt": pa.array([int(group["n_tgt"].to_numpy().sum())], pa.int64()),
        }
    )


# ------------------------------------------------------------- TF-IDF ----

TFIDF_TOPK = 3


def q_tfidf_keywords(sf_dir: str):
    """Top-3 TF-IDF keywords per document (sklearn-style smoothed idf =
    ln((1+N)/(1+df)) + 1), tie-broken by term ascending on the 6dp score.

    Fully distributed: the (doc, term, tf) combiner output feeds BOTH the
    df aggregate and the score join (one corpus read, materialized once);
    df reaches tf rows through a term equi-join, NOT a driver-side
    vocabulary broadcast — a raw-token vocabulary at 100 TB is itself a
    large table. Final top-k is a per-doc segment kernel
    (``common.segmented_group_map`` — one UDF call per bucket, not per doc)."""
    n_parts = shuffle_partitions(sf_dir)

    def tf_rows(batch: pa.Table) -> pa.Table:
        toks, _ = tokens_per_row(batch)
        ids = batch["doc_id"].to_numpy()
        out_d, out_t, out_tf = [], [], []
        for i, words in enumerate(toks):
            if not words:
                continue
            uniq, cnt = np.unique(np.array(words, dtype=object), return_counts=True)
            out_d.extend([int(ids[i])] * uniq.size)
            out_t.extend(uniq.tolist())
            out_tf.extend(cnt.tolist())
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "term": pa.array(out_t, pa.string()),
                "tf": pa.array(out_tf, pa.int64()),
            }
        )

    import pyarrow.parquet as _pq

    from .common import documents_path

    # exact corpus count from parquet metadata — no extra count() job
    n_docs = _pq.ParquetFile(documents_path(sf_dir)).metadata.num_rows
    tf = (
        read_documents(sf_dir, columns=["doc_id", "text"])
        .map_batches(tf_rows, batch_format="pyarrow")
        .repartition(n_parts)
        .materialize()
    )

    def df_partial(batch: pa.Table) -> pa.Table:
        # tf rows are distinct (doc, term) pairs, so df = row count per term;
        # per-block partials bound the term shuffle by blocks × vocabulary
        uniq, cnt = np.unique(
            np.array(batch["term"].to_pylist(), dtype=object), return_counts=True
        )
        return pa.table(
            {
                "term": pa.array(uniq.tolist(), pa.string()),
                "df": pa.array(cnt, pa.int64()),
            }
        )

    def df_rename(t: pa.Table) -> pa.Table:
        return pa.table({"term": t["term"], "df": t["sum(df)"]})

    # built-in vectorized hash aggregate — no per-term UDF calls
    df = (
        tf.map_batches(df_partial, batch_format="pyarrow")
        .groupby("term", num_partitions=n_parts)
        .sum("df")
        .map_batches(df_rename, batch_format="pyarrow")
    )

    scored = tf.join(
        df.repartition(n_parts), join_type="inner", num_partitions=n_parts,
        on=("term",),
    )

    def score_batch(batch: pa.Table) -> pa.Table:
        tf_v = batch["tf"].to_numpy().astype(np.float64)
        df_v = batch["df"].to_numpy().astype(np.float64)
        idf = np.log((1.0 + n_docs) / (1.0 + df_v)) + 1.0
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "term": batch["term"],
                "tf": batch["tf"],
                "tfidf": pa.array(round6(tf_v * idf), pa.float64()),
            }
        )

    # per-doc top-k as a segment kernel: rows arrive sorted by
    # (doc_id, tfidf desc, term), so "rank within doc ≤ K" is a mask —
    # one UDF call per hash bucket, not one per document
    def topk_bucket(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        rank = segment_rank(tbl.num_rows, starts)
        mask = pa.array(rank <= TFIDF_TOPK)
        kept = tbl.filter(mask)
        return pa.table(
            {
                "doc_id": kept["doc_id"],
                "rank": pa.array(rank[rank <= TFIDF_TOPK], pa.int64()),
                "term": kept["term"],
                "tf": kept["tf"],
                "tfidf": kept["tfidf"],
            }
        )

    return segmented_group_map(
        scored.map_batches(score_batch, batch_format="pyarrow"),
        "doc_id",
        topk_bucket,
        num_partitions=n_parts,
        sort_keys=[
            ("doc_id", "ascending"),
            ("tfidf", "descending"),
            ("term", "ascending"),
        ],
    )


# ------------------------------------------------------------- oracles ---

_HLL_SQL = f"""
WITH toks AS (
  SELECT source, unnest({SQL_TOKENS}) AS tok FROM documents
),
h AS (SELECT DISTINCT source, tok FROM toks),
hh AS (SELECT source, {sql_fnv1a('tok')} AS hv FROM h),
mx AS (SELECT source, {_sql_mix64('hv')} AS mv FROM hh),
reg AS (
  SELECT source, (mv >> 56)::BIGINT AS j,
         CASE WHEN (mv & 72057594037927935::UBIGINT) = 0::UBIGINT THEN 57
              ELSE 57 - length(ltrim(bin((mv & 72057594037927935::UBIGINT)::BIGINT), '0'))
         END AS r
  FROM mx
),
regs AS (SELECT source, j, max(r) AS r FROM reg GROUP BY source, j),
agg AS (
  SELECT source,
         count(*)::BIGINT AS n_set,
         sum(r)::BIGINT AS ranksum,
         (256 - count(*))::BIGINT AS v,
         (sum((1::UBIGINT << (57 - r))::HUGEINT)
          + (256 - count(*))::HUGEINT * (1::UBIGINT << 57)::HUGEINT) AS s
  FROM regs GROUP BY source
)
SELECT source,
       n_set AS n_registers_set,
       ranksum,
       round(CASE WHEN raw <= 640 AND v > 0
                  THEN 256 * ln(256::DOUBLE / v)
                  ELSE raw END, 6) AS hll_distinct
FROM (
  SELECT *,
         0.7213::DOUBLE / (1 + 1.079::DOUBLE / 256) * 65536
           * power(2::DOUBLE, 57) / s::DOUBLE AS raw
  FROM agg
)"""

_DSIR_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang, unnest({SQL_TOKENS}) AS tok FROM documents
),
tb AS (
  SELECT doc_id, lang, ({sql_fnv1a('tok')} % 1024)::BIGINT AS b FROM toks
),
bc AS (
  SELECT b, count(*)::BIGINT AS n_raw,
         count(*) FILTER (lang = '{DSIR_TARGET_LANG}')::BIGINT AS n_tgt
  FROM tb GROUP BY b
),
tot AS (SELECT sum(n_raw)::BIGINT AS r_tot, sum(n_tgt)::BIGINT AS t_tot FROM bc),
lam AS (
  SELECT b,
         CAST(round(ln(((n_tgt + 1)::DOUBLE / (t_tot + 1024))
                       / ((n_raw + 1)::DOUBLE / (r_tot + 1024))) * 1000000, 0)
              AS BIGINT) AS lu
  FROM bc, tot
),
docw AS (
  SELECT tb.doc_id, count(*)::BIGINT AS n_tokens, sum(lam.lu)::BIGINT AS u
  FROM tb JOIN lam USING (b) GROUP BY tb.doc_id
)
SELECT d.doc_id,
       coalesce(w.n_tokens, 0)::BIGINT AS n_tokens,
       coalesce(w.u, 0)::BIGINT AS dsir_logw_u,
       round(coalesce(w.u, 0)::DOUBLE / 1000000, 6) AS dsir_logw
FROM documents d LEFT JOIN docw w ON w.doc_id = d.doc_id"""

_TFIDF_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({SQL_TOKENS}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         round(tf.tf * (ln((1 + n.n_docs)::DOUBLE / (1 + df.df)) + 1), 6) AS tfidf
  FROM tf JOIN df USING (term), n
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, rank::BIGINT AS rank, term, tf, tfidf
FROM ranked WHERE rank <= {TFIDF_TOPK}"""


_CMS_SALT_VALUES = ", ".join(
    f"({r}, {s}::UBIGINT)" for r, s in enumerate(CMS_SALTS)
)

_CMS_SQL = f"""
WITH toks AS (SELECT {SQL_TOKENS} AS t FROM documents),
bg AS (
  SELECT t[__bi] || ' ' || t[__bi + 1] AS bigram
  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(__bi)
),
bh AS (SELECT bigram, {sql_fnv1a('bigram')} AS hv FROM bg),
salts(r, salt) AS (VALUES {_CMS_SALT_VALUES}),
cells AS (
  SELECT s.r, ({_sql_mix64('xor(bh.hv, s.salt)')} % 1024)::BIGINT AS c
  FROM bh, salts s
),
counters AS (SELECT r, c, count(*)::BIGINT AS n FROM cells GROUP BY r, c),
exact AS (
  SELECT bigram, count(*)::BIGINT AS true_n
  FROM bg GROUP BY bigram
  ORDER BY true_n DESC, bigram ASC LIMIT {CMS_TOPN}
),
eh AS (SELECT bigram, true_n, {sql_fnv1a('bigram')} AS hv FROM exact),
lookup AS (
  SELECT e.bigram, e.true_n, min(ct.n) AS cms_n
  FROM eh e, salts s
  JOIN counters ct
    ON ct.r = s.r
   AND ct.c = ({_sql_mix64('xor(e.hv, s.salt)')} % 1024)::BIGINT
  GROUP BY e.bigram, e.true_n
)
SELECT bigram, true_n, cms_n::BIGINT AS cms_n FROM lookup"""


_BLOOM_GRAM = sql_fnv1a(
    "t[__gi] || ' ' || t[__gi+1] || ' ' || t[__gi+2] || ' ' || "
    "t[__gi+3] || ' ' || t[__gi+4] || ' '"
)

_BLOOM_SALT_VALUES = ", ".join(f"({s}::UBIGINT)" for s in BLOOM_SALTS)

_BLOOM_SQL = f"""
WITH toks AS (SELECT doc_id, {SQL_TOKENS} AS t FROM documents),
grams AS (
  SELECT doc_id, {_BLOOM_GRAM} AS h
  FROM toks, UNNEST(generate_series(1, len(t) - 4)) AS u(__gi)
),
dg AS (SELECT DISTINCT doc_id, h FROM grams),
bench AS (SELECT DISTINCT h FROM grams WHERE doc_id % {BLOOM_BENCH_MOD} = 0),
salts(salt) AS (VALUES {_BLOOM_SALT_VALUES}),
bpos AS (
  SELECT DISTINCT ({_sql_mix64('xor(bench.h, salts.salt)')}
                   % {BLOOM_M})::BIGINT AS p
  FROM bench, salts
),
probe AS (
  SELECT dg.doc_id, dg.h, count(bp.p) AS k_present
  FROM dg CROSS JOIN salts s
  LEFT JOIN bpos bp
    ON bp.p = ({_sql_mix64('xor(dg.h, s.salt)')} % {BLOOM_M})::BIGINT
  GROUP BY dg.doc_id, dg.h
),
agg AS (
  SELECT doc_id, count(*) FILTER (k_present = {BLOOM_K})::BIGINT AS n_bloom
  FROM probe GROUP BY doc_id
),
ex AS (
  SELECT doc_id, count(*)::BIGINT AS n_ex
  FROM dg WHERE h IN (SELECT h FROM bench) GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(a.n_bloom, 0)::BIGINT AS n_bloom_hits,
       coalesce(a.n_bloom, 0) > 0 AS bloom_contaminated,
       coalesce(e.n_ex, 0)::BIGINT AS n_hits,
       coalesce(e.n_ex, 0) > 0 AS contaminated
FROM documents d
LEFT JOIN agg a ON a.doc_id = d.doc_id
LEFT JOIN ex e ON e.doc_id = d.doc_id"""


QSK_BUCKET = 256   # event_id bucket width — deterministic sub-streams
QSK_S = 32         # order statistics kept per bucket (rank error ≤ n_b/S)


def q_quantile_sketch(sf_dir: str):
    """MERGEABLE approximate quantiles (p50/p90/p99 of ``value`` per
    event_type) for UNBOUNDED value domains — the sketch counterpart that
    ``events.q_value_quantiles`` names as the scale path when the
    distinct-value histogram trick stops fitting.

    Sub-streams are bucketed by ``event_id // QSK_BUCKET`` — a
    DETERMINISTIC key, so the sketch is identical at any parallelism
    (sampling per Ray block would drift with block boundaries). Each
    bucket keeps ``QSK_S`` segment-midpoint order statistics, each
    carrying its segment's EXACT INTEGER count, so merged cumulative
    weights are integer-exact — no float-sum order sensitivity. The
    per-type merge sorts the union by value and picks
    the smallest sample with cumweight ≥ ceil(p·N), the same discrete
    rule as the exact operator; total rank error ≤ Σ n_b/S ≈ N/QSK_S.
    SQL-oracle-exact (the sketch is deterministic end-to-end, so the
    replica reproduces the segment midpoints, integer weights and merge
    rule with window functions); pytest additionally asserts exactness in
    the small-bucket regime and the rank-error bound in the large."""
    import ray.data as rd

    from .common import shuffle_partitions
    from .events import events_path

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy()
        return pa.table(
            {
                "event_type": batch["event_type"],
                "bucket": pa.array(ids // QSK_BUCKET, pa.int64()),
                "value": batch["value"],
            }
        )

    def bucket_sketch(group: pa.Table) -> pa.Table:
        v = np.sort(group["value"].to_numpy())
        n = v.size
        if n <= QSK_S:
            samp, w = v, np.ones(n, dtype=np.int64)
        else:
            # segment-ALIGNED integer weights: sample i is the midpoint
            # order statistic of ranks [⌊in/S⌋, ⌊(i+1)n/S⌋) and carries
            # exactly that segment's count. (Assigning the n%S remainder
            # to the first samples instead skews the merged cumulative
            # mass low — measured 177-rank p50 error vs ~10 aligned.)
            lo = (np.arange(QSK_S) * n) // QSK_S
            hi = (np.arange(1, QSK_S + 1) * n) // QSK_S
            samp = v[(lo + hi) // 2]
            w = (hi - lo).astype(np.int64)
        s = samp.size
        return pa.table(
            {
                "event_type": pa.array(
                    [group["event_type"][0].as_py()] * s, pa.string()
                ),
                "value": pa.array(samp, pa.float64()),
                "weight": pa.array(w, pa.int64()),
            }
        )

    def finalize(group: pa.Table) -> pa.Table:
        v = group["value"].to_numpy()
        w = group["weight"].to_numpy()
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        cw = np.cumsum(w)
        n = int(cw[-1])
        qs = [v[np.searchsorted(cw, -(-(p * n) // 1), side="left")]
              for p in (0.5, 0.9, 0.99)]
        return pa.table(
            {
                "event_type": pa.array(
                    [group["event_type"][0].as_py()], pa.string()
                ),
                "n_events": pa.array([n], pa.int64()),
                "p50_est": pa.array([qs[0]], pa.float64()),
                "p90_est": pa.array([qs[1]], pa.float64()),
                "p99_est": pa.array([qs[2]], pa.float64()),
            }
        )

    return (
        rd.read_parquet(events_path(sf_dir),
                        columns=["event_id", "event_type", "value"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby(["event_type", "bucket"],
                 num_partitions=shuffle_partitions(sf_dir))
        .map_groups(bucket_sketch, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(finalize, batch_format="pyarrow")
    )


# quantile-sketch replica: the sketch is DETERMINISTIC (id-bucketed
# sub-streams, segment-midpoint order statistics with segment-exact
# integer weights), so the merge rule — smallest sample whose cumulative
# weight reaches ceil(p*N) — is expressible with window functions. The
# selected value only depends on value-level cumulative mass, so the
# arbitrary tie order inside the window sum cannot diverge from numpy's
# stable sort.
_QSK_SQL = f"""
WITH t AS (SELECT event_type, event_id // {QSK_BUCKET} AS bucket, value
           FROM events),
ranked AS (
  SELECT event_type, bucket, value,
         row_number() OVER (PARTITION BY event_type, bucket
                            ORDER BY value) - 1 AS r,
         count(*) OVER (PARTITION BY event_type, bucket) AS n
  FROM t),
big AS (SELECT DISTINCT event_type, bucket, n FROM ranked WHERE n > {QSK_S}),
segs AS (
  SELECT b.event_type, b.bucket,
         ((i.j * b.n) // {QSK_S} + ((i.j + 1) * b.n) // {QSK_S}) // 2 AS mid,
         ((i.j + 1) * b.n) // {QSK_S} - (i.j * b.n) // {QSK_S} AS w
  FROM big b, range(0, {QSK_S}) i(j)),
samples AS (
  SELECT event_type, value, 1::BIGINT AS weight
  FROM ranked WHERE n <= {QSK_S}
  UNION ALL
  SELECT r.event_type, r.value, s.w AS weight
  FROM segs s JOIN ranked r
    ON r.event_type = s.event_type AND r.bucket = s.bucket AND r.r = s.mid),
fin AS (
  SELECT event_type, value,
         sum(weight) OVER (PARTITION BY event_type ORDER BY value
                           ROWS UNBOUNDED PRECEDING) AS cw,
         sum(weight) OVER (PARTITION BY event_type) AS nn
  FROM samples)
SELECT event_type,
       max(nn)::BIGINT AS n_events,
       min(CASE WHEN cw >= ceil(0.5 * nn) THEN value END) AS p50_est,
       min(CASE WHEN cw >= ceil(0.9 * nn) THEN value END) AS p90_est,
       min(CASE WHEN cw >= ceil(0.99 * nn) THEN value END) AS p99_est
FROM fin GROUP BY event_type
"""

QUERIES = {
    "hll_distinct": q_hll_distinct,
    "cms_ngrams": q_cms_ngrams,
    "bloom_decontaminate": q_bloom_decontaminate,
    "dsir_weights": q_dsir_weights,
    "tfidf_keywords": q_tfidf_keywords,
    "quantile_sketch": q_quantile_sketch,
}

ORACLE_SQL = {
    "hll_distinct": _HLL_SQL,
    "cms_ngrams": _CMS_SQL,
    "bloom_decontaminate": _BLOOM_SQL,
    "dsir_weights": _DSIR_SQL,
    "tfidf_keywords": _TFIDF_SQL,
    "quantile_sketch": _QSK_SQL,
}
