"""Deduplication operators over the ``documents`` table.

Large-scale-training-pipeline staples, each in its scalable Ray Data shape:

* exact      — hash-partition on md5(text), per-group canonical winner
               (min doc_id). SQL-oracle-checked.
* shingles   — 3-word-shingle inverted index → co-occurring pairs →
               exact Jaccard per pair. SQL-oracle-checked (self-join on
               shingle). At 100 TB the same plan holds with a
               hot-shingle cap (a shingle shared by >P docs contributes
               O(P²) pairs; cap documented below).
* minhash    — 64-perm MinHash, banded LSH (8×8) candidate pairs,
               verified with exact Jaccard. Deterministic (fixed odd
               multipliers), rows-only check.
* simhash    — 64-bit SimHash fingerprint per doc (word unigrams).
               Deterministic, rows-only check.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data.aggregate import Min, Sum

from .common import md5_hex, pool, read_documents, round6, tokens_per_row

JACCARD_NGRAM = 3
MINHASH_PERMS = 64
MINHASH_BANDS = 8  # 8 rows per band
# At scale: a shingle shared by more than this many docs is dropped from
# pair generation (it only produces near-universal boilerplate pairs).
HOT_SHINGLE_CAP = 1000

_MERSENNE = np.uint64((1 << 61) - 1)


def _shingle_hashes(words: list[str], n: int = JACCARD_NGRAM) -> np.ndarray:
    """Distinct 64-bit FNV-1a hashes of n-word shingles (sorted)."""
    if len(words) < n:
        return np.empty(0, dtype=np.uint64)
    out = set()
    for i in range(len(words) - n + 1):
        h = np.uint64(0xCBF29CE484222325)
        for w in words[i:i + n]:
            for b in w.encode():
                h = np.uint64((int(h) ^ b) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
            h = np.uint64((int(h) ^ 0x20) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
        out.add(int(h))
    return np.array(sorted(out), dtype=np.uint64)


def _shingle_strings(words: list[str], n: int = JACCARD_NGRAM) -> list[str]:
    return sorted({" ".join(words[i:i + n]) for i in range(len(words) - n + 1)})


# -- exact dedup -------------------------------------------------------------

def q_exact_dedup(sf_dir: str):
    """Every doc mapped to the canonical (min doc_id) holder of its exact
    text (J3 semantics ↔ mk_page_vector.py:37, by content not url)."""

    def hash_batch(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "text_md5": pa.array([md5_hex(t) for t in texts], pa.string()),
            }
        )

    ds = read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        hash_batch, batch_format="pyarrow"
    )
    canon = ds.groupby("text_md5").aggregate(Min("doc_id", alias_name="canonical_doc_id"))
    # broadcast join: the canonical map has ≤ n_docs rows but dedup groups
    # are tiny; at driver-test scale read it back and map — at 100 TB this
    # becomes an equi-join on text_md5 (same key as the groupby: no second
    # shuffle needed).
    canon_tbl = canon.to_arrow_refs()
    import ray

    lut = {}
    for ref in canon_tbl:
        t = ray.get(ref)
        for h, c in zip(t["text_md5"].to_pylist(), t["canonical_doc_id"].to_pylist()):
            lut[h] = c

    def attach(batch: pa.Table) -> pa.Table:
        hs = batch["text_md5"].to_pylist()
        return batch.append_column(
            "canonical_doc_id", pa.array([lut[h] for h in hs], pa.int64())
        )

    return ds.map_batches(attach, batch_format="pyarrow")


# -- n-gram Jaccard ----------------------------------------------------------

def q_jaccard_pairs(sf_dir: str):
    """All doc pairs sharing ≥1 3-word shingle, with exact Jaccard over
    distinct-shingle sets. Pair generation via the shingle inverted index
    (groupby shingle → within-group pairs), intersection counts via a
    second small groupby — no cross join anywhere."""
    import ray

    def explode(batch: pa.Table) -> pa.Table:
        toks, _ = tokens_per_row(batch)
        ids = batch["doc_id"].to_pylist()
        out_s, out_d, sizes_id, sizes_n = [], [], [], []
        for d, words in zip(ids, toks):
            sh = _shingle_strings(words)
            out_s.extend(sh)
            out_d.extend([d] * len(sh))
            sizes_id.append(d)
            sizes_n.append(len(sh))
        return pa.table(
            {
                "shingle": pa.array(out_s, pa.string()),
                "doc_id": pa.array(out_d, pa.int64()),
            }
        )

    shingle_docs = read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        explode, batch_format="pyarrow"
    )

    def pairs_of_group(group: pa.Table) -> pa.Table:
        docs = np.unique(np.asarray(group["doc_id"].to_numpy(), dtype=np.int64))
        if docs.size < 2 or docs.size > HOT_SHINGLE_CAP:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        ia, ib = np.triu_indices(docs.size, k=1)
        return pa.table(
            {
                "doc_a": pa.array(docs[ia], pa.int64()),
                "doc_b": pa.array(docs[ib], pa.int64()),
                "c": pa.array(np.ones(ia.size, dtype=np.int64), pa.int64()),
            }
        )

    inter = (
        shingle_docs.groupby("shingle")
        .map_groups(pairs_of_group, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Sum("c", alias_name="inter"))
    )

    # per-doc set sizes: small table, broadcast into the final map
    def sizes(batch: pa.Table) -> pa.Table:
        toks, _ = tokens_per_row(batch)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "nsh": pa.array(
                    [len(_shingle_strings(w)) for w in toks], pa.int64()
                ),
            }
        )

    size_lut = {}
    for ref in read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        sizes, batch_format="pyarrow"
    ).to_arrow_refs():
        t = ray.get(ref)
        for d, n in zip(t["doc_id"].to_pylist(), t["nsh"].to_pylist()):
            size_lut[d] = n
    lut_ref = ray.put(size_lut)

    def jaccard(batch: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        a = batch["doc_a"].to_numpy()
        b = batch["doc_b"].to_numpy()
        inter_n = batch["inter"].to_numpy().astype(np.float64)
        sa = np.array([lut[int(x)] for x in a], dtype=np.float64)
        sb = np.array([lut[int(x)] for x in b], dtype=np.float64)
        jac = round6(inter_n / (sa + sb - inter_n))
        return pa.table(
            {
                "doc_a": batch["doc_a"],
                "doc_b": batch["doc_b"],
                "inter": batch["inter"],
                "jaccard": pa.array(jac, pa.float64()),
            }
        )

    return inter.map_batches(jaccard, batch_format="pyarrow")


# -- MinHash + LSH -----------------------------------------------------------

def _minhash_matrix(shingles: np.ndarray) -> np.ndarray:
    """64 min-hashes of a doc's shingle-hash set (universal hashing mod
    2^61-1 with fixed odd multipliers — deterministic everywhere)."""
    if shingles.size == 0:
        return np.full(MINHASH_PERMS, np.iinfo(np.int64).max, dtype=np.int64)
    rng = np.random.RandomState(1234)
    a = rng.randint(1, (1 << 61) - 1, size=MINHASH_PERMS).astype(np.uint64) | np.uint64(1)
    b = rng.randint(0, (1 << 61) - 1, size=MINHASH_PERMS).astype(np.uint64)
    x = shingles.astype(np.uint64) % _MERSENNE
    # (a*x + b) mod p, vectorized over (perm, shingle)
    prod = (a[:, None] * x[None, :] + b[:, None]) % _MERSENNE
    return prod.min(axis=1).astype(np.int64)


class MinHashStage:
    """Actor-pool stage: text → 64 minhashes + band keys (state = the fixed
    permutation coefficients, built once per actor)."""

    def __init__(self):
        rng = np.random.RandomState(1234)
        self.a = rng.randint(1, (1 << 61) - 1, size=MINHASH_PERMS).astype(np.uint64) | np.uint64(1)
        self.b = rng.randint(0, (1 << 61) - 1, size=MINHASH_PERMS).astype(np.uint64)

    def minhash(self, shingles: np.ndarray) -> np.ndarray:
        if shingles.size == 0:
            return np.full(MINHASH_PERMS, np.iinfo(np.int64).max, dtype=np.int64)
        x = shingles.astype(np.uint64) % _MERSENNE
        prod = (self.a[:, None] * x[None, :] + self.b[:, None]) % _MERSENNE
        return prod.min(axis=1).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks, _ = tokens_per_row(batch)
        ids = batch["doc_id"].to_pylist()
        import hashlib

        rows_doc, rows_band, rows_key = [], [], []
        rpb = MINHASH_PERMS // MINHASH_BANDS
        for d, words in zip(ids, toks):
            mh = self.minhash(_shingle_hashes(words))
            for band in range(MINHASH_BANDS):
                seg = np.ascontiguousarray(mh[band * rpb:(band + 1) * rpb])
                key = int.from_bytes(
                    hashlib.blake2b(seg.tobytes(), digest_size=8).digest(), "big"
                )
                rows_doc.append(d)
                rows_band.append(band)
                rows_key.append(key & ((1 << 63) - 1))
        return pa.table(
            {
                "doc_id": pa.array(rows_doc, pa.int64()),
                "band": pa.array(rows_band, pa.int32()),
                "band_key": pa.array(rows_key, pa.int64()),
            }
        )


def q_minhash_lsh(sf_dir: str):
    """LSH candidate pairs (same band signature in any band), verified with
    exact shingle Jaccard. Rows-only driver check (hash permutations are
    not SQL-expressible)."""
    import ray

    bands = read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        MinHashStage, batch_format="pyarrow", concurrency=pool(), num_cpus=1
    )

    def pairs_of_bucket(group: pa.Table) -> pa.Table:
        docs = np.unique(np.asarray(group["doc_id"].to_numpy(), dtype=np.int64))
        if docs.size < 2 or docs.size > HOT_SHINGLE_CAP:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64())})
        ia, ib = np.triu_indices(docs.size, k=1)
        return pa.table(
            {
                "doc_a": pa.array(docs[ia], pa.int64()),
                "doc_b": pa.array(docs[ib], pa.int64()),
            }
        )

    raw = bands.groupby(["band", "band_key"]).map_groups(
        pairs_of_bucket, batch_format="pyarrow"
    )
    parts = [t for t in (ray.get(r) for r in raw.to_arrow_refs()) if t.num_rows]
    if not parts:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    allp = pa.concat_tables(parts)
    # distinct pairs (a doc pair can collide in several bands)
    import pandas as pd  # noqa: F401

    cand_tbl = pa.Table.from_pandas(
        allp.to_pandas().drop_duplicates(["doc_a", "doc_b"]).sort_values(
            ["doc_a", "doc_b"]
        )[["doc_a", "doc_b"]],
        preserve_index=False,
    )

    # verify candidates with exact Jaccard (shingle sets pulled for the
    # candidate docs only — a tiny broadcast set)
    need = set(cand_tbl["doc_a"].to_pylist()) | set(cand_tbl["doc_b"].to_pylist())
    sets: dict[int, np.ndarray] = {}
    if need:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from .common import documents_path, tokenize_words

        t = pq.read_table(documents_path(sf_dir), columns=["doc_id", "text"])
        t = t.filter(pc.is_in(t["doc_id"], value_set=pa.array(sorted(need))))
        for d, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            sets[d] = _shingle_hashes(tokenize_words(txt))
    a_out, b_out, j_out = [], [], []
    for a_, b_ in zip(cand_tbl["doc_a"].to_pylist(), cand_tbl["doc_b"].to_pylist()):
        sa, sb = sets[a_], sets[b_]
        inter = np.intersect1d(sa, sb).size
        union = sa.size + sb.size - inter
        a_out.append(a_)
        b_out.append(b_)
        j_out.append(float(round6(inter / union)) if union else 0.0)
    return pa.table(
        {
            "doc_a": pa.array(a_out, pa.int64()),
            "doc_b": pa.array(b_out, pa.int64()),
            "jaccard": pa.array(j_out, pa.float64()),
        }
    )


# -- SimHash -----------------------------------------------------------------

def q_simhash(sf_dir: str):
    """64-bit SimHash per doc over word unigram FNV hashes (weighted by tf).
    Deterministic; rows-only driver check."""

    def sim(batch: pa.Table) -> pa.Table:
        toks, _ = tokens_per_row(batch)
        out = []
        for words in toks:
            acc = np.zeros(64, dtype=np.int64)
            tf: dict[str, int] = {}
            for w in words:
                tf[w] = tf.get(w, 0) + 1
            for w, c in tf.items():
                h = np.uint64(0xCBF29CE484222325)
                for bch in w.encode():
                    h = np.uint64((int(h) ^ bch) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
                bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                acc += np.where(bits == 1, c, -c)
            fp = int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
            out.append(fp & ((1 << 63) - 1))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "simhash": pa.array(out, pa.int64()),
            }
        )

    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        sim, batch_format="pyarrow"
    )


QUERIES = {
    "exact_dedup": q_exact_dedup,
    "jaccard_pairs": q_jaccard_pairs,
    "minhash_lsh": q_minhash_lsh,
    "simhash": q_simhash,
}

from .common import SQL_TOKENS  # noqa: E402

ORACLE_SQL = {
    "exact_dedup": """
SELECT doc_id, md5(text) AS text_md5,
       min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_doc_id
FROM documents""",
    "jaccard_pairs": f"""
WITH toks AS (SELECT doc_id, {SQL_TOKENS} AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
  FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS u(i)
),
sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT p.doc_a, p.doc_b, p.inter,
       round(p.inter::DOUBLE / (sa.nsh + sb.nsh - p.inter), 6) AS jaccard
FROM pairs p
JOIN sizes sa ON sa.doc_id = p.doc_a
JOIN sizes sb ON sb.doc_id = p.doc_b""",
}
