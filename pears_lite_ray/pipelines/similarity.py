"""Similarity search over the ``embeddings`` table (list<float> column).

* knn_cosine — brute-force cosine top-k: the query matrix is broadcast once
  (``ray.put`` in the actor constructor args), each batch does one float64
  matmul, per-batch partial top-k rows are merged with one tiny driver-side
  selection. Scales: the scan is embarrassingly parallel, the reduce is
  O(#batches × q × k). SQL-oracle-checked via list_cosine_similarity.
* knn_lsh — random-hyperplane LSH bucketing (16-bit signatures): candidates
  share a signature bucket with the query, reranked exactly. Rows-only
  check (hyperplanes not SQL-expressible); recall vs brute force is
  asserted in tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .common import pool, read_embeddings

N_QUERY_VECS = 5   # queries = embeddings with vec_id < 5
TOP_K = 10
LSH_BITS = 12
ROUND_DP = 4  # float32 inputs; 4dp keeps numpy/DuckDB double paths identical


def _query_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from .common import embeddings_path

    t = pq.read_table(embeddings_path(sf_dir), columns=["vec_id", "embedding"])
    t = t.filter(pc.less(t["vec_id"], N_QUERY_VECS))
    ids = t["vec_id"].to_numpy()
    mat = np.stack(
        [np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()]
    )
    order = np.argsort(ids)
    return ids[order], mat[order]


class BruteForceKnnStage:
    """Per-batch cosine scores against the broadcast query matrix; emits the
    batch-local top-k per query (partial top-k — the combiner pattern)."""

    def __init__(self, query_ids: np.ndarray, query_mat: np.ndarray, k: int = TOP_K):
        self.qids = query_ids
        self.q = query_mat / np.linalg.norm(query_mat, axis=1, keepdims=True)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy()
        col = batch["embedding"]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        dim = self.q.shape[1]
        m = flat.reshape(-1, dim)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        cos = self.q @ m.T  # (q, batch)
        out_q, out_n, out_c = [], [], []
        for qi in range(self.qids.size):
            row = cos[qi]
            mask = ids != self.qids[qi]  # exclude self
            cand_ids = ids[mask]
            cand_cos = row[mask]
            # same total order as the final merge (rounded cos desc, id asc)
            # so boundary ties select identically in partial and final passes
            sel = np.lexsort((cand_ids, -np.round(cand_cos, ROUND_DP)))[: self.k]
            out_q.extend([int(self.qids[qi])] * sel.size)
            out_n.extend(cand_ids[sel].tolist())
            out_c.extend(cand_cos[sel].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cos": pa.array(out_c, pa.float64()),
            }
        )


def _final_topk(partials: pa.Table, k: int = TOP_K) -> pa.Table:
    """Merge partial top-k rows: per query (rounded-cos desc, neighbor asc)."""
    q = partials["query_id"].to_numpy()
    n = partials["neighbor_id"].to_numpy()
    c = np.round(partials["cos"].to_numpy(), ROUND_DP)
    out_q, out_n, out_c = [], [], []
    for qid in np.unique(q):
        m = q == qid
        order = np.lexsort((n[m], -c[m]))[:k]
        out_q.extend([int(qid)] * len(order))
        out_n.extend(n[m][order].tolist())
        out_c.extend(c[m][order].tolist())
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "cos": pa.array(out_c, pa.float64()),
        }
    )


def q_knn_cosine(sf_dir: str):
    import ray

    qids, qmat = _query_matrix(sf_dir)
    partials = read_embeddings(sf_dir, columns=["vec_id", "embedding"]).map_batches(
        BruteForceKnnStage,
        fn_constructor_kwargs={"query_ids": qids, "query_mat": qmat},
        batch_format="pyarrow",
        concurrency=pool(),
        num_cpus=1,
    )
    parts = [t for t in (ray.get(r) for r in partials.to_arrow_refs()) if t.num_rows]
    return _final_topk(pa.concat_tables(parts))


class LshBucketStage:
    """Random-hyperplane signature per vector (state: the fixed hyperplane
    matrix, built once per actor from a fixed seed)."""

    def __init__(self, dim: int = 64, bits: int = LSH_BITS, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.h = rng.standard_normal((bits, dim))

    def signature(self, m: np.ndarray) -> np.ndarray:
        bits = (self.h @ m.T) > 0  # (bits, n)
        weights = (1 << np.arange(bits.shape[0], dtype=np.int64))[:, None]
        return (bits * weights).sum(axis=0).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch["embedding"]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        m = flat.reshape(len(batch), -1)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "bucket": pa.array(self.signature(m), pa.int64()),
            }
        )


def q_knn_lsh(sf_dir: str):
    """LSH-bucketed ANN: rerank only vectors whose signature is within
    Hamming distance 1 of the query's. Rows-only check; recall is asserted
    against brute force in tests."""
    import pyarrow.parquet as pq

    from .common import embeddings_path

    qids, qmat = _query_matrix(sf_dir)
    stage = LshBucketStage(dim=qmat.shape[1])
    import ray

    buckets = read_embeddings(sf_dir, columns=["vec_id", "embedding"]).map_batches(
        LshBucketStage, batch_format="pyarrow", concurrency=pool(), num_cpus=1,
        fn_constructor_kwargs={"dim": qmat.shape[1]},
    )
    parts = [ray.get(r) for r in buckets.to_arrow_refs()]
    all_b = pa.concat_tables(parts)
    vec_bucket = dict(zip(all_b["vec_id"].to_pylist(), all_b["bucket"].to_pylist()))

    qsig = stage.signature(qmat)
    # candidate set: exact bucket or Hamming-1 neighbor buckets
    out_q, out_n, out_c = [], [], []
    emb = pq.read_table(embeddings_path(sf_dir), columns=["vec_id", "embedding"])
    ids = emb["vec_id"].to_numpy()
    mat = np.stack([np.asarray(v, np.float64) for v in emb["embedding"].to_pylist()])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    for qi in range(qids.size):
        want = {int(qsig[qi])} | {int(qsig[qi]) ^ (1 << b) for b in range(LSH_BITS)}
        cand = np.array(
            [i for i, v in enumerate(ids)
             if vec_bucket[int(v)] in want and int(v) != int(qids[qi])],
            dtype=np.int64,
        )
        if cand.size == 0:
            continue
        cos = qn[qi] @ mat[cand].T
        order = np.lexsort((ids[cand], -np.round(cos, ROUND_DP)))[:TOP_K]
        out_q.extend([int(qids[qi])] * len(order))
        out_n.extend(ids[cand][order].tolist())
        out_c.extend(np.round(cos, ROUND_DP)[order].tolist())
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "cos": pa.array(out_c, pa.float64()),
        }
    )


EMB_DUP_THRESHOLD = 0.3  # synthetic 64-dim embeddings: random cosines
#                          concentrate near 0, so 0.3 marks genuine near-dups


def q_embedding_dups(sf_dir: str):
    """Embedding-cosine near-duplicate pairs (cos ≥ threshold, a < b).

    Per-batch matmul against the broadcast normalized matrix (ray.put once,
    read per actor) — exact at oracle scale; at 100 TB the LSH-bucketed
    variant (q_knn_lsh's signatures) prunes candidates first and this exact
    kernel reranks within buckets."""
    import ray
    import pyarrow.parquet as pq

    from .common import embeddings_path

    emb = pq.read_table(embeddings_path(sf_dir), columns=["vec_id", "embedding"])
    all_ids = emb["vec_id"].to_numpy()
    mat = np.stack([np.asarray(v, np.float64) for v in emb["embedding"].to_pylist()])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ref = ray.put((all_ids, mat))

    def pairs(batch: pa.Table) -> pa.Table:
        ids_all, m_all = ray.get(ref)
        ids = batch["vec_id"].to_numpy()
        col = batch["embedding"]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        m = flat.reshape(len(batch), -1)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        cos = m @ m_all.T  # (batch, all)
        bi, aj = np.nonzero(cos >= EMB_DUP_THRESHOLD)
        a = ids[bi]
        b = ids_all[aj]
        keep = a < b  # each unordered pair once, from its lower-id side
        c = np.round(cos[bi, aj], 4)
        return pa.table(
            {
                "vec_a": pa.array(a[keep], pa.int64()),
                "vec_b": pa.array(b[keep], pa.int64()),
                "cos": pa.array(c[keep], pa.float64()),
            }
        )

    return read_embeddings(sf_dir, columns=["vec_id", "embedding"]).map_batches(
        pairs, batch_format="pyarrow"
    )


QUERIES = {
    "knn_cosine": q_knn_cosine,
    "knn_lsh": q_knn_lsh,
    "embedding_dups": q_embedding_dups,
}

ORACLE_SQL = {
    "knn_cosine": f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
  FROM embeddings WHERE vec_id < {N_QUERY_VECS}
),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.qe, e.embedding::DOUBLE[]), {ROUND_DP}) AS cos
  FROM q JOIN embeddings e ON e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cos FROM scored
QUALIFY row_number() OVER (
  PARTITION BY query_id ORDER BY cos DESC, neighbor_id
) <= {TOP_K}""",
    "embedding_dups": f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[],
                                    b.embedding::DOUBLE[]), {ROUND_DP}) AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                             b.embedding::DOUBLE[]) >= {EMB_DUP_THRESHOLD}""",
}
