"""Pods: named sub-indexes with centroid routing (SURVEY Q9/A1/Q12).

The reference keeps one matrix + one positional index per pod and routes a
query to the top-3 pods by cosine against the pod-centroid matrix, falling
back to ALL pods when the best score is < 0.01 (``score_pages.py:65-93``).
Here pods are a **partition column** derived at extract time (default: the
url host, mirroring the reference's per-source keyword pods); the build
adds one grouped aggregate producing a pods table, and the query engine
uses it for candidate pruning with the same top-3 / all-pods-fallback
contract.

Centroids are feature-hashed tf vectors (dim 4096, ``term_id % dim``),
weighted ``logprob**5`` when an SPM vocab is present — the reference's
``CountVectorizer × logprob^5`` doc vectors (mk_page_vector.py:30)
compressed to a fixed dimension so the same code serves the hash-id regex
tokenizer. Stored unnormalized, like podsum (utils_db.py:105-133).
"""

from __future__ import annotations

import os
from urllib.parse import urlparse

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

CENTROID_DIM = 4096
ROUTE_TOP = 3
ROUTE_FLOOR = 0.01


def pod_of_url(url: str) -> str:
    """Default pod assignment: the url host ('site7.example' → 'site7')."""
    host = urlparse(url).netloc or "home"
    return host.split(".")[0] or "home"


class _Hasher:
    def __init__(self, vocab=None, dim: int = CENTROID_DIM):
        self.dim = dim
        if vocab is not None:
            self.weights = (np.asarray(vocab.weight, dtype=np.float64) ** 5)
        else:
            self.weights = None

    def vector(self, term_ids: np.ndarray) -> np.ndarray:
        """Feature-hashed weighted tf vector of one document/query."""
        v = np.zeros(self.dim, dtype=np.float64)
        if term_ids.size == 0:
            return v
        idx = (term_ids % self.dim).astype(np.int64)
        if self.weights is not None:
            np.add.at(v, idx, self.weights[term_ids])
        else:
            np.add.at(v, idx, 1.0)
        return v


def build_pods_table(cfg, vocab=None) -> str:
    """Grouped aggregate: per-pod centroid over the staged docs (A1).

    Partial per-batch pod-sums inside map_batches, then a tiny
    groupby(pod) final sum — the vector-sum combiner pattern; shuffle rows
    = (#batches × #pods-in-batch), never one per doc."""
    import ray.data as rd

    from .build import _staging_ds

    hasher = _Hasher(vocab)
    dim = hasher.dim

    def partial(batch: pa.Table) -> pa.Table:
        col = batch["term_ids"]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        lens = arr.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
        pods = batch["pod"].to_pylist()
        acc: dict[str, np.ndarray] = {}
        cnt: dict[str, int] = {}
        off = 0
        for p, ln in zip(pods, lens):
            v = hasher.vector(flat[off:off + ln])
            off += ln
            if p in acc:
                acc[p] += v
                cnt[p] += 1
            else:
                acc[p] = v
                cnt[p] = 1
        names = sorted(acc)
        return pa.table(
            {
                "pod": pa.array(names, pa.string()),
                "centroid": pa.array([acc[p].tolist() for p in names],
                                     pa.list_(pa.float64())),
                "n_docs": pa.array([cnt[p] for p in names], pa.int64()),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        vecs = np.array(group["centroid"].to_pylist(), dtype=np.float64)
        return pa.table(
            {
                "pod": pa.array([group["pod"][0].as_py()], pa.string()),
                "centroid": pa.array([vecs.sum(axis=0).tolist()],
                                     pa.list_(pa.float64())),
                "n_docs": pa.array([int(np.sum(group["n_docs"].to_numpy()))],
                                   pa.int64()),
            }
        )

    pods = (
        _staging_ds(cfg, ["pod", "term_ids"])
        .map_batches(partial, batch_format="pyarrow", batch_size=cfg.batch_size * 8)
        .groupby("pod")
        .map_groups(final, batch_format="pyarrow")
    )
    out = os.path.join(cfg.out_dir, "pods")
    pods.write_parquet(out)
    return out


def pod_doc_counts(index_dir: str) -> dict[str, int]:
    """Standalone per-pod doc counts (A3 — the reference's per-pod matrix
    row counts, utils_db.py podsum bookkeeping): read off the pods table
    the build's grouped aggregate already produced."""
    t = pq.read_table(os.path.join(index_dir, "pods"),
                      columns=["pod", "n_docs"])
    return dict(zip(t["pod"].to_pylist(), t["n_docs"].to_pylist()))


class PodRouter:
    """Query-time pod scoring + doc-level pruning masks."""

    def __init__(self, index_dir: str, vocab=None):
        self.pods_tbl = pq.read_table(os.path.join(index_dir, "pods"))
        self.names = self.pods_tbl["pod"].to_pylist()
        m = np.array(self.pods_tbl["centroid"].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        self.matrix = m / norms
        self.hasher = _Hasher(vocab)
        # doc_id → pod code (sorted arrays for searchsorted lookup)
        docs = pq.read_table(os.path.join(index_dir, "staging"),
                             columns=["doc_id", "pod"])
        ids = docs["doc_id"].to_numpy()
        order = np.argsort(ids)
        self.doc_ids = ids[order]
        # a pod can be absent from the pods table while its (tombstoned)
        # docs still sit in staging (delete_pod before compaction): code -1
        # never matches an allow-mask, so those docs are excluded
        codes = {p: i for i, p in enumerate(self.names)}
        pod_col = docs["pod"].to_pylist()
        self.doc_pod = np.array(
            [codes.get(pod_col[i], -1) for i in order], dtype=np.int32
        )

    def route(self, query_term_ids: np.ndarray, top: int = ROUTE_TOP,
              floor: float = ROUTE_FLOOR) -> list[str]:
        """Top-``top`` pods by cosine; ALL pods if the best is < ``floor``
        (the reference's desperate fallback, score_pages.py:83-86).

        Deterministic contract (r5): cosines are 6dp-rounded before
        ranking and ties break on pod NAME asc; the fallback returns
        name-sorted pods. The pods table's row order is a parallel
        groupby artifact, so ranking by table position (the reference's
        dict-insertion order) would not be reproducible — name order is,
        and it is what the SQL oracle replicates."""
        from ..pipelines.common import round6

        q = self.hasher.vector(np.asarray(query_term_ids, dtype=np.int64))
        qn = np.linalg.norm(q)
        if qn == 0:
            return sorted(self.names)
        scores = round6(np.nan_to_num(self.matrix @ (q / qn)))
        if scores.size == 0 or scores.max() < floor:
            return sorted(self.names)
        name_rank = np.argsort(np.argsort(np.array(self.names)))
        order = np.lexsort((name_rank, -scores))[:top]
        return [self.names[i] for i in order]

    def doc_mask(self, doc_ids: np.ndarray, allowed: list[str]) -> np.ndarray:
        """Boolean keep-mask: doc's pod ∈ allowed."""
        allow = np.zeros(len(self.names), dtype=bool)
        for p in allowed:
            if p in self.names:
                allow[self.names.index(p)] = True
        j = np.searchsorted(self.doc_ids, doc_ids)
        j = np.clip(j, 0, self.doc_ids.size - 1)
        found = self.doc_ids[j] == doc_ids
        out = np.zeros(doc_ids.size, dtype=bool)
        codes = self.doc_pod[j[found]]
        out[found] = np.where(codes >= 0, allow[codes], False)
        return out


POD_FINDER_TOP = 10


def score_unregistered_pods(candidates: pa.Table, query_vec: np.ndarray,
                            top: int = POD_FINDER_TOP) -> pa.Table:
    """Q12 pod_finder: rank an IMPORTED, not-yet-registered pod table
    against a query (reference ``app/pod_finder/score_pods.py:16-46``) —
    the "which shared pods should I subscribe to" op, distinct from Q9
    query-time routing over the local registered pods.

    Transcribed semantics: per-pod cosine of its shared ``DS_vector``
    against the query vector (score_pods.py:19-22); NaN scores (zero
    vectors) clamp to 0 *before* ranking (score_pods.py:28-34); sort is
    score-desc with STABLE input-row tie order (get_best_pods — Python's
    stable sort over dict insertion order); top-10; output carries the
    pod's url/name/language/description metadata (output(), :52-61).
    Length-mismatched vectors score 0.0 (utils.py:176-182 guard).

    ``candidates`` columns: ``url``, ``DS_vector`` (list<float>), and
    optional ``name``/``language``/``description`` (null-filled when
    absent). A shared-pods directory is inherently small (pods one could
    subscribe to, not documents) — this is a driver-side kernel; a
    directory too big for one table runs the same kernel inside
    ``map_batches`` with a distributed top-k tail."""
    n = candidates.num_rows
    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.sqrt(np.dot(q, q)))
    col = candidates["DS_vector"]
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    lens = arr.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    scores = np.zeros(n, dtype=np.float64)
    ok = lens == q.size
    if ok.any() and qn > 0:
        m = np.zeros((n, q.size), dtype=np.float64)
        off = np.r_[0, np.cumsum(lens)]
        for i in np.flatnonzero(ok):
            m[i] = flat[off[i]:off[i + 1]]
        norms = np.linalg.norm(m, axis=1)
        with np.errstate(invalid="ignore", divide="ignore"):
            scores = (m @ q) / (norms * qn)
        scores[~ok] = 0.0
    scores = np.nan_to_num(scores)  # zero-norm pods → NaN → 0 (ref :31-34)
    order = np.lexsort((np.arange(n), -scores))[:top]

    def meta(name: str):
        if name in candidates.column_names:
            return candidates[name].take(pa.array(order))
        return pa.array([None] * len(order), pa.string())

    from ..pipelines.common import round6 as _r6  # 6dp away-from-zero

    return pa.table(
        {
            "url": candidates["url"].take(pa.array(order)),
            "name": meta("name"),
            "language": meta("language"),
            "description": meta("description"),
            "score": pa.array(_r6(scores[order]), pa.float64()),
        }
    )
