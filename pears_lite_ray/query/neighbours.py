"""Document neighbours: k-NN over doc vectors (SURVEY Q13 ↔
``app/utils.py:226-245`` / ``app/indexer/neighbours.py:10-33``).

The reference loops cosine_similarity over every Urls row in Python. Here
the scan is a Ray Data pipeline over the staged tokenized docs: the target
doc's vector broadcasts via constructor args, each batch computes one
matmul of L2-normalized logprob^5 count vectors (functions/vectorize), and
partial top-k rows collapse in a distributed grouped reduce — same shape
as the embedding kNN (pipelines/similarity).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from ..functions.vectorize import doc_vectors_batch
from ..stages.extract import url_doc_id
from ..vocab import Vocab


def _dedup_max(ids: np.ndarray, cos: np.ndarray):
    """One row per doc_id, keeping its max cos — staging may hold duplicate
    doc_id rows (exact-identity repeats keep their losers in staging)."""
    order = np.lexsort((ids, -cos))
    ids, cos = ids[order], cos[order]
    first = np.unique(ids, return_index=True)[1]
    return ids[first], cos[first]


class _NeighbourStage:
    def __init__(self, vocab_path: str, target_vec: np.ndarray, k: int,
                 threshold: float | None = None):
        self.vocab = Vocab.load(vocab_path)
        self.target = target_vec
        self.k = k
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = doc_vectors_batch(batch, self.vocab)
        cos = vecs @ self.target
        ids = batch["doc_id"].to_numpy()
        if self.threshold is not None:
            keep = cos >= self.threshold
            ids, cos = ids[keep], cos[keep]
        ids, cos = _dedup_max(ids, cos)
        sel = np.lexsort((ids, -cos))[: self.k]
        return pa.table(
            {
                "doc_id": pa.array(ids[sel], pa.int64()),
                "cos": pa.array(cos[sel], pa.float64()),
            }
        )


def _target_vector(index_dir: str, url: str):
    """(stats, target_id, target doc vector) for a url in the index."""
    from ..index.segments import IndexStats

    stats = IndexStats(os.path.join(index_dir, "stats.json"))
    if stats.tokenizer != "spm" or not stats.vocab_path:
        raise ValueError("doc-vector scoring needs an SPM-vocab index")
    target_id = url_doc_id(url)
    staging = os.path.join(index_dir, "staging")
    ds = pads.dataset(staging, format="parquet")
    t = ds.to_table(columns=["doc_id", "term_ids"],
                    filter=pc.field("doc_id") == target_id)
    if t.num_rows == 0:
        raise KeyError(f"url not in index: {url}")
    vocab = Vocab.load(stats.vocab_path)
    return stats, target_id, doc_vectors_batch(t.slice(0, 1), vocab)[0]


def _scan_topk(scan, vocab_path: str, target_vec, target_id: int, k: int,
               threshold: float | None = None) -> pa.Table:
    """Streaming cosine scan → per-batch partial top-k → distributed
    grouped reduce; only the final k rows ever reach the driver."""
    from ..pipelines.common import pool

    partials = scan.map_batches(
        _NeighbourStage,
        fn_constructor_kwargs={"vocab_path": vocab_path,
                               "target_vec": target_vec, "k": k + 1,
                               "threshold": threshold},
        batch_format="pyarrow",
        concurrency=pool(),
        num_cpus=1,
    )

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("g", pa.array(np.zeros(len(t), np.int8)))

    def final(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy()
        cos = group["cos"].to_numpy()
        keep = ids != target_id
        ids, cos = ids[keep], cos[keep]
        ids, cos = _dedup_max(ids, cos)  # dups straddling block boundaries
        order = np.lexsort((ids, -cos))[:k]
        return pa.table(
            {
                "doc_id": pa.array(ids[order], pa.int64()),
                "cos": pa.array(np.round(cos[order], 6), pa.float64()),
            }
        )

    reduced = (
        partials.map_batches(tag, batch_format="pyarrow")
        .groupby("g")
        .map_groups(final, batch_format="pyarrow")
    )
    try:
        return reduced.take_batch(k, batch_format="pyarrow")
    except (ValueError, StopIteration):  # nothing survived the scan
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "cos": pa.array([], pa.float64())})


def neighbour_docs(index_dir: str, url: str, k: int = 50) -> pa.Table:
    """Top-``k`` most similar docs to ``url`` (excluded), by cosine over
    L2-normalized logprob^5 piece-count vectors; reference cap is 50
    (utils.py:244 via neighbours.py)."""
    import ray.data as rd

    stats, target_id, target_vec = _target_vector(index_dir, url)
    scan = rd.read_parquet(os.path.join(index_dir, "staging"),
                           columns=["doc_id", "term_ids"])
    return _scan_topk(scan, stats.vocab_path, target_vec, target_id, k)


def score_experts(index_dir: str, url: str, expert_pod: str = "Individuals",
                  k: int = 50, threshold: float = 0.05) -> pa.Table:
    """Expert scoring (SURVEY Q11 ↔ reference app/search/score_pages.py:
    30-43): the target doc's vector is scored by cosine against every doc
    of the expert pod (the reference's hard-coded 'Individuals'), keeping
    only scores ≥ 0.05 (the reference's floor), ranked (score desc,
    doc_id asc) and joined to urls — the reference's bestURLs over its
    DS_scores dict. The pod predicate pushes into the staging scan, the
    scan streams through the same partial-top-k + grouped reduce as
    neighbour_docs, and the url join touches only the final k rows."""
    import ray.data as rd

    stats, target_id, target_vec = _target_vector(index_dir, url)
    scan = rd.read_parquet(
        os.path.join(index_dir, "staging"),
        columns=["doc_id", "term_ids"],
        filter=pc.field("pod") == expert_pod,
    )
    top = _scan_topk(scan, stats.vocab_path, target_vec, target_id, k,
                     threshold=threshold)
    if top.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "url": pa.array([], pa.string()),
                         "cos": pa.array([], pa.float64())})
    from ..index.segments import DocStore

    meta = DocStore(os.path.join(index_dir, "staging")).lookup(
        top["doc_id"].to_numpy()
    )
    urls = {int(r["doc_id"]): r["url"] for r in meta.to_pylist()}
    return pa.table(
        {
            "doc_id": top["doc_id"],
            "url": pa.array([urls.get(int(d), "") for d in
                             top["doc_id"].to_pylist()], pa.string()),
            "cos": top["cos"],
        }
    )
