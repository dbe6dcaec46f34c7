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


class _NeighbourStage:
    def __init__(self, vocab_path: str, target_vec: np.ndarray, k: int):
        self.vocab = Vocab.load(vocab_path)
        self.target = target_vec
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = doc_vectors_batch(batch, self.vocab)
        cos = vecs @ self.target
        ids = batch["doc_id"].to_numpy()
        sel = np.lexsort((ids, -cos))[: self.k]
        return pa.table(
            {
                "doc_id": pa.array(ids[sel], pa.int64()),
                "cos": pa.array(cos[sel], pa.float64()),
            }
        )


def neighbour_docs(index_dir: str, url: str, k: int = 50) -> pa.Table:
    """Top-``k`` most similar docs to ``url`` (excluded), by cosine over
    L2-normalized logprob^5 piece-count vectors; reference cap is 50
    (utils.py:244 via neighbours.py)."""
    import ray.data as rd

    from ..index.segments import IndexStats
    from ..pipelines.common import pool

    stats = IndexStats(os.path.join(index_dir, "stats.json"))
    if stats.tokenizer != "spm" or not stats.vocab_path:
        raise ValueError("neighbour_docs needs an SPM-vocab index")
    target_id = url_doc_id(url)
    staging = os.path.join(index_dir, "staging")
    ds = pads.dataset(staging, format="parquet")
    t = ds.to_table(columns=["doc_id", "term_ids"],
                    filter=pc.field("doc_id") == target_id)
    if t.num_rows == 0:
        raise KeyError(f"url not in index: {url}")
    vocab = Vocab.load(stats.vocab_path)
    target_vec = doc_vectors_batch(t.slice(0, 1), vocab)[0]

    partials = rd.read_parquet(staging, columns=["doc_id", "term_ids"]).map_batches(
        _NeighbourStage,
        fn_constructor_kwargs={"vocab_path": stats.vocab_path,
                               "target_vec": target_vec, "k": k + 1},
        batch_format="pyarrow",
        concurrency=pool(),
        num_cpus=1,
    )

    # distributed final reduce (same shape as pipelines/similarity): the
    # per-block partials (≤ k+1 rows each) collapse in a grouped stage, so
    # only the final k rows ever reach the driver
    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("g", pa.array(np.zeros(len(t), np.int8)))

    def final(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy()
        cos = group["cos"].to_numpy()
        keep = ids != target_id
        ids, cos = ids[keep], cos[keep]
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
    except (ValueError, StopIteration):  # corpus held only the target doc
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "cos": pa.array([], pa.float64())})
