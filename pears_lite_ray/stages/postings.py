"""Postings construction: per-batch partial lists → term-group merge.

Replaces the reference's per-document load-modify-rewrite positional index
(``posix_doc``, posix.py:17-28 — the whole pickled index rewritten per doc)
with the scalable two-stage shape (north_star): **partial posting-list
construction inside map_batches** (vectorized, one varbyte encode per batch,
zero-copy byte slicing per term) followed by a **groupby(term_id) shuffle**
whose per-group merge is a k-way concatenation + argsort of already-sorted
runs, re-encoded once with block-max metadata.

Shuffle volume is the encoded partials (varbyte bytes), not raw
(term, doc, pos) rows — typically 3-6× smaller.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import codec

PARTIAL_SCHEMA = pa.schema(
    [
        ("term_id", pa.int64()),
        ("n", pa.int32()),
        ("doc_bytes", pa.binary()),
        ("tf_bytes", pa.binary()),
        ("dl_bytes", pa.binary()),
        ("pos_bytes", pa.binary()),
    ]
)

SEGMENT_SCHEMA = pa.schema(
    [
        ("term_id", pa.int64()),
        ("termhash", pa.int32()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("doc_bytes", pa.binary()),
        ("tf_bytes", pa.binary()),
        ("dl_bytes", pa.binary()),
        ("pos_bytes", pa.large_binary()),
        ("block_last_doc", pa.list_(pa.int64())),
        ("block_max_tfnorm", pa.list_(pa.float64())),
        ("block_doc_off", pa.list_(pa.int32())),
        ("block_tf_off", pa.list_(pa.int32())),
        ("block_dl_off", pa.list_(pa.int32())),
        ("block_n", pa.list_(pa.int32())),
    ]
)


def _flatten_list_col(batch: pa.Table, name: str) -> tuple[np.ndarray, np.ndarray]:
    col = batch[name]
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    lengths = arr.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
    return flat, lengths


def explode_partials(batch: pa.Table, keep_positions: bool = True) -> pa.Table:
    """Tokenized doc rows → one partial posting-list row per distinct term.

    Entirely vectorized: one lexsort over the batch's (term, doc, pos)
    triples, one varbyte encode per output stream, byte-sliced per term.
    """
    flat_terms, lengths = _flatten_list_col(batch, "term_ids")
    if flat_terms.size == 0:
        return PARTIAL_SCHEMA.empty_table()
    doc_rep = np.repeat(batch["doc_id"].to_numpy(), lengths)
    dl_rep = np.repeat(batch["doclen"].to_numpy().astype(np.int64), lengths)
    if keep_positions:
        pos_flat, _ = _flatten_list_col(batch, "positions")
        order = np.lexsort((pos_flat, doc_rep, flat_terms))
        p_s = pos_flat[order]
    else:
        order = np.lexsort((doc_rep, flat_terms))
        p_s = None
    t_s = flat_terms[order]
    d_s = doc_rep[order]
    dl_s = dl_rep[order]

    # (term, doc) pair boundaries → tf per pair
    pair_change = np.r_[True, (t_s[1:] != t_s[:-1]) | (d_s[1:] != d_s[:-1])]
    pstarts = np.nonzero(pair_change)[0]
    tf = np.diff(np.r_[pstarts, t_s.size]).astype(np.int64)
    term_pair = t_s[pstarts]
    doc_pair = d_s[pstarts].astype(np.uint64)
    dl_pair = dl_s[pstarts].astype(np.uint64)

    # term boundaries in pair space
    tchange = np.r_[True, term_pair[1:] != term_pair[:-1]]
    tstarts = np.nonzero(tchange)[0]
    terms = term_pair[tstarts].astype(np.int64)
    n_per_term = np.diff(np.r_[tstarts, term_pair.size]).astype(np.int32)

    # doc gaps, re-based at each term start (partial = one delta run)
    gaps = doc_pair.copy()
    gaps[1:] -= doc_pair[:-1]
    gaps[tstarts] = doc_pair[tstarts]

    doc_chunks = codec.varbyte_encode_split(gaps, tstarts)
    tf_chunks = codec.varbyte_encode_split(tf.astype(np.uint64), tstarts)
    dl_chunks = codec.varbyte_encode_split(dl_pair, tstarts)

    if keep_positions:
        stream = codec.encode_positions_stream(tf, p_s)
        cum_tf = np.r_[0, np.cumsum(tf)]
        stream_starts = cum_tf[tstarts] + tstarts
        pos_chunks = codec.varbyte_encode_split(stream, stream_starts)
    else:
        pos_chunks = [b""] * len(terms)

    return pa.Table.from_arrays(
        [
            pa.array(terms, pa.int64()),
            pa.array(n_per_term, pa.int32()),
            pa.array(doc_chunks, pa.binary()),
            pa.array(tf_chunks, pa.binary()),
            pa.array(dl_chunks, pa.binary()),
            pa.array(pos_chunks, pa.binary()),
        ],
        schema=PARTIAL_SCHEMA,
    )


def _gather_positions(counts, flat_abs, order):
    """Reorder per-posting position runs by ``order`` (vectorized gather)."""
    offsets = np.r_[0, np.cumsum(counts)]
    lens = counts[order]
    total = int(lens.sum())
    if total == 0:
        return lens, np.empty(0, dtype=np.int64)
    idx0 = np.repeat(offsets[:-1][order], lens)
    ramp = np.arange(total) - np.repeat(np.r_[0, np.cumsum(lens)[:-1]], lens)
    return lens, flat_abs[idx0 + ramp]


class MergeTermGroup:
    """Per-term merge of partial lists → one encoded segment row.

    Used as the ``map_groups`` function of the build shuffle. Partials are
    sorted runs; the merge concatenates, argsorts by doc_id (stable) and
    encodes once with block-max metadata. Needs global ``avgdl`` (computed
    by the stats pass before the shuffle — SURVEY §7.1 step 4).
    """

    def __init__(self, avgdl: float, k1: float, b: float, block_size: int,
                 n_shards: int, keep_positions: bool = True):
        self.avgdl = avgdl
        self.k1 = k1
        self.b = b
        self.block_size = block_size
        self.n_shards = n_shards
        self.keep_positions = keep_positions

    def __call__(self, group: pa.Table) -> pa.Table:
        term_id = int(group["term_id"][0].as_py())
        # ONE varbyte decode per stream for the whole group: varbyte is
        # self-delimiting, so the concatenated partial chunks decode as one
        # value stream; per-partial boundaries come from the stored counts.
        # (Per-partial numpy decodes cost ~80 µs each — 4 streams × dozens
        # of partials per hot term made the merge the build's hot path.)
        n_per = group["n"].to_numpy().astype(np.int64)
        total = int(n_per.sum())
        starts = np.r_[0, np.cumsum(n_per)[:-1]]
        gaps = codec.varbyte_decode(b"".join(group["doc_bytes"].to_pylist()), total)
        # segmented cumsum: each partial's first gap is an absolute doc_id
        c = np.cumsum(gaps, dtype=np.uint64)
        base = np.repeat(c[starts] - gaps[starts], n_per)
        doc_all = (c - base).astype(np.int64)
        tf_all = codec.varbyte_decode(b"".join(group["tf_bytes"].to_pylist()), total)
        dl_all = codec.varbyte_decode(b"".join(group["dl_bytes"].to_pylist()), total)

        pos_counts_parts, pos_flat_parts = [], []
        if self.keep_positions:
            stream = codec.varbyte_decode(b"".join(group["pos_bytes"].to_pylist()))
            cnts, flat = codec.decode_positions_stream(
                stream, total, counts=tf_all.astype(np.int64)
            )
            pos_counts_parts.append(cnts)
            pos_flat_parts.append(flat)

        order = np.argsort(doc_all, kind="stable")
        # exact-identity duplicate rows (same doc_id, warc_ts AND url in
        # different partitions) pass the winner filter twice with identical
        # postings; keep the first occurrence — deterministic because the
        # repeats are byte-identical.
        sorted_docs = doc_all[order]
        first = np.r_[True, sorted_docs[1:] != sorted_docs[:-1]]
        if not first.all():
            order = order[first]
        doc_all = doc_all[order]
        tf_all = tf_all[order]
        dl_all = dl_all[order]

        positions = None
        if self.keep_positions:
            counts = np.concatenate(pos_counts_parts)
            flat = np.concatenate(pos_flat_parts)
            positions = _gather_positions(counts, flat, order)

        row = codec.encode_posting_list(
            doc_all, tf_all, dl_all,
            avgdl=self.avgdl, k1=self.k1, b=self.b,
            block_size=self.block_size, positions=positions,
        )
        return pa.Table.from_arrays(
            [
                pa.array([term_id], pa.int64()),
                pa.array([term_id % self.n_shards], pa.int32()),
                pa.array([row["df"]], pa.int64()),
                pa.array([row["cf"]], pa.int64()),
                pa.array([row["doc_bytes"]], pa.binary()),
                pa.array([row["tf_bytes"]], pa.binary()),
                pa.array([row["dl_bytes"]], pa.binary()),
                pa.array([row["pos_bytes"]], pa.large_binary()),
                pa.array([row["block_last_doc"]], pa.list_(pa.int64())),
                pa.array([row["block_max_tfnorm"]], pa.list_(pa.float64())),
                pa.array([row["block_doc_off"]], pa.list_(pa.int32())),
                pa.array([row["block_tf_off"]], pa.list_(pa.int32())),
                pa.array([row["block_dl_off"]], pa.list_(pa.int32())),
                pa.array([row["block_n"]], pa.list_(pa.int32())),
            ],
            schema=SEGMENT_SCHEMA,
        )
