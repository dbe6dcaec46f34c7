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
        ("salt", pa.int32()),
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
        ("first_doc", pa.int64()),
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


def explode_partials(batch: pa.Table, keep_positions: bool = True,
                     salt_bits: int = 0, hot_frac: float = 0.5) -> pa.Table:
    """Tokenized doc rows → one partial posting-list row per distinct term.

    Entirely vectorized: one lexsort over the batch's (term, doc, pos)
    triples, one varbyte encode per output stream, byte-sliced per term.

    **Skew splitting** (SURVEY §4.3): with ``salt_bits`` > 0, a term whose
    in-batch df exceeds ``hot_frac`` × batch docs (a Zipfian head term —
    locally detectable, no global df pass needed) is split into up to
    ``2**salt_bits`` sub-partials keyed by the TOP bits of doc_id. Because
    doc ids are uniform hashes, the buckets cover disjoint, ordered doc
    ranges: stage-2 can concatenate the per-bucket merged sub-lists without
    re-encoding. Cold terms carry salt 0.
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
    tstarts0 = np.nonzero(tchange)[0]
    n_per_term0 = np.diff(np.r_[tstarts0, term_pair.size]).astype(np.int64)

    if salt_bits > 0:
        hot = n_per_term0 > hot_frac * len(batch)
        hot_pair = np.repeat(hot, n_per_term0)
        salt_pair = np.where(
            hot_pair, (doc_pair >> np.uint64(63 - salt_bits)).astype(np.int64), 0
        ).astype(np.int32)
        schange = np.r_[True, salt_pair[1:] != salt_pair[:-1]]
        boundary = tchange | (hot_pair & schange)
    else:
        salt_pair = np.zeros(term_pair.size, dtype=np.int32)
        boundary = tchange
    tstarts = np.nonzero(boundary)[0]
    terms = term_pair[tstarts].astype(np.int64)
    salts = salt_pair[tstarts]
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
            pa.array(salts, pa.int32()),
            pa.array(n_per_term, pa.int32()),
            pa.array(doc_chunks, pa.binary()),
            pa.array(tf_chunks, pa.binary()),
            pa.array(dl_chunks, pa.binary()),
            pa.array(pos_chunks, pa.binary()),
        ],
        schema=PARTIAL_SCHEMA,
    )


def merge_partials_bucket(
    tbl: pa.Table,
    starts: np.ndarray,
    *,
    avgdl: float,
    k1: float,
    b: float,
    block_size: int,
    n_shards: int,
    keep_positions: bool = True,
) -> pa.Table:
    """Stage-1 merge, SEGMENT-VECTORIZED: one call encodes EVERY
    (term_id, salt) group of a hash bucket at once.

    ``map_groups`` costs one Python UDF call per group — with the default
    word tokenizer ``term_id`` is an open 63-bit hash vocabulary
    (vocab.py:173), so at web scale that is O(10⁸⁺) calls dominated by the
    df=1 long tail (the SURVEY §4.3 pathology). Here the whole bucket is
    processed with a fixed number of numpy kernels: ONE varbyte decode per
    stream for every partial in the bucket, ONE lexsort over
    (group, doc_id), ONE varbyte encode per output stream sliced at group
    byte boundaries, and reduceat/repeat arithmetic for the per-block
    metadata. Byte-identical to :class:`MergeTermGroup` applied per group
    (pinned by tests/test_salted.py::test_bucket_merge_matches_per_group).

    ``tbl`` holds a bucket's PARTIAL_SCHEMA rows sorted by (term_id, salt);
    ``starts`` marks each group's first row (the ``segmented_group_map``
    contract). Returns one SEGMENT_SCHEMA row per group.
    """
    n_groups = starts.size
    if n_groups == 0:
        return SEGMENT_SCHEMA.empty_table()
    n_rows = tbl.num_rows
    row_counts = np.diff(np.r_[starts, n_rows])

    # -- decode every partial of the bucket in one pass per stream --------
    n_per = tbl["n"].to_numpy().astype(np.int64)
    total = int(n_per.sum())
    p_starts = np.r_[0, np.cumsum(n_per)[:-1]]
    g_post = np.repeat(
        np.repeat(np.arange(n_groups, dtype=np.int64), row_counts), n_per
    )
    gaps = codec.varbyte_decode(b"".join(tbl["doc_bytes"].to_pylist()), total)
    c = np.cumsum(gaps, dtype=np.uint64)
    base = np.repeat(c[p_starts] - gaps[p_starts], n_per)
    doc_all = (c - base).astype(np.int64)
    tf_all = codec.varbyte_decode(b"".join(tbl["tf_bytes"].to_pylist()), total)
    dl_all = codec.varbyte_decode(b"".join(tbl["dl_bytes"].to_pylist()), total)
    pos_counts = pos_flat = None
    if keep_positions:
        stream = codec.varbyte_decode(b"".join(tbl["pos_bytes"].to_pylist()))
        pos_counts, pos_flat = codec.decode_positions_stream(
            stream, total, counts=tf_all.astype(np.int64)
        )

    # -- sort by (group, doc); drop exact-identity repeats (same contract
    # as MergeTermGroup: stable order keeps the first occurrence) ---------
    order = np.lexsort((doc_all, g_post))
    g_s = g_post[order]
    d_s = doc_all[order]
    first = np.r_[True, (g_s[1:] != g_s[:-1]) | (d_s[1:] != d_s[:-1])]
    if not first.all():
        order = order[first]
        g_s = g_s[first]
        d_s = d_s[first]
    tf_s = tf_all[order]
    dl_s = dl_all[order]
    if keep_positions:
        pos_counts, pos_flat = _gather_positions(pos_counts, pos_flat, order)
    n_kept = d_s.size

    # -- per-group / per-block geometry (all repeat/cumsum arithmetic) ----
    m_g = np.bincount(g_s, minlength=n_groups)          # postings per group
    gp = np.r_[0, np.cumsum(m_g)[:-1]]                  # group posting starts
    n_blocks_g = -(-m_g // block_size)
    nb_total = int(n_blocks_g.sum())
    b_first = np.r_[0, np.cumsum(n_blocks_g)[:-1]]
    blk_rank = np.arange(nb_total) - np.repeat(b_first, n_blocks_g)
    blk_group = np.repeat(np.arange(n_groups), n_blocks_g)
    blk_starts = gp[blk_group] + blk_rank * block_size
    blk_ends = np.minimum(blk_starts + block_size, (gp + m_g)[blk_group])

    # -- encode once per stream, slice bytes at group boundaries ----------
    scores = codec.bm25_tf_norm(tf_s, dl_s, avgdl, k1, b)
    docs_u = d_s.astype(np.uint64)
    gaps_o = docs_u.copy()
    gaps_o[1:] -= docs_u[:-1]
    gaps_o[blk_starts] = docs_u[blk_starts]  # re-base every block start

    def enc(vals: np.ndarray) -> tuple[bytes, np.ndarray]:
        buf = codec.varbyte_encode(vals)
        return buf, np.r_[0, np.cumsum(codec.varbyte_byte_lengths(vals))]

    doc_buf, doc_off = enc(gaps_o)
    tf_buf, tf_off = enc(np.ascontiguousarray(tf_s, np.uint64))
    dl_buf, dl_off = enc(np.ascontiguousarray(dl_s, np.uint64))
    bounds = np.r_[gp, n_kept]

    def cells(buf: bytes, off: np.ndarray) -> list[bytes]:
        mv = memoryview(buf)
        lo = off[bounds]
        return [bytes(mv[lo[i]:lo[i + 1]]) for i in range(n_groups)]

    pos_cells: list[bytes] = [b""] * n_groups
    if keep_positions:
        stream_vals = codec.encode_positions_stream(pos_counts, pos_flat)
        cumc = np.r_[0, np.cumsum(pos_counts)]
        pos_cells = codec.varbyte_encode_split(stream_vals, gp + cumc[gp])

    # -- per-block metadata, grouped into list cells via Arrow offsets ----
    blk_last = d_s[blk_ends - 1]
    blk_max = np.maximum.reduceat(scores, blk_starts)
    blk_n = (blk_ends - blk_starts).astype(np.int32)
    rep_first = np.repeat(b_first, n_blocks_g)
    blk_doc_off = (doc_off[blk_starts] - doc_off[gp[blk_group]]).astype(np.int32)
    blk_tf_off = (tf_off[blk_starts] - tf_off[gp[blk_group]]).astype(np.int32)
    blk_dl_off = (dl_off[blk_starts] - dl_off[gp[blk_group]]).astype(np.int32)
    del rep_first
    blk_bounds = pa.array(np.r_[b_first, nb_total].astype(np.int32), pa.int32())

    def listcol(vals: np.ndarray, typ) -> pa.ListArray:
        return pa.ListArray.from_arrays(blk_bounds, pa.array(vals, typ))

    terms = tbl["term_id"].to_numpy()[starts]
    return pa.Table.from_arrays(
        [
            pa.array(terms, pa.int64()),
            pa.array((terms % n_shards).astype(np.int32), pa.int32()),
            pa.array(d_s[gp], pa.int64()),
            pa.array(m_g.astype(np.int64), pa.int64()),
            pa.array(np.add.reduceat(tf_s, gp).astype(np.int64), pa.int64()),
            pa.array(cells(doc_buf, doc_off), pa.binary()),
            pa.array(cells(tf_buf, tf_off), pa.binary()),
            pa.array(cells(dl_buf, dl_off), pa.binary()),
            pa.array(pos_cells, pa.large_binary()),
            listcol(blk_last.astype(np.int64), pa.int64()),
            listcol(blk_max, pa.float64()),
            listcol(blk_doc_off, pa.int32()),
            listcol(blk_tf_off, pa.int32()),
            listcol(blk_dl_off, pa.int32()),
            listcol(blk_n, pa.int32()),
        ],
        schema=SEGMENT_SCHEMA,
    )


def concat_subsegments_bucket(
    tbl: pa.Table, starts: np.ndarray, concat: "ConcatSubSegments"
) -> pa.Table:
    """Stage-2 concat, bucketized: single-row term groups (the open-vocab
    cold-term long tail — virtually all groups) pass through BYTE-IDENTICAL
    in one vectorized filter; only multi-sub-list terms (hot terms salted
    by explode_partials, a bounded head set) run the per-group
    :class:`ConcatSubSegments` kernel."""
    n = tbl.num_rows
    if n == 0:
        return tbl
    counts = np.diff(np.r_[starts, n])
    if int(counts.max()) == 1:
        return tbl
    single = np.repeat(counts == 1, counts)
    outs: list[pa.Table] = []
    if single.any():
        outs.append(tbl.filter(pa.array(single)))
    for s, cnt in zip(starts[counts > 1], counts[counts > 1]):
        outs.append(concat(tbl.slice(int(s), int(cnt)).combine_chunks())
                    .select(tbl.column_names))
    return pa.concat_tables(outs)


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
        return _segment_row_table(term_id, term_id % self.n_shards,
                                  int(doc_all[0]) if doc_all.size else 0, row)


def _segment_row_table(term_id: int, termhash: int, first_doc: int, row: dict) -> pa.Table:
    return pa.Table.from_arrays(
        [
            pa.array([term_id], pa.int64()),
            pa.array([termhash], pa.int32()),
            pa.array([first_doc], pa.int64()),
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


class ConcatSubSegments:
    """Stage-2 of the salted shuffle: per-term group of merged sub-lists →
    one final segment row (the streaming k-way posting merge of the
    north_star, degenerate for cold terms).

    Sub-lists from doc-range salt buckets cover disjoint, ordered ranges,
    so the merge is a byte CONCATENATION with offset rebasing — possible
    because blocks decode independently and the stored block bound is the
    idf-free tf-normalization (codec.encode_posting_list). If ranges
    overlap (a term classified hot in one batch and cold in another), the
    rare fallback decodes and re-merges exactly.
    """

    def __init__(self, avgdl: float, k1: float, b: float, block_size: int,
                 n_shards: int, keep_positions: bool = True):
        self.avgdl = avgdl
        self.k1 = k1
        self.b = b
        self.block_size = block_size
        self.n_shards = n_shards
        self.keep_positions = keep_positions

    def _fallback_merge(self, group: pa.Table,
                        exclude_src1: np.ndarray | None = None) -> pa.Table:
        """Exact decode + re-merge. With ``exclude_src1`` set (index union,
        index/merge.py), rows carrying ``src == 1`` (the LOSER index) drop
        any posting whose doc_id is in the exclude set — the winner
        resolution for doc_ids indexed in both inputs with different
        content."""
        term_id = int(group["term_id"][0].as_py())
        rows = group.to_pylist()
        srcs = (group["src"].to_numpy()
                if "src" in group.column_names
                else np.zeros(len(rows), dtype=np.int8))
        docs_p, tfs_p, dls_p = [], [], []
        cnts_p, flat_p = [], []
        for r, s in zip(rows, srcs):
            d, t, l = codec.decode_posting_list(r)
            cnts = flat = None
            if self.keep_positions:
                stream = codec.varbyte_decode(r["pos_bytes"])
                cnts, flat = codec.decode_positions_stream(
                    stream, d.size, counts=t.astype(np.int64)
                )
            if exclude_src1 is not None and s == 1 and d.size:
                keep = ~np.isin(d, exclude_src1)
                if not keep.all():
                    if self.keep_positions:
                        cnts, flat = _gather_positions(
                            cnts, flat, np.nonzero(keep)[0]
                        )
                    d, t, l = d[keep], t[keep], l[keep]
            docs_p.append(d)
            tfs_p.append(t)
            dls_p.append(l)
            if self.keep_positions:
                cnts_p.append(cnts)
                flat_p.append(flat)
        doc_all = np.concatenate(docs_p)
        tf_all = np.concatenate(tfs_p)
        dl_all = np.concatenate(dls_p)
        if doc_all.size == 0:
            # every posting excluded (term only in the loser copies)
            return SEGMENT_SCHEMA.empty_table()
        order = np.argsort(doc_all, kind="stable")
        sorted_docs = doc_all[order]
        first = np.r_[True, sorted_docs[1:] != sorted_docs[:-1]]
        if not first.all():
            order = order[first]
        positions = None
        if self.keep_positions:
            positions = _gather_positions(
                np.concatenate(cnts_p), np.concatenate(flat_p), order
            )
        row = codec.encode_posting_list(
            doc_all[order], tf_all[order], dl_all[order],
            avgdl=self.avgdl, k1=self.k1, b=self.b,
            block_size=self.block_size, positions=positions,
        )
        return _segment_row_table(term_id, term_id % self.n_shards,
                                  int(doc_all[order][0]), row)

    def __call__(self, group: pa.Table) -> pa.Table:
        if group.num_rows == 1:
            return group  # cold term: stage-1 row is already final
        firsts = group["first_doc"].to_numpy()
        order = np.argsort(firsts, kind="stable")
        lasts = np.array([bl[-1] for bl in group["block_last_doc"].to_pylist()],
                         dtype=np.int64)
        if not (lasts[order][:-1] < firsts[order][1:]).all():
            return self._fallback_merge(group)
        g = group.take(pa.array(order))
        term_id = int(g["term_id"][0].as_py())
        doc_b = g["doc_bytes"].to_pylist()
        tf_b = g["tf_bytes"].to_pylist()
        dl_b = g["dl_bytes"].to_pylist()
        doc_sh = np.r_[0, np.cumsum([len(b) for b in doc_b])[:-1]]
        tf_sh = np.r_[0, np.cumsum([len(b) for b in tf_b])[:-1]]
        dl_sh = np.r_[0, np.cumsum([len(b) for b in dl_b])[:-1]]

        def cat_off(col: str, shifts) -> list[int]:
            out: list[int] = []
            for offs, sh in zip(g[col].to_pylist(), shifts):
                out.extend(int(o) + int(sh) for o in offs)
            return out

        def cat(col: str) -> list:
            out: list = []
            for v in g[col].to_pylist():
                out.extend(v)
            return out

        row = {
            "df": int(np.sum(g["df"].to_numpy())),
            "cf": int(np.sum(g["cf"].to_numpy())),
            "doc_bytes": b"".join(doc_b),
            "tf_bytes": b"".join(tf_b),
            "dl_bytes": b"".join(dl_b),
            "pos_bytes": b"".join(g["pos_bytes"].to_pylist()),
            "block_last_doc": cat("block_last_doc"),
            "block_max_tfnorm": cat("block_max_tfnorm"),
            "block_doc_off": cat_off("block_doc_off", doc_sh),
            "block_tf_off": cat_off("block_tf_off", tf_sh),
            "block_dl_off": cat_off("block_dl_off", dl_sh),
            "block_n": cat("block_n"),
        }
        return _segment_row_table(term_id, term_id % self.n_shards,
                                  int(firsts[order][0]), row)
