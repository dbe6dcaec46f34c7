"""The reference's fusion scoring mode ("pears"), reimplemented exactly.

``score_docs`` (score_pages.py:96-114): final = posix phrase score (only for
docs in the conjunctive candidate set) + completeness + snippet overlap
(+1 bonus when snippet overlap == 1.0), zeroed when NaN or completeness
< 0.3. The cosine DS_scores are computed by the reference but NOT added to
the fused score (quirk preserved: score_pages.py:101-109 never adds
``DS_scores``).

* completeness (overlap_calculation.py:50-63): fraction of the query's
  distinct in-vocab pieces that occur in the doc (binarized vector overlap).
* snippet overlap = generic_overlap(query, title+' '+snippet)
  (overlap_calculation.py:31-40): word-set overlap with punctuation mapped
  to spaces, divided by |distinct query words|.
* posix (overlap_calculation.py:65-154): conjunctive intersection (J4),
  subword-aware phrase scoring: a word counts 1.0 iff every non-initial
  subword occurs at position exactly prev+1; result is the mean over
  deduplicated query words (enforce_subwords=True path).

Because any doc with completeness < 0.3 scores 0 (and completeness 0 for
docs matching no query piece), the candidate set is exactly the docs
matching ≥ 0.3 of the distinct query pieces — computable from postings
without scanning the docs table.
"""

from __future__ import annotations

import string

import numpy as np

from .. import codec

_PUNCT_TABLE = str.maketrans({c: " " for c in string.punctuation})


def generic_overlap(q: str, s: str) -> float:
    """Word-set overlap / |query words| (overlap_calculation.py:31-40)."""
    q_words = q.lower().translate(_PUNCT_TABLE).split()
    s_words = set(s.lower().translate(_PUNCT_TABLE).split())
    if not q_words:
        return 0.0
    qset = set(q_words)
    return len(qset & s_words) / len(qset)


def phrase_score(word_groups: list[tuple[tuple[int, ...], ...]]) -> float:
    """posix_score_seq with enforce_subwords=True
    (overlap_calculation.py:65-122).

    ``word_groups``: one entry per query word; each entry is a tuple of
    per-subword position tuples within the candidate doc. Repeated words are
    deduplicated (the reference uses ``set``; the mean is order-invariant).
    """
    seen = set()
    words = []
    for w in word_groups:
        if w not in seen:
            seen.add(w)
            words.append(w)
    if len(words) == 1 and len(words[0]) == 1:
        return 1.0
    scores = []
    for word in words:
        prev = np.asarray(word[0], dtype=np.int64)
        matched = True
        for sub in word[1:]:
            cur = np.asarray(sub, dtype=np.int64)
            conseq = cur[np.isin(cur - 1, prev)]
            if conseq.size == 0:
                matched = False
                break
            prev = conseq
        scores.append(1.0 if matched else 0.0)
    return float(np.mean(scores)) if scores else 0.0


def group_pieces_into_words(pieces: list[str], ids: list[int]) -> list[list[int]]:
    """Group query piece ids into words by the ``▁`` prefix
    (overlap_calculation.py:143-148). Only in-vocab pieces appear (callers
    drop OOV ids first, mirroring the reference's warning path)."""
    words: list[list[int]] = []
    for piece, tid in zip(pieces, ids):
        if piece.startswith("▁") or not words:
            words.append([tid])
        else:
            words[-1].append(tid)
    return words


def pears_scores(
    query: str,
    word_groups: list[list[int]],
    segment_rows: dict[int, dict],
    doc_meta: "dict[int, tuple[str, str]] | None",
    completeness_threshold: float = 0.3,
) -> dict[int, float]:
    """Fused document scores for one query (score_pages.py:96-114).

    ``segment_rows``: term_id → segment row for every distinct in-vocab
    query piece (missing terms → empty postings). ``doc_meta``: doc_id →
    (title, snippet) for candidate docs (pass None to skip the snippet
    component, e.g. when metadata is joined later).
    """
    distinct_ids = []
    for grp in word_groups:
        for tid in grp:
            if tid not in distinct_ids:
                distinct_ids.append(tid)
    n_query_terms = len(distinct_ids)
    if n_query_terms == 0:
        return {}

    # decode postings once per distinct term
    postings: dict[int, tuple[np.ndarray, np.ndarray, list]] = {}
    for tid in distinct_ids:
        row = segment_rows.get(tid)
        if row is None or row["df"] == 0:
            postings[tid] = (np.empty(0, np.int64), np.empty(0, np.int64), [])
            continue
        docs, tfs, _ = codec.decode_posting_list(row)
        counts, flat = codec.decode_positions_stream(
            codec.varbyte_decode(row["pos_bytes"]), docs.size,
            counts=tfs.astype(np.int64),
        ) if len(row["pos_bytes"]) else (tfs.astype(np.int64) * 0, np.empty(0, np.int64))
        offs = np.r_[0, np.cumsum(counts)]
        pos_slices = [
            tuple(flat[offs[i]:offs[i + 1]].tolist()) for i in range(docs.size)
        ]
        postings[tid] = (docs, tfs, pos_slices)

    # completeness: matched distinct terms / distinct terms
    all_docs = np.unique(np.concatenate([postings[t][0] for t in distinct_ids]))
    if all_docs.size == 0:
        return {}
    match_count = np.zeros(all_docs.size, dtype=np.int64)
    for tid in distinct_ids:
        match_count += np.isin(all_docs, postings[tid][0])
    completeness = match_count / n_query_terms
    cand_mask = completeness >= completeness_threshold
    candidates = all_docs[cand_mask]
    cand_completeness = completeness[cand_mask]

    # conjunctive set + phrase scores (posix path)
    conj_mask = match_count[cand_mask] == n_query_terms
    posix: dict[int, float] = {}
    for d in candidates[conj_mask]:
        groups = []
        ok = True
        for grp in word_groups:
            subs = []
            for tid in grp:
                docs, _, pos_slices = postings[tid]
                j = int(np.searchsorted(docs, d))
                if j >= docs.size or docs[j] != d:
                    ok = False
                    break
                subs.append(pos_slices[j])
            if not ok:
                break
            groups.append(tuple(subs))
        if ok:
            posix[int(d)] = phrase_score(groups)

    scores: dict[int, float] = {}
    for d, comp in zip(candidates, cand_completeness):
        d = int(d)
        s = posix.get(d, 0.0) + float(comp)
        if doc_meta is not None:
            title, snippet = doc_meta.get(d, ("", ""))
            snip = generic_overlap(query, f"{title} {snippet}")
            s += snip
            if snip == 1.0:
                s += 1.0
        if np.isnan(s) or comp < completeness_threshold:
            s = 0.0
        scores[d] = s
    return scores
