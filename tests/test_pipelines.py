"""Driver-facing operator pipelines: dedup family on a planted-duplicate
documents table, similarity search on the testdata embeddings, and the
SQL-oracle parity harness on a small synthetic table."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor"
).split()


def _tbl(x) -> pa.Table:
    """Normalize a pipeline result (Dataset or Table) to a pa.Table — the
    knn entries return lazy Datasets since the distributed top-k reduce."""
    import ray.data as rd

    if isinstance(x, rd.Dataset):
        return pa.Table.from_pandas(x.to_pandas())
    return x


@pytest.fixture(scope="module")
def planted_docs_dir(tmp_path_factory):
    """documents.parquet with: 0/1 exact dups, 2/3 near dups (1-word edit),
    the rest random — plus an embeddings.parquet for the knn entries."""
    rng = np.random.RandomState(11)
    texts = []
    base = " ".join(rng.choice(WORDS, size=60))
    texts.append(base)                      # 0
    texts.append(base)                      # 1 exact dup of 0
    near = base.split()
    near[30] = "zulu"
    texts.append(" ".join(near))            # 2 near dup of 0
    near2 = list(near)
    near2[10] = "yankee"
    texts.append(" ".join(near2))           # 3 near dup of 2
    for _ in range(26):
        texts.append(" ".join(rng.choice(WORDS, size=40)))
    d = tmp_path_factory.mktemp("planted")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
            }
        ),
        os.path.join(str(d), "documents.parquet"),
    )
    emb = rng.standard_normal((40, 16)).astype(np.float32)
    emb[7] = emb[0] * 2.0 + rng.standard_normal(16).astype(np.float32) * 0.01
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(40), pa.int64()),
                "embedding": pa.array([list(map(float, v)) for v in emb],
                                      pa.list_(pa.float32())),
            }
        ),
        os.path.join(str(d), "embeddings.parquet"),
    )
    return str(d)


def test_exact_dedup_canonical(ray_session, planted_docs_dir):
    from pears_lite_ray.pipelines.dedup import q_exact_dedup

    out = q_exact_dedup(planted_docs_dir).to_pandas().set_index("doc_id").sort_index()
    assert out.loc[0, "canonical_doc_id"] == 0
    assert out.loc[1, "canonical_doc_id"] == 0      # exact dup folded
    assert out.loc[2, "canonical_doc_id"] == 2      # near dup NOT folded
    assert (out.loc[4:, "canonical_doc_id"] == out.index[4:]).all()


def test_jaccard_pairs_find_near_dups(ray_session, planted_docs_dir):
    from pears_lite_ray.pipelines.dedup import q_jaccard_pairs

    t = q_jaccard_pairs(planted_docs_dir).to_pandas()
    pairs = {(a, b): j for a, b, j in zip(t.doc_a, t.doc_b, t.jaccard)}
    assert pairs[(0, 1)] == 1.0                    # identical shingle sets
    assert pairs[(0, 2)] > 0.8                     # one-word edit
    assert pairs[(2, 3)] > 0.8


def test_minhash_lsh_recalls_planted(ray_session, planted_docs_dir):
    from pears_lite_ray.pipelines.dedup import q_minhash_lsh

    t = q_minhash_lsh(planted_docs_dir).to_pandas()
    got = {(a, b) for a, b in zip(t["doc_a"], t["doc_b"])}
    assert (0, 1) in got
    assert (0, 2) in got
    jac = dict(zip(zip(t["doc_a"], t["doc_b"]), t["jaccard"]))
    assert jac[(0, 1)] == 1.0


def test_simhash_near_dups_close(ray_session, planted_docs_dir):
    from pears_lite_ray.pipelines.dedup import q_simhash

    t = q_simhash(planted_docs_dir).to_pandas().set_index("doc_id")
    h = t["simhash"]
    assert h.loc[0] == h.loc[1]
    ham = bin(int(h.loc[0]) ^ int(h.loc[2])).count("1")
    assert ham <= 8                          # one-word edit → few bits flip
    rand_ham = bin(int(h.loc[0]) ^ int(h.loc[10])).count("1")
    assert rand_ham > ham


def test_knn_cosine_finds_planted_neighbor(ray_session, planted_docs_dir):
    from pears_lite_ray.pipelines.similarity import q_knn_cosine

    t = _tbl(q_knn_cosine(planted_docs_dir))
    rows = [
        (q, n, c)
        for q, n, c in zip(t["query_id"].to_pylist(),
                           t["neighbor_id"].to_pylist(),
                           t["cos"].to_pylist())
        if q == 0
    ]
    # vec 7 ≈ 2 * vec 0 → top neighbor of query 0
    top = max(rows, key=lambda r: (r[2], -r[1]))
    assert top[1] == 7 and top[2] > 0.99


def test_knn_lsh_overlaps_bruteforce(ray_session, planted_docs_dir):
    from pears_lite_ray.pipelines.similarity import q_knn_cosine, q_knn_lsh

    bf = _tbl(q_knn_cosine(planted_docs_dir))
    lsh = _tbl(q_knn_lsh(planted_docs_dir))

    def tops(t):
        d = {}
        for q, n, c in zip(t["query_id"].to_pylist(), t["neighbor_id"].to_pylist(),
                           t["cos"].to_pylist()):
            d.setdefault(q, []).append((c, n))
        return {q: {n for _, n in sorted(v, reverse=True)[:5]} for q, v in d.items()}

    tb, tl = tops(bf), tops(lsh)
    # every LSH hit must be a genuine vector with correct cosine (subset of
    # candidates); require nonzero overlap with the exact top-5 somewhere
    overlap = sum(len(tb[q] & tl.get(q, set())) for q in tb)
    assert overlap > 0


def test_ann_recall_bounds_and_self_recall(ray_session, planted_docs_dir, monkeypatch):
    from pears_lite_ray.pipelines import similarity as S

    t = _tbl(S.q_ann_recall(planted_docs_dir, method="lsh"))
    recs = t["recall"].to_pylist()
    assert recs and all(0.0 <= r <= 1.0 for r in recs)
    assert set(t["method"].to_pylist()) == {"lsh"}
    assert all(
        h <= e
        for h, e in zip(t["n_hits"].to_pylist(), t["n_exact"].to_pylist())
    )

    # exact-vs-exact pins recall to 1.0 for every query (q_ann_recall
    # resolves the approx path from module globals at call time)
    monkeypatch.setattr(S, "q_knn_lsh", S.q_knn_cosine)
    t2 = _tbl(S.q_ann_recall(planted_docs_dir, method="lsh"))
    assert all(r == 1.0 for r in t2["recall"].to_pylist())


def test_hot_shingle_cap_reported_not_silent(ray_session, tmp_path_factory):
    """A shingle shared by more docs than the cap is dropped from pair
    generation AND reported (no-silent-caps): jaccard_dropped_shingles
    returns exactly the dropped set; below-cap pairs survive; the default
    cap keeps everything."""
    from pears_lite_ray.pipelines.dedup import (
        jaccard_dropped_shingles,
        q_jaccard_pairs,
    )

    d = str(tmp_path_factory.mktemp("hotcap"))
    # docs 0-3 share ONLY the opening shingle "alpha bravo charlie"
    # (pairwise-distinct tails); docs 4-5 share "delta echo foxtrot"
    texts = [
        "alpha bravo charlie " + t
        for t in ("golf hotel india", "juliet kilo lima",
                  "mike november oscar", "papa quebec romeo")
    ] + [
        "delta echo foxtrot sierra tango",
        "delta echo foxtrot uniform victor",
    ]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(6), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        os.path.join(d, "documents.parquet"),
    )

    pairs = q_jaccard_pairs(d, hot_cap=3).to_pandas()
    assert set(zip(pairs.doc_a, pairs.doc_b)) == {(4, 5)}

    dropped = jaccard_dropped_shingles(d, hot_cap=3).to_pandas()
    assert len(dropped) == 1 and int(dropped.n_docs.iloc[0]) == 4

    full = q_jaccard_pairs(d).to_pandas()  # default cap: nothing dropped
    expect = {(a, b) for a in range(4) for b in range(a + 1, 4)} | {(4, 5)}
    assert set(zip(full.doc_a, full.doc_b)) == expect


def test_lsh_hot_bucket_cap_reported(ray_session, tmp_path_factory):
    """LSH band buckets over the cap are dropped from candidate generation
    and reported by lsh_dropped_buckets."""
    from pears_lite_ray.pipelines.dedup import (
        MINHASH_BANDS,
        lsh_dropped_buckets,
        q_minhash_lsh,
    )

    d = str(tmp_path_factory.mktemp("lshcap"))
    same = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    texts = [same] * 4 + [
        "kilo lima mike november oscar papa quebec romeo sierra tango",
        "kilo lima mike november oscar papa quebec romeo sierra uniform",
    ]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(6), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        os.path.join(d, "documents.parquet"),
    )

    capped = q_minhash_lsh(d, hot_cap=3).to_pandas()
    ident = {(a, b) for a in range(4) for b in range(a + 1, 4)}
    assert not (set(zip(capped.doc_a, capped.doc_b)) & ident)

    dropped = lsh_dropped_buckets(d, hot_cap=3).to_pandas()
    # the 4 identical docs share every band bucket
    assert len(dropped) == MINHASH_BANDS
    assert (dropped.n_docs == 4).all()

    full = q_minhash_lsh(d).to_pandas()  # default cap keeps them
    assert ident <= set(zip(full.doc_a, full.doc_b))


def test_langid_and_fingerprint_shapes(ray_session, planted_docs_dir):
    from pears_lite_ray.pipelines.textstats import q_fingerprint, q_langid

    lid = q_langid(planted_docs_dir).to_pandas()
    assert set(lid.columns) == {"doc_id", "pred_lang", "confidence"}
    assert len(lid) == 30
    fp = q_fingerprint(planted_docs_dir).to_pandas().set_index("doc_id")
    assert (fp.loc[0] == fp.loc[1]).all()    # identical docs → same digest
    assert fp.loc[0, "fp_digest"] != fp.loc[10, "fp_digest"]


def test_batch_query_stage_matches_engine(ray_session, planted_docs_dir):
    """Dataset-scale query evaluation == per-query engine calls."""
    import pyarrow as pa
    import ray.data as rd

    from pears_lite_ray.pipelines.fulltext import docs_index_dir
    from pears_lite_ray.query.engine import BatchQueryStage, QueryEngine

    idx = docs_index_dir(planted_docs_dir)
    eng = QueryEngine(idx)
    queries = pa.table(
        {
            "query_id": pa.array([0, 1, 2], pa.int32()),
            "query": pa.array(["alpha bravo", "zulu", "echo foxtrot golf"], pa.string()),
            "k": pa.array([5, 5, 5], pa.int32()),
        }
    )
    got = (
        rd.from_arrow(queries)
        .map_batches(BatchQueryStage, fn_constructor_kwargs={"index_dir": idx},
                     batch_format="pyarrow", batch_size=2, concurrency=2, num_cpus=1)
        .to_pandas()
        .sort_values(["query_id", "rank"])
    )
    for qid, q in [(0, "alpha bravo"), (1, "zulu"), (2, "echo foxtrot golf")]:
        d, s = eng.search_scores(q, 5)
        sub = got[got.query_id == qid]
        assert sub["doc_id"].tolist() == d.tolist(), q
        assert np.allclose(sub["score"].to_numpy(), s, atol=0), q


def test_knn_ivf_recalls_planted(ray_session, planted_docs_dir):
    """IVF-flat finds the planted near-identical neighbor (vec 7 ≈ 2·vec 0
    shares query 0's centroid by construction) and overlaps brute force."""
    from pears_lite_ray.pipelines.similarity import q_knn_cosine, q_knn_ivf

    ivf = _tbl(q_knn_ivf(planted_docs_dir))
    rows = {
        q: (n, c)
        for q, n, c in zip(ivf["query_id"].to_pylist(),
                           ivf["neighbor_id"].to_pylist(),
                           ivf["cos"].to_pylist())
        if c == max(cc for qq, cc in zip(ivf["query_id"].to_pylist(),
                                         ivf["cos"].to_pylist()) if qq == q)
    }
    assert rows[0][0] == 7 and rows[0][1] > 0.99

    bf = _tbl(q_knn_cosine(planted_docs_dir))
    def tops(t):
        d = {}
        for q, n, c in zip(t["query_id"].to_pylist(), t["neighbor_id"].to_pylist(),
                           t["cos"].to_pylist()):
            d.setdefault(q, []).append((c, n))
        return {q: {n for _, n in sorted(v, reverse=True)[:5]} for q, v in d.items()}
    tb, ti = tops(bf), tops(ivf)
    overlap = sum(len(tb[q] & ti.get(q, set())) for q in tb)
    assert overlap > 0


def test_knn_pq_recalls_planted_and_reranks_exactly(ray_session, planted_docs_dir):
    """IVF-PQ finds the planted near-identical neighbor, its exact-rerank
    cosines equal brute force for shared (query, neighbor) pairs, and the
    top-1 agrees with brute force on the planted query."""
    from pears_lite_ray.pipelines.similarity import q_knn_cosine, q_knn_pq

    pq_t = _tbl(q_knn_pq(planted_docs_dir))
    bf = _tbl(q_knn_cosine(planted_docs_dir))
    pq_rows = {
        (q, n): c
        for q, n, c in zip(pq_t["query_id"].to_pylist(),
                           pq_t["neighbor_id"].to_pylist(),
                           pq_t["cos"].to_pylist())
    }
    bf_rows = {
        (q, n): c
        for q, n, c in zip(bf["query_id"].to_pylist(),
                           bf["neighbor_id"].to_pylist(),
                           bf["cos"].to_pylist())
    }
    # planted: vec 7 ≈ 2·vec 0 must be query 0's top hit with cos ≈ 1
    assert pq_rows.get((0, 7), 0) > 0.99
    # exact rerank: shared pairs score identically (both 4dp-rounded)
    shared = set(pq_rows) & set(bf_rows)
    assert shared and all(pq_rows[p] == bf_rows[p] for p in shared)
    # aggregate recall of the ADC shortlist path vs brute-force top-k
    qids = {q for q, _ in bf_rows}
    recall = sum(1 for p in bf_rows if p in pq_rows) / len(bf_rows)
    assert recall >= 0.5, (recall, len(qids))


def test_gopher_quality_gate(ray_session, tmp_path):
    """Gopher rules fire on the right documents: a normal doc keeps, a
    too-short / symbol-heavy / stopword-free doc drops."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    good = ("the quick brown fox jumps over the lazy dog and then the dog "
            "turns around to chase the fox across the wide green field for "
            "a long while until both of them rest under the old oak tree "
            "near the quiet river bank at the end of the warm afternoon")
    short = "tiny doc"
    symbols = " ".join(["##"] * 60)
    nostops = " ".join(["zzz"] * 60)
    d = tmp_path / "gq"
    d.mkdir()
    pq.write_table(
        pa.table({
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array([good, short, symbols, nostops], pa.string()),
            "lang": pa.array(["en"] * 4, pa.string()),
        }),
        str(d / "documents.parquet"),
    )
    from pears_lite_ray.pipelines.textstats import q_gopher_quality

    t = q_gopher_quality(str(d)).to_pandas().set_index("doc_id")
    assert bool(t.loc[0, "keep"])
    assert not bool(t.loc[1, "keep"])      # word count < 50
    assert not bool(t.loc[2, "keep"])      # symbol ratio + alpha ratio
    assert not bool(t.loc[3, "keep"])      # no stopwords
    assert t.loc[0, "word_count"] >= 50


def test_decontaminate_flags_benchmark_overlap(ray_session, planted_docs_dir):
    """Docs sharing a 5-gram with the benchmark slice (doc_id % 97 == 0 →
    doc 0 here) are flagged; unrelated docs are clean."""
    from pears_lite_ray.pipelines.textstats import q_decontaminate

    t = q_decontaminate(planted_docs_dir).to_pandas().set_index("doc_id")
    assert bool(t.loc[0, "contaminated"])          # benchmark doc itself
    assert bool(t.loc[1, "contaminated"])          # exact dup of doc 0
    assert t.loc[1, "n_hits"] == t.loc[0, "n_hits"]
    assert bool(t.loc[2, "contaminated"])          # near dup (1-word edit)
    assert t.loc[2, "n_hits"] < t.loc[0, "n_hits"]
    assert len(t) == 30


def test_top_ngrams_counts(ray_session, planted_docs_dir):
    from pears_lite_ray.pipelines.textstats import TOP_NGRAMS_K, q_top_ngrams

    t = q_top_ngrams(planted_docs_dir).to_pandas()
    assert len(t) == TOP_NGRAMS_K
    # the duplicated doc pair means its grams appear ≥2 times
    assert t["cnt"].iloc[0] >= 2
    # contract: count desc, ngram asc
    for i in range(1, len(t)):
        a, b = t.iloc[i - 1], t.iloc[i]
        assert (a["cnt"], a["ngram"]) != (b["cnt"], b["ngram"])
        assert a["cnt"] > b["cnt"] or (a["cnt"] == b["cnt"] and a["ngram"] < b["ngram"])


def test_pack_sequences_contiguous_stream(ray_session, planted_docs_dir):
    """Offsets form one contiguous token stream in doc_id order across
    bucket boundaries; sequence spans follow from the offsets."""
    from pears_lite_ray.pipelines.textstats import PACK_SEQ_LEN, q_pack_sequences

    t = q_pack_sequences(planted_docs_dir).to_pandas().sort_values("doc_id")
    n = t["n_tokens"].to_numpy()
    start = t["start_offset"].to_numpy()
    assert start[0] == 0
    assert (start[1:] == start[:-1] + n[:-1]).all()
    assert (t["seq_id"].to_numpy() == start // PACK_SEQ_LEN).all()
    last = (start + np.maximum(n, 1) - 1) // PACK_SEQ_LEN
    assert (t["n_seqs"].to_numpy() == last - t["seq_id"].to_numpy() + 1).all()


def test_semdedup_flags_planted_duplicate(ray_session, planted_docs_dir):
    """SemDeDup keeps the lowest-vec_id representative of the planted
    near-identical pair (7 ≈ 0) and nothing else is above the ε bar."""
    from pears_lite_ray.pipelines.similarity import q_semdedup

    t = q_semdedup(planted_docs_dir).to_pandas().set_index("vec_id").sort_index()
    assert len(t) == 40
    assert bool(t.loc[0, "keep"])
    assert not bool(t.loc[7, "keep"])            # dup of 0, higher id loses
    assert t.loc[0, "cluster"] == t.loc[7, "cluster"]
    assert int((~t["keep"]).sum()) == 1          # random 16-dim vecs stay


def test_dup_spans_oracle_parity(ray_session, planted_docs_dir):
    """Engine vs the DuckDB oracle on the planted-dup corpus: docs 0/1 are
    exact dups (full coverage), 2/3 near dups (partial), randoms mostly 0."""
    import duckdb

    from pears_lite_ray.pipelines.dedup import ORACLE_SQL, q_dup_spans

    out = (
        _tbl(q_dup_spans(planted_docs_dir))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(planted_docs_dir, 'documents.parquet')}'"
    )
    gold = (
        con.sql(ORACLE_SQL["dup_spans"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(out) == len(gold) == 30
    for c in ("n_tokens", "n_grams", "n_dup_grams", "covered_tokens"):
        assert (out[c].to_numpy() == gold[c].to_numpy()).all(), c
    assert np.allclose(out["dup_fraction"], gold["dup_fraction"])
    byid = out.set_index("doc_id")
    assert byid.loc[0, "covered_tokens"] == byid.loc[0, "n_tokens"] == 60
    assert byid.loc[1, "covered_tokens"] == 60          # exact dup: full span
    assert (byid.loc[4:, "n_dup_grams"] == 0).all()     # randoms untouched


def test_pii_scrub_redacts_and_matches_oracle(ray_session, tmp_path):
    """Planted PII corpus: redaction output + counts match the DuckDB RE2
    oracle byte-for-byte, and the placeholders land where expected."""
    import duckdb

    from pears_lite_ray.pipelines.textstats import ORACLE_SQL, q_pii_scrub

    texts = [
        "write to alice.b+spam@mail.example.org for details",
        "call +1 (415) 555-0100 or 020 7946 0958 today",
        "origin 192.0.2.17, proxy 10.0.0.1, contact ops@example.io",
        "clean document with digits 42 and no identifiers",
        "edge: a@b.cd next to 1.2.3.4.5.6.7.8 run",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        os.path.join(str(tmp_path), "documents.parquet"),
    )
    out = (
        _tbl(q_pii_scrub(str(tmp_path)))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(str(tmp_path), 'documents.parquet')}'"
    )
    gold = (
        con.sql(ORACLE_SQL["pii_scrub"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in ("clean_text", "n_emails", "n_ips", "n_phones"):
        assert (out[c].to_numpy() == gold[c].to_numpy()).all(), c
    byid = out.set_index("doc_id")
    assert "<EMAIL>" in byid.loc[0, "clean_text"]
    assert byid.loc[1, "clean_text"].count("<PHONE>") == 2
    assert byid.loc[2, "n_ips"] == 2 and byid.loc[2, "n_emails"] == 1
    assert byid.loc[3, "clean_text"] == texts[3]        # untouched


def test_kmeans_embed_matches_reference_and_deterministic(
    ray_session, planted_docs_dir
):
    """Distributed Lloyd's must equal a single-process reference run of the
    same fixed-point algorithm EXACTLY (integer accumulators make the
    reduce order-independent), at any parallelism."""
    from pears_lite_ray.pipelines.similarity import (
        KMEANS_ITERS,
        KMEANS_SCALE,
        _kmeans_assign,
        q_kmeans_embed,
    )

    k = 4
    out = (
        _tbl(q_kmeans_embed(planted_docs_dir, k=k))
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )

    emb = pq.read_table(os.path.join(planted_docs_dir, "embeddings.parquet"))
    ids = emb["vec_id"].to_numpy()
    mat = np.array(emb["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    cent = mat[:k].copy()
    for _ in range(KMEANS_ITERS):
        assign, _ = _kmeans_assign(mat, cent)
        qm = np.round(mat * KMEANS_SCALE).astype(np.int64)
        for c in range(k):
            members = qm[assign == c]
            if members.shape[0]:
                cent[c] = members.sum(axis=0) / (KMEANS_SCALE * members.shape[0])
    assign, d2 = _kmeans_assign(mat, cent)

    assert (out["vec_id"].to_numpy() == ids).all()
    assert (out["cluster"].to_numpy() == assign).all()
    ref_d2 = np.sign(d2) * np.floor(np.abs(d2) * 1e6 + 0.5) / 1e6
    assert (out["dist2"].to_numpy() == ref_d2).all()

    # bit-identical on a different block layout (forces different batching)
    out2 = (
        _tbl(q_kmeans_embed(planted_docs_dir, k=k))
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert out.equals(out2)


def test_asof_join_sorted_merge_and_ties(ray_session, tmp_path):
    """Crafted events: equal-ts clicks force the tie-break (max event_id),
    purchases before any click are dropped (inner as-of); full parity with
    the window-ranked SQL oracle."""
    import duckdb

    from pears_lite_ray.pipelines.events import ORACLE_SQL, q_asof_join

    us = 1_000_000
    rows = [
        # (event_id, ts_us, user_id, type, value)
        (0, 10 * us, 1, "purchase", 5.0),    # before any click -> dropped
        (1, 20 * us, 1, "click", 1.0),
        (2, 20 * us, 1, "click", 2.0),       # same ts -> id 2 wins ties
        (3, 30 * us, 1, "purchase", 7.0),    # matches click 2
        (4, 25 * us, 1, "view", 0.0),        # other types ignored
        (5, 20 * us, 2, "click", 3.0),
        (6, 20 * us, 2, "purchase", 9.0),    # ts equal -> click attaches
        (7, 40 * us, 2, "purchase", 1.5),    # same click, lag 20s
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
            }
        ),
        os.path.join(str(tmp_path), "events.parquet"),
    )
    out = (
        _tbl(q_asof_join(str(tmp_path)))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert out["event_id"].tolist() == [3, 6, 7]
    assert out["click_event_id"].tolist() == [2, 5, 5]
    assert out["lag_us"].tolist() == [10 * us, 0, 20 * us]

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{os.path.join(str(tmp_path), 'events.parquet')}'"
    )
    gold = (
        con.sql(ORACLE_SQL["asof_join"])
        .df()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    for c in out.columns:
        assert (out[c].to_numpy() == gold[c].to_numpy()).all(), c


def test_range_join_window_pairs(ray_session, tmp_path):
    """Crafted events: fan-out inside the window, exclusive lower / inclusive
    upper bounds, cross-user isolation; parity with the SQL oracle."""
    import duckdb

    from pears_lite_ray.pipelines.events import (
        ORACLE_SQL,
        RANGE_WINDOW_US,
        q_range_join,
    )

    w = RANGE_WINDOW_US
    rows = [
        (0, 0, 1, "error", 0.0),
        (1, 0, 1, "purchase", 1.0),        # same ts -> excluded (strict >)
        (2, 10, 1, "purchase", 1.0),       # in window
        (3, w, 1, "purchase", 1.0),        # boundary -> included (<=)
        (4, w + 1, 1, "purchase", 1.0),    # just outside
        (5, 5, 2, "purchase", 1.0),        # other user -> isolated
        (6, 2 * w, 1, "error", 0.0),       # second error, no purchases after
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
            }
        ),
        os.path.join(str(tmp_path), "events.parquet"),
    )
    out = (
        _tbl(q_range_join(str(tmp_path)))
        .to_pandas()
        .sort_values(["error_event_id", "purchase_event_id"])
        .reset_index(drop=True)
    )
    assert out["purchase_event_id"].tolist() == [2, 3]
    assert out["lag_us"].tolist() == [10, w]

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{os.path.join(str(tmp_path), 'events.parquet')}'"
    )
    gold = (
        con.sql(ORACLE_SQL["range_join"])
        .df()
        .sort_values(["error_event_id", "purchase_event_id"])
        .reset_index(drop=True)
    )
    for c in out.columns:
        assert (out[c].to_numpy() == gold[c].to_numpy()).all(), c


def test_source_stats_composition_report(ray_session, tmp_path):
    """Planted two-source corpus with a duplicated text: exact distinct
    counting through the partial-collapse shuffle, plus SQL-oracle parity."""
    import duckdb

    from pears_lite_ray.pipelines.textstats import ORACLE_SQL, q_source_stats

    texts = ["alpha bravo charlie", "alpha bravo charlie",
             "delta echo", "foxtrot golf hotel india"]
    srcs = ["web", "web", "web", "books"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(4), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * 4, pa.string()),
                "source": pa.array(srcs, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(str(tmp_path), "documents.parquet"),
    )
    out = (
        _tbl(q_source_stats(str(tmp_path)))
        .to_pandas()
        .sort_values(["source", "lang"])
        .reset_index(drop=True)
    )
    web = out[out.source == "web"].iloc[0]
    assert web["n_docs"] == 3 and web["n_unique_texts"] == 2
    assert abs(web["dup_fraction"] - (1 - 2 / 3)) < 1e-6
    assert out[out.source == "books"].iloc[0]["dup_fraction"] == 0.0

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(str(tmp_path), 'documents.parquet')}'"
    )
    gold = (
        con.sql(ORACLE_SQL["source_stats"])
        .df()
        .sort_values(["source", "lang"])
        .reset_index(drop=True)
    )
    for c in out.columns:
        assert (out[c].to_numpy() == gold[c].to_numpy()).all(), c


def test_value_quantiles_exact(ray_session, tmp_path):
    """Crafted counts: quantile = smallest value with rank >= ceil(q*n),
    verified against both a hand computation and the SQL oracle."""
    import duckdb

    from pears_lite_ray.pipelines.events import ORACLE_SQL, q_value_quantiles

    # type 'a': values 1..10 once each -> p50=5, p90=9, p99=10
    vals = [float(v) for v in range(1, 11)]
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(["a"] * 10, pa.string()),
                "value": pa.array(vals, pa.float64()),
            }
        ),
        os.path.join(str(tmp_path), "events.parquet"),
    )
    out = _tbl(q_value_quantiles(str(tmp_path))).to_pandas()
    assert out.iloc[0][["p50", "p90", "p99"]].tolist() == [5.0, 9.0, 10.0]

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{os.path.join(str(tmp_path), 'events.parquet')}'"
    )
    gold = con.sql(ORACLE_SQL["value_quantiles"]).df()
    for c in out.columns:
        assert (out[c].to_numpy() == gold[c].to_numpy()).all(), c


def test_unigram_logprob_self_lm(ray_session, tmp_path):
    """Hand-computed corpus unigram cross-entropy + SQL-oracle parity,
    including the empty-document (0 tokens -> 0.0 score) edge."""
    import math

    import duckdb

    from pears_lite_ray.pipelines.textstats import (
        ORACLE_SQL,
        q_unigram_logprob,
    )

    texts = ["aa aa bb", "aa cc", ""]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(3), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        os.path.join(str(tmp_path), "documents.parquet"),
    )
    out = (
        _tbl(q_unigram_logprob(str(tmp_path)))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # corpus counts: aa=3 bb=1 cc=1, total 5
    lp_aa, lp_rare = -math.log2(3 / 5), -math.log2(1 / 5)
    assert out["n_tokens"].tolist() == [3, 2, 0]
    assert abs(out["mean_neglogp"][0] - (2 * lp_aa + lp_rare) / 3) < 1e-6
    assert abs(out["mean_neglogp"][1] - (lp_aa + lp_rare) / 2) < 1e-6
    assert out["mean_neglogp"][2] == 0.0

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(str(tmp_path), 'documents.parquet')}'"
    )
    gold = (
        con.sql(ORACLE_SQL["unigram_logprob"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in out.columns:
        assert (out[c].to_numpy() == gold[c].to_numpy()).all(), c


def test_bigram_pmi_collocations(ray_session, tmp_path):
    """Hand-computed PMI on a planted collocation + SQL-oracle parity.
    Corpus: 'aa bb' x3 docs, 'aa cc'/'aa dd'/'aa ee' x1 -> only (aa,bb)
    clears the support floor; pmi = log2((3/6)/((6/12)*(3/12))) = 2.0."""
    import duckdb

    from pears_lite_ray.pipelines.textstats import ORACLE_SQL, q_bigram_pmi

    texts = ["aa bb", "aa bb", "aa bb", "aa cc", "aa dd", "aa ee"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        os.path.join(str(tmp_path), "documents.parquet"),
    )
    out = _tbl(q_bigram_pmi(str(tmp_path))).to_pandas()
    assert len(out) == 1
    assert out.iloc[0][["w1", "w2", "cnt"]].tolist() == ["aa", "bb", 3]
    assert out.iloc[0]["pmi"] == 2.0

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(str(tmp_path), 'documents.parquet')}'"
    )
    gold = con.sql(ORACLE_SQL["bigram_pmi"]).df()
    for c in out.columns:
        assert (out[c].to_numpy() == gold[c].to_numpy()).all(), c


def test_unigram_model_vocabulary_is_bounded(ray_session, tmp_path):
    """Plant a corpus whose open vocabulary far exceeds UNIGRAM_VOCAB_CAP
    and assert (a) the driver-side model never exceeds the cap — the
    100-TB OOM guard — and (b) the OOV-bucket scoring still matches the
    SQL oracle exactly."""
    import duckdb

    from pears_lite_ray.pipelines import textstats as ts

    rng = np.random.default_rng(7)
    n_docs, vocab = 40, ts.UNIGRAM_VOCAB_CAP * 3
    texts = [
        " ".join(
            f"w{v}" for v in rng.integers(0, vocab, size=200)
        )
        for _ in range(n_docs)
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n_docs), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        os.path.join(str(tmp_path), "documents.parquet"),
    )

    neglogp, oov, total = ts._unigram_model(str(tmp_path))
    assert len(neglogp) <= ts.UNIGRAM_VOCAB_CAP          # bounded pull
    assert oov > 0.0                                     # tail mass exists
    assert total == float(n_docs * 200)

    out = (
        _tbl(ts.q_unigram_logprob(str(tmp_path)))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(str(tmp_path), 'documents.parquet')}'"
    )
    gold = (
        con.sql(ts.ORACLE_SQL["unigram_logprob"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in out.columns:
        assert (out[c].to_numpy() == gold[c].to_numpy()).all(), c


def test_embedding_dups_gated_above_row_cap(ray_session):
    """The exact all-pairs op must refuse oversized corpora (O(N²) guard)
    and point at the sub-quadratic alternatives."""
    from pears_lite_ray.pipelines.similarity import q_embedding_dups

    sf = "/root/testdata/sf0.01"
    with pytest.raises(ValueError, match="O\\(N²\\).*semdedup"):
        q_embedding_dups(sf, row_cap=10)
    # under the cap the lazy dataset still constructs fine
    assert q_embedding_dups(sf) is not None


def test_decontam_bench_hash_cap(ray_session):
    """The broadcast benchmark-hash set is HARD-BOUNDED (r4 verdict #6):
    even on a corpus with 10× the synthetic sample density (mod 10 vs the
    default 97), the driver structure never exceeds the cap, truncation is
    deterministic (the cap smallest distinct hashes, any parallelism), and
    the under-cap path is byte-identical to the unbounded pull."""
    from pears_lite_ray.pipelines.textstats import (
        DECONTAM_NGRAM,
        _bench_hash_set,
    )

    sf = "/root/testdata/sf0.001"
    full, trunc = _bench_hash_set(sf, 10, DECONTAM_NGRAM)  # 10× density
    assert not trunc and full.size > 30
    cap = full.size // 3
    capped, trunc2 = _bench_hash_set(sf, 10, DECONTAM_NGRAM, cap=cap)
    assert trunc2
    assert capped.size == cap  # the driver structure stays ≤ the fixed cap
    assert np.array_equal(capped, np.sort(full)[:cap])  # smallest-distinct rule
    exact, trunc3 = _bench_hash_set(sf, 10, DECONTAM_NGRAM, cap=full.size)
    assert not trunc3 and np.array_equal(exact, full)


def test_stratified_split_hash_assignment(ray_session, tmp_path):
    """Split is a pure function of doc_id (reshard/reorder-proof), matches
    the splitmix64 formula and the DuckDB replica exactly."""
    import duckdb

    from pears_lite_ray.pipelines.common import mix64
    from pears_lite_ray.pipelines.textstats import (
        ORACLE_SQL,
        SPLIT_BUCKETS,
        SPLIT_TEST_LT,
        SPLIT_VALID_LT,
        q_stratified_split,
    )

    ids = np.arange(0, 4000, 7, dtype=np.int64)  # sparse, non-contiguous
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(["x"] * ids.size, pa.string()),
            }
        ),
        os.path.join(str(tmp_path), "documents.parquet"),
    )
    out = (
        _tbl(q_stratified_split(str(tmp_path)))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    exp_bucket = (mix64(ids.astype(np.uint64)) % np.uint64(SPLIT_BUCKETS)
                  ).astype(np.int64)
    assert out["bucket"].to_numpy().tolist() == exp_bucket.tolist()
    assert (
        (out["split"] == "test") == (out["bucket"] < SPLIT_TEST_LT)
    ).all()
    assert (
        (out["split"] == "valid")
        == ((out["bucket"] >= SPLIT_TEST_LT) & (out["bucket"] < SPLIT_VALID_LT))
    ).all()

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(str(tmp_path), 'documents.parquet')}'"
    )
    oracle = con.sql(ORACLE_SQL["stratified_split"]).df().sort_values(
        "doc_id").reset_index(drop=True)
    assert oracle["bucket"].tolist() == out["bucket"].tolist()
    assert oracle["split"].tolist() == out["split"].tolist()


def test_ccnet_buckets_per_language_tertiles(ray_session, tmp_path):
    """head/middle/tail are score-threshold tertiles PER LANGUAGE: bucket
    order follows the LM score, thresholds hit the ceil(n/3) ranks, and
    the DuckDB replica agrees row-for-row."""
    import duckdb

    from pears_lite_ray.pipelines.textstats import ORACLE_SQL, q_ccnet_buckets

    rng = np.random.RandomState(5)
    texts, langs = [], []
    common = "alpha beta gamma delta epsilon".split()
    for i in range(30):
        # rarer words → higher neglogp; vary the rare fraction per doc
        k = i % 10
        words = ["alpha"] * (10 - k) + [f"rare{i}_{j}" for j in range(k)]
        rng.shuffle(words)
        texts.append(" ".join(words) + " " + " ".join(common))
        langs.append("en" if i % 2 == 0 else "de")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(30), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
            }
        ),
        os.path.join(str(tmp_path), "documents.parquet"),
    )
    out = _tbl(q_ccnet_buckets(str(tmp_path))).to_pandas()
    assert len(out) == 30
    order = {"head": 0, "middle": 1, "tail": 2}
    for lang, g in out.groupby("lang"):
        g = g.sort_values("mean_neglogp")
        ranks = [order[b] for b in g["bucket"]]
        assert ranks == sorted(ranks)          # buckets follow the score
        n = len(g)
        n_head = (g["bucket"] == "head").sum()
        n_mid = (g["bucket"] == "middle").sum()
        assert n_head >= -(-n // 3) - 0        # threshold reaches ceil(n/3)
        assert n_head + n_mid >= -(-2 * n // 3)

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(str(tmp_path), 'documents.parquet')}'"
    )
    oracle = con.sql(ORACLE_SQL["ccnet_buckets"]).df().sort_values(
        "doc_id").reset_index(drop=True)
    mine = out.sort_values("doc_id").reset_index(drop=True)
    assert oracle["bucket"].tolist() == mine["bucket"].tolist()
    assert np.allclose(oracle["mean_neglogp"], mine["mean_neglogp"])


def test_driver_order_covers_every_entry():
    """The driver's gate records only the first 50 queries() entries, so
    every entry must have a DELIBERATE position in _DRIVER_ORDER — a new
    pipeline silently appended at the end would never be driver-verified."""
    from pears_lite_ray import pipelines

    q = pipelines.all_queries()
    order = pipelines._DRIVER_ORDER
    assert sorted(q) == sorted(order)
    assert list(q) == order  # dict order is exactly the declared order


def test_curate_composed_pipeline(ray_session, tmp_path):
    """curate = dedup winner ∧ gopher keep, with split + token count: the
    planted exact dup loses, the junk doc fails the gate, survivors carry
    the same split as stratified_split would assign."""
    import duckdb

    from pears_lite_ray.pipelines.curate import ORACLE_SQL, q_curate

    rng = np.random.RandomState(3)
    # gopher gate needs >=2 stopword hits; WORDS has none, so append some
    good = " ".join(rng.choice(WORDS, size=80)) + " the and of"
    texts = [good, good,                          # 0 wins, 1 is a dup
             "### ### ### ###",                   # 2 junk: symbols, short
             " ".join(rng.choice(WORDS, size=90)) + " the and is"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(4), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        os.path.join(str(tmp_path), "documents.parquet"),
    )
    out = _tbl(q_curate(str(tmp_path))).to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [0, 3]
    assert (out["n_tokens"] > 0).all()
    assert set(out["split"]) <= {"train", "valid", "test"}

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(str(tmp_path), 'documents.parquet')}'"
    )
    oracle = con.sql(ORACLE_SQL["curate"]).df().sort_values("doc_id")
    assert oracle["doc_id"].tolist() == out["doc_id"].tolist()
    assert oracle["split"].tolist() == out["split"].tolist()
    assert oracle["n_tokens"].tolist() == out["n_tokens"].tolist()
