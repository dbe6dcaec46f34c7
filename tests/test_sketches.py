"""Sketching / weighting operators: HyperLogLog distinct estimate (accuracy
+ register mergeability), DSIR importance weights (target/raw separation +
exact micro-nat arithmetic), TF-IDF keyword extraction (planted keywords,
tie-break)."""

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pears_lite_ray.pipelines import sketches
from pears_lite_ray.pipelines.common import tokenize_words
from pears_lite_ray.pipelines.sketches import (
    HLL_M,
    _hll_estimate,
    _hll_ranks,
    q_dsir_weights,
    q_hll_distinct,
    q_tfidf_keywords,
)


def _tbl(x) -> pa.Table:
    import ray.data as rd

    if isinstance(x, rd.Dataset):
        return pa.Table.from_pandas(x.to_pandas())
    return x


def _write_docs(dirpath, texts, langs=None, sources=None):
    n = len(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs or ["en"] * n, pa.string()),
                "source": pa.array(sources or ["s0"] * n, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(str(dirpath), "documents.parquet"),
    )
    return str(dirpath)


@pytest.fixture(scope="module")
def wide_vocab_dir(tmp_path_factory):
    """Two sources with known distinct vocabularies: sA uses 3000 distinct
    words, sB uses 400 — large enough that sA leaves HLL's linear-counting
    regime credibility zone and exercises the estimator properly."""
    rng = np.random.RandomState(7)
    vocab_a = [f"wa{i}" for i in range(3000)]
    vocab_b = [f"wb{i}" for i in range(400)]
    texts, sources = [], []
    for d in range(60):
        texts.append(" ".join(vocab_a[50 * d: 50 * (d + 1)]))
        sources.append("sA")
    for d in range(20):
        texts.append(" ".join(rng.choice(vocab_b, size=60)))
        sources.append("sB")
    d = tmp_path_factory.mktemp("hll")
    return _write_docs(d, texts, sources=sources), 3000, set(
        w for t in texts[60:] for w in t.split()
    )


def test_hll_estimate_within_error_bound(ray_session, wide_vocab_dir):
    sf_dir, n_a, vocab_b_used = wide_vocab_dir
    out = _tbl(q_hll_distinct(sf_dir))
    rows = {r["source"]: r for r in out.to_pylist()}
    # standard error is 1.04/sqrt(256) = 6.5%; allow 3 sigma
    est_a = rows["sA"]["hll_distinct"]
    assert abs(est_a - n_a) / n_a < 0.20, est_a
    est_b = rows["sB"]["hll_distinct"]
    assert abs(est_b - len(vocab_b_used)) / len(vocab_b_used) < 0.20, est_b


def test_hll_registers_merge_exactly(ray_session, wide_vocab_dir):
    """The distributed register state must equal a single-pass in-process
    sketch over the same tokens — merge (elementwise max) is lossless."""
    sf_dir, _, _ = wide_vocab_dir
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    regs = {}
    from pears_lite_ray.pipelines.common import word_hash_stream

    for text, src in zip(t["text"].to_pylist(), t["source"].to_pylist()):
        _, hashes = word_hash_stream([tokenize_words(text)])
        j, r = _hll_ranks(hashes)
        reg = regs.setdefault(src, np.zeros(HLL_M, dtype=np.int64))
        np.maximum.at(reg, j, r)
    out = {r["source"]: r for r in _tbl(q_hll_distinct(sf_dir)).to_pylist()}
    for src, reg in regs.items():
        assert out[src]["n_registers_set"] == int((reg > 0).sum())
        assert out[src]["ranksum"] == int(reg.sum())
        expect = _hll_estimate(reg)
        assert abs(out[src]["hll_distinct"] - expect) < 1e-6


def test_cms_overestimates_and_hits_heavy_hitters(ray_session, tmp_path):
    """Count-Min estimates are ≥ the true count always, and exact for a
    planted heavy hitter that dominates the table."""
    rng = np.random.RandomState(5)
    vocab = [f"v{i}" for i in range(30)]
    texts = ["heavy pair " * 50]  # 'heavy pair' ×50, 'pair heavy' ×49
    for _ in range(10):
        texts.append(" ".join(rng.choice(vocab, size=30)))
    sf_dir = _write_docs(tmp_path, texts)
    from pears_lite_ray.pipelines.sketches import q_cms_ngrams

    out = _tbl(q_cms_ngrams(sf_dir)).to_pylist()
    assert out, "top bigrams expected"
    by_gram = {r["bigram"]: r for r in out}
    assert by_gram["heavy pair"]["true_n"] == 50
    for r in out:
        assert r["cms_n"] >= r["true_n"]
    # 4×1024 cells vs ~300 distinct bigrams: the planted hitter is
    # overwhelmingly collision-free in at least one row
    assert by_gram["heavy pair"]["cms_n"] == 50


def test_bloom_decontaminate_no_false_negatives(ray_session, tmp_path):
    """Bloom flags ⊇ exact flags; benchmark docs flag themselves; clean
    docs with disjoint vocabulary stay clean (no collisions at this load)."""
    rng = np.random.RandomState(9)
    bench_text = " ".join(f"b{i}" for i in range(40))
    texts, ids = [], []
    texts.append(bench_text)                       # doc_id 0 → benchmark row
    leak = "x0 " + " ".join(f"b{i}" for i in range(10, 16)) + " x1"
    texts.append(leak)                             # shares 5-grams with bench
    for _ in range(8):
        texts.append(" ".join(rng.choice([f"c{i}" for i in range(40)], size=30)))
    d = tmp_path
    import pyarrow.parquet as pq_
    n = len(texts)
    pq_.write_table(
        pa.table(
            {
                # doc_id 0 ≡ 0 (mod 97) is the benchmark row
                "doc_id": pa.array(range(0, 300 * n, 300), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array(["s"] * n, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(str(d), "documents.parquet"),
    )
    from pears_lite_ray.pipelines.sketches import q_bloom_decontaminate

    out = {r["doc_id"]: r for r in _tbl(q_bloom_decontaminate(str(d))).to_pylist()}
    for r in out.values():
        assert r["n_bloom_hits"] >= r["n_hits"]
        if r["contaminated"]:
            assert r["bloom_contaminated"]
    assert out[0]["contaminated"] and out[0]["bloom_contaminated"]
    # doc 300 (doc_id 300 ≢ 0 mod 97... pick the leak row): index 1 → id 300
    assert out[300]["contaminated"], "leak doc shares benchmark 5-grams"
    clean = [r for i, r in out.items() if i >= 600]
    assert all(not r["contaminated"] for r in clean)


def test_dsir_separates_target_from_raw(ray_session, tmp_path):
    """Docs written purely in target-language vocabulary must score a
    higher importance weight than docs in disjoint non-target vocabulary."""
    rng = np.random.RandomState(3)
    tgt_vocab = [f"t{i}" for i in range(50)]
    oth_vocab = [f"o{i}" for i in range(50)]
    texts, langs = [], []
    for _ in range(20):
        texts.append(" ".join(rng.choice(tgt_vocab, size=40)))
        langs.append("en")
    for _ in range(20):
        texts.append(" ".join(rng.choice(oth_vocab, size=40)))
        langs.append("fr")
    sf_dir = _write_docs(tmp_path, texts, langs=langs)
    out = _tbl(q_dsir_weights(sf_dir)).to_pylist()
    w = {r["doc_id"]: r["dsir_logw"] for r in out}
    mean_tgt = np.mean([w[i] for i in range(20)])
    mean_oth = np.mean([w[i] for i in range(20, 40)])
    assert mean_tgt > 0 > mean_oth
    # integer micro-nats and the rounded double must agree exactly
    for r in out:
        assert r["dsir_logw"] == round(r["dsir_logw_u"] / 1e6, 6)


def test_dsir_weight_matches_inprocess_formula(ray_session, tmp_path):
    """Independent transcription of the DSIR formula for one document."""
    texts = ["apple banana apple", "cherry banana", "apple cherry cherry"]
    langs = ["en", "en", "fr"]
    sf_dir = _write_docs(tmp_path, texts, langs=langs)
    out = {r["doc_id"]: r for r in _tbl(q_dsir_weights(sf_dir)).to_pylist()}

    from pears_lite_ray.pipelines.common import word_hash_stream

    B = sketches.DSIR_BUCKETS
    n_raw, n_tgt = np.zeros(B, np.int64), np.zeros(B, np.int64)
    for text, lang in zip(texts, langs):
        _, h = word_hash_stream([tokenize_words(text)])
        b = (h % np.uint64(B)).astype(np.int64)
        np.add.at(n_raw, b, 1)
        if lang == "en":
            np.add.at(n_tgt, b, 1)
    r_tot, t_tot = int(n_raw.sum()), int(n_tgt.sum())

    def lam_u(b):
        v = math.log(((int(n_tgt[b]) + 1) / (t_tot + B))
                     / ((int(n_raw[b]) + 1) / (r_tot + B)))
        return int(np.rint(np.floor(abs(v) * 1e6 + 0.5) * np.sign(v)))

    _, h0 = word_hash_stream([tokenize_words(texts[0])])
    expect = sum(lam_u(int(b)) for b in (h0 % np.uint64(B)).astype(np.int64))
    assert out[0]["dsir_logw_u"] == expect
    assert out[0]["n_tokens"] == 3


def test_tfidf_planted_keywords_rank_first(ray_session, tmp_path):
    """A term unique to one doc and repeated there must be its top keyword;
    ubiquitous terms score idf=1 and lose."""
    common = "filler words shared by every document here"
    texts = [
        f"{common} zebra zebra zebra",
        f"{common} quasar quasar quasar quasar",
        f"{common} {common}",
    ]
    sf_dir = _write_docs(tmp_path, texts)
    out = _tbl(q_tfidf_keywords(sf_dir)).to_pylist()
    top = {r["doc_id"]: r["term"] for r in out if r["rank"] == 1}
    assert top[0] == "zebra"
    assert top[1] == "quasar"
    # doc 2 has only common terms; its top-1 is the alphabetically first
    # of the max-score ties (all tf=2, same idf)
    doc2 = sorted((r["rank"], r["term"]) for r in out if r["doc_id"] == 2)
    assert [t for _, t in doc2[:1]][0] == min(common.split())
    # ranks are 1..3 and scores non-increasing per doc
    for d in (0, 1, 2):
        rows = sorted((r["rank"], r["tfidf"]) for r in out if r["doc_id"] == d)
        assert [k for k, _ in rows] == [1, 2, 3]
        assert all(rows[i][1] >= rows[i + 1][1] for i in range(len(rows) - 1))


def test_quantile_sketch_exact_small_and_bounded_large(ray_session, tmp_path):
    """Small-bucket regime (every (type, bucket) holds <= S events): the
    sketch IS exact — equal to the exact-quantile operator. Large regime
    (one type, 8000 events in ~31 buckets): rank error of each estimate
    stays within N/S + #buckets."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pears_lite_ray.pipelines.events import q_value_quantiles
    from pears_lite_ray.pipelines.sketches import QSK_BUCKET, QSK_S, q_quantile_sketch

    def _t(x):
        import ray.data as rd

        return pa.Table.from_pandas(x.to_pandas()) if isinstance(x, rd.Dataset) else x

    # --- small regime: sparse event_ids (x16) put ~16 events in each
    # id-bucket, 8 per type — under S=32, so the sketch keeps every value
    n = 960
    rng = np.random.RandomState(7)
    small = tmp_path / "small"
    small.mkdir()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([i * 16 for i in range(n)], pa.int64()),
                "ts": pa.array(np.arange(n) * 1000, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "user_id": pa.array([i % 7 for i in range(n)], pa.int64()),
                "event_type": pa.array(
                    ["a" if i % 2 else "b" for i in range(n)], pa.string()
                ),
                "value": pa.array(
                    np.round(rng.exponential(40.0, n), 2), pa.float64()
                ),
            }
        ),
        os.path.join(str(small), "events.parquet"),
    )
    sk = _t(q_quantile_sketch(str(small))).to_pandas().sort_values("event_type")
    ex = _t(q_value_quantiles(str(small))).to_pandas().sort_values("event_type")
    assert (sk["n_events"].to_numpy() == ex["n_events"].to_numpy()).all()
    for a, b in (("p50_est", "p50"), ("p90_est", "p90"), ("p99_est", "p99")):
        assert (sk[a].to_numpy() == ex[b].to_numpy()).all(), (a, b)

    # --- large regime: rank-error bound
    n = 8000
    vals = np.round(rng.lognormal(3.0, 1.0, n), 2)
    large = tmp_path / "large"
    large.mkdir()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(np.arange(n) * 1000, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "user_id": pa.array([i % 7 for i in range(n)], pa.int64()),
                "event_type": pa.array(["x"] * n, pa.string()),
                "value": pa.array(vals, pa.float64()),
            }
        ),
        os.path.join(str(large), "events.parquet"),
    )
    sk = _t(q_quantile_sketch(str(large))).to_pandas()
    assert int(sk["n_events"].iloc[0]) == n
    svals = np.sort(vals)
    n_buckets = -(-n // QSK_BUCKET)
    bound = n // QSK_S + n_buckets
    import math

    for p, col in ((0.5, "p50_est"), (0.9, "p90_est"), (0.99, "p99_est")):
        est = float(sk[col].iloc[0])
        rank = int((svals <= est).sum())
        assert abs(rank - math.ceil(p * n)) <= bound, (p, rank, math.ceil(p * n))
