"""Pod routing (Q9): partition-column pods, centroid routing, top-3 /
all-pods fallback, and pod-restricted scoring."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from pears_lite_ray.index.pods import pod_of_url
from pears_lite_ray.sources.fixtures import HOT_TERM


@pytest.fixture(scope="module")
def pod_index(ray_session, small_corpus_dir, tmp_path_factory):
    from pears_lite_ray.config import BuildConfig
    from pears_lite_ray.index.build import build_index

    out = str(tmp_path_factory.mktemp("pod_idx"))
    paths = sorted(
        os.path.join(small_corpus_dir, f)
        for f in os.listdir(small_corpus_dir) if f.endswith(".parquet")
    )
    build_index(paths, BuildConfig(out_dir=out))
    return out


def test_pods_table_built(pod_index):
    t = pq.read_table(os.path.join(pod_index, "pods"))
    names = t["pod"].to_pylist()
    assert len(names) == len(set(names)) > 10  # ~50 url hosts in fixtures
    assert all(len(c) == 4096 for c in t["centroid"].to_pylist()[:3])
    # doc counts add up to corpus size
    from pears_lite_ray.index.segments import IndexStats

    stats = IndexStats(os.path.join(pod_index, "stats.json"))
    assert sum(t["n_docs"].to_pylist()) == stats.n_docs


def test_routing_contract(pod_index):
    from pears_lite_ray.query.engine import QueryEngine

    eng = QueryEngine(pod_index)
    routed = eng.route_pods(HOT_TERM)
    all_pods = eng.pod_router.names
    assert 1 <= len(routed) <= 3 or len(routed) == len(all_pods)
    # nonsense query hits no centroid → desperate fallback = ALL pods
    fallback = eng.route_pods("zzzzqqqq xxxyyy")
    assert len(fallback) == len(all_pods)


def test_pod_restricted_search(pod_index):
    from pears_lite_ray.query.engine import QueryEngine

    eng = QueryEngine(pod_index)
    all_docs, all_scores = eng.search_scores(HOT_TERM, 50)
    assert all_docs.size > 0
    meta = eng.docs.lookup(all_docs)
    pod_by_doc = dict(zip(meta["doc_id"].to_pylist(), meta["pod"].to_pylist()))
    chosen = sorted({pod_by_doc[int(d)] for d in all_docs[:5]})[:2]

    docs, scores = eng.search_scores(HOT_TERM, 50, pods=chosen)
    assert docs.size > 0
    meta2 = eng.docs.lookup(docs)
    assert set(meta2["pod"].to_pylist()) <= set(chosen)
    # scores of surviving docs unchanged vs unrestricted scoring
    lut = dict(zip(all_docs.tolist(), all_scores.tolist()))
    for d, s in zip(docs.tolist(), scores.tolist()):
        if d in lut:
            assert s == pytest.approx(lut[d], abs=1e-12)

    # restricting to ALL pods == unrestricted
    docs_all, scores_all = eng.search_scores(
        HOT_TERM, 50, pods=list(eng.pod_router.names)
    )
    assert docs_all.tolist() == all_docs.tolist()
    assert np.allclose(scores_all, all_scores, atol=0)


def test_pod_of_url():
    assert pod_of_url("https://site7.example/page/3") == "site7"
    assert pod_of_url("nonsense") == "home"


def test_pod_doc_counts_match_staging(pod_index):
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    from pears_lite_ray.index.pods import pod_doc_counts

    idx = pod_index
    counts = pod_doc_counts(idx)
    assert counts and all(v > 0 for v in counts.values())
    staging = pads.dataset(os.path.join(idx, "staging"))
    for pod, n in list(counts.items())[:5]:
        got = staging.to_table(
            columns=["doc_id"], filter=pc.equal(pc.field("pod"), pod)
        ).num_rows
        assert got == n, pod


def test_score_experts_matches_transcription(pod_index):
    """Q11 (reference app/search/score_pages.py:30-43): target doc vector
    vs every doc of the expert pod, cosine ≥ 0.05, top-k with urls —
    checked against a direct numpy transcription over the staged vectors."""
    from collections import Counter

    from pears_lite_ray.functions.vectorize import doc_vectors_batch
    from pears_lite_ray.index.segments import IndexStats
    from pears_lite_ray.query.neighbours import score_experts
    from pears_lite_ray.stages.extract import url_doc_id
    from pears_lite_ray.vocab import Vocab

    staging = pq.read_table(os.path.join(pod_index, "staging"),
                            columns=["doc_id", "url", "pod", "term_ids"])
    pods = staging["pod"].to_pylist()
    urls = staging["url"].to_pylist()
    expert_pod = Counter(pods).most_common(1)[0][0]
    target_url = next(u for u, p in zip(urls, pods) if p != expert_pod)
    target_id = url_doc_id(target_url)

    got = score_experts(pod_index, target_url, expert_pod=expert_pod, k=10)

    # transcription: cosine of the target's vector vs the pod's vectors,
    # 0.05 floor, dedup per doc_id (max cos), (cos desc, id asc) top-10
    stats = IndexStats(os.path.join(pod_index, "stats.json"))
    vocab = Vocab.load(stats.vocab_path)
    vecs = doc_vectors_batch(staging, vocab)
    ids = staging["doc_id"].to_numpy()
    tvec = vecs[ids == target_id][0]
    in_pod = np.array([p == expert_pod for p in pods])
    keep = in_pod & (ids != target_id)
    cid, ccos = ids[keep], vecs[keep] @ tvec
    thr = ccos >= 0.05
    cid, ccos = cid[thr], ccos[thr]
    order = np.lexsort((cid, -ccos))
    cid, ccos = cid[order], ccos[order]
    first = np.sort(np.unique(cid, return_index=True)[1])
    cid, ccos = cid[first], ccos[first]
    order = np.lexsort((cid, -np.round(ccos, 6)))[:10]
    assert got["doc_id"].to_pylist() == cid[order].tolist()
    assert np.allclose(got["cos"].to_numpy(), np.round(ccos[order], 6))
    # every returned url really is in the expert pod
    url_by_id = dict(zip(ids.tolist(), urls))
    for d, u in zip(got["doc_id"].to_pylist(), got["url"].to_pylist()):
        assert url_by_id[int(d)] == u


def test_score_unregistered_pods_matches_reference_transcription():
    """Q12 conformance: rank vs a literal transcription of the reference's
    score_pods/get_best_pods/output loop (score_pods.py:16-61), including
    the NaN→0 clamp, stable tie order, and length-mismatch→0 guard."""
    import numpy as np
    import pyarrow as pa

    from pears_lite_ray.functions.overlap import cosine_similarity
    from pears_lite_ray.index.pods import score_unregistered_pods

    rng = np.random.RandomState(5)
    n, dim = 30, 8
    vecs = [rng.randn(dim).tolist() for _ in range(n)]
    vecs[3] = [0.0] * dim                 # zero vector → NaN → 0
    vecs[7] = rng.randn(dim + 2).tolist() # length mismatch → 0.0
    vecs[11] = vecs[12] = [1.0] * dim     # exact tie → input order
    urls = [f"https://pod{i}.example" for i in range(n)]
    q = rng.randn(dim)

    # reference transcription (score → NaN clamp → stable sort → top-10)
    ds_scores = {}
    for u, v in zip(urls, vecs):
        ds_scores[u] = cosine_similarity(np.array(v), q)
    import math
    for u in ds_scores:
        if math.isnan(ds_scores[u]):
            ds_scores[u] = 0
    best = sorted(ds_scores, key=ds_scores.get, reverse=True)[:10]

    t = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "name": pa.array([f"pod {i}" for i in range(n)], pa.string()),
            "language": pa.array(["en"] * n, pa.string()),
            "description": pa.array([f"d{i}" for i in range(n)], pa.string()),
            "DS_vector": pa.array(vecs, pa.list_(pa.float64())),
        }
    )
    out = score_unregistered_pods(t, q)
    assert out["url"].to_pylist() == best
    assert out["name"].to_pylist() == [f"pod {urls.index(u)}" for u in best]
    assert out.num_rows == 10
