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
