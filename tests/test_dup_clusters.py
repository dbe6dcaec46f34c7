"""Connected components / near-dup cluster assignment (dup_clusters).

Conformance oracle: a plain union-find over the same edge list — the
alternating-star result must equal it exactly on every graph shape that
stresses the algorithm (chains force multi-round label propagation, stars
exercise the hub paths, random graphs catch order dependence).
"""

import numpy as np
import pyarrow as pa
import pytest

from test_pipelines import planted_docs_dir  # noqa: F401 (pytest fixture)


def _union_find(n_edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in n_edges:
        union(a, b)
    return {x: find(x) for x in list(parent)}


def _cc_labels(edges):
    """Run the distributed CC and reduce to one min-label per node."""
    import ray.data as rd

    from pears_lite_ray.pipelines.dedup import connected_components

    a = np.array([e[0] for e in edges], dtype=np.int64)
    b = np.array([e[1] for e in edges], dtype=np.int64)
    ds = rd.from_arrow(
        pa.table({"edge_a": pa.array(a), "edge_b": pa.array(b)})
    )
    # take_all, not to_pandas: Ray drops the column names of a 0-row Dataset
    # in the pandas conversion
    labels: dict[int, int] = {}
    for r in connected_components(ds, nparts=4).take_all():
        n, lab = int(r["node"]), int(r["label"])
        labels[n] = min(labels.get(n, lab), lab)
    return labels


@pytest.mark.parametrize(
    "edges",
    [
        [(i, i + 1) for i in range(12)],                   # one long chain
        [(0, v) for v in range(1, 9)],                     # star at the min
        [(9, v) for v in range(9)],                        # star at the MAX
        [(1, 2), (3, 4), (5, 6), (2, 3)],                  # merged chains
        [(5, 5), (1, 2)],                                  # self-loop dropped
    ],
)
def test_cc_matches_union_find(ray_session, edges):
    want = _union_find([(a, b) for a, b in edges if a != b])
    got = _cc_labels(edges)
    assert got == want


def test_cc_random_graphs_match_union_find(ray_session):
    rng = np.random.RandomState(7)
    for trial in range(3):
        n = 60
        m = 40 + trial * 20
        edges = [tuple(sorted(p)) for p in rng.randint(0, n, size=(m, 2))]
        edges = [e for e in edges if e[0] != e[1]]
        assert _cc_labels(edges) == _union_find(edges)


def test_cc_empty_edges(ray_session):
    assert _cc_labels([(0, 0)]) == {}   # only a self-loop -> no edges


def test_dup_clusters_transitive_chain(ray_session, planted_docs_dir):
    """Planted corpus: 0==1 exact, 2~0 (1-word edit), 3~2 — pairwise
    Jaccard(0,3) is below tau yet all four must share cluster 0 through
    transitivity; everything else is a singleton."""
    from pears_lite_ray.pipelines.dedup import q_dup_clusters

    out = (
        q_dup_clusters(planted_docs_dir)
        .to_pandas()
        .set_index("doc_id")["cluster_id"]
        .sort_index()
    )
    assert len(out) == 30
    assert list(out.loc[[0, 1, 2, 3]]) == [0, 0, 0, 0]
    assert (out.loc[4:] == out.index[4:]).all()


def test_dup_clusters_driver_and_distributed_paths_agree(
    ray_session, planted_docs_dir, monkeypatch
):
    """The bounded driver union-find (default at bench scale) and the
    above-cap distributed alternating-star loop label identically."""
    from pears_lite_ray.pipelines import dedup

    fast = (
        dedup.q_dup_clusters(planted_docs_dir)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    monkeypatch.setattr(dedup, "CC_DRIVER_EDGE_CAP", -1)  # force distributed
    slow = (
        dedup.q_dup_clusters(planted_docs_dir)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert fast.equals(slow)


def test_dup_clusters_oracle_parity(ray_session, planted_docs_dir):
    """Engine vs the DuckDB recursive-CTE oracle on the planted corpus."""
    import duckdb

    from pears_lite_ray.pipelines.dedup import ORACLE_SQL, q_dup_clusters

    got = (
        q_dup_clusters(planted_docs_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype("int64")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{planted_docs_dir}/documents.parquet')"
    )
    want = (
        con.execute(ORACLE_SQL["dup_clusters"])
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype("int64")
    )
    assert got.equals(want)
