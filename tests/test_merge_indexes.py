"""S7 index union: two independently-built indexes merged == one index
built over the concatenated corpus (rank + score identical)."""

import os

import numpy as np
import pytest

from pears_lite_ray.config import BuildConfig
from pears_lite_ray.sources.fixtures import generate_queries, write_corpus


def test_union_equals_joint_build(ray_session, tmp_path_factory):
    from pears_lite_ray.index.build import build_index
    from pears_lite_ray.index.merge import merge_indexes
    from pears_lite_ray.query.engine import QueryEngine

    # two disjoint corpora (different seeds → different urls/doc_ids)
    import pyarrow as pa
    import pyarrow.parquet as pq

    ca = str(tmp_path_factory.mktemp("corpus_a"))
    cb = str(tmp_path_factory.mktemp("corpus_b"))
    pa_paths = write_corpus(ca, 120, n_files=2, seed=101)
    pb_paths = write_corpus(cb, 120, n_files=2, seed=202)
    # fixture urls depend only on the row index → remap corpus B onto its
    # own host space so the two corpora are genuinely disjoint
    for p in pb_paths:
        t = pq.read_table(p)
        urls = [u.replace("https://site", "https://bsite") for u in t["url"].to_pylist()]
        pq.write_table(t.set_column(0, "url", pa.array(urls, pa.string())), p)

    ia = str(tmp_path_factory.mktemp("idx_a"))
    ib = str(tmp_path_factory.mktemp("idx_b"))
    ij = str(tmp_path_factory.mktemp("idx_joint"))
    im = str(tmp_path_factory.mktemp("idx_merged"))
    build_index(pa_paths, BuildConfig(out_dir=ia))
    build_index(pb_paths, BuildConfig(out_dir=ib))
    build_index(pa_paths + pb_paths, BuildConfig(out_dir=ij))

    stats = merge_indexes(ia, ib, im)
    joint = QueryEngine(ij)
    merged = QueryEngine(im)
    assert stats["n_docs"] == joint.stats.n_docs
    assert stats["avgdl"] == pytest.approx(joint.stats.avgdl)

    queries = generate_queries()
    for q, k in zip(queries["query"].to_pylist(), queries["k"].to_pylist()):
        for wand in (False, True):
            dm, sm = merged.search_scores(q, int(k), use_wand=wand)
            dj, sj = joint.search_scores(q, int(k), use_wand=wand)
            assert dm.tolist() == dj.tolist(), (q, wand)
            assert np.allclose(sm, sj, atol=1e-12), (q, wand)

    # metadata lookups work against the unioned staging
    d, _ = merged.search_scores("village", 5)
    if d.size:
        meta = merged.docs.lookup(d)
        assert meta.num_rows == d.size


def test_union_rejects_mixed_tokenizers(ray_session, tmp_path_factory):
    from pears_lite_ray.index.build import build_index
    from pears_lite_ray.index.merge import merge_indexes

    c = str(tmp_path_factory.mktemp("corpus_c"))
    paths = write_corpus(c, 40, n_files=1, seed=7)
    i1 = str(tmp_path_factory.mktemp("idx_spm"))
    i2 = str(tmp_path_factory.mktemp("idx_rgx"))
    build_index(paths, BuildConfig(out_dir=i1))
    build_index(paths, BuildConfig(out_dir=i2, tokenizer="regex", vocab_path=None))
    with pytest.raises(ValueError, match="tokenizers"):
        merge_indexes(i1, i2, str(tmp_path_factory.mktemp("idx_bad")))


def test_union_shared_docs_and_tombstones(ray_session, tmp_path_factory):
    """Indexes sharing a corpus file: the union must count each distinct
    doc_id once in n_docs/total_postings; tombstones of either input carry
    into the merged index and keep masking results."""
    import pyarrow.parquet as pq

    from pears_lite_ray.index.build import build_index
    from pears_lite_ray.index.maintenance import delete_urls, load_tombstones
    from pears_lite_ray.index.merge import merge_indexes
    from pears_lite_ray.query.engine import QueryEngine
    from pears_lite_ray.sources.fixtures import HOT_TERM, write_corpus
    from pears_lite_ray.stages.extract import url_doc_id

    corpus = str(tmp_path_factory.mktemp("shared_corpus"))
    paths = write_corpus(corpus, 150, n_files=3, seed=404)
    f1, f2, f3 = paths

    ia = str(tmp_path_factory.mktemp("sidx_a"))
    ib = str(tmp_path_factory.mktemp("sidx_b"))
    ij = str(tmp_path_factory.mktemp("sidx_joint"))
    im = str(tmp_path_factory.mktemp("sidx_merged"))
    build_index([f1, f2], BuildConfig(out_dir=ia))
    build_index([f2, f3], BuildConfig(out_dir=ib))
    build_index([f1, f2, f3], BuildConfig(out_dir=ij))

    # tombstone one hot doc in index A before the merge
    eng_a = QueryEngine(ia)
    victim_url = eng_a.search(HOT_TERM, 1)["url"][0].as_py()
    victim_id = url_doc_id(victim_url)
    delete_urls(ia, [victim_url])

    stats = merge_indexes(ia, ib, im)
    joint = QueryEngine(ij)
    # shared f2 docs counted once (f2 rows are identical in both indexes)
    assert stats["n_docs"] == joint.stats.n_docs
    assert stats["avgdl"] == pytest.approx(joint.stats.avgdl)

    # tombstones carried: deleted doc never surfaces from the merged index
    assert victim_id in set(load_tombstones(im).tolist())
    merged = QueryEngine(im)
    docs, _ = merged.search_scores(HOT_TERM, 50)
    assert victim_id not in set(docs.tolist())
