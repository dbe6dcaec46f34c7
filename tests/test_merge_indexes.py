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


def test_union_conflicting_content_resolves_to_a(ray_session, tmp_path_factory):
    """A doc_id indexed in BOTH inputs with DIFFERENT content resolves to
    index A's version everywhere — postings, doclens, stats (round-2
    ADVICE: the old merge mixed A's postings with B-only-term postings for
    the conflicting doc). B re-indexes the same urls with content shifted
    by one row, so (almost) every shared doc conflicts; the merged index
    must score exactly like index A alone."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pears_lite_ray.index.build import build_index
    from pears_lite_ray.index.merge import merge_indexes
    from pears_lite_ray.query.engine import QueryEngine

    ca = str(tmp_path_factory.mktemp("conf_a"))
    paths = write_corpus(ca, 60, n_files=1, seed=31)
    ia = str(tmp_path_factory.mktemp("conf_idx_a"))
    build_index(paths, BuildConfig(out_dir=ia))

    # B: same urls, but content PERMUTED among the rows A actually indexed
    # (shifting only within the gate-passing set keeps B's doc set == A's,
    # so every shared doc conflicts and none is B-only)
    t = pq.read_table(paths[0])
    staged_urls = set(
        pq.read_table(os.path.join(ia, "staging"), columns=["url"])
        ["url"].to_pylist()
    )
    urls = t["url"].to_pylist()
    html = t["html"].to_pylist()
    text = t["text"].to_pylist()
    orig_html, orig_text = list(html), list(text)
    idx = [i for i, u in enumerate(urls) if u in staged_urls]
    assert len(idx) > 10
    for pos, i in enumerate(idx):
        j = idx[(pos + 1) % len(idx)]
        html[i], text[i] = orig_html[j], orig_text[j]
    t2 = t.set_column(t.schema.get_field_index("html"), "html",
                      pa.array(html, pa.binary()))
    t2 = t2.set_column(t2.schema.get_field_index("text"), "text",
                       pa.array(text, pa.string()))
    cb = str(tmp_path_factory.mktemp("conf_b"))
    pb = os.path.join(cb, "part.parquet")
    pq.write_table(t2, pb)

    ib = str(tmp_path_factory.mktemp("conf_idx_b"))
    im = str(tmp_path_factory.mktemp("conf_idx_m"))
    build_index([pb], BuildConfig(out_dir=ib))

    # the conflict set is broadcast to every term-merge task; a cap guards
    # the degenerate same-corpus-re-crawled shape where it is corpus-sized
    import pears_lite_ray.index.merge as merge_mod

    orig_cap = merge_mod.MERGE_CONFLICTS_CAP
    merge_mod.MERGE_CONFLICTS_CAP = 5
    try:
        with pytest.raises(ValueError, match="broadcast cap"):
            merge_indexes(ia, ib, im)
    finally:
        merge_mod.MERGE_CONFLICTS_CAP = orig_cap

    stats = merge_indexes(ia, ib, im)

    a = QueryEngine(ia)
    m = QueryEngine(im)
    assert stats["n_docs"] == a.stats.n_docs
    assert stats["avgdl"] == pytest.approx(a.stats.avgdl)
    queries = generate_queries()
    for q, k in zip(queries["query"].to_pylist(), queries["k"].to_pylist()):
        dm, sm = m.search_scores(q, int(k))
        da, sa_ = a.search_scores(q, int(k))
        assert dm.tolist() == da.tolist(), q
        assert np.allclose(sm, sa_, atol=1e-12), q
