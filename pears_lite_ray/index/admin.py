"""Admin mutations on a built index: url rename (D3), pod delete /
unsubscribe (D2), shareable pod export (W6).

Reference semantics, re-expressed on the staging-parquet metadata store:

* rename (app/api/controllers.py:109-127): update the url of one doc in
  metadata; when the title equals the old url's basename it follows to the
  new basename. The reference keeps the vector row id; here the stable
  doc_id (hash of the ORIGINAL url) likewise never changes — a rename is a
  pure metadata rewrite of the affected staging fragments, postings are
  untouched.
* pod delete (app/api/controllers.py:34-51): tombstone every doc of the
  pod (the postings vanish from queries immediately and physically at the
  next compaction — our D1 delete path), then drop the pod's row from the
  pods table. The reference's "revert summary to 0 + delete row" collapses
  to the row drop: centroids live only in the pods table.
* export (app/orchard/mk_urls_file.py:16-25): one ``url;pod;lang`` line
  per doc of the pod, streamed from a pod-filtered projection scan —
  never materializes more than a batch.
"""

from __future__ import annotations

import os
from os.path import basename

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq


def _staging_fragments(index_dir: str):
    staging = os.path.join(index_dir, "staging")
    ds = pads.dataset(staging, format="parquet")
    return ds, list(ds.files)


def rename_url(index_dir: str, src: str, target: str) -> int:
    """Rename ``src`` → ``target`` in doc metadata; returns #rows updated.

    Only staging fragments that actually hold the url are rewritten (a
    fragment is one partition's file — the rewrite unit a 100 TB corpus
    needs; everything else is untouched)."""
    _, files = _staging_fragments(index_dir)
    src_name, target_name = basename(src), basename(target)
    updated = 0
    for f in files:
        t = pq.read_table(f)
        hit = pc.equal(t["url"], src)
        n_hit = int(pc.sum(hit).as_py() or 0)
        if not n_hit:
            continue
        mask = hit.to_numpy(zero_copy_only=False)
        urls = t["url"].to_pylist()
        titles = t["title"].to_pylist()
        for i in np.nonzero(mask)[0]:
            urls[i] = target
            # the reference follows the title only when it equals the
            # source basename (controllers.py:118-120)
            if titles[i] == src_name:
                titles[i] = target_name
        t = t.set_column(t.schema.get_field_index("url"), "url",
                         pa.array(urls, pa.string()))
        t = t.set_column(t.schema.get_field_index("title"), "title",
                         pa.array(titles, pa.string()))
        tmp = f + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, f)
        updated += n_hit
    return updated


def delete_pod(index_dir: str, pod: str) -> int:
    """Unsubscribe a pod: tombstone all its docs + drop its pods-table row.
    Returns the number of tombstoned docs. Postings are physically removed
    at the next ``compact`` (D1 semantics)."""
    from .maintenance import delete_doc_ids

    ds, _ = _staging_fragments(index_dir)
    t = ds.to_table(columns=["doc_id", "pod"],
                    filter=pc.equal(pc.field("pod"), pod))
    victims = np.unique(t["doc_id"].to_numpy())
    if victims.size:
        delete_doc_ids(index_dir, victims)

    pods_dir = os.path.join(index_dir, "pods")
    if os.path.isdir(pods_dir):
        pods_ds = pads.dataset(pods_dir, format="parquet")
        kept = pods_ds.to_table(filter=pc.not_equal(pc.field("pod"), pod))
        for f in list(pods_ds.files):
            os.remove(f)
        pq.write_table(kept, os.path.join(pods_dir, "pods.parquet"))
    return int(victims.size)


URL_LIST_COLS = ["doc_id", "url", "title", "pod", "lang", "doctype",
                 "doclen", "warc_ts"]
URL_SEARCH_COLS = ["url", "title", "doctype", "pod"]
URL_PAGE_SIZE = 100
POD_PAGE_SIZE = 50


def _head_by_url_key(t: pa.Table, k: int) -> pa.Table:
    """Rows of the ``k`` smallest DISTINCT (url, doc_id) keys, sorted by
    that key. The cut is a key boundary, so url-duplicate groups stay
    whole for later winner resolution."""
    t = t.sort_by([("url", "ascending"), ("doc_id", "ascending")])
    ids = t["doc_id"].to_numpy()
    first = np.r_[True, ids[1:] != ids[:-1]] if ids.size else np.empty(0, bool)
    starts = np.nonzero(first)[0]
    if starts.size <= k:
        return t
    return t.slice(0, int(starts[k]))


def list_urls(index_dir: str, search: str | None = None, page: int = 0,
              page_size: int = URL_PAGE_SIZE) -> pa.Table:
    """K7 batch analog of the Flask-Admin Urls listing
    (app/__init__.py:101-126 UrlsModelView): the metadata columns minus
    the heavy ones (vector/snippet excluded — column_exclude_list),
    substring search over url/title/doctype/pod (column_searchable_list),
    page_size 100. Pagination is a stable (url, doc_id) sort + slice.

    Never materializes the corpus on the driver: the search OR-filter and
    the tombstone mask are pushed into the columnar fragment scan, and the
    page is served from a streaming bounded top-K buffer (K = rows of the
    first ``(page+1)·page_size`` distinct url keys — the prune cut always
    lands on a key boundary so duplicate-url groups survive intact until
    the final winner resolution). Search is evaluated per staging row
    before winner resolution: a doc is listed if ANY of its crawl
    revisions matches, and the newest matching revision is displayed."""
    from .maintenance import load_tombstones
    from .segments import DocStore

    staging = os.path.join(index_dir, "staging")
    ds = pads.dataset(staging, format="parquet")
    names = set(ds.schema.names)
    cols = [c for c in URL_LIST_COLS if c in names]
    filt = None
    if search:
        for c in URL_SEARCH_COLS:
            if c in names:
                m = pc.match_substring(pc.field(c), search)
                filt = m if filt is None else filt | m
    dead = load_tombstones(index_dir)
    if dead.size:
        live = ~pc.field("doc_id").isin(pa.array(dead, pa.int64()))
        filt = live if filt is None else filt & live

    k = (page + 1) * page_size
    buf: pa.Table | None = None
    for batch in ds.scanner(columns=cols, filter=filt).to_batches():
        if batch.num_rows == 0:
            continue
        t = pa.Table.from_batches([batch])
        buf = t if buf is None else pa.concat_tables([buf, t])
        if buf.num_rows > 4 * k:
            buf = _head_by_url_key(buf, k)
    if buf is None:
        return pa.Table.from_batches(
            [], schema=pa.schema([ds.schema.field(c) for c in cols])
        )
    buf = _head_by_url_key(buf, k)
    buf = DocStore._resolve(buf)  # winner = (warc_ts desc, url asc)
    buf = buf.sort_by([("url", "ascending"), ("doc_id", "ascending")])
    return buf.slice(page * page_size, page_size)


def list_pods(index_dir: str, search: str | None = None, page: int = 0,
              page_size: int = POD_PAGE_SIZE) -> pa.Table:
    """K7 batch analog of PodsModelView (app/__init__.py:147-166): pods
    table minus the vector columns (column_exclude_list DS_vector /
    word_vector → centroid), name substring search, page_size 50."""
    t = pq.read_table(os.path.join(index_dir, "pods"))
    t = t.select([c for c in t.schema.names if c != "centroid"])
    if search:
        t = t.filter(pc.match_substring(t["pod"], search))
    t = t.sort_by([("pod", "ascending")])
    return t.slice(page * page_size, page_size)


def export_pod(index_dir: str, pod: str, out_path: str) -> int:
    """Shareable pod export: ``url;pod;lang`` per doc (W6). Returns #lines.
    Streams batch-by-batch from a pod-filtered projection scan."""
    ds, _ = _staging_fragments(index_dir)
    n = 0
    tmp = out_path + ".tmp"
    with open(tmp, "w") as f_out:
        scanner = ds.scanner(columns=["url", "pod", "lang"],
                             filter=pc.equal(pc.field("pod"), pod))
        for batch in scanner.to_batches():
            for url, lang in zip(batch["url"].to_pylist(),
                                 batch["lang"].to_pylist()):
                # ';' is legal in urls but is this format's field separator
                # (reference mk_urls_file.py writes it raw and corrupts the
                # line); percent-encode it so consumers can split on ';'
                f_out.write(f"{url.replace(';', '%3B')};{pod};{lang}\n")
                n += 1
    os.replace(tmp, out_path)
    return n
