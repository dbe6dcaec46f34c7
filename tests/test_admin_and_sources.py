"""Round-2 parity additions: pseudo-XML source (S2), CSV hit aggregation
(K4), rename (D3), pod delete (D2), pod export (W6)."""

import os

import numpy as np
import pytest

from pears_lite_ray.config import BuildConfig


# -- S2: pseudo-XML <doc> corpus ---------------------------------------------

XML_SAMPLE = """<doc url="https://a.example/1" title="First Doc">
line one
line two
</doc>
<doc url="https://a.example/2" title="Second">
only line
</doc>
"""


def test_parse_doc_lines_matches_reference_protocol():
    from pears_lite_ray.sources.xmldocs import parse_doc_lines

    urls, titles, bodies = parse_doc_lines(XML_SAMPLE)
    assert urls == ["https://a.example/1", "https://a.example/2"]
    assert titles == ["First Doc", "Second"]
    # body lines each followed by one ' ' (controllers.py:210)
    assert bodies == ["line one line two ", "only line "]


def test_read_xml_docs_dataset(ray_session, tmp_path):
    from pears_lite_ray.sources.xmldocs import read_xml_docs

    p1 = tmp_path / "a.docs"
    p1.write_text(XML_SAMPLE)
    p2 = tmp_path / "b.docs"
    p2.write_text('<doc url="https://b.example/9" title="">\nbody b\n</doc>\n')
    t = read_xml_docs([str(p1), str(p2)]).to_pandas().sort_values("url")
    assert list(t["url"]) == [
        "https://a.example/1", "https://a.example/2", "https://b.example/9",
    ]
    assert t[t["url"] == "https://a.example/1"]["text"].iloc[0] == (
        "First Doc line one line two "
    )
    # empty title still joined with ' ' (mk_page_vector.py:82)
    assert t[t["url"] == "https://b.example/9"]["text"].iloc[0] == " body b "
    assert set(t["doctype"]) == {"doc"}


def test_xml_docs_index_end_to_end(ray_session, tmp_path):
    """S2 source → PassthroughExtract build → searchable index."""
    from pears_lite_ray.index.build import build_index
    from pears_lite_ray.query.engine import QueryEngine
    from pears_lite_ray.sources.xmldocs import read_xml_docs

    docfile = tmp_path / "corpus.docs"
    docs = "".join(
        f'<doc url="https://x.example/{i}" title="doc {i}">\n'
        f'papaya orchard number {i} with shared tokens\n</doc>\n'
        for i in range(20)
    )
    docfile.write_text(docs)
    src_dir = str(tmp_path / "xml_corpus")
    read_xml_docs([str(docfile)]).write_parquet(src_dir)
    srcs = sorted(
        os.path.join(src_dir, f) for f in os.listdir(src_dir)
        if f.endswith(".parquet")
    )
    out = str(tmp_path / "xml_idx")
    build_index(srcs, BuildConfig(out_dir=out, tokenizer="regex", vocab_path=None))
    eng = QueryEngine(out)
    res = eng.search("papaya orchard", 5)
    assert res.num_rows == 5
    assert all(u.startswith("https://x.example/") for u in res["url"].to_pylist())


# -- K4: CSV hit aggregation --------------------------------------------------

def test_aggregate_csv_matches_reference():
    from pears_lite_ray.query.aggregate import aggregate_csv

    best = [
        "https://plain.example/page",
        "inventory.csv#Inventory: apples [3]",
        "https://other.example/x",
        "inventory.csv#Inventory: pears [7]",
        "stock.csv#Stock: kiwi [0]",
    ]
    urls, csvs = aggregate_csv(best)
    assert urls == ["https://plain.example/page", "https://other.example/x"]
    assert csvs == [
        ["inventory.csv", "inventory.csv#Inventory: apples [3]", ["3", "7"]],
        ["stock.csv", "stock.csv#Stock: kiwi [0]", ["0"]],
    ]


def test_aggregate_csv_no_csv_hits():
    from pears_lite_ray.query.aggregate import aggregate_csv

    urls, csvs = aggregate_csv(["https://a/1", "https://a/2"])
    assert urls == ["https://a/1", "https://a/2"]
    assert csvs == []


# -- D2/D3/W6: admin ops on a built index -------------------------------------

@pytest.fixture(scope="module")
def admin_index(ray_session, tmp_path_factory):
    """Index over a small corpus; pods = url hosts (pod_of_url default)."""
    import pyarrow.parquet as pq

    from pears_lite_ray.index.build import build_index
    from pears_lite_ray.sources.fixtures import generate_corpus

    t = generate_corpus(60, seed=77)
    d = tmp_path_factory.mktemp("admin_corpus")
    src = os.path.join(str(d), "corpus.parquet")
    pq.write_table(t, src)
    out = str(tmp_path_factory.mktemp("admin_idx"))
    build_index([src], BuildConfig(out_dir=out))
    return out


def _pod_with_docs(index_dir: str) -> str:
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(index_dir, "pods"))
    names = t["pod"].to_pylist()
    counts = t["n_docs"].to_pylist()
    return max(zip(counts, names))[1]


def test_rename_url_updates_metadata_not_postings(admin_index):
    from pears_lite_ray.index.admin import rename_url
    from pears_lite_ray.query.engine import QueryEngine
    from pears_lite_ray.sources.fixtures import HOT_TERM

    eng = QueryEngine(admin_index)
    res = eng.search(HOT_TERM, 3)
    src = res["url"][0].as_py()
    doc = res["doc_id"][0].as_py()
    target = src + "-renamed"
    assert rename_url(admin_index, src, target) >= 1

    eng2 = QueryEngine(admin_index)  # fresh handles re-read staging
    res2 = eng2.search(HOT_TERM, 3)
    # same doc, same rank, same score — only the url string moved
    assert res2["doc_id"][0].as_py() == doc
    assert res2["url"][0].as_py() == target
    assert res2["score"][0].as_py() == res["score"][0].as_py()


def test_delete_after_rename_resolves_doc(admin_index):
    """D3 then D1: deleting by the NEW (user-visible) url must tombstone
    the doc even though its doc_id is the hash of the ORIGINAL url — the
    staging url→doc_id lookup in delete_urls catches renamed docs (round-2
    ADVICE: the plain hash silently no-opped)."""
    from pears_lite_ray.index.admin import rename_url
    from pears_lite_ray.index.maintenance import delete_urls
    from pears_lite_ray.query.engine import QueryEngine
    from pears_lite_ray.sources.fixtures import HOT_TERM

    eng = QueryEngine(admin_index)
    res = eng.search(HOT_TERM, 5)
    src = res["url"][1].as_py()
    doc = res["doc_id"][1].as_py()
    target = src + "-moved"
    assert rename_url(admin_index, src, target) >= 1

    tombs = delete_urls(admin_index, [target])
    assert doc in set(int(x) for x in tombs)
    eng2 = QueryEngine(admin_index)
    docs2, _ = eng2.search_scores(HOT_TERM, 50)
    assert doc not in docs2.tolist()


def test_delete_pod_tombstones_and_drops_row(admin_index):
    import pyarrow.parquet as pq

    from pears_lite_ray.index.admin import delete_pod
    from pears_lite_ray.index.maintenance import load_tombstones
    from pears_lite_ray.query.engine import QueryEngine
    from pears_lite_ray.sources.fixtures import HOT_TERM

    victim_pod = _pod_with_docs(admin_index)
    n = delete_pod(admin_index, victim_pod)
    assert n > 0
    assert load_tombstones(admin_index).size >= n
    pods_left = pq.read_table(os.path.join(admin_index, "pods"))["pod"].to_pylist()
    assert victim_pod not in pods_left and pods_left

    # no doc of the pod ever surfaces again
    import pyarrow.dataset as pads
    import pyarrow.compute as pc

    staging = pads.dataset(os.path.join(admin_index, "staging"))
    victim_ids = set(
        staging.to_table(columns=["doc_id"],
                         filter=pc.equal(pc.field("pod"), victim_pod))["doc_id"]
        .to_pylist()
    )
    assert victim_ids
    eng = QueryEngine(admin_index)
    docs, _ = eng.search_scores(HOT_TERM, 50)
    assert not (victim_ids & set(docs.tolist()))


def test_export_pod_lines(admin_index, tmp_path):
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    from pears_lite_ray.index.admin import export_pod

    pod = _pod_with_docs(admin_index)
    out = str(tmp_path / f"{pod}.pears.txt")
    n = export_pod(admin_index, pod, out)
    staging = pads.dataset(os.path.join(admin_index, "staging"))
    expect = staging.to_table(columns=["url", "lang"],
                              filter=pc.equal(pc.field("pod"), pod))
    assert n == expect.num_rows and n > 0
    lines = open(out).read().splitlines()
    assert len(lines) == n
    urls = {u for u in expect["url"].to_pylist()}
    for ln in lines[:5]:
        u, p, _lang = ln.split(";")
        assert p == pod and u in urls


def test_search_aggregated_csv_flow(ray_session, tmp_path):
    """CSV source → index → search_aggregated collapses spreadsheet hits
    (K4 end-to-end: csvdocs → build → bestURLs → aggregate_csv)."""
    import pyarrow.parquet as pq

    from pears_lite_ray.index.build import build_index
    from pears_lite_ray.query.engine import QueryEngine

    csv_path = tmp_path / "fruit.csv"
    rows = ["name;color;taste"]
    for i, (n, c, t) in enumerate(
        [("apple", "red", "sweet"), ("lime", "green", "sour"),
         ("plum", "purple", "sweet"), ("kiwi", "green", "tart")]
    ):
        rows.append(f"{n};{c};{t}")
    csv_path.write_text("\n".join(rows) + "\n")

    from pears_lite_ray.sources.csvdocs import csv_to_docs

    src = tmp_path / "csv_docs.parquet"
    pq.write_table(csv_to_docs(str(csv_path)), str(src))
    out = str(tmp_path / "csv_idx")
    build_index([str(src)], BuildConfig(out_dir=out, tokenizer="regex",
                                        vocab_path=None))
    eng = QueryEngine(out)
    res, csvs = eng.search_aggregated("green", 10)
    assert res.num_rows == 0                     # every hit was a CSV row
    assert len(csvs) == 1
    name, first_url, row_ids = csvs[0]
    assert name == "fruit.csv"
    assert first_url.startswith("fruit.csv#Fruit: ")
    assert sorted(row_ids) == ["1", "3"]         # lime [1], kiwi [3]


def test_find_pods_top10(admin_index):
    from pears_lite_ray.query.engine import QueryEngine
    from pears_lite_ray.sources.fixtures import HOT_TERM

    eng = QueryEngine(admin_index)
    pods = eng.find_pods(HOT_TERM, top=10)
    assert 0 < len(pods) <= 10
    assert len(set(pods)) == len(pods)


# -- M18 / K5 / Q6-Q8 small kernels -------------------------------------------

def test_extract_links_reference_semantics():
    from pears_lite_ray.text.links import extract_links

    html = (
        '<a href="https://abs.example/page">x</a>'
        "<a href='/rel/path'>y</a>"
        '<a href="https://abs.example/page#frag">z</a>'
        '<a href=bare.html>w</a>'
    )
    out = extract_links(html, "https://base.example/dir/cur.html")
    assert out == [
        "https://abs.example/page",                  # absolute, no fragment
        "https://base.example/rel/path",             # urljoin'd
        "https://abs.example/page#frag",             # fragment → re-joined
        "https://base.example/dir/bare.html",        # unquoted attr
    ]


def test_overlap_kernels():
    import numpy as np

    from pears_lite_ray.functions.overlap import (
        cosine_similarity,
        dice_overlap,
        score_url_overlap,
    )

    # Q6: character-set dice over the url's last path element
    assert score_url_overlap("abc", "https://x.example/path/cab/") == 1.0
    assert score_url_overlap("zzz", "https://x.example/abc") == 0.0
    # Q7: word-set dice, punctuation removed
    assert dice_overlap("the quick, fox!", "quick fox runs") == \
        2 * 2 / (3 + 3)
    # Q8: cosine with length-mismatch guard
    assert cosine_similarity(np.array([1.0, 0.0]), np.array([1.0])) == 0.0
    assert cosine_similarity(np.array([1.0, 0.0]), np.array([2.0, 0.0])) == 1.0


def test_assemble_csv_table(tmp_path):
    from pears_lite_ray.functions.presentation import assemble_csv_table

    p = tmp_path / "stock.csv"
    p.write_text("name;qty\napple;3\nlime;5\nplum;7\n")
    html = assemble_csv_table(str(p), ["0", "2"], "csv")
    assert html.startswith("<table class='table table-striped w-100'>")
    assert ">name</th>" in html and ">qty</th>" in html
    assert ">apple</td>" in html and ">plum</td>" in html
    assert ">lime</td>" not in html                  # row 1 not selected
    # map doctype adds the pin column from (lat, lon)
    p2 = tmp_path / "spots.csv"
    p2.write_text("lat;lon;name\n48.1;11.5;muc\n")
    html2 = assemble_csv_table(str(p2), ["0"], "map")
    assert "openstreetmap.org/#map=19/48.1/11.5" in html2
    assert ">www</th>" in html2


def test_read_bookmarks_matches_reference_walk(tmp_path):
    """S3 (app/utils.py:86-102): Netscape bookmarks export — links filed
    under the keyword folder (case-insensitive), folder = most recent
    <h3> in the flat <dt> walk."""
    from pears_lite_ray.sources.bookmarks import bookmarks_table, read_bookmarks

    doc = """<!DOCTYPE NETSCAPE-Bookmark-file-1>
<TITLE>Bookmarks</TITLE><H1>Bookmarks</H1>
<DL><p>
  <DT><H3>Research</H3>
  <DL><p>
    <DT><A HREF="https://a.example/paper">Paper A</A>
    <DT><A HREF="https://b.example/blog">Blog B</A>
  </DL><p>
  <DT><H3>Cooking</H3>
  <DL><p>
    <DT><A HREF="https://c.example/recipe">Recipe C</A>
  </DL><p>
</DL><p>"""
    p = tmp_path / "bookmarks.html"
    p.write_text(doc)

    assert read_bookmarks(str(p), "research") == [
        "https://a.example/paper", "https://b.example/blog"
    ]
    assert read_bookmarks(str(p), "COOKING") == ["https://c.example/recipe"]
    assert read_bookmarks(str(p), "nope") == []

    t = bookmarks_table(str(p))
    assert t.num_rows == 3
    assert t["pod"].to_pylist() == ["Research", "Research", "Cooking"]
    assert t["title"].to_pylist() == ["Paper A", "Blog B", "Recipe C"]


# -- S8: steganographic CSV-in-PNG pod reader --------------------------------

POD_CSV = (
    "0;https://x.example/a;Alpha Doc;snippet alpha text;0.1|0.2;the:3 café:1;True\n"
    "1;https://x.example/b;Beta;snippet beta;0.3|0.4;beta:2;False\n"
)


def test_stego_png_round_trip(tmp_path):
    """encode → decode is identity (multi-row image, '\\n' padding, chars
    above 255 split across channels like the reference decode expects)."""
    from pears_lite_ray.sources.stegopng import decode_stego_csv, encode_stego_csv

    text = POD_CSV + "high codepoint: ȷ˽\n"  # 567, 765
    p = str(tmp_path / "pod.png")
    encode_stego_csv(p, text, width=16)
    decoded = decode_stego_csv(p)
    assert decoded.startswith(text)
    # padding is blank-line only
    assert decoded[len(text):].strip("\n") == ""


def test_png_unfilter_sub_up_average_paeth(tmp_path):
    """The reader handles all five scanline filters (a PIL/third-party
    encoder may emit any): build one PNG per filter type by hand and check
    the de-filtered pixels."""
    import struct
    import zlib

    import numpy as np

    from pears_lite_ray.sources.stegopng import _chunk, _PNG_SIG, read_png_pixels

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(4, 5, 3), dtype=np.uint8)

    def filtered(ftype: int) -> bytes:
        rows = []
        prev = np.zeros(5 * 3, dtype=np.int16)
        for y in range(4):
            cur = px[y].reshape(-1).astype(np.int16)
            left = np.concatenate([[0, 0, 0], cur[:-3]])
            upleft = np.concatenate([[0, 0, 0], prev[:-3]])
            if ftype == 0:
                enc = cur
            elif ftype == 1:
                enc = cur - left
            elif ftype == 2:
                enc = cur - prev
            elif ftype == 3:
                enc = cur - ((left + prev) >> 1)
            else:
                p = left + prev - upleft
                pred = np.where(
                    (abs(p - left) <= abs(p - prev))
                    & (abs(p - left) <= abs(p - upleft)),
                    left,
                    np.where(abs(p - prev) <= abs(p - upleft), prev, upleft),
                )
                enc = cur - pred
            rows.append(bytes([ftype]) + (enc & 0xFF).astype(np.uint8).tobytes())
            prev = cur
        return b"".join(rows)

    for ftype in range(5):
        path = str(tmp_path / f"f{ftype}.png")
        ihdr = struct.pack(">IIBBBBB", 5, 4, 8, 2, 0, 0, 0)
        with open(path, "wb") as f:
            f.write(_PNG_SIG)
            f.write(_chunk(b"IHDR", ihdr))
            f.write(_chunk(b"IDAT", zlib.compress(filtered(ftype))))
            f.write(_chunk(b"IEND", b""))
        out = read_png_pixels(path)
        assert np.array_equal(out, px), f"filter {ftype}"


def test_stego_docs_parse_and_dataset(ray_session, tmp_path):
    from pears_lite_ray.sources.stegopng import (
        encode_stego_csv,
        parse_pod_csv,
        read_stego_docs,
    )

    p = str(tmp_path / "pod.png")
    encode_stego_csv(p, POD_CSV, width=32)

    t = parse_pod_csv(POD_CSV)
    assert t["url"].to_pylist() == ["https://x.example/a", "https://x.example/b"]
    assert t["title"].to_pylist() == ["Alpha Doc", "Beta"]
    assert t["cc"].to_pylist() == [True, False]
    assert t["freqs"].to_pylist()[0] == "the:3 café:1"

    docs = read_stego_docs(p).to_pandas()
    assert list(docs.columns) == ["url", "warc_ts", "title", "text", "lang", "doctype"]
    assert docs["text"].tolist() == ["snippet alpha text", "snippet beta"]
    assert set(docs["doctype"]) == {"pod"}


def test_term_cosine_reference_semantics():
    """Q8 transcription check: hand-computed sparse cosine + coverage,
    malformed serialized elements skipped, zero-side → NaN cosine."""
    import math

    import numpy as np

    from pears_lite_ray.functions.overlap import _string_to_dict, term_cosine

    assert _string_to_dict("a:2 b:1 :3 c: d 4 e:5 ") == {
        "a": "2", "b": "1", "e": "5"
    }

    # q has 2 words; d1={a:2,b:1}, d2="a:1 c:3" → overlap {a} → coverage 1/2
    cos, cov = term_cosine("hello world", {"a": 2, "b": 1}, "a:1 c:3")
    v1 = np.array([2.0, 1.0, 0.0])  # dims a,b,c
    v2 = np.array([1.0, 0.0, 3.0])
    v1 /= np.linalg.norm(v1)
    v2 /= np.linalg.norm(v2)
    assert cos == pytest.approx(float(np.dot(v1, v2)))
    assert cov == 0.5

    cos0, cov0 = term_cosine("one", {"a": 1}, "")
    assert math.isnan(cos0)        # zero doc side → NaN, like the reference
    assert cov0 == 0.0


# -- K7 batch analog: admin listings ------------------------------------------

def test_list_urls_pagination_and_search(admin_index):
    from pears_lite_ray.index.admin import URL_LIST_COLS, list_urls

    page0 = list_urls(admin_index, page_size=10)
    assert page0.num_rows == 10
    assert set(page0.schema.names) <= set(URL_LIST_COLS)
    assert "snippet" not in page0.schema.names  # column_exclude_list
    urls0 = page0["url"].to_pylist()
    assert urls0 == sorted(urls0)
    page1 = list_urls(admin_index, page=1, page_size=10)
    assert page1["url"].to_pylist()[0] >= urls0[-1]
    assert not set(page1["doc_id"].to_pylist()) & set(page0["doc_id"].to_pylist())

    # substring search narrows over url/title/doctype/pod
    needle = urls0[0].split("//")[1][:6]
    hits = list_urls(admin_index, search=needle, page_size=1000)
    assert 0 < hits.num_rows
    assert all(
        needle in (r["url"] or "") or needle in (r["title"] or "")
        or needle in (r["doctype"] or "") or needle in (r["pod"] or "")
        for r in hits.to_pylist()
    )


def test_list_urls_bounded_topk_matches_full_sort(admin_index):
    from pears_lite_ray.index.admin import list_urls

    full = list_urls(admin_index, page_size=10_000)  # k ≫ corpus: no prune
    for page, ps in [(0, 7), (1, 7), (3, 7), (8, 7), (0, 1)]:
        got = list_urls(admin_index, page=page, page_size=ps)
        assert got.to_pylist() == full.slice(page * ps, ps).to_pylist()


def test_head_by_url_key_cuts_on_key_boundary():
    import pyarrow as pa

    from pears_lite_ray.index.admin import _head_by_url_key

    t = pa.table({
        "url": ["b", "a", "a", "c", "b"],
        "doc_id": pa.array([2, 1, 1, 3, 2], pa.int64()),
        "warc_ts": pa.array([10, 11, 12, 13, 14], pa.int64()),
    })
    out = _head_by_url_key(t, 2)
    # both rows of each of the 2 smallest keys survive — groups stay whole
    assert out["url"].to_pylist() == ["a", "a", "b", "b"]
    assert _head_by_url_key(t, 99).num_rows == 5


def test_list_pods_excludes_vectors(admin_index):
    from pears_lite_ray.index.admin import list_pods

    pods = list_pods(admin_index)
    assert pods.num_rows > 0
    assert "centroid" not in pods.schema.names
    names = pods["pod"].to_pylist()
    assert names == sorted(names)


def test_list_urls_hides_tombstoned_pod(admin_index):
    from pears_lite_ray.index.admin import delete_pod, list_pods, list_urls

    pod = _pod_with_docs(admin_index)
    before = list_urls(admin_index, page_size=10_000)
    assert pod in set(before["pod"].to_pylist())
    delete_pod(admin_index, pod)
    after = list_urls(admin_index, page_size=10_000)
    assert pod not in set(after["pod"].to_pylist())
    assert pod not in set(list_pods(admin_index)["pod"].to_pylist())
