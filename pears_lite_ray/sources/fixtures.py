"""Deterministic synthetic corpus fixtures (FIXTURES.md §1-2).

Generates the Common-Crawl-style input table of BASELINE.json ``input_hint``:
``(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)``.

The ``text`` column is the ground truth of what the reference extraction
computes on ``html`` (title + " " + kept-paragraph texts each followed by one
space; htmlparser.py:16-30,96 + mk_page_vector.py:50). Paragraphs are
constructed so their jusText classification is unambiguous:

* good:  ≥25 words alternating stopword/content → stop density ≥ 0.4,
  length > 100, no links;
* bad (nav): all text inside links → link_density 1.0;
* bad (filler): content-only words, no stopwords, length ≥ 30;
* short: < 30 chars, no links, surrounded by bad → revised bad.

Skew/conformance hooks: HOT_TERM in ~95% of docs; RARE_TERM in exactly 3
docs; PHRASE ("crystal lattice") adjacent in designated docs only. ~2% of
rows are duplicate urls with identical html (dedup exercise). ~6% of rows
are German and ~2% language-less gibberish — both rejected by the language
gate (htmlparser.py:105-108), so their ``text`` is "".

No wall-clock anywhere: timestamps are a fixed epoch base + i·Δ.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
HOT_TERM = "water"
RARE_TERM = "quasar"
PHRASE = ("crystal", "lattice")
RARE_DOC_COUNT = 3
EPOCH_BASE_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z

_STOP = (
    "the and of a to in is was for on with as it at by this that from are "
    "were be have had not but all"
).split()

_CONTENT = (
    "river mountain village harvest stone garden winter summer market bridge "
    "forest meadow castle valley shepherd wheat barley copper silver miller "
    "weaver potter smith tailor sailor captain voyage island harbor storm "
    "lantern candle parchment scroll ledger merchant caravan spice silk wool "
    "linen amber honey orchard apple cherry walnut falcon sparrow heron otter "
    "badger beaver salmon trout carp eagle raven temple chapel cloister abbey "
    "tower rampart moat gatehouse cellar granary stable forge anvil bellows "
    "loom spindle distaff quill inkwell vellum codex psalter chronicle annal "
    "treaty charter decree edict tithe toll ferry mill pond weir sluice canal"
).split()

_FILLER = (
    "zorblax quux fnord glitchspan vortexcore bitmask hexdump chunkset "
    "bytefold stackjam heapcrush loopgate forkbomb nullrange segfault "
    "regspill cachefault pipeburst threadknot lockspin"
).split()

_DE_TITLE_WORDS = "wasser garten strasse bericht und der die das".split()
_DE_WORDS = (
    "und der die das ist nicht mit von auf für eine wird auch nach bei wasser "
    "garten haus strasse bericht jahr stadt land zeit"
).split()


def _good_paragraph(rng: np.random.RandomState, inject: list[str]) -> str:
    """Alternating stopword/content words → unambiguous 'good'."""
    n = int(rng.randint(25, 45))
    words = []
    for k in range(n):
        if k % 2 == 0:
            words.append(_STOP[rng.randint(len(_STOP))])
        else:
            words.append(_CONTENT[rng.randint(len(_CONTENT))])
    if inject:
        # insert injected run at an even index, keeping first/last intact
        at = 2 * int(rng.randint(1, (n - len(inject)) // 2 - 1))
        words[at:at] = inject
    return " ".join(words)


def _nav_paragraph(rng: np.random.RandomState) -> str:
    links = "".join(
        f'<a href="/{w}">{w.capitalize()}</a> '
        for w in rng.choice(_CONTENT, size=4, replace=False)
    )
    return f'<div class="nav">{links}</div>'


def _filler_paragraph(rng: np.random.RandomState) -> str:
    words = [str(w) for w in rng.choice(_FILLER, size=int(rng.randint(8, 14)))]
    return "<div>" + " ".join(words) + "</div>"


def _short_paragraph() -> str:
    return "<p>All rights reserved</p>"


def make_doc(i: int, rng: np.random.RandomState, *, hot: bool, rare: bool,
             phrase: bool, lang: str) -> tuple[str, bytes, str]:
    """Returns (title, html_bytes, expected_text)."""
    if lang == "de":
        title = " ".join(str(w) for w in rng.choice(_DE_TITLE_WORDS, size=4))
        paras = [" ".join(str(w) for w in rng.choice(_DE_WORDS, size=20)) for _ in range(3)]
        body_html = "".join(f"<p>{p}</p>" for p in paras)
        html = (f"<html><head><title>{title}</title></head><body>{body_html}"
                "</body></html>").encode()
        return title, html, ""  # rejected by language gate → not indexed
    if lang == "xx":
        title = " ".join(str(w) for w in rng.choice(_FILLER, size=3))
        html = (f"<html><head><title>{title}</title></head><body><p>"
                + " ".join(str(w) for w in rng.choice(_FILLER, size=30))
                + "</p></body></html>").encode()
        return title, html, ""

    title = "Site notes " + " ".join(
        str(w) for w in rng.choice(_CONTENT, size=2, replace=False)
    ) + f" {i}"
    n_good = int(rng.randint(2, 5))
    goods: list[str] = []
    for g in range(n_good):
        inject: list[str] = []
        if g == 0 and hot:
            inject.extend([HOT_TERM])
        if g == 0 and rare:
            inject.extend([RARE_TERM])
        if g == min(1, n_good - 1) and phrase:
            inject.extend(list(PHRASE))
        goods.append(_good_paragraph(rng, inject))

    parts = ['<html><head><title>', title, "</title>",
             '<script>var x = "boiler";</script></head><body>']
    parts.append(_nav_paragraph(rng))
    expected: list[str] = []
    for g in goods:
        parts.append(f"<p>{g}</p>")
        expected.append(g + " ")
        if rng.random_sample() < 0.5:
            parts.append(_filler_paragraph(rng))
    parts.append(_short_paragraph())
    parts.append(_filler_paragraph(rng))
    parts.append("</body></html>")
    html = "".join(parts).encode()
    text = title + " " + "".join(expected)
    return title, html, text


def generate_corpus(n_docs: int, seed: int = SEED, n_hosts: int = 50) -> pa.Table:
    rng = np.random.RandomState(seed)
    # designated docs (en rows only, by index)
    lang_draw = rng.random_sample(n_docs)
    langs = np.where(lang_draw < 0.92, "en", np.where(lang_draw < 0.98, "de", "xx"))
    en_idx = np.nonzero(langs == "en")[0]
    rare_docs = set(en_idx[rng.choice(len(en_idx), size=min(RARE_DOC_COUNT, len(en_idx)), replace=False)])
    phrase_docs = set(en_idx[rng.choice(len(en_idx), size=max(2, len(en_idx) // 50), replace=False)])

    urls, tss, htmls, texts, out_langs = [], [], [], [], []
    for i in range(n_docs):
        lang = str(langs[i])
        hot = bool(rng.random_sample() < 0.95)
        _, html, text = make_doc(i, rng, hot=hot, rare=i in rare_docs,
                                 phrase=i in phrase_docs, lang=lang)
        urls.append(f"https://site{i % n_hosts}.example/page/{i}")
        tss.append(EPOCH_BASE_US + i * 1_000_000)
        htmls.append(html)
        texts.append(text)
        out_langs.append(lang)
        # ~2% duplicate urls with identical payload (dedup exercise, J3)
        if rng.random_sample() < 0.02:
            urls.append(urls[-1])
            tss.append(tss[-1] + 500_000)
            htmls.append(html)
            texts.append(text)
            out_langs.append(lang)

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(out_langs, pa.string()),
        }
    )


def write_corpus(out_dir: str, n_docs: int, n_files: int = 4, seed: int = SEED) -> list[str]:
    """Write the corpus as ``n_files`` parquet files (partition/resume tests)."""
    os.makedirs(out_dir, exist_ok=True)
    table = generate_corpus(n_docs, seed=seed)
    paths = []
    n = table.num_rows
    per = (n + n_files - 1) // n_files
    for f in range(n_files):
        chunk = table.slice(f * per, per)
        if chunk.num_rows == 0:
            break
        path = os.path.join(out_dir, f"corpus-{f:04d}.parquet")
        pq.write_table(chunk, path)
        paths.append(path)
    return paths


def generate_queries() -> pa.Table:
    """The reference query set (FIXTURES.md §2): DSL cases included."""
    rows = [
        (0, RARE_TERM, 10),                       # single rare term
        (1, HOT_TERM, 50),                        # hot term
        (2, f"{HOT_TERM} river", 10),             # conjunctive multi-term
        (3, " ".join(PHRASE), 10),                # phrase w/ subword continuation
        (4, "harvest stone garden", 10),
        (5, "the of and", 10),                    # empty-after-stopwords
        (6, "xylophone77 unknowntoken", 10),      # unknown tokens
        (7, "village market", 50),
        (8, "mountain", 10),
        (9, f"{RARE_TERM} {HOT_TERM}", 10),
    ]
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], pa.int32()),
            "query": pa.array([r[1] for r in rows], pa.string()),
            "k": pa.array([r[2] for r in rows], pa.int32()),
        }
    )


def corpus_cache_dir(n_docs: int, seed: int = SEED, root: str = "/tmp/pears_fixtures") -> str:
    """Generate-once cache for tests/bench: /tmp/pears_fixtures/n{N}-s{seed}.

    File count grows with the corpus (~2000 docs/file) so reads, staging
    waves and resume partitions keep useful parallelism at bench sizes.
    """
    d = os.path.join(root, f"n{n_docs}-s{seed}")
    marker = os.path.join(d, "_DONE")
    if not os.path.exists(marker):
        write_corpus(d, n_docs, n_files=max(4, n_docs // 2000), seed=seed)
        with open(marker, "w") as f:
            f.write("ok")
    return d
