"""CSV → document source (SURVEY S4 ↔ app/indexer/controllers.py:224-264).

Reference semantics, reimplemented: ';'-delimited CSV, utf-8 with
iso-8859-1 fallback; rows whose first cell is NaN are skipped; per row
``title = Source: <cell0> [<row#>]``, ``url = <source>#<title>``, the text
is ``"col: value. "`` per column with '/' spaced out. Output rows carry the
corpus schema so the PassthroughExtract → tokenize pipeline indexes them
unchanged (doctype ``csv``).

Row numbers must match the reference's sequential enumeration, so the file
is parsed driver-side with pyarrow.csv (spreadsheets are small) and handed
to Ray as one block — the downstream pipeline stays distributed.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.csv as pacsv


def read_csv_table(path: str) -> pa.Table:
    opts = pacsv.ParseOptions(delimiter=";")
    try:
        return pacsv.read_csv(path, parse_options=opts)
    except (pa.ArrowInvalid, UnicodeDecodeError):
        ro = pacsv.ReadOptions(encoding="iso-8859-1")
        return pacsv.read_csv(path, parse_options=opts, read_options=ro)


def csv_to_docs(path: str, lang: str = "en") -> pa.Table:
    """One corpus-schema row per CSV data row (url, warc_ts, title, text,
    lang, doctype)."""
    t = read_csv_table(path)
    source = os.path.basename(path)
    title_prefix = source.replace(".csv", "").title()
    columns = t.column_names
    urls, titles, texts = [], [], []
    cells = [t[c].to_pylist() for c in columns]
    for i in range(t.num_rows):
        first = cells[0][i]
        if first is None or first == "" or (
            isinstance(first, float) and first != first
        ):
            # empty/NaN first cell → skipped; pandas surfaces empty cells as
            # NaN, which the reference drops (controllers.py:247-248)
            continue
        title = f"{title_prefix}: {first} [{i}]"
        body = ""
        for c, col in zip(cells, columns):
            value = str(c[i]).replace("/", " / ")
            body += f"{col}: {value}. "
        urls.append(f"{source}#{title}")
        titles.append(title)
        texts.append(f"{title} {body}")
    n = len(urls)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array([0] * n, pa.timestamp("us")),
            "title": pa.array(titles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([lang] * n, pa.string()),
            "doctype": pa.array(["csv"] * n, pa.string()),
        }
    )


def read_csv_docs(path: str, lang: str = "en"):
    """→ ray.data.Dataset of document rows ready for the indexing pipeline."""
    import ray.data as rd

    return rd.from_arrow(csv_to_docs(path, lang))
