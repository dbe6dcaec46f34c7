"""URL synthesis + canonicalization kernels (training-data web pipeline).

Web-scale corpora dedup on the CANONICAL form of a document's url before
any content pass (RefinedWeb §3.1 does strict url dedup; C4/CCNet cap or
reweight by registered domain). The testdata ``documents`` table carries no
url column, so — like the CSV / stego / multimodal entries — the input is
synthesized DETERMINISTICALLY from (doc_id, source) with the messy
variation real crawls exhibit (scheme mix, ``www.`` prefixes, host case,
tracking queries, fragments, trailing slashes), replicated exactly by the
DuckDB oracle.

All kernels are vectorized Arrow compute (``binary_join_element_wise`` for
assembly, anchored ``replace_substring_regex`` chains for normalization);
no per-row Python in the hot path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# noise rule moduli — the SQL oracles replicate these CASE-for-CASE
_SCHEME_MOD, _SCHEME_LT = 13, 7   # doc_id % 13 < 7  → https else http
_WWW_MOD = 3                      # doc_id % 3 == 0  → 'www.' prefix
_UPPER_MOD, _UPPER_RES = 7, 1     # doc_id % 7 == 1  → host uppercased
_PATH_MOD = 100                   # path key doc_id % 100 (collides ids ≡ mod 100)
_SLASH_MOD = 2                    # doc_id % 2 == 1  → trailing '/'
_QUERY_MOD, _QUERY_RES = 5, 2     # doc_id % 5 == 2  → '?utm_source=feed'
_FRAG_MOD, _FRAG_RES = 11, 3      # doc_id % 11 == 3 → '#top'

TLD = ".example.org"


def _where_str(mask: np.ndarray, yes: str, no: str) -> pa.Array:
    return pa.array(np.where(mask, yes, no), pa.string())


def synth_urls(doc_id: pa.Array | pa.ChunkedArray,
               source: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Deterministic messy url per (doc_id, source) row."""
    ids = (doc_id.combine_chunks() if isinstance(doc_id, pa.ChunkedArray)
           else doc_id).to_numpy()
    src = source.combine_chunks() if isinstance(source, pa.ChunkedArray) else source
    host = pc.binary_join_element_wise(src, pa.array([TLD] * len(ids)), "")
    host = pc.if_else(
        pa.array(ids % _UPPER_MOD == _UPPER_RES), pc.utf8_upper(host), host
    )
    parts = [
        _where_str(ids % _SCHEME_MOD < _SCHEME_LT, "https", "http"),
        pa.array(["://"] * len(ids)),
        _where_str(ids % _WWW_MOD == 0, "www.", ""),
        host,
        pa.array(["/p/"] * len(ids)),
        pa.array((ids % _PATH_MOD).astype(str), pa.string()),
        _where_str(ids % _SLASH_MOD == 1, "/", ""),
        _where_str(ids % _QUERY_MOD == _QUERY_RES, "?utm_source=feed", ""),
        _where_str(ids % _FRAG_MOD == _FRAG_RES, "#top", ""),
    ]
    return pc.binary_join_element_wise(*parts, "")


def canonicalize_urls(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Canonical url form: lowercase, fragment and query stripped, scheme
    unified to https, leading ``www.`` dropped, trailing slash removed.
    Order matters (slash strip must follow query/fragment strip); the SQL
    replica applies the same anchored regex chain in the same order."""
    u = pc.utf8_lower(urls)
    u = pc.replace_substring_regex(u, r"#.*$", "")
    u = pc.replace_substring_regex(u, r"\?.*$", "")
    u = pc.replace_substring_regex(u, r"^http://", "https://")
    u = pc.replace_substring_regex(u, r"^https://www\.", "https://")
    u = pc.replace_substring_regex(u, r"/$", "")
    return u.combine_chunks() if isinstance(u, pa.ChunkedArray) else u


def registered_domains(canonical: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Host part of a canonical url (scheme and path stripped)."""
    d = pc.replace_substring_regex(canonical, r"^https://", "")
    d = pc.replace_substring_regex(d, r"/.*$", "")
    return d.combine_chunks() if isinstance(d, pa.ChunkedArray) else d


# SQL replicas of the synthesis + normalization (string-identical rules)
SQL_SYNTH_URL = f"""
  (CASE WHEN doc_id % {_SCHEME_MOD} < {_SCHEME_LT} THEN 'https' ELSE 'http' END)
  || '://'
  || (CASE WHEN doc_id % {_WWW_MOD} = 0 THEN 'www.' ELSE '' END)
  || (CASE WHEN doc_id % {_UPPER_MOD} = {_UPPER_RES}
           THEN upper(source || '{TLD}') ELSE source || '{TLD}' END)
  || '/p/' || (doc_id % {_PATH_MOD})
  || (CASE WHEN doc_id % {_SLASH_MOD} = 1 THEN '/' ELSE '' END)
  || (CASE WHEN doc_id % {_QUERY_MOD} = {_QUERY_RES} THEN '?utm_source=feed' ELSE '' END)
  || (CASE WHEN doc_id % {_FRAG_MOD} = {_FRAG_RES} THEN '#top' ELSE '' END)
"""

SQL_CANONICALIZE = (
    "regexp_replace(regexp_replace(regexp_replace(regexp_replace("
    "regexp_replace(lower({url}), '#.*$', ''), '\\?.*$', ''), "
    "'^http://', 'https://'), '^https://www\\.', 'https://'), '/$', '')"
)
