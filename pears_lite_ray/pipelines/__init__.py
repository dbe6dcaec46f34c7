"""Operator pipelines exposed through ``__ray_entry__`` (driver contract).

Each module implements one SURVEY §2 capability family as Ray Data
pipelines over the driver's testdata tables, with DuckDB-oracle SQL where
the semantics are ANSI-SQL-expressible (column names match exactly — the
driver hashes values after sorting columns by name).
"""

from . import (
    dedup,
    events,
    extras,
    fulltext,
    similarity,
    sketches,
    textstats,
    weburl,
)

_MODULES = (fulltext, dedup, similarity, textstats, events, extras, sketches,
            weburl)


def all_queries():
    out = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return out


def all_oracle_sql():
    out = {}
    for m in _MODULES:
        out.update(m.ORACLE_SQL)
    return out
