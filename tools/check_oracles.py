"""Local replica of the driver's correctness gate: run every queries() entry
and its oracle_sql() side-by-side on an sf dir, compare row count, sorted
column names and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [name ...]
Set CHECK_ORACLES_JSON=<path> to also write a driver-format JSON record
(one object per entry: rows/schema/hash match + row counts)."""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(result, rd.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    failures = 0
    record: dict[str, dict] = {}

    def rec(name, rows_match=None, schema_match=None, hash_match=None,
            mine_rows=None, oracle_rows=None, err=None):
        record[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": mine_rows,
            "oracle_rows": oracle_rows, "err": err,
        }

    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: engine raised {type(e).__name__}: {e}")
            rec(name, err=f"engine: {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in sqls:
            print(f"ok   {name}: rows-only ({len(mine)} rows)")
            rec(name, mine_rows=len(mine), err="no_oracle")
            continue
        try:
            oracle = canon(con.sql(sqls[name]).df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle SQL raised {type(e).__name__}: {e}")
            rec(name, mine_rows=len(mine), err=f"oracle: {type(e).__name__}: {e}")
            failures += 1
            continue
        if list(mine.columns) != list(oracle.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} != {list(oracle.columns)}")
            rec(name, schema_match=False, mine_rows=len(mine),
                oracle_rows=len(oracle))
            failures += 1
            continue
        if len(mine) != len(oracle):
            print(f"FAIL {name}: rows {len(mine)} != {len(oracle)}")
            rec(name, rows_match=False, schema_match=True,
                mine_rows=len(mine), oracle_rows=len(oracle))
            failures += 1
            continue
        bad = None
        for c in mine.columns:
            a, b = mine[c].to_numpy(), oracle[c].to_numpy()
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                same = np.allclose(a.astype(np.float64), b.astype(np.float64),
                                   rtol=0, atol=0, equal_nan=True)
            else:
                same = (a == b).all()
            if not same:
                bad = c
                break
        if bad:
            m = mine[bad].to_numpy()
            o = oracle[bad].to_numpy()
            diff = np.nonzero(~(m == o))[0][:3] if m.dtype == o.dtype else []
            print(f"FAIL {name}: column '{bad}' differs; first idx {list(diff)}")
            rec(name, rows_match=True, schema_match=True, hash_match=False,
                mine_rows=len(mine), oracle_rows=len(oracle))
            failures += 1
        else:
            print(f"ok   {name}: {len(mine)} rows match oracle exactly")
            rec(name, rows_match=True, schema_match=True, hash_match=True,
                mine_rows=len(mine), oracle_rows=len(oracle))

    out_json = os.environ.get("CHECK_ORACLES_JSON")
    if out_json:
        import json

        with open(out_json, "w") as f:
            json.dump(record, f, indent=2)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
