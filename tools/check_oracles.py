"""Local replica of the driver's correctness gate: run every queries() entry
and its oracle_sql() side-by-side on an sf dir, compare row count, sorted
column names and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [name ...]
"""

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
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: engine raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in sqls:
            print(f"ok   {name}: rows-only ({len(mine)} rows)")
            continue
        try:
            oracle = canon(con.sql(sqls[name]).df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle SQL raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if list(mine.columns) != list(oracle.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} != {list(oracle.columns)}")
            failures += 1
            continue
        if len(mine) != len(oracle):
            print(f"FAIL {name}: rows {len(mine)} != {len(oracle)}")
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
            failures += 1
        else:
            print(f"ok   {name}: {len(mine)} rows match oracle exactly")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
