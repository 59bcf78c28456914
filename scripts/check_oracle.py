"""Local stand-in for the driver's correctness gate: runs every
``__spark_entry__.queries()`` entry at sf0.01 and compares row-count,
column set, and order-insensitive values against ``oracle_sql()`` in DuckDB.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from price_crawler_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {str(e).splitlines()[0][:160]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only check, rows={len(sdf)} "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {str(e).splitlines()[0][:160]}")
            n_fail += 1
            continue
        if sorted(sdf.columns) != sorted(ddf.columns):
            print(f"FAIL {name}: columns {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
            n_fail += 1
            continue
        if len(sdf) != len(ddf):
            print(f"FAIL {name}: rowcount {len(sdf)} vs {len(ddf)}")
            n_fail += 1
            continue
        a, b = norm(sdf), norm(ddf)
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False)
            print(f"ok   {name}: rows={len(a)} ({time.time()-t0:.1f}s)")
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch {str(e).splitlines()[-1][:160]}")
            n_fail += 1

    # entry() smoke
    try:
        res = entrymod.entry(spark)
        rows = res.collect()
        print(f"ok   entry(): rows={len(rows)} schema={[f.name for f in res.schema.fields]}")
    except Exception as e:
        print(f"FAIL entry(): {str(e).splitlines()[0][:200]}")
        n_fail += 1

    spark.stop()
    print(f"{'PASS' if n_fail == 0 else 'FAIL'}: {n_fail} failures")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
