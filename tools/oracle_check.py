#!/usr/bin/env python3
"""Local replica of the driver's Spark-vs-DuckDB oracle comparison.

Usage:
  python3 tools/oracle_check.py [query ...]      # default: all with oracles
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python3 tools/oracle_check.py

Mimics the driver: registers the sf parquet tables as DuckDB views, runs
each ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB,
canonicalizes (columns sorted by name, rows sorted by all columns), and
compares row count / schema / values.
"""
from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns), kind="mergesort",
                          na_position="last").reset_index(drop=True)


def main() -> int:
    import __spark_entry__ as entry
    from pdfminer_spark.spark.session import get_spark

    spark = get_spark("oracle-check", cpus=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = sys.argv[1:] or [n for n in qs if n in oracles]
    failures = 0
    for name in names:
        if name not in oracles:
            print(f"{name}: NO ORACLE (rows-only)")
            continue
        try:
            sp = qs[name](spark, SF_DIR).toPandas()
            du = con.execute(oracles[name]).fetchdf()
            cs, cd = _canon(sp), _canon(du)
            rows = len(cs) == len(cd)
            schema = list(cs.columns) == list(cd.columns)
            vals = False
            if rows and schema:
                try:
                    pd.testing.assert_frame_equal(
                        cs, cd, check_dtype=False, check_exact=False,
                        rtol=0, atol=1e-6)
                    vals = True
                except AssertionError as exc:
                    vals = False
                    detail = str(exc).splitlines()[:6]
            ok = rows and schema and vals
            failures += 0 if ok else 1
            print(f"{name}: {'OK' if ok else 'FAIL'} "
                  f"rows={len(cs)}/{len(cd)} schema={schema} values={vals}")
            if not ok:
                if not schema:
                    print(f"  spark cols: {list(cs.columns)}")
                    print(f"  duck  cols: {list(cd.columns)}")
                elif rows and not vals:
                    for line in detail:
                        print("  " + line)
        except Exception as exc:
            failures += 1
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
