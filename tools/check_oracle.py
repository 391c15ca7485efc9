#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark AND its oracle_sql() on DuckDB,
compare row count, column names, and an order-insensitive value hash.

Usage: python3 tools/check_oracle.py [sf_dir] [query ...]
"""
from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return ""
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return "%.6f" % v
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def frame_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    hashes = sorted(
        hashlib.md5(
            "\x1f".join(norm_cell(r[i]) for i in order).encode()
        ).hexdigest()
        for r in rows
    )
    return hashlib.md5("\n".join(hashes).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import duckdb

    import __spark_entry__ as entry
    from pdfminer_spark.spark.session import get_spark

    spark = get_spark("oracle-check", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    for (name, fn) in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows, cols={scols}")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}")
            failures += 1
            continue
        ok_count = len(srows) == len(drows)
        ok_cols = sorted(scols) == sorted(dcols)
        ok_hash = (frame_hash(scols, [tuple(r) for r in srows])
                   == frame_hash(dcols, drows))
        if ok_count and ok_cols and ok_hash:
            print(f"OK   {name}: {len(srows)} rows")
        else:
            failures += 1
            print(f"FAIL {name}: count={ok_count}({len(srows)}/{len(drows)}) "
                  f"cols={ok_cols} hash={ok_hash}")
            if not ok_cols:
                print("  spark:", sorted(scols))
                print("  duck :", sorted(dcols))
            if ok_count and ok_cols and not ok_hash and srows:
                sset = {tuple(norm_cell(v) for v in r) for r in
                        (tuple(x) for x in srows)}
                dset = {tuple(norm_cell(v) for v in r) for r in drows}
                extra_s = list(sset - dset)[:3]
                extra_d = list(dset - sset)[:3]
                print("  spark-only:", extra_s)
                print("  duck-only :", extra_d)
    spark.stop()
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
