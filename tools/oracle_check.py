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


def _canon(df: pd.DataFrame, round_floats: bool = True) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
        if round_floats and pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns), kind="mergesort",
                          na_position="last").reset_index(drop=True)


def _value_hash(df: pd.DataFrame) -> str:
    """Exact value-repr hash over the canonical frame — NO float rounding,
    NO dtype coercion. This is the bit-compatible analog of the driver's
    comparator: an int64 ``3`` hashes as ``'3'`` while a float64 ``3.0``
    hashes as ``'3.0'``, so a DuckDB HUGEINT that pandas materialized as
    float64 fails here even when values are numerically equal (the round-4
    ``line_filter``/``paragraph_dedup``/``minhash_recall_report`` bug the
    old ``check_dtype=False, atol=1e-6`` compare could not see)."""
    import hashlib

    canon = _canon(df, round_floats=False)
    h = hashlib.md5()
    for row in canon.itertuples(index=False, name=None):
        h.update("\x1f".join(str(v) for v in row).encode("utf-8", "replace"))
        h.update(b"\x1e")
    return h.hexdigest()


def compare_frames(sp: pd.DataFrame, du: pd.DataFrame) -> dict:
    """Driver-replica comparison of a Spark result vs a DuckDB oracle
    result. Strict: beyond the tolerance compare, numeric dtype KINDS
    must agree per column (int vs float) and the exact value-repr hashes
    must match. Returns a dict mirroring the driver's CORRECTNESS row."""
    cs, cd = _canon(sp), _canon(du)
    out = {
        "rows_match": len(cs) == len(cd),
        "schema_match": list(cs.columns) == list(cd.columns),
        "values_match": False,
        "kinds_match": False,
        "hash_match": False,
        "spark_rows": len(cs),
        "oracle_rows": len(cd),
        "detail": [],
    }
    if not out["rows_match"] or not out["schema_match"]:
        out["detail"] = [f"spark cols: {list(cs.columns)}",
                         f"duck  cols: {list(cd.columns)}"]
        return out
    try:
        pd.testing.assert_frame_equal(cs, cd, check_dtype=False,
                                      check_exact=False, rtol=0, atol=1e-6)
        out["values_match"] = True
    except AssertionError as exc:
        out["detail"] = str(exc).splitlines()[:6]
        return out
    kinds = [(c, cs[c].dtype.kind, cd[c].dtype.kind) for c in cs.columns]
    bad = [k for k in kinds if k[1] != k[2]]
    out["kinds_match"] = not bad
    if bad:
        out["detail"] = [f"dtype-kind mismatch {c}: spark={a} duck={b}"
                         for c, a, b in bad]
    hs, hd = _value_hash(sp), _value_hash(du)
    out["hash_match"] = hs == hd
    if out["kinds_match"] and not out["hash_match"]:
        out["detail"].append(f"value-repr hash mismatch: {hs} vs {hd}")
    return out


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
            r = compare_frames(sp, du)
            ok = (r["rows_match"] and r["schema_match"]
                  and r["values_match"] and r["kinds_match"]
                  and r["hash_match"])
            failures += 0 if ok else 1
            print(f"{name}: {'OK' if ok else 'FAIL'} "
                  f"rows={r['spark_rows']}/{r['oracle_rows']} "
                  f"schema={r['schema_match']} values={r['values_match']} "
                  f"kinds={r['kinds_match']} hash={r['hash_match']}")
            if not ok:
                for line in r["detail"]:
                    print("  " + line)
        except Exception as exc:
            failures += 1
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
