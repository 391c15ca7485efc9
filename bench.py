#!/usr/bin/env python3
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

  python3 bench.py             # driver mode: per-query seconds + turns/sec
  python3 bench.py --scaling   # also run extraction at local[N] and
                               # local[4N] and report scaling efficiency

The headline metric is turns extracted/sec on a deterministic synthetic
transcripts table (sample PDF payloads + HTML + chat turns, incl. one
giant conversation for skew) — the BASELINE.json target metric.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# transcripts size scales with the sf dir so the bench saturates the cores
_SF_TURNS = {"sf0.001": (30, 60), "sf0.01": (60, 120), "sf0.1": (220, 400)}


def _bench_params() -> tuple[int, int]:
    name = os.path.basename(os.path.normpath(SF_DIR))
    return _SF_TURNS.get(name, (220, 400))


def build_bench_transcripts(spark):
    from pdfminer_spark.spark.fixtures import build_transcripts

    (n_convs, giant) = _bench_params()
    return build_transcripts(spark, n_convs=n_convs, giant_conv_turns=giant,
                             num_partitions=CPUS * 2)


def run_extraction(spark) -> tuple[float, int]:
    """Returns (seconds, n_turns)."""
    from pdfminer_spark.spark.pipeline import extract_transcripts

    df = build_bench_transcripts(spark).cache()
    n = df.count()  # materialize input outside the timed section
    t0 = time.time()
    out = extract_transcripts(df, page_numbers=[0], salt=16,
                              num_partitions=CPUS * 2)
    n_out = out.count()
    dt = time.time() - t0
    assert n_out == n
    df.unpersist()
    return (dt, n)


def run_headline_queries(spark) -> dict[str, float]:
    import __spark_entry__ as entry

    names = [
        "pricing_summary", "revenue_by_nation", "interval_self_join",
        "turn_ordering_window", "dedup_exact", "dedup_minhash",
        "token_count", "quality_score", "ann_cosine_topk",
        "embedding_near_dups", "media_features", "extract_documents",
    ]
    qs = entry.queries()
    out = {}
    for name in names:
        t0 = time.time()
        n = qs[name](spark, SF_DIR).count()
        out[name] = round(time.time() - t0, 3)
    return out


def fresh_session(cpus: int):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    from pdfminer_spark.spark.session import get_spark

    return get_spark("bench-%d" % cpus, cpus=cpus,
                     shuffle_partitions=max(cpus, 16))


def main() -> None:
    scaling = "--scaling" in sys.argv
    result: dict = {"sf": SF_DIR, "unit": "sec"}

    spark = fresh_session(CPUS)
    (extract_s, n_turns) = run_extraction(spark)
    queries = run_headline_queries(spark)
    queries["extract_turns"] = round(extract_s, 3)
    tps = n_turns / extract_s if extract_s else 0.0
    result.update({
        "metric": "turns_extracted_per_sec",
        "value": round(tps, 2),
        "n_turns": n_turns,
        "cpus": CPUS,
        "queries": queries,
    })

    if scaling:
        lo_cpus = max(CPUS // 4, 1)
        spark_lo = fresh_session(lo_cpus)
        (lo_s, n_lo) = run_extraction(spark_lo)
        tps_lo = n_lo / lo_s if lo_s else 0.0
        spark_hi = fresh_session(CPUS)
        (hi_s, n_hi) = run_extraction(spark_hi)
        tps_hi = n_hi / hi_s if hi_s else 0.0
        eff = tps_hi / (4.0 * tps_lo) if tps_lo else 0.0
        result["scaling"] = {
            "n_cpus": lo_cpus,
            "turns_per_sec_n": round(tps_lo, 2),
            "4n_cpus": CPUS,
            "turns_per_sec_4n": round(tps_hi, 2),
            "efficiency": round(eff, 3),
        }
        spark_hi.stop()
    else:
        spark.stop()

    print(json.dumps(result))


if __name__ == "__main__":
    main()
