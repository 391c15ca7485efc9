#!/usr/bin/env python3
"""Isolated single-process scaling probe: bench extraction at ONE
parallelism level and print one JSON line. Run separately per level so
each measurement gets a fresh JVM (same-JVM session reuse skews results).

usage: python3 tools/scaling_probe.py <cpus> [n_turns]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cpus = int(sys.argv[1])
    n_turns = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
    from pdfminer_spark.spark.session import get_spark
    from pdfminer_spark.spark.fixtures import build_transcripts_scaled
    from pdfminer_spark.spark.pipeline import extract_transcripts

    spark = get_spark("probe-%d" % cpus, cpus=cpus,
                      shuffle_partitions=max(cpus, 16))
    # warmup: fork workers + load font/CMap resources once per worker
    warm = build_transcripts_scaled(spark, n_turns=cpus * 4,
                                    num_partitions=cpus)
    extract_transcripts(warm, page_numbers=[0], salt=4,
                        num_partitions=cpus).count()
    df = build_transcripts_scaled(spark, n_turns=n_turns,
                                  num_partitions=cpus * 4).cache()
    n = df.count()
    times: list[float] = []
    for _ in range(2):
        t0 = time.time()
        extract_transcripts(df, page_numbers=[0], salt=16,
                            num_partitions=cpus * 4).count()
        times.append(time.time() - t0)
    if abs(times[0] - times[1]) / min(times) > 0.15:
        # the two passes disagree -> a noise phase touched one of them;
        # one extra pass costs little and best-of-3 restores the signal
        t0 = time.time()
        extract_transcripts(df, page_numbers=[0], salt=16,
                            num_partitions=cpus * 4).count()
        times.append(time.time() - t0)
    best = min(times)
    print(json.dumps({"cpus": cpus, "n_turns": n, "sec": round(best, 2),
                      "tps": round(n / best, 1)}))
    spark.stop()


if __name__ == "__main__":
    main()
