#!/usr/bin/env python3
"""Empirical capacity probe for the three LSH-style pair generators:
synthesize random corpora at growing n and measure candidate rate
(candidates / C(n,2)). The scale claims say the RATE is ~n-independent
for random data (sign-LSH ~T/2^r, Manku keys ~20/2^31, MinHash bands
~J^4-gated) — so candidates grow like rate*n^2, never faster. This
probe checks that flatness directly instead of trusting the algebra.

    python3 tools/capacity_probe.py [sizes...]   # default 2000 8000

Writes one JSON line per (generator, n).
"""
from __future__ import annotations

import json
import os
import random
import sys
import tempfile

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [2000, 8000]
    from pdfminer_spark.ops.similarity import ann_lsh_pairs
    from pdfminer_spark.ops.textops import (_simhash_candidates,
                                        substring_dup_pairs)
    from pdfminer_spark.spark.session import get_spark

    spark = get_spark("capacity-probe", cpus=16, shuffle_partitions=32)
    rng = np.random.RandomState(11)
    pyrng = random.Random(11)
    for n in sizes:
        pairs = n * (n - 1) / 2
        d = tempfile.mkdtemp()
        # random embeddings: the worst case for sign-LSH (no structure)
        pd.DataFrame({
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [rng.randn(64).astype(np.float32).tolist()
                          for _ in range(n)],
            "label": (np.arange(n) % 10).astype(np.int32),
        }).to_parquet(d + "/embeddings.parquet")
        lsh = ann_lsh_pairs(spark, d).count()
        print(json.dumps({"gen": "sign_lsh_16x16", "n": n,
                          "candidates": lsh,
                          "rate": round(lsh / pairs, 8)}))
        # random 64-bit fingerprints: worst case for the Manku key join
        fps = [pyrng.getrandbits(64) for _ in range(n)]
        sims = spark.createDataFrame(
            [(i, "%08x%08x" % (fp >> 32, fp & 0xFFFFFFFF))
             for (i, fp) in enumerate(fps)], "doc_id long, simhash string")
        sh = _simhash_candidates(sims).count()
        print(json.dumps({"gen": "simhash_manku_6c3", "n": n,
                          "candidates": sh,
                          "rate": round(sh / pairs, 10)}))
        # random 40-word docs over a 50k vocabulary: a shared 20-token
        # window is essentially impossible, so the ExactSubstr pair rate
        # must be ~0 beyond the single planted duplicate
        texts = [" ".join("w%d" % pyrng.randrange(50000)
                          for _ in range(40)) for _ in range(n)]
        texts[1] = texts[0]  # planted exact dup
        pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                      "text": texts}).to_parquet(d + "/documents.parquet")
        sd = substring_dup_pairs(spark, d).count()
        print(json.dumps({"gen": "exact_substring_w20", "n": n,
                          "candidates": sd,
                          "rate": round(sd / pairs, 10)}))
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
