#!/usr/bin/env python3
"""One-decade-up capacity point for the pair generators (VERDICT r5 #5).

The scale claims rest on candidate rates measured at the sf0.1 corpus
(5k docs / 2k vectors). This probe synthesizes a corpus of the SAME
distribution at 1x and 10x — documents drawn from sf0.1's own vocabulary
with its empirical word-count distribution and lang/source marginals;
embeddings unit-norm random float32[64] with uniform 10-way labels,
exactly the measured structure of the real table (mean same-label cosine
~= mean cross-label cosine ~= 0) — and runs the real operators at both
sizes, recording candidate counts, rates and wall times. Flat rates and
~linear-in-output times at 10x turn the 100-TB extrapolation into a
measurement. The generator is deterministic (seed 42, like TESTDATA).

    SPARK_GRAFT_CAP_SIZES="5000 50000" python3 tools/capacity_10x.py

Writes one JSON line per (generator, n).
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REAL_SF = "/root/testdata/sf0.1"
VEC_PER_DOC = 2000 / 5000  # sf0.1 embeddings-to-documents ratio


def synth_dir(n_docs: int) -> str:
    """Deterministic corpus with sf0.1's marginals at any size."""
    rng = np.random.RandomState(42)
    real = pd.read_parquet(f"{REAL_SF}/documents.parquet")
    vocab = sorted({w for t in real["text"] for w in t.split(" ") if w})
    lens = real["text"].str.split(" ").str.len().to_numpy()
    langs = real["lang"].to_numpy()
    sources = real["source"].to_numpy()
    texts = [
        " ".join(np.asarray(vocab)[rng.randint(0, len(vocab), ln)])
        for ln in lens[rng.randint(0, len(lens), n_docs)]
    ]
    # planted 2% exact-duplicate mass: random same-vocab text never
    # shares a 20-token window, so without this the ExactSubstr (and
    # part of the MinHash) output is degenerate zero — with it, true-dup
    # output grows ~linearly in n and the probe measures the generators
    # doing real work at both sizes
    n_dup = n_docs // 50
    dup_at = rng.choice(np.arange(1, n_docs), size=n_dup, replace=False)
    for i in dup_at:
        texts[i] = texts[rng.randint(0, i)]
    d = tempfile.mkdtemp(prefix="cap10x_")
    pd.DataFrame({
        "doc_id": np.arange(n_docs, dtype=np.int64),
        "text": texts,
        "lang": langs[rng.randint(0, len(langs), n_docs)],
        "source": sources[rng.randint(0, len(sources), n_docs)],
        "n_chars": np.int32([len(t) for t in texts]),
    }).to_parquet(d + "/documents.parquet")
    n_vec = int(n_docs * VEC_PER_DOC)
    E = rng.randn(n_vec, 64).astype(np.float32)
    E /= np.linalg.norm(E, axis=1, keepdims=True)
    pd.DataFrame({
        "vec_id": np.arange(n_vec, dtype=np.int64),
        "embedding": [row.tolist() for row in E],
        "label": (np.arange(n_vec) % 10).astype(np.int32),
    }).to_parquet(d + "/embeddings.parquet")
    return d


def main() -> None:
    from pyspark.sql import functions as F

    from pdfminer_spark.ops.similarity import ann_lsh_pairs
    from pdfminer_spark.ops.textops import (_simhash_candidates,
                                            dedup_minhash_pairs, simhash,
                                            substring_dup_pairs)
    from pdfminer_spark.spark.session import get_spark

    sizes = [int(s) for s in os.environ.get(
        "SPARK_GRAFT_CAP_SIZES", "5000 50000").split()]
    spark = get_spark("capacity-10x", cpus=32, shuffle_partitions=32)
    for n_docs in sizes:
        sf = synth_dir(n_docs)
        n_vec = int(n_docs * VEC_PER_DOC)
        doc_pairs = n_docs * (n_docs - 1) / 2
        vec_pairs = n_vec * (n_vec - 1) / 2

        t0 = time.time()
        mh = dedup_minhash_pairs(spark, sf).count()
        t_mh = time.time() - t0
        print(json.dumps({"gen": "minhash_bands", "n": n_docs,
                          "candidates": mh,
                          "rate": round(mh / doc_pairs, 8),
                          "wall_s": round(t_mh, 2)}))

        t0 = time.time()
        reps = (simhash(spark, sf)
                .groupBy("simhash").agg(F.min("doc_id").alias("doc_id")))
        sh = _simhash_candidates(reps).count()
        t_sh = time.time() - t0
        print(json.dumps({"gen": "simhash_manku_distinct_fp", "n": n_docs,
                          "candidates": sh,
                          "rate": round(sh / doc_pairs, 8),
                          "wall_s": round(t_sh, 2)}))

        t0 = time.time()
        lsh = ann_lsh_pairs(spark, sf).count()
        t_lsh = time.time() - t0
        print(json.dumps({"gen": "sign_lsh_16x16", "n": n_vec,
                          "candidates": lsh,
                          "rate": round(lsh / vec_pairs, 8),
                          "wall_s": round(t_lsh, 2)}))

        t0 = time.time()
        sd = substring_dup_pairs(spark, sf).count()
        t_sd = time.time() - t0
        print(json.dumps({"gen": "exact_substring_w20", "n": n_docs,
                          "candidates": sd,
                          "rate": round(sd / doc_pairs, 10),
                          "wall_s": round(t_sd, 2)}))
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
