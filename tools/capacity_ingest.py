#!/usr/bin/env python3
"""Capacity points for the ingestion-layer operators (round 7): run the
registered warc_extract / payload_decompress / robots_filter /
html_metadata / image_dhash / media_decode_tiff queries over synthetic
documents tables at 1x and 10x the sf0.1 size and record wall times.
Every op is a single map-side mapInPandas stage, so the claim under
test is simply linear wall in rows with no per-row growth — the probe
turns that from an assertion into a measurement.

    SPARK_GRAFT_INGEST_SIZES="5000 50000" python3 tools/capacity_ingest.py

Writes one JSON line per (op, n).
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

OPS = ["payload_decompress", "encoding_repair", "warc_records",
       "warc_extract", "robots_filter", "html_metadata", "sitemap_urls",
       "image_dhash", "media_decode_tiff", "media_mp3_meta",
       "unicode_normalize", "fim_transform", "chat_template",
       "loss_mask_spans", "context_truncate", "media_avi_frame_sample",
       # round-7 part-4 additions: transcript + tokenizer-training layer
       "subtitle_cues", "cues_to_turns", "email_quote_strip",
       "code_quality", "bpe_pair_counts", "bpe_train_merges",
       "seqlen_histogram", "audio_zcr_features", "jsonl_extract",
       "conversation_quality", "domain_mix", "latex_strip",
       "markdown_strip", "zip_members", "docx_extract"]


def synth_dir(n_docs: int) -> str:
    rng = np.random.RandomState(42)
    real = pd.read_parquet(f"{REAL_SF}/documents.parquet")
    vocab = sorted({w for t in real["text"] for w in t.split(" ") if w})
    lens = real["text"].str.split(" ").str.len().to_numpy()
    texts = [
        " ".join(np.asarray(vocab)[rng.randint(0, len(vocab), ln)])
        for ln in lens[rng.randint(0, len(lens), n_docs)]
    ]
    df = pd.DataFrame({
        "doc_id": np.arange(n_docs, dtype=np.int64),
        "text": texts,
        "lang": real["lang"].to_numpy()[rng.randint(0, len(real), n_docs)],
        "source": real["source"].to_numpy()[
            rng.randint(0, len(real), n_docs)],
    })
    d = tempfile.mkdtemp(prefix="cap_ingest_%d_" % n_docs)
    df.to_parquet(os.path.join(d, "documents.parquet"), index=False)
    return d


def main() -> None:
    import __spark_entry__ as entry
    from pdfminer_spark.spark.session import get_spark

    sizes = [int(s) for s in os.environ.get(
        "SPARK_GRAFT_INGEST_SIZES", "5000 50000").split()]
    spark = get_spark("capacity-ingest", cpus=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    qs = entry.queries()
    for n in sizes:
        sf_dir = synth_dir(n)
        for op in OPS:
            qs[op](spark, sf_dir).count()  # warm: codegen + listing
            t0 = time.time()
            rows = qs[op](spark, sf_dir).count()
            wall = round(time.time() - t0, 3)
            print(json.dumps({"op": op, "n_docs": n, "rows": rows,
                              "wall_s": wall,
                              "us_per_doc": round(wall * 1e6 / n, 1)}))
            sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
