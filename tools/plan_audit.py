#!/usr/bin/env python3
"""Regenerate PLANS.md: formatted physical plans for the headline query
shapes with the scale-relevant lines (pushed filters, read schemas,
join strategies, exchange counts) — the .explain audit the build keeps
as evidence that each operator compiles to the plan it claims.

    python3 tools/plan_audit.py > PLANS.md
"""
from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# (query, what the plan must show)
AUDITS = [
    ("pricing_summary",
     "filter + 7-column pruning pushed to the scan; algebraic aggregates "
     "compile to partial_ (map-side) + final HashAggregate around ONE "
     "exchange."),
    ("shipping_priority",
     "segment and date predicates in PushedFilters; customer enters via "
     "BroadcastHashJoin; top-10 is TakeOrderedAndProject, never a global "
     "sort. At this SF, AQE also broadcasts the date-filtered orders side "
     "into lineitem (the right size-based call here); at cluster scale "
     "that join exceeds the threshold and becomes the one shuffled "
     "sort-merge join."),
    ("scd2_range_join",
     "interval containment against the tiny epoch dim executes as "
     "BroadcastNestedLoopJoin — the fact scan never shuffles for the "
     "join."),
    ("asof_join",
     "the as-of resolves to ONE exchange on user_id + an in-partition "
     "sort feeding the window carry-forward — no range-join blow-up."),
    ("sessionize",
     "session_window is a first-class aggregate: partial session "
     "fragments merge map-side around a single exchange."),
    ("dedup_minhash_pairs",
     "signature table is a Scan ExistingRDD leaf (eager localCheckpoint "
     "— materialized once, reused by both self-join sides, freed by the "
     "ContextCleaner instead of pinned in the CacheManager); candidates "
     "shuffle as bare id pairs; the packed array<long> signature column "
     "joins back once per side."),
    ("ann_lsh_pairs",
     "bucket self-join keyed on (tbl, bucket); exact cosine in ONE "
     "ArrowEvalPython/mapInPandas stage after candidate dedup."),
    ("ann_cosine_topk",
     "single-row query vector broadcast; TakeOrderedAndProject top-k."),
    ("gopher_quality",
     "per-row quality metrics with ZERO exchanges: one pruned parquet "
     "scan feeding pure expressions — the rule set costs a map pass at "
     "any corpus size."),
    ("paragraph_dedup",
     "exactly two exchanges: one keyed on md5(paragraph) for the "
     "keep-first window (content hash -> uniform, skew-free), one on "
     "doc_id for the ordered reassembly; no pairwise comparisons."),
    ("heavy_hitters",
     "explode -> partial_count map-side combine around one exchange; "
     "the top-50 is TakeOrderedAndProject, never a global sort."),
    ("source_quota_sample",
     "one exchange on source for the per-source rank window; the quota "
     "filter applies inside the window stage."),
    ("semantic_dedup",
     "centroid table broadcast into the assignment; the pair search is "
     "an equi-join keyed on cell (the SemDeDup blocking structure) — "
     "no global cross product anywhere in the tree."),
    ("decontaminate_spans",
     "eval gram set enters as a BroadcastHashJoin build side; removal "
     "positions are a bounded sequence explode off the hit rows; "
     "reassembly is one ordered groupBy per doc — no text comparisons."),
    ("conversation_pack",
     "one exchange on conv_id feeding the running-sum window; the pack "
     "aggregation reuses the same partitioning (no second exchange for "
     "the groupBy on (conv_id, pack_id))."),
    ("holdout_split",
     "the split is a PURE PROJECTION off the scan — zero exchanges; "
     "membership is a function of doc_id alone, so any executor count "
     "produces the identical assignment."),
    ("minhash_recall_report",
     "both pair generators keep their bucketed shapes (band join on one "
     "side, adjacent-bucket equi-join on the other); the recall compare "
     "is a pair-key join + one global aggregate — no all-pairs stage "
     "appears anywhere in the tree."),
    ("curate_pdf_corpus",
     "extraction (salted-repartition mapInPandas) runs ONCE at frame "
     "construction and enters the tree as a materialized ExistingRDD leaf "
     "feeding (a) zero-exchange gopher expressions, (b) the md5(paragraph) "
     "window + doc_id reassembly pair of exchanges, and (c) the banded "
     "MinHash kill-set join over a checkpointed signature leaf; the doc "
     "spine re-enters each stat via per-doc-key left joins (AQE picks "
     "broadcast at sample scale, sort-merge at corpus scale — both correct) "
     "— nothing quadratic, nothing driver-side."),
    ("substring_dup_pairs",
     "stride-1 window hashes explode map-side; ONE exchange keyed on the "
     "window md5 for the document-frequency gate; the pair self-join sees "
     "only df-in-(1,cap] windows, so bucket width is bounded by the cap, "
     "never by corpus size."),
    ("curate_near_dups_best",
     "banded candidates only (no all-pairs); the quality keep rule is "
     "ONE window partitioned by component rep over dup-graph nodes; the "
     "kill set leaves via an AQE-chosen anti join (no broadcast hint)."),
    ("contamination_bloom",
     "the Bloom is m/64 bit_or words aggregated to a ONE-ROW broadcast "
     "map; every probe is a map lookup + bitwise test, so the prefilter "
     "is entirely map-side (zero exchange of training grams) and only "
     "Bloom survivors reach the exact-confirm broadcast join."),
    ("lm_perplexity",
     "NO corpus-wide unpartitioned Window anywhere in the plan (r6 "
     "verdict #3): the head/middle/tail split is a map-side CASE "
     "against two driver-computed cutoff literals from the bounded "
     "score histogram — scoring is explode + two hash aggregates with "
     "broadcast joins for the lp6 table; no global sort, no NTILE."),
    ("dsir_weights",
     "same rule as lm_perplexity (this op's global NTILE(10) was the "
     "identical shape): deciles come from a BroadcastHashJoin against "
     "the bounded (weight -> decile) map — no unpartitioned Window, no "
     "global sort anywhere in the plan."),
    ("media_decode_png",
     "doc_id-only ReadSchema (column pruning drops the text payload "
     "entirely), then ONE RoundRobin exchange of the bare 8-byte keys "
     "to spread the CPU-heavy decode across every core (a single-file "
     "test scan is ONE partition; measured 3-15x wall at 50k docs), "
     "then ONE MapInPandas — per-row independent, nothing else moves."),
    ("media_decode_gif",
     "same contract as media_decode_png: doc_id-only scan, one bare-key "
     "spread exchange, one MapInPandas — the GIF build + LZW decode "
     "is per-row independent."),
    ("media_decode_tiff",
     "same contract as media_decode_png: doc_id-only scan, one bare-key "
     "spread exchange, one MapInPandas — the TIFF build (strips, "
     "both byte orders, LZW/PackBits/predictor) + real decode is "
     "per-row independent."),
    ("media_decode_avi",
     "same contract as media_decode_png: doc_id-only scan, one bare-key "
     "spread exchange, one MapInPandas — the AVI container build "
     "(hdrl/strl/movi, stream-id classification) + first-frame DIB "
     "decode is per-row independent."),
    ("media_mp3_meta",
     "same contract as media_decode_png: doc_id-only scan, one bare-key "
     "spread exchange, one MapInPandas — the MP3 frame-header walk is "
     "per-row independent."),
    ("image_dhash",
     "same contract as media_decode_png: doc_id-only scan, one bare-key "
     "spread exchange, one MapInPandas running decode + luma + "
     "block-mean + bits; the downstream image dedup is a groupBy on "
     "the 64-bit hash."),
    ("payload_decompress",
     "ONE map-side MapInPandas stage (after the single small-file "
     "spread repartition): compress/sniff/decompress is per-row "
     "independent; per-payload memory bounded by the 16 MiB cap "
     "regardless of declared expansion."),
    ("warc_extract",
     "ONE map-side MapInPandas stage (after the small-file spread): "
     "WARC framing -> HTTP split -> boilerplate strip is per-row "
     "independent; no exchange anywhere — at 100 TB this runs "
     "directly on the lake's WARC cells."),
    ("pagerank",
     "ZERO parquet re-scans across the 5 power iterations: edges and "
     "nodes enter as Scan ExistingRDD leaves (one eager localCheckpoint "
     "each), so the iterative lineage stays linear in K; exactly 2 "
     "exchanges per iteration (contribution join on src, sum by dst) — "
     "the canonical iterative-graph shape, no driver-side loop over "
     "collected data."),
    ("bm25_scores",
     "TakeOrderedAndProject(limit=20) sits BELOW the rank window, so "
     "the single-partition Window sees exactly 20 rows, never the "
     "corpus; the driver-fitted idf table enters as a BroadcastHashJoin "
     "build side; tf is one exchange with partial_count map-side "
     "combine; the query-term filter reaches the scan."),
    ("cues_to_turns",
     "ONE exchange total: the doc_id window (speaker-change/gap flags, "
     "running turn index) shuffles once, and the (doc_id, turn_idx) "
     "groupBy satisfies its clustering from the window's hash(doc_id) "
     "partitioning — no second exchange for the turn aggregation."),
    ("bpe_pair_counts",
     "adjacent-pair explode stays expression-level (no Python) over a "
     "words array materialized ONCE per row (arrays_zip of slices, not "
     "per-element re-split); pair aggregation shows partial_count "
     "map-side combine; top-20 is TakeOrderedAndProject, never a "
     "global sort; one RoundRobin test-scan spread."),
    ("code_quality",
     "every metric (line-length HOFs over once-materialized arrays, "
     "alnum/digit regex counts, integer e4 ratios) compiles into the "
     "scan stage's projection chain; the only exchange is the "
     "RoundRobin test-scan spread."),
    ("jsonl_extract",
     "ZERO exchanges and no Python: the JSON line is built and parsed "
     "(JsonToStructs, JVM Jackson) inside the one scan stage; corrupt "
     "records resolve to NULL fields in-plan."),
    ("domain_mix",
     "per-source aggregation is ONE map-side-combined exchange on the "
     "domain key; the corpus total re-enters as a BroadcastNestedLoopJoin "
     "of a ONE-ROW frame, never a second corpus pass."),
    ("conversation_quality",
     "ONE exchange: conv_id window computes alternation flags, the "
     "conv_id groupBy reuses the window's partitioning."),
    ("nb_classifier",
     "the trained (token, class, lp6) table and priors enter as "
     "BroadcastHashJoin build sides (bounded by the feature space, "
     "never the corpus); scoring is one map-side-combined exchange "
     "keyed by (doc, class) and a groupBy(doc) struct-max — no window, "
     "no driver-side scoring."),
    ("winnow_fingerprints",
     "k-gram hashing and the W-window minimum selection are HOFs over "
     "once-materialized arrays inside the scan stage; one explode of "
     "selected fingerprints feeds a distinct keyed by (doc, pos, "
     "hash) — uniform hash keys, no skew."),
    ("funnel_analysis",
     "first-signup and first-purchase-after are two user_id-keyed "
     "aggregations with map-side partial_min; the joins are same-key "
     "(co-partitioned or broadcast under AQE) — ordered 'first B "
     "after A' without any window over the raw event stream."),
    ("cohort_retention",
     "first-day per user is one user-keyed aggregation; the join back "
     "is same-key; the cohort aggregation keys on DAYS (bounded) with "
     "distinct-count partials map-side."),
    ("conversation_near_dups",
     "turn-key sets shuffle on the md5 key (uniform); the df cap "
     "bounds per-key fan-out of the pair self-join; Jaccard is exact "
     "integer arithmetic on two joined size aggregates."),
]

def main() -> None:
    from pdfminer_spark.spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark("plan-audit", cpus=8, shuffle_partitions=32)
    qs = entry.queries()
    print("# PLANS — physical-plan audit (regenerate: "
          "`python3 tools/plan_audit.py > PLANS.md`)\n")
    print("Spark `explain('formatted')` for the headline operator shapes "
          "at %s.\nEach section states the property the plan must exhibit; "
          "the excerpt shows\nthe operator tree (details sections "
          "truncated to the scale-relevant lines).\n" % SF_DIR)
    for (name, claim) in AUDITS:
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        text = buf.getvalue()
        tree = text.split("\n\n")[0]  # operator tree before the details
        # pull the scale-evidence detail lines
        details = [ln.strip() for ln in text.splitlines()
                   if re.search(r"PushedFilters|ReadSchema|Join type|"
                                r"functions \[partial_", ln)]
        print("## %s\n" % name)
        print("**Must show:** %s\n" % claim)
        print("```")
        print(tree.strip())
        for d in details[:8]:
            print(d[:180])
        print("```\n")
    spark.stop()


if __name__ == "__main__":
    main()
