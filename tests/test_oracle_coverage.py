"""Round-3 verdict #7: a registered query can never again lack oracle
coverage. Every name in ``__spark_entry__.queries()`` must carry an
``oracle_sql()`` entry (the driver's hard-signal path) — non-SQL ops
would get only the weaker rows-only check, and round 3's 5 missing
CORRECTNESS rows came exactly from that daylight. An explicit allowlist
makes any intentional future exception reviewable instead of silent.
"""
import __spark_entry__ as entry

# names intentionally exempt from the SQL oracle (must stay empty unless
# a genuinely non-SQL-expressible op lands; document why when it does)
ROWS_ONLY_ALLOWED: set[str] = set()


def test_every_registered_query_has_an_oracle():
    qs = set(entry.queries())
    oracles = set(entry.oracle_sql())
    missing = qs - oracles - ROWS_ONLY_ALLOWED
    assert not missing, (
        f"queries registered without oracle_sql coverage: {sorted(missing)}")


def test_no_orphan_oracles():
    """An oracle for an unregistered query is dead weight or a typo'd
    key — either way the driver would never run it."""
    qs = set(entry.queries())
    orphans = set(entry.oracle_sql()) - qs
    assert not orphans, f"oracles with no matching query: {sorted(orphans)}"


def test_oracle_check_tool_covers_all_queries():
    """tools/oracle_check.py (the driver replica) defaults to exactly
    the queries-with-oracles set; with full oracle coverage that must be
    every registered query."""
    qs = entry.queries()
    oracles = entry.oracle_sql()
    default_names = [n for n in qs if n in oracles]
    assert sorted(default_names) == sorted(qs)


def test_queries_lead_with_stale_driver_row_ops():
    """r5 verdict #1 + r6 verdict #4 (standing rule: no op's driver row
    older than 2 rounds): the driver checks at most 50 queries in
    registration order; ops whose SOURCE changed this round and ops with
    the oldest driver rows must come first so this round's sample
    re-proves least-proven code. Guard the ordering (and that no
    priority name is a typo that silently drops out of the dict
    comprehension)."""
    expected_head = [
        # tier 1 — never driver-sampled (every r7 addition): 42 ops
        "bigram_perplexity", "char_entropy", "dedup_url",
        "url_canonicalize", "pagerank", "bm25_scores", "shard_assign",
        "cooccurrence_lift", "media_decode_png", "media_decode_gif",
        "media_decode_tiff", "media_decode_avi", "media_mp3_meta",
        "payload_decompress", "warc_records", "warc_extract",
        "encoding_repair", "robots_filter", "html_metadata",
        "sitemap_urls", "image_dhash", "unicode_normalize",
        "fim_transform", "chat_template", "loss_mask_spans",
        "media_avi_frame_sample", "context_truncate",
        "zip_members", "docx_extract", "latex_strip",
        "markdown_strip", "subtitle_cues", "cues_to_turns",
        "email_quote_strip", "code_quality",
        "audio_zcr_features", "jsonl_extract", "conversation_quality",
        "domain_mix", "bpe_train_merges", "feed_entries",
        "link_graph",
        # tier 2 — source changed this round with older rows: the
        # extraction family (truncation flag + boilerplate hints), the
        # media family (decode_media dispatch + bare-key spread), and
        # the r6-verdict fixes (lm_perplexity cutoffs, dsir, sig_mat)
        "extract_documents", "extract_conversations", "curate_documents",
        "layout_boxes", "curate_pdf_corpus",
        "lm_perplexity", "dsir_weights", "ann_lsh_pairs",
        # the three BPE-adjacent ops sit first past the window: the
        # in-window bpe_train_merges row reproves bpe_pair_counts'
        # statistic verbatim (its round 0) and exercises the same fit
        # bpe_encode applies (application property-tested vs a
        # reference merger); seqlen_histogram is a two-expression
        # groupBy — all three under full strict-sweep + second-
        # comparator evidence at 3 SFs
        "bpe_pair_counts", "bpe_encode", "seqlen_histogram",
        # the media_features/metadata/resize/frame_sample family sits
        # just past the 50-window: their r7 source change is only new
        # decode_media format branches their fixed BMP/fake inputs
        # never take (r6 rows stay representative, and the five
        # in-window media_decode_* queries exercise every new dispatch
        # branch); the window seats go to lm_perplexity / dsir_weights
        # / ann_lsh_pairs whose r7 hunks DO change behavior (cutoff
        # swaps, sig_mat kwarg)
        "media_features", "media_metadata",
        "media_resize", "media_frame_sample",
        # tier 3 — oldest rows: all 11 r4-stale + the first 5 r5-stale
        "ngram_jaccard_pairs", "doc_fingerprint", "token_count",
        "quality_score", "lang_id", "repetition_filter", "tfidf_keywords",
        "docfreq_boilerplate", "ann_cosine_topk", "embedding_quantize",
        "embedding_clusters",
        "dedup_minhash_buckets", "dedup_minhash_pairs", "pii_scrub",
        "contamination_check", "stratified_sample",
        # past the 50-sample window (tier-1 grew to 27 with the late
        # additions, so ALL 13 r5-row ops now sit outside it): source
        # unchanged — r8 MUST rotate these into its head (they will be
        # 3 rounds stale)
        "pack_chunks", "normalize_text", "pack_sequences",
        "temperature_sample", "decontaminate_spans", "conversation_pack",
        "holdout_split", "turn_role_stats",
    ]
    names = list(entry.queries())
    assert names[:len(expected_head)] == expected_head


def _oracle_check_mod():
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "oracle_check",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools", "oracle_check.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_strict_comparator_catches_hugeint_float_drift():
    """r4 verdict #2: the replica's old compare (check_dtype=False,
    atol=1e-6) shipped the SUM-dtype oracle bug as green three rounds
    running. The strict comparator must fail exactly that shape: DuckDB
    bare SUM -> HUGEINT -> pandas float64 vs Spark int64, values equal."""
    import duckdb
    import pandas as pd

    oc = _oracle_check_mod()
    spark_like = pd.DataFrame({"n": pd.array([3], dtype="int64")})
    con = duckdb.connect()
    bare = con.execute("SELECT SUM(1) AS n FROM RANGE(3)").fetchdf()
    assert bare["n"].dtype.kind == "f", "precondition: HUGEINT->float64"
    r = oc.compare_frames(spark_like, bare)
    assert r["values_match"] and not r["kinds_match"] and not r["hash_match"]

    cast = con.execute("SELECT SUM(1)::BIGINT AS n FROM RANGE(3)").fetchdf()
    r2 = oc.compare_frames(spark_like, cast)
    assert r2["values_match"] and r2["kinds_match"] and r2["hash_match"]
