"""Corpus-curation operators (round 4): the published web-curation
recipes as first-class DataFrame ops over the ``documents`` table —
Gopher quality rules, C4-style line filtering, cross-document
paragraph-level dedup, heavy-hitter token stats, and per-source quota
sampling. Everything is JVM-expression-level (no Python UDFs), each with
a DuckDB oracle.

Unit note: the synthetic corpus has no newlines, so "line"/"paragraph"
units are derived as consecutive 10-word windows — boundary choice
aside, the operator mechanics (explode -> per-unit rule/hash ->
keep-first window -> ordered reassembly) are exactly the production
shape and are what the oracles pin.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .textops import _docs

_WIN = 10  # words per derived line/paragraph window

_STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for")

# C4-style blocklist; 'spark'/'window' are in the synthetic vocabulary so
# the rule actually fires on this corpus (a list that never matches would
# leave the drop path unpinned)
_BLOCKLIST = ("spark", "window", "javascript")


def _words(col="text"):
    return F.filter(F.split(F.lower(F.col(col)), "[^a-z0-9']+"),
                    lambda w: w != "")


def _windows(words):
    """array<array<string>>: consecutive _WIN-word slices (last may be
    short)."""
    n = F.size(words)
    # guard n == 0: Spark's sequence(0, -1) auto-steps DOWN and would
    # yield [0, -1] (two phantom empty windows), while the DuckDB
    # oracle's RANGE(0, 0) emits none (ADVICE r4)
    idx = F.when(
        n >= 1,
        F.sequence(F.lit(0), F.floor((n - 1) / _WIN).cast("int")),
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.slice(words, i * _WIN + 1, _WIN))


def gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021, §A1.1) re-fit to this
    corpus's scale: word count >= 20, mean word length in [3, 10],
    fraction of words containing an alphabetic character >= 0.80, and at
    least 2 distinct stop words. Emits the per-doc metrics plus the pass
    verdict — the metrics are the curation dashboard, the verdict the
    filter.

    Scale: pure per-row expressions over one scan; no shuffle at all."""
    d = _docs(spark, sf_dir)
    w = _words()
    n_words = F.size(w)
    mean_wl = F.round(F.length(F.concat_ws("", w)) / n_words, 6)
    alpha_ratio = F.round(
        F.size(F.filter(w, lambda x: x.rlike("[a-z]"))) / n_words, 6)
    stop_hits = F.size(F.array_intersect(
        F.array_distinct(w), F.array(*[F.lit(s) for s in _STOPWORDS])))
    passes = ((n_words >= 20) & (mean_wl >= 3) & (mean_wl <= 10)
              & (alpha_ratio >= 0.8) & (stop_hits >= 2))
    return d.select(
        "doc_id", n_words.alias("n_words"), mean_wl.alias("mean_word_len"),
        alpha_ratio.alias("alpha_word_ratio"),
        stop_hits.alias("n_stopwords"),
        passes.cast("boolean").alias("passes"),
    ).where(F.col("n_words") >= 1)  # zero-word doc: ratios undefined (ADVICE r4)


def code_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StarCoder-style code-file quality metrics (Li et al. 2023, "The
    Stack" filters): per-file line-length statistics (max and mean line
    length — the published thresholds are max<=1000, mean<=100),
    alphanumeric-character fraction (>=0.25), and digit fraction; lines
    here are the corpus's derived 10-word windows (the paragraph_dedup
    convention for a newline-free test corpus). Fractions and the mean
    are exact integer e4 half-up micro-units (the corpus_report recipe)
    so no cross-engine float enters the verdict.

    Scale: per-row expressions (HOFs over arrays each materialized
    once in a projection chain); the only exchange is the RoundRobin
    test-scan spread (_docs parallel=True) — at the lake the scan is
    already wide and AQE coalesces it away."""
    # chained projections so each array materializes ONCE per row —
    # inlining lines/lens into one select re-evaluates the whole HOF
    # chain per reference (measured 6x wall at 50k docs); the spread
    # keeps the single-file test scan off one core
    d = _docs(spark, sf_dir, parallel=True)
    # zero-word guard applied EARLY on the raw column (n_lines >= 1 iff
    # the doc has any word): a trailing .where on the computed alias
    # measured a ~70x blowup at 50k docs — the pushed-down filter
    # re-inlines the whole collapsed HOF chain and defeats its CSE
    d = d.where(F.size(_words()) >= 1)
    lined = d.select(
        "doc_id", "text",
        F.transform(_windows(_words()),
                    lambda ws: F.array_join(ws, " ")).alias("lines"))
    lened = lined.select(
        "doc_id", "text", "lines",
        F.transform("lines", F.length).alias("lens"))
    base = lened.select(
        "doc_id",
        F.size("lines").cast("long").alias("n_lines_l"),
        F.aggregate("lens", F.lit(0).cast("long"),
                    lambda acc, x: acc + x).alias("total_chars"),
        F.array_max("lens").cast("int").alias("max_line_chars"),
        F.greatest(F.length("text"), F.lit(1)).cast("long")
         .alias("text_len"),
        F.length(F.regexp_replace("text", "[^A-Za-z0-9]", ""))
         .cast("long").alias("n_alnum"),
        F.length(F.regexp_replace("text", "[^0-9]", ""))
         .cast("long").alias("n_digit"))
    e4 = "(%s * 20000 + %s) div (2 * %s)"  # exact half-up e4 ratio
    return (base.select(
        "doc_id",
        F.col("n_lines_l").cast("int").alias("n_lines"),
        "max_line_chars",
        F.expr(e4 % ("total_chars", "n_lines_l", "n_lines_l"))
         .alias("mean_line_chars_e4"),
        F.expr(e4 % ("n_alnum", "text_len", "text_len"))
         .alias("alnum_frac_e4"),
        F.expr(e4 % ("n_digit", "text_len", "text_len"))
         .alias("digit_frac_e4"))
        .withColumn(
            "keep",
            ((F.col("max_line_chars") < 75)
             & (F.col("alnum_frac_e4") >= 2500)).cast("int")))


def line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style per-line filtering (Raffel et al. 2020, §2.2): split each
    document into lines (10-word windows here), drop lines with fewer
    than 5 words or containing a blocklisted term, and reassemble the
    document from the survivors in order. Emits kept text + drop
    accounting per document.

    Scale: explode + groupBy(doc_id) with map-side partial aggregation;
    the per-line predicate is expression-level inside the explode."""
    d = _docs(spark, sf_dir)
    lines = F.transform(_windows(_words()), lambda ws: F.array_join(ws, " "))
    e = d.select("doc_id", F.posexplode(lines).alias("pos", "line"))
    lw = F.split(F.col("line"), " ")
    banned = F.arrays_overlap(
        lw, F.array(*[F.lit(b) for b in _BLOCKLIST]))
    keep = (F.size(lw) >= 5) & ~banned
    return (e.withColumn("keep", keep)
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_lines"),
                 F.sum(F.col("keep").cast("int")).alias("n_kept"),
                 F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.when(F.col("keep"),
                                    F.struct("pos", "line")))),
                         lambda s: s["line"]), " ").alias("kept_text")))


def paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document paragraph-level dedup (the boilerplate killer in
    every published web-curation pipeline): hash each paragraph (10-word
    window), keep only the FIRST occurrence corpus-wide (ordered by
    doc_id, then position), and reassemble documents from surviving
    paragraphs. Emits per-doc paragraph counts and the deduped text.

    Scale: one explode -> one window over md5(paragraph) (shuffle keyed
    by content hash — uniform by construction, no skew) -> one ordered
    groupBy(doc_id) reassembly. Never compares text pairwise."""
    d = _docs(spark, sf_dir)
    paras = F.transform(_windows(_words()), lambda ws: F.array_join(ws, " "))
    e = d.select("doc_id", F.posexplode(paras).alias("pos", "para"))
    w = Window.partitionBy(F.md5("para")).orderBy("doc_id", "pos")
    ranked = e.withColumn("rn", F.row_number().over(w))
    return (ranked
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_paras"),
                 F.sum((F.col("rn") > 1).cast("int")).alias("n_dup_paras"),
                 F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.when(F.col("rn") == 1,
                                    F.struct("pos", "para")))),
                         lambda s: s["para"]), " ").alias("dedup_text")))


_TOPK_TOKENS = 50


def lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring (Wenzek et al. 2020): score every
    document by mean token log-probability under a unigram LM trained on
    the corpus ITSELF (add-1 smoothing), then bucket the corpus into
    head / middle / tail thirds by score — the published recipe keeps
    the middle band for training.

    Cross-engine determinism: the danger in any LM score is a float SUM
    whose partial-aggregation order differs between engines. Per-token
    log-probs are therefore quantized to FIXED-POINT micro-units
    (floor(ln(p) * 1e6) as BIGINT) before aggregation — integer sums
    are exact and order-independent. The (count -> lp6) table is built
    ON THE DRIVER with CPython math.log (the dsir_weights precedent):
    Spark's Log compiles to JVM StrictMath.log (fdlibm) which differs
    from glibc by an ulp often enough to flip a FLOOR at a 1e-6
    boundary. Residual assumption (the DuckDB oracle recomputes LN
    itself): DuckDB's LN must bit-match CPython's math.log at the
    floor(*1e6) boundaries — both link glibc libm, and they have
    matched on every tested frequency bucket; a platform where they
    diverge would show as an oracle hash mismatch, not silent error.
    The table is bounded: one row per DISTINCT token frequency,
    O(sqrt(N)) rows. The 4-decimal mean rounds in INTEGER micro-units
    (half away from zero via (2*|s6| + 100n) div (200n)) — Spark's
    float round() goes through BigDecimal shortest-string while DuckDB
    rounds the raw double; they disagree exactly at displayed .5
    boundaries.

    Scale: two count aggregates (token explode is map-side), the
    log-prob table broadcasts (vocabulary-sized), the per-doc score is
    one groupBy. The head/middle/tail split is VALUE-CUTOFF based
    (r6 verdict #3 — the previous global NTILE(3) was the one
    corpus-wide single-partition window left in any registered op):
    scores are 4-decimal quantized and bounded below by
    ln(1/(n_tokens+vocab)) > -30 at any conceivable corpus size, so
    the DISTINCT score histogram holds <= ~3e5 rows no matter how many
    documents exist. The histogram is collected (bounded driver
    round-trip, same discipline as the lp6/dsir tables), the two
    NTILE-sized boundary cutoffs are computed in Python, and bucketing
    is a map-side CASE against two broadcast scalar literals — no
    global sort, no corpus-wide window. Divergence from exact NTILE:
    documents TIED on the boundary score all take the higher bucket
    (NTILE would split them by doc_id); the tie rule is deterministic,
    expressed identically in the oracle, and accuracy-asserted against
    exact NTILE in pytest (agreement everywhere except boundary
    ties)."""
    import math

    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", F.explode(_words()).alias("tok"))
    counts = toks.groupBy("tok").agg(F.count("*").alias("c"))
    # BOUNDED driver round-trip: one row per distinct token frequency
    # (O(sqrt(N)) by sum-of-counts), from which n and v also follow —
    # then the lp6 table is computed with CPython's glibc log (see the
    # residual-assumption note above for the oracle side).
    freq = (counts.groupBy("c").agg(F.count("*").alias("m")).collect())
    n = sum(r["c"] * r["m"] for r in freq)
    v = sum(r["m"] for r in freq)
    lp6_rows = [
        (r["c"], math.floor(math.log((r["c"] + 1) / (n + v)) * 1e6))
        for r in freq
    ] or [(0, 0)]
    lp6_tab = spark.createDataFrame(lp6_rows, "c bigint, lp6 long")
    lp = counts.join(F.broadcast(lp6_tab), "c").select("tok", "lp6")
    scored = (toks.join(F.broadcast(lp), "tok")
              .groupBy("doc_id")
              .agg(F.count("*").alias("n_tokens"),
                   F.sum("lp6").alias("s6")))
    # half-away-from-zero 4-decimal rounding in integer micro-units:
    # e4 = sign(s6) * floor(|s6|/(100n) + 1/2), one exact final divide
    mean_lp = F.expr(
        "cast(sign(s6) as bigint)"
        " * ((2 * abs(s6) + 100 * n_tokens) div (200 * n_tokens))"
    ).cast("double") / F.lit(10000.0)
    scored = scored.select("doc_id", "n_tokens",
                           mean_lp.alias("mean_logprob"))
    (c1, c2) = _ppl_cutoffs(scored)
    bucket = (F.when(F.col("mean_logprob") >= F.lit(c1), "head")
              .when(F.col("mean_logprob") >= F.lit(c2), "middle")
              .otherwise("tail"))
    return scored.withColumn("ppl_bucket", bucket)


def _ppl_cutoffs(scored: DataFrame) -> tuple[float, float]:
    """Head/middle cutoff scores from the bounded score histogram.

    NTILE-sized buckets over DISTINCT scores ordered desc: a distinct
    score whose preceding cumulative count is < s1 is head, < s1+s2 is
    middle, else tail (s1 >= s2 >= s3 the exact NTILE(3) bucket sizes).
    Because bucket is monotone in score, the whole assignment reduces
    to two cutoff scalars: c1 = min head score, c2 = min middle score
    (c2 = c1 when the middle bucket is empty, making its CASE branch
    unreachable, ditto tail). Returns (+inf, +inf) for an empty input
    so every branch falls through consistently (no rows anyway)."""
    hist = (scored.groupBy("mean_logprob").count()
            .orderBy(F.col("mean_logprob").desc())
            .collect())  # bounded: <= ~3e5 distinct quantized scores
    n_docs = sum(r["count"] for r in hist)
    if n_docs == 0:
        return (float("inf"), float("inf"))
    s1 = n_docs // 3 + (1 if n_docs % 3 >= 1 else 0)
    s2 = n_docs // 3 + (1 if n_docs % 3 >= 2 else 0)
    (c1, c2, cum_prev) = (None, None, 0)
    for r in hist:
        if cum_prev < s1:
            c1 = r["mean_logprob"]
        elif cum_prev < s1 + s2:
            c2 = r["mean_logprob"]
        cum_prev += r["count"]
    return (c1, c2 if c2 is not None else c1)


def bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM quality scoring — the order-2 companion to
    ``lm_perplexity`` (CCNet, Wenzek et al. 2020, uses order-5 KenLM;
    a corpus-trained add-1 bigram model is the same signal family and
    catches word-ORDER anomalies the unigram score is blind to, e.g.
    shuffled or template-stitched text that keeps a natural unigram
    mix). Every document is scored by its mean bigram log-probability
    ``ln P(w2|w1) = ln(c(w1,w2)+1) - ln(c(w1)+V)`` under the corpus's
    own counts, then bucketed head/middle/tail by the same value-cutoff
    rule as lm_perplexity.

    Cross-engine determinism (the standing fixed-point recipe): the
    score is DEFINED as the difference of two floor-quantized logs,
    ``lp6 = floor(ln(c2+1)*1e6) - floor(ln(c1+V)*1e6)`` — each term
    comes from a driver-built CPython ``math.log`` table over the
    DISTINCT integer arguments only (O(sqrt(#bigrams)) rows each, the
    lm_perplexity precedent), so everything distributed is exact BIGINT
    arithmetic. Residual assumption, same as lm_perplexity's note:
    the DuckDB oracle recomputes LN itself, so equality hinges on
    DuckDB's LN bit-matching CPython's math.log at floor(*1e6)
    boundaries — both link glibc libm and have matched on every tested
    argument; a divergent platform would surface as an oracle hash
    mismatch, not silent error.

    Scale shape: bigrams come from a JVM-side ``transform(sequence)``
    (no explode of a cross product); the history and bigram count
    aggregates are map-side-combined shuffles on w1 / (w1,w2); the
    per-bigram score join is keyed on (w1,w2) — AQE elects broadcast at
    test scale, sort-merge at vocab-squared scale, either is one
    exchange. Docs with fewer than 2 words have no bigrams and are
    excluded (stated in the oracle's WHERE too)."""
    import math

    d = _docs(spark, sf_dir)
    docs_w = (d.select("doc_id", _words().alias("w"))
              .where(F.size("w") >= 2))
    big = docs_w.select(
        "doc_id",
        F.explode(F.expr(
            "transform(sequence(1, size(w) - 1),"
            " i -> struct(w[i-1] AS w1, w[i] AS w2))")).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    c1 = big.groupBy("w1").agg(F.count("*").alias("c1"))
    c2 = big.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    # one scalar: vocabulary size V over ALL token positions (not just
    # histories) — bounded driver round-trip, lm_perplexity precedent
    v = (d.select(F.explode(_words()).alias("t"))
         .agg(F.countDistinct("t").alias("v")).collect()[0]["v"])
    # driver-built ln6 tables over the DISTINCT integer arguments only
    c2_vals = [r["c2"] for r in c2.select("c2").distinct().collect()]
    c1_vals = [r["c1"] for r in c1.select("c1").distinct().collect()]
    a6_tab = spark.createDataFrame(
        [(c, math.floor(math.log(c + 1) * 1e6)) for c in c2_vals]
        or [(0, 0)], "c2 bigint, a6 long")
    b6_tab = spark.createDataFrame(
        [(c, math.floor(math.log(c + v) * 1e6)) for c in c1_vals]
        or [(0, 0)], "c1 bigint, b6 long")
    lp = (c2.join(F.broadcast(a6_tab), "c2")
          .join(c1.join(F.broadcast(b6_tab), "c1"), "w1")
          .select("w1", "w2", (F.col("a6") - F.col("b6")).alias("lp6")))
    scored = (big.join(lp, ["w1", "w2"])
              .groupBy("doc_id")
              .agg(F.count("*").alias("n_bigrams"),
                   F.sum("lp6").alias("s6")))
    mean_lp = F.expr(
        "cast(sign(s6) as bigint)"
        " * ((2 * abs(s6) + 100 * n_bigrams) div (200 * n_bigrams))"
    ).cast("double") / F.lit(10000.0)
    scored = scored.select("doc_id", "n_bigrams",
                           mean_lp.alias("mean_logprob"))
    (cut1, cut2) = _ppl_cutoffs(scored)
    bucket = (F.when(F.col("mean_logprob") >= F.lit(cut1), "head")
              .when(F.col("mean_logprob") >= F.lit(cut2), "middle")
              .otherwise("tail"))
    return scored.withColumn("ppl_bucket", bucket)


def char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document — the classic
    gibberish/encoding-damage signal (low entropy = repeated-char spam,
    high entropy = binary-in-text / wrong-charset mojibake; used
    alongside the Gopher rules in every published curation stack).

    Fixed-point definition (exact in integer micro-units):
    ``ent6 = ln6(n) - (sum_c count_c * ln6(count_c)) div n`` where
    ``ln6(x) = floor(ln(x) * 1e6)`` — algebraically ``H = ln n -
    (1/n) * sum c*ln c`` with every log floor-quantized BEFORE the
    integer sum/divide, so both engines do only BIGINT arithmetic on
    identical quantized inputs (ln6 >= 0 for counts >= 1, so truncating
    and floor division agree). Spark reads ln6 from a driver-built
    CPython math.log table over the DISTINCT count values (bounded:
    one row per distinct per-doc char count or doc length); the DuckDB
    oracle recomputes LN — the same residual glibc-vs-glibc assumption
    lm_perplexity documents.

    Scale shape: explode-to-chars looks alarming at 100 TB but the
    groupBy(doc_id, ch) has map-side partial aggregation, so what
    crosses the wire is per-(doc, char) COUNTS — bounded by n_docs x
    alphabet, not corpus bytes; the explode itself is CPU on the scan
    partitions (at true 100 TB one would swap in a mapInPandas
    per-batch histogram, same output contract). Empty documents have
    no characters and are excluded."""
    import math

    d = _docs(spark, sf_dir)
    ch = d.select("doc_id", F.explode(F.filter(
        F.split(F.col("text"), ""), lambda c: c != "")).alias("ch"))
    counts = ch.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))
    agg = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.count("*").alias("n_unique"),
    )
    c_vals = {r["c"] for r in counts.select("c").distinct().collect()}
    n_vals = {r["n"] for r in agg.select("n").distinct().collect()}
    ln6_tab = spark.createDataFrame(
        [(x, math.floor(math.log(x) * 1e6)) for x in sorted(c_vals | n_vals)]
        or [(0, 0)], "x bigint, ln6 long")
    s6 = (counts.join(F.broadcast(ln6_tab),
                      counts["c"] == ln6_tab["x"])
          .groupBy("doc_id")
          .agg(F.sum(F.col("c") * F.col("ln6")).alias("s6")))
    out = (agg.join(s6, "doc_id")
           .join(F.broadcast(ln6_tab), agg["n"] == ln6_tab["x"]))
    ent = ((F.col("ln6") - F.expr("s6 div n")).cast("double")
           / F.lit(1000000.0))
    return out.select("doc_id", F.col("n").alias("n_chars"),
                      "n_unique", ent.alias("entropy"))


def heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-50 token frequencies (vocabulary head / stopword
    discovery). Deterministic order: count desc, then token asc — the
    tie rule makes the boundary of the top-k stable across engines.

    Scale: explode -> groupBy(token) count (map-side partial combine) ->
    TakeOrderedAndProject for the limit; an approximate companion via
    count-min sketch is accuracy-tested in pytest (sketch paths are not
    oracle material, same policy as ops/sketches.py)."""
    d = _docs(spark, sf_dir)
    return (d.select(F.explode(_words()).alias("token"))
            .groupBy("token").agg(F.count("*").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("token").asc())
            .limit(_TOPK_TOKENS))


_QUOTA_PER_SOURCE = 10


def source_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota sampling (the per-domain cap every crawl
    pipeline applies so one host cannot dominate the mix): keep at most
    10 documents per source, selected by md5(doc_id) ticket — a
    deterministic, content-addressed choice that is identical on any
    cluster size and on re-runs, unlike random() sampling.

    Scale: one window per source partition; source cardinality is the
    shuffle key so a giant source still caps at quota rows OUTPUT, and
    the rank-k cutoff needs no global sort."""
    d = _docs(spark, sf_dir)
    ticket = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source").orderBy(ticket, F.col("doc_id"))
    return (d.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= _QUOTA_PER_SOURCE)
            .select("doc_id", "source", F.col("rn").alias("quota_rank")))



# -- pipeline QA compositions ------------------------------------------------------
# A curation stack measures its own approximations: these compose existing
# oracled operators into the QA reports that watch them.

def minhash_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall of the banded-MinHash candidate generator against
    the exact n-gram-Jaccard truth at J >= 0.8 (the dedup threshold):
    one row with the true near-dup pair count, how many the banding
    recovered, and the recall — the number every LSH deployment pins as
    regression telemetry (CAPACITY.md carries rates; this carries
    recall).

    Scale: both inputs are bucketed pair generators (never all-pairs);
    the comparison itself is a pair-key join + one global aggregate."""
    from .textops import dedup_minhash_pairs, ngram_jaccard_pairs

    truth = (ngram_jaccard_pairs(spark, sf_dir)
             .where(F.col("jaccard") >= 0.8).select("id_a", "id_b"))
    found = (dedup_minhash_pairs(spark, sf_dir)
             .select("id_a", "id_b").withColumn("hit", F.lit(1)))
    return (truth.join(found, ["id_a", "id_b"], "left")
            .agg(F.count("*").alias("n_true"),
                 F.sum(F.coalesce("hit", F.lit(0))).alias("n_recovered"))
            .select("n_true", "n_recovered",
                    F.round(F.col("n_recovered") /
                            F.greatest(F.col("n_true"), F.lit(1)), 4)
                    .alias("recall")))


def lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: the heuristic's prediction vs the
    corpus's true lang column, one row per (true, predicted) cell with
    its count — the accuracy dashboard for the lang_id gate.

    Scale: one equi-join on doc_id + one groupBy over a tiny key space."""
    from .textops import lang_id

    d = _docs(spark, sf_dir).select("doc_id", "lang")
    pred = lang_id(spark, sf_dir).select("doc_id", "lang_pred")
    return (d.join(pred, "doc_id")
            .groupBy("lang", "lang_pred")
            .agg(F.count("*").alias("n")))


def corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus curation dashboard — the summary a pipeline run
    publishes per snapshot: doc/token volume, gopher pass rate, exact-
    and near-duplicate mass, and eval contamination, each computed by
    the corresponding registered operator so the report can never drift
    from the ops it summarizes.

    Determinism: the pass ratio is computed half-up in INTEGER e4 units
    ((n*20000 + d) div (2d) / 10000) — Spark round() (BigDecimal
    shortest-string) and DuckDB ROUND (raw double) disagree at displayed
    .5 boundaries, so no float ROUND appears anywhere in this report.

    Scale: every component is one aggregate over its (already bucketed /
    expression-level) operator; the report joins seven single-row frames
    — a driver-side-cost-free crossJoin chain."""
    from .textops import (dedup_exact, dedup_minhash_pairs, token_count)
    from .datasetops import contamination_check

    docs = (_docs(spark, sf_dir).agg(F.count("*").alias("n_docs")))
    toks = (token_count(spark, sf_dir)
            .agg(F.sum("ws_tokens").alias("total_tokens")))
    gq = (gopher_quality(spark, sf_dir)
          .agg(F.count("*").alias("n_scored"),
               F.sum(F.col("passes").cast("int")).alias("n_gopher_pass")))
    dup = (dedup_exact(spark, sf_dir)
           .agg(F.sum(F.col("n_copies") - 1).alias("n_dup_docs")))
    near = (dedup_minhash_pairs(spark, sf_dir)
            .where(F.col("est_jaccard") >= 0.5)
            .agg(F.count("*").alias("n_near_dup_pairs")))
    cont = (contamination_check(spark, sf_dir)
            .agg(F.count("*").alias("n_contaminated_docs")))
    row = (docs.crossJoin(toks).crossJoin(gq).crossJoin(dup)
           .crossJoin(near).crossJoin(cont))
    # GREATEST(n_scored, 1): with gopher_quality filtering to docs with
    # >=1 word, an all-empty corpus gives n_scored=0 — Spark 4 (ANSI)
    # throws DIVIDE_BY_ZERO where DuckDB's // yields NULL. The guard
    # makes both engines emit the same row (n_gopher_pass is NULL-SUM
    # on the empty frame in both, so pct is NULL either way).
    pct = (F.expr("(n_gopher_pass * 20000 + n_scored)"
                  " div (2 * greatest(n_scored, 1))")
           .cast("double") / F.lit(10000.0))
    return row.select(
        "n_docs", "total_tokens", "n_gopher_pass",
        pct.alias("gopher_pass_pct"),
        "n_dup_docs", "n_near_dup_pairs", "n_contaminated_docs")


def _qa_oracles() -> dict:
    from .textops import ORACLES as _T

    return {
        "minhash_recall_report": """
            SELECT COUNT(*) AS n_true,
                   SUM(CASE WHEN f.id_a IS NOT NULL THEN 1 ELSE 0 END)
                     ::BIGINT AS n_recovered,
                   ROUND(SUM(CASE WHEN f.id_a IS NOT NULL THEN 1 ELSE 0
                             END)::DOUBLE
                         / GREATEST(COUNT(*), 1), 4) AS recall
            FROM (SELECT id_a, id_b FROM (%s) WHERE jaccard >= 0.8) t
            LEFT JOIN (SELECT id_a, id_b FROM (%s)) f
              USING (id_a, id_b)
        """ % (_T["ngram_jaccard_pairs"], _T["dedup_minhash_pairs"]),
        "lang_confusion": """
            SELECT d.lang, p.lang_pred, COUNT(*) AS n
            FROM documents d
            JOIN (SELECT doc_id, lang_pred FROM (%s)) p USING (doc_id)
            GROUP BY d.lang, p.lang_pred
        """ % _T["lang_id"],
    }


_SQL_WORDS = ("LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), "
              "'[^a-z0-9'']+'), x -> x <> '')")

_SQL_WINDOWS = f"""
          SELECT doc_id, i AS pos,
                 ARRAY_TO_STRING(w[i * {_WIN} + 1 : i * {_WIN} + {_WIN}],
                                 ' ') AS line
          FROM (SELECT doc_id, {_SQL_WORDS} AS w FROM documents),
               UNNEST(RANGE(0, ((LEN(w) - 1) // {_WIN}) + 1)) AS t(i)
          WHERE LEN(w) >= 1
"""

ORACLES: dict[str, str] = {
    "gopher_quality": f"""
        SELECT doc_id,
               LEN(w) AS n_words,
               ROUND(LENGTH(ARRAY_TO_STRING(w, ''))::DOUBLE / LEN(w), 6)
                 AS mean_word_len,
               ROUND(LEN(LIST_FILTER(w, x -> REGEXP_MATCHES(x, '[a-z]')))
                     ::DOUBLE / LEN(w), 6) AS alpha_word_ratio,
               LEN(LIST_INTERSECT(LIST_DISTINCT(w),
                   ['the','and','of','to','a','in','is','it','that','for']))
                 AS n_stopwords,
               (LEN(w) >= 20
                AND LENGTH(ARRAY_TO_STRING(w, ''))::DOUBLE / LEN(w)
                    BETWEEN 3 AND 10
                AND LEN(LIST_FILTER(w, x -> REGEXP_MATCHES(x, '[a-z]')))
                    ::DOUBLE / LEN(w) >= 0.8
                AND LEN(LIST_INTERSECT(LIST_DISTINCT(w),
                    ['the','and','of','to','a','in','is','it','that','for']))
                    >= 2) AS passes
        FROM (SELECT doc_id, {_SQL_WORDS} AS w FROM documents)
        WHERE LEN(w) >= 1
    """,
    "code_quality": f"""
        WITH lined AS (
          SELECT doc_id,
                 COUNT(*)::BIGINT AS n_lines_l,
                 SUM(LENGTH(line))::BIGINT AS total_chars,
                 MAX(LENGTH(line))::INT AS max_line_chars
          FROM ({{windows}}) t
          GROUP BY doc_id
        ), chars AS (
          SELECT doc_id,
                 GREATEST(LENGTH(text), 1)::BIGINT AS text_len,
                 LENGTH(REGEXP_REPLACE(text, '[^A-Za-z0-9]', '', 'g'))
                   ::BIGINT AS n_alnum,
                 LENGTH(REGEXP_REPLACE(text, '[^0-9]', '', 'g'))
                   ::BIGINT AS n_digit
          FROM documents
        )
        SELECT l.doc_id,
               n_lines_l::INT AS n_lines,
               max_line_chars,
               (total_chars * 20000 + n_lines_l)
                 // (2 * n_lines_l) AS mean_line_chars_e4,
               (n_alnum * 20000 + text_len)
                 // (2 * text_len) AS alnum_frac_e4,
               (n_digit * 20000 + text_len)
                 // (2 * text_len) AS digit_frac_e4,
               (CASE WHEN max_line_chars < 75
                      AND (n_alnum * 20000 + text_len)
                          // (2 * text_len) >= 2500
                     THEN 1 ELSE 0 END)::INT AS keep
        FROM lined l JOIN chars c ON l.doc_id = c.doc_id
        WHERE n_lines_l >= 1
    """.replace("{windows}", _SQL_WINDOWS),
    "line_filter": f"""
        WITH lines AS ({_SQL_WINDOWS}),
        flagged AS (
          SELECT doc_id, pos, line,
                 (LEN(STRING_SPLIT(line, ' ')) >= 5
                  AND NOT ['spark','window','javascript'] &&
                      STRING_SPLIT(line, ' ')) AS keep
          FROM lines
        )
        SELECT doc_id, COUNT(*) AS n_lines,
               SUM(keep::INT)::BIGINT AS n_kept,
               COALESCE(STRING_AGG(CASE WHEN keep THEN line END, ' '
                                   ORDER BY pos), '') AS kept_text
        FROM flagged GROUP BY doc_id
    """,
    "paragraph_dedup": f"""
        WITH paras AS ({_SQL_WINDOWS}),
        ranked AS (
          SELECT doc_id, pos, line AS para,
                 ROW_NUMBER() OVER (PARTITION BY MD5(line)
                                    ORDER BY doc_id, pos) AS rn
          FROM paras
        )
        SELECT doc_id, COUNT(*) AS n_paras,
               SUM((rn > 1)::INT)::BIGINT AS n_dup_paras,
               COALESCE(STRING_AGG(CASE WHEN rn = 1 THEN para END, ' '
                                   ORDER BY pos), '') AS dedup_text
        FROM ranked GROUP BY doc_id
    """,
    "heavy_hitters": f"""
        SELECT token, COUNT(*) AS cnt
        FROM (SELECT UNNEST({_SQL_WORDS}) AS token FROM documents)
        GROUP BY token
        ORDER BY cnt DESC, token ASC
        LIMIT {_TOPK_TOKENS}
    """,
    "source_quota_sample": f"""
        SELECT doc_id, source, rn AS quota_rank
        FROM (SELECT doc_id, source,
                     ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY MD5(doc_id::VARCHAR), doc_id) AS rn
              FROM documents)
        WHERE rn <= {_QUOTA_PER_SOURCE}
    """,
}

ORACLES.update(_qa_oracles())


def _corpus_report_oracle() -> str:
    from .datasetops import ORACLES as _D
    from .textops import ORACLES as _T

    return """
        WITH gq AS (
          SELECT COUNT(*) AS n_scored,
                 SUM(passes::INT)::BIGINT AS n_gopher_pass
          FROM (%(gopher)s) g
        )
        SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
               (SELECT SUM(ws_tokens)::BIGINT FROM (%(tokens)s) t)
                 AS total_tokens,
               n_gopher_pass,
               ((n_gopher_pass * 20000 + n_scored)
                // (2 * GREATEST(n_scored, 1)))::DOUBLE / 10000
                 AS gopher_pass_pct,
               (SELECT SUM(n_copies - 1)::BIGINT FROM (%(exact)s) e)
                 AS n_dup_docs,
               (SELECT COUNT(*) FROM (%(pairs)s) p
                WHERE est_jaccard >= 0.5) AS n_near_dup_pairs,
               (SELECT COUNT(*) FROM (%(contam)s) c)
                 AS n_contaminated_docs
        FROM gq
    """ % {
        "gopher": ORACLES["gopher_quality"],
        "tokens": _T["token_count"],
        "exact": _T["dedup_exact"],
        "pairs": _T["dedup_minhash_pairs"],
        "contam": _D["contamination_check"],
    }


ORACLES["corpus_report"] = _corpus_report_oracle()

ORACLES["lm_perplexity"] = f"""
    WITH w AS (
      SELECT doc_id, {_SQL_WORDS} AS w FROM documents
    ), toks AS (
      SELECT doc_id, UNNEST(w) AS tok FROM w
    ), c AS (
      SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
    ), t AS (
      SELECT (SELECT COUNT(*) FROM toks) AS n,
             (SELECT COUNT(*) FROM c) AS v
    ), lp AS (
      SELECT tok,
             CAST(FLOOR(LN((c + 1)::DOUBLE / (n + v)) * 1000000)
                  AS BIGINT) AS lp6
      FROM c, t
    ), s AS (
      SELECT doc_id, COUNT(*) AS n_tokens, SUM(lp6)::BIGINT AS s6
      FROM toks JOIN lp USING (tok) GROUP BY doc_id
    ), sc AS (
      SELECT doc_id, n_tokens,
             (SIGN(s6)::BIGINT * ((2 * ABS(s6) + 100 * n_tokens)
               // (200 * n_tokens)))::DOUBLE / 10000 AS mean_logprob
      FROM s
    ), hist AS (
      SELECT mean_logprob AS scv, COUNT(*) AS m FROM sc GROUP BY scv
    ), cum AS (
      SELECT scv,
             COALESCE(SUM(m) OVER (ORDER BY scv DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_prev
      FROM hist
    ), sz AS (
      SELECT COUNT(*) // 3
               + CASE WHEN COUNT(*) % 3 >= 1 THEN 1 ELSE 0 END AS s1,
             COUNT(*) // 3
               + CASE WHEN COUNT(*) % 3 >= 2 THEN 1 ELSE 0 END AS s2
      FROM sc
    ), bmap AS (
      -- same value-cutoff rule as the Spark op (_ppl_cutoffs): NTILE-
      -- sized buckets over DISTINCT scores desc; boundary ties all
      -- take the higher bucket
      SELECT scv,
             CASE WHEN cum_prev < s1 THEN 'head'
                  WHEN cum_prev < s1 + s2 THEN 'middle'
                  ELSE 'tail' END AS ppl_bucket
      FROM cum, sz
    )
    SELECT doc_id, n_tokens, mean_logprob, ppl_bucket
    FROM sc JOIN bmap ON sc.mean_logprob = bmap.scv
"""


ORACLES["bigram_perplexity"] = f"""
    WITH w AS (
      SELECT doc_id, {_SQL_WORDS} AS w FROM documents
    ), big AS (
      SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
      FROM w, UNNEST(RANGE(1, LEN(w))) AS t(i)
      WHERE LEN(w) >= 2
    ), c1 AS (
      SELECT w1, COUNT(*) AS c1 FROM big GROUP BY w1
    ), c2 AS (
      SELECT w1, w2, COUNT(*) AS c2 FROM big GROUP BY w1, w2
    ), vv AS (
      SELECT COUNT(DISTINCT tok) AS v
      FROM (SELECT UNNEST(w) AS tok FROM w)
    ), lp AS (
      -- same fixed-point definition as the Spark op: a DIFFERENCE of
      -- two floor-quantized logs (see bigram_perplexity's residual-
      -- assumption note: DuckDB recomputes LN here)
      SELECT c2.w1, c2.w2,
             CAST(FLOOR(LN((c2.c2 + 1)::DOUBLE) * 1000000) AS BIGINT)
             - CAST(FLOOR(LN((c1.c1 + vv.v)::DOUBLE) * 1000000) AS BIGINT)
               AS lp6
      FROM c2 JOIN c1 USING (w1), vv
    ), s AS (
      SELECT doc_id, COUNT(*) AS n_bigrams, SUM(lp6)::BIGINT AS s6
      FROM big JOIN lp USING (w1, w2) GROUP BY doc_id
    ), sc AS (
      SELECT doc_id, n_bigrams,
             (SIGN(s6)::BIGINT * ((2 * ABS(s6) + 100 * n_bigrams)
               // (200 * n_bigrams)))::DOUBLE / 10000 AS mean_logprob
      FROM s
    ), hist AS (
      SELECT mean_logprob AS scv, COUNT(*) AS m FROM sc GROUP BY scv
    ), cum AS (
      SELECT scv,
             COALESCE(SUM(m) OVER (ORDER BY scv DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_prev
      FROM hist
    ), sz AS (
      SELECT COUNT(*) // 3
               + CASE WHEN COUNT(*) % 3 >= 1 THEN 1 ELSE 0 END AS s1,
             COUNT(*) // 3
               + CASE WHEN COUNT(*) % 3 >= 2 THEN 1 ELSE 0 END AS s2
      FROM sc
    ), bmap AS (
      SELECT scv,
             CASE WHEN cum_prev < s1 THEN 'head'
                  WHEN cum_prev < s1 + s2 THEN 'middle'
                  ELSE 'tail' END AS ppl_bucket
      FROM cum, sz
    )
    SELECT doc_id, n_bigrams, mean_logprob, ppl_bucket
    FROM sc JOIN bmap ON sc.mean_logprob = bmap.scv
"""

ORACLES["char_entropy"] = """
    WITH ch AS (
      SELECT doc_id,
             UNNEST(LIST_FILTER(STRING_SPLIT(text, ''), x -> x <> ''))
               AS ch
      FROM documents
    ), c AS (
      SELECT doc_id, ch, COUNT(*) AS c FROM ch GROUP BY doc_id, ch
    ), agg AS (
      SELECT doc_id, SUM(c)::BIGINT AS n, COUNT(*) AS n_unique,
             SUM(c * CAST(FLOOR(LN(c::DOUBLE) * 1000000) AS BIGINT))
               ::BIGINT AS s6
      FROM c GROUP BY doc_id
    )
    SELECT doc_id, n AS n_chars, n_unique,
           (CAST(FLOOR(LN(n::DOUBLE) * 1000000) AS BIGINT)
            - (s6 // n))::DOUBLE / 1000000 AS entropy
    FROM agg
"""


QUERIES = {
    "gopher_quality": gopher_quality,
    "lm_perplexity": lm_perplexity,
    "bigram_perplexity": bigram_perplexity,
    "char_entropy": char_entropy,
    "corpus_report": corpus_report,
    "code_quality": code_quality,
    "line_filter": line_filter,
    "paragraph_dedup": paragraph_dedup,
    "heavy_hitters": heavy_hitters,
    "source_quota_sample": source_quota_sample,
    "minhash_recall_report": minhash_recall_report,
    "lang_confusion": lang_confusion,
}
