"""Training-prep operators: the transformations that turn a curated
corpus into model-ready sequences — fill-in-middle reordering for code
corpora (Bavarian et al. 2022, "Efficient Training of Language Models
to Fill in the Middle"), chat-template rendering of multi-turn
conversations, and assistant-only loss-mask span computation.

All three are PURE JVM-side expression/window plans — zero Python in
the hot path (substring arithmetic, ordered aggregation, prefix-sum
windows), so they inherit whole-stage codegen and scale as one or two
exchanges regardless of corpus size.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .textops import _docs

# chat-template tokens (a deliberately simple public-format stand-in)
_ROLE_OPEN = {"user": "<|user|>\n", "assistant": "<|assistant|>\n"}
_TURN_CLOSE = "<|end|>\n"


def fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-middle reordering: for half the corpus (doc_id parity —
    the published recipe applies FIM to a fixed fraction), split the
    text at two deterministic character offsets and emit
    ``<PRE>prefix<SUF>suffix<MID>middle``; the other half passes
    through. Split points are pure integer functions of (doc_id,
    length), so the transformation is a deterministic relabeling a
    resumed job reproduces exactly.

    Scale: zero exchanges — one pruned scan feeding substring
    expressions inside whole-stage codegen."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    n = F.length("text")
    a = (n / 4).cast("long") + F.col("doc_id") % 7
    b = F.least(a + (n / 3).cast("long") + 1, n)
    a = F.least(a, b)
    fim = F.concat(
        F.lit("<PRE>"), F.expr("substring(text, 1, a)"),
        F.lit("<SUF>"), F.expr("substring(text, b + 1)"),
        F.lit("<MID>"),
        F.expr("substring(text, a + 1, b - a)"))
    return (d.withColumn("a", a).withColumn("b", b)
            .select(
                "doc_id",
                (F.col("doc_id") % 2 == 0).cast("int").alias("fim_applied"),
                F.when(F.col("doc_id") % 2 == 0, fim)
                 .otherwise(F.col("text")).alias("out_text")))


def _conv_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic conversation view of documents (the
    extract_conversations shape): 50 conversations, turn roles
    alternating user/assistant by turn index."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    return d.select(
        F.concat(F.lit("conv-"),
                 F.lpad((F.col("doc_id") % 50).cast("string"), 4, "0"))
         .alias("conv_id"),
        (F.col("doc_id") / 50).cast("int").alias("turn_idx"),
        F.when((F.col("doc_id") / 50).cast("int") % 2 == 0, "user")
         .otherwise("assistant").alias("role"),
        "text")


def chat_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chat-template rendering: each conversation's turns, in stable
    turn order, become ``<|role|>\\ntext<|end|>\\n`` segments
    concatenated into one training string. Ordered concatenation is the
    group_concat shape: one exchange on conv_id, the aggregation sorts
    (turn_idx, segment) structs in-partition — no window, no Python.

    Scale: ONE exchange keyed on conv_id; rendered length is the sum of
    turn lengths, bounded by the packing step downstream."""
    t = _conv_turns(spark, sf_dir)
    seg = F.concat(
        F.when(F.col("role") == "user", F.lit(_ROLE_OPEN["user"]))
         .otherwise(F.lit(_ROLE_OPEN["assistant"])),
        F.col("text"), F.lit(_TURN_CLOSE))
    return (t.select("conv_id", "turn_idx", seg.alias("seg"))
            .groupBy("conv_id")
            .agg(F.count("*").cast("int").alias("n_turns"),
                 F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.struct("turn_idx", "seg"))),
                         lambda s: s["seg"]), "").alias("rendered")))


def loss_mask_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assistant-only loss masking: for every assistant turn, the
    [start, end) CHARACTER offsets of its text inside the rendered
    conversation string (chat_template's exact layout), computed as a
    prefix sum of prior segment lengths — the offsets a tokenizer-side
    masker consumes. One window partitioned by conv_id ordered by
    turn_idx; no corpus-wide anything.

    Scale: ONE exchange (the conv_id window); emitted spans are
    per-turn rows, linear in input."""
    t = _conv_turns(spark, sf_dir)
    open_len = F.when(F.col("role") == "user",
                      F.lit(len(_ROLE_OPEN["user"])))\
        .otherwise(F.lit(len(_ROLE_OPEN["assistant"])))
    seg_len = open_len + F.length("text") + F.lit(len(_TURN_CLOSE))
    w = (Window.partitionBy("conv_id").orderBy("turn_idx")
         .rowsBetween(Window.unboundedPreceding, -1))
    prior = F.coalesce(F.sum(seg_len).over(w), F.lit(0).cast("long"))
    return (t.withColumn("span_start",
                         (prior + open_len).cast("long"))
            .withColumn("span_end",
                        (F.col("span_start")
                         + F.length("text")).cast("long"))
            .filter(F.col("role") == "assistant")
            .select("conv_id", "turn_idx", "span_start", "span_end"))


_CONTEXT_BUDGET = 600  # rendered characters


def context_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window truncation: keep the longest SUFFIX of each
    conversation's turns whose rendered length fits the budget — the
    standard chat-history rule (newest turns survive, oldest fall off).
    A turn is kept iff the reverse cumulative rendered length through
    it is within budget, one window partitioned by conv_id in
    descending turn order.

    Scale: ONE exchange (the conv_id window); emits one row per turn
    with its suffix length and keep decision, so downstream rendering
    filters on ``kept`` without re-deriving anything."""
    t = _conv_turns(spark, sf_dir)
    open_len = F.when(F.col("role") == "user",
                      F.lit(len(_ROLE_OPEN["user"])))\
        .otherwise(F.lit(len(_ROLE_OPEN["assistant"])))
    seg_len = open_len + F.length("text") + F.lit(len(_TURN_CLOSE))
    w = (Window.partitionBy("conv_id").orderBy(F.desc("turn_idx"))
         .rowsBetween(Window.unboundedPreceding, 0))
    suffix = F.sum(seg_len).over(w).cast("long")
    return (t.select("conv_id", "turn_idx",
                     suffix.alias("suffix_chars"),
                     (suffix <= _CONTEXT_BUDGET).cast("int")
                     .alias("kept")))


_BPE_TOPK = 20


def _adjacent_pairs(frame):
    """(a, b) rows of adjacent word pairs: the words array materializes
    ONCE per row (a prior projection), pairs come from arrays_zip of
    two slices — never a per-element re-split (the naive
    transform/element_at(split(...)) form re-evaluates split per pair
    and turns the explode O(n^2) per document; measured 8x wall at 50k
    docs). The input frame is pre-spread to defaultParallelism so the
    single-file test scan doesn't serialize the explode."""
    w = frame.select(F.split("text", " ").alias("w"))
    n = F.size("w")
    pairs = F.when(
        n >= 2,
        F.arrays_zip(F.slice("w", 1, n - 1).alias("a"),
                     F.slice("w", 2, n - 1).alias("b")),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    return w.select(F.explode(pairs).alias("p")).select("p.a", "p.b")


def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The counting pass of BPE/WordPiece tokenizer training (Sennrich
    et al. 2016): corpus-wide frequencies of ADJACENT token pairs — the
    statistic each merge round maximizes. Token here = whitespace word
    (the corpus convention); production swaps in the current merge
    vocabulary and re-runs the same plan per round. Top pairs reported
    under a total (count DESC, a, b) order so the boundary rank is
    deterministic.

    Scale: one explode of per-row adjacent pairs (expression-level, no
    Python), ONE map-side-combined aggregation keyed by the pair, and a
    TakeOrderedAndProject for the top-k — no corpus-wide sort. The pair
    key space is bounded by vocabulary squared, not corpus size."""
    d = _docs(spark, sf_dir, parallel=True).select("text")
    return (_adjacent_pairs(d)
            .groupBy("a", "b")
            .agg(F.count("*").alias("pair_count"))
            .orderBy(F.desc("pair_count"), "a", "b")
            .limit(_BPE_TOPK))


def conversation_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation-level curation checks for transcript corpora: per
    conversation, turn count, user-turn count, the opening role, a
    strict user/assistant alternation verdict, mean turn length (exact
    integer e4 half-up — the corpus_report recipe), and the keep flag
    training pipelines filter on (opens with user, alternates, >= 2
    turns). This is the conversation-table analogue of gopher_quality.

    Scale: ONE exchange — the conv_id window computes the
    alternation flags and the groupBy on conv_id reuses its
    partitioning; everything else is expression-level."""
    t = _conv_turns(spark, sf_dir)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    prev_role = F.lag("role").over(w)
    flags = t.withColumn(
        "alt",
        (prev_role.isNull() | (prev_role != F.col("role"))).cast("int"))
    agg = flags.groupBy("conv_id").agg(
        F.count("*").cast("long").alias("n_turns_l"),
        F.sum((F.col("role") == "user").cast("int")).cast("int")
         .alias("n_user"),
        F.min_by("role", "turn_idx").alias("first_role"),
        (F.sum("alt") == F.count("*")).cast("int").alias("alternates"),
        F.sum(F.length("text").cast("long")).alias("total_chars"))
    return (agg.select(
        "conv_id",
        F.col("n_turns_l").cast("int").alias("n_turns"),
        "n_user", "first_role", "alternates",
        F.expr("(total_chars * 20000 + n_turns_l) div (2 * n_turns_l)")
         .alias("mean_turn_chars_e4"))
        .withColumn(
            "keep",
            ((F.col("first_role") == "user")
             & (F.col("alternates") == 1)
             & (F.col("n_turns") >= 2)).cast("int")))


_BPE_ROUNDS = 3


def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE merge training (Sennrich et al. 2016, word-level
    tokens): ``_BPE_ROUNDS`` rounds of corpus-wide adjacent-pair
    counting, each followed by greedy left-to-right application of the
    winning merge before the next count — the actual training loop, not
    just one counting pass. The merge applies via the double-space
    trick (every token gap widened to two spaces so one-space-padded
    pair patterns at adjacent occurrences never overlap), which makes
    plain REPLACE semantics — leftmost, non-overlapping, identical in
    Spark and DuckDB — implement exact greedy BPE application.

    Scale: per round, ONE map-side-combined aggregation keyed by the
    (vocabulary-bounded) pair space plus a 1-row TakeOrdered collect —
    the same bounded-driver-round-trip shape as lm_perplexity/dsir; the
    merge application is expression-level inside the next round's scan.
    Rounds are sequential by nature (each count depends on the previous
    merge), exactly like production BPE trainers."""
    cur = _docs(spark, sf_dir, parallel=True).select("text")
    rows = []
    for r in range(_BPE_ROUNDS):
        top = (_adjacent_pairs(cur)
               .groupBy("a", "b").agg(F.count("*").alias("c"))
               .orderBy(F.desc("c"), "a", "b")
               .limit(1).collect())  # bounded: exactly one row
        (a, b, c) = (top[0]["a"], top[0]["b"], int(top[0]["c"]))
        rows.append((r, a, b, c))
        spaced = F.concat(F.lit(" "),
                          F.replace(F.col("text"), F.lit(" "), F.lit("  ")),
                          F.lit(" "))
        merged = F.replace(spaced,
                           F.lit(" %s  %s " % (a, b)),
                           F.lit(" %s_%s " % (a, b)))
        cur = cur.select(
            F.trim(F.replace(merged, F.lit("  "), F.lit(" ")))
             .alias("text"))
    return spark.createDataFrame(
        rows, "merge_round int, a string, b string, pair_count bigint")


def bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION — the downstream half of bpe_train_merges:
    re-fit the ``_BPE_ROUNDS`` merges (same bounded 1-row argmax
    collects), apply them to every document with the double-space
    REPLACE chain, and report per-doc token counts before and after —
    the compression-ratio table a tokenizer rollout is judged on.

    Scale: the fit is bpe_train_merges' shape; the application is pure
    expression-level REPLACE inside one scan stage (no Python, no
    exchange beyond the fit's aggregations)."""
    cur = _docs(spark, sf_dir, parallel=True).select(
        "doc_id", "text",
        F.size(F.split("text", " ")).cast("int").alias("n_tokens_before"))
    for _r in range(_BPE_ROUNDS):
        top = (_adjacent_pairs(cur)
               .groupBy("a", "b").agg(F.count("*").alias("c"))
               .orderBy(F.desc("c"), "a", "b")
               .limit(1).collect())  # bounded: exactly one row
        (a, b) = (top[0]["a"], top[0]["b"])
        spaced = F.concat(F.lit(" "),
                          F.replace(F.col("text"), F.lit(" "), F.lit("  ")),
                          F.lit(" "))
        merged = F.replace(spaced,
                           F.lit(" %s  %s " % (a, b)),
                           F.lit(" %s_%s " % (a, b)))
        cur = cur.select(
            "doc_id", "n_tokens_before",
            F.trim(F.replace(merged, F.lit("  "), F.lit(" ")))
             .alias("text"))
    return cur.select(
        "doc_id", "n_tokens_before",
        F.size(F.split("text", " ")).cast("int").alias("n_tokens_after"))


def _bpe_encode_oracle(rounds: int = _BPE_ROUNDS) -> str:
    """doc_id-threaded variant of _bpe_merges_oracle's CTE chain, final
    select = per-doc before/after token counts."""
    ctes = ["t0 AS (SELECT doc_id, text FROM documents)"]
    for r in range(rounds):
        ctes.append(f"""p{r} AS (
          SELECT w[i] AS a, w[i + 1] AS b, COUNT(*)::BIGINT AS c
          FROM (SELECT STRING_SPLIT(text, ' ') AS w FROM t{r}),
               UNNEST(RANGE(1, LEN(w))) AS t(i)
          GROUP BY a, b ORDER BY c DESC, a, b LIMIT 1)""")
        ctes.append(f"""t{r + 1} AS (
          SELECT doc_id, TRIM(REPLACE(REPLACE(
                   ' ' || REPLACE(t.text, ' ', '  ') || ' ',
                   ' ' || p.a || '  ' || p.b || ' ',
                   ' ' || p.a || '_' || p.b || ' '),
                 '  ', ' ')) AS text
          FROM t{r} t, p{r} p)""")
    return ("WITH " + ",\n".join(ctes) + f"""
        SELECT d.doc_id,
               LEN(STRING_SPLIT(d.text, ' '))::INT AS n_tokens_before,
               LEN(STRING_SPLIT(t{rounds}.text, ' '))::INT
                 AS n_tokens_after
        FROM documents d JOIN t{rounds} USING (doc_id)""")


def _bpe_merges_oracle(rounds: int = _BPE_ROUNDS) -> str:
    """Unrolled-CTE oracle (the pagerank pattern): round r's argmax
    pair is recomputed from scratch over the text with rounds 0..r-1's
    merges applied via the same double-space REPLACE."""
    ctes = ["t0 AS (SELECT text FROM documents)"]
    sels = []
    for r in range(rounds):
        ctes.append(f"""p{r} AS (
          SELECT w[i] AS a, w[i + 1] AS b, COUNT(*)::BIGINT AS c
          FROM (SELECT STRING_SPLIT(text, ' ') AS w FROM t{r}),
               UNNEST(RANGE(1, LEN(w))) AS t(i)
          GROUP BY a, b ORDER BY c DESC, a, b LIMIT 1)""")
        ctes.append(f"""t{r + 1} AS (
          SELECT TRIM(REPLACE(REPLACE(
                   ' ' || REPLACE(t.text, ' ', '  ') || ' ',
                   ' ' || p.a || '  ' || p.b || ' ',
                   ' ' || p.a || '_' || p.b || ' '),
                 '  ', ' ')) AS text
          FROM t{r} t, p{r} p)""")
        sels.append(f"SELECT {r}::INT AS merge_round, a, b,"
                    f" c AS pair_count FROM p{r}")
    return ("WITH " + ",\n".join(ctes) + "\n"
            + "\nUNION ALL\n".join(sels))


def seqlen_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length histogram (the packing/batching diagnostic every
    training-prep pipeline reports): documents bucketed by token count
    in width-16 bins, with per-bin counts and min/max — the table that
    sizes pack_sequences' budget and flags truncation exposure.

    Scale: one map-side-combined aggregation on the (tiny) bucket key
    space; token counting is expression-level in the scan."""
    d = _docs(spark, sf_dir)
    return (d.select(F.size(F.split("text", " ")).cast("long")
                      .alias("n_tok"))
            .select(F.expr("n_tok div 16").alias("bucket"), "n_tok")
            .groupBy("bucket")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.min("n_tok").alias("min_tokens"),
                 F.max("n_tok").alias("max_tokens")))


ORACLES: dict[str, str] = {
    "seqlen_histogram": """
        SELECT (LEN(STRING_SPLIT(text, ' '))::BIGINT // 16) AS bucket,
               COUNT(*)::BIGINT AS n_docs,
               MIN(LEN(STRING_SPLIT(text, ' '))::BIGINT) AS min_tokens,
               MAX(LEN(STRING_SPLIT(text, ' '))::BIGINT) AS max_tokens
        FROM documents
        GROUP BY bucket
    """,
    "conversation_quality": """
        WITH turns AS (
          SELECT 'conv-' || LPAD((doc_id % 50)::VARCHAR, 4, '0') AS conv_id,
                 (doc_id // 50)::INT AS turn_idx,
                 CASE WHEN (doc_id // 50) % 2 = 0 THEN 'user'
                      ELSE 'assistant' END AS role,
                 text
          FROM documents
        ), flagged AS (
          SELECT *,
                 CASE WHEN LAG(role) OVER w IS NULL
                        OR LAG(role) OVER w <> role
                      THEN 1 ELSE 0 END AS alt
          FROM turns
          WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
        )
        SELECT conv_id,
               COUNT(*)::INT AS n_turns,
               SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END)::INT
                 AS n_user,
               ARG_MIN(role, turn_idx) AS first_role,
               (CASE WHEN SUM(alt) = COUNT(*) THEN 1 ELSE 0 END)::INT
                 AS alternates,
               (SUM(LENGTH(text))::BIGINT * 20000 + COUNT(*))
                 // (2 * COUNT(*)) AS mean_turn_chars_e4,
               (CASE WHEN ARG_MIN(role, turn_idx) = 'user'
                      AND SUM(alt) = COUNT(*)
                      AND COUNT(*) >= 2
                     THEN 1 ELSE 0 END)::INT AS keep
        FROM flagged
        GROUP BY conv_id
    """,
    "bpe_pair_counts": """
        SELECT a, b, COUNT(*)::BIGINT AS pair_count
        FROM (SELECT STRING_SPLIT(text, ' ') AS w FROM documents),
             UNNEST(RANGE(1, LEN(w))) AS t(i),
             LATERAL (SELECT w[i] AS a, w[i + 1] AS b) s
        GROUP BY a, b
        ORDER BY pair_count DESC, a, b
        LIMIT 20
    """,
    "context_truncate": """
        WITH turns AS (
          SELECT 'conv-' || LPAD((doc_id %% 50)::VARCHAR, 4, '0')
                   AS conv_id,
                 (doc_id // 50)::INT AS turn_idx,
                 CASE WHEN (doc_id // 50) %% 2 = 0 THEN 'user'
                      ELSE 'assistant' END AS role,
                 text
          FROM documents
        ), sized AS (
          SELECT conv_id, turn_idx,
                 LENGTH('<|' || role || '|>') + 1
                 + LENGTH(text) + 8 AS seg_len
          FROM turns
        )
        SELECT conv_id, turn_idx,
               SUM(seg_len) OVER (
                 PARTITION BY conv_id ORDER BY turn_idx DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               )::BIGINT AS suffix_chars,
               (CASE WHEN SUM(seg_len) OVER (
                  PARTITION BY conv_id ORDER BY turn_idx DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  <= %(budget)d THEN 1 ELSE 0 END)::INT AS kept
        FROM sized
    """ % {"budget": _CONTEXT_BUDGET},
    "fim_transform": """
        WITH sp AS (
          SELECT doc_id, text, LENGTH(text) AS n,
                 LEAST(LENGTH(text) // 4 + doc_id % 7,
                       LEAST(LENGTH(text) // 4 + doc_id % 7
                             + LENGTH(text) // 3 + 1,
                             LENGTH(text))) AS a,
                 LEAST(LENGTH(text) // 4 + doc_id % 7
                       + LENGTH(text) // 3 + 1, LENGTH(text)) AS b
          FROM documents
        )
        SELECT doc_id,
               (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)::INT
                 AS fim_applied,
               CASE WHEN doc_id % 2 = 0 THEN
                 '<PRE>' || SUBSTR(text, 1, a)
                 || '<SUF>' || SUBSTR(text, b + 1)
                 || '<MID>' || SUBSTR(text, a + 1, b - a)
               ELSE text END AS out_text
        FROM sp
    """,
    "chat_template": """
        WITH turns AS (
          SELECT 'conv-' || LPAD((doc_id % 50)::VARCHAR, 4, '0')
                   AS conv_id,
                 (doc_id // 50)::INT AS turn_idx,
                 CASE WHEN (doc_id // 50) % 2 = 0 THEN 'user'
                      ELSE 'assistant' END AS role,
                 text
          FROM documents
        )
        SELECT conv_id, COUNT(*)::INT AS n_turns,
               STRING_AGG('<|' || role || '|>' || CHR(10) || text
                          || '<|end|>' || CHR(10), ''
                          ORDER BY turn_idx) AS rendered
        FROM turns GROUP BY conv_id
    """,
    "loss_mask_spans": """
        WITH turns AS (
          SELECT 'conv-' || LPAD((doc_id % 50)::VARCHAR, 4, '0')
                   AS conv_id,
                 (doc_id // 50)::INT AS turn_idx,
                 CASE WHEN (doc_id // 50) % 2 = 0 THEN 'user'
                      ELSE 'assistant' END AS role,
                 text
          FROM documents
        ), sized AS (
          SELECT conv_id, turn_idx, role,
                 LENGTH('<|' || role || '|>') + 1 AS open_len,
                 LENGTH(text) AS text_len
          FROM turns
        ), pos AS (
          SELECT conv_id, turn_idx, role, open_len, text_len,
                 COALESCE(SUM(open_len + text_len + 8) OVER (
                   PARTITION BY conv_id ORDER BY turn_idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS prior
          FROM sized
        )
        SELECT conv_id, turn_idx,
               (prior + open_len)::BIGINT AS span_start,
               (prior + open_len + text_len)::BIGINT AS span_end
        FROM pos WHERE role = 'assistant'
    """,
}

ORACLES["bpe_train_merges"] = _bpe_merges_oracle()
ORACLES["bpe_encode"] = _bpe_encode_oracle()

QUERIES = {
    "fim_transform": fim_transform,
    "bpe_pair_counts": bpe_pair_counts,
    "bpe_train_merges": bpe_train_merges,
    "bpe_encode": bpe_encode,
    "seqlen_histogram": seqlen_histogram,
    "chat_template": chat_template,
    "loss_mask_spans": loss_mask_spans,
    "context_truncate": context_truncate,
    "conversation_quality": conversation_quality,
}
