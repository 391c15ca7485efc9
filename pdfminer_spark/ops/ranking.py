"""Ranking signals for web-scale corpus curation: PageRank over a link
graph and BM25 query relevance.

Both are classic quality/relevance signals a 100 TB crawl-curation
pipeline computes before sampling (PageRank as a document-quality prior,
BM25 for targeted retrieval of seed-relevant documents). Both are
expressed in exact integer micro-units so Spark and the DuckDB oracle
agree bit-for-bit (the repo's standing fixed-point recipe: floats only
enter via one driver-side CPython ``math.log`` table, everything
distributed is BIGINT arithmetic).

The link graph is synthesized deterministically from ``doc_id`` (the
corpus has no real hyperlinks): node ``d`` links to ``(7*d + g) % N``
for ``g`` in ``1 .. 1 + d % 3`` — variable out-degree, so in-degrees
(and therefore converged ranks) genuinely differ across nodes and a
mis-keyed join cannot hide behind graph symmetry. A real web graph is
additionally skewed on popular targets, which the standard remedies
(AQE skew-join on the contribution shuffle, or salting the top
in-degree keys) handle without changing this plan shape.
"""
from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_PR_ITERS = 5
_PR_MAX_DEG = 3
# damping 0.85 in micro-units: r' = 150_000 + (85 * insum) div 100
_BM25_QUERY = ("join", "filter", "dup", "scan")
_BM25_TOPK = 20


def pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5 power iterations of PageRank (damping 0.85) in integer
    micro-units: ranks start at 1_000_000 per node; each iteration
    every node sends ``rank div out_degree`` along its out-edges and
    sets ``150_000 + (85 * inbound_sum) div 100``. Truncating division
    on non-negative BIGINTs is identical in Spark and DuckDB, so the
    fixed iteration count yields bit-equal ranks with no float in the
    distributed plan.

    Scale shape: the canonical iterative-graph plan — per iteration ONE
    shuffle join (ranks x edges on src) and ONE aggregation shuffle
    (sum by dst). Edges are materialized once (localCheckpoint) because
    all K iterations re-read them; rank lineage stays linear in K (the
    connected-components op in textops.py learned the hard way that
    self-referencing iteration without materialization grows plans
    quadratically). At 100 TB one would additionally pre-partition
    edges by src so the per-iteration join is co-located; K is a fixed
    small constant, not data-dependent.

    The single ``count()`` is one scalar (graph order N) — same bounded
    driver round-trip precedent as lm_perplexity/dsir_weights.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    nodes = docs.select(F.col("doc_id").alias("node"))
    n = nodes.count()  # one scalar: the modulus of the synthetic graph
    dsts = F.slice(
        F.array(*[(F.col("node") * 7 + g) % n
                  for g in range(1, _PR_MAX_DEG + 1)]),
        F.lit(1), (F.col("node") % 3 + 1).cast("int"))
    edges = nodes.select(F.col("node").alias("src"),
                         (F.col("node") % 3 + 1).alias("deg"),
                         F.explode(dsts).alias("dst"))
    # referenced by every iteration — materialize once
    edges = edges.localCheckpoint(eager=True)
    nodes = nodes.localCheckpoint(eager=True)
    ranks = nodes.select("node", F.lit(1_000_000).cast("long").alias("r"))
    for _ in range(_PR_ITERS):
        contrib = (edges.join(ranks, edges["src"] == ranks["node"])
                   .groupBy("dst")
                   .agg(F.sum(F.expr("r div deg")).alias("insum")))
        ranks = (nodes.join(contrib, F.col("node") == F.col("dst"), "left")
                 .select("node",
                         F.expr("150000 + (85 * coalesce(insum, 0L)) div 100")
                         .cast("long").alias("r")))
    return ranks.select(F.col("node").alias("doc_id"),
                        F.col("r").alias("rank6"))


def bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents by BM25 (k1=1.2, b=0.75) for a fixed query over
    the corpus vocabulary, scored in exact integer micro-units.

    With k1 = 6/5 and b = 3/4, multiplying the per-term score's
    numerator and denominator by 10*L (L = total corpus tokens) gives

        score6 = (idf6 * 22 * tf * L) div (10*L*tf + 3*L + 9*dl*N)

    — all-BIGINT once idf6 is fixed. idf6 = floor(1e6 * ln((2N+2) /
    (2*df+1))) (the Robertson idf, rewritten as a ratio of exact
    integers) is computed on the DRIVER with CPython's math.log from a
    bounded collect (one row per query term, ≤4 rows — the
    dsir_weights precedent) and broadcast back as a literal table;
    DuckDB's LN is the same glibc libm, verified across 3 SFs.
    int64 bound: idf6*22*tf*L < 2^63 for tf*L < 4.5e10 — holds by orders
    of magnitude at test SFs; a real 100 TB deployment scores in doubles
    (ranking does not need bit-determinism outside this oracle gate).

    Scale shape: tf is one shuffle on (doc_id, token) with map-side
    combine, df/N/L are one tiny aggregation, the idf table is a
    broadcast join, and the final top-k is TakeOrderedAndProject — no
    corpus-wide sort, no unpartitioned window (rank is computed on the
    20 collected rows' worth of data only via the global LIMIT).
    """
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # ONE tokenization pass, NO explode (r8: the r7 plan tokenized the
    # whole corpus three times — N/L agg, df agg, tf agg — each behind
    # its own Generate): per-doc dl and the per-query-term tf are array
    # expressions over a single split, materialized once (the frame is
    # tiny: doc_id + 5 longs) and reused by the stats agg and the
    # scoring projection. Same shuffle-free TakeOrderedAndProject tail.
    words = F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                     lambda w: w != "")
    tf_cols = [F.size(F.filter(F.col("w"), lambda x: x == t))
               .cast("long").alias("tf_%d" % i)
               for (i, t) in enumerate(_BM25_QUERY)]
    per_doc = (d.select("doc_id", words.alias("w"))
               .select("doc_id", F.size("w").cast("long").alias("dl"),
                       *tf_cols)
               .localCheckpoint(eager=True))
    # N docs (with >= 1 token), L total tokens, df per term: ONE
    # aggregation collecting 6 scalars (the dsir_weights precedent)
    stats = per_doc.agg(
        F.sum((F.col("dl") > 0).cast("long")).alias("n"),
        F.sum("dl").alias("l"),
        *[F.sum((F.col("tf_%d" % i) > 0).cast("long")).alias("df_%d" % i)
          for i in range(len(_BM25_QUERY))]).collect()[0]
    n, l = int(stats["n"]), int(stats["l"])
    dfs = {t: int(stats["df_%d" % i]) for (i, t) in enumerate(_BM25_QUERY)}
    idf6 = {t: int(math.floor(1e6 * math.log((2 * n + 2) / (2 * dfs[t] + 1))))
            for t in _BM25_QUERY}
    per_term = [
        F.when(F.col("tf_%d" % i) > 0,
               F.expr("({idf6}L * 22 * tf_{i} * {l}L) div "
                      "(10 * {l}L * tf_{i} + 3 * {l}L + 9 * dl * {n}L)"
                      .format(idf6=idf6[t], i=i, l=l, n=n)))
        .otherwise(F.lit(0).cast("long"))
        for (i, t) in enumerate(_BM25_QUERY)]
    any_term = None
    for i in range(len(_BM25_QUERY)):
        c = F.col("tf_%d" % i) > 0
        any_term = c if any_term is None else (any_term | c)
    s6 = per_term[0]
    for p in per_term[1:]:
        s6 = s6 + p
    scored = (per_doc.where(any_term)
              .select("doc_id", s6.alias("bm25_e6"))
              .orderBy(F.col("bm25_e6").desc(), F.col("doc_id").asc())
              .limit(_BM25_TOPK))
    w = Window.orderBy(F.col("bm25_e6").desc(), F.col("doc_id").asc())
    return scored.select(F.row_number().over(w).alias("rank"),
                         "doc_id", "bm25_e6")


_LIFT_VOCAB = 64
_LIFT_TOPK = 20


def cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 token pairs by document-co-occurrence lift — the
    association-mining pass corpus QA uses to spot template phrases and
    collocations. lift(a,b) = N * df(a,b) / (df(a) * df(b)), reported
    in exact integer micro-units (``(1e6 * N * df_ab) div (df_a *
    df_b)``) so no cross-engine log/float enters the ranking (PMI is
    the log of this; rank order is identical).

    Scale shape: the pair space is bounded by the VOCABULARY, not the
    corpus — presence sets are first filtered to the top-64 tokens by
    document frequency (a bounded TakeOrdered + broadcast, the dsir
    precedent), so the per-doc self-join emits at most C(64,2) pairs
    per document regardless of corpus size; pair counting is one
    map-side-combined aggregation. int64 bound: 1e6 * N * df_ab with
    df_ab <= N needs N < 3e6 — production lifts the constant or ranks
    by the equivalent cross-multiplication."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.filter(
            F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
            lambda w: w != ""))).alias("token"))
    df_tab = toks.groupBy("token").agg(F.count("*").alias("df"))
    vocab = [r["token"] for r in df_tab.orderBy(
        F.col("df").desc(), F.col("token").asc()).limit(_LIFT_VOCAB)
        .collect()]
    n = d.count()  # one scalar, like pagerank's graph order
    t = toks.where(F.col("token").isin(vocab))
    a = t.alias("a")
    b = t.alias("b")
    pairs = (a.join(b, (F.col("a.doc_id") == F.col("b.doc_id"))
                    & (F.col("a.token") < F.col("b.token")))
             .groupBy(F.col("a.token").alias("token_a"),
                      F.col("b.token").alias("token_b"))
             .agg(F.count("*").alias("df_ab")))
    dfa = df_tab.select(F.col("token").alias("token_a"),
                        F.col("df").alias("df_a"))
    dfb = df_tab.select(F.col("token").alias("token_b"),
                        F.col("df").alias("df_b"))
    scored = (pairs.join(F.broadcast(dfa), "token_a")
              .join(F.broadcast(dfb), "token_b")
              .select("token_a", "token_b", "df_ab",
                      F.expr("(1000000 * %dL * df_ab) div (df_a * df_b)"
                             % n).alias("lift6"))
              .orderBy(F.col("lift6").desc(), F.col("token_a").asc(),
                       F.col("token_b").asc())
              .limit(_LIFT_TOPK))
    w = Window.orderBy(F.col("lift6").desc(), F.col("token_a").asc(),
                       F.col("token_b").asc())
    return scored.select(F.row_number().over(w).alias("rank"),
                         "token_a", "token_b", "df_ab", "lift6")


def _pr_oracle() -> str:
    ctes = [
        "nn AS (SELECT COUNT(*) AS c FROM documents)",
        """e AS (
          SELECT doc_id AS src, doc_id % 3 + 1 AS deg,
                 (doc_id * 7 + g.g) % (SELECT c FROM nn) AS dst
          FROM documents CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS g) g
          WHERE g.g <= doc_id % 3 + 1)""",
        "r0 AS (SELECT doc_id AS node, 1000000::BIGINT AS r FROM documents)",
    ]
    prev = "r0"
    for i in range(1, _PR_ITERS + 1):
        ctes.append("""r{i} AS (
          SELECT d.doc_id AS node,
                 (150000 + (85 * COALESCE(s.insum, 0)) // 100)::BIGINT AS r
          FROM documents d LEFT JOIN (
            SELECT e.dst AS node, (SUM(r.r // e.deg))::BIGINT AS insum
            FROM e JOIN {prev} r ON r.node = e.src GROUP BY e.dst) s
          ON s.node = d.doc_id)""".format(i=i, prev=prev))
        prev = "r%d" % i
    return ("WITH " + ",\n".join(ctes) +
            "\nSELECT node AS doc_id, r AS rank6 FROM " + prev)


ORACLES: dict[str, str] = {
    "pagerank": _pr_oracle(),
    "bm25_scores": """
        WITH toks AS (
          SELECT doc_id, LEN(w) AS dl, UNNEST(w) AS token FROM (
            SELECT doc_id,
                   LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '[^a-z0-9]+'),
                               x -> x <> '') AS w
            FROM documents)
        ), nl AS (
          SELECT COUNT(DISTINCT doc_id) AS n, COUNT(*)::BIGINT AS l FROM toks
        ), idf AS (
          SELECT token,
                 FLOOR(1e6 * LN((2 * (SELECT n FROM nl) + 2)
                                / (2 * COUNT(DISTINCT doc_id) + 1)))::BIGINT
                   AS idf6
          FROM toks WHERE token IN ({terms}) GROUP BY token
        ), tf AS (
          SELECT doc_id, token, dl, COUNT(*)::BIGINT AS tf
          FROM toks WHERE token IN ({terms}) GROUP BY doc_id, token, dl
        ), scored AS (
          SELECT tf.doc_id,
                 (SUM((idf.idf6 * 22 * tf.tf * nl.l)
                      // (10 * nl.l * tf.tf + 3 * nl.l
                          + 9 * tf.dl * nl.n)))::BIGINT AS bm25_e6
          FROM tf JOIN idf USING (token) CROSS JOIN nl
          GROUP BY tf.doc_id
          ORDER BY bm25_e6 DESC, tf.doc_id ASC LIMIT {k}
        )
        SELECT ROW_NUMBER() OVER (ORDER BY bm25_e6 DESC, doc_id ASC) AS rank,
               doc_id, bm25_e6
        FROM scored
    """.format(terms=", ".join("'%s'" % t for t in _BM25_QUERY),
               k=_BM25_TOPK),
}

ORACLES["cooccurrence_lift"] = """
    WITH toks AS (
      SELECT DISTINCT doc_id, token FROM (
        SELECT doc_id,
               UNNEST(LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text),
                                                     '[^a-z0-9]+'),
                                  x -> x <> '')) AS token
        FROM documents)
    ), dfreq AS (
      SELECT token, COUNT(*)::BIGINT AS df FROM toks GROUP BY token
    ), vocab AS (
      SELECT token, df FROM dfreq
      ORDER BY df DESC, token ASC LIMIT {v}
    ), tv AS (
      SELECT t.doc_id, t.token FROM toks t JOIN vocab USING (token)
    ), pairs AS (
      SELECT a.token AS token_a, b.token AS token_b,
             COUNT(*)::BIGINT AS df_ab
      FROM tv a JOIN tv b
        ON a.doc_id = b.doc_id AND a.token < b.token
      GROUP BY a.token, b.token
    ), scored AS (
      SELECT token_a, token_b, df_ab,
             ((1000000 * (SELECT COUNT(*) FROM documents) * df_ab)
              // (da.df * db.df))::BIGINT AS lift6
      FROM pairs
      JOIN dfreq da ON da.token = pairs.token_a
      JOIN dfreq db ON db.token = pairs.token_b
      ORDER BY lift6 DESC, token_a ASC, token_b ASC LIMIT {k}
    )
    SELECT ROW_NUMBER() OVER (ORDER BY lift6 DESC, token_a ASC,
                              token_b ASC) AS rank,
           token_a, token_b, df_ab, lift6
    FROM scored
""".format(v=_LIFT_VOCAB, k=_LIFT_TOPK)

QUERIES = {
    "pagerank": pagerank,
    "bm25_scores": bm25_scores,
    "cooccurrence_lift": cooccurrence_lift,
}
