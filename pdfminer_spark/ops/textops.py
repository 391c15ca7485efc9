"""Training-data text operators over the ``documents`` table.

Large-scale pipeline primitives (dedup, quality, language-ID, token
counting, fingerprinting), each built from JVM-side Spark SQL functions —
no Python UDFs in any of these paths — with DuckDB oracle SQL.

Cross-engine determinism rule: any hash used in a comparison is md5 (hex
string in both engines); numeric derivations are rounded on both sides.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# -- exact dedup ---------------------------------------------------------------

def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content, keep the smallest doc_id.

    Scale: shuffle on md5(text) (uniform by construction — no skew);
    only the 32-byte digest travels, not the document text."""
    d = _docs(spark, sf_dir)
    return (
        d.select(F.md5("text").alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"),
             F.count("*").alias("n_copies"))
    )


# -- MinHash signatures (n-gram shingles) ---------------------------------------

_N_HASHES = 4


def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature per document over word-3-gram shingles.

    shingle -> md5(shingle + seed) -> per-doc min: the classic
    shingle/minhash construction; band-bucket joining happens downstream
    (dedup_minhash_buckets). Hashes are md5 hex strings so the DuckDB
    oracle computes identical values; min() over hex strings is a valid
    uniform min (lexicographic order of a uniform hash).

    Scale: explode(shingles) is the heavy stage — the shuffle carries
    (doc_id, 16-byte digest) pairs only; partial min aggregation happens
    map-side."""
    d = _docs(spark, sf_dir)
    words = F.split(F.lower(F.col("text")), "[^a-z0-9]+")
    ngram_idx = F.sequence(F.lit(0), F.greatest(F.size(words) - 3, F.lit(0)))
    shingles = F.transform(
        ngram_idx,
        lambda i: F.concat_ws(" ", words[i], words[i + 1], words[i + 2]),
    )
    exploded = d.select("doc_id", F.explode(shingles).alias("shingle"))
    # one md5 per shingle, sliced into 4 independent 32-bit (8-hex) hash
    # values — 4x less hashing than salted re-hashing, same minhash math
    h = F.md5(F.col("shingle"))
    aggs = [
        F.min(F.substring(h, 8 * j + 1, 8)).alias("sig%d" % j)
        for j in range(_N_HASHES)
    ]
    return exploded.groupBy("doc_id").agg(*aggs)


def dedup_minhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH band-bucket grouping: docs sharing any signature band are
    dup candidates. Band = one md5 minhash here (r=1, b=4).

    Scale: groupBy on the band value — the bucket-join pattern that
    replaces the O(n^2) pairwise comparison at corpus scale."""
    sigs = dedup_minhash(spark, sf_dir)
    bands = sigs.select(
        "doc_id",
        F.explode(F.array(*[F.concat_ws(":", F.lit(str(j)), "sig%d" % j)
                            for j in range(_N_HASHES)])).alias("band"),
    )
    return (
        bands.groupBy("band")
        .agg(F.count("*").alias("bucket_size"),
             F.min("doc_id").alias("min_doc_id"),
             F.max("doc_id").alias("max_doc_id"))
        .filter(F.col("bucket_size") > 1)
    )


# -- SimHash ---------------------------------------------------------------------

_SIMHASH_BITS = 16


def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash over distinct tokens: bit_j = sign of the sum of
    (2*b_j(token) - 1) across tokens, where b_j comes from the first 4 hex
    digits of md5(token) (cross-engine stable: md5 + strpos arithmetic,
    no engine-specific hash).

    Scale: explode + groupBy(doc) — partial sums map-side; near-dup
    candidates then bucket on the fingerprint (hamming-adjacent probing
    downstream)."""
    d = _docs(spark, sf_dir)
    tokens = F.explode(F.array_distinct(F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda w: w != ""))
    ).alias("token")
    t = d.select("doc_id", tokens)
    h = F.md5(F.col("token"))
    # nibble value of hex digit k (1-based): strpos('0123..f', digit) - 1
    digit_val = [
        F.instr(F.lit("0123456789abcdef"), F.substring(h, k + 1, 1)) - 1
        for k in range(4)
    ]
    bit_cols = []
    for j in range(_SIMHASH_BITS):
        nib = digit_val[j // 4]
        bit = F.floor(nib / (2 ** (j % 4))) % 2
        bit_cols.append((bit * 2 - 1).alias("b%d" % j))
    summed = t.select("doc_id", *bit_cols).groupBy("doc_id").agg(
        *[F.sum("b%d" % j).alias("s%d" % j) for j in range(_SIMHASH_BITS)])
    fp = F.lit(0)
    for j in range(_SIMHASH_BITS):
        fp = fp + F.when(F.col("s%d" % j) > 0, 2 ** j).otherwise(0)
    return summed.select("doc_id", fp.cast("int").alias("simhash"))


# -- exact n-gram Jaccard ----------------------------------------------------------

def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise Jaccard over word-3-gram shingle sets for docs in
    the same exact-length bucket (bounded candidate set), J >= 0.2.

    The brute-force baseline the MinHash/LSH path approximates; at corpus
    scale only the LSH candidates are compared."""
    d = _docs(spark, sf_dir)
    words = F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                     lambda w: w != "")
    idx = F.sequence(F.lit(1), F.greatest(F.size(words) - 2, F.lit(1)))
    shingles = F.array_distinct(F.transform(
        idx, lambda i: F.concat_ws(" ", F.element_at(words, i),
                                   F.element_at(words, i + 1),
                                   F.element_at(words, i + 2))))
    base = d.select("doc_id", shingles.alias("sh"),
                    F.size(shingles).alias("n_sh"))
    a = base.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"),
                    F.col("n_sh").alias("n_a"))
    b = base.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"),
                    F.col("n_sh").alias("n_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = F.round(inter / (F.col("n_a") + F.col("n_b") - inter), 4)
    # equi-join on a shingle-count bucket bounds the candidate set (the
    # O(n^2) cross product never materializes; near-dups have near-equal
    # lengths, so same-bucket comparison catches J >= 0.2 pairs)
    return (
        a.join(b, (F.col("id_a") < F.col("id_b"))
               & (F.floor(F.col("n_a") / 16) == F.floor(F.col("n_b") / 16)))
        .select("id_a", "id_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= 0.2)
    )


# -- document fingerprint --------------------------------------------------------

def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive content fingerprint: md5 over the sorted distinct
    token set (rolling-hash analog; robust to whitespace reflow)."""
    d = _docs(spark, sf_dir)
    tokens = F.array_sort(F.array_distinct(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+")))
    return d.select(
        "doc_id",
        F.md5(F.array_join(tokens, " ")).alias("fingerprint"),
        F.size(tokens).alias("n_distinct_tokens"),
    )


# -- token counting ----------------------------------------------------------------

def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens + a BPE-ish subword proxy (runs of letters,
    digits, or single punctuation — the usual pretokenizer regex)."""
    d = _docs(spark, sf_dir)
    ws = F.size(F.split(F.trim(F.col("text")), "\\s+"))
    bpe = F.size(F.regexp_extract_all(
        F.col("text"), F.lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), F.lit(0)))
    return d.select(
        "doc_id",
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        F.length("text").alias("n_chars"),
    )


# -- quality scoring -----------------------------------------------------------------

_STOPWORDS = ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"]


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality features: length, punctuation ratio, stopword
    ratio, mean word length (the Gopher/C4-style filters)."""
    d = _docs(spark, sf_dir)
    n_chars = F.length("text")
    words = F.split(F.lower(F.col("text")), "[^a-z0-9']+")
    words_clean = F.filter(words, lambda w: w != "")
    n_words = F.size(words_clean)
    n_punct = F.length("text") - F.length(
        F.regexp_replace("text", "[.,!?;:]", ""))
    n_stop = F.size(F.filter(words_clean, lambda w: w.isin(*_STOPWORDS)))
    mean_wlen = F.round(
        F.aggregate(words_clean, F.lit(0).cast("double"),
                    lambda acc, w: acc + F.length(w)) /
        F.greatest(n_words, F.lit(1)), 4)
    return d.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(n_stop / F.greatest(n_words, F.lit(1)), 6).alias("stop_ratio"),
        mean_wlen.alias("mean_word_len"),
    )


# -- language id -------------------------------------------------------------------

def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language heuristic (en/de/fr/es) + CJK codepoint
    check; deterministic CASE cascade."""
    d = _docs(spark, sf_dir)
    low = F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" "))

    def votes(stops: list[str]):
        expr = F.lit(0)
        for s in stops:
            expr = expr + F.when(low.contains(" %s " % s), 1).otherwise(0)
        return expr

    en = votes(["the", "and", "is", "of", "to"])
    de = votes(["der", "die", "und", "ist", "nicht"])
    fr = votes(["le", "la", "et", "est", "les"])
    es = votes(["el", "los", "es", "una", "que"])
    has_cjk = F.when(
        F.length(F.regexp_replace("text", "[^\\u3040-\\u30ff\\u4e00-\\u9fff]", ""))
        > 0, 1).otherwise(0)
    best = F.greatest(en, de, fr, es)
    lang = (F.when(has_cjk == 1, "cjk")
            .when(best == 0, "unknown")
            .when(en == best, "en")
            .when(de == best, "de")
            .when(fr == best, "fr")
            .otherwise("es"))
    return d.select("doc_id", lang.alias("lang_pred"),
                    en.alias("en_votes"), de.alias("de_votes"),
                    fr.alias("fr_votes"), es.alias("es_votes"))


_MINHASH_SIG_SQL = ", ".join(
    "MIN(SUBSTRING(MD5(shingle), %d, 8)) AS sig%d" % (8 * j + 1, j)
    for j in range(_N_HASHES)
)

ORACLES: dict[str, str] = {
    "dedup_exact": """
        SELECT MD5(text) AS content_hash,
               MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
        FROM documents GROUP BY MD5(text)
    """,
    "dedup_minhash": """
        WITH words AS (
          SELECT doc_id,
                 STRING_SPLIT_REGEX(LOWER(text), '[^a-z0-9]+') AS w
          FROM documents
        ), shingled AS (
          SELECT doc_id,
                 UNNEST([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                         FOR i IN RANGE(1, GREATEST(LEN(w) - 2, 1) + 1)])
                   AS shingle
          FROM words
        )
        SELECT doc_id, %s FROM shingled GROUP BY doc_id
    """ % _MINHASH_SIG_SQL,
    "doc_fingerprint": """
        WITH toks AS (
          SELECT doc_id,
                 LIST_SORT(LIST_DISTINCT(
                   STRING_SPLIT_REGEX(LOWER(text), '[^a-z0-9]+'))) AS t
          FROM documents
        )
        SELECT doc_id, MD5(ARRAY_TO_STRING(t, ' ')) AS fingerprint,
               LEN(t) AS n_distinct_tokens
        FROM toks
    """,
    "token_count": """
        SELECT doc_id,
               LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS ws_tokens,
               LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
                 AS bpe_tokens,
               LENGTH(text) AS n_chars
        FROM documents
    """,
    "quality_score": """
        WITH w AS (
          SELECT doc_id, text,
                 LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '[^a-z0-9'']+'),
                             x -> x <> '') AS words
          FROM documents
        )
        SELECT doc_id,
               LENGTH(text) AS n_chars,
               LEN(words) AS n_words,
               ROUND((LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[.,!?;:]',
                                                           '', 'g')))::DOUBLE
                     / GREATEST(LENGTH(text), 1), 6) AS punct_ratio,
               ROUND(LEN(LIST_FILTER(words, x -> x IN ('the','and','of','to',
                         'a','in','is','it','that','for')))::DOUBLE
                     / GREATEST(LEN(words), 1), 6) AS stop_ratio,
               ROUND(COALESCE(LIST_SUM(LIST_TRANSFORM(words,
                         x -> LENGTH(x))), 0)::DOUBLE
                     / GREATEST(LEN(words), 1), 4) AS mean_word_len
        FROM w
    """,
    "lang_id": """
        WITH t AS (
          SELECT doc_id, text, ' ' || LOWER(text) || ' ' AS low
          FROM documents
        ), v AS (
          SELECT doc_id, text,
            (CASE WHEN low LIKE '% the %' THEN 1 ELSE 0 END +
             CASE WHEN low LIKE '% and %' THEN 1 ELSE 0 END +
             CASE WHEN low LIKE '% is %' THEN 1 ELSE 0 END +
             CASE WHEN low LIKE '% of %' THEN 1 ELSE 0 END +
             CASE WHEN low LIKE '% to %' THEN 1 ELSE 0 END) AS en_votes,
            (CASE WHEN low LIKE '% der %' THEN 1 ELSE 0 END +
             CASE WHEN low LIKE '% die %' THEN 1 ELSE 0 END +
             CASE WHEN low LIKE '% und %' THEN 1 ELSE 0 END +
             CASE WHEN low LIKE '% ist %' THEN 1 ELSE 0 END +
             CASE WHEN low LIKE '% nicht %' THEN 1 ELSE 0 END) AS de_votes,
            (CASE WHEN low LIKE '% le %' THEN 1 ELSE 0 END +
             CASE WHEN low LIKE '% la %' THEN 1 ELSE 0 END +
             CASE WHEN low LIKE '% et %' THEN 1 ELSE 0 END +
             CASE WHEN low LIKE '% est %' THEN 1 ELSE 0 END +
             CASE WHEN low LIKE '% les %' THEN 1 ELSE 0 END) AS fr_votes,
            (CASE WHEN low LIKE '% el %' THEN 1 ELSE 0 END +
             CASE WHEN low LIKE '% los %' THEN 1 ELSE 0 END +
             CASE WHEN low LIKE '% es %' THEN 1 ELSE 0 END +
             CASE WHEN low LIKE '% una %' THEN 1 ELSE 0 END +
             CASE WHEN low LIKE '% que %' THEN 1 ELSE 0 END) AS es_votes
          FROM t
        )
        SELECT doc_id,
               CASE
                 WHEN LENGTH(REGEXP_REPLACE(text,
                      '[^\\x{3040}-\\x{30ff}\\x{4e00}-\\x{9fff}]', '', 'g')) > 0
                   THEN 'cjk'
                 WHEN GREATEST(en_votes, de_votes, fr_votes, es_votes) = 0
                   THEN 'unknown'
                 WHEN en_votes = GREATEST(en_votes, de_votes, fr_votes, es_votes)
                   THEN 'en'
                 WHEN de_votes = GREATEST(en_votes, de_votes, fr_votes, es_votes)
                   THEN 'de'
                 WHEN fr_votes = GREATEST(en_votes, de_votes, fr_votes, es_votes)
                   THEN 'fr'
                 ELSE 'es'
               END AS lang_pred,
               en_votes, de_votes, fr_votes, es_votes
        FROM v
    """,
}

_SIMHASH_SQL_BITS = []
for _j in range(_SIMHASH_BITS):
    _SIMHASH_SQL_BITS.append(
        "CASE WHEN SUM((FLOOR((STRPOS('0123456789abcdef', "
        "SUBSTRING(MD5(token), %d, 1)) - 1) / %d)::INT %% 2) * 2 - 1) > 0 "
        "THEN %d ELSE 0 END" % (_j // 4 + 1, 2 ** (_j % 4), 2 ** _j))

ORACLES["simhash"] = """
    WITH toks AS (
      SELECT doc_id,
             UNNEST(LIST_DISTINCT(LIST_FILTER(
               STRING_SPLIT_REGEX(LOWER(text), '[^a-z0-9]+'),
               x -> x <> ''))) AS token
      FROM documents
    )
    SELECT doc_id, (%s)::INT AS simhash
    FROM toks GROUP BY doc_id
""" % " + ".join(_SIMHASH_SQL_BITS)

ORACLES["ngram_jaccard_pairs"] = """
    WITH base AS (
      SELECT doc_id,
             LIST_DISTINCT([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
               FOR i IN RANGE(1, GREATEST(LEN(w) - 2, 1) + 1)]) AS sh
      FROM (SELECT doc_id,
                   LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '[^a-z0-9]+'),
                               x -> x <> '') AS w
            FROM documents)
    ), sized AS (
      SELECT doc_id, sh, LEN(sh) AS n_sh FROM base
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(LEN(LIST_INTERSECT(a.sh, b.sh))::DOUBLE /
                 (a.n_sh + b.n_sh - LEN(LIST_INTERSECT(a.sh, b.sh))), 4)
             AS jaccard
    FROM sized a JOIN sized b
      ON a.doc_id < b.doc_id
     AND FLOOR(a.n_sh / 16) = FLOOR(b.n_sh / 16)
    WHERE ROUND(LEN(LIST_INTERSECT(a.sh, b.sh))::DOUBLE /
                (a.n_sh + b.n_sh - LEN(LIST_INTERSECT(a.sh, b.sh))), 4) >= 0.2
"""

QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_minhash": dedup_minhash,
    "dedup_minhash_buckets": dedup_minhash_buckets,  # rows-only (LSH path)
    "simhash": simhash,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
    "doc_fingerprint": doc_fingerprint,
    "token_count": token_count,
    "quality_score": quality_score,
    "lang_id": lang_id,
}
