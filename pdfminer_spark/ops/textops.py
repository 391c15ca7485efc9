"""Training-data text operators over the ``documents`` table.

Large-scale pipeline primitives (dedup, quality, language-ID, token
counting, fingerprinting), each built from JVM-side Spark SQL functions —
no Python UDFs in any of these paths — with DuckDB oracle SQL.

Cross-engine determinism rule: any hash used in a comparison is md5 (hex
string in both engines); numeric derivations are rounded on both sides;
hex→int parsing is STRPOS arithmetic in SQL / ``conv`` in Spark.

MinHash construction (round-2, replaces the 4-slice md5 variant): one md5
per shingle yields two 32-bit values (h1, h2); the 64 permutations are
``(h1 + j*h2) mod P`` (Kirsch–Mitzenhauer double hashing, P prime >
2^32) — integer math both engines agree on exactly, and the per-shingle
hashing cost stays one md5 no matter how many permutations. Banding is
b=16 bands × r=4 rows: P(candidate) = 1-(1-J^4)^16 (J=0.8 → 0.9998,
J=0.5 → 0.64, J=0.2 → 0.025) — the standard near-dup operating curve.

Short-document rule (ANSI-safe): docs with fewer than 3 tokens produce
no 3-gram shingles and drop out of shingle-based outputs; the lookahead
terms are only evaluated under a ``size(words) >= 3`` guard so ANSI mode
never sees an out-of-bounds index (pyspark 4 defaults ANSI on). The
DuckDB oracles mirror the rule with ``WHERE LEN(w) >= 3``.
"""
from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _docs(spark: SparkSession, sf_dir: str,
          parallel: bool = False) -> DataFrame:
    """documents scan. ``parallel=True`` repartitions to the session's
    default parallelism before CPU-heavy per-row expression stages
    (shingle explode + hashing): the test corpus is one small parquet
    file, which Spark reads as a single partition — without the spread,
    a 32-core box runs the explode single-threaded. The shuffled payload
    is just (doc_id, text), a few MB; on a real multi-file 100 TB corpus
    the scan already yields thousands of partitions and AQE coalesces
    away any excess, so this is cheap insurance, not a scale cost."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if parallel:
        d = d.repartition(spark.sparkContext.defaultParallelism)
    return d


_HEX = "0123456789abcdef"


def _hex2int_sql(expr: str, start: int, n: int = 8) -> str:
    """DuckDB SQL: parse ``n`` hex chars of ``expr`` starting at 1-based
    ``start`` into a BIGINT (no engine-specific hex cast needed)."""
    terms = [
        "(STRPOS('%s', SUBSTR(%s, %d, 1)) - 1) * %d"
        % (_HEX, expr, start + k, 16 ** (n - 1 - k))
        for k in range(n)
    ]
    return "(" + " + ".join(terms) + ")"


def _hex2long(col, start: int):
    """Spark: parse 8 hex chars at 1-based ``start`` into a long."""
    return F.conv(F.substring(col, start, 8), 16, 10).cast("long")


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

_N_PERMS = 64
_BANDS = 16
_ROWS_PER_BAND = 4
_MH_PRIME = 4294967311  # smallest prime > 2^32


def _shingles_expr(words, keep_empty_tokens: bool):
    """Word-3-gram shingle array, guarded for <3-token docs (empty array:
    explode() then drops the doc). Lookahead indices are only reachable
    when size >= 3, so ANSI mode cannot throw INVALID_ARRAY_INDEX."""
    if keep_empty_tokens:
        idx = F.sequence(F.lit(0), F.size(words) - 3)
        built = F.transform(
            idx, lambda i: F.concat_ws(" ", words[i], words[i + 1],
                                       words[i + 2]))
    else:
        idx = F.sequence(F.lit(1), F.size(words) - 2)
        built = F.transform(
            idx, lambda i: F.concat_ws(" ", F.element_at(words, i),
                                       F.element_at(words, i + 1),
                                       F.element_at(words, i + 2)))
    empty = F.array().cast(T.ArrayType(T.StringType()))
    return F.when(F.size(words) >= 3, built).otherwise(empty)


def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-permutation MinHash signature per document over word-3-gram
    shingles (double-hashing construction, see module docstring).

    Scale: explode(shingles) is the heavy stage — the shuffle carries
    (doc_id, h1, h2) longs only; the 64 per-permutation mins aggregate
    map-side (partial min), so the reduce side sees one row per doc per
    partition."""
    return minhash_sigs_frame(_docs(spark, sf_dir, parallel=True))


def minhash_sigs_frame(d: DataFrame) -> DataFrame:
    """Frame-level MinHash signatures over any (doc_id, text) frame —
    split out (r5) so composed pipelines (curate_pdf_corpus) reuse the
    exact signature construction the oracles pin.

    r8 shape (guide §4.2, the ``_lsh_sigs`` precedent): tokenization
    stays JVM-side (ONE ``split`` — cross-engine semantics pinned), and
    the per-shingle work (3-gram join, md5, the 64 double-hash
    permutations, the mins) moves into one Arrow-batched mapInPandas
    with hashlib + a vectorized numpy (shingles x perms) min. The r7
    plan's interpreted per-element expression tree (Generate -> md5 ->
    conv -> 64-column projection -> 64-min hash aggregate) measured
    4.6 s at sf1.0 with the shingle-building ``transform`` alone at
    4.2 s; this path is 1.5 s, bit-equal on every signature (A/B'd
    exact at sf0.1 — ``" ".join`` == concat_ws(" ", ...) on non-null
    strings, ``int(hexdigest[k:k+8], 16)`` == conv(substring(md5)), and
    int64 ``(h1 + j*h2) mod P`` cannot overflow: h1, h2 < 2^32, j < 64).
    The ``size(words) >= 3`` pre-filter replicates explode()'s
    empty-shingle-array row drop."""
    import numpy as np
    import pandas as pd

    # no WHERE guard: size(words) >= 3 would evaluate the split a
    # second time per row — short docs are skipped inside the batch fn
    # instead (same rows dropped as explode()'s empty-array behavior)
    words = F.split(F.lower(F.col("text")), "[^a-z0-9]+")
    base = d.select("doc_id", words.alias("w"))
    perm_j = np.arange(_N_PERMS, dtype=np.int64)
    sig_ddl = "doc_id long, " + ", ".join(
        "sig%d long" % j for j in range(_N_PERMS))

    def fn(batches):
        import hashlib

        md5 = hashlib.md5
        for pdf in batches:
            ids, sigs = [], []
            for (doc_id, w) in zip(pdf["doc_id"], pdf["w"]):
                wl = list(w)
                if len(wl) < 3:
                    continue
                hs = [md5((" ".join(wl[i:i + 3])).encode("utf-8")).hexdigest()
                      for i in range(len(wl) - 2)]
                h1 = np.array([int(h[:8], 16) for h in hs], dtype=np.int64)
                h2 = np.array([int(h[8:16], 16) for h in hs], dtype=np.int64)
                sig = ((h1[:, None] + perm_j[None, :] * h2[:, None])
                       % _MH_PRIME).min(axis=0)
                ids.append(int(doc_id))
                sigs.append(sig)
            mat = (np.stack(sigs) if sigs
                   else np.zeros((0, _N_PERMS), dtype=np.int64))
            cols = {"doc_id": pd.Series(ids, dtype="int64")}
            for j in range(_N_PERMS):
                cols["sig%d" % j] = mat[:, j]
            yield pd.DataFrame(cols)

    return base.mapInPandas(fn, sig_ddl)


def _band_expr(j: int):
    cols = [F.col("sig%d" % k).cast("string")
            for k in range(_ROWS_PER_BAND * j, _ROWS_PER_BAND * (j + 1))]
    return F.md5(F.concat_ws(":", F.lit(str(j)), *cols))


def _band_key(j: int):
    """8-byte band key for the INTERNAL pair paths (r8): xxhash64 over
    (band index, the band's 4 raw sig longs) — no string build, no md5,
    and the self-join shuffles an 8-byte long instead of a 32-char hex
    string. Only equality matters and the key never reaches an output
    (dedup_minhash_buckets keeps the md5 ``_band_expr``: its band IS an
    output column); two docs agreeing on a band agree on the key, and a
    spurious collision needs a 64-bit xxhash64 clash (~1e-11 at 800k
    band rows) — the same truncation argument as substring_dup_pairs."""
    cols = [F.col("sig%d" % k)
            for k in range(_ROWS_PER_BAND * j, _ROWS_PER_BAND * (j + 1))]
    return F.xxhash64(F.lit(j), *cols)


def dedup_minhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH band-bucket grouping: docs sharing any of the 16 band hashes
    (4 signature rows per band) are dup candidates.

    Scale: groupBy on the band hash — the bucket-join pattern that
    replaces the O(n^2) pairwise comparison at corpus scale; band hashes
    are uniform md5s, so buckets cannot skew beyond true duplicates."""
    sigs = dedup_minhash(spark, sf_dir)
    bands = sigs.select(
        "doc_id",
        F.explode(F.array(*[_band_expr(j) for j in range(_BANDS)])).alias("band"),
    )
    return (
        bands.groupBy("band")
        .agg(F.count("*").alias("bucket_size"),
             F.min("doc_id").alias("min_doc_id"),
             F.max("doc_id").alias("max_doc_id"))
        .filter(F.col("bucket_size") > 1)
    )


def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate near-dup PAIRS from banded MinHash LSH, with the
    estimated Jaccard (fraction of the 64 signature mins that agree).

    The end-to-end LSH dedup shape for 100 TB: band-bucket self-join
    (candidates only — never the O(n^2) cross product), dedup of pairs
    that collide in several bands, then a signature-similarity estimate
    that downstream either thresholds or verifies exactly per pair.

    The signature frame is consumed twice (banding + the est_jaccard
    re-join); it is materialized via eager localCheckpoint rather than
    cache() so nothing stays pinned in the CacheManager after the
    caller's action (r4 verdict #7 unpersist audit)."""
    return minhash_pairs_frame(
        dedup_minhash(spark, sf_dir).localCheckpoint(eager=True))


def minhash_pairs_frame(sigs: DataFrame) -> DataFrame:
    """Frame-level banded-LSH candidate pairs + est_jaccard from a
    signature frame (caller decides caching — sigs is read twice)."""
    bands = sigs.select(
        "doc_id",
        F.explode(F.array(*[_band_key(j) for j in range(_BANDS)])).alias("band"),
    )
    a = bands.select(F.col("doc_id").alias("id_a"), "band")
    b = bands.select(F.col("doc_id").alias("id_b"), "band")
    cand = (a.join(b, ["band"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())
    # signatures travel packed as ONE array<long> column per side
    # (VERDICT r2 #5: 64 separate long columns paid per-column codegen +
    # row overhead through two joins); agreement is a zip_with/filter
    packed = sigs.select(
        "doc_id",
        F.array(*[F.col("sig%d" % j) for j in range(_N_PERMS)]).alias("sig"))
    sa = packed.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = packed.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b"))
    agree = F.size(F.filter(
        F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
    return (
        cand.join(sa, "id_a").join(sb, "id_b")
        .select("id_a", "id_b",
                F.round(agree / F.lit(_N_PERMS), 4).alias("est_jaccard"))
    )


_NEAR_DUP_EST = 0.5
_CC_MAX_ITERS = 20


_CC_COLLECT_EDGES = 100_000  # driver union-find below this, loop above


def _cc_min_label(edges: DataFrame, max_iters: int = _CC_MAX_ITERS,
                  collect_threshold: int = _CC_COLLECT_EDGES) -> DataFrame:
    """(id, rep) for every endpoint of an (src, dst) edge list — directed
    or symmetric; components are of the undirected graph either way —
    with rep = the minimum id in the node's connected component.

    Adaptive strategy (the same size-based call AQE makes for joins):
    one bounded probe collects at most ``collect_threshold + 1`` edge
    rows; if the whole list fits, the components are solved by an
    EXPLICITLY BOUNDED driver union-find on those same rows (at sf0.1
    the near-dup graph is a few hundred edges, and per-iteration Spark
    job overhead dominates any distributed loop — r8: the probe IS the
    collect, one job instead of the old cache + count + collect, and
    callers now pass the directed pair list, so the heavy candidate
    subplan is no longer evaluated once per union branch just to
    symmetrize edges the driver path never needed). Larger graphs take
    the published large-star/small-star alternation (Kiveris et al.,
    SoCC'14; O(log^2 n) rounds on ANY graph), for which the edge list is
    cached and symmetrized here — star's neighborhood mins need every
    endpoint on the src side."""
    spark = edges.sparkSession
    rows = edges.limit(collect_threshold + 1).collect()
    if len(rows) <= collect_threshold:
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                (parent[x], x) = (root, parent[x])
            return root

        for r in rows:  # bounded by collect_threshold rows
            (a, b) = (r["src"], r["dst"])
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            (ra, rb) = (find(a), find(b))
            if ra != rb:
                # union by min id so the representative is the minimum
                if rb < ra:
                    (ra, rb) = (rb, ra)
                parent[rb] = ra
        out = [(x, find(x)) for x in parent]
        return spark.createDataFrame(out, "id long, rep long")
    # distributed path: large-star/small-star alternation — O(log^2 n)
    # rounds vs the min-label loop's O(diameter): an adversarial
    # million-hop chain converges in ~20 alternations instead of
    # hitting an iteration bound (round-3 verdict #6). Edges are cached
    # (materialized by star's first checkpoint): every round and its
    # convergence check would otherwise re-derive the whole upstream
    # candidate pipeline. An already-symmetric input merely doubles
    # each edge; every star round is distinct-ed, so the labeling is
    # unaffected.
    edges = edges.cache()
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    try:
        rep = _cc_star(sym, max_iters=_STAR_MAX_ROUNDS)
    finally:
        edges.unpersist()
    # note: the returned frame stays materialized (bounded by the
    # candidate node count) so the caller's downstream action reuses the
    # converged labels instead of replaying the loop lineage
    return rep


# 2 log2(n) alternations suffice per the paper; 64 rounds covers any
# graph with < 2^32 nodes — purely a runaway backstop, not a tuning knob
_STAR_MAX_ROUNDS = 64


def _cc_star(edges: DataFrame, max_iters: int = _STAR_MAX_ROUNDS) -> DataFrame:
    """(id, rep) connected components via large-star/small-star.

    large-star(u): m = min(N(u) + {u}); emit (v, m) for v in N(u), v > u
    (over the symmetrized edge list — output edges all point
    larger -> smaller). small-star(u), input larger -> smaller: m =
    min(N(u) + {u}); emit (v, m) for v in N(u) + {u}, v != m. The
    alternation converges to a star per component (every node edged to
    its component minimum); convergence = the edge set stops changing
    (checked exactly with exceptAll, not a hash). Each round references
    the previous edge set four times (symmetrize x2, min join,
    convergence check), so the round result is localCheckpoint-ed:
    lineage truncates to a materialized leaf — without it the logical
    plan quadruples per round and analysis OOMs the driver around round
    10. Checkpoint blocks are freed by the ContextCleaner as round
    frames go out of scope."""
    sym = edges.where(F.col("src") != F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v"))
    nodes = sym.select(F.col("u").alias("id")).distinct()
    cur = sym.localCheckpoint(eager=True)
    n_cur = cur.count()
    for _ in range(max_iters):
        both = cur.unionByName(
            cur.select(F.col("v").alias("u"), F.col("u").alias("v")))
        lmin = both.groupBy("u").agg(F.min("v").alias("mn"))
        large = (both.join(lmin, "u")
                 .where(F.col("v") > F.col("u"))
                 .select(F.col("v").alias("u"),
                         F.least("mn", F.col("u")).alias("v"))
                 .distinct())
        smin = large.groupBy("u").agg(F.min("v").alias("mn"))
        small = (large.join(smin, "u")
                 .select(F.explode(F.array(
                     F.struct(F.col("v").alias("a")),
                     F.struct(F.col("u").alias("a")))).alias("e"),
                     F.col("mn"))
                 .select(F.col("e.a").alias("u"), F.col("mn").alias("v"))
                 .where(F.col("u") != F.col("v"))
                 .distinct()).localCheckpoint(eager=True)
        n_new = small.count()
        changed = (n_new != n_cur
                   or small.exceptAll(cur).limit(1).count() > 0)
        cur = small
        n_cur = n_new
        if not changed:
            break
    else:  # pragma: no cover - 64 rounds covers < 2^32 nodes
        raise RuntimeError(
            "large-star/small-star did not converge in %d rounds"
            % max_iters)
    # localCheckpoint, not cache(): materialized + lineage-free for the
    # caller's downstream action, but NOT a CacheManager entry — blocks
    # are freed by the ContextCleaner once the frame is unreferenced,
    # so long sessions running many queries do not accrue pins (r4
    # verdict #7; a DataFrame.cache() is held by the CacheManager until
    # an explicit unpersist, surviving garbage collection)
    rep = (nodes.join(cur.withColumnRenamed("u", "id"), "id", "left")
           .select("id", F.coalesce("v", "id").alias("rep")))
    return rep.localCheckpoint(eager=True)


def curate_near_dups(spark: SparkSession, sf_dir: str,
                     threshold: float = _NEAR_DUP_EST) -> DataFrame:
    """End-to-end near-dup removal: banded MinHash LSH candidates ->
    signature-estimated Jaccard >= threshold -> connected components
    over the duplicate graph -> keep ONE document per component (the
    minimum doc_id) -> surviving documents.

    Round-3 semantics fix (VERDICT r2 #3): round 2 dropped the higher
    doc_id of every raw pair, an order-artifact rule with no cluster
    notion (on a chain A~B, B~C it killed both B and C). Now each
    transitive duplicate cluster keeps exactly one member (its minimum
    doc_id), order-independent by construction — the published
    corpus-dedup standard (connected components over the near-dup
    graph). The alternative "keep unless similar to an already-kept doc"
    is the lexicographically-first maximal-independent-set, which is
    P-complete — inherently sequential and the wrong contract for a
    distributed engine (it, too, would keep A and drop B; it differs
    only in re-admitting chain tails like C).

    Scale shape: candidates come only from band-bucket joins (never all
    pairs); the component loop runs over the candidate graph alone; the
    final removal is a plain anti join with NO broadcast hint — the kill
    set is a corpus-fraction id list at web scale (30-50% in public
    CommonCrawl dedup reports), so AQE must pick the strategy (round 2's
    F.broadcast(kill) was a driver-OOM at 100x; VERDICT r2 #3)."""
    pairs = dedup_minhash_pairs(spark, sf_dir)
    # directed pairs only — _cc_min_label solves the undirected graph
    # and symmetrizes internally iff the distributed path engages (r8:
    # the old src/dst union evaluated the banded-candidate subplan once
    # per branch just to hand the driver union-find edges it never
    # needed twice)
    edges = (pairs.where(F.col("est_jaccard") >= threshold)
             .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")))
    rep = _cc_min_label(edges)
    kill = (rep.where(F.col("rep") != F.col("id"))
            .select(F.col("id").alias("doc_id")))
    d = _docs(spark, sf_dir)
    return (d.join(kill, "doc_id", "left_anti")
            .select("doc_id", F.md5("text").alias("content_hash")))


def curate_near_dups_best(spark: SparkSession, sf_dir: str,
                          threshold: float = _NEAR_DUP_EST) -> DataFrame:
    """Quality-aware near-dup curation: same transitive duplicate
    clusters as ``curate_near_dups``, but each cluster keeps its
    HIGHEST-QUALITY member instead of the minimum doc_id — the rule
    production corpus dedup actually ships (CCNet and the Gopher/
    MassiveText pipelines keep the longest/best-scored copy, since
    near-dup clusters mix full documents with their truncated or
    boilerplate-injected variants). Quality key: word count desc, then
    doc_id asc (deterministic tie-break); emitted so the oracle compare
    pins the keep decision, not just the survivor set.

    Scale shape: identical to curate_near_dups (banded candidates ->
    bounded CC) plus ONE window over the dup-graph nodes only —
    partitioned by component rep, never corpus-wide — and the same
    AQE-chosen anti join for the kill set."""
    from pyspark.sql import Window

    pairs = dedup_minhash_pairs(spark, sf_dir)
    # directed pairs only (see curate_near_dups)
    edges = (pairs.where(F.col("est_jaccard") >= threshold)
             .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")))
    rep = _cc_min_label(edges)
    d = _docs(spark, sf_dir)
    n_words = F.size(F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda w: w != ""))
    scored = d.select("doc_id", n_words.alias("n_words"),
                      F.md5("text").alias("content_hash"))
    graph = rep.join(scored.withColumnRenamed("doc_id", "id"), "id")
    w = Window.partitionBy("rep").orderBy(F.col("n_words").desc(),
                                          F.col("id").asc())
    kill = (graph.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") > 1)
            .select(F.col("id").alias("doc_id")))
    return scored.join(kill, "doc_id", "left_anti")


# -- incremental dedup --------------------------------------------------------------

_INC_NEW_MOD = 10  # doc_id % 10 == 9 plays the "newly arrived batch"


def dedup_incremental(spark: SparkSession, sf_dir: str,
                      threshold: float = _NEAR_DUP_EST) -> DataFrame:
    """Incremental near-dup dedup: classify each document of a NEW batch
    against an already-indexed corpus — the production shape for
    snapshot-append pipelines, where the old corpus's signatures are
    read from the persisted signature table and the old corpus is NEVER
    re-compared against itself.

    Verdicts per new doc: 'dup_of_corpus' (est-Jaccard >= threshold
    match in the indexed corpus; matched_id = the smallest such corpus
    id), else 'dup_in_batch' (matched a SMALLER-id new doc — the
    keep-first rule within one batch), else 'unique'.

    Scale shape: band join of new-batch bands against corpus bands plus
    a new-vs-new self join — candidate volume is proportional to the
    new batch's duplicate mass, not the corpus size; the corpus-side
    input is the persisted (doc_id, band) table, so an appended
    snapshot costs O(|new|), never O(|corpus|). Here both sides derive
    from one table split by doc_id %% 10 (the driver corpus has no
    batch column); the split is in the oracle too.

    ``sigs`` feeds the band explode and the per-pair agreement join; it
    is materialized via eager localCheckpoint, not cache(), so nothing
    stays pinned in the CacheManager after the caller's action (r4
    verdict #7 unpersist audit)."""
    sigs = dedup_minhash(spark, sf_dir).localCheckpoint(eager=True)
    bands = sigs.select(
        "doc_id",
        F.explode(F.array(*[_band_key(j) for j in range(_BANDS)])).alias("band"),
    )
    is_new = F.col("doc_id") % _INC_NEW_MOD == _INC_NEW_MOD - 1
    new_b = bands.where(is_new)
    old_b = bands.where(~is_new)
    cand = (
        new_b.select(F.col("doc_id").alias("id_new"), "band")
        .join(old_b.select(F.col("doc_id").alias("id_other"), "band")
              .unionByName(new_b.select(F.col("doc_id").alias("id_other"),
                                        "band")), ["band"])
        .where(F.col("id_new") != F.col("id_other"))
        .select("id_new", "id_other").distinct()
    )
    packed = sigs.select(
        "doc_id",
        F.array(*[F.col("sig%d" % j) for j in range(_N_PERMS)]).alias("sig"))
    sa = packed.select(F.col("doc_id").alias("id_new"), F.col("sig").alias("sig_a"))
    sb = packed.select(F.col("doc_id").alias("id_other"), F.col("sig").alias("sig_b"))
    agree = F.size(F.filter(
        F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
    scored = (cand.join(sa, "id_new").join(sb, "id_other")
              .where(F.round(agree / F.lit(_N_PERMS), 4) >= threshold))
    other_is_old = F.col("id_other") % _INC_NEW_MOD != _INC_NEW_MOD - 1
    corpus_match = (scored.where(other_is_old)
                    .groupBy("id_new")
                    .agg(F.min("id_other").alias("corpus_id")))
    batch_match = (scored.where(~other_is_old
                                & (F.col("id_other") < F.col("id_new")))
                   .groupBy("id_new")
                   .agg(F.min("id_other").alias("batch_id")))
    new_docs = (_docs(spark, sf_dir).where(is_new)
                .select(F.col("doc_id").alias("id_new")))
    verdict = (F.when(F.col("corpus_id").isNotNull(), "dup_of_corpus")
               .when(F.col("batch_id").isNotNull(), "dup_in_batch")
               .otherwise("unique"))
    matched = F.coalesce("corpus_id", "batch_id")
    return (new_docs.join(corpus_match, "id_new", "left")
            .join(batch_match, "id_new", "left")
            .select(F.col("id_new").alias("doc_id"),
                    verdict.alias("verdict"),
                    matched.alias("matched_id")))


# -- SimHash ---------------------------------------------------------------------

_SIMHASH_BITS = 64


def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash over distinct tokens, emitted as a 16-hex-char
    string: bit_j = sign of the sum of (2*b_j(token) - 1) across tokens,
    where b_j is bit (j%4) of hex digit (j//4) of md5(token) — cross-
    engine stable (md5 + STRPOS arithmetic, no engine-specific hash).

    r8 shape (guide §4.2, the ``_lsh_sigs`` / minhash_sigs_frame
    precedent): tokenize + distinct stay JVM-side (``split`` semantics
    pinned cross-engine), and the per-token md5 -> 64 sign-bit sums ->
    hex assembly run in ONE Arrow-batched mapInPandas with hashlib +
    vectorized numpy bit extraction — the r7 explode -> 64-bit-column
    projection -> 64-column hash aggregate (interpreted per-element,
    plus a full exchange) disappears. Bit-equal by construction: digit
    k of the hexdigest is nibble k of the digest bytes (high nibble
    first), bit_j = (digit[j div 4] >> (j mod 4)) & 1 exactly as
    ``floor(nib / 2^(j%4)) %% 2``, and the per-doc sum of ±1 ints is
    order-independent. A/B'd exact at sf0.1."""
    import numpy as np
    import pandas as pd

    d = _docs(spark, sf_dir, parallel=True)
    # only the SPLIT stays JVM-side (pinned semantics); the empty-token
    # filter and the distinct run as a Python set — both were
    # interpreted per-element HOFs and together cost more than the md5
    # stage itself (tokenize-only noop 0.99 s vs full 1.35 s at sf1.0).
    # The row-drop guard becomes a cheap rlike: a doc has a non-empty
    # token iff its text contains an alphanumeric character (split is
    # on [^a-z0-9]+ over lower()), which is exactly the old
    # ``size(distinct(filter(split))) > 0`` without evaluating the
    # expensive expression twice (once for WHERE, once for the select).
    base = (d.where(F.col("text").rlike("[a-zA-Z0-9]"))
            .select("doc_id",
                    F.split(F.lower(F.col("text")), "[^a-z0-9]+")
                    .alias("t")))
    shifts = np.arange(4, dtype=np.uint8)

    def fn(batches):
        import hashlib

        md5 = hashlib.md5
        for pdf in batches:
            ids, fps = [], []
            for (doc_id, warr) in zip(pdf["doc_id"], pdf["t"]):
                tset = set(warr)
                tset.discard("")
                digests = b"".join(
                    md5(t.encode("utf-8")).digest() for t in tset)
                dm = np.frombuffer(digests, dtype=np.uint8).reshape(-1, 16)
                # hex digit 2k = high nibble of byte k, 2k+1 = low nibble
                digits = np.empty((dm.shape[0], 16), dtype=np.uint8)
                digits[:, 0::2] = dm[:, :8] >> 4
                digits[:, 1::2] = dm[:, :8] & 15
                bits = (digits[:, :, None] >> shifts[None, None, :]) & 1
                s = (bits.reshape(-1, 64).astype(np.int64) * 2 - 1).sum(axis=0)
                nibs = ((s.reshape(16, 4) > 0).astype(np.int64)
                        << np.arange(4, dtype=np.int64)[None, :]).sum(axis=1)
                ids.append(int(doc_id))
                fps.append("".join(_HEX[v] for v in nibs))
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "simhash": pd.Series(fps, dtype="object")})

    return base.mapInPandas(fn, "doc_id long, simhash string")


# Manku-style (WWW'07 "Detecting Near-Duplicates for Web Crawling")
# combination keys for hamming <= 3 over 64 bits: 6 blocks (11/11/10 bits
# per 32-bit half of the parsed fingerprint), keyed on every choose-3
# block concatenation. <= 3 bit errors touch <= 3 blocks, leaving >= 3
# intact blocks, so some combination key always matches: completeness is
# preserved. Key width is 31-33 bits, so the random-pair collision rate
# is ~C(6,3)/2^31 ~ 1e-8 — versus the round-2 4x16-bit chunk join's
# 4/2^16 ~ 6e-5, whose expected n^2/2^17 candidate term degraded
# quadratically at corpus scale (VERDICT r2 #2).
_SIM_BLOCKS = [(1, 0, 11), (1, 11, 11), (1, 22, 10),
               (9, 0, 11), (9, 11, 11), (9, 22, 10)]  # (hex_start, shift, width)

_SIM_COMBOS = list(itertools.combinations(range(6), 3))  # 20 tables


def _simhash_keyed(sims: DataFrame) -> DataFrame:
    """(doc_id, simhash, mk): the 20 Manku combination keys per row of a
    (doc_id, simhash) frame.

    Combo keys packed as ONE long (11-bit block slots + combo index:
    ((ci*2048 + b_i)*2048 + b_j)*2048 + b_k < 2^38): an 8-byte shuffle
    key that hashes in one op, vs the r4 '#'-joined decimal string
    (~30 bytes + string hash). Key format never reaches the output —
    only the candidate SET matters — so the oracle is untouched.
    r8: the hex parse + 6 block extractions + 20 key packings run
    vectorized over the whole Arrow batch (int(s[k:k+8], 16) ==
    conv(substring(simhash)); >> == shiftright on non-negatives) —
    the interpreted JVM expression tree measured 1.1 s per evaluation
    at sf1.0 vs ~0.1 s here. The fingerprint string rides along so the
    caller can recover the rep frame from the combo-0 rows instead of
    materializing the groupBy separately; join sides project it away
    before any exchange."""
    import numpy as np
    import pandas as pd

    def _key_batches(batches):
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            h1 = np.array([int(s[:8], 16) for s in pdf["simhash"]],
                          dtype=np.int64)
            h2 = np.array([int(s[8:16], 16) for s in pdf["simhash"]],
                          dtype=np.int64)
            blocks = np.empty((n, 6), np.int64)
            for (bi, (start, shift, width)) in enumerate(_SIM_BLOCKS):
                src = h1 if start == 1 else h2
                blocks[:, bi] = (src >> shift) & ((1 << width) - 1)
            keys = np.empty((n, len(_SIM_COMBOS)), np.int64)
            for (ci, (i, j, k)) in enumerate(_SIM_COMBOS):
                keys[:, ci] = (((ci * 2048 + blocks[:, i]) * 2048
                                + blocks[:, j]) * 2048 + blocks[:, k])
            yield pd.DataFrame({
                "doc_id": np.repeat(pdf["doc_id"].to_numpy(),
                                    len(_SIM_COMBOS)),
                "simhash": np.repeat(pdf["simhash"].to_numpy(),
                                     len(_SIM_COMBOS)),
                "mk": keys.reshape(-1)})

    return (sims.select("doc_id", "simhash")
            .mapInPandas(_key_batches, "doc_id long, simhash string, mk long"))


def _simhash_candidates_from_keyed(keyed: DataFrame) -> DataFrame:
    """Distinct (id_a, id_b) candidate pairs from a materialized keyed
    frame. Shape note (VERDICT r2 minor #4): the distinct() dedups bare
    id pairs — the join sides carry (doc_id, mk) only, the signatures
    are re-joined afterwards, halving the distinct's shuffle width
    versus dragging them through."""
    a = keyed.select(F.col("doc_id").alias("id_a"), "mk")
    b = keyed.select(F.col("doc_id").alias("id_b"), "mk")
    return (a.join(b, ["mk"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())


def _simhash_candidates(sims: DataFrame) -> DataFrame:
    """Distinct (id_a, id_b) candidate pairs from Manku combination keys
    over a (doc_id, simhash) frame. Split out so tests (and the bench's
    candidate telemetry) can inject synthetic fingerprints (exact
    hamming-3 worst cases) and assert the candidate-volume bound
    directly. The keyed frame is materialized once for both self-join
    sides."""
    return _simhash_candidates_from_keyed(
        _simhash_keyed(sims).localCheckpoint(eager=True))


def _simhash_cand(sims: DataFrame) -> DataFrame:
    """hamming<=3 pairs from a (doc_id, simhash) frame.

    Exact-duplicate collapse (round-3 verdict #4, the standard production
    trick): identical fingerprints are grouped to one representative
    BEFORE pair generation, so the Manku combination-key join runs over
    distinct fingerprints only — a fingerprint shared by g docs would
    otherwise put g copies in every band bucket and contribute g^2
    candidate rows per colliding key (at sf0.1, 1134 of 5000 fingerprints
    are exact dups; this was the bulk of the 4.1% candidate telemetry).
    Membership is then re-expanded: within-group pairs are hamming 0 by
    construction (a simhash self-equi-join, no banding needed), and each
    cross-group rep pair fans out to members_a x members_b with the rep
    hamming (hamming depends only on the fingerprints).

    ``sims`` feeds four subplans (rep grouping, two signature re-joins,
    the within-group self-join); the eager localCheckpoint materializes
    the 64-expression signature aggregation exactly once — and is freed
    by the ContextCleaner, not pinned in the CacheManager."""
    sims = sims.localCheckpoint(eager=True)
    # reps feeds three subplans (the Manku keying and both signature
    # re-joins). r8 follow-up: instead of materializing the groupBy AND
    # the keyed frame separately, the key stage carries the fingerprint
    # string and is the ONLY materialization — reps are recovered from
    # it by filtering to combination 0 (every rep emits exactly one row
    # per combination; the combo index is the key's high bits, so
    # mk >> 33 == 0 selects one row per rep). One eager checkpoint job
    # instead of two; the join sides still project (doc_id, mk) only,
    # so the self-join shuffle stays 16 bytes wide.
    reps = sims.groupBy("simhash").agg(F.min("doc_id").alias("doc_id"))
    keyed = _simhash_keyed(reps).localCheckpoint(eager=True)
    cand = _simhash_candidates_from_keyed(keyed)
    reps = (keyed.where(F.shiftright(F.col("mk"), 33) == 0)
            .select("doc_id", "simhash"))
    sa = reps.select(F.col("doc_id").alias("id_a"),
                     F.col("simhash").alias("sim_a"))
    sb = reps.select(F.col("doc_id").alias("id_b"),
                     F.col("simhash").alias("sim_b"))
    ham = (
        F.bit_count(_hex2long(F.col("sim_a"), 1)
                    .bitwiseXOR(_hex2long(F.col("sim_b"), 1)))
        + F.bit_count(_hex2long(F.col("sim_a"), 9)
                      .bitwiseXOR(_hex2long(F.col("sim_b"), 9)))
    )
    rep_pairs = (
        cand.join(sa, "id_a").join(sb, "id_b")
        .select("sim_a", "sim_b", ham.cast("int").alias("hamming"))
        .where(F.col("hamming") <= 3)
    )
    # distinct fingerprints differ in >= 1 bit, so within-group pairs
    # (hamming 0) and cross-group expansions are disjoint by construction
    ma = sims.select(F.col("doc_id").alias("id_x"),
                     F.col("simhash").alias("sim_a"))
    mb = sims.select(F.col("doc_id").alias("id_y"),
                     F.col("simhash").alias("sim_b"))
    cross = (
        rep_pairs.join(ma, "sim_a").join(mb, "sim_b")
        .select(F.least("id_x", "id_y").alias("id_a"),
                F.greatest("id_x", "id_y").alias("id_b"), "hamming")
    )
    within = (
        sims.select("simhash", F.col("doc_id").alias("id_a"))
        .join(sims.select("simhash", F.col("doc_id").alias("id_b")),
              "simhash")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.lit(0).cast("int").alias("hamming"))
    )
    return within.unionByName(cross)


def simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= 3, found via Manku
    combination keys (6 blocks choose 3 -> 20 tables, ~32-bit keys): any
    pair within hamming 3 leaves >= 3 blocks intact and therefore agrees
    on >= 1 combination key, so the equi-join candidate set is complete
    — while random pairs collide at only ~20/2^31 (the round-2 16-bit
    chunk join collided at ~6e-5, an n^2/2^17 term at corpus scale).
    Exact hamming is then bit_count of the xor on the two 32-bit halves
    (JVM-side), filtered to <= 3."""
    return _simhash_cand(simhash(spark, sf_dir))


# -- exact n-gram Jaccard ----------------------------------------------------------

def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise Jaccard over word-3-gram shingle sets for docs in
    adjacent shingle-count buckets, J >= 0.2.

    Candidate rule: |floor(n_a/16) - floor(n_b/16)| <= 1, implemented as
    an equi-join by exploding {b-1, b, b+1} on one side — adjacent-bucket
    probing removes the boundary false-negatives of a same-bucket-only
    join (15 vs 16 shingles straddle a multiple of 16) while still
    bounding the candidate set: a J >= 0.2 pair can differ in size by at
    most 5x, and true near-dups by far less.

    The brute-force baseline the MinHash/LSH path approximates; at corpus
    scale only the LSH candidates are compared.

    r8: distinct shingles are built + md5-hashed to signed longs in one
    Arrow-batched mapInPandas (the §B/§E pattern of OPTIMIZATION_r08) —
    the interpreted shingle transform disappears, the bucket self-join
    carries array<long> instead of array<string> (8 bytes per shingle
    vs the full 3-gram text), and array_intersect compares longs. The
    shingle values only ever feed set intersection, never the output,
    so the 64-bit truncation argument of substring_dup_pairs applies
    verbatim (intersection counts shift only on a 64-bit collision
    between distinct shingles). The frame is also materialized once —
    both join sides previously re-evaluated the shingle build."""
    import numpy as np
    import pandas as pd

    d = _docs(spark, sf_dir, parallel=True)

    def fn(batches):
        import hashlib

        md5 = hashlib.md5
        for pdf in batches:
            ids, shs, ns = [], [], []
            for (doc_id, w) in zip(pdf["doc_id"], pdf["w"]):
                wl = [x for x in w if x]
                hs = {md5((" ".join(wl[i:i + 3])).encode("utf-8"))
                      .digest()[:8] for i in range(len(wl) - 2)}
                if not hs:
                    continue
                ids.append(int(doc_id))
                shs.append([int.from_bytes(h, "big", signed=True)
                            for h in hs])
                ns.append(len(hs))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                # explicit object dtype: an all-skipped batch would
                # otherwise yield an empty float64 column, which Arrow
                # cannot convert to array<long>
                "sh": pd.Series(shs, dtype="object"),
                "n_sh": pd.Series(ns, dtype="int32")})

    base = (d.select("doc_id",
                     F.split(F.lower(F.col("text")), "[^a-z0-9]+")
                     .alias("w"))
            .mapInPandas(fn, "doc_id long, sh array<long>, n_sh int")
            .localCheckpoint(eager=True))
    bucket = F.floor(F.col("n_sh") / 16)
    a = base.select(
        F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"),
        F.col("n_sh").alias("n_a"),
        F.explode(F.array(bucket - 1, bucket, bucket + 1)).alias("cb"))
    b = base.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"),
                    F.col("n_sh").alias("n_b"),
                    bucket.alias("bucket_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = F.round(inter / (F.col("n_a") + F.col("n_b") - inter), 4)
    return (
        a.join(b, (F.col("id_a") < F.col("id_b"))
               & (F.col("cb") == F.col("bucket_b")))
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


# -- repetition signals (Gopher-style quality filter) -------------------------------

def repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signals (the Gopher repetition
    filters): distinct-token ratio and the fraction of the document
    covered by its most frequent word-2-gram. Both are pure JVM
    array/aggregate expressions over one explode — no self-join.

    r8 shape: every signal is doc-LOCAL, so the r7 2-gram explode ->
    corpus-wide (doc_id, gram) aggregation -> per-doc window was three
    operators (and an exchange) computing what one per-row pass can:
    the max bigram multiplicity per doc (the gram identity never
    reaches the output, so not even a tie-break is observable — equal
    counts give the same ``c``). Counting runs in one Arrow-batched
    mapInPandas over the JVM-tokenized words (Counter over adjacent
    token pairs; set() size == array_distinct size); the ratio
    arithmetic and rounding stay in the same JVM expressions as before.
    Zero exchanges."""
    import pandas as pd

    d = _docs(spark, sf_dir, parallel=True)
    base = d.select(
        "doc_id",
        F.split(F.lower(F.col("text")), "[^a-z0-9]+").alias("w"))

    def fn(batches):
        from collections import Counter
        for pdf in batches:
            ids, nw, nd, cs = [], [], [], []
            for (doc_id, w) in zip(pdf["doc_id"], pdf["w"]):
                wl = [x for x in w if x]
                ids.append(int(doc_id))
                nw.append(len(wl))
                nd.append(len(set(wl)))
                cs.append(max(Counter(zip(wl, wl[1:])).values())
                          if len(wl) >= 2 else 0)
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "n_words": pd.Series(nw, dtype="int32"),
                "n_distinct": pd.Series(nd, dtype="int32"),
                "c": pd.Series(cs, dtype="int32")})

    stats = base.mapInPandas(
        fn, "doc_id long, n_words int, n_distinct int, c int")
    return stats.select(
        "doc_id",
        F.round(F.col("n_distinct") / F.greatest("n_words", F.lit(1)), 4)
        .alias("distinct_ratio"),
        # 2*c words are covered by c occurrences of the top 2-gram
        F.round(F.least(F.lit(2) * F.col("c")
                        / F.greatest("n_words", F.lit(1)), F.lit(1.0)), 4)
        .alias("top_bigram_frac"),
    )


# -- tf-idf keyword extraction -------------------------------------------------------

_TFIDF_TOPK = 3


def tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 keywords per document, ranked by (term frequency DESC,
    document frequency ASC, token ASC) — the tf-idf ordering expressed
    in pure integers so the rank is bit-deterministic across engines
    (a float tf*log(N/df) score ties at ulp level and can flip ranks
    between engines).

    Scale shape: the classic two-aggregation tf-idf plan — per-doc tf
    (shuffle on doc_id, map-side combine), global df (shuffle on token;
    tokens are zipf-bounded, partial aggregation absorbs the head), then
    a shuffle join tf x df on token and a per-doc top-k window."""
    import pandas as pd

    d = _docs(spark, sf_dir, parallel=True)

    # per-doc term frequencies counted IN the batch stage (r8): the
    # explode + (doc_id, token) groupBy exchange of ~4M token rows
    # becomes a Counter per document emitting the per-(doc, token) rows
    # directly; row order out of a Counter is irrelevant downstream
    # (joins + aggregations). tf is materialized once and feeds BOTH
    # the join and the df aggregation: tf rows are unique per
    # (doc_id, token) by construction, so df = count of tf rows per
    # token — the r7 plan's second corpus explode + distinct is gone.
    def fn(batches):
        from collections import Counter
        for pdf in batches:
            ids, toks, tfs = [], [], []
            for (doc_id, w) in zip(pdf["doc_id"], pdf["w"]):
                did = int(doc_id)
                for (tok, c) in Counter(x for x in w if x).items():
                    ids.append(did)
                    toks.append(tok)
                    tfs.append(c)
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "token": pd.Series(toks, dtype="object"),
                "tf": pd.Series(tfs, dtype="int64")})

    tf = (d.select("doc_id",
                   F.split(F.lower(F.col("text")), "[^a-z0-9]+").alias("w"))
          .mapInPandas(fn, "doc_id long, token string, tf long")
          .localCheckpoint(eager=True))
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("token").asc())
    return (tf.join(df, "token")
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= _TFIDF_TOPK)
            .select("doc_id", "rank", "token", "tf", "df"))


# -- corpus-level boilerplate n-grams ------------------------------------------------

_BOILER_MIN_FRAC = 0.01


def docfreq_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level boilerplate detection: word-3-gram shingles present
    in more than 10% of documents (the document-frequency pass used to
    strip templated headers/footers before training).

    Scale: shingle -> distinct doc explode, one shuffle on the shingle;
    the >10% threshold keeps the output tiny regardless of corpus size,
    and the doc count is a scalar broadcast (crossJoin of one row).

    r8: the per-doc distinct shingle STRINGS are built in one
    Arrow-batched mapInPandas over the JVM-tokenized words (" ".join ==
    concat_ws on non-null strings; dict order preserves first-seen like
    array_distinct — irrelevant anyway, the rows feed a groupBy) —
    replacing the interpreted per-element transform that dominated the
    minhash family (§B of OPTIMIZATION_r08). Shingle text reaches the
    output here, so no hash truncation — strings stay strings."""
    import pandas as pd

    d = _docs(spark, sf_dir, parallel=True)

    def fn(batches):
        for pdf in batches:
            rows = []
            for w in pdf["w"]:
                wl = [x for x in w if x]
                rows.extend({" ".join(wl[i:i + 3])
                             for i in range(len(wl) - 2)})
            yield pd.DataFrame({"shingle": pd.Series(rows, dtype="object")})

    per_doc = (d.select(F.split(F.lower(F.col("text")), "[^a-z0-9]+")
                        .alias("w"))
               .mapInPandas(fn, "shingle string"))
    n_docs = d.select(F.count("*").alias("n_docs"))
    freq = per_doc.groupBy("shingle").agg(F.count("*").alias("n_docs_with"))
    return (freq.crossJoin(F.broadcast(n_docs))
            .where(F.col("n_docs_with") > F.col("n_docs") * _BOILER_MIN_FRAC)
            .select("shingle", "n_docs_with",
                    F.round(F.col("n_docs_with") / F.col("n_docs"), 4)
                    .alias("doc_frac")))


# -- exact-substring dedup -----------------------------------------------------

_SUBSTR_W = 20     # tokens per exact-match window (Lee et al. 2022 use 50
                   # BPE tokens; scaled to this corpus's ~100-word docs)
_SUBSTR_MAX_DF = 16  # a window in more docs than this is boilerplate, not
                     # duplication evidence — it goes to docfreq_boilerplate


def substring_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplicate pairs ("Deduplicating Training Data
    Makes Language Models Better", Lee et al. 2022, the ExactSubstr
    variant): two documents are flagged when they share ANY exact run of
    ``_SUBSTR_W`` consecutive tokens, found via stride-1 rolling window
    hashes — the suffix-array result expressed relationally. Emits
    (id_a, id_b, n_shared_windows).

    Scale shape: the sliding explode is ~tokens-per-doc rows carrying an
    md5 digest only; one shuffle keyed on the window hash. Pair
    formation joins only windows with document frequency in (1,
    ``_SUBSTR_MAX_DF``] — df=1 windows are unique (no pair), df >
    ``_SUBSTR_MAX_DF`` windows are corpus boilerplate whose g^2 bucket
    blow-up this cap removes (they belong to ``docfreq_boilerplate``,
    not a dup verdict). Bucket sizes are therefore bounded by the cap,
    never by corpus size.

    The (doc_id, window-hash) frame is materialized ONCE (eager
    localCheckpoint, the dedup_minhash_pairs pattern) and feeds the df
    gate and both self-join sides — the r5 plan rebuilt the stride-1
    explode 4x (one corpus scan per consumer), invisible at sf0.1 but
    4x the most expensive Generate at 100 TB (VERDICT r5 plan audit).

    r8: the window string construction + md5 move from an interpreted
    per-element JVM ``transform`` into one Arrow-batched mapInPandas
    (guide §4.2, the minhash_sigs_frame precedent), and the gram key
    shrinks from the 32-char md5 hex string to its first 8 digest
    bytes as a signed long — an 8-byte shuffle/join key instead of a
    ~44-byte string one. The hash only ever feeds equality (df gate +
    self-join); no gram value reaches the output, so truncating md5 to
    64 bits changes results only on a 64-bit collision between two
    DISTINCT windows of the corpus (~1e-7 at 4M windows — strictly the
    md5-collision argument the string variant already made)."""
    import numpy as np
    import pandas as pd

    d = _docs(spark, sf_dir, parallel=True)
    # raw split only: the interpreted empty-token filter HOF (plus its
    # re-evaluation inside the old WHERE) moves into the batch fn
    base = d.select(
        "doc_id",
        F.split(F.lower(F.col("text")), "[^a-z0-9]+").alias("w"))

    def fn(batches):
        import hashlib

        md5 = hashlib.md5
        for pdf in batches:
            ids, grams = [], []
            for (doc_id, w) in zip(pdf["doc_id"], pdf["w"]):
                wl = [x for x in w if x]
                if len(wl) < _SUBSTR_W:
                    continue
                seen = {
                    md5((" ".join(wl[i:i + _SUBSTR_W])).encode("utf-8"))
                    .digest()[:8]
                    for i in range(len(wl) - (_SUBSTR_W - 1))}
                for dig in seen:
                    ids.append(int(doc_id))
                    grams.append(int.from_bytes(dig, "big", signed=True))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "gram": pd.Series(np.array(grams, dtype=np.int64)
                                  if grams else [], dtype="int64")})

    g = (base.mapInPandas(fn, "doc_id long, gram long")
         .localCheckpoint(eager=True))
    dup_grams = (g.groupBy("gram").agg(F.count("*").alias("df"))
                 .where((F.col("df") > 1) & (F.col("df") <= _SUBSTR_MAX_DF))
                 .select("gram"))
    # the eligible frame is ALSO materialized once: it is bounded (df-
    # capped windows only) and both self-join sides read it, so the df
    # gate runs exactly once instead of once per side
    elig = g.join(dup_grams, "gram").localCheckpoint(eager=True)
    a = elig.select(F.col("doc_id").alias("id_a"), "gram")
    b = elig.select(F.col("doc_id").alias("id_b"), "gram")
    return (a.join(b, "gram")
            .where(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("n_shared_windows")))


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


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_MINHASH_SIG_CTE = """
    WITH words AS (
      SELECT doc_id,
             STRING_SPLIT_REGEX(LOWER(text), '[^a-z0-9]+') AS w
      FROM documents
    ), shingled AS (
      SELECT doc_id,
             UNNEST([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                     FOR i IN RANGE(1, LEN(w) - 2 + 1)]) AS shingle
      FROM words WHERE LEN(w) >= 3
    ), hx AS (
      SELECT doc_id, MD5(shingle) AS h FROM shingled
    ), hv AS (
      SELECT doc_id, %s AS h1, %s AS h2 FROM hx
    ), sigs AS (
      SELECT doc_id, %s
      FROM hv GROUP BY doc_id
    )
""" % (
    _hex2int_sql("h", 1), _hex2int_sql("h", 9),
    ", ".join("MIN((h1 + %d * h2) %% %d) AS sig%d" % (j, _MH_PRIME, j)
              for j in range(_N_PERMS)),
)

_BAND_SQL = lambda j: ("MD5('%d' || ':' || %s)" % (j, " || ':' || ".join(
    "sig%d::VARCHAR" % k
    for k in range(_ROWS_PER_BAND * j, _ROWS_PER_BAND * (j + 1)))))

_BANDS_CTE = _MINHASH_SIG_CTE + """, bands AS (
      %s
    )
""" % "\n      UNION ALL\n      ".join(
    "SELECT doc_id, %s AS band FROM sigs" % _BAND_SQL(j) for j in range(_BANDS))

_WINNOW_K = 4  # k-gram size (tokens)
_WINNOW_W = 5  # winnowing window (hashes)


def winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al. 2003, the MOSS
    algorithm): hash every K-token gram, slide a W-hash window, keep
    each window's MINIMUM hash — rightmost occurrence on ties, the
    paper's rule — and emit the distinct selected (position, hash)
    pairs per document. Guarantees every match of length >= K+W-1
    shares a fingerprint, at ~2/(W+1) density — the local fingerprint
    family's answer to full-content hashing (dedup_exact) and global
    sketches (minhash).

    Cross-engine hash: first 8 hex chars of md5 of the space-joined
    gram (the _hex2long / _hex2int_sql recipe).

    Scale: pure per-row HOFs over once-materialized arrays (the
    arrays_zip/slice discipline), one explode of the selected
    fingerprints, one distinct — shuffle keyed by (doc, pos, hash),
    uniform by construction."""
    d = _docs(spark, sf_dir, parallel=True).select("doc_id", "text")
    w = d.select("doc_id", F.split("text", " ").alias("w"))
    n = F.size("w")
    grams = F.when(
        n >= _WINNOW_K,
        F.transform(
            F.sequence(F.lit(0), n - _WINNOW_K),
            lambda i: _hex2long(
                F.md5(F.array_join(
                    F.slice("w", i + 1, _WINNOW_K), " ")), 1)),
    ).otherwise(F.array().cast("array<long>"))
    g = w.select("doc_id", grams.alias("h"))
    m = F.size("h")
    sel = F.when(
        m >= _WINNOW_W,
        F.array_distinct(F.transform(
            F.sequence(F.lit(0), m - _WINNOW_W),
            lambda i: F.struct(
                (i + _WINNOW_W
                 - F.array_position(
                     F.reverse(F.slice("h", i + 1, _WINNOW_W)),
                     F.array_min(F.slice("h", i + 1, _WINNOW_W)))
                 ).cast("int").alias("pos"),
                F.array_min(F.slice("h", i + 1, _WINNOW_W))
                 .alias("hash")))),
    ).otherwise(
        F.array().cast("array<struct<pos:int,hash:long>>"))
    return (g.select("doc_id", F.explode(sel).alias("fp"))
            .select("doc_id", "fp.pos", "fp.hash")
            .distinct())


ORACLES: dict[str, str] = {
    "dedup_exact": """
        SELECT MD5(text) AS content_hash,
               MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
        FROM documents GROUP BY MD5(text)
    """,
    "dedup_minhash": _MINHASH_SIG_CTE + "SELECT * FROM sigs",
    "dedup_minhash_buckets": _BANDS_CTE + """
        SELECT band, COUNT(*) AS bucket_size,
               MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
        FROM bands GROUP BY band HAVING COUNT(*) > 1
    """,
    "dedup_minhash_pairs": _BANDS_CTE + """, cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.doc_id < b.doc_id
        )
        SELECT id_a, id_b,
               ROUND((%s)::DOUBLE / %d, 4) AS est_jaccard
        FROM cand JOIN sigs sa ON sa.doc_id = id_a
                  JOIN sigs sb ON sb.doc_id = id_b
    """ % (" + ".join(
        "CASE WHEN sa.sig%d = sb.sig%d THEN 1 ELSE 0 END" % (j, j)
        for j in range(_N_PERMS)), _N_PERMS),
    # connected components via a recursive transitive-closure CTE (fine
    # at oracle scale; Spark runs bounded min-label propagation instead)
    "curate_near_dups": _BANDS_CTE.replace(
        "WITH words", "WITH RECURSIVE words", 1) + """, cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.doc_id < b.doc_id
        ), sim AS (
          SELECT id_a, id_b
          FROM cand JOIN sigs sa ON sa.doc_id = id_a
                    JOIN sigs sb ON sb.doc_id = id_b
          WHERE ROUND((%s)::DOUBLE / %d, 4) >= 0.5
        ), edges AS (
          SELECT id_a AS src, id_b AS dst FROM sim
          UNION
          SELECT id_b AS src, id_a AS dst FROM sim
        ), reach AS (
          SELECT src AS id, src AS r FROM edges
          UNION
          SELECT e.src AS id, reach.r FROM edges e JOIN reach ON e.dst = reach.id
        ), kill AS (
          SELECT id AS doc_id
          FROM (SELECT id, MIN(r) AS rep FROM reach GROUP BY id)
          WHERE rep <> id
        )
        SELECT d.doc_id, MD5(d.text) AS content_hash
        FROM documents d LEFT JOIN kill k ON d.doc_id = k.doc_id
        WHERE k.doc_id IS NULL
    """ % (" + ".join(
        "CASE WHEN sa.sig%d = sb.sig%d THEN 1 ELSE 0 END" % (j, j)
        for j in range(_N_PERMS)), _N_PERMS),
    # same clusters, quality-aware keep: every cluster keeps its longest
    # member (word count desc, doc_id asc) instead of its minimum id
    "curate_near_dups_best": _BANDS_CTE.replace(
        "WITH words", "WITH RECURSIVE words", 1) + """, cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.doc_id < b.doc_id
        ), sim AS (
          SELECT id_a, id_b
          FROM cand JOIN sigs sa ON sa.doc_id = id_a
                    JOIN sigs sb ON sb.doc_id = id_b
          WHERE ROUND((%s)::DOUBLE / %d, 4) >= 0.5
        ), edges AS (
          SELECT id_a AS src, id_b AS dst FROM sim
          UNION
          SELECT id_b AS src, id_a AS dst FROM sim
        ), reach AS (
          SELECT src AS id, src AS r FROM edges
          UNION
          SELECT e.src AS id, reach.r FROM edges e JOIN reach ON e.dst = reach.id
        ), comp AS (
          SELECT id, MIN(r) AS rep FROM reach GROUP BY id
        ), nw AS (
          SELECT doc_id, LEN(LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text),
                 '[^a-z0-9]+'), x -> x <> '')) AS n_words
          FROM documents
        ), kill AS (
          SELECT id AS doc_id
          FROM (SELECT id, ROW_NUMBER() OVER (
                  PARTITION BY rep
                  ORDER BY n_words DESC, id ASC) AS rn
                FROM comp JOIN nw ON nw.doc_id = comp.id)
          WHERE rn > 1
        )
        SELECT d.doc_id, n.n_words, MD5(d.text) AS content_hash
        FROM documents d JOIN nw n ON n.doc_id = d.doc_id
        LEFT JOIN kill k ON d.doc_id = k.doc_id
        WHERE k.doc_id IS NULL
    """ % (" + ".join(
        "CASE WHEN sa.sig%d = sb.sig%d THEN 1 ELSE 0 END" % (j, j)
        for j in range(_N_PERMS)), _N_PERMS),
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

# 64-bit simhash: bit j = sign of Σ_tokens (2*bit_j(md5(token)) - 1);
# fingerprint emitted as 16 hex chars (char k from bits 4k..4k+3).
_SIMHASH_NIBBLES = []
for _k in range(_SIMHASH_BITS // 4):
    _terms = []
    for _m in range(4):
        _j = 4 * _k + _m
        _terms.append(
            f"CASE WHEN SUM((FLOOR((STRPOS('{_HEX}', "
            f"SUBSTRING(MD5(token), {_j // 4 + 1}, 1)) - 1) "
            f"/ {2 ** (_j % 4)})::INT % 2) * 2 - 1) > 0 "
            f"THEN {2 ** _m} ELSE 0 END")
    _SIMHASH_NIBBLES.append(
        f"SUBSTR('{_HEX}', ({' + '.join(_terms)}) + 1, 1)")

_SIMHASH_CTE = """
    WITH toks AS (
      SELECT doc_id,
             UNNEST(LIST_DISTINCT(LIST_FILTER(
               STRING_SPLIT_REGEX(LOWER(text), '[^a-z0-9]+'),
               x -> x <> ''))) AS token
      FROM documents
    ), sims AS (
      SELECT doc_id, {nibbles} AS simhash
      FROM toks GROUP BY doc_id
    )
""".format(nibbles=" || ".join(_SIMHASH_NIBBLES))

ORACLES["simhash"] = _SIMHASH_CTE + "SELECT doc_id, simhash FROM sims"

# Manku combination-key oracle, generated from the same _SIM_BLOCKS /
# _SIM_COMBOS constants the Spark side uses.
_SIM_BLOCK_SQL = [
    "((h%d >> %d) & %d)" % (1 if start == 1 else 2, shift, (1 << width) - 1)
    for (start, shift, width) in _SIM_BLOCKS
]
_SIM_KEYED_SQL = "\n      UNION ALL\n      ".join(
    "SELECT doc_id, '%d#' || %s::VARCHAR || '#' || %s::VARCHAR || '#' || "
    "%s::VARCHAR AS mk FROM halves"
    % (ci, _SIM_BLOCK_SQL[i], _SIM_BLOCK_SQL[j], _SIM_BLOCK_SQL[k])
    for ci, (i, j, k) in enumerate(_SIM_COMBOS))

ORACLES["simhash_pairs"] = _SIMHASH_CTE + """, halves AS (
      SELECT doc_id, simhash, {h1} AS h1, {h2} AS h2 FROM sims
    ), keyed AS (
      {keyed}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM keyed a JOIN keyed b
        ON a.mk = b.mk AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           (BIT_COUNT(XOR(sa.h1, sb.h1)) + BIT_COUNT(XOR(sa.h2, sb.h2)))::INT
             AS hamming
    FROM cand JOIN halves sa ON sa.doc_id = id_a
              JOIN halves sb ON sb.doc_id = id_b
    WHERE BIT_COUNT(XOR(sa.h1, sb.h1)) + BIT_COUNT(XOR(sa.h2, sb.h2)) <= 3
""".format(h1=_hex2int_sql("simhash", 1), h2=_hex2int_sql("simhash", 9),
           keyed=_SIM_KEYED_SQL)

ORACLES["ngram_jaccard_pairs"] = """
    WITH base AS (
      SELECT doc_id,
             CASE WHEN LEN(w) >= 3
                  THEN LIST_DISTINCT([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                         FOR i IN RANGE(1, LEN(w) - 2 + 1)])
                  ELSE [] END AS sh
      FROM (SELECT doc_id,
                   LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '[^a-z0-9]+'),
                               x -> x <> '') AS w
            FROM documents)
    ), sized AS (
      SELECT doc_id, sh, LEN(sh) AS n_sh FROM base WHERE LEN(sh) > 0
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(LEN(LIST_INTERSECT(a.sh, b.sh))::DOUBLE /
                 (a.n_sh + b.n_sh - LEN(LIST_INTERSECT(a.sh, b.sh))), 4)
             AS jaccard
    FROM sized a JOIN sized b
      ON a.doc_id < b.doc_id
     AND ABS(FLOOR(a.n_sh / 16.0) - FLOOR(b.n_sh / 16.0)) <= 1
    WHERE ROUND(LEN(LIST_INTERSECT(a.sh, b.sh))::DOUBLE /
                (a.n_sh + b.n_sh - LEN(LIST_INTERSECT(a.sh, b.sh))), 4) >= 0.2
"""

ORACLES["repetition_filter"] = """
    WITH w AS (
      SELECT doc_id,
             LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '[^a-z0-9]+'),
                         x -> x <> '') AS w
      FROM documents
    ), base AS (
      SELECT doc_id, w, LEN(w) AS n_words,
             LEN(LIST_DISTINCT(w)) AS n_distinct
      FROM w
    ), grams AS (
      SELECT doc_id, n_words, n_distinct,
             UNNEST(CASE WHEN LEN(w) >= 2
                         THEN [w[i] || ' ' || w[i+1] FOR i IN RANGE(1, LEN(w))]
                         ELSE [NULL] END) AS gram
      FROM base
    ), counts AS (
      SELECT doc_id, n_words, n_distinct, gram, COUNT(gram) AS c
      FROM grams GROUP BY doc_id, n_words, n_distinct, gram
    ), top AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                ORDER BY c DESC, gram ASC NULLS LAST) AS rn
      FROM counts
    )
    SELECT doc_id,
           ROUND(n_distinct::DOUBLE / GREATEST(n_words, 1), 4)
             AS distinct_ratio,
           ROUND(LEAST(2.0 * COALESCE(c, 0) / GREATEST(n_words, 1), 1.0), 4)
             AS top_bigram_frac
    FROM top WHERE rn = 1
"""

ORACLES["tfidf_keywords"] = """
    WITH toks AS (
      SELECT doc_id,
             UNNEST(LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '[^a-z0-9]+'),
                                x -> x <> '')) AS token
      FROM documents
    ), tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token
    ), df AS (
      SELECT token, COUNT(*) AS df
      FROM (SELECT DISTINCT doc_id, token FROM toks) GROUP BY token
    )
    SELECT doc_id, rank, token, tf, df FROM (
      SELECT tf.doc_id, tf.token, tf.tf, df.df,
             ROW_NUMBER() OVER (PARTITION BY tf.doc_id
               ORDER BY tf.tf DESC, df.df ASC, tf.token ASC) AS rank
      FROM tf JOIN df USING (token))
    WHERE rank <= %d
""" % _TFIDF_TOPK

ORACLES["substring_dup_pairs"] = """
    WITH w AS (
      SELECT doc_id,
             LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '[^a-z0-9]+'),
                         x -> x <> '') AS w
      FROM documents
    ), g AS (
      SELECT DISTINCT doc_id,
             MD5(ARRAY_TO_STRING(w[i : i + %(wm1)d], ' ')) AS gram
      FROM w, UNNEST(RANGE(1, LEN(w) - %(win)d + 2)) AS t(i)
      WHERE LEN(w) >= %(win)d
    ), dup AS (
      SELECT gram FROM g GROUP BY gram
      HAVING COUNT(*) > 1 AND COUNT(*) <= %(cap)d
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           COUNT(*) AS n_shared_windows
    FROM g a JOIN dup USING (gram) JOIN g b USING (gram)
    WHERE a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
""" % {"win": _SUBSTR_W, "wm1": _SUBSTR_W - 1, "cap": _SUBSTR_MAX_DF}

ORACLES["docfreq_boilerplate"] = """
    WITH w AS (
      SELECT doc_id,
             LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '[^a-z0-9]+'),
                         x -> x <> '') AS w
      FROM documents
    ), sh AS (
      SELECT doc_id,
             UNNEST(LIST_DISTINCT(
               CASE WHEN LEN(w) >= 3
                    THEN [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                          FOR i IN RANGE(1, LEN(w) - 2 + 1)]
                    ELSE [] END)) AS shingle
      FROM w
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT shingle, COUNT(*) AS n_docs_with,
           ROUND(COUNT(*)::DOUBLE / n_docs, 4) AS doc_frac
    FROM sh, n
    GROUP BY shingle, n_docs
    HAVING COUNT(*) > n_docs * %f
""" % _BOILER_MIN_FRAC

ORACLES["dedup_incremental"] = _BANDS_CTE + """, cand AS (
      SELECT DISTINCT n.doc_id AS id_new, o.doc_id AS id_other
      FROM bands n JOIN bands o
        ON n.band = o.band AND n.doc_id <> o.doc_id
      WHERE n.doc_id % 10 = 9
    ), scored AS (
      SELECT id_new, id_other
      FROM cand JOIN sigs sa ON sa.doc_id = id_new
                JOIN sigs sb ON sb.doc_id = id_other
      WHERE ROUND((CASE WHEN sa.sig0 = sb.sig0 THEN 1 ELSE 0 END + CASE WHEN sa.sig1 = sb.sig1 THEN 1 ELSE 0 END + CASE WHEN sa.sig2 = sb.sig2 THEN 1 ELSE 0 END + CASE WHEN sa.sig3 = sb.sig3 THEN 1 ELSE 0 END + CASE WHEN sa.sig4 = sb.sig4 THEN 1 ELSE 0 END + CASE WHEN sa.sig5 = sb.sig5 THEN 1 ELSE 0 END + CASE WHEN sa.sig6 = sb.sig6 THEN 1 ELSE 0 END + CASE WHEN sa.sig7 = sb.sig7 THEN 1 ELSE 0 END + CASE WHEN sa.sig8 = sb.sig8 THEN 1 ELSE 0 END + CASE WHEN sa.sig9 = sb.sig9 THEN 1 ELSE 0 END + CASE WHEN sa.sig10 = sb.sig10 THEN 1 ELSE 0 END + CASE WHEN sa.sig11 = sb.sig11 THEN 1 ELSE 0 END + CASE WHEN sa.sig12 = sb.sig12 THEN 1 ELSE 0 END + CASE WHEN sa.sig13 = sb.sig13 THEN 1 ELSE 0 END + CASE WHEN sa.sig14 = sb.sig14 THEN 1 ELSE 0 END + CASE WHEN sa.sig15 = sb.sig15 THEN 1 ELSE 0 END + CASE WHEN sa.sig16 = sb.sig16 THEN 1 ELSE 0 END + CASE WHEN sa.sig17 = sb.sig17 THEN 1 ELSE 0 END + CASE WHEN sa.sig18 = sb.sig18 THEN 1 ELSE 0 END + CASE WHEN sa.sig19 = sb.sig19 THEN 1 ELSE 0 END + CASE WHEN sa.sig20 = sb.sig20 THEN 1 ELSE 0 END + CASE WHEN sa.sig21 = sb.sig21 THEN 1 ELSE 0 END + CASE WHEN sa.sig22 = sb.sig22 THEN 1 ELSE 0 END + CASE WHEN sa.sig23 = sb.sig23 THEN 1 ELSE 0 END + CASE WHEN sa.sig24 = sb.sig24 THEN 1 ELSE 0 END + CASE WHEN sa.sig25 = sb.sig25 THEN 1 ELSE 0 END + CASE WHEN sa.sig26 = sb.sig26 THEN 1 ELSE 0 END + CASE WHEN sa.sig27 = sb.sig27 THEN 1 ELSE 0 END + CASE WHEN sa.sig28 = sb.sig28 THEN 1 ELSE 0 END + CASE WHEN sa.sig29 = sb.sig29 THEN 1 ELSE 0 END + CASE WHEN sa.sig30 = sb.sig30 THEN 1 ELSE 0 END + CASE WHEN sa.sig31 = sb.sig31 THEN 1 ELSE 0 END + CASE WHEN sa.sig32 = sb.sig32 THEN 1 ELSE 0 END + CASE WHEN sa.sig33 = sb.sig33 THEN 1 ELSE 0 END + CASE WHEN sa.sig34 = sb.sig34 THEN 1 ELSE 0 END + CASE WHEN sa.sig35 = sb.sig35 THEN 1 ELSE 0 END + CASE WHEN sa.sig36 = sb.sig36 THEN 1 ELSE 0 END + CASE WHEN sa.sig37 = sb.sig37 THEN 1 ELSE 0 END + CASE WHEN sa.sig38 = sb.sig38 THEN 1 ELSE 0 END + CASE WHEN sa.sig39 = sb.sig39 THEN 1 ELSE 0 END + CASE WHEN sa.sig40 = sb.sig40 THEN 1 ELSE 0 END + CASE WHEN sa.sig41 = sb.sig41 THEN 1 ELSE 0 END + CASE WHEN sa.sig42 = sb.sig42 THEN 1 ELSE 0 END + CASE WHEN sa.sig43 = sb.sig43 THEN 1 ELSE 0 END + CASE WHEN sa.sig44 = sb.sig44 THEN 1 ELSE 0 END + CASE WHEN sa.sig45 = sb.sig45 THEN 1 ELSE 0 END + CASE WHEN sa.sig46 = sb.sig46 THEN 1 ELSE 0 END + CASE WHEN sa.sig47 = sb.sig47 THEN 1 ELSE 0 END + CASE WHEN sa.sig48 = sb.sig48 THEN 1 ELSE 0 END + CASE WHEN sa.sig49 = sb.sig49 THEN 1 ELSE 0 END + CASE WHEN sa.sig50 = sb.sig50 THEN 1 ELSE 0 END + CASE WHEN sa.sig51 = sb.sig51 THEN 1 ELSE 0 END + CASE WHEN sa.sig52 = sb.sig52 THEN 1 ELSE 0 END + CASE WHEN sa.sig53 = sb.sig53 THEN 1 ELSE 0 END + CASE WHEN sa.sig54 = sb.sig54 THEN 1 ELSE 0 END + CASE WHEN sa.sig55 = sb.sig55 THEN 1 ELSE 0 END + CASE WHEN sa.sig56 = sb.sig56 THEN 1 ELSE 0 END + CASE WHEN sa.sig57 = sb.sig57 THEN 1 ELSE 0 END + CASE WHEN sa.sig58 = sb.sig58 THEN 1 ELSE 0 END + CASE WHEN sa.sig59 = sb.sig59 THEN 1 ELSE 0 END + CASE WHEN sa.sig60 = sb.sig60 THEN 1 ELSE 0 END + CASE WHEN sa.sig61 = sb.sig61 THEN 1 ELSE 0 END + CASE WHEN sa.sig62 = sb.sig62 THEN 1 ELSE 0 END + CASE WHEN sa.sig63 = sb.sig63 THEN 1 ELSE 0 END)::DOUBLE / 64, 4) >= 0.5
    ), corpus_match AS (
      SELECT id_new, MIN(id_other) AS corpus_id
      FROM scored WHERE id_other % 10 <> 9 GROUP BY id_new
    ), batch_match AS (
      SELECT id_new, MIN(id_other) AS batch_id
      FROM scored WHERE id_other % 10 = 9 AND id_other < id_new
      GROUP BY id_new
    )
    SELECT d.doc_id,
           CASE WHEN c.corpus_id IS NOT NULL THEN 'dup_of_corpus'
                WHEN b.batch_id IS NOT NULL THEN 'dup_in_batch'
                ELSE 'unique' END AS verdict,
           COALESCE(c.corpus_id, b.batch_id) AS matched_id
    FROM documents d
    LEFT JOIN corpus_match c ON d.doc_id = c.id_new
    LEFT JOIN batch_match b ON d.doc_id = b.id_new
    WHERE d.doc_id % 10 = 9
"""

ORACLES["winnow_fingerprints"] = """
    WITH grams AS (
      SELECT doc_id, i::INT AS gpos,
             %(h8)s AS h
      FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS w
            FROM documents),
           UNNEST(RANGE(0, GREATEST(LEN(w) - 3, 0))) AS t(i),
           LATERAL (SELECT MD5(ARRAY_TO_STRING(w[i + 1 : i + 4], ' '))
                    AS hx) s
    ), counts AS (
      SELECT doc_id, MAX(gpos) + 1 AS ng FROM grams GROUP BY doc_id
    ), winidx AS (
      SELECT doc_id,
             UNNEST(RANGE(0, GREATEST(ng - 4, 0))) AS win
      FROM counts
    ), wins AS (
      SELECT g.doc_id, wi.win, g.gpos, g.h,
             ROW_NUMBER() OVER (
               PARTITION BY g.doc_id, wi.win
               ORDER BY g.h ASC, g.gpos DESC) AS rn
      FROM winidx wi
      JOIN grams g ON g.doc_id = wi.doc_id
                  AND g.gpos BETWEEN wi.win AND wi.win + 4
    )
    SELECT DISTINCT doc_id, gpos AS pos, h AS hash
    FROM wins WHERE rn = 1
""" % {"h8": _hex2int_sql("hx", 1, 8)}

QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_minhash": dedup_minhash,
    "dedup_minhash_buckets": dedup_minhash_buckets,
    "dedup_minhash_pairs": dedup_minhash_pairs,
    "dedup_incremental": dedup_incremental,
    "curate_near_dups": curate_near_dups,
    "curate_near_dups_best": curate_near_dups_best,
    "simhash": simhash,
    "simhash_pairs": simhash_pairs,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
    "doc_fingerprint": doc_fingerprint,
    "winnow_fingerprints": winnow_fingerprints,
    "token_count": token_count,
    "quality_score": quality_score,
    "lang_id": lang_id,
    "repetition_filter": repetition_filter,
    "tfidf_keywords": tfidf_keywords,
    "docfreq_boilerplate": docfreq_boilerplate,
    "substring_dup_pairs": substring_dup_pairs,
}
