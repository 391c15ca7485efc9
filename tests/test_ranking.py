"""Ranking-signal operator tests: PageRank and BM25 verified against
independent pure-Python reimplementations of the same integer
micro-unit recurrences on tiny hand-built corpora (the DuckDB oracle
checks cross-engine equality; these check the MATH, with no SQL or
Spark in the expected-value path)."""
import math

import pandas as pd
import pytest

from pdfminer_spark.ops.ranking import (_BM25_QUERY, _BM25_TOPK, _PR_ITERS,
                                        bm25_scores, pagerank)


@pytest.fixture(scope="module")
def tiny_dir(tmp_path_factory):
    rows = [
        (0, "join filter dup join scan the big small"),
        (1, "join join join join filter"),
        (2, "scan scan scan scan scan scan scan scan scan scan scan scan"),
        (3, "the big small fast slow sort query merge"),
        (4, "dup dup filter"),
    ]
    d = tmp_path_factory.mktemp("rankdocs")
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        d / "documents.parquet")
    return str(d)


def _pagerank_py(n: int):
    edges = [(d, (d * 7 + g) % n, d % 3 + 1)
             for d in range(n) for g in range(1, d % 3 + 2)]
    r = {d: 1_000_000 for d in range(n)}
    for _ in range(_PR_ITERS):
        insum = {d: 0 for d in range(n)}
        for src, dst, deg in edges:
            insum[dst] += r[src] // deg
        r = {d: 150_000 + (85 * insum[d]) // 100 for d in range(n)}
    return r


def test_pagerank_matches_pure_python(spark, tiny_dir):
    got = {row["doc_id"]: row["rank6"]
           for row in pagerank(spark, tiny_dir).collect()}
    assert got == _pagerank_py(5)


def test_pagerank_no_rescans_and_ranks_differ(spark, tiny_dir):
    df = pagerank(spark, tiny_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # edges/nodes are materialized once; no per-iteration parquet re-scan
    assert plan.count("FileScan parquet") == 0
    ranks = [row["rank6"] for row in df.collect()]
    # irregular out-degree -> non-uniform converged ranks (a symmetric
    # graph would let a mis-keyed join hide behind uniformity)
    assert len(set(ranks)) > 1
    # damping floor: every rank >= teleport mass
    assert min(ranks) >= 150_000


def _bm25_py(rows):
    toks = {d: [w for w in text.lower().split() if w] for d, text in rows}
    n = len(rows)
    l = sum(len(w) for w in toks.values())
    score = {}
    for t in _BM25_QUERY:
        df = sum(1 for w in toks.values() if t in w)
        if df == 0:
            continue
        idf6 = math.floor(1e6 * math.log((2 * n + 2) / (2 * df + 1)))
        for d, w in toks.items():
            tf = w.count(t)
            if tf:
                score[d] = score.get(d, 0) + (
                    (idf6 * 22 * tf * l)
                    // (10 * l * tf + 3 * l + 9 * len(w) * n))
    ranked = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(i + 1, d, s) for i, (d, s) in enumerate(ranked[:_BM25_TOPK])]


def test_bm25_matches_pure_python(spark, tiny_dir):
    rows = [(0, "join filter dup join scan the big small"),
            (1, "join join join join filter"),
            (2, "scan scan scan scan scan scan scan scan scan scan scan scan"),
            (3, "the big small fast slow sort query merge"),
            (4, "dup dup filter")]
    got = [(r["rank"], r["doc_id"], r["bm25_e6"])
           for r in bm25_scores(spark, tiny_dir)
           .orderBy("rank").collect()]
    assert got == _bm25_py(rows)
    # doc 3 contains no query term at all -> absent
    assert 3 not in {d for _, d, _ in got}
    # doc 0 matches all four query terms (incl. rare 'dup') -> top;
    # tf saturation: doc 2's 12x 'scan' lands LAST among matches —
    # repeating one common term cannot beat term diversity
    assert got[0][1] == 0
    assert got[-1][1] == 2


def _lift_py(rows):
    from pdfminer_spark.ops.ranking import _LIFT_TOPK, _LIFT_VOCAB
    toks = {d: set(text.lower().split()) for d, text in rows}
    n = len(rows)
    df = {}
    for w in toks.values():
        for t in w:
            df[t] = df.get(t, 0) + 1
    vocab = set(sorted(df, key=lambda t: (-df[t], t))[:_LIFT_VOCAB])
    pc = {}
    for w in toks.values():
        kept = sorted(t for t in w if t in vocab)
        for i in range(len(kept)):
            for j in range(i + 1, len(kept)):
                pc[(kept[i], kept[j])] = pc.get((kept[i], kept[j]), 0) + 1
    scored = sorted(
        ((a, b, c, (1_000_000 * n * c) // (df[a] * df[b]))
         for ((a, b), c) in pc.items()),
        key=lambda r: (-r[3], r[0], r[1]))
    return [(i + 1, a, b, c, s)
            for i, (a, b, c, s) in enumerate(scored[:_LIFT_TOPK])]


def test_cooccurrence_lift_matches_pure_python(spark, tmp_path):
    from pdfminer_spark.ops.ranking import cooccurrence_lift

    rows = [
        (0, "alpha beta gamma delta"),
        (1, "alpha beta gamma"),
        (2, "alpha beta"),
        (3, "gamma delta epsilon"),
        (4, "epsilon zeta eta theta"),
        (5, "zeta eta"),
        (6, "alpha epsilon zeta"),
    ]
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        tmp_path / "documents.parquet")
    got = [(r["rank"], r["token_a"], r["token_b"], r["df_ab"], r["lift6"])
           for r in cooccurrence_lift(spark, str(tmp_path))
           .orderBy("rank").collect()]
    expect = _lift_py(rows)
    assert got == expect
    # rare always-together pairs dominate (classic PMI): (eta, theta)
    # df_theta=1, co-occur once -> lift 7*1/(2*1) = 3.5
    top = got[0]
    assert (top[1], top[2]) == ("eta", "theta")
    assert top[4] == 1_000_000 * 7 * 1 // (2 * 1)
    # and an always-together pair of COMMON tokens still beats the same
    # tokens' independent expectation: (eta, zeta) 7*2/(2*3) outranks
    # (alpha, gamma) 7*2/(4*3)
    order = {(a, b): r for (r, a, b, _, _) in got}
    assert order[("eta", "zeta")] < order[("alpha", "gamma")]
