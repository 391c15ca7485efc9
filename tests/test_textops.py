"""Dedup / similarity text-op unit tests: short-doc ANSI safety, bucket-
boundary recall, LSH banding recall on seeded near-dups (VERDICT r1 items
#6/#7 + ADVICE short-doc guard)."""
import os

import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def tiny_dir(tmp_path_factory):
    """documents.parquet with adversarial rows: empty/1/2-word docs (the
    ANSI INVALID_ARRAY_INDEX trap) and a near-dup pair whose shingle
    counts straddle a multiple of 16 (15 vs 16 shingles)."""
    import pandas as pd

    words = ["w%d" % i for i in range(18)]
    rows = [
        (0, ""),                        # empty -> split yields ['']
        (1, "one"),                     # 1 token
        (2, "two words"),               # 2 tokens
        (3, "a b c"),                   # exactly 3 tokens -> 1 shingle
        (4, " ".join(words[:17])),      # 15 shingles (bucket 0)
        (5, " ".join(words[:18])),      # 16 shingles (bucket 1)
    ]
    d = tmp_path_factory.mktemp("tinydocs")
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        os.path.join(d, "documents.parquet"))
    return str(d)


def test_short_docs_do_not_crash_minhash(spark, tiny_dir):
    from pdfminer_spark.ops.textops import dedup_minhash

    out = dedup_minhash(spark, tiny_dir).collect()
    ids = sorted(r["doc_id"] for r in out)
    # <3-token docs drop out (no 3-gram shingles); no ANSI index error
    assert ids == [3, 4, 5]
    assert all(r["sig0"] is not None for r in out)


def test_short_docs_do_not_crash_jaccard_and_boundary_pair_found(spark, tiny_dir):
    from pdfminer_spark.ops.textops import ngram_jaccard_pairs

    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(spark, tiny_dir).collect()}
    # the 15-vs-16-shingle near-dup pair straddles bucket 0|1 and must
    # still be found (adjacent-bucket probing); J = 15/16
    assert (4, 5) in pairs
    assert pairs[(4, 5)] == pytest.approx(0.9375, abs=1e-4)


def test_minhash_banding_recall_vs_exact_jaccard(spark):
    """Every true J>=0.8 pair in the sf corpus must surface as a banded-
    LSH candidate (P(miss) = (1-J^4)^16 <= 4e-4 at J=0.8), and its
    64-perm signature estimate must land near the true Jaccard."""
    from pdfminer_spark.ops.textops import (dedup_minhash_pairs,
                                            ngram_jaccard_pairs)

    true_pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
                  for r in ngram_jaccard_pairs(spark, SF_DIR).collect()
                  if r["jaccard"] >= 0.8}
    assert true_pairs, "fixture corpus should contain J>=0.8 near-dups"
    cand = {(r["id_a"], r["id_b"]): r["est_jaccard"]
            for r in dedup_minhash_pairs(spark, SF_DIR).collect()}
    missed = set(true_pairs) - set(cand)
    assert not missed, f"LSH banding missed true near-dups: {missed}"
    for key, j in true_pairs.items():
        assert abs(cand[key] - j) < 0.25  # 64-perm estimator tolerance


def test_simhash_pairs_hamming_and_seeded_dup(spark, tmp_path):
    import pandas as pd

    # 200 tokens: one extra token flips only bits whose +-1 sum sits at 0,
    # P ~ sqrt(2/(pi*200)) per bit -> hamming 2 for this seed (verified)
    base = " ".join("tok%d" % i for i in range(200))
    rows = [
        (0, base),
        (1, base + " extra"),     # one extra token -> tiny hamming
        (2, " ".join("zzz%d" % i for i in range(200))),  # unrelated
    ]
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        tmp_path / "documents.parquet")
    from pdfminer_spark.ops.textops import simhash_pairs

    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in simhash_pairs(spark, str(tmp_path)).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] <= 3
    assert all(h <= 3 for h in pairs.values())


def test_curate_near_dups_keep_first(spark):
    """Near-dup removal keeps the lower doc_id of every J>=0.8 pair and
    never removes a document that has no candidate partner."""
    from pdfminer_spark.ops.textops import (curate_near_dups,
                                            dedup_minhash_pairs,
                                            ngram_jaccard_pairs)

    kept = {r["doc_id"] for r in curate_near_dups(spark, SF_DIR).collect()}
    true_pairs = [(r["id_a"], r["id_b"])
                  for r in ngram_jaccard_pairs(spark, SF_DIR).collect()
                  if r["jaccard"] >= 0.8]
    assert true_pairs
    for (a, b) in true_pairs:
        assert a in kept or a in {x for (_, x) in true_pairs}
        assert b not in kept  # higher id of a true near-dup pair removed
    cand_ids = set()
    for r in dedup_minhash_pairs(spark, SF_DIR).collect():
        cand_ids.add(r["id_a"]); cand_ids.add(r["id_b"])
    import pyspark.sql.functions as F
    all_ids = {r["doc_id"] for r in
               spark.read.parquet(f"{SF_DIR}/documents.parquet")
               .select("doc_id").collect()}
    assert all_ids - cand_ids <= kept  # non-candidates always survive
