"""curate_pdf_corpus (r4 verdict #6): the extraction engine feeding the
curation chain as one query — real PDF extraction in, per-doc verdicts
out, DuckDB oracle over the vendored golden texts."""
import duckdb
import pytest


@pytest.fixture(scope="module")
def result(spark):
    from pdfminer_spark.ops.pdfcorpus import curate_pdf_corpus
    return {r["name"]: r for r in curate_pdf_corpus(spark, "").collect()}


def test_one_row_per_vendored_sample(result):
    from pdfminer_spark.spark.fixtures import SAMPLE_NAMES
    assert set(result) == set(SAMPLE_NAMES)


def test_zero_word_pages_survive_with_guarded_ratios(result):
    # simple2 page 0 extracts to a lone form feed; jo/kampo are CJK
    # (no [a-z0-9'] tokens) — all must be PRESENT with 0-word metrics,
    # not dropped or NULL-divided
    for name in ("simple2", "jo", "nonfree/kampo"):
        r = result[name]
        assert r["n_words"] == 0 and r["mean_word_len"] == 0.0
        assert r["n_paras"] == 0 and not r["passes_gopher"]
        assert not r["keep"]


def test_prose_documents_pass_gopher(result):
    r = result["nonfree/dmca"]
    assert r["passes_gopher"] and r["keep"] and not r["minhash_dup"]
    assert r["n_words"] > 200 and 3 <= r["mean_word_len"] <= 10


def test_matches_golden_text_oracle(spark):
    from pdfminer_spark.ops.pdfcorpus import ORACLES, curate_pdf_corpus
    sp = (curate_pdf_corpus(spark, "").orderBy("doc_id")
          .toPandas())
    du = duckdb.connect().execute(
        ORACLES["curate_pdf_corpus"] + " ORDER BY doc_id").fetchdf()
    assert sp["name"].tolist() == du["name"].tolist()
    for col in ("n_words", "n_paras", "n_dup_paras", "passes_gopher",
                "minhash_dup", "keep", "mean_word_len"):
        assert sp[col].tolist() == du[col].tolist(), col
