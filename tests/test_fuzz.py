"""Property/fuzz tests: arbitrary bytes must never hang or crash the
engine with anything but the typed PdfSyntaxError — one poison payload per
10^12 turns is a certainty, and the pipeline turns failures into a status
column, never task deaths."""
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

from pdfminer_spark.pdf.document import PdfSyntaxError  # noqa: E402
from pdfminer_spark.pdf.extract import extract_text  # noqa: E402
from pdfminer_spark.pdf.lexer import Lexer, LexerEOF  # noqa: E402
from pdfminer_spark.spark.pipeline import extract_one  # noqa: E402

from conftest import payload  # noqa: E402


@given(st.binary(max_size=4096))
@settings(max_examples=200, deadline=None)
def test_lexer_never_crashes(data):
    lx = Lexer(data)
    for _ in range(10000):
        try:
            lx.next_token()
        except LexerEOF:
            break


@given(st.binary(max_size=2048))
@settings(max_examples=100, deadline=None)
def test_extract_rejects_garbage_cleanly(data):
    try:
        extract_text(data)
    except PdfSyntaxError:
        pass


@given(st.integers(min_value=1, max_value=2000), st.integers(min_value=0, max_value=255))
@settings(max_examples=50, deadline=None)
def test_mutated_real_pdf_no_catastrophic_failure(cut, noise):
    data = payload("simple1")
    mutated = data[:cut] + bytes([noise]) + data[cut:]
    try:
        extract_text(mutated, page_numbers=[0])
    except (RecursionError, MemoryError, SystemError):
        raise
    except Exception:
        # any ordinary exception becomes a status cell in the pipeline
        pass


@given(st.text(max_size=500))
@settings(max_examples=100, deadline=None)
def test_extract_one_html_total(text):
    (out, _, _, _, status) = extract_one(text, "html")
    assert status == "ok"
    assert isinstance(out, str)
