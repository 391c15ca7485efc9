"""HTML-output golden regression vs *.html.ref (absolute-positioned div
rendering, default normal layout mode)."""
import os

import pytest

from pdfminer_spark.pdf.htmlout import extract_html
from pdfminer_spark.pdf.layout import LAParams

from conftest import GOLDENS, payload

SAMPLES = [
    "simple1", "simple2", "simple3", "jo",
    "nonfree/dmca", "nonfree/f1040nr", "nonfree/i1040nr", "nonfree/kampo",
    "nonfree/naacl06-shinyama", "nonfree/nlp2004slides",
]


@pytest.mark.parametrize("name", SAMPLES)
def test_html_golden(name):
    html = extract_html(payload(name), page_numbers=[0],
                        laparams=LAParams(detect_vertical=True))
    with open(os.path.join(GOLDENS, name + ".html.ref"), "rb") as fp:
        assert html == fp.read().decode("utf-8")
