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


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="no reference")
@pytest.mark.parametrize("mode", ["exact", "loose"])
def test_layoutmode_matches_live_reference(mode, tmp_path):
    """-Y exact/loose byte parity vs the live reference (the .html.ref
    goldens only cover 'normal'); samples restricted to non-CJK ones the
    live checkout can decode without built CMap resources."""
    import subprocess
    import sys

    for name in ("simple1", "nonfree/dmca"):
        ref_out = tmp_path / "ref.html"
        subprocess.run(
            [sys.executable, "/root/reference/tools/pdf2txt.py",
             "-Y", mode, "-o", str(ref_out),
             os.path.join("/root/reference/samples", name + ".pdf")],
            env=dict(os.environ, PYTHONPATH="/root/reference"),
            check=True, capture_output=True)
        mine = extract_html(payload(name), layoutmode=mode,
                            laparams=LAParams())
        assert mine == ref_out.read_text(), (name, mode)
