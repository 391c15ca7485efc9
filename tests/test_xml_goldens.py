"""Span-level golden regression: XML output byte equality vs *.xml.ref
(box/line/char bboxes at %.3f — the layout-analysis contract)."""
import os

import pytest

from pdfminer_spark.pdf.layout import LAParams
from pdfminer_spark.pdf.xmlout import extract_xml

from conftest import GOLDENS, payload

SAMPLES = [
    "simple1", "simple2", "simple3", "jo",
    "nonfree/dmca", "nonfree/f1040nr", "nonfree/i1040nr", "nonfree/kampo",
    "nonfree/naacl06-shinyama", "nonfree/nlp2004slides",
]


def golden_xml(name: str) -> str:
    with open(os.path.join(GOLDENS, name + ".xml.ref"), "rb") as fp:
        return fp.read().decode("utf-8")


@pytest.mark.parametrize("name", SAMPLES)
def test_xml_golden(name):
    xml = extract_xml(payload(name), page_numbers=[0],
                      laparams=LAParams(detect_vertical=True))
    assert xml == golden_xml(name)


@pytest.mark.parametrize("name", ["rc4-40", "aes-128", "aes-256"])
@pytest.mark.parametrize("password", [b"foo", b"baz"], ids=["user", "owner"])
def test_encrypted_xml_golden(name, password):
    with open(os.path.join(GOLDENS, "encryption/base.xml"), "rb") as fp:
        base = fp.read().decode("utf-8")
    xml = extract_xml(payload("encryption/" + name), password=password,
                      page_numbers=[0], laparams=LAParams(detect_vertical=True))
    assert xml == base
