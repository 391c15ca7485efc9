"""Synthetic-construct differential goldens.

tools/gen_testpdfs.py builds PDFs isolating constructs the sample corpus
doesn't (rotations, text-state ops, split content streams, filters, form
XObjects, inline images, ObjStm/xref-stream files); the expected outputs
were produced by the reference implementation and vendored under
fixtures/goldens/synthetic/. Full-document (all pages), both formats.
"""
import os

import pytest

from pdfminer_spark.pdf.extract import extract_text
from pdfminer_spark.pdf.layout import LAParams
from pdfminer_spark.pdf.xmlout import extract_xml

from conftest import FIXTURES

SYN_PAYLOADS = os.path.join(FIXTURES, "payloads", "synthetic")
SYN_GOLDENS = os.path.join(FIXTURES, "goldens", "synthetic")

NAMES = sorted(n[:-4] for n in os.listdir(SYN_PAYLOADS) if n.endswith(".pdf"))
LA = LAParams(detect_vertical=True)


def _payload(name):
    with open(os.path.join(SYN_PAYLOADS, name + ".pdf"), "rb") as fp:
        return fp.read()


def _golden(name, ext):
    with open(os.path.join(SYN_GOLDENS, name + ext), "rb") as fp:
        return fp.read().decode("utf-8")


@pytest.mark.parametrize("name", NAMES)
def test_synthetic_text(name):
    assert extract_text(_payload(name), laparams=LA) == _golden(name, ".txt.ref")


@pytest.mark.parametrize(
    "name", [n for n in NAMES
             if os.path.exists(os.path.join(SYN_GOLDENS, n + ".xml.ref"))])
def test_synthetic_xml(name):
    assert extract_xml(_payload(name), laparams=LA) == _golden(name, ".xml.ref")
