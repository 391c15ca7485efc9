"""CLI conformance: the pdf2txt.py-compatible entry point reproduces
goldens through the command-line surface."""
import io
import os
import subprocess
import sys

from conftest import FIXTURES, GOLDENS, PAYLOADS

REPO = os.path.dirname(FIXTURES)


def run_cli(*args: str) -> bytes:
    r = subprocess.run(
        [sys.executable, "-m", "pdfminer_spark.cli", *args],
        capture_output=True, cwd=REPO, timeout=120)
    assert r.returncode == 0, r.stderr.decode()[:500]
    return r.stdout


def test_cli_text_golden():
    out = run_cli("-p", "1", "-V", os.path.join(PAYLOADS, "simple1.pdf"))
    with open(os.path.join(GOLDENS, "simple1.txt.ref"), "rb") as fp:
        assert out == fp.read()


def test_cli_xml_golden():
    out = run_cli("-p", "1", "-V", "-t", "xml",
                  os.path.join(PAYLOADS, "jo.pdf"))
    with open(os.path.join(GOLDENS, "jo.xml.ref"), "rb") as fp:
        assert out == fp.read()


def test_cli_encrypted():
    out = run_cli("-p", "1", "-V", "-P", "baz", "-t", "xml",
                  os.path.join(PAYLOADS, "encryption/rc4-128.pdf"))
    with open(os.path.join(GOLDENS, "encryption/base.xml"), "rb") as fp:
        assert out == fp.read()


def test_cli_no_layout():
    out = run_cli("-n", os.path.join(PAYLOADS, "simple1.pdf"))
    assert out.startswith(b"Hello WorldHello World")
