"""Embedded-image export (ImageWriter analog, DF-friendly bytes API)."""
from pdfminer_spark.pdf.images import extract_images

from conftest import payload


def test_extract_images_dmca():
    rows = extract_images(payload("nonfree/dmca"))
    assert len(rows) == 1
    r = rows[0]
    assert (r["width"], r["height"], r["bits"]) == (114, 109, 8)
    assert len(r["payload"]) == 114 * 109


def test_extract_images_none():
    assert extract_images(payload("simple1")) == []
