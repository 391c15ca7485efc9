"""TagExtractor / dumppdf analogs: tagged-content stream + object census."""
from pdfminer_spark.pdf.tags import extract_tags, get_outlines, object_census

from conftest import payload


def test_tags_simple1():
    out = extract_tags(payload("simple1"))
    assert out.startswith('<page id="0" bbox="0.000,0.000,612.000,792.000" '
                          'rotate="0">')
    assert "Hello WorldHello World" in out
    assert out.rstrip().endswith("</page>")


def test_census_covers_all_objects():
    rows = object_census(payload("simple1"))
    assert {r["objid"] for r in rows} == set(range(1, 8))
    types = {r["objid"]: r["type"] for r in rows}
    assert types[5] == "stream"      # the content stream
    assert types[6] == "list"        # ProcSet
    assert types[7] == "dict"        # the font


def test_census_large_doc():
    rows = object_census(payload("nonfree/i1040nr"))
    assert len(rows) > 100
    assert any(r["type"] == "stream" for r in rows)


def test_outlines_no_crash():
    for name in ("simple1", "jo", "nonfree/dmca"):
        list(get_outlines(payload(name)))


def test_embedded_files_and_dest():
    import os

    from pdfminer_spark.pdf.document import PdfDocument
    from pdfminer_spark.pdf.tags import extract_embedded_files, get_dest

    from conftest import PAYLOADS

    with open(os.path.join(PAYLOADS, "synthetic", "attach.pdf"), "rb") as fp:
        pdf = fp.read()
    files = extract_embedded_files(pdf)
    assert len(files) == 1
    assert files[0]["filename"] == "notes.txt"
    assert files[0]["payload"].startswith(b"attachment payload bytes")
    dest = get_dest(PdfDocument(pdf), b"top")
    assert str(dest[1]) == "XYZ"
