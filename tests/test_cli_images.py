"""pdf2txt CLI -O/-R/-C/-d flags (round-3 verdict #2: the getopt string
accepted them with no handler).

Image-export parity target: the reference's ImageWriter under the minimal
Python-3 fix (its ``len(get_filters())`` crashes on a zip, image.py:74) —
sha256 pins below were produced by that patched live reference; a live
byte-parity run is also kept for when the checkout exists.
"""
import hashlib
import os

import pytest

from tests.conftest import PAYLOADS

REFERENCE = "/root/reference"

# (sample, expected files {name: sha256}) from the patched live reference.
# Quirk pinned: only single-DCTDecode JPEG and 1-bit BMP paths are live in
# the reference (LTImage.colorspace is always a list, so its RGB/GRAY
# branches never fire) — 8-bit images land in name.<bits>.<W>x<H>.img.
IMAGE_PINS = {
    "nonfree/dmca": {
        "im1.8.114x109.img":
            "a7c88d4a224b1236011d1bd2ed9393a53b5d897d51a82bb21eddcbbf1aefc809",
    },
    "nonfree/i1040nr": {
        "Im1.jpg":
            "9c9773e93aa5c6dcaffed826b46d18402d5a0ded51a400a8163cf80a18823459",
    },
    "nonfree/nlp2004slides": {
        "Im1.8.82x80.img":
            "958a03f6dc22a8ed300f1c38ab21fd07ad0c2fd5817f0158203e5b0bfe256cd0",
    },
}


def _pdf(name):
    return os.path.join(PAYLOADS, name + ".pdf")


@pytest.mark.parametrize("name", sorted(IMAGE_PINS))
def test_image_export_matches_reference_pins(name, tmp_path):
    from pdfminer_spark.cli import main

    outdir = tmp_path / "img"
    assert main(["cli", "-O", str(outdir), "-o", os.devnull,
                 _pdf(name)]) == 0
    got = {f: hashlib.sha256((outdir / f).read_bytes()).hexdigest()
           for f in os.listdir(outdir)}
    assert got == IMAGE_PINS[name]


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="no reference")
def test_image_export_matches_live_reference(tmp_path):
    """Byte parity vs the reference ImageWriter itself (len() fix only)."""
    import sys

    sys.path.insert(0, REFERENCE)
    import pdfminer.pdftypes as pdftypes
    from pdfminer.converter import TextConverter
    from pdfminer.image import ImageWriter
    from pdfminer.layout import LAParams
    from pdfminer.pdfinterp import PDFPageInterpreter, PDFResourceManager
    from pdfminer.pdfpage import PDFPage

    orig = pdftypes.PDFStream.get_filters
    pdftypes.PDFStream.get_filters = lambda self: list(orig(self))
    try:
        refdir = tmp_path / "ref"
        rsrcmgr = PDFResourceManager()
        import io

        device = TextConverter(rsrcmgr, io.StringIO(), laparams=LAParams(),
                               imagewriter=ImageWriter(str(refdir)))
        interp = PDFPageInterpreter(rsrcmgr, device)
        with open(os.path.join(REFERENCE, "samples", "nonfree", "dmca.pdf"),
                  "rb") as fp:
            for page in PDFPage.get_pages(fp):
                interp.process_page(page)
        device.close()
    finally:
        pdftypes.PDFStream.get_filters = orig

    from pdfminer_spark.cli import main

    mydir = tmp_path / "mine"
    assert main(["cli", "-O", str(mydir), "-o", os.devnull,
                 _pdf("nonfree/dmca")]) == 0
    assert sorted(os.listdir(refdir)) == sorted(os.listdir(mydir))
    for f in os.listdir(refdir):
        assert (refdir / f).read_bytes() == (mydir / f).read_bytes(), f


def test_ref_bmp_1bit_truncation_quirk():
    """The reference BMPWriter seeks rows bottom-up and never writes the
    top source row's alignment pad, so the file ends short of the size
    its own header claims (width not a multiple of 32)."""
    from pdfminer_spark.pdf.images import _ref_bmp_1bit

    out = _ref_bmp_1bit(3, 2, b"\xa0\x40")
    headersize = 14 + 40 + 8
    linesize = 4  # align32((3+7)//8)
    assert len(out) == headersize + 2 * linesize - linesize + 1  # 67
    claimed = int.from_bytes(out[2:6], "little")
    assert claimed == headersize + 2 * linesize  # 70 > actual 67
    # bottom-up: source row 1 (0x40) at offset headersize, row 0 at +4
    assert out[headersize] == 0x40
    assert out[headersize + linesize] == 0xA0


def test_inline_images_exported_with_deterministic_names(tmp_path):
    """Inline BI/ID/EI images export too; the reference names them
    str(id(obj)) (nondeterministic across runs) — ours are inline-N,
    a documented divergence."""
    from pdfminer_spark.cli import main

    outdir = tmp_path / "img"
    assert main(["cli", "-O", str(outdir), "-o", os.devnull,
                 _pdf("synthetic/inlineimg")]) == 0
    names = sorted(os.listdir(outdir))
    assert names and all(n.startswith("inline-") for n in names)


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="no reference")
def test_rotation_flag_matches_live_reference(tmp_path):
    import subprocess
    import sys

    ref_out = tmp_path / "ref.txt"
    env = dict(os.environ, PYTHONPATH=REFERENCE)
    subprocess.run(
        [sys.executable, os.path.join(REFERENCE, "tools", "pdf2txt.py"),
         "-R", "90", "-o", str(ref_out),
         os.path.join(REFERENCE, "samples", "simple1.pdf")],
        env=env, check=True, capture_output=True)
    my_out = tmp_path / "mine.txt"
    from pdfminer_spark.cli import main

    assert main(["cli", "-R", "90", "-o", str(my_out),
                 _pdf("simple1")]) == 0
    assert my_out.read_bytes() == ref_out.read_bytes()


def test_rotation_changes_layout():
    from pdfminer_spark.pdf.extract import extract_text

    data = open(_pdf("simple1"), "rb").read()
    assert extract_text(data, rotation=90) != extract_text(data)
    assert extract_text(data, rotation=360) == extract_text(data)


def test_caching_toggle_output_identical():
    """-C is a perf toggle: byte-identical output, memo tables stay empty."""
    from pdfminer_spark.pdf.document import PdfDocument
    from pdfminer_spark.pdf.extract import extract_text

    data = open(_pdf("jo"), "rb").read()
    assert extract_text(data, caching=False) == extract_text(data)
    doc = PdfDocument(data, caching=False)
    doc.getobj(1)
    assert not doc._cache


def test_debug_flag_reports_progress(tmp_path, capsys):
    from pdfminer_spark.cli import main

    assert main(["cli", "-d", "-o", str(tmp_path / "o.txt"),
                 _pdf("simple1")]) == 0
    assert "processing" in capsys.readouterr().err
