"""dumppdf parity: byte-exact XML object dumps vs the reference tool
(vendored goldens for the free samples, md5 pins for the nonfree ones,
live reference comparison across all modes when the checkout exists)."""
import hashlib
import io
import json
import os

import pytest

from tests.conftest import FIXTURES, PAYLOADS, REPO

REFERENCE = "/root/reference"
DUMPDIR = os.path.join(FIXTURES, "goldens", "dump")
FREE = ["simple1", "simple2", "simple3", "jo"]


def _pdf(name):
    """Vendored sample payloads — offline-capable, no reference needed."""
    with open(os.path.join(PAYLOADS, name + ".pdf"), "rb") as fp:
        return fp.read()


@pytest.mark.parametrize("name", FREE)
def test_dumpall_matches_vendored_golden(name):
    from pdfminer_spark.pdf.dump import dump_pdf

    ref = open(os.path.join(DUMPDIR, name + ".dumpxml.ref")).read()
    assert dump_pdf(_pdf(name), dumpall=True) == ref


def test_dumpall_nonfree_md5_pins():
    from pdfminer_spark.pdf.dump import dump_pdf

    pins = json.load(open(os.path.join(DUMPDIR, "nonfree_md5.json")))
    for (name, md5) in pins.items():
        got = hashlib.md5(dump_pdf(_pdf(name), dumpall=True)
                          .encode()).hexdigest()
        assert got == md5, name


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="no reference")
def test_all_modes_match_live_reference():
    """Run the reference's own dumppdf over every sample in every mode
    and require byte equality (50 comparisons)."""
    import sys

    sys.path.insert(0, REFERENCE)
    src = open(os.path.join(REFERENCE, "tools", "dumppdf.py")).read()
    src = src.replace(
        "if __name__ == '__main__': sys.exit(main(sys.argv))", "")
    g: dict = {}
    exec(compile(src, "dumppdf.py", "exec"), g)
    from pdfminer_spark.pdf.dump import dump_pdf

    names = FREE + ["nonfree/dmca", "nonfree/f1040nr", "nonfree/i1040nr",
                    "nonfree/kampo", "nonfree/naacl06-shinyama",
                    "nonfree/nlp2004slides"]
    modes = [{"dumpall": True}, {}, {"pagenos": {0}}, {"objids": [1]},
             {"dumpall": True, "mode": "text"},
             # pagenos+mode exercises the page content-stream dump branch
             # (stream_value path) — round-3 advice: pin its byte parity
             {"pagenos": {0}, "mode": "text"},
             {"pagenos": {0}, "mode": "raw"}]
    for name in names:
        path = os.path.join(REFERENCE, "samples", name + ".pdf")
        data = open(path, "rb").read()
        for kw in modes:
            raw_mode = kw.get("mode") in ("raw", "binary")
            if raw_mode:
                # the reference writes stream payloads to out.buffer:
                # capture bytes through a write-through text wrapper
                buf = io.BytesIO()
                out = io.TextIOWrapper(buf, encoding="utf-8",
                                       write_through=True)
            else:
                out = io.StringIO()
            g["dumppdf"](out, path, kw.get("objids", []),
                         kw.get("pagenos", set()), password=b"",
                         dumpall=kw.get("dumpall", False),
                         mode=kw.get("mode"))
            if raw_mode:
                out.flush()
                assert dump_pdf(data, **kw).encode("latin-1") == \
                    buf.getvalue(), (name, kw)
            else:
                assert dump_pdf(data, **kw) == out.getvalue(), (name, kw)


def test_dump_cli_smoke(tmp_path, capsys):
    from pdfminer_spark.dumpcli import main

    path = os.path.join(PAYLOADS, "simple1.pdf")
    assert main(["dumpcli", "-a", path]) == 0
    out = capsys.readouterr().out
    assert out.startswith("<pdf><object id=")
    assert "<trailer>" in out


def test_dump_cli_raw_mode_byte_exact(tmp_path):
    """-r must write stream bytes VERBATIM (a UTF-8 text handle would
    expand every byte >= 0x80; review finding)."""
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import zlib

    from gen_testpdfs import _classic_pdf, _stream_obj

    raw = bytes(range(256)) * 4
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 10 10] "
            b"/Contents 4 0 R >>"),
        4: _stream_obj(b"/Filter /FlateDecode", zlib.compress(raw)),
    }
    pdf_path = tmp_path / "raw.pdf"
    pdf_path.write_bytes(_classic_pdf(objs))
    out = tmp_path / "dump.bin"
    from pdfminer_spark.dumpcli import main

    assert main(["dumpcli", "-b", "-i", "4", "-o", str(out),
                 str(pdf_path)]) == 0
    assert out.read_bytes() == raw  # decoded stream, byte-for-byte


def test_dumpoutline_no_crash_on_outlines(tmp_path):
    """The reference's -T NameErrors on real outlines; ours emits the
    structure. Synthesize a doc with a 2-level outline tree."""
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from gen_testpdfs import basic

    extra = {
        6: b"<< /Type /Outlines /First 7 0 R /Last 7 0 R /Count 1 >>",
        7: (b"<< /Title (Chapter 1) /Parent 6 0 R /Dest [3 0 R /XYZ 0 792 0] "
            b"/First 8 0 R /Last 8 0 R >>"),
        8: b"<< /Title (Section 1.1) /Parent 7 0 R /Dest [3 0 R /XYZ 0 700 0] >>",
    }
    pdf = basic(b"BT /F1 12 Tf 72 720 Td (x) Tj ET", extra_objects=extra)
    # wire /Outlines into the catalog
    pdf = pdf.replace(b"<< /Type /Catalog /Pages 2 0 R >>",
                      b"<< /Type /Catalog /Pages 2 0 R /Outlines 6 0 R >>")
    # rebuild via gen helper instead: offsets changed -> reparse leniently
    from pdfminer_spark.pdf.dump import dumpoutline

    buf = io.StringIO()
    dumpoutline(buf, pdf)
    out = buf.getvalue()
    assert '<outline level="1" title="Chapter 1">' in out
    assert '<outline level="2" title="Section 1.1">' in out
    # dests resolve to page 3 0 R == pageno 0 (reference dumppdf.py:157
    # emits <pageno>%r</pageno> when the dest's first element is a page)
    assert out.count("<pageno>0</pageno>") == 2
    assert '<dest><list size="5">' in out


def test_dumpoutline_goto_action_and_named_dest():
    """No /Dest: a /A GoTo action supplies it; named (string) dests go
    through the name tree (reference dumppdf.py:128-149)."""
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from gen_testpdfs import basic

    extra = {
        6: b"<< /Type /Outlines /First 7 0 R /Last 8 0 R /Count 2 >>",
        7: (b"<< /Title (Via Action) /Parent 6 0 R /Next 8 0 R "
            b"/A << /S /GoTo /D [3 0 R /Fit] >> >>"),
        8: b"<< /Title (Via Name) /Parent 6 0 R /Dest (top) >>",
        9: b"<< /Names [ (top) [3 0 R /XYZ 0 792 null] ] >>",
    }
    pdf = basic(b"BT /F1 12 Tf 72 720 Td (x) Tj ET", extra_objects=extra)
    pdf = pdf.replace(
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Catalog /Pages 2 0 R /Outlines 6 0 R "
        b"/Names << /Dests 9 0 R >> >>")
    from pdfminer_spark.pdf.dump import dumpoutline

    buf = io.StringIO()
    dumpoutline(buf, pdf)
    out = buf.getvalue()
    assert out.count("<pageno>0</pageno>") == 2
    assert '<outline level="1" title="Via Action">' in out
    assert '<outline level="1" title="Via Name">' in out


def test_dump_cli_embedded_extract(tmp_path, capsys):
    """dumppdf -O: write attachments to a directory (reference
    tools/dumppdf.py:166-198); refuses to overwrite."""
    from pdfminer_spark.dumpcli import main

    path = os.path.join(PAYLOADS, "synthetic", "attach.pdf")
    outdir = tmp_path / "emb"
    assert main(["dumpcli", "-O", str(outdir), path]) == 0
    assert (outdir / "notes.txt").read_bytes() == b"attachment payload bytes\n"
    assert "extracting:" in capsys.readouterr().err
    with pytest.raises(IOError):
        main(["dumpcli", "-O", str(outdir), path])
