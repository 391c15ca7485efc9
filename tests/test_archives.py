"""ZIP reader + DOCX extraction (ops/archives.py): the from-scratch
reader vs stdlib zipfile as the independent writer, hostile framing
cases, and the OOXML text chain."""
import io
import struct
import zipfile

import pytest

from pdfminer_spark.ops.archives import (ZipError, _build_docx,
                                         extract_docx_text, parse_zip)


def _zip_bytes(members, methods=None, comment=b""):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for (i, (name, data)) in enumerate(members):
            method = (methods or {}).get(
                name, zipfile.ZIP_DEFLATED if i % 2 else zipfile.ZIP_STORED)
            z.writestr(zipfile.ZipInfo(name, (2026, 1, 1, 0, 0, 0)),
                       data, method)
        if comment:
            z.comment = comment
    return buf.getvalue()


def test_zip_roundtrip_both_methods_and_comment():
    members = [("a.txt", b"alpha " * 200), ("dir/b.bin", bytes(range(256))),
               ("empty", b"")]
    z = _zip_bytes(members, comment=b"x" * 500)
    got = parse_zip(z)
    assert [(m["name"], m["content"]) for m in got] == members
    assert {m["method"] for m in got} <= {0, 8}


def test_zip_hostile_cases():
    z = _zip_bytes([("a", b"payload data here")])
    # flipped byte in the member data fails CRC, never silent
    pos = z.index(b"payload")
    bad = z[:pos] + b"X" + z[pos + 1:]
    with pytest.raises(ZipError, match="CRC"):
        parse_zip(bad)
    # truncation loses the EOCD
    with pytest.raises(ZipError, match="end-of-central|truncated"):
        parse_zip(z[:len(z) - 8])
    # local-header signature corruption detected
    lho = z.index(b"PK\x03\x04")
    with pytest.raises(ZipError, match="local-header"):
        parse_zip(z[:lho] + b"PK\x09\x09" + z[lho + 4:])
    # member-size cap
    big = _zip_bytes([("big", b"\x00" * 4096)])
    with pytest.raises(ZipError, match="cap"):
        parse_zip(big, max_member=1024)
    # not a zip at all
    with pytest.raises(ZipError):
        parse_zip(b"PK\x05\x06" + b"\x00" * 4)


def test_docx_extract_round_trips_text():
    text = "alpha beta gamma delta epsilon zeta"
    (n, out) = extract_docx_text(_build_docx(4, text))
    a = len(text) // 2
    assert n == 2
    assert out == text[:a] + "\n" + text[a:]
    # stored variant (odd doc_id) identical
    assert extract_docx_text(_build_docx(5, text))[1] == out
    # a zip without word/document.xml is not a DOCX
    with pytest.raises(ZipError, match="not a DOCX"):
        extract_docx_text(_zip_bytes([("other.xml", b"<a/>")]))


def test_zip_mutation_fuzz_never_escapes():
    import time as _t

    import numpy as np

    base = _build_docx(7, "some words " * 40)
    rng = np.random.default_rng(91)
    t0 = _t.time()
    for _ in range(300):
        buf = bytearray(base)
        for _ in range(rng.integers(1, 8)):
            buf[rng.integers(0, len(buf))] = rng.integers(0, 256)
        try:
            extract_docx_text(bytes(buf))
        except (ZipError, ValueError):
            pass
    assert _t.time() - t0 < 20.0
