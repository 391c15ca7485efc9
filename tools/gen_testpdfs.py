#!/usr/bin/env python3
"""Synthetic PDF generator for differential testing.

Builds small single/multi-page PDFs exercising constructs the sample corpus
doesn't isolate: rotations, text-state ops (Tz/Ts/Tc/Tw/TL/T*/'/"),
multiple content streams split mid-token, nested form XObjects,
/Differences encodings, hex strings/octal escapes, filtered content streams
(Flate/A85/AHx/RLE), inline images with 'EI'-looking bytes, and PDF-1.5
xref-stream + ObjStm documents. Each construct is valid per PDF 1.7.
"""
from __future__ import annotations

import zlib


def _classic_pdf(objects: dict[int, bytes], root: int = 1) -> bytes:
    """Assemble a classic-xref PDF from {objid: body}."""
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for objid in sorted(objects):
        offsets[objid] = len(out)
        out += b"%d 0 obj\n" % objid
        out += objects[objid]
        out += b"\nendobj\n"
    xref_pos = len(out)
    n = max(objects) + 1
    out += b"xref\n0 %d\n" % n
    out += b"0000000000 65535 f \n"
    for objid in range(1, n):
        if objid in offsets:
            out += b"%010d 00000 n \n" % offsets[objid]
        else:
            out += b"0000000000 65535 f \n"
    out += b"trailer\n<< /Size %d /Root %d 0 R >>\n" % (n, root)
    out += b"startxref\n%d\n%%%%EOF\n" % xref_pos
    return bytes(out)


def _stream_obj(attrs: bytes, data: bytes) -> bytes:
    return b"<< %s /Length %d >>\nstream\n%s\nendstream" % (attrs, len(data), data)


FONT = (b"<< /Type /Font /Subtype /Type1 /Name /F1 /BaseFont /Helvetica "
        b"/Encoding /WinAnsiEncoding >>")


def basic(content: bytes, rotate: int = 0, mediabox=b"[0 0 612 792]",
          extra_page_attrs: bytes = b"", extra_objects=None,
          contents_ref: bytes = b"5 0 R", font: bytes = FONT) -> bytes:
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /MediaBox %s /Rotate %d "
            b"/Resources << /Font << /F1 4 0 R >> >> /Contents %s %s>>"
            % (mediabox, rotate, contents_ref, extra_page_attrs)),
        4: font,
        5: _stream_obj(b"", content),
    }
    if extra_objects:
        objs.update(extra_objects)
    return _classic_pdf(objs)


def corpus() -> dict[str, bytes]:
    pdfs: dict[str, bytes] = {}
    base = b"BT /F1 12 Tf 72 720 Td (Hello differential world) Tj ET"
    pdfs["plain"] = basic(base)
    for rot in (90, 180, 270):
        pdfs["rot%d" % rot] = basic(base, rotate=rot)
    pdfs["textstate"] = basic(
        b"BT /F1 10 Tf 2 Tc 4 Tw 80 Tz 3 Ts 14 TL 72 700 Td "
        b"(spaced out text) Tj T* (next line via T*) Tj "
        b"(quoted line) ' 1.5 2.5 (dquoted line) \" ET")
    pdfs["kerning"] = basic(
        b"BT /F1 12 Tf 72 700 Td [ (A) -120 (W) 240 (kern) -2000 (gap) ] TJ ET")
    pdfs["matrix"] = basic(
        b"BT /F1 12 Tf 0.9659 0.2588 -0.2588 0.9659 100 600 Tm "
        b"(rotated baseline) Tj ET "
        b"q 2 0 0 2 50 50 cm BT /F1 6 Tf 0 0 Td (scaled via cm) Tj ET Q")
    pdfs["escapes"] = basic(
        b"BT /F1 12 Tf 72 700 Td (octal \\101\\102\\103 paren \\( \\) "
        b"back\\\\slash) Tj 0 -20 Td <48656C6C6F20686578> Tj ET")
    pdfs["diffenc"] = basic(
        b"BT /F1 12 Tf 72 700 Td (ab\xe4\xf6) Tj ET",
        font=(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
              b"/Encoding << /Type /Encoding /BaseEncoding /WinAnsiEncoding "
              b"/Differences [ 228 /alpha 246 /beta ] >> >>"))
    # multiple content streams with a token split across the boundary
    part1 = b"BT /F1 12 Tf 72 700 Td (first stream) Tj 0 -20 Td (spl"
    part2 = b"it token) Tj ET"
    pdfs["splitstreams"] = basic(
        b"", contents_ref=b"[5 0 R 6 0 R]",
        extra_objects={5: _stream_obj(b"", part1),
                       6: _stream_obj(b"", part2)})
    # filters
    raw = b"BT /F1 12 Tf 72 700 Td (filtered content stream) Tj ET"
    pdfs["flate"] = basic(b"", extra_objects={
        5: _stream_obj(b"/Filter /FlateDecode", zlib.compress(raw))})
    import base64

    a85 = base64.a85encode(raw) + b"~>"
    pdfs["a85"] = basic(b"", extra_objects={
        5: _stream_obj(b"/Filter /ASCII85Decode", a85)})
    pdfs["ahx"] = basic(b"", extra_objects={
        5: _stream_obj(b"/Filter /ASCIIHexDecode", raw.hex().encode() + b">")})

    def rle_encode(data: bytes) -> bytes:
        out = bytearray()
        i = 0
        while i < len(data):
            chunk = data[i : i + 127]
            out += bytes([len(chunk) - 1]) + chunk
            i += len(chunk)
        out.append(128)
        return bytes(out)

    pdfs["rle"] = basic(b"", extra_objects={
        5: _stream_obj(b"/Filter /RunLengthDecode", rle_encode(raw))})
    # nested form xobject
    inner = b"BT /F1 8 Tf 0 0 Td (inside form) Tj ET"
    pdfs["formxobj"] = basic(
        b"BT /F1 12 Tf 72 700 Td (outside) Tj ET q 1 0 0 1 100 500 cm /X1 Do Q",
        extra_page_attrs=b"",
        extra_objects={
            5: _stream_obj(
                b"", b"BT /F1 12 Tf 72 700 Td (outside) Tj ET "
                     b"q 1 0 0 1 100 500 cm /X1 Do Q"),
            6: _stream_obj(
                b"/Type /XObject /Subtype /Form /BBox [0 0 200 100] "
                b"/Resources << /Font << /F1 4 0 R >> >>", inner),
        })
    # patch resources to expose the xobject
    pdfs["formxobj"] = _classic_pdf({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 4 0 R >> "
            b"/XObject << /X1 6 0 R >> >> /Contents 5 0 R >>"),
        4: FONT,
        5: _stream_obj(b"", b"BT /F1 12 Tf 72 700 Td (outside) Tj ET "
                            b"q 1 0 0 1 100 500 cm /X1 Do Q"),
        6: _stream_obj(b"/Type /XObject /Subtype /Form /BBox [0 0 200 100] "
                       b"/Resources << /Font << /F1 4 0 R >> >>", inner),
    })
    # inline image whose data contains an EI-lookalike
    img = bytes(range(32)) + b" EIX" + bytes(range(32))
    pdfs["inlineimg"] = basic(
        b"BT /F1 12 Tf 72 700 Td (before image) Tj ET "
        b"q 10 0 0 10 100 100 cm BI /W 8 /H 8 /BPC 8 /CS /G ID "
        + img + b" EI Q BT /F1 12 Tf 72 650 Td (after image) Tj ET")
    # multipage with inherited resources
    pdfs["multipage"] = _classic_pdf({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: (b"<< /Type /Pages /Kids [3 0 R 6 0 R] /Count 2 "
            b"/MediaBox [0 0 400 400] "
            b"/Resources << /Font << /F1 4 0 R >> >> >>"),
        3: b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>",
        4: FONT,
        5: _stream_obj(b"", b"BT /F1 12 Tf 50 350 Td (page one) Tj ET"),
        6: b"<< /Type /Page /Parent 2 0 R /Contents 7 0 R /Rotate 90 >>",
        7: _stream_obj(b"", b"BT /F1 12 Tf 50 350 Td (page two rotated) Tj ET"),
    })
    # PDF-1.5: objects packed in an ObjStm, xref as a stream
    pdfs["objstm"] = _objstm_pdf()
    return pdfs


def _objstm_pdf() -> bytes:
    # objects 1..4 live inside object stream 5; content stream is 6
    inner_objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 4 0 R >> >> /Contents 6 0 R >>"),
        (4, FONT),
    ]
    bodies = b""
    index = b""
    for (objid, body) in inner_objs:
        index += b"%d %d " % (objid, len(bodies))
        bodies += body + b" "
    objstm_payload = index + bodies
    first = len(index)
    objstm_raw = zlib.compress(objstm_payload)
    content = b"BT /F1 12 Tf 72 700 Td (objstm document) Tj ET"

    out = bytearray(b"%PDF-1.5\n")
    offsets = {}
    offsets[5] = len(out)
    out += b"5 0 obj\n" + _stream_obj(
        b"/Type /ObjStm /N %d /First %d /Filter /FlateDecode"
        % (len(inner_objs), first), objstm_raw) + b"\nendobj\n"
    offsets[6] = len(out)
    out += b"6 0 obj\n" + _stream_obj(b"", content) + b"\nendobj\n"
    xref_pos = len(out)
    # xref stream object 7: W [1 4 2]; entries for objects 0..7
    entries = bytearray()

    def ent(t, f2, f3):
        entries.append(t)
        entries.extend(f2.to_bytes(4, "big"))
        entries.extend(f3.to_bytes(2, "big"))

    ent(0, 0, 0xFFFF)           # obj 0: free
    for objid in (1, 2, 3, 4):  # in objstm 5
        ent(2, 5, [o for (o, _) in inner_objs].index(objid))
    ent(1, offsets[5], 0)       # obj 5
    ent(1, offsets[6], 0)       # obj 6
    ent(1, xref_pos, 0)         # obj 7 (this xref stream)
    xref_raw = zlib.compress(bytes(entries))
    out += b"7 0 obj\n" + _stream_obj(
        b"/Type /XRef /Size 8 /W [1 4 2] /Root 1 0 R /Filter /FlateDecode",
        xref_raw) + b"\nendobj\n"
    out += b"startxref\n%d\n%%%%EOF\n" % xref_pos
    return bytes(out)


if __name__ == "__main__":
    import os
    import sys

    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testpdfs"
    os.makedirs(outdir, exist_ok=True)
    for (name, data) in corpus().items():
        with open(os.path.join(outdir, name + ".pdf"), "wb") as fp:
            fp.write(data)
        print(name, len(data))
