"""Embedded-image export: image XObject payloads -> (name, ext, bytes).

DF-friendly rebuild of the reference's ImageWriter (image.py:18-121): instead
of side-effecting file writes, images are returned as in-memory cells so the
Spark layer can emit them as a binary column. JPEG (DCTDecode) payloads pass
through untouched; raw bitmaps are wrapped as BMP (1/8/24-bit); anything
else ships as raw ``.img`` bytes with its metadata.
"""
from __future__ import annotations

import struct

from .document import PdfDocument
from .objects import Stream, dict_value, list_value, literal_name, resolve1

_JPEG_FILTERS = {"DCTDecode", "DCT", "JPXDecode"}


def _bmp(width: int, height: int, bits: int, data: bytes,
         gray_palette: bool) -> bytes:
    """Minimal BMP container around top-down rows (padded to 4 bytes)."""
    ncols = 0
    if bits == 1:
        ncols = 2
    elif bits == 8 and gray_palette:
        ncols = 256
    headersize = 54 + ncols * 4
    rowbytes = ((width * bits + 31) // 32) * 4
    srcrow = (width * bits + 7) // 8
    # re-pad rows and flip to bottom-up
    rows = []
    for y in range(height):
        row = data[y * srcrow : (y + 1) * srcrow]
        rows.append(row + b"\x00" * (rowbytes - len(row)))
    body = b"".join(reversed(rows))
    info = struct.pack("<IiiHHIIIIII", 40, width, height, 1, bits, 0,
                       len(body), 2835, 2835, ncols, 0)
    header = struct.pack("<2sIHHI", b"BM", headersize + len(body), 0, 0,
                         headersize)
    palette = b""
    if bits == 1:
        palette = b"\x00\x00\x00\x00\xff\xff\xff\x00"
    elif ncols == 256:
        palette = b"".join(bytes((i, i, i, 0)) for i in range(256))
    return header + info + palette + body


def export_image(stream: Stream) -> tuple[str, bytes]:
    """One image XObject -> (file extension, payload bytes)."""
    filters = resolve1(stream.get_any(("F", "Filter")))
    if not isinstance(filters, list):
        filters = [filters] if filters is not None else []
    names = {literal_name(resolve1(f)) for f in filters}
    width = int(resolve1(stream.get_any(("W", "Width"), 0)) or 0)
    height = int(resolve1(stream.get_any(("H", "Height"), 0)) or 0)
    bits = int(resolve1(stream.get_any(("BPC", "BitsPerComponent"), 1)) or 1)
    if names & _JPEG_FILTERS:
        ext = ".jp2" if "JPXDecode" in names else ".jpg"
        return (ext, stream.get_data())  # codec payload passes through
    data = stream.get_data()
    cs = resolve1(stream.get_any(("CS", "ColorSpace")))
    cs_name = literal_name(resolve1(cs[0]) if isinstance(cs, list) and cs
                           else cs) if cs is not None else ""
    if bits == 1:
        return (".bmp", _bmp(width, height, 1, data, False))
    if bits == 8 and cs_name in ("DeviceGray", "CalGray", "G"):
        return (".bmp", _bmp(width, height, 8, data, True))
    if bits == 8 and cs_name in ("DeviceRGB", "CalRGB", "RGB"):
        # RGB -> BGR for BMP
        bgr = bytearray(data[: width * height * 3])
        bgr[0::3], bgr[2::3] = data[2 : width * height * 3 : 3], \
            data[0 : width * height * 3 : 3]
        return (".bmp", _bmp(width, height, 24, bytes(bgr), False))
    return (".img", data)


def extract_images(data: bytes, password: bytes = b"") -> list[dict]:
    """All image XObjects of a document -> rows of
    (objid, width, height, bits, ext, payload)."""
    doc = PdfDocument(data, password=password)
    out = []
    seen = set()
    for xref in doc.xrefs:
        for objid in xref.get_objids():
            if objid in seen:
                continue
            seen.add(objid)
            try:
                obj = doc.getobj(objid)
            except Exception:
                continue
            if not isinstance(obj, Stream):
                continue
            subtype = resolve1(obj.get("Subtype"))
            if literal_name(subtype) != "Image":
                continue
            try:
                (ext, payload) = export_image(obj)
            except Exception:
                continue
            out.append({
                "objid": objid,
                "width": int(resolve1(obj.get_any(("W", "Width"), 0)) or 0),
                "height": int(resolve1(obj.get_any(("H", "Height"), 0)) or 0),
                "bits": int(resolve1(obj.get_any(("BPC", "BitsPerComponent"),
                                                 1)) or 1),
                "ext": ext,
                "payload": payload,
            })
    return out
