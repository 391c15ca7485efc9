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


def _ref_bmp_1bit(width: int, height: int, data: bytes) -> bytes:
    """Byte-exact replica of the reference BMPWriter output for 1-bit
    images (image.py:18-57,98-104): 2-color palette, resolution fields
    zero, rows written bottom-up via seek — which leaves the trailing
    row-alignment pad of the TOP source row unwritten, so the file is
    shorter than its header claims whenever linesize > (width+7)//8
    (a reference quirk, reproduced for parity)."""
    linesize = ((width + 31) // 32) * 4
    datasize = linesize * height
    headersize = 14 + 40 + 2 * 4
    buf = bytearray(headersize + datasize)
    struct.pack_into("<ccIHHI", buf, 0, b"B", b"M", headersize + datasize,
                     0, 0, headersize)
    struct.pack_into("<IiiHHIIIIII", buf, 14, 40, width, height, 1, 1, 0,
                     datasize, 0, 0, 2, 0)
    buf[54:62] = b"\x00\x00\x00\x00\xff\xff\xff\x00"
    srcrow = (width + 7) // 8
    end = headersize
    i = 0
    for y in range(height):
        row = data[i : i + srcrow]
        i += srcrow
        off = headersize + datasize - (y + 1) * linesize
        buf[off : off + len(row)] = row
        end = max(end, off + len(row))
    return bytes(buf[:end])


def export_image_cli(name: str, stream: Stream) -> tuple[str, bytes]:
    """One rendered image -> (filename, payload) with the reference
    ImageWriter's live semantics (image.py:62-121) under the minimal
    Python-3 fix (its ``len(get_filters())`` crashes on a zip).

    Reference quirks reproduced deliberately: LTImage.colorspace is always
    a *list*, so the ``colorspace in (RGB, GRAY)`` / ``is RGB`` branches
    are dead — only single-DCTDecode JPEG passthrough and 1-bit BMP are
    live; every other image lands in ``name.<bits>.<W>x<H>.img`` with raw
    decoded bytes. The CMYK-JPEG path needs PIL; without it the raw JPEG
    bytes are written as-is (documented divergence, PIL not vendored)."""
    filters = resolve1(stream.get_any(("F", "Filter")))
    if not isinstance(filters, list):
        filters = [filters] if filters is not None else []
    width = int(resolve1(stream.get_any(("W", "Width"), 0)) or 0)
    height = int(resolve1(stream.get_any(("H", "Height"), 0)) or 0)
    bits = int(resolve1(stream.get_any(("BPC", "BitsPerComponent"), 1)) or 1)
    cs = stream.get_any(("CS", "ColorSpace"))
    cs_list = cs if isinstance(cs, list) else [cs]
    if len(filters) == 1 and literal_name(resolve1(filters[0])) in ("DCTDecode",
                                                                    "DCT"):
        payload = stream.rawdata or b""
        # reference: LITERAL_DEVICE_CMYK in colorspace — unresolved list
        # membership, so only a direct /DeviceCMYK name entry matches
        if any(isinstance(v, str) and v == "DeviceCMYK" for v in cs_list):
            try:
                from io import BytesIO

                from PIL import Image, ImageChops

                img = ImageChops.invert(Image.open(BytesIO(payload)))
                out = BytesIO()
                img.convert("RGB").save(out, "JPEG")
                payload = out.getvalue()
            except ImportError:
                pass
        return (name + ".jpg", payload)
    if bits == 1:
        return ("%s.%dx%d.bmp" % (name, width, height),
                _ref_bmp_1bit(width, height, stream.get_data()))
    return ("%s.%d.%dx%d.img" % (name, bits, width, height),
            stream.get_data())


def write_layout_images(pages, outdir: str) -> list[str]:
    """Walk analyzed Page trees and export every rendered image to
    ``outdir`` (the pdf2txt ``-O`` sink, reference converter.py:177-179:
    exported during receive_layout in layout-tree order, same-name
    collisions overwrite). Returns the filenames written."""
    import os

    from .layout import Container, ImageItem

    os.makedirs(outdir, exist_ok=True)
    written: list[str] = []

    def walk(item):
        if isinstance(item, Container):
            for child in item.objs:
                walk(child)
        elif isinstance(item, ImageItem) and item.stream is not None:
            (fname, payload) = export_image_cli(item.name, item.stream)
            with open(os.path.join(outdir, fname), "wb") as fp:
                fp.write(payload)
            written.append(fname)

    for page in pages:
        walk(page)
    return written


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
