"""PDF stream filters: Flate, LZW, ASCII85/Hex, RunLength, PNG predictors.

Scalar decode functions applied inside the extraction UDF (SURVEY.md §2.7).
Flate rides on zlib (C speed); the PNG predictor un-apply is vectorized with
numpy per predictor type; the rest are rare, small-payload pure-Python
decoders. Semantics match the reference's public-domain decoders
(/root/reference/pdfminer/{ascii85,lzw,runlength}.py, utils.py:11-49)
and are pinned by the reference's published doctest vectors in
tests/test_filters.py.
"""
from __future__ import annotations

import re
import struct
import zlib

import numpy as np

from .objects import int_value, resolve1


class FilterError(Exception):
    pass


def flatedecode(data: bytes) -> bytes:
    try:
        return zlib.decompress(data)
    except zlib.error:
        # tolerate garbage (encrypted/corrupt): emit nothing
        try:
            d = zlib.decompressobj()
            return d.decompress(data)
        except zlib.error:
            return b""


def ascii85decode(data: bytes) -> bytes:
    """Adobe ASCII85: ignore non-alphabet bytes, 'z' = 4 zero bytes,
    '~' terminates with short-group round-up."""
    out = bytearray()
    n = b = 0
    for c in data:
        if 33 <= c <= 117:
            n += 1
            b = b * 85 + (c - 33)
            if n == 5:
                out += struct.pack(">L", b)
                n = b = 0
        elif c == 0x7A:  # 'z'
            out += b"\x00\x00\x00\x00"
        elif c == 0x7E:  # '~'
            if n:
                for _ in range(5 - n):
                    b = b * 85 + 84
                out += struct.pack(">L", b)[: n - 1]
            break
    return bytes(out)


_HEXPAIR = re.compile(r"([a-f\d]{2})", re.IGNORECASE)
_HEXTRAIL = re.compile(r"^(?:[a-f\d]{2}|\s)*([a-f\d])[\s>]*$", re.IGNORECASE)


def asciihexdecode(data: bytes) -> bytes:
    text = data.decode("latin1")
    out = [int(hx, 16) for hx in _HEXPAIR.findall(text)]
    m = _HEXTRAIL.search(text)
    if m:
        out.append(int(m.group(1), 16) << 4)
    return bytes(out)


def rldecode(data: bytes) -> bytes:
    """Adobe RunLength (PDF 1.4 §3.3.4)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        length = data[i]
        if length == 128:
            break
        if length < 128:
            out += data[i + 1 : i + 2 + length]
            i += 2 + length
        else:
            out += data[i + 1 : i + 2] * (257 - length)
            i += 2
    return bytes(out)


def lzwdecode(data: bytes) -> bytes:
    """PDF LZW variant: 9..12-bit codes, 256=clear, 257=EOD.

    Bit extraction is done in one vectorized pass (numpy) over the whole
    payload; table building is the inherently sequential part.
    """
    if not data:
        return b""
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
    nbits_total = len(bits)
    out = []
    table: list[bytes] = []
    prev: bytes | None = None
    nbits = 9
    pos = 0

    def reset_table():
        nonlocal table, prev, nbits
        table = [bytes([c]) for c in range(256)] + [b"", b""]
        prev = None
        nbits = 9

    reset_table()
    powers = {n: (1 << np.arange(n - 1, -1, -1, dtype=np.int64)) for n in (9, 10, 11, 12)}
    while pos + nbits <= nbits_total:
        code = int(bits[pos : pos + nbits].astype(np.int64) @ powers[nbits])
        pos += nbits
        if code == 256:
            reset_table()
            continue
        if code == 257:
            break
        if prev is None:
            if code >= len(table):
                break
            x = table[code]
            out.append(x)
            prev = x
            continue
        if code < len(table):
            x = table[code]
            table.append(prev + x[:1])
        elif code == len(table):
            x = prev + prev[:1]
            table.append(x)
        else:
            break
        out.append(x)
        prev = x
        size = len(table)
        if size == 511:
            nbits = 10
        elif size == 1023:
            nbits = 11
        elif size == 2047:
            nbits = 12
    return b"".join(out)


def apply_png_predictor(pred: int, colors: int, columns: int,
                        bitspercomponent: int, data: bytes) -> bytes:
    """Un-apply PNG row predictors (used by xref streams).

    Vectorized: rows land in a (nrows, rowlen) uint8 matrix; Up is one
    cumulative-sum pass; Sub/Average/Paeth fall back to tight loops only
    for the affected rows (rare in practice — xref streams use Up).
    """
    if bitspercomponent != 8:
        raise FilterError("unsupported BitsPerComponent: %d" % bitspercomponent)
    rowlen = colors * columns
    stride = rowlen + 1
    nrows = len(data) // stride
    if nrows == 0:
        return b""
    mat = np.frombuffer(data[: nrows * stride], dtype=np.uint8).reshape(nrows, stride)
    ftypes = mat[:, 0]
    rows = mat[:, 1:].astype(np.int64)
    bpp = colors  # bytes per pixel at 8 bits/component
    if np.all(ftypes == 2):  # PNG Up — the common xref-stream case
        out = np.cumsum(rows, axis=0, dtype=np.int64) & 0xFF
        return out.astype(np.uint8).tobytes()
    out = np.zeros_like(rows)
    prior = np.zeros(rowlen, dtype=np.int64)
    for r in range(nrows):
        ft = ftypes[r]
        line = rows[r]
        if ft == 0:
            cur = line & 0xFF
        elif ft == 1:
            cur = line.copy()
            for i in range(bpp, rowlen):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
            cur &= 0xFF
        elif ft == 2:
            cur = (line + prior) & 0xFF
        elif ft == 3:
            cur = line.copy()
            for i in range(rowlen):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + (left + prior[i]) // 2) & 0xFF
        elif ft == 4:
            cur = line.copy()
            for i in range(rowlen):
                a = cur[i - bpp] if i >= bpp else 0
                b = prior[i]
                c = prior[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pr = a
                elif pb <= pc:
                    pr = b
                else:
                    pr = c
                cur[i] = (cur[i] + pr) & 0xFF
        else:
            raise FilterError("unsupported predictor row type: %d" % ft)
        out[r] = cur
        prior = cur
    return out.astype(np.uint8).tobytes()


_FLATE = {"FlateDecode", "Fl"}
_LZW = {"LZWDecode", "LZW"}
_A85 = {"ASCII85Decode", "A85"}
_AHX = {"ASCIIHexDecode", "AHx"}
_RL = {"RunLengthDecode", "RL"}
_CCITT = {"CCITTFaxDecode", "CCF"}
_PASSTHROUGH = {"DCTDecode", "DCT", "JPXDecode", "JBIG2Decode"}


def decode_stream(attrs: dict, data: bytes) -> bytes:
    """Apply the stream's filter chain + predictors to raw payload bytes."""
    filters = resolve1(attrs.get("F") if "F" in attrs else attrs.get("Filter"))
    params = resolve1(
        attrs.get("DP") or attrs.get("DecodeParms") or attrs.get("FDecodeParms") or {}
    )
    if not filters:
        return data
    if not isinstance(filters, list):
        filters = [filters]
    if not isinstance(params, list):
        params = [params] * len(filters)
    for f, p in zip(filters, params):
        name = str(resolve1(f))
        if name in _FLATE:
            data = flatedecode(data)
        elif name in _LZW:
            data = lzwdecode(data)
        elif name in _A85:
            data = ascii85decode(data)
        elif name in _AHX:
            data = asciihexdecode(data)
        elif name in _RL:
            data = rldecode(data)
        elif name in _CCITT:
            from .ccitt import ccittfax_decode

            parms = resolve1(p)
            parms = ({k: resolve1(v) for (k, v) in parms.items()}
                     if isinstance(parms, dict) else {})
            data = ccittfax_decode(data, parms)
        elif name in _PASSTHROUGH:
            pass  # image codecs: payload handed through as-is
        else:
            raise FilterError("unsupported filter: %r" % name)
        p = resolve1(p) if isinstance(p, dict) else {}
        if "Predictor" in (p or {}):
            pred = int_value(p["Predictor"])
            if pred >= 10:
                data = apply_png_predictor(
                    pred,
                    int_value(p.get("Colors")) or 1,
                    int_value(p.get("Columns")) or 1,
                    int_value(p.get("BitsPerComponent")) or 8,
                    data,
                )
            elif pred != 1:
                # TIFF predictor 2 etc.: failing loud keeps the pipeline
                # soft-fail path honest (status=error) instead of letting
                # still-predicted bytes flow downstream as corrupt text
                # (reference raises PDFNotImplementedError the same way)
                raise FilterError("unsupported predictor: %d" % pred)
    return data
