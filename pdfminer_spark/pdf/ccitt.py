"""CCITT Group 4 (ITU-T T.6) fax decoder for CCITTFaxDecode streams.

Implemented from the public T.4/T.6 specification: 2D coding modes
(pass / horizontal / vertical ±3) against the previous line's changing
elements, with the T.4 terminating + make-up run-length code tables for
horizontal mode. Reference analog: /root/reference/pdfminer/ccitt.py:62-709
(the reference drives a bit-tree state-machine class; this is a
table-driven longest-prefix loop over an unpacked bit array with numpy
row packing — structurally unrelated, same spec).

Scope: K < 0 (pure G4), the PDF-relevant parameters Columns, Rows,
BlackIs1, EncodedByteAlign — the subset the reference supports. Output
is packed 1-bit rows (MSB first, each row padded to a byte boundary);
with the PDF default BlackIs1=false, black pixels decode to 0 bits.
"""
from __future__ import annotations

import numpy as np

from .filters import FilterError


class CCITTError(FilterError):
    pass


# -- T.6 mode codes (vertical offsets are ints; 'p'=pass, 'h'=horizontal,
# 'eofb' ends the data) -----------------------------------------------------

MODE_CODES: dict[str, object] = {
    "1": 0,
    "011": +1,
    "010": -1,
    "001": "h",
    "0001": "p",
    "000011": +2,
    "000010": -2,
    "0000011": +3,
    "0000010": -3,
    "000000000001000000000001": "eofb",
}

# -- T.4 run-length codes ----------------------------------------------------

WHITE_CODES: dict[str, int] = {
    # terminating (0-63)
    "00110101": 0, "000111": 1, "0111": 2, "1000": 3, "1011": 4, "1100": 5,
    "1110": 6, "1111": 7, "10011": 8, "10100": 9, "00111": 10, "01000": 11,
    "001000": 12, "000011": 13, "110100": 14, "110101": 15, "101010": 16,
    "101011": 17, "0100111": 18, "0001100": 19, "0001000": 20, "0010111": 21,
    "0000011": 22, "0000100": 23, "0101000": 24, "0101011": 25, "0010011": 26,
    "0100100": 27, "0011000": 28, "00000010": 29, "00000011": 30,
    "00011010": 31, "00011011": 32, "00010010": 33, "00010011": 34,
    "00010100": 35, "00010101": 36, "00010110": 37, "00010111": 38,
    "00101000": 39, "00101001": 40, "00101010": 41, "00101011": 42,
    "00101100": 43, "00101101": 44, "00000100": 45, "00000101": 46,
    "00001010": 47, "00001011": 48, "01010010": 49, "01010011": 50,
    "01010100": 51, "01010101": 52, "00100100": 53, "00100101": 54,
    "01011000": 55, "01011001": 56, "01011010": 57, "01011011": 58,
    "01001010": 59, "01001011": 60, "00110010": 61, "00110011": 62,
    "00110100": 63,
    # make-up (64-1728)
    "11011": 64, "10010": 128, "010111": 192, "0110111": 256,
    "00110110": 320, "00110111": 384, "01100100": 448, "01100101": 512,
    "01101000": 576, "01100111": 640, "011001100": 704, "011001101": 768,
    "011010010": 832, "011010011": 896, "011010100": 960, "011010101": 1024,
    "011010110": 1088, "011010111": 1152, "011011000": 1216,
    "011011001": 1280, "011011010": 1344, "011011011": 1408,
    "010011000": 1472, "010011001": 1536, "010011010": 1600, "011000": 1664,
    "010011011": 1728,
}

BLACK_CODES: dict[str, int] = {
    # terminating (0-63)
    "0000110111": 0, "010": 1, "11": 2, "10": 3, "011": 4, "0011": 5,
    "0010": 6, "00011": 7, "000101": 8, "000100": 9, "0000100": 10,
    "0000101": 11, "0000111": 12, "00000100": 13, "00000111": 14,
    "000011000": 15, "0000010111": 16, "0000011000": 17, "0000001000": 18,
    "00001100111": 19, "00001101000": 20, "00001101100": 21,
    "00000110111": 22, "00000101000": 23, "00000010111": 24,
    "00000011000": 25, "000011001010": 26, "000011001011": 27,
    "000011001100": 28, "000011001101": 29, "000001101000": 30,
    "000001101001": 31, "000001101010": 32, "000001101011": 33,
    "000011010010": 34, "000011010011": 35, "000011010100": 36,
    "000011010101": 37, "000011010110": 38, "000011010111": 39,
    "000001101100": 40, "000001101101": 41, "000011011010": 42,
    "000011011011": 43, "000001010100": 44, "000001010101": 45,
    "000001010110": 46, "000001010111": 47, "000001100100": 48,
    "000001100101": 49, "000001010010": 50, "000001010011": 51,
    "000000100100": 52, "000000110111": 53, "000000111000": 54,
    "000000100111": 55, "000000101000": 56, "000001011000": 57,
    "000001011001": 58, "000000101011": 59, "000000101100": 60,
    "000001011010": 61, "000001100110": 62, "000001100111": 63,
    # make-up (64-1728)
    "0000001111": 64, "000011001000": 128, "000011001001": 192,
    "000001011011": 256, "000000110011": 320, "000000110100": 384,
    "000000110101": 448, "0000001101100": 512, "0000001101101": 576,
    "0000001001010": 640, "0000001001011": 704, "0000001001100": 768,
    "0000001001101": 832, "0000001110010": 896, "0000001110011": 960,
    "0000001110100": 1024, "0000001110101": 1088, "0000001110110": 1152,
    "0000001110111": 1216, "0000001010010": 1280, "0000001010011": 1344,
    "0000001010100": 1408, "0000001010101": 1472, "0000001011010": 1536,
    "0000001011011": 1600, "0000001100100": 1664, "0000001100101": 1728,
}

# extended make-up (shared by both colors, 1792-2560)
_EXT_MAKEUP: dict[str, int] = {
    "00000001000": 1792, "00000001100": 1856, "00000001101": 1920,
    "000000010010": 1984, "000000010011": 2048, "000000010100": 2112,
    "000000010101": 2176, "000000010110": 2240, "000000010111": 2304,
    "000000011100": 2368, "000000011101": 2432, "000000011110": 2496,
    "000000011111": 2560,
}
WHITE_CODES.update(_EXT_MAKEUP)
BLACK_CODES.update(_EXT_MAKEUP)


def _by_length(codes: dict[str, object]) -> dict[int, dict[str, object]]:
    out: dict[int, dict[str, object]] = {}
    for (bits, v) in codes.items():
        out.setdefault(len(bits), {})[bits] = v
    return out


_MODE_BY_LEN = _by_length(MODE_CODES)
_WHITE_BY_LEN = _by_length(WHITE_CODES)
_BLACK_BY_LEN = _by_length(BLACK_CODES)


class _Bits:
    """Cursor over an unpacked bit array with longest-prefix code reads."""

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def eof(self) -> bool:
        return self.pos >= len(self.bits)

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def read_code(self, by_len: dict[int, dict[str, object]], what: str):
        bits = self.bits
        end = min(len(bits), self.pos + max(by_len))
        acc = ""
        for i in range(self.pos, end):
            acc += "1" if bits[i] else "0"
            table = by_len.get(len(acc))
            if table is not None and acc in table:
                self.pos = i + 1
                return table[acc]
        raise CCITTError("bad %s code at bit %d: %r" % (what, self.pos, acc))


def _read_run(br: _Bits, by_len) -> int:
    """Total run length: make-up codes (>=64) chain until a terminating
    code (<64) closes the run."""
    total = 0
    while True:
        v = br.read_code(by_len, "run")
        total += v
        if v < 64:
            return total


def ccittg4_decode(data: bytes, columns: int, rows: int | None = None,
                   black_is_1: bool = False,
                   byte_align: bool = False) -> bytes:
    """Decode a pure-G4 (K < 0) stream to packed 1-bit rows."""
    br = _Bits(data)
    out_rows: list[np.ndarray] = []
    ref: list[int] = []  # previous line's changing elements
    # with no /Rows bound, an all-zero tail is byte-boundary fill after
    # a stream that ended without EOFB — a clean end, not a malformed
    # code (no valid mode/EOFB sequence is all zeros): decode it as
    # done instead of raising (ADVICE r2). Computed once, and only on
    # the unbounded path — a per-row .any() rescan would make decode
    # O(rows x bits), and bounded decodes never consult it.
    last_set = -1
    if rows is None:
        set_bits = np.flatnonzero(br.bits)
        last_set = int(set_bits[-1]) if set_bits.size else -1
    while rows is None or len(out_rows) < rows:
        if byte_align:
            br.align()
        if br.eof() or (rows is None and len(br.bits) - br.pos < 2):
            break
        if rows is None and br.pos > last_set:
            break
        cur: list[int] = []
        a0 = -1
        color = 0  # 0 = white, 1 = black
        eofb = False
        while a0 < columns:
            # b1: first ref transition > a0 that flips to the opposite of
            # the current color. Transitions alternate starting with
            # white->black, so a transition at even index turns black.
            b1 = columns
            b2 = columns
            for (k, t) in enumerate(ref):
                if t > a0 and (k % 2) == color:
                    b1 = t
                    b2 = ref[k + 1] if k + 1 < len(ref) else columns
                    break
            mode = br.read_code(_MODE_BY_LEN, "mode")
            if mode == "eofb":
                eofb = True
                break
            if mode == "p":
                a0 = b2
            elif mode == "h":
                start = max(a0, 0)
                run1 = _read_run(br, _BLACK_BY_LEN if color else _WHITE_BY_LEN)
                run2 = _read_run(br, _WHITE_BY_LEN if color else _BLACK_BY_LEN)
                t1 = min(start + run1, columns)
                t2 = min(t1 + run2, columns)
                cur.extend((t1, t2))
                a0 = t2
            else:  # vertical mode, offset in -3..3
                a1 = min(max(b1 + int(mode), 0), columns)
                cur.append(a1)
                a0 = a1
                color ^= 1
        if eofb and not cur:
            break
        # materialize the row from its changing elements
        row = np.zeros(columns, dtype=np.uint8)
        for (k, t) in enumerate(cur):
            nxt = cur[k + 1] if k + 1 < len(cur) else columns
            if k % 2 == 0:  # transition to black
                row[t:nxt] = 1
        out_rows.append(row)
        ref = [t for t in cur if t < columns]
        if eofb:
            break
    if rows is not None and len(out_rows) < rows:
        raise CCITTError("truncated G4 data: %d of %d rows" %
                         (len(out_rows), rows))
    if not out_rows:
        return b""
    img = np.stack(out_rows)
    if not black_is_1:
        img = 1 - img  # PDF default: black pixels are 0 bits
    # pack each row independently (rows pad to byte boundaries)
    return b"".join(np.packbits(r).tobytes() for r in img)


def ccittfax_decode(data: bytes, params: dict) -> bytes:
    """CCITTFaxDecode entry point (decode-parm dict as in the PDF)."""
    k = int(params.get("K", 0))
    if k >= 0:
        raise CCITTError("only G4 (K < 0) CCITT streams are supported")
    return ccittg4_decode(
        data,
        columns=int(params.get("Columns", 1728)),
        rows=int(params["Rows"]) if params.get("Rows") else None,
        black_is_1=bool(params.get("BlackIs1", False)),
        byte_align=bool(params.get("EncodedByteAlign", False)),
    )
