"""CCITT G4 (T.6) decoder tests: hand-derived bit vectors, an
independent test-only encoder for roundtrips (pass/vertical/horizontal
mode selection like a real coder), code-table cross-validation against
the reference's tables, and an end-to-end extract_images gate."""
import os
import re

import numpy as np
import pytest

from pdfminer_spark.pdf.ccitt import (BLACK_CODES, MODE_CODES, WHITE_CODES,
                                      ccittfax_decode, ccittg4_decode)

# ---------------------------------------------------------------------------
# test-only G4 encoder (spec-derived, structurally independent of the decoder)
# ---------------------------------------------------------------------------

_WHITE_INV = {v: k for (k, v) in WHITE_CODES.items()}
_BLACK_INV = {v: k for (k, v) in BLACK_CODES.items()}
_V_INV = {0: "1", 1: "011", -1: "010", 2: "000011", -2: "000010",
          3: "0000011", -3: "0000010"}


def _run_bits(run: int, inv: dict) -> str:
    out = ""
    while run >= 2560 + 64:
        out += inv[2560]
        run -= 2560
    if run >= 64:
        m = (run // 64) * 64
        out += inv[m]
        run -= m
    return out + inv[run]


def _transitions(row: np.ndarray) -> list:
    return np.flatnonzero(np.diff(np.concatenate(([0], row)))).tolist()


def g4_encode(img: np.ndarray, columns: int) -> bytes:
    bits = ""
    ref: list = []
    for row in img:
        cur = _transitions(row)
        a0, color = -1, 0
        while a0 < columns:
            b1 = b2 = columns
            for (k, t) in enumerate(ref):
                if t > a0 and k % 2 == color:
                    b1 = t
                    b2 = ref[k + 1] if k + 1 < len(ref) else columns
                    break
            a1 = next((t for t in cur if t > a0), columns)
            if b2 < a1:
                bits += "0001"
                a0 = b2
            elif abs(a1 - b1) <= 3:
                bits += _V_INV[a1 - b1]
                a0 = a1
                color ^= 1
            else:
                a2 = next((t for t in cur if t > a1), columns)
                bits += "001"
                start = max(a0, 0)
                bits += _run_bits(a1 - start,
                                  _BLACK_INV if color else _WHITE_INV)
                bits += _run_bits(a2 - a1,
                                  _WHITE_INV if color else _BLACK_INV)
                a0 = a2
        ref = cur
    bits += "000000000001" * 2  # EOFB
    bits += "0" * (-len(bits) % 8)
    return np.packbits(
        np.array([b == "1" for b in bits], dtype=np.uint8)).tobytes()


def _unpack(decoded: bytes, columns: int, rows: int) -> np.ndarray:
    per = (columns + 7) // 8
    out = []
    for r in range(rows):
        row_bits = np.unpackbits(
            np.frombuffer(decoded[r * per:(r + 1) * per], dtype=np.uint8))
        out.append(row_bits[:columns])
    return np.stack(out)


# ---------------------------------------------------------------------------


def test_all_white_hand_vector():
    # two all-white 8px lines: one V0 ('1') per line; bits '11' -> 0xC0
    decoded = ccittg4_decode(bytes([0b11000000]), columns=8, rows=2)
    assert decoded == b"\xff\xff"  # BlackIs1 default: white pixels are 1


def test_horizontal_mode_hand_vector():
    # one 8px line: white 2, black 2, white 4
    # H '001' + white2 '0111' + black2 '11'; then V0 '1' to close at b1=8
    # bits: 001 0111 11 1 -> 0b00101111 0b11... wait: '0010111111' padded
    bits = "0010111111"
    bits += "0" * (-len(bits) % 8)
    data = np.packbits(
        np.array([b == "1" for b in bits], dtype=np.uint8)).tobytes()
    decoded = ccittg4_decode(data, columns=8, rows=1)
    # pixels: 1 1 0 0 1 1 1 1 (white=1, black=0)
    assert decoded == bytes([0b11001111])


def test_black_is_1_inverts():
    bits = "0010111111"
    bits += "0" * (-len(bits) % 8)
    data = np.packbits(
        np.array([b == "1" for b in bits], dtype=np.uint8)).tobytes()
    decoded = ccittg4_decode(data, columns=8, rows=1, black_is_1=True)
    assert decoded == bytes([0b00110000])


@pytest.mark.parametrize("seed,cols,rows", [(1, 40, 23), (2, 64, 8),
                                            (3, 17, 5), (4, 200, 12)])
def test_roundtrip_random_images(seed, cols, rows):
    rng = np.random.RandomState(seed)
    # blocky random image (realistic run structure, exercises P/V/H)
    img = (rng.rand(rows, (cols + 7) // 8) > 0.5).astype(np.uint8)
    img = np.repeat(img, 8, axis=1)[:, :cols]
    data = g4_encode(img, cols)
    decoded = ccittg4_decode(data, columns=cols, rows=rows, black_is_1=True)
    assert np.array_equal(_unpack(decoded, cols, rows), img)


def test_roundtrip_structured_images():
    cols = 48
    img = np.zeros((6, cols), dtype=np.uint8)
    img[1] = 1                       # all black line
    img[2, ::2] = 1                  # 1px alternation (max transitions)
    img[3, 10:40] = 1
    img[4, 11:39] = 1                # vertical-mode deltas of +-1
    data = g4_encode(img, cols)
    decoded = ccittg4_decode(data, columns=cols, rows=6, black_is_1=True)
    assert np.array_equal(_unpack(decoded, cols, 6), img)


def test_code_tables_match_reference_tables():
    """Cross-validate the spec-transcribed tables against the reference's
    (regex-extracted from its source, not imported)."""
    path = "/root/reference/pdfminer/ccitt.py"
    if not os.path.exists(path):
        pytest.skip("reference corpus not available")
    src = open(path).read()
    tables = {"MODE": {}, "WHITE": {}, "BLACK": {}}
    for (tbl, val, bits) in re.findall(
            r"BitParser\.add\((MODE|WHITE|BLACK),\s*([^,]+),\s*'([01]+)'\)",
            src):
        tables[tbl][bits] = val.strip()
    for (bits, run) in WHITE_CODES.items():
        assert tables["WHITE"].get(bits) == str(run), (bits, run)
    for (bits, run) in BLACK_CODES.items():
        assert tables["BLACK"].get(bits) == str(run), (bits, run)
    # every reference entry is covered (same table sizes)
    assert len(tables["WHITE"]) == len(WHITE_CODES)
    assert len(tables["BLACK"]) == len(BLACK_CODES)
    for (bits, v) in MODE_CODES.items():
        if isinstance(v, int):
            assert tables["MODE"].get(bits) in (str(v), "+%d" % v)


def test_ccitt_image_through_extract_images():
    """End-to-end gate (r1 verdict #8): a CCITT-compressed image XObject
    decodes to pixel bytes through the normal extract_images path."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from gen_testpdfs import _classic_pdf, _stream_obj

    from pdfminer_spark.pdf.images import extract_images

    cols, rows = 24, 4
    img = np.zeros((rows, cols), dtype=np.uint8)
    img[1, 4:12] = 1
    img[2, 4:20] = 1
    fax = g4_encode(img, cols)
    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 100 100] "
            b"/Resources << /XObject << /Im1 5 0 R >> >> /Contents 4 0 R >>"),
        4: _stream_obj(b"", b""),
        5: _stream_obj(
            b"/Subtype /Image /Width 24 /Height 4 /BitsPerComponent 1 "
            b"/ColorSpace /DeviceGray /Filter /CCITTFaxDecode /DecodeParms "
            b"<< /K -1 /Columns 24 /Rows 4 /BlackIs1 false >>", fax),
    }
    pdf = _classic_pdf(objects)
    imgs = extract_images(pdf)
    assert len(imgs) == 1
    r = imgs[0]
    assert (r["width"], r["height"], r["bits"], r["ext"]) == (24, 4, 1, ".bmp")
    # BMP body carries the decoded rows (white=1); verify pixel content
    expected = _unpack(ccittg4_decode(fax, cols, rows), cols, rows)
    assert np.array_equal(expected, 1 - img)


def test_rows_none_zero_fill_tail_decodes_cleanly():
    """ADVICE r2: a G4 stream that ends WITHOUT EOFB but carries 2-7
    zero fill bits to the byte boundary must decode fully with
    rows=None (the padding is fill, not a malformed code)."""
    rng = np.random.RandomState(3)
    img = (rng.rand(5, 23) > 0.6).astype(np.uint8)
    data = g4_encode(img, 23)
    # strip the appended EOFB (2x 12 bits) then re-pad with zeros
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
    bitstr = "".join("1" if b else "0" for b in bits)
    core = bitstr[:bitstr.rindex("000000000001" * 2)]
    padded = core + "0" * (-len(core) % 8)
    assert len(padded) > len(core)  # the tail really carries fill bits
    raw = np.packbits(
        np.array([c == "1" for c in padded], dtype=np.uint8)).tobytes()
    out = ccittg4_decode(raw, columns=23, rows=None, black_is_1=True)
    assert _unpack(out, 23, 5).tolist() == img.tolist()
