"""Differential codec properties vs the live reference decoders: for any
valid encoding of random payload bytes, our filter must produce the
byte-identical decode the reference produces (the reference ships only
decoders, so encoders live here in the test).
"""
import base64
import binascii
import os
import sys

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="no reference")
sys.path.insert(0, REFERENCE)


def _rle_encode(data: bytes) -> bytes:
    """PDF RunLengthDecode encoder (literal runs + repeats), EOD 0x80."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes((257 - run, data[i]))
            i += run
        else:
            j = i + 1
            while j < n and j - i < 128 and \
                    not (j + 1 < n and data[j] == data[j + 1]):
                j += 1
            out += bytes((j - i - 1,)) + data[i:j]
            i = j
    out.append(128)
    return bytes(out)


@given(st.binary(max_size=2048))
@settings(max_examples=150, deadline=None)
def test_rle_decode_matches_reference(payload):
    from pdfminer.runlength import rldecode as ref_rldecode

    from pdfminer_spark.pdf.filters import rldecode as rl_decode

    enc = _rle_encode(payload)
    assert rl_decode(enc) == ref_rldecode(enc) == payload


@given(st.binary(max_size=2048))
@settings(max_examples=150, deadline=None)
def test_ascii85_decode_matches_reference(payload):
    from pdfminer.ascii85 import ascii85decode

    from pdfminer_spark.pdf.filters import ascii85decode as a85_decode

    enc = base64.a85encode(payload) + b"~>"
    assert a85_decode(enc) == ascii85decode(enc) == payload


@given(st.binary(max_size=2048), st.integers(min_value=0, max_value=2**32))
@settings(max_examples=150, deadline=None)
def test_asciihex_decode_matches_reference(payload, seed):
    import random

    from pdfminer.ascii85 import asciihexdecode

    from pdfminer_spark.pdf.filters import asciihexdecode as ahx_decode

    hexed = binascii.hexlify(payload)
    # sprinkle whitespace (legal anywhere) deterministically from the seed
    rng = random.Random(seed)
    chunks = []
    for i in range(0, len(hexed), 8):
        chunks.append(hexed[i:i + 8])
        if rng.random() < 0.3:
            chunks.append(rng.choice([b" ", b"\n", b"\t", b"\r"]))
    enc = b"".join(chunks) + b">"
    assert ahx_decode(enc) == asciihexdecode(enc) == payload
