"""AES-256 R6 (ISO 32000-2 Algorithm 2.B) security handler tests.

The vendored corpus is R5 (the reference only supports R5), so R6 is
exercised with a synthetic encryption dictionary built from the same
Algorithm 2.B the handler implements for verification, plus an
independently-coded reference loop to guard against a self-consistent
but wrong implementation."""
import hashlib

import pytest

from pdfminer_spark.pdf.crypto import (PasswordIncorrect,
                                       StandardSecurityHandlerV5,
                                       aes_cbc_decrypt, aes_cbc_encrypt)


def _hash2b_independent(password: bytes, salt: bytes, udata: bytes) -> bytes:
    """Spec-transcribed Algorithm 2.B, written separately from the
    handler's version (different structure, same math)."""
    K = hashlib.sha256(password + salt + udata).digest()
    round_no = 0
    while True:
        K1 = (password + K + udata) * 64
        E = aes_cbc_encrypt(K[:16], K[16:32], K1)
        m = int.from_bytes(E[:16], "big") % 3
        if m == 0:
            K = hashlib.sha256(E).digest()
        elif m == 1:
            K = hashlib.sha384(E).digest()
        else:
            K = hashlib.sha512(E).digest()
        round_no += 1
        if round_no >= 64 and E[-1] <= round_no - 32:
            return K[:32]


def test_hash_2b_matches_independent_transcription():
    for (pw, salt, udata) in [
        (b"user", b"12345678", b""),
        (b"owner-pass", b"abcdefgh", b"U" * 48),
        (b"", b"\x00" * 8, b""),
    ]:
        assert StandardSecurityHandlerV5._hash_2b(pw, salt, udata) == \
            _hash2b_independent(pw, salt, udata)


def _make_r6_param(user_pw: bytes, owner_pw: bytes, file_key: bytes) -> dict:
    h2b = StandardSecurityHandlerV5._hash_2b
    uvs, uks = b"uvs45678", b"uks45678"
    u_hash = h2b(user_pw, uvs, b"")
    U = u_hash + uvs + uks
    UE = aes_cbc_encrypt(h2b(user_pw, uks, b""), b"\x00" * 16, file_key)
    ovs, oks = b"ovs45678", b"oks45678"
    o_hash = h2b(owner_pw, ovs, U[:48])
    O = o_hash + ovs + oks
    OE = aes_cbc_encrypt(h2b(owner_pw, oks, U[:48]), b"\x00" * 16, file_key)
    return {"V": 5, "R": 6, "P": -4, "Length": 256,
            "O": O, "U": U, "OE": OE, "UE": UE,
            "CF": {"StdCF": {"CFM": "AESV3"}},
            "StmF": "StdCF", "StrF": "StdCF"}


def test_r6_user_and_owner_passwords_recover_file_key():
    file_key = bytes(range(32))
    param = _make_r6_param(b"user", b"owner", file_key)
    for pw in (b"user", b"owner"):
        h = StandardSecurityHandlerV5([b"docid"], param, pw)
        assert h.key == file_key
    with pytest.raises(PasswordIncorrect):
        StandardSecurityHandlerV5([b"docid"], param, b"wrong")


def test_r6_decrypts_aes256_payload():
    file_key = bytes(range(32, 64))
    param = _make_r6_param(b"u", b"o", file_key)
    h = StandardSecurityHandlerV5([b"docid"], param, b"u")
    iv = b"\x01" * 16
    plain = b"sixteen byte msg" * 4
    blob = iv + aes_cbc_encrypt(file_key, iv, plain)
    assert h.decrypt(1, 0, blob) == plain


def test_r5_still_single_sha256():
    # R5 construction: one SHA-256, no 2.B loop
    pw, uvs, uks = b"user", b"vsalt678", b"ksalt678"
    file_key = b"\xaa" * 32
    u_hash = hashlib.sha256(pw + uvs).digest()
    U = u_hash + uvs + uks
    UE = aes_cbc_encrypt(hashlib.sha256(pw + uks).digest(),
                         b"\x00" * 16, file_key)
    o_hash = hashlib.sha256(b"own" + b"ovsalt78" + U[:48]).digest()
    O = o_hash + b"ovsalt78" + b"oksalt78"
    OE = aes_cbc_encrypt(hashlib.sha256(b"own" + b"oksalt78" + U[:48]).digest(),
                         b"\x00" * 16, file_key)
    param = {"V": 5, "R": 5, "P": -4, "Length": 256,
             "O": O, "U": U, "OE": OE, "UE": UE}
    assert StandardSecurityHandlerV5([b"d"], param, pw).key == file_key
    assert StandardSecurityHandlerV5([b"d"], param, b"own").key == file_key


def test_pure_python_aes_fallback_decrypts_goldens(monkeypatch):
    """Encrypted goldens must pass with the pure-Python AES (the
    no-'cryptography' fallback path), not just via OpenSSL (r1 verdict
    #10). FIPS-197 KATs live in the module; this is the end-to-end
    check."""
    import pdfminer_spark.pdf.crypto as crypto
    from pdfminer_spark.pdf import _aes
    from pdfminer_spark.pdf.extract import extract_text
    from pdfminer_spark.pdf.layout import LAParams

    monkeypatch.setattr(crypto, "aes_cbc_decrypt", _aes.aes_cbc_decrypt)
    monkeypatch.setattr(crypto, "aes_cbc_encrypt", _aes.aes_cbc_encrypt)
    from tests.conftest import payload

    la = LAParams(detect_vertical=True)
    base = extract_text(payload("encryption/base"), laparams=la)
    for name in ("aes-128", "aes-256"):
        for pw in (b"foo", b"baz"):
            txt = extract_text(payload("encryption/" + name),
                               password=pw, laparams=la)
            assert txt == base


def test_fips_197_kats():
    from pdfminer_spark.pdf._aes import (_decrypt_block, _encrypt_block,
                                         _expand_key)

    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    pt = bytes.fromhex("3243f6a8885a308d313198a2e0370734")
    ct = bytes.fromhex("3925841d02dc09fbdc118597196a0b32")
    rk = _expand_key(key)
    assert _encrypt_block(rk, 10, pt) == ct
    assert _decrypt_block(rk, 10, ct) == pt
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f"
                        "101112131415161718191a1b1c1d1e1f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = bytes.fromhex("8ea2b7ca516745bfeafc49904b496089")
    rk = _expand_key(key)
    assert _encrypt_block(rk, 14, pt) == ct
    assert _decrypt_block(rk, 14, ct) == pt
