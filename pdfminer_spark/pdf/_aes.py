"""Pure-Python AES-CBC (FIPS-197) fallback for environments without the
``cryptography`` package — keeps encrypted-PDF decryption dependency-free
(reference analog: pdfminer ships its own rijndael.py for the same
reason; this is an independent implementation with computed GF tables).

Payloads are per-object sized (KBs), so pure-Python speed is acceptable
on the fallback path; with ``cryptography`` present the OpenSSL-backed
functions in crypto.py are used instead.
"""
from __future__ import annotations


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


# GF(2^8) log/antilog tables over generator 3
_ALOG = [1] * 256
_LOG = [0] * 256
_a = 1
for _i in range(255):
    _ALOG[_i] = _a
    _LOG[_a] = _i
    _a ^= _xtime(_a)  # multiply by 3
_ALOG[255] = _ALOG[0]


def _gmul(a: int, b: int) -> int:
    if a == 0 or b == 0:
        return 0
    return _ALOG[(_LOG[a] + _LOG[b]) % 255]


def _rotl8(x: int, n: int) -> int:
    return ((x << n) | (x >> (8 - n))) & 0xFF


# S-box: multiplicative inverse + affine transform
SBOX = [0] * 256
for _x in range(256):
    _y = _ALOG[255 - _LOG[_x]] if _x else 0
    SBOX[_x] = (_y ^ _rotl8(_y, 1) ^ _rotl8(_y, 2) ^ _rotl8(_y, 3)
                ^ _rotl8(_y, 4) ^ 0x63)
INV_SBOX = [0] * 256
for (_x, _s) in enumerate(SBOX):
    INV_SBOX[_s] = _x

_RCON = [0x01]
while len(_RCON) < 14:
    _RCON.append(_xtime(_RCON[-1]))


def _expand_key(key: bytes) -> list[int]:
    """Round keys as a flat byte list (16 bytes per round)."""
    nk = len(key) // 4
    nr = nk + 6
    w = [list(key[4 * i:4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [SBOX[b] for b in t]
        w.append([a ^ b for (a, b) in zip(w[i - nk], t)])
    return [b for word in w for b in word]


def _encrypt_block(rk: list[int], nr: int, block: bytes) -> bytes:
    s = [b ^ rk[i] for (i, b) in enumerate(block)]
    for rnd in range(1, nr + 1):
        s = [SBOX[b] for b in s]
        # ShiftRows: row r rotates left by r
        s = [s[(4 * (((i // 4) + (i % 4)) % 4)) + (i % 4)] for i in range(16)]
        if rnd < nr:
            t = []
            for c in range(4):
                a = s[4 * c:4 * c + 4]
                t += [
                    _gmul(a[0], 2) ^ _gmul(a[1], 3) ^ a[2] ^ a[3],
                    a[0] ^ _gmul(a[1], 2) ^ _gmul(a[2], 3) ^ a[3],
                    a[0] ^ a[1] ^ _gmul(a[2], 2) ^ _gmul(a[3], 3),
                    _gmul(a[0], 3) ^ a[1] ^ a[2] ^ _gmul(a[3], 2),
                ]
            s = t
        k = rk[16 * rnd:16 * rnd + 16]
        s = [b ^ k[i] for (i, b) in enumerate(s)]
    return bytes(s)


def _decrypt_block(rk: list[int], nr: int, block: bytes) -> bytes:
    k = rk[16 * nr:16 * nr + 16]
    s = [b ^ k[i] for (i, b) in enumerate(block)]
    for rnd in range(nr - 1, -1, -1):
        # InvShiftRows: row r shifts right by r
        s = [s[(4 * (((i // 4) - (i % 4)) % 4)) + (i % 4)] for i in range(16)]
        s = [INV_SBOX[b] for b in s]
        k = rk[16 * rnd:16 * rnd + 16]
        s = [b ^ k[i] for (i, b) in enumerate(s)]
        if rnd > 0:
            t = []
            for c in range(4):
                a = s[4 * c:4 * c + 4]
                t += [
                    _gmul(a[0], 14) ^ _gmul(a[1], 11) ^ _gmul(a[2], 13)
                    ^ _gmul(a[3], 9),
                    _gmul(a[0], 9) ^ _gmul(a[1], 14) ^ _gmul(a[2], 11)
                    ^ _gmul(a[3], 13),
                    _gmul(a[0], 13) ^ _gmul(a[1], 9) ^ _gmul(a[2], 14)
                    ^ _gmul(a[3], 11),
                    _gmul(a[0], 11) ^ _gmul(a[1], 13) ^ _gmul(a[2], 9)
                    ^ _gmul(a[3], 14),
                ]
            s = t
    return bytes(s)


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    if len(data) % 16:
        data = data[: len(data) - (len(data) % 16)]
    rk = _expand_key(key)
    nr = len(key) // 4 + 6
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = data[i:i + 16]
        plain = _decrypt_block(rk, nr, block)
        out += bytes(a ^ b for (a, b) in zip(plain, prev))
        prev = block
    return bytes(out)


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    rk = _expand_key(key)
    nr = len(key) // 4 + 6
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = bytes(a ^ b for (a, b) in zip(data[i:i + 16], prev))
        prev = _encrypt_block(rk, nr, block)
        out += prev
    return bytes(out)
