"""PDF standard security handlers (R2-R5): RC4 / AES-CBC decryption.

Implements PDF Reference algorithms 3.2-3.7 (password -> file key; per-object
RC4/AES-128 keys; AES-256 revision 5). Semantics pinned by the reference's
encrypted sample corpus (/root/reference/samples/encryption/*), decrypted
with both user and owner passwords. Reference analog:
/root/reference/pdfminer/pdfdocument.py:290-510.

AES rides on the `cryptography` package when present; RC4 has a small pure
fallback (the keystream is trivial and payloads are per-object sized).
"""
from __future__ import annotations

import hashlib
import struct

from .objects import bytes_value, dict_value, int_value, literal_name, resolve1

try:
    from cryptography.hazmat.primitives.ciphers import Cipher, modes
    from cryptography.hazmat.primitives.ciphers.algorithms import AES

    def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
        if len(data) % 16:
            data = data[: len(data) - (len(data) % 16)]
        dec = Cipher(AES(key), modes.CBC(iv)).decryptor()
        return dec.update(data) + dec.finalize()

    def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
        enc = Cipher(AES(key), modes.CBC(iv)).encryptor()
        return enc.update(data) + enc.finalize()

except ImportError:  # no third-party dependency required (FIPS-197 KAT-
    # validated pure fallback; see _aes.py and tests/test_crypto_r6.py)
    from ._aes import aes_cbc_decrypt, aes_cbc_encrypt  # noqa: F401


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (enc == dec)."""
    try:
        from cryptography.hazmat.decrepit.ciphers.algorithms import ARC4
        from cryptography.hazmat.primitives.ciphers import Cipher

        enc = Cipher(ARC4(key), mode=None).encryptor()
        return enc.update(data)
    except Exception:
        pass
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


PASSWORD_PAD = (
    b"(\xbfN^Nu\x8aAd\x00NV\xff\xfa\x01\x08"
    b"..\x00\xb6\xd0h>\x80/\x0c\xa9\xfedSiz"
)


class PasswordIncorrect(Exception):
    pass


class EncryptionError(Exception):
    pass


class StandardSecurityHandler:
    """Revisions 2-3 (RC4)."""

    supported_revisions = (2, 3)

    def __init__(self, docid: list, param: dict, password: bytes = b""):
        self.docid = [bytes_value(x) for x in docid]
        self.param = param
        self.password = password
        self.init_params()
        if self.r not in self.supported_revisions:
            raise EncryptionError("unsupported revision %r" % self.r)
        self.key = self.authenticate(password)
        if self.key is None:
            raise PasswordIncorrect

    def init_params(self) -> None:
        p = self.param
        self.v = int_value(resolve1(p.get("V", 0)))
        self.r = int_value(resolve1(p["R"]))
        self.p = int_value(resolve1(p["P"]))
        self.o = bytes_value(resolve1(p["O"]))
        self.u = bytes_value(resolve1(p["U"]))
        self.length = int_value(resolve1(p.get("Length", 40))) or 40
        self.encrypt_metadata = True

    def is_extractable(self) -> bool:
        return bool(self.p & 16)

    # Algorithm 3.2
    def compute_encryption_key(self, password: bytes) -> bytes:
        padded = (password + PASSWORD_PAD)[:32]
        h = hashlib.md5(padded)
        h.update(self.o)
        h.update(struct.pack("<l", self.p))
        h.update(self.docid[0])
        if self.r >= 4 and not self.encrypt_metadata:
            h.update(b"\xff\xff\xff\xff")
        result = h.digest()
        n = 5
        if self.r >= 3:
            n = self.length // 8
            for _ in range(50):
                result = hashlib.md5(result[:n]).digest()
        return result[:n]

    # Algorithm 3.4 / 3.5
    def compute_u(self, key: bytes) -> bytes:
        if self.r == 2:
            return rc4(key, PASSWORD_PAD)
        h = hashlib.md5(PASSWORD_PAD)
        h.update(self.docid[0])
        result = rc4(key, h.digest())
        for i in range(1, 20):
            k = bytes(c ^ i for c in key)
            result = rc4(k, result)
        return result + result

    def verify_encryption_key(self, key: bytes) -> bool:
        u = self.compute_u(key)
        if self.r == 2:
            return u == self.u
        return u[:16] == self.u[:16]

    def authenticate(self, password: bytes):
        key = self.authenticate_user_password(password)
        if key is None:
            key = self.authenticate_owner_password(password)
        return key

    def authenticate_user_password(self, password: bytes):
        key = self.compute_encryption_key(password)
        return key if self.verify_encryption_key(key) else None

    # Algorithm 3.7
    def authenticate_owner_password(self, password: bytes):
        padded = (password + PASSWORD_PAD)[:32]
        h = hashlib.md5(padded)
        if self.r >= 3:
            for _ in range(50):
                h = hashlib.md5(h.digest())
        n = self.length // 8 if self.r >= 3 else 5
        key = h.digest()[:n]
        if self.r == 2:
            user_password = rc4(key, self.o)
        else:
            user_password = self.o
            for i in range(19, -1, -1):
                k = bytes(c ^ i for c in key)
                user_password = rc4(k, user_password)
        return self.authenticate_user_password(user_password)

    def decrypt(self, objid: int, genno: int, data: bytes, attrs=None) -> bytes:
        return self.decrypt_rc4(objid, genno, data)

    def decrypt_rc4(self, objid: int, genno: int, data: bytes) -> bytes:
        key = (self.key + struct.pack("<L", objid)[:3]
               + struct.pack("<L", genno)[:2])
        key = hashlib.md5(key).digest()[: min(len(key), 16)]
        return rc4(key, data)


class StandardSecurityHandlerV4(StandardSecurityHandler):
    """Revision 4 (crypt filters; RC4 or AES-128)."""

    supported_revisions = (4,)

    def init_params(self) -> None:
        super().init_params()
        self.length = 128
        self.cf = dict_value(resolve1(self.param.get("CF")))
        self.stmf = literal_name(resolve1(self.param["StmF"]))
        self.strf = literal_name(resolve1(self.param["StrF"]))
        self.encrypt_metadata = bool(resolve1(self.param.get("EncryptMetadata", True)))
        if self.stmf != self.strf:
            raise EncryptionError("unsupported: StmF != StrF")
        self.cfm = {}
        for k, v in self.cf.items():
            cfm_name = literal_name(resolve1(dict_value(resolve1(v))["CFM"]))
            fn = self.get_cfm(cfm_name)
            if fn is None:
                raise EncryptionError("unknown CFM %r" % cfm_name)
            self.cfm[k] = fn
        self.cfm["Identity"] = lambda objid, genno, data: data
        if self.strf not in self.cfm:
            raise EncryptionError("undefined crypt filter %r" % self.strf)

    def get_cfm(self, name: str):
        if name == "V2":
            return self.decrypt_rc4
        if name == "AESV2":
            return self.decrypt_aes128
        return None

    def decrypt(self, objid, genno, data, attrs=None, name=None) -> bytes:
        if not self.encrypt_metadata and attrs is not None:
            t = attrs.get("Type")
            if t is not None and literal_name(t) == "Metadata":
                return data
        return self.cfm[name or self.strf](objid, genno, data)

    def decrypt_aes128(self, objid: int, genno: int, data: bytes) -> bytes:
        key = (self.key + struct.pack("<L", objid)[:3]
               + struct.pack("<L", genno)[:2] + b"sAlT")
        key = hashlib.md5(key).digest()[: min(len(key), 16)]
        return aes_cbc_decrypt(key, data[:16], data[16:])


class StandardSecurityHandlerV5(StandardSecurityHandlerV4):
    """Revision 5/6 (AES-256).

    R5 hashes passwords with a single SHA-256; R6 (ISO 32000-2,
    Algorithm 2.B) iterates SHA-256/384/512 under an AES-128-CBC mixing
    loop. The reference supports R5 only (pdfdocument.py:446-510); R6 is
    implemented here from the public spec so AES-256-R6 corpora decrypt
    instead of failing authentication (r1 ADVICE item)."""

    supported_revisions = (5, 6)

    def init_params(self) -> None:
        StandardSecurityHandler.init_params(self)
        self.length = 256
        self.oe = bytes_value(resolve1(self.param["OE"]))
        self.ue = bytes_value(resolve1(self.param["UE"]))
        self.o_hash = self.o[:32]
        self.o_validation_salt = self.o[32:40]
        self.o_key_salt = self.o[40:]
        self.u_hash = self.u[:32]
        self.u_validation_salt = self.u[32:40]
        self.u_key_salt = self.u[40:]
        self.cfm = {"Identity": lambda objid, genno, data: data}
        cf = dict_value(resolve1(self.param.get("CF", {})))
        for k in cf:
            self.cfm[k] = self.decrypt_aes256
        self.stmf = literal_name(resolve1(self.param.get("StmF", "Identity")))
        self.strf = literal_name(resolve1(self.param.get("StrF", "Identity")))
        self.encrypt_metadata = bool(resolve1(self.param.get("EncryptMetadata", True)))
        if self.strf not in self.cfm:
            self.cfm[self.strf] = self.decrypt_aes256

    @staticmethod
    def _hash_2b(password: bytes, salt: bytes, udata: bytes) -> bytes:
        """ISO 32000-2 Algorithm 2.B (R6 password hash): iterated
        SHA-256/384/512 selected by an AES-128-CBC mixing round; at
        least 64 rounds, then continue until E[-1] <= round - 32."""
        k = hashlib.sha256(password + salt + udata).digest()
        i = 0
        while True:
            k1 = (password + k + udata) * 64
            e = aes_cbc_encrypt(k[:16], k[16:32], k1)
            # first 16 bytes of E as a big-endian integer mod 3;
            # 256 == 1 (mod 3), so that is the byte sum mod 3
            digest = (hashlib.sha256, hashlib.sha384,
                      hashlib.sha512)[sum(e[:16]) % 3]
            k = digest(e).digest()
            i += 1
            if i >= 64 and e[-1] <= i - 32:
                return k[:32]

    def _pw_hash(self, password: bytes, salt: bytes,
                 udata: bytes = b"") -> bytes:
        if self.r == 5:
            return hashlib.sha256(password + salt + udata).digest()
        return self._hash_2b(password, salt, udata)

    def authenticate(self, password: bytes):
        password = password[:127]
        u48 = self.u[:48]
        if self._pw_hash(password, self.o_validation_salt, u48) == self.o_hash:
            ikey = self._pw_hash(password, self.o_key_salt, u48)
            return aes_cbc_decrypt(ikey, b"\x00" * 16, self.oe)
        if self._pw_hash(password, self.u_validation_salt) == self.u_hash:
            ikey = self._pw_hash(password, self.u_key_salt)
            return aes_cbc_decrypt(ikey, b"\x00" * 16, self.ue)
        return None

    def decrypt_aes256(self, objid: int, genno: int, data: bytes) -> bytes:
        return aes_cbc_decrypt(self.key, data[:16], data[16:])


def make_security_handler(docid: list, param: dict, password: bytes):
    if literal_name(resolve1(param.get("Filter"))) != "Standard":
        raise EncryptionError("unknown security filter")
    v = int_value(resolve1(param.get("V", 0)))
    registry = {
        1: StandardSecurityHandler,
        2: StandardSecurityHandler,
        4: StandardSecurityHandlerV4,
        5: StandardSecurityHandlerV5,
    }
    factory = registry.get(v)
    if factory is None:
        raise EncryptionError("unknown encryption version %r" % v)
    return factory(docid, param, password)
