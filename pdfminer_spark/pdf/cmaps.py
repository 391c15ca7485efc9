"""CMap support: code -> CID decoding and CID -> unicode maps.

Embedded CMaps (ToUnicode streams, embedded /Encoding CMaps) are parsed from
PostScript with the ContentParser. Predefined CJK CMaps (Adobe-Japan1 etc.)
are compiled offline from Adobe's public cid2code.txt tables by
tools/build_cmaps.py into JSON.gz resources, loaded once per executor and
cached (the broadcast-variable pattern of SURVEY.md §2.3).
Reference analog: /root/reference/pdfminer/cmapdb.py.
"""
from __future__ import annotations

import gzip
import json
import os
import struct
from functools import lru_cache

from .lexer import LexerEOF
from .objects import KW, Keyword, Name
from .parser import ParserEOF, StackParser

_RES = os.path.join(os.path.dirname(__file__), "..", "resources", "cmap")


class CMapNotFound(Exception):
    pass


class CMapBase:
    def __init__(self, **attrs):
        self.attrs = dict(attrs)

    def is_vertical(self) -> bool:
        return self.attrs.get("WMode", 0) != 0

    def set_attr(self, k, v):
        self.attrs[k] = v

    def use_cmap(self, other):
        pass

    def add_code2cid(self, code: bytes, cid: int):
        pass

    def add_cid2unichr(self, cid: int, code):
        pass


class CMap(CMapBase):
    """Multibyte code -> CID trie."""

    def __init__(self, **attrs):
        super().__init__(**attrs)
        self.code2cid: dict = {}

    def use_cmap(self, other: "CMap") -> None:
        def copy(dst, src):
            for (k, v) in src.items():
                if isinstance(v, dict):
                    d = dst.setdefault(k, {})
                    if not isinstance(d, dict):
                        d = dst[k] = {}
                    copy(d, v)
                else:
                    dst[k] = v

        copy(self.code2cid, other.code2cid)

    def add_code2cid(self, code: bytes, cid: int) -> None:
        d = self.code2cid
        for c in code[:-1]:
            nxt = d.get(c)
            if not isinstance(nxt, dict):
                nxt = d[c] = {}
            d = nxt
        d[code[-1]] = cid

    def decode(self, data: bytes):
        """Trie walk; unmatched prefixes restart at the root (reference
        cmapdb.py:90-102)."""
        d = self.code2cid
        root = self.code2cid
        for c in data:
            nxt = d.get(c)
            if nxt is not None:
                d = nxt
                if isinstance(d, int):
                    yield d
                    d = root
            else:
                d = root


class IdentityCMap(CMapBase):
    """2-byte big-endian identity: vectorizes to a struct unpack."""

    def decode(self, data: bytes):
        n = len(data) // 2
        if n:
            return struct.unpack(">%dH" % n, data[: n * 2])
        return ()


class UnicodeMap(CMapBase):
    def __init__(self, **attrs):
        super().__init__(**attrs)
        self.cid2unichr: dict[int, str] = {}

    def get_unichr(self, cid: int) -> str:
        return self.cid2unichr[cid]

    def add_cid2unichr(self, cid: int, code) -> None:
        if isinstance(code, Name):
            from .encodings import name2unicode

            try:
                self.cid2unichr[cid] = name2unicode(str(code))
            except KeyError:
                return
        elif isinstance(code, bytes):
            self.cid2unichr[cid] = code.decode("UTF-16BE", "ignore")
        elif isinstance(code, int):
            self.cid2unichr[cid] = chr(code)


def nunpack(s: bytes, default: int = 0) -> int:
    if not s:
        return default
    return int.from_bytes(s, "big")


KW_DEF = KW(b"def")
KW_USECMAP = KWD_USECMAP = KW(b"usecmap")
KW_BEGINCMAP = KW(b"begincmap")
KW_ENDCMAP = KW(b"endcmap")


class CMapParser(StackParser):
    """PostScript CMap section parser feeding a CMap/UnicodeMap sink.

    No flushing between top-level objects: operands accumulate on the
    stack until a begin*/end* keyword consumes them (reference
    cmapdb.py:271-417 extends the non-flushing PSStackParser)."""

    def __init__(self, cmap: CMapBase, data: bytes):
        super().__init__(data)
        self.cmap = cmap
        self._in_cmap = True  # some ToUnicode maps omit begincmap
        # Total range-expansion budget for this run: a hostile embedded
        # CMap can declare `<00000000> <7fffffff> 0 endcidrange` (or the
        # bfrange analog) and the naive per-range loop runs 2^31 times
        # inside a worker (the reference, cmapdb.py:310-417, expands
        # unbounded and hangs). Legit CMaps map <= 65,536 codes per
        # 2-byte range and the largest real Adobe CJK resources total
        # ~100k mappings, so a 1M budget is unreachable except under
        # attack; once exhausted, further ranges are truncated.
        self._budget = 1 << 20

    def run(self) -> None:
        try:
            self.next_object()
        except ParserEOF:
            pass
        except LexerEOF:
            pass

    def do_keyword(self, pos: int, kw: Keyword) -> None:  # noqa: C901
        name = bytes(kw)
        if name == b"begincmap":
            self._in_cmap = True
            self.popall()
            return
        if name == b"endcmap":
            self._in_cmap = False
            return
        if not self._in_cmap:
            return
        if name == b"def":
            vals = self.pop(2)
            if len(vals) == 2:
                ((_, k), (_, v)) = vals
                if isinstance(k, Name):
                    self.cmap.set_attr(str(k), v)
            return
        if name == b"usecmap":
            vals = self.pop(1)
            if vals:
                ((_, cmapname),) = vals
                try:
                    self.cmap.use_cmap(get_cmap(str(cmapname)))
                except (CMapNotFound, AttributeError):
                    pass
            return
        if name in (b"begincodespacerange", b"endcodespacerange",
                    b"begincidrange", b"begincidchar", b"beginbfrange",
                    b"beginbfchar", b"beginnotdefrange", b"endnotdefrange"):
            self.popall()
            return
        if name == b"endcidrange":
            objs = [obj for (_, obj) in self.popall()]
            for i in range(0, len(objs) - 2, 3):
                (s, e, cid) = objs[i : i + 3]
                if (not isinstance(s, bytes) or not isinstance(e, bytes)
                        or not isinstance(cid, int) or len(s) != len(e)):
                    continue
                sprefix, eprefix = s[:-4], e[:-4]
                if sprefix != eprefix:
                    continue
                svar, evar = s[-4:], e[-4:]
                s1, e1 = nunpack(svar), nunpack(evar)
                vlen = len(svar)
                n = min(e1 - s1 + 1, self._budget)
                self._budget -= max(n, 0)
                for k in range(n):
                    x = sprefix + struct.pack(">L", s1 + k)[-vlen:]
                    self.cmap.add_code2cid(x, cid + k)
            return
        if name == b"endcidchar":
            objs = [obj for (_, obj) in self.popall()]
            for i in range(0, len(objs) - 1, 2):
                (cid, code) = objs[i : i + 2]
                if isinstance(code, bytes) and isinstance(cid, bytes):
                    self.cmap.add_code2cid(code, nunpack(cid))
            return
        if name == b"endbfrange":
            objs = [obj for (_, obj) in self.popall()]
            for i in range(0, len(objs) - 2, 3):
                (s, e, code) = objs[i : i + 3]
                if (not isinstance(s, bytes) or not isinstance(e, bytes)
                        or len(s) != len(e)):
                    continue
                s1, e1 = nunpack(s), nunpack(e)
                if isinstance(code, list):
                    # identical to looping e1-s1+1 times with a k <
                    # len(code) guard, minus the hostile-range spin
                    for k in range(min(e1 - s1 + 1, len(code))):
                        self.cmap.add_cid2unichr(s1 + k, code[k])
                elif isinstance(code, bytes):
                    var = code[-4:]
                    base = nunpack(var)
                    prefix = code[:-4]
                    vlen = len(var)
                    n = min(e1 - s1 + 1, self._budget)
                    self._budget -= max(n, 0)
                    for k in range(n):
                        x = prefix + struct.pack(">L", base + k)[-vlen:]
                        self.cmap.add_cid2unichr(s1 + k, x)
            return
        if name == b"endbfchar":
            objs = [obj for (_, obj) in self.popall()]
            for i in range(0, len(objs) - 1, 2):
                (cid, code) = objs[i : i + 2]
                if isinstance(cid, bytes):
                    self.cmap.add_cid2unichr(nunpack(cid), code)
            return
        self.push((pos, kw))


# -- predefined (compiled) CMap resources -------------------------------------

@lru_cache(maxsize=None)
def _load_resource(name: str) -> dict:
    path = os.path.join(_RES, "%s.json.gz" % name)
    if not os.path.exists(path):
        raise CMapNotFound(name)
    with gzip.open(path, "rt", encoding="utf-8") as fp:
        return json.load(fp)


def _unflatten(flat: dict[str, int]) -> dict:
    """Rebuild the byte-trie from {'hexcode': cid} JSON form."""
    root: dict = {}
    for hexcode, cid in flat.items():
        code = bytes.fromhex(hexcode)
        d = root
        for c in code[:-1]:
            nxt = d.get(c)
            if not isinstance(nxt, dict):
                nxt = d[c] = {}
            d = nxt
        d[code[-1]] = cid
    return root


@lru_cache(maxsize=None)
def get_cmap(name: str) -> CMapBase:
    if name == "Identity-H":
        return IdentityCMap(WMode=0)
    if name == "Identity-V":
        return IdentityCMap(WMode=1)
    data = _load_resource(name)
    cmap = CMap(CMapName=name)
    if data.get("IS_VERTICAL"):
        cmap.attrs["WMode"] = 1
    cmap.code2cid = _unflatten(data["CODE2CID"])
    return cmap


@lru_cache(maxsize=None)
def get_unicode_map(registry: str, vertical: bool) -> UnicodeMap:
    data = _load_resource("to-unicode-%s" % registry)
    umap = UnicodeMap(CMapName=registry)
    key = "CID2UNICHR_V" if vertical else "CID2UNICHR_H"
    umap.cid2unichr = {int(k): v for (k, v) in data[key].items()}
    if vertical:
        umap.attrs["WMode"] = 1
    return umap
