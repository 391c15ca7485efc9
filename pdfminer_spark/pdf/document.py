"""PDF document: xref index, trailer chain, lazy object store, page tree.

The xref table is the document's point-lookup index (the in-UDF analog of a
Parquet footer): ``objid -> (stream-id, offset, genno)``. Object loading is
lazy with memoization — the reference's equivalent of a build-side hash
table for reference resolution (/root/reference/pdfminer/pdfdocument.py).
Xref *streams* are decoded with one ``numpy.frombuffer`` reshape instead of
a per-entry loop.
"""
from __future__ import annotations

import re

import numpy as np

from .lexer import LexerEOF
from .objects import (KW, Keyword, ObjRef, Stream, dict_value, int_value,
                      list_value, resolve1, stream_value)
from .parser import ContentParser, ParserEOF, PdfParser

KW_TRAILER = KW(b"trailer")
KW_XREF = KW(b"xref")
KW_OBJ = KW(b"obj")

_OBJ_CUE = re.compile(rb"^(\d+)\s+(\d+)\s+obj\b")
_STARTXREF = re.compile(rb"startxref")


class PdfSyntaxError(Exception):
    pass


class NoValidXRef(PdfSyntaxError):
    pass


class ObjectNotFound(Exception):
    pass


class XRefTable:
    """Classic ``xref`` section: line-oriented offset table + trailer."""

    def __init__(self):
        self.offsets: dict[int, tuple[int | None, int, int]] = {}
        self.trailer: dict = {}

    def load(self, parser: PdfParser) -> None:
        while True:
            try:
                (pos, line) = parser.nextline()
            except ParserEOF:
                raise NoValidXRef("EOF before trailer") from None
            if not line.strip():
                continue
            if line.startswith(b"trailer"):
                parser.seek(pos)
                break
            fields = line.strip().split(b" ")
            if len(fields) != 2:
                raise NoValidXRef("bad subsection header: %r" % line)
            try:
                (start, nobjs) = (int(fields[0]), int(fields[1]))
            except ValueError:
                raise NoValidXRef("bad subsection header: %r" % line) from None
            for objid in range(start, start + nobjs):
                try:
                    (_, line) = parser.nextline()
                except ParserEOF:
                    raise NoValidXRef("EOF in xref body") from None
                fields = line.strip().split(b" ")
                if len(fields) != 3:
                    raise NoValidXRef("bad xref entry: %r" % line)
                (ofs, genno, use) = fields
                if use != b"n":
                    continue
                self.offsets[objid] = (None, int(ofs), int(genno))
        self.load_trailer(parser)

    def load_trailer(self, parser: PdfParser) -> None:
        try:
            (_, kwd) = parser.next_token()
            (_, dic) = parser.next_object()
        except ParserEOF:
            x = parser.pop(1)
            if not x:
                raise NoValidXRef("EOF before trailer dict") from None
            (_, dic) = x[0]
        self.trailer.update(dict_value(dic))

    def get_trailer(self) -> dict:
        return self.trailer

    def get_objids(self):
        return self.offsets.keys()

    def get_pos(self, objid: int):
        return self.offsets[objid]


class XRefFallback(XRefTable):
    """Full forward scan for ``N G obj`` cues when xrefs are broken."""

    def load(self, parser: PdfParser) -> None:  # noqa: C901
        parser.seek(0)
        buf = parser.buf
        while True:
            try:
                (pos, line) = parser.nextline()
            except ParserEOF:
                break
            if line.startswith(b"trailer"):
                parser.seek(pos)
                self.load_trailer(parser)
                break
            m = _OBJ_CUE.match(line)
            if m is None:
                continue
            objid = int(m.group(1))
            self.offsets[objid] = (None, pos, int(m.group(2)))
            # expand packed object streams so their members are addressable
            parser.seek(pos)
            try:
                (_, obj) = parser.next_object()
            except ParserEOF:
                break
            if isinstance(obj, Stream) and str(obj.get("Type")) == "ObjStm":
                n = int_value(obj.get("N"))
                sub = ContentParser(obj.get_data(), doc=parser.doc)
                objs = [o for (_, o) in sub.iter_objects()]
                n = min(n, len(objs) // 2)
                for index in range(n):
                    self.offsets[objs[index * 2]] = (objid, index, 0)
            parser.seek(parser.lexer.tell())


class XRefStream:
    """PDF 1.5 cross-reference stream, decoded in one numpy pass."""

    def __init__(self):
        self.trailer: dict = {}
        self.ranges: list[tuple[int, int]] = []
        self.fields: np.ndarray | None = None  # (nentries, 3) int64
        self.ids: np.ndarray | None = None

    def load(self, parser: PdfParser) -> None:
        parser.next_token()  # objid
        parser.next_token()  # genno
        parser.next_token()  # 'obj'
        (_, stream) = parser.next_object()
        if not isinstance(stream, Stream) or str(stream.get("Type")) != "XRef":
            raise NoValidXRef("not an XRef stream")
        size = int_value(resolve1(stream["Size"]))
        index = list_value(resolve1(stream.get("Index", [0, size])))
        w = [int_value(x) for x in list_value(resolve1(stream["W"]))]
        (fl1, fl2, fl3) = (w + [0, 0, 0])[:3]
        entlen = fl1 + fl2 + fl3
        data = stream.get_data()
        nent = len(data) // entlen
        raw = np.frombuffer(data[: nent * entlen], dtype=np.uint8).reshape(nent, entlen)

        def field(lo: int, hi: int) -> np.ndarray:
            if lo == hi:
                return np.zeros(nent, dtype=np.int64)
            v = np.zeros(nent, dtype=np.int64)
            for k in range(lo, hi):
                v = (v << 8) | raw[:, k].astype(np.int64)
            return v

        f1 = field(0, fl1)
        if fl1 == 0:
            f1 = np.ones(nent, dtype=np.int64)  # default type 1
        f2 = field(fl1, fl1 + fl2)
        f3 = field(fl1 + fl2, entlen)
        self.fields = np.stack([f1, f2, f3], axis=1)
        ids = []
        self.ranges = [(int(s), int(n)) for (s, n) in zip(index[0::2], index[1::2])]
        for (start, nobjs) in self.ranges:
            ids.append(np.arange(start, start + nobjs, dtype=np.int64))
        allids = np.concatenate(ids) if ids else np.zeros(0, dtype=np.int64)
        self.ids = allids[: len(self.fields)]
        self.fields = self.fields[: len(self.ids)]
        self._index = {int(oid): i for (i, oid) in enumerate(self.ids)}
        self.trailer = stream.attrs

    def get_trailer(self) -> dict:
        return self.trailer

    def get_objids(self):
        mask = (self.fields[:, 0] == 1) | (self.fields[:, 0] == 2)
        return [int(x) for x in self.ids[mask]]

    def get_pos(self, objid: int):
        i = self._index.get(objid)
        if i is None:
            raise KeyError(objid)
        (f1, f2, f3) = (int(x) for x in self.fields[i])
        if f1 == 1:
            return (None, f2, f3)
        if f1 == 2:
            return (f2, f3, 0)
        raise KeyError(objid)


class PdfDocument:
    """Parsed document handle: xref chain, trailer, catalog, object cache."""

    def __init__(self, buf: bytes, password: bytes = b"", fallback: bool = True,
                 caching: bool = True):
        self.buf = buf
        # caching=False disables the object/objstm memo tables (reference
        # PDFDocument(caching=...), pdfdocument.py:122 — output-identical)
        self.caching = caching
        self.xrefs: list = []
        self.catalog: dict | None = None
        self.encryption = None
        self.decipher = None
        self.is_extractable = True
        self._cache: dict[int, object] = {}
        self._objstm_cache: dict[int, tuple[list, int]] = {}
        self.parser = PdfParser(buf, doc=self)
        self._fallback_scanned = False
        self._allow_fallback = fallback
        need_fallback = False
        try:
            pos = self.find_xref()
            self.read_xref_from(pos, self.xrefs)
        except (NoValidXRef, ParserEOF, LexerEOF, ValueError):
            need_fallback = True
        # After xref loading, stream /Length values are no longer trusted
        # (reference default: pdfdocument.py:540,560-564 keeps the parser in
        # fallback mode for the whole unencrypted document).
        self.parser.fallback = True
        if need_fallback and fallback:
            self._run_fallback_scan()
        if fallback and not any("Root" in x.get_trailer() for x in self.xrefs):
            self._run_fallback_scan()
        for xref in self.xrefs:
            trailer = xref.get_trailer()
            if not trailer:
                continue
            if "Encrypt" in trailer and self.encryption is None:
                from .crypto import make_security_handler

                ids = list_value(resolve1(trailer.get("ID")))
                param = dict_value(resolve1(trailer["Encrypt"]))
                handler = make_security_handler(ids, param, password)
                self.encryption = handler
                self.decipher = handler.decrypt
                self.is_extractable = handler.is_extractable()
                # encrypted payloads need exact lengths
                self.parser.fallback = False
            if "Root" in trailer:
                self.catalog = dict_value(resolve1(trailer["Root"]))
                break
        if self.catalog is None:
            raise PdfSyntaxError("no /Root object")

    # -- xref discovery -------------------------------------------------------
    def find_xref(self) -> int:
        prev = None
        from .lexer import Lexer

        for line in Lexer(self.buf).reverse_lines():
            line = line.strip()
            if line == b"startxref":
                break
            if line:
                prev = line
        else:
            raise NoValidXRef("startxref not found")
        if prev is None:
            raise NoValidXRef("startxref position missing")
        return int(prev)

    def read_xref_from(self, start: int, xrefs: list,
                       _seen: set | None = None) -> None:
        if start < 0 or start >= len(self.buf):
            raise NoValidXRef("bad xref offset %d" % start)
        # hostile /Prev (or /XRefStm) chains can cycle — a section offset
        # is followed at most once (tests/test_hostile_pdfs.py)
        if _seen is None:
            _seen = set()
        if start in _seen:
            return
        _seen.add(start)
        self.parser.seek(start)
        try:
            (pos, token) = self.parser.next_token()
        except ParserEOF:
            raise NoValidXRef("EOF at xref offset") from None
        if isinstance(token, int):
            # PDF 1.5 xref stream: "N G obj <stream>"
            self.parser.seek(pos)
            xref = XRefStream()
            xref.load(self.parser)
        else:
            if token is KW_XREF:
                self.parser.nextline()
            xref = XRefTable()
            xref.load(self.parser)
        xrefs.append(xref)
        trailer = xref.get_trailer()
        if "XRefStm" in trailer:
            self.read_xref_from(int_value(resolve1(trailer["XRefStm"])),
                                xrefs, _seen)
        if "Prev" in trailer:
            self.read_xref_from(int_value(resolve1(trailer["Prev"])),
                                xrefs, _seen)

    def _run_fallback_scan(self) -> None:
        """Forward scan for ``N G obj`` cues. The reference runs this for
        every document up front (pdfdocument.py:561-565); we defer it until
        an object lookup actually misses — same observable resolution
        order (real xrefs win), no wasted full-file scan per payload."""
        if self._fallback_scanned or not self._allow_fallback:
            return
        self._fallback_scanned = True
        xref = XRefFallback()
        try:
            xref.load(self.parser)
        except (ParserEOF, LexerEOF):
            pass
        self.xrefs.append(xref)

    # -- object store ---------------------------------------------------------
    def getobj(self, objid: int):
        if objid in self._cache:
            return self._cache[objid]
        obj = self._getobj_uncached(objid)
        if self.caching:
            self._cache[objid] = obj
        return obj

    def _getobj_uncached(self, objid: int):
        obj = None
        found = False
        for xref in self.xrefs:
            try:
                (strmid, index, genno) = xref.get_pos(objid)
            except KeyError:
                continue
            try:
                if strmid is not None:
                    stream = stream_value(self.getobj(strmid))
                    obj = self._getobj_objstm(stream, index)
                else:
                    obj = self._getobj_parse(index, objid)
                    if self.decipher:
                        from .objects import decipher_all

                        obj = decipher_all(self.decipher, objid, genno, obj)
                if isinstance(obj, Stream):
                    obj.objid = objid
                    obj.genno = genno
                found = True
                break
            except (ParserEOF, PdfSyntaxError, LexerEOF):
                continue
        if not found:
            if not self._fallback_scanned and self._allow_fallback:
                self._run_fallback_scan()
                return self._getobj_uncached(objid)
            raise ObjectNotFound(objid)
        return obj

    def _getobj_parse(self, pos: int, objid: int):
        self.parser.seek(pos)
        (_, objid1) = self.parser.next_token()
        if objid1 != objid:
            raise PdfSyntaxError("objid mismatch: %r != %r" % (objid1, objid))
        self.parser.next_token()  # genno
        (_, kwd) = self.parser.next_token()
        if kwd is not KW_OBJ:
            raise PdfSyntaxError("missing 'obj' keyword at %d" % pos)
        (_, obj) = self.parser.next_object()
        return obj

    def _getobj_objstm(self, stream: Stream, index: int):
        key = id(stream) if stream.objid is None else stream.objid
        if key in self._objstm_cache:
            (objs, n) = self._objstm_cache[key]
        else:
            n = int_value(resolve1(stream.get("N")))
            sub = ContentParser(stream.get_data(), doc=self)
            objs = [o for (_, o) in sub.iter_objects()]
            if self.caching:
                self._objstm_cache[key] = (objs, n)
        i = n * 2 + index
        if i >= len(objs):
            raise PdfSyntaxError("objstm index out of range")
        return objs[i]

    # -- page tree -------------------------------------------------------------
    INHERITABLE = ("Resources", "MediaBox", "CropBox", "Rotate")

    def get_pages(self):
        """DFS of /Pages with attribute inheritance; yields page dicts
        (reference analog: /root/reference/pdfminer/pdfpage.py:78-113)."""
        if self.catalog is None:
            return
        seen = set()
        emitted = False
        root = self.catalog.get("Pages")
        if root is not None:
            # explicit stack replaces recursion
            stack = [(root, self.catalog)]
            out = []
            while stack:
                (node, parent) = stack.pop()
                if isinstance(node, ObjRef):
                    objid = node.objid
                    if objid in seen:
                        continue
                    seen.add(objid)
                    tree = dict_value(node.resolve({})).copy()
                else:
                    objid = None
                    tree = dict_value(node).copy()
                for k in self.INHERITABLE:
                    if k in parent and k not in tree:
                        tree[k] = parent[k]
                t = str(resolve1(tree.get("Type")))
                if t == "Pages" and "Kids" in tree:
                    kids = list_value(resolve1(tree["Kids"]))
                    for c in reversed(kids):
                        stack.append((c, tree))
                elif t == "Page":
                    out.append((objid, tree))
            for (objid, tree) in out:
                yield self._make_page(objid, tree)
                emitted = True
        if not emitted:
            for xref in self.xrefs:
                for objid in xref.get_objids():
                    try:
                        obj = self.getobj(objid)
                    except ObjectNotFound:
                        continue
                    if isinstance(obj, dict) and str(resolve1(obj.get("Type"))) == "Page":
                        yield self._make_page(objid, obj)

    def _make_page(self, objid, attrs: dict) -> "PdfPage":
        return PdfPage(self, objid, attrs)


class PdfPage:
    """Page attributes + content streams (reference pdfpage.py:20-71)."""

    __slots__ = ("doc", "pageid", "attrs", "resources", "mediabox", "cropbox",
                 "rotate", "contents")

    def __init__(self, doc: PdfDocument, pageid, attrs: dict):
        self.doc = doc
        self.pageid = pageid
        self.attrs = dict_value(attrs)
        self.resources = resolve1(self.attrs.get("Resources", {}))
        self.mediabox = resolve1(self.attrs.get("MediaBox", [0, 0, 612, 792]))
        self.cropbox = resolve1(self.attrs.get("CropBox", self.mediabox))
        self.rotate = (int_value(self.attrs.get("Rotate", 0)) + 360) % 360
        contents = resolve1(self.attrs.get("Contents", []))
        if not isinstance(contents, list):
            contents = [contents]
        self.contents = contents
