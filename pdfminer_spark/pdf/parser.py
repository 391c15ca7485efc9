"""Stack-machine object parser over the token stream.

Composes lexer tokens into PDF values (arrays, dicts, streams, indirect
references). Structure-equivalent to the reference's PSStackParser /
PDFParser pair (/root/reference/pdfminer/psparser.py:512-629,
/root/reference/pdfminer/pdfparser.py:24-177) but rebuilt for in-memory
buffers: stream payloads are sliced directly from the byte buffer instead of
seek/read loops.
"""
from __future__ import annotations

import re

from .lexer import KW_DICT_BEGIN, KW_DICT_END, Lexer, LexerEOF
from .objects import KW, Keyword, Name, ObjRef, Stream, dict_value, int_value

KW_ARRAY_BEGIN = KW(b"[")
KW_ARRAY_END = KW(b"]")
KW_PROC_BEGIN = KW(b"{")
KW_PROC_END = KW(b"}")
KW_R = KW(b"R")
KW_NULL = KW(b"null")
KW_OBJ = KW(b"obj")
KW_ENDOBJ = KW(b"endobj")
KW_STREAM = KW(b"stream")
KW_XREF = KW(b"xref")
KW_STARTXREF = KW(b"startxref")
KW_TRAILER = KW(b"trailer")

_ENDSTREAM = re.compile(rb"endstream")
_EOL_AFTER_STREAM = re.compile(rb"(\r\n|\r|\n)")


class ParserEOF(Exception):
    pass


class StackParser:
    """Generic array/dict composer; subclasses hook bare keywords."""

    def __init__(self, buf: bytes, pos: int = 0):
        self.lexer = Lexer(buf, pos)
        self.buf = buf
        self.reset()

    def reset(self) -> None:
        self.context: list = []
        self.curtype: str | None = None
        self.stack: list = []
        self.results: list = []

    def seek(self, pos: int) -> None:
        self.lexer.seek(pos)
        self.reset()

    def push(self, *items) -> None:
        self.stack.extend(items)

    def pop(self, n: int) -> list:
        if n == 0:
            return []
        items = self.stack[-n:]
        del self.stack[-n:]
        return items

    def popall(self) -> list:
        items = self.stack
        self.stack = []
        return items

    def start_type(self, pos: int, t: str) -> None:
        self.context.append((pos, self.curtype, self.stack))
        self.curtype = t
        self.stack = []

    def end_type(self, t: str):
        if self.curtype != t:
            raise TypeError("type mismatch: %r != %r" % (self.curtype, t))
        objs = [obj for (_, obj) in self.stack]
        (pos, self.curtype, self.stack) = self.context.pop()
        return (pos, objs)

    def flush(self) -> None:
        """At top level between objects; default drops loose values."""

    def add_results(self, *items) -> None:
        self.results.extend(items)

    def do_keyword(self, pos: int, kw: Keyword) -> None:
        """Subclass hook for bare keywords."""

    def next_object(self):
        """Return the next composed (pos, obj)."""
        while not self.results:
            try:
                (pos, token) = self.lexer.next_token()
            except LexerEOF:
                raise ParserEOF from None
            if isinstance(token, Keyword):
                if token is KW_ARRAY_BEGIN:
                    self.start_type(pos, "a")
                elif token is KW_ARRAY_END:
                    try:
                        self.push(self.end_type("a"))
                    except TypeError:
                        pass
                elif token is KW_DICT_BEGIN:
                    self.start_type(pos, "d")
                elif token is KW_DICT_END:
                    try:
                        (dpos, objs) = self.end_type("d")
                        if len(objs) % 2 == 0:
                            d = {}
                            for k in range(0, len(objs), 2):
                                if objs[k + 1] is not None:
                                    d[literal_key(objs[k])] = objs[k + 1]
                            self.push((dpos, d))
                    except TypeError:
                        pass
                elif token is KW_PROC_BEGIN:
                    self.start_type(pos, "p")
                elif token is KW_PROC_END:
                    try:
                        self.push(self.end_type("p"))
                    except TypeError:
                        pass
                else:
                    self.do_keyword(pos, token)
            else:
                self.push((pos, token))
            if not self.context:
                self.flush()
        return self.results.pop(0)

    def iter_objects(self):
        while True:
            try:
                yield self.next_object()
            except ParserEOF:
                return


def literal_key(k) -> str:
    return k if isinstance(k, str) else str(k)


class PdfParser(StackParser):
    """File-level PDF parser: handles R, null, obj/endobj, stream bodies."""

    def __init__(self, buf: bytes, doc=None, pos: int = 0):
        super().__init__(buf, pos)
        self.doc = doc
        self.fallback = False

    def do_keyword(self, pos: int, kw: Keyword) -> None:
        if kw is KW_R:
            try:
                ((_, objid), (_, genno)) = self.pop(2)
                self.push((pos, ObjRef(self.doc, int(objid))))
            except (ValueError, TypeError):
                pass
        elif kw is KW_NULL:
            self.push((pos, None))
        elif kw in (KW_XREF, KW_STARTXREF):
            self.add_results(*self.pop(1))
        elif kw is KW_ENDOBJ:
            self.add_results(*self.pop(4))
        elif kw is KW_STREAM:
            self._read_stream(pos)
        else:
            self.push((pos, kw))

    def _read_stream(self, pos: int) -> None:
        """Slice the stream payload out of the buffer.

        Two modes, matching the reference (pdfparser.py:83-127): in
        ``fallback`` mode (the default once a document is initialized,
        pdfdocument.py:560-564) the declared /Length is ignored and the
        payload runs to the next ``endstream`` keyword — several corpus
        files carry wrong Lengths on purpose; in exact mode (encrypted
        documents, xref streams) /Length is trusted verbatim.
        """
        ((_, attrs),) = self.pop(1)
        attrs = dict_value(attrs)
        buf = self.buf
        # data starts after the EOL that follows the 'stream' keyword
        m = _EOL_AFTER_STREAM.search(buf, pos + 6, pos + 32)
        data_start = m.end() if m else pos + 6
        if self.fallback:
            m2 = _ENDSTREAM.search(buf, data_start)
            if m2 is None:
                data = buf[data_start:]
                resume = len(buf)
            else:
                data = buf[data_start : m2.start()]
                resume = m2.end()
        else:
            declared = int_value(attrs.get("Length"))
            end = data_start + max(declared, 0)
            data = buf[data_start:end]
            m2 = _ENDSTREAM.search(buf, min(end, len(buf)))
            resume = len(buf) if m2 is None else m2.end()
        self.lexer.seek(resume)
        decipher = self.doc.decipher if self.doc is not None else None
        self.push((pos, Stream(attrs, data, decipher)))

    def next_token(self):
        try:
            return self.lexer.next_token()
        except LexerEOF:
            raise ParserEOF from None

    def nextline(self):
        try:
            return self.lexer.nextline()
        except LexerEOF:
            raise ParserEOF from None


class ContentParser(StackParser):
    """Parser for decoded content/ToUnicode/Type1-header streams.

    obj/endobj keywords never appear; every other bare keyword is an
    operator and is surfaced to the caller. At the top level, completed
    values are emitted in order (reference analog PDFStreamParser/
    PDFContentParser flush-everything behavior).
    """

    def __init__(self, buf: bytes, doc=None):
        super().__init__(buf)
        self.doc = doc

    def flush(self) -> None:
        self.add_results(*self.popall())

    def do_keyword(self, pos: int, kw: Keyword) -> None:
        if kw is KW_R:
            try:
                ((_, objid), (_, genno)) = self.pop(2)
                self.push((pos, ObjRef(self.doc, int(objid))))
            except (ValueError, TypeError):
                pass
        elif kw in (KW_OBJ, KW_ENDOBJ):
            return
        else:
            self.push((pos, kw))
