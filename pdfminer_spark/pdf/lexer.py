"""Batched byte-buffer PostScript/PDF tokenizer.

Operates over a whole in-memory payload with regex span scans — there is no
seekable-file chunking because document payloads arrive as single binary
cells of a DataFrame (SURVEY.md §2.1 "buffered lexer" mapping). The produced
token stream is equivalent to the reference tokenizer
(/root/reference/pdfminer/psparser.py:159-507), verified against its
published token corpus in tests/test_lexer.py.

Tokens: int, float, bool, bytes (strings), Name, Keyword, each tagged with
the absolute byte offset of the token start.
"""
from __future__ import annotations

import re

from .objects import KW, Keyword, Name

__all__ = ["Lexer", "LexerEOF", "KW_DICT_BEGIN", "KW_DICT_END"]


class LexerEOF(Exception):
    """End of the token stream."""


_NONSPC = re.compile(rb"\S")
_EOL = re.compile(rb"[\r\n]")
# master-regex fast path for the content-stream hot tokens: one .match
# replaces whitespace skip + dispatch + per-class span scan. Lookaheads
# make every fast match provably identical to the slow scanners: numbers
# must not continue ([0-9] / [0-9.]), names must end at a non-'#'
# delimiter ('#' escapes take the slow path), keywords end at the same
# delimiter class either way. No match -> fall through unchanged.
_FAST = re.compile(
    rb"[ \t\n\r\f\v]*"
    rb"(?:"
    rb"(?P<f>[+-]?(?:[0-9]+\.[0-9]*|\.[0-9]+))(?![0-9])"
    rb"|(?P<i>[+-]?[0-9]+)(?![0-9.])"
    rb"|/(?P<n>[^#/%\[\]()<>{}\s]*)(?=[/%\[\]()<>{}\s]|\Z)"
    rb"|(?P<k>[A-Za-z][^#/%\[\]()<>{}\s]*)"
    # well-formed hex string; '<<' cannot match ('>' required) and falls
    # through to the slow path's dict-begin rule
    rb"|<(?P<h>[0-9a-fA-F \t\n\r\f\v]*)>"
    # escape-free, paren-free literal string: content is byte-literal per
    # PDF 7.3.4.2 (only '\' escapes and nested parens need the slow path)
    rb"|\((?P<s>[^()\\]*)\)"
    # array brackets: the hottest single-byte tokens in TJ-heavy content
    rb"|(?P<b>[\[\]])"
    rb")")
_END_LITERAL = re.compile(rb"[#/%\[\]()<>{}\s]")
_END_NUMBER = re.compile(rb"[^0-9]")
_END_KEYWORD = re.compile(rb"[#/%\[\]()<>{}\s]")
_END_HEX = re.compile(rb"[^\s0-9a-fA-F]")
_END_STRING = re.compile(rb"[()\\]")
_OCTAL = re.compile(rb"[0-7]{1,3}")
_HEXDIG = re.compile(rb"[0-9a-fA-F]{1,2}")
_WS_IN_HEX = re.compile(rb"\s")


def _hexbytes(digits: bytes) -> bytes:
    """Hex digits -> bytes; an odd trailing digit keeps its LOW-nibble
    value (reference nibble-accumulator behavior, psparser.py hex scan)."""
    from binascii import unhexlify

    if len(digits) % 2:
        return unhexlify(digits[:-1]) + bytes((int(digits[-1:], 16),))
    return unhexlify(digits)

_STR_ESC = {
    0x62: b"\x08",  # \b
    0x74: b"\x09",  # \t
    0x6E: b"\x0a",  # \n
    0x66: b"\x0c",  # \f
    0x72: b"\x0d",  # \r
    0x28: b"(",
    0x29: b")",
    0x5C: b"\\",
}

KW_DICT_BEGIN = KW(b"<<")
KW_DICT_END = KW(b">>")
KW_ARRAY_BEGIN = KW(b"[")
KW_ARRAY_END = KW(b"]")
KW_PROC_BEGIN = KW(b"{")
KW_PROC_END = KW(b"}")


class Lexer:
    """Tokenizer over an immutable bytes buffer with an explicit cursor."""

    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def seek(self, pos: int) -> None:
        self.pos = pos

    def tell(self) -> int:
        return self.pos

    # -- line-oriented access (xref tables are line-structured) -------------
    def nextline(self) -> tuple[int, bytes]:
        buf, i = self.buf, self.pos
        if i >= len(buf):
            raise LexerEOF("EOF in nextline")
        m = _EOL.search(buf, i)
        if m is None:
            self.pos = len(buf)
            return (i, buf[i:])
        j = m.end()
        if buf[j - 1 : j] == b"\r" and buf[j : j + 1] == b"\n":
            j += 1
        self.pos = j
        return (i, buf[i:j])

    # -- token scanning ------------------------------------------------------
    def next_token(self) -> tuple[int, object]:
        """Return (pos, token); raises LexerEOF at end of buffer."""
        buf = self.buf
        n = len(buf)
        i = self.pos
        m = _FAST.match(buf, i)
        if m is not None:
            self.pos = m.end()
            # each _FAST alternative carries exactly one named group, so
            # lastgroup IS the matched branch — one attribute read instead
            # of probing up to 7 groups per token
            which = m.lastgroup
            g = m.group(which)
            if which == "i":
                return (m.start("i"), int(g))
            if which == "f":
                return (m.start("f"), float(g))
            if which == "n":
                try:
                    text = g.decode("utf-8")
                except UnicodeDecodeError:
                    text = ""
                return (m.start("n") - 1, Name(text))
            if which == "k":
                if g == b"true":
                    return (m.start("k"), True)
                if g == b"false":
                    return (m.start("k"), False)
                return (m.start("k"), KW(g))
            if which == "s":
                return (m.start("s") - 1, g)
            if which == "b":
                return (m.start("b"),
                        KW_ARRAY_BEGIN if g == b"[" else KW_ARRAY_END)
            return (m.start("h") - 1, _hexbytes(_WS_IN_HEX.sub(b"", g)))
        while True:
            m = _NONSPC.search(buf, i)
            if m is None:
                self.pos = n
                raise LexerEOF("EOF in next_token")
            j = m.start()
            c = buf[j]
            if c == 0x25:  # '%' comment: skip to EOL, keep scanning
                m2 = _EOL.search(buf, j + 1)
                i = n if m2 is None else m2.start()
                if m2 is None:
                    self.pos = n
                    raise LexerEOF("EOF in comment")
                continue
            break

        if c == 0x2F:  # '/'
            return self._scan_name(j)
        if c in b"+-" or 0x30 <= c <= 0x39:
            return self._scan_number(j)
        if c == 0x2E:  # '.'
            return self._scan_float(j, j + 1, b".")
        if (0x41 <= c <= 0x5A) or (0x61 <= c <= 0x7A):
            return self._scan_keyword(j)
        if c == 0x28:  # '('
            return self._scan_string(j)
        if c == 0x3C:  # '<'
            if buf[j + 1 : j + 2] == b"<":
                self.pos = j + 2
                return (j, KW_DICT_BEGIN)
            return self._scan_hexstring(j)
        if c == 0x3E:  # '>'
            if buf[j + 1 : j + 2] == b">":
                self.pos = j + 2
                return (j, KW_DICT_END)
            # lone '>' is swallowed (terminator of a hex string)
            self.pos = j + 1
            return self.next_token()
        self.pos = j + 1
        return (j, KW(buf[j : j + 1]))

    def _scan_name(self, start: int) -> tuple[int, object]:
        buf = self.buf
        parts = []
        i = start + 1
        while True:
            m = _END_LITERAL.search(buf, i)
            if m is None:
                parts.append(buf[i:])
                i = len(buf)
                break
            k = m.start()
            parts.append(buf[i:k])
            if buf[k] == 0x23:  # '#' hex escape: up to two hex digits
                h = _HEXDIG.match(buf, k + 1)
                if h:
                    parts.append(bytes([int(h.group(), 16)]))
                    i = h.end()
                else:
                    i = k + 1
                continue
            i = k
            break
        self.pos = i
        raw = b"".join(parts)
        try:
            text = raw.decode("utf-8")
        except UnicodeDecodeError:
            text = ""
        return (start, Name(text))

    def _scan_number(self, start: int) -> tuple[int, object]:
        buf = self.buf
        m = _END_NUMBER.search(buf, start + 1)
        if m is None:
            end = len(buf)
        else:
            end = m.start()
            if buf[end : end + 1] == b".":
                return self._scan_float(start, end + 1, buf[start : end + 1])
        self.pos = end
        try:
            return (start, int(buf[start:end]))
        except ValueError:
            # bare sign with no digits: token silently dropped
            return self.next_token()

    def _scan_float(self, start: int, i: int, head: bytes) -> tuple[int, object]:
        buf = self.buf
        m = _END_NUMBER.search(buf, i)
        end = len(buf) if m is None else m.start()
        self.pos = end
        try:
            return (start, float(head + buf[i:end]))
        except ValueError:
            return self.next_token()

    def _scan_keyword(self, start: int) -> tuple[int, object]:
        buf = self.buf
        m = _END_KEYWORD.search(buf, start + 1)
        end = len(buf) if m is None else m.start()
        self.pos = end
        tok = buf[start:end]
        if tok == b"true":
            return (start, True)
        if tok == b"false":
            return (start, False)
        return (start, KW(tok))

    def _scan_string(self, start: int) -> tuple[int, object]:
        buf = self.buf
        n = len(buf)
        parts = []
        depth = 1
        i = start + 1
        while True:
            m = _END_STRING.search(buf, i)
            if m is None:
                parts.append(buf[i:])
                i = n
                break
            k = m.start()
            parts.append(buf[i:k])
            c = buf[k]
            if c == 0x5C:  # backslash escape
                o = _OCTAL.match(buf, k + 1)
                if o:
                    try:
                        parts.append(bytes([int(o.group(), 8)]))
                    except ValueError:
                        pass
                    i = o.end()
                    continue
                e = buf[k + 1 : k + 2]
                if not e:
                    i = n
                    break
                sub = _STR_ESC.get(e[0])
                if sub is not None:
                    parts.append(sub)
                # unknown escapes (incl. backslash-newline) drop both bytes
                i = k + 2
                continue
            if c == 0x28:  # nested '('
                depth += 1
                parts.append(b"(")
                i = k + 1
                continue
            depth -= 1
            if depth:
                parts.append(b")")
                i = k + 1
                continue
            i = k + 1
            break
        self.pos = i
        return (start, b"".join(parts))

    def _scan_hexstring(self, start: int) -> tuple[int, object]:
        buf = self.buf
        m = _END_HEX.search(buf, start + 1)
        end = len(buf) if m is None else m.start()
        self.pos = end  # terminator '>' is consumed by next_token's '>' rule
        digits = _WS_IN_HEX.sub(b"", buf[start + 1 : end])
        return (start, _hexbytes(digits))

    # -- reverse scan (trailer discovery) ------------------------------------
    def reverse_lines(self):
        """Yield lines from the end of the buffer backwards
        (reference analog: /root/reference/pdfminer/psparser.py:252-275)."""
        buf = self.buf
        end = len(buf)
        while end > 0:
            nl = max(buf.rfind(b"\r", 0, end), buf.rfind(b"\n", 0, end))
            if nl < 0:
                yield buf[:end]
                return
            yield buf[nl:end]
            end = nl
