"""PDF/PostScript object model.

Token and object value types produced by the lexer/parser. The design is
deliberately lightweight: PDF names are a ``str`` subclass (so they key
dictionaries naturally), keywords are a ``bytes`` subclass distinguished by
type, and indirect references carry only the object id (generation numbers
are irrelevant for lookup, matching the reference's behavior —
/root/reference/pdfminer/pdftypes.py:51-69).
"""
from __future__ import annotations


class Name(str):
    """A PDF name object (``/Foo``). Subclasses str so it can key dicts."""

    __slots__ = ()

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return "/" + str.__str__(self)


class Keyword(bytes):
    """A bare keyword token (operators, ``obj``, ``R``, ...)."""

    __slots__ = ()

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return "KW:" + bytes.__repr__(self)[1:]


_KW_CACHE: dict[bytes, Keyword] = {}


def KW(b: bytes) -> Keyword:
    """Intern a keyword so identity comparison works."""
    kw = _KW_CACHE.get(b)
    if kw is None:
        kw = _KW_CACHE[b] = Keyword(b)
    return kw


class ObjRef:
    """Indirect object reference; resolved against a Document.

    Spark-framing: this is the foreign key of the in-UDF hash join between
    references and the xref-indexed object store (SURVEY.md §2.3).
    """

    __slots__ = ("doc", "objid")

    def __init__(self, doc, objid: int):
        self.doc = doc
        self.objid = objid

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return "<ref:%d>" % self.objid

    def resolve(self, default=None):
        try:
            return self.doc.getobj(self.objid)
        except Exception:
            return default


def resolve1(x, default=None):
    """Follow indirect references one level (loops bounded)."""
    seen = 0
    while isinstance(x, ObjRef):
        x = x.resolve(default=default)
        seen += 1
        if seen > 64:
            return default
    return x


def resolve_all(x, default=None):
    x = resolve1(x, default)
    if isinstance(x, list):
        return [resolve_all(v, default) for v in x]
    if isinstance(x, dict):
        return {k: resolve_all(v, default) for (k, v) in x.items()}
    return x


def decipher_all(decipher, objid, genno, x):
    """Apply a decryption callback to every string in a parsed object."""
    if isinstance(x, bytes) and not isinstance(x, Keyword):
        return decipher(objid, genno, x)
    if isinstance(x, list):
        return [decipher_all(decipher, objid, genno, v) for v in x]
    if isinstance(x, dict):
        return {k: decipher_all(decipher, objid, genno, v) for (k, v) in x.items()}
    return x


# ---------------------------------------------------------------------------
# Lenient type coercions (CAST ... with defaults; reference:
# /root/reference/pdfminer/pdftypes.py:114-174). Never raise.

def int_value(x) -> int:
    x = resolve1(x)
    return x if isinstance(x, int) and not isinstance(x, bool) else 0


def num_value(x):
    x = resolve1(x)
    return x if isinstance(x, (int, float)) and not isinstance(x, bool) else 0


def bytes_value(x) -> bytes:
    x = resolve1(x)
    return x if isinstance(x, bytes) else b""


def list_value(x) -> list:
    x = resolve1(x)
    return x if isinstance(x, (list, tuple)) else []


def dict_value(x) -> dict:
    x = resolve1(x)
    return x if isinstance(x, dict) else {}


def literal_name(x) -> str:
    return x if isinstance(x, str) else str(x)


class Stream:
    """A PDF stream: attribute dict + raw payload, decoded lazily."""

    __slots__ = ("attrs", "rawdata", "decipher", "_data", "objid", "genno")

    def __init__(self, attrs: dict, rawdata: bytes, decipher=None):
        self.attrs = attrs
        self.rawdata = rawdata
        self.decipher = decipher
        self._data = None
        self.objid = None
        self.genno = None

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return "<stream(%r) raw=%d %r>" % (
            self.objid,
            len(self.rawdata or b""),
            self.attrs,
        )

    def __contains__(self, name):
        return name in self.attrs

    def __getitem__(self, name):
        return self.attrs[name]

    def get(self, name, default=None):
        return self.attrs.get(name, default)

    def get_any(self, names, default=None):
        for name in names:
            if name in self.attrs:
                return self.attrs[name]
        return default

    def get_data(self) -> bytes:
        if self._data is None:
            from .filters import decode_stream

            data = self.rawdata
            if self.decipher:
                data = self.decipher(self.objid, self.genno, data, self.attrs)
            self._data = decode_stream(self.attrs, data)
        return self._data


def stream_value(x) -> Stream:
    x = resolve1(x)
    return x if isinstance(x, Stream) else Stream({}, b"")
