"""Tagged-content extraction + object census (the reference's TagExtractor
and dumppdf.py analogs, pdfdevice.py:129-183 and tools/dumppdf.py:32-118).

No goldens exist for these in the reference corpus; output shape follows
the reference's structure (tags as XML elements, census as one row per
object) and is pinned by our own unit tests.
"""
from __future__ import annotations

from .document import ObjectNotFound, PdfDocument
from .fonts import UnicodeNotDefined
from .interp import Interpreter, ResourceCache
from .objects import (Name, ObjRef, Stream, dict_value, list_value, resolve1,
                      bytes_value)
from .xmlout import q


class TagInterpreter(Interpreter):
    """Interpreter variant that renders marked-content structure instead
    of layout: BMC/BDC open tags, EMC closes, text flows between them."""

    def __init__(self, rsrc: ResourceCache):
        super().__init__(rsrc, laparams=None, collect_shapes=False)
        self.out: list[str] = []
        self._tag_stack: list = []
        self._dispatch = _TAG_DISPATCH  # consumed by Interpreter.execute

    # text: decoded unicode only (undefined cids skipped)
    def render_string(self, seq) -> None:
        font = self.textstate.font
        text = []
        for obj in seq:
            if not isinstance(obj, bytes):
                continue
            for cid in font.decode(obj):
                try:
                    text.append(font.to_unichr(cid))
                except UnicodeNotDefined:
                    pass
        self.out.append(q("".join(text)))

    def _props_str(self, props) -> str:
        props = resolve1(props)
        if not isinstance(props, dict):
            return ""
        return "".join(' %s="%s"' % (q(str(k)), q(_fmt_value(v)))
                       for (k, v) in sorted(props.items(), key=lambda kv: str(kv[0])))

    def _begin_tag(self, tag, props=None) -> None:
        name = str(tag) if isinstance(tag, Name) else str(tag)
        self.out.append("<%s%s>" % (q(name), self._props_str(props)))
        self._tag_stack.append(name)

    def _end_tag(self) -> None:
        if self._tag_stack:
            name = self._tag_stack.pop()
            self.out.append("</%s>" % q(name))

    def op_BMC(self, tag):
        self._begin_tag(tag)

    def op_BDC(self, tag, props):
        self._begin_tag(tag, props)

    def op_EMC(self):
        self._end_tag()

    def op_MP(self, tag):
        self._begin_tag(tag)
        self._tag_stack.pop()

    def op_DP(self, tag, props):
        self._begin_tag(tag, props)
        self._tag_stack.pop()

    def process_page_tags(self, page, pageno: int) -> None:
        (x0, y0, x1, y1) = [float(v) for v in page.mediabox]
        self.out.append('<page id="%s" bbox="%.3f,%.3f,%.3f,%.3f" rotate="%d">'
                        % (pageno, x0, y0, x1, y1, page.rotate))
        ctm = (1, 0, 0, 1, -x0, -y0)
        from .layout import Page

        self.cur_item = Page(pageno, (0, 0, x1 - x0, y1 - y0))
        self.render_contents(page.resources, page.contents, ctm)
        self.out.append("</page>\n")


def _fmt_value(v) -> str:
    v = resolve1(v)
    if isinstance(v, Name):
        return str(v)
    if isinstance(v, bytes):
        return v.decode("latin-1")
    return str(v)


# register the tag operators in the dispatch table for TagInterpreter
import pdfminer_spark.pdf.interp as _interp  # noqa: E402

_TAG_DISPATCH = dict(_interp._DISPATCH)
_TAG_DISPATCH.update({
    b"BMC": (1, TagInterpreter.op_BMC),
    b"BDC": (2, TagInterpreter.op_BDC),
    b"EMC": (0, TagInterpreter.op_EMC),
    b"MP": (1, TagInterpreter.op_MP),
    b"DP": (2, TagInterpreter.op_DP),
})


def extract_tags(data: bytes, password: bytes = b"", page_numbers=None,
                 maxpages: int = 0) -> str:
    """Tagged-content stream of the document (TagExtractor analog)."""
    from .extract import open_pages

    rsrc = ResourceCache()
    interp = TagInterpreter(rsrc)
    for (pageno, page) in enumerate(
            open_pages(data, password=password, page_numbers=None)):
        if page_numbers is not None and pageno not in page_numbers:
            continue
        interp.process_page_tags(page, pageno)
        if maxpages and maxpages <= pageno + 1:
            break
    return "".join(interp.out)


def object_census(data: bytes, password: bytes = b"") -> list[dict]:
    """One row per reachable object: (objid, type, size) — the dumppdf
    object-walk as a diagnostics frame (corpus QA)."""
    doc = PdfDocument(data, password=password)
    rows = []
    seen = set()
    for xref in doc.xrefs:
        for objid in xref.get_objids():
            if objid in seen:
                continue
            seen.add(objid)
            try:
                obj = doc.getobj(objid)
            except ObjectNotFound:
                continue
            if isinstance(obj, Stream):
                t = "stream"
                size = len(obj.rawdata or b"")
            elif isinstance(obj, dict):
                t = "dict"
                size = len(obj)
            elif isinstance(obj, list):
                t = "list"
                size = len(obj)
            elif isinstance(obj, Name):
                t = "name"
                size = len(str(obj))
            elif isinstance(obj, bytes):
                t = "string"
                size = len(obj)
            elif isinstance(obj, bool):
                t = "bool"
                size = 1
            elif isinstance(obj, (int, float)):
                t = "number"
                size = 1
            elif obj is None:
                t = "null"
                size = 0
            else:
                t = type(obj).__name__
                size = 0
            rows.append({"objid": objid, "type": t, "size": size})
    return rows


def lookup_name_tree(doc: PdfDocument, cat: str, key: bytes):
    """Name-tree (B-tree) search with /Limits pruning
    (reference pdfdocument.py:715-752)."""
    catalog = doc.catalog or {}
    names = dict_value(resolve1(catalog.get("Names")))
    if cat not in names:
        raise KeyError((cat, key))
    def lookup(d):
        d = dict_value(resolve1(d))
        if "Limits" in d:
            (k1, k2) = [bytes_value(resolve1(x))
                        for x in list_value(resolve1(d["Limits"]))[:2]]
            if key < k1 or k2 < key:
                return None
        if "Names" in d:
            pairs = list_value(resolve1(d["Names"]))
            table = {bytes_value(resolve1(pairs[i])): pairs[i + 1]
                     for i in range(0, len(pairs) - 1, 2)}
            return table.get(key)
        if "Kids" in d:
            for c in list_value(resolve1(d["Kids"])):
                v = lookup(c)
                if v is not None:
                    return v
        return None

    v = lookup(names[cat])
    if v is None:
        raise KeyError((cat, key))
    return v


def get_dest(doc: PdfDocument, name: bytes):
    """Named-destination resolution: name tree (PDF 1.2+) with the
    catalog /Dests dict fallback (reference pdfdocument.py:740-752)."""
    try:
        return resolve1(lookup_name_tree(doc, "Dests", name))
    except KeyError:
        pass
    dests = dict_value(resolve1((doc.catalog or {}).get("Dests", {})))
    key = name.decode("latin-1")
    if key not in dests:
        raise KeyError(name)
    return resolve1(dests[key])


def extract_embedded_files(data: bytes, password: bytes = b"") -> list[dict]:
    """Embedded-file attachments (dumppdf -E analog,
    tools/dumppdf.py:166-198): every /Filespec with an /EF payload."""
    doc = PdfDocument(data, password=password)
    out = []
    seen = set()
    for xref in doc.xrefs:
        for objid in xref.get_objids():
            if objid in seen:
                continue
            seen.add(objid)
            try:
                obj = doc.getobj(objid)
            except Exception:
                continue
            if not isinstance(obj, dict):
                continue
            if str(resolve1(obj.get("Type"))) != "Filespec":
                continue
            ef = dict_value(resolve1(obj.get("EF", {})))
            strm = ef.get("F") or ef.get("UF")
            if strm is None:
                continue
            from .objects import stream_value

            payload = stream_value(resolve1(strm)).get_data()
            fname = resolve1(obj.get("UF") or obj.get("F") or b"")
            if isinstance(fname, bytes):
                fname = fname.decode("latin-1")
            out.append({"objid": objid, "filename": str(fname),
                        "payload": payload})
    return out


def iter_outlines(doc: PdfDocument):
    """Yield (level, title, raw dest, raw action) from the outline tree
    (reference pdfdocument.py:693-713, which also yields the action)."""
    from .lexer import LexerEOF
    from .parser import ParserEOF

    catalog = doc.catalog or {}
    if "Outlines" not in catalog:
        return

    def decode_text(s: bytes) -> str:
        if s.startswith(b"\xfe\xff"):
            return s[2:].decode("utf-16be", "ignore")
        return s.decode("latin-1")

    def search(entry, level):
        entry = dict_value(resolve1(entry))
        if "Title" in entry and ("A" in entry or "Dest" in entry):
            title = decode_text(bytes_value(resolve1(entry["Title"])))
            yield (level, title, entry.get("Dest"), entry.get("A"))
        if "First" in entry and "Last" in entry:
            yield from search(entry["First"], level + 1)
        if "Next" in entry:
            yield from search(entry["Next"], level)

    try:
        yield from search(catalog["Outlines"], 0)
    except (ParserEOF, LexerEOF, RecursionError):
        return


def get_outlines(data: bytes, password: bytes = b""):
    """Yield (level, title, dest) from the document outline tree."""
    doc = PdfDocument(data, password=password)
    for (level, title, dest, _a) in iter_outlines(doc):
        yield (level, title, resolve1(dest))
