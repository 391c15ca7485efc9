"""dumppdf analog: XML dump of raw PDF object structure.

Byte-parity port of the reference's debug tool surface (reference
tools/dumppdf.py:20-110 dumpxml/dumptrailers/dumpallobjs): same element
names, same escaping (&#NN; for control/non-ASCII/&<>"), same object
iteration (xref discovery order, first xref listing an objid wins).
``tests/test_dump.py`` pins byte equality against the live reference
tool over the sample corpus.

The reference's ``-T`` outline mode crashes with a NameError on any
document that actually has outlines (dumppdf.py:152 formats an
undefined variable); ours emits the same <outlines> structure without
the crash, so -T parity holds on outline-less documents and ours keeps
working past that.
"""
from __future__ import annotations

from io import StringIO

from .document import ObjectNotFound, PdfDocument
from .objects import Keyword, Name, ObjRef, Stream

_ESCAPE = set(map(ord, '&<>"'))


def _encode(data: bytes) -> str:
    buf = StringIO()
    for b in data:
        if b < 32 or 127 <= b or b in _ESCAPE:
            buf.write("&#%d;" % b)
        else:
            buf.write(chr(b))
    return buf.getvalue()


def dumpxml(out, obj, mode: str | None = None) -> None:
    """Serialize one object tree (reference dumppdf.py:32-90)."""
    if obj is None:
        out.write("<null />")
        return
    if isinstance(obj, dict):
        out.write('<dict size="%d">\n' % len(obj))
        for (k, v) in obj.items():
            out.write("<key>%s</key>\n" % k)
            out.write("<value>")
            dumpxml(out, v)
            out.write("</value>\n")
        out.write("</dict>")
        return
    if isinstance(obj, list):
        out.write('<list size="%d">\n' % len(obj))
        for v in obj:
            dumpxml(out, v)
            out.write("\n")
        out.write("</list>")
        return
    if isinstance(obj, Keyword):
        out.write("<keyword>%s</keyword>" % obj.decode("latin-1"))
        return
    if isinstance(obj, bytes):
        out.write('<string size="%d">%s</string>' % (len(obj), _encode(obj)))
        return
    if isinstance(obj, Stream):
        if mode == "raw":
            out.write(obj.rawdata.decode("latin-1"))
            return
        if mode == "binary":
            out.write(obj.get_data().decode("latin-1"))
            return
        out.write("<stream>\n<props>\n")
        dumpxml(out, obj.attrs)
        out.write("\n</props>\n")
        if mode == "text":
            data = obj.get_data()
            out.write('<data size="%d">%s</data>\n' % (len(data), _encode(data)))
        out.write("</stream>")
        return
    if isinstance(obj, ObjRef):
        out.write('<ref id="%d" />' % obj.objid)
        return
    if isinstance(obj, Name):
        out.write("<literal>%s</literal>" % obj)
        return
    if isinstance(obj, (int, float)):  # includes bool, as the reference's
        out.write("<number>%s</number>" % obj)  # isnumber() does
        return
    raise TypeError(obj)


def dumptrailers(out, doc: PdfDocument) -> None:
    for xref in doc.xrefs:
        out.write("<trailer>\n")
        dumpxml(out, xref.get_trailer())
        out.write("\n</trailer>\n\n")


def dumpallobjs(out, doc: PdfDocument, mode: str | None = None) -> None:
    visited = set()
    out.write("<pdf>")
    for xref in doc.xrefs:
        for objid in xref.get_objids():
            if objid in visited:
                continue
            visited.add(objid)
            try:
                obj = doc.getobj(objid)
                if obj is None:
                    continue
                out.write('<object id="%d">\n' % objid)
                dumpxml(out, obj, mode=mode)
                out.write("\n</object>\n\n")
            except ObjectNotFound:
                pass
    dumptrailers(out, doc)
    out.write("</pdf>")


def dumpoutline(out, data: bytes, password: bytes = b"") -> None:
    """<outlines> dump with resolved destinations and page numbers, as the
    reference intends (tools/dumppdf.py:120-163 — its own implementation
    NameErrors on non-empty outlines, so there is no byte-parity target;
    the <dest>/<pageno> structure follows its code path exactly)."""
    from .objects import Name, resolve1
    from .tags import get_dest, iter_outlines
    from .xmlout import q

    doc = PdfDocument(data, password=password)
    items = list(iter_outlines(doc))
    if not items:
        return
    pages = {page.pageid: pageno
             for (pageno, page) in enumerate(doc.get_pages())}

    def resolve_dest(dest):
        dest = resolve1(dest)
        if isinstance(dest, bytes):
            dest = resolve1(get_dest(doc, dest))
        elif isinstance(dest, Name):
            dest = resolve1(get_dest(doc, dest.encode("latin-1")))
        if isinstance(dest, dict):
            dest = dest["D"]
        return dest

    def page_of(dest):
        try:
            return pages[resolve1(dest)[0].objid]
        except (KeyError, AttributeError, IndexError, TypeError):
            return None

    out.write("<outlines>\n")
    for (level, title, dest, action) in items:
        pageno = None
        # truthiness, as the reference tests it (tools/dumppdf.py:141,144):
        # an EMPTY dest (empty array/string) falls through to the
        # GoTo-action branch instead of emitting an empty <dest> (ADVICE r4)
        if dest:
            try:
                dest = resolve_dest(dest)
            except KeyError:
                dest = None
            pageno = page_of(dest)
        elif action:
            action = resolve1(action)
            # truthiness, not `is not None`: the reference
            # (tools/dumppdf.py:148) skips an empty /D array/string
            if isinstance(action, dict) and \
                    str(resolve1(action.get("S"))) == "GoTo" and \
                    action.get("D"):
                try:
                    dest = resolve_dest(action["D"])
                except KeyError:
                    dest = None
                pageno = page_of(dest)
        out.write('<outline level="%r" title="%s">\n' % (level, q(title)))
        if dest is not None:
            out.write("<dest>")
            dumpxml(out, dest)
            out.write("</dest>\n")
        if pageno is not None:
            out.write("<pageno>%r</pageno>\n" % pageno)
        out.write("</outline>\n")
    out.write("</outlines>\n")


def dump_pdf(data: bytes, password: bytes = b"", objids=(), pagenos=(),
             dumpall: bool = False, mode: str | None = None) -> str:
    """High-level entry mirroring the reference tool's dumppdf()
    dispatch; returns the dump text."""
    out = StringIO()
    doc = PdfDocument(data, password=password)
    # the reference constructs its document with fallback=True, which
    # ALWAYS appends an eager full-file fallback scan (and its trailer)
    # to doc.xrefs (pdfdocument.py:561-565); the engine proper defers
    # that scan until a lookup misses, but the dump tool reproduces the
    # reference's eager view for byte parity
    doc._run_fallback_scan()
    if objids:
        for objid in objids:
            dumpxml(out, doc.getobj(objid), mode=mode)
    if pagenos:
        pagenos = set(pagenos)
        for (pageno, page) in enumerate(doc.get_pages()):
            if pageno in pagenos:
                if mode is not None:
                    from .objects import resolve1, stream_value
                    for obj in page.contents:
                        dumpxml(out, stream_value(resolve1(obj)), mode=mode)
                else:
                    dumpxml(out, page.attrs)
    if dumpall:
        dumpallobjs(out, doc, mode=mode)
    if not objids and not pagenos and not dumpall:
        dumptrailers(out, doc)
    if mode not in ("raw", "binary"):
        out.write("\n")
    return out.getvalue()


def extract_embedded_to_dir(data: bytes, extractdir: str,
                            password: bytes = b"") -> list[str]:
    """dumppdf -O: write every /Filespec attachment into ``extractdir``
    (reference tools/dumppdf.py:166-198). Reference file semantics kept:
    basename() of the declared name, refuse to overwrite an existing
    file. Divergences from the reference's py3-broken implementation
    (documented): ``UF`` is optional (its ``obj['UF']`` KeyErrors), and
    the name is decoded to str (its bytes/str os.path.join TypeErrors)."""
    import os

    from .tags import extract_embedded_files

    os.makedirs(extractdir, exist_ok=True)
    written = []
    for row in extract_embedded_files(data, password=password):
        filename = os.path.basename(row["filename"])
        path = os.path.join(extractdir, filename)
        if os.path.exists(path):
            raise IOError("file exists: %r" % path)
        with open(path, "wb") as fp:
            fp.write(row["payload"])
        written.append(filename)
    return written
