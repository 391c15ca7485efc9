"""Document-level extraction entry points (the in-UDF top level).

``extract_text`` reproduces the reference's ``pdf2txt.py -t text`` output:
per-box text in reading order, '\\n' after each box, '\\f' after each page
(/root/reference/pdfminer/converter.py:155-196). ``extract_pages`` returns
the analyzed layout tree for span-level consumers (the XML/box outputs).
"""
from __future__ import annotations

from .document import PdfDocument
from .interp import Interpreter, ResourceCache
from .layout import Anno, Char, Container, Figure, LAParams, Page, TextBox


class ExtractionNotAllowed(Exception):
    pass


def open_pages(data: bytes, password: bytes = b"", page_numbers=None,
               maxpages: int = 0, check_extractable: bool = True,
               caching: bool = True):
    """Yield raw (un-interpreted) PdfPage objects."""
    doc = PdfDocument(data, password=password, caching=caching)
    if check_extractable and not doc.is_extractable:
        raise ExtractionNotAllowed("text extraction is not allowed")
    for (pageno, page) in enumerate(doc.get_pages()):
        if page_numbers is not None and pageno not in page_numbers:
            continue
        yield page
        if maxpages and maxpages <= pageno + 1:
            break


_DEFAULT_LA = object()


def extract_pages(data: bytes, password: bytes = b"", page_numbers=None,
                  maxpages: int = 0, laparams=_DEFAULT_LA,
                  collect_shapes: bool = True, rotation: int = 0,
                  caching: bool = True) -> list[Page]:
    """Parse + interpret + layout-analyze; returns Page layout trees.

    Pass ``laparams=None`` explicitly to skip layout analysis entirely
    (the reference's ``-n`` flag: raw chars in emission order).
    ``rotation`` adds to each page's /Rotate before interpretation
    (reference pdf2txt.py:110 ``page.rotate = (page.rotate+rotation)%360``);
    ``caching=False`` disables the object/font memo tables (reference
    ``-C``, a perf toggle with identical output)."""
    if laparams is _DEFAULT_LA:
        laparams = LAParams()
    rsrc = ResourceCache(caching=caching)
    interp = Interpreter(rsrc, laparams, collect_shapes=collect_shapes)
    pages = []
    for page in open_pages(data, password=password, page_numbers=page_numbers,
                           maxpages=maxpages, caching=caching):
        if rotation:
            page.rotate = (page.rotate + rotation) % 360
        pages.append(interp.process_page(page))
    return pages


def render_text(item, out: list) -> None:
    """Depth-first text emission (reference TextConverter.receive_layout)."""
    if isinstance(item, Container):
        for child in item.objs:
            render_text(child, out)
    elif isinstance(item, (Char, Anno)):
        out.append(item.get_text())
    if isinstance(item, TextBox):
        out.append("\n")


def extract_text(data: bytes, password: bytes = b"", page_numbers=None,
                 maxpages: int = 0, laparams=_DEFAULT_LA, rotation: int = 0,
                 caching: bool = True, pages=None) -> str:
    """Full text of the selected pages, golden-compatible with pdf2txt.py.

    ``pages`` short-circuits parsing with pre-analyzed Page trees (the CLI
    ``-O`` path renders text and exports images from one interpretation)."""
    out: list[str] = []
    # shapes are never emitted as text: skip collecting them (the
    # reference's TextConverter.paint_path no-op memory optimization)
    if pages is None:
        pages = extract_pages(data, password=password,
                              page_numbers=page_numbers, maxpages=maxpages,
                              laparams=laparams, collect_shapes=False,
                              rotation=rotation, caching=caching)
    for page in pages:
        render_text(page, out)
        out.append("\f")
    return "".join(out)
