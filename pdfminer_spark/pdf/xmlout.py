"""XML layout serialization — golden-compatible with ``pdf2txt.py -t xml``
(reference converter.py:396-501). The %.3f bbox formatting and the raw/
escaped text distinction are observable in samples/*.xml.ref, so both are
reproduced exactly (CPython %-formatting, not Spark format_number).
"""
from __future__ import annotations

import re

from .layout import (Anno, Char, Container, Figure, ImageItem, Page, Shape,
                     TextBox, TextBoxV, TextGroup, TextLine)

_CONTROL = re.compile(r"[\x00-\x08\x0b-\x0c\x0e-\x1f]")


def q(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;"))


def bbox2str(bbox) -> str:
    (x0, y0, x1, y1) = bbox
    return "%.3f,%.3f,%.3f,%.3f" % (x0, y0, x1, y1)


def _show_group(item, out: list) -> None:
    if isinstance(item, TextBox):
        out.append('<textbox id="%d" bbox="%s" />\n'
                   % (item.index, bbox2str(item.bbox)))
    elif isinstance(item, TextGroup):
        out.append('<textgroup bbox="%s">\n' % bbox2str(item.bbox))
        for child in item.objs:
            _show_group(child, out)
        out.append("</textgroup>\n")


def _render(item, out: list, stripcontrol: bool) -> None:
    if isinstance(item, Page):
        out.append('<page id="%s" bbox="%s" rotate="%d">\n'
                   % (item.pageid, bbox2str(item.bbox), item.rotate))
        for child in item.objs:
            _render(child, out, stripcontrol)
        if item.groups is not None:
            out.append("<layout>\n")
            for group in item.groups:
                _show_group(group, out)
            out.append("</layout>\n")
        out.append("</page>\n")
    elif isinstance(item, Shape):
        if item.kind == "line":
            out.append('<line linewidth="%d" bbox="%s" />\n'
                       % (item.linewidth, bbox2str(item.bbox)))
        elif item.kind == "rect":
            out.append('<rect linewidth="%d" bbox="%s" />\n'
                       % (item.linewidth, bbox2str(item.bbox)))
        else:
            pts = ",".join("%.3f,%.3f" % p for p in item.pts)
            out.append('<curve linewidth="%d" bbox="%s" pts="%s"/>\n'
                       % (item.linewidth, bbox2str(item.bbox), pts))
    elif isinstance(item, Figure):
        out.append('<figure name="%s" bbox="%s">\n'
                   % (item.name, bbox2str(item.bbox)))
        for child in item.objs:
            _render(child, out, stripcontrol)
        out.append("</figure>\n")
    elif isinstance(item, TextLine):
        out.append('<textline bbox="%s">\n' % bbox2str(item.bbox))
        for child in item.objs:
            _render(child, out, stripcontrol)
        out.append("</textline>\n")
    elif isinstance(item, TextBox):
        wmode = ' wmode="vertical"' if isinstance(item, TextBoxV) else ""
        out.append('<textbox id="%d" bbox="%s"%s>\n'
                   % (item.index, bbox2str(item.bbox), wmode))
        for child in item.objs:
            _render(child, out, stripcontrol)
        out.append("</textbox>\n")
    elif isinstance(item, Char):
        text = item.get_text()
        if stripcontrol:
            text = _CONTROL.sub("", text)
        out.append('<text font="%s" bbox="%s" size="%.3f">%s</text>\n'
                   % (q(item.fontname), bbox2str(item.bbox), item.size,
                      q(text)))
    elif isinstance(item, Anno):
        out.append("<text>%s</text>\n" % item.get_text())
    elif isinstance(item, ImageItem):
        out.append('<image width="%d" height="%d" />\n'
                   % (item.width, item.height))
    elif isinstance(item, Container):
        for child in item.objs:
            _render(child, out, stripcontrol)


def pages_to_xml(pages: list, stripcontrol: bool = False) -> str:
    out = ['<?xml version="1.0" encoding="utf-8" ?>\n', "<pages>\n"]
    for page in pages:
        _render(page, out, stripcontrol)
    out.append("</pages>\n")
    return "".join(out)


def extract_xml(data: bytes, password: bytes = b"", page_numbers=None,
                maxpages: int = 0, laparams="__default__",
                stripcontrol: bool = False, rotation: int = 0,
                caching: bool = True, pages=None) -> str:
    from .extract import _DEFAULT_LA, extract_pages

    if laparams == "__default__":
        laparams = _DEFAULT_LA

    if pages is None:
        pages = extract_pages(data, password=password,
                              page_numbers=page_numbers, maxpages=maxpages,
                              laparams=laparams, collect_shapes=True,
                              rotation=rotation, caching=caching)
    return pages_to_xml(pages, stripcontrol=stripcontrol)
