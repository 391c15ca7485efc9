"""HTML layout rendering — golden-compatible with ``pdf2txt.py -t html``
(reference converter.py:199-393): absolute-positioned divs/spans, three
layout modes (normal/loose/exact), px coordinates truncated with CPython
%d semantics.
"""
from __future__ import annotations

from .layout import (Anno, Char, Container, Figure, ImageItem, Page, Shape,
                     TextBox, TextBoxV, TextGroup, TextLine)
from .xmlout import q

RECT_COLORS_DEBUG = {
    "figure": "yellow", "textline": "magenta", "textbox": "cyan",
    "textgroup": "red", "curve": "black", "page": "gray",
}
TEXT_COLORS_DEBUG = {"textbox": "blue", "char": "black"}


class HtmlRenderer:
    def __init__(self, scale=1, fontscale=1.0, layoutmode="normal",
                 showpageno=True, pagemargin=50, debug=0,
                 rect_colors=None, text_colors=None):
        self.scale = scale
        self.fontscale = fontscale
        self.layoutmode = layoutmode
        self.showpageno = showpageno
        self.pagemargin = pagemargin
        self.rect_colors = dict(rect_colors or {"curve": "black", "page": "gray"})
        self.text_colors = dict(text_colors or {"char": "black"})
        if debug:
            self.rect_colors.update(RECT_COLORS_DEBUG)
            self.text_colors.update(TEXT_COLORS_DEBUG)
        self._yoffset = self.pagemargin
        self._font = None
        self._fontstack: list = []
        self.out: list[str] = []
        self.pageno = 1
        self._write_header()

    def _w(self, text: str) -> None:
        self.out.append(text)

    def _write_header(self) -> None:
        self._w("<html><head>\n")
        self._w('<meta http-equiv="Content-Type" content="text/html; '
                'charset=utf-8">\n')
        self._w("</head><body>\n")

    def _write_footer(self) -> None:
        self._w('<div style="position:absolute; top:0px;">Page: %s</div>\n'
                % ", ".join('<a href="#%s">%s</a>' % (i, i)
                            for i in range(1, self.pageno)))
        self._w("</body></html>\n")

    def _write_text(self, text: str) -> None:
        self._w(q(text))

    def _place_rect(self, color, borderwidth, x, y, w, h) -> None:
        color = self.rect_colors.get(color)
        if color is not None:
            self._w('<span style="position:absolute; border: %s %dpx solid; '
                    "left:%dpx; top:%dpx; width:%dpx; height:%dpx;\"></span>\n"
                    % (color, borderwidth,
                       x * self.scale, (self._yoffset - y) * self.scale,
                       w * self.scale, h * self.scale))

    def _place_border(self, color, borderwidth, item) -> None:
        self._place_rect(color, borderwidth, item.x0, item.y1,
                         item.width, item.height)

    def _place_text(self, color, text, x, y, size) -> None:
        color = self.text_colors.get(color)
        if color is not None:
            self._w('<span style="position:absolute; color:%s; left:%dpx; '
                    'top:%dpx; font-size:%dpx;">'
                    % (color, x * self.scale,
                       (self._yoffset - y) * self.scale,
                       size * self.scale * self.fontscale))
            self._write_text(text)
            self._w("</span>\n")

    def _begin_div(self, color, borderwidth, x, y, w, h,
                   writing_mode=False) -> None:
        self._fontstack.append(self._font)
        self._font = None
        self._w('<div style="position:absolute; border: %s %dpx solid; '
                "writing-mode:%s; left:%dpx; top:%dpx; width:%dpx; "
                'height:%dpx;">'
                % (color, borderwidth, writing_mode,
                   x * self.scale, (self._yoffset - y) * self.scale,
                   w * self.scale, h * self.scale))

    def _end_div(self) -> None:
        if self._font is not None:
            self._w("</span>")
        self._font = self._fontstack.pop()
        self._w("</div>")

    def _put_text(self, text, fontname, fontsize) -> None:
        font = (fontname, fontsize)
        if font != self._font:
            if self._font is not None:
                self._w("</span>")
            self._w('<span style="font-family: %s; font-size:%dpx">'
                    % (q(fontname), fontsize * self.scale * self.fontscale))
            self._font = font
        self._write_text(text)

    def _show_group(self, item) -> None:
        if isinstance(item, TextGroup):
            self._place_border("textgroup", 1, item)
            for child in item.objs:
                self._show_group(child)

    def render_page(self, page: Page) -> None:
        self._yoffset += page.y1
        self._render(page)
        self._yoffset += self.pagemargin
        self.pageno += 1

    def _render(self, item) -> None:  # noqa: C901
        if isinstance(item, Page):
            self._place_border("page", 1, item)
            if self.showpageno:
                self._w('<div style="position:absolute; top:%dpx;">'
                        % ((self._yoffset - item.y1) * self.scale))
                self._w('<a name="%s">Page %s</a></div>\n'
                        % (item.pageid, item.pageid))
            for child in item.objs:
                self._render(child)
            if item.groups is not None:
                for group in item.groups:
                    self._show_group(group)
        elif isinstance(item, Shape):
            self._place_border("curve", 1, item)
        elif isinstance(item, Figure):
            self._begin_div("figure", 1, item.x0, item.y1,
                            item.width, item.height)
            for child in item.objs:
                self._render(child)
            self._end_div()
        elif isinstance(item, ImageItem):
            pass  # image export requires an imagewriter (side-effecting)
        elif self.layoutmode == "exact":
            if isinstance(item, TextLine):
                self._place_border("textline", 1, item)
                for child in item.objs:
                    self._render(child)
            elif isinstance(item, TextBox):
                self._place_border("textbox", 1, item)
                self._place_text("textbox", str(item.index + 1),
                                 item.x0, item.y1, 20)
                for child in item.objs:
                    self._render(child)
            elif isinstance(item, Char):
                self._place_border("char", 1, item)
                self._place_text("char", item.get_text(), item.x0, item.y1,
                                 item.size)
        else:
            if isinstance(item, TextLine):
                for child in item.objs:
                    self._render(child)
                if self.layoutmode != "loose":
                    self._w("<br>")
            elif isinstance(item, TextBox):
                wmode = "tb-rl" if isinstance(item, TextBoxV) else "lr-tb"
                self._begin_div("textbox", 1, item.x0, item.y1,
                                item.width, item.height, wmode)
                for child in item.objs:
                    self._render(child)
                self._end_div()
            elif isinstance(item, Char):
                self._put_text(item.get_text(), item.fontname, item.size)
            elif isinstance(item, Anno):
                self._write_text(item.get_text())
            elif isinstance(item, Container):
                for child in item.objs:
                    self._render(child)

    def result(self) -> str:
        self._write_footer()
        return "".join(self.out)


def pages_to_html(pages: list, **kwargs) -> str:
    r = HtmlRenderer(**kwargs)
    for page in pages:
        r.render_page(page)
    return r.result()


def extract_html(data: bytes, password: bytes = b"", page_numbers=None,
                 maxpages: int = 0, laparams="__default__", rotation: int = 0,
                 caching: bool = True, pages=None, **kwargs) -> str:
    from .extract import _DEFAULT_LA, extract_pages

    if laparams == "__default__":
        laparams = _DEFAULT_LA

    if pages is None:
        pages = extract_pages(data, password=password,
                              page_numbers=page_numbers, maxpages=maxpages,
                              laparams=laparams, collect_shapes=True,
                              rotation=rotation, caching=caching)
    return pages_to_html(pages, **kwargs)
