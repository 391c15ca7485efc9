"""HTML document-metadata extraction: the fields a curation pipeline
keys on beside the main text — title, description, canonical URL,
language — with the standard fallback chains (``<title>`` ->
``og:title`` -> first ``<h1>``; ``meta description`` ->
``og:description``). Built on the same stdlib ``HTMLParser`` the
boilerplate stripper uses; malformed markup degrades to empty fields,
never an exception (the extraction status column carries health, not
the metadata struct).
"""
from __future__ import annotations

import re
from html.parser import HTMLParser

_WS = re.compile(r"\s+")


class _MetaParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.title_parts: list[str] = []
        self.h1_parts: list[str] = []
        self.metas: dict[str, str] = {}
        self.canonical = ""
        self.lang = ""
        self._in_title = False
        self._in_h1 = False
        self._h1_done = False

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag == "html" and not self.lang:
            self.lang = (a.get("lang") or "").strip().lower()
        elif tag == "title":
            self._in_title = True
        elif tag == "h1" and not self._h1_done:
            self._in_h1 = True
        elif tag == "meta":
            key = (a.get("name") or a.get("property") or "").strip().lower()
            if key and key not in self.metas:
                self.metas[key] = (a.get("content") or "").strip()
        elif tag == "link":
            rels = (a.get("rel") or "").lower().split()
            if "canonical" in rels and not self.canonical:
                self.canonical = (a.get("href") or "").strip()

    def handle_endtag(self, tag):
        if tag == "title":
            self._in_title = False
        elif tag == "h1" and self._in_h1:
            self._in_h1 = False
            self._h1_done = True

    def handle_data(self, data):
        if self._in_title:
            self.title_parts.append(data)
        if self._in_h1:
            self.h1_parts.append(data)


def _clean(s: str) -> str:
    return _WS.sub(" ", s).strip()


def extract_metadata(html: str) -> dict[str, str]:
    """Parse one HTML document's head-level metadata. Returns ``title``
    (fallback chain: <title> -> og:title -> first <h1>),
    ``description`` (meta description -> og:description),
    ``canonical`` (<link rel=canonical>), and ``lang`` (<html lang>),
    each "" when absent."""
    p = _MetaParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # keep whatever was collected before the malformation
    title = _clean("".join(p.title_parts))
    if not title:
        title = _clean(p.metas.get("og:title", ""))
    if not title:
        title = _clean("".join(p.h1_parts))
    description = _clean(p.metas.get("description", ""))
    if not description:
        description = _clean(p.metas.get("og:description", ""))
    return {"title": title, "description": description,
            "canonical": p.canonical, "lang": p.lang}


class _LinkParser(HTMLParser):
    """Collect ``(href, anchor_text)`` for every ``<a href>`` element;
    nested anchors close the outer one (the HTML5 tree-builder rule)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: list[tuple[str, str]] = []
        self._href: str | None = None
        self._parts: list[str] = []

    def _flush(self) -> None:
        if self._href is not None:
            text = _WS.sub(" ", "".join(self._parts)).strip()
            self.links.append((self._href, text))
        self._href = None
        self._parts = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            if self._href is not None:
                self._flush()
            self._href = (dict(attrs).get("href") or "").strip()

    def handle_endtag(self, tag):
        if tag == "a":
            self._flush()

    def handle_data(self, data):
        if self._href is not None:
            self._parts.append(data)

    def close(self):
        super().close()
        self._flush()


def extract_links(html_text: str) -> list[tuple[str, str]]:
    """All ``(href, anchor_text)`` pairs of a page, document order.
    Malformed markup degrades to whatever parsed, never an exception."""
    p = _LinkParser()
    try:
        p.feed(html_text)
        p.close()
    except Exception:
        pass
    return p.links
