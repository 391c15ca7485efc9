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
