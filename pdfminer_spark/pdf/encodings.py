"""Glyph-name -> unicode and the standard Latin encodings.

Backed by the JSON resources built by tools/build_resources.py from public
Adobe data (Adobe Glyph List; PDF Annex D encoding tables). These are the
broadcast-style static lookup tables of the rebuilt pipeline (SURVEY.md
§2.3): loaded once per executor process and shared.
Reference analog: /root/reference/pdfminer/encodingdb.py.
"""
from __future__ import annotations

import gzip
import json
import os
import re
from functools import lru_cache

_RES = os.path.join(os.path.dirname(__file__), "..", "resources")
_DIGITS = re.compile(r"[0-9]+")


@lru_cache(maxsize=1)
def glyphname2unicode() -> dict[str, str]:
    with gzip.open(os.path.join(_RES, "glyphlist.json.gz"), "rt", encoding="utf-8") as fp:
        return json.load(fp)


def name2unicode(name: str) -> str:
    """Adobe glyph name -> unicode char; numeric-suffix fallback.

    Raises KeyError when the name has no mapping (callers treat that as
    'leave the cid unmapped')."""
    table = glyphname2unicode()
    if name in table:
        return table[name]
    m = _DIGITS.search(name)
    if not m:
        raise KeyError(name)
    return chr(int(m.group(0)))


@lru_cache(maxsize=1)
def _encoding_tables() -> dict[str, dict[int, str]]:
    with gzip.open(os.path.join(_RES, "latin_enc.json.gz"), "rt", encoding="utf-8") as fp:
        rows = json.load(fp)
    std: dict[int, str] = {}
    mac: dict[int, str] = {}
    win: dict[int, str] = {}
    pdf: dict[int, str] = {}
    for (name, c_std, c_mac, c_win, c_pdf) in rows:
        try:
            u = name2unicode(name)
        except KeyError:
            continue
        if c_std:
            std[c_std] = u
        if c_mac:
            mac[c_mac] = u
        if c_win:
            win[c_win] = u
        if c_pdf:
            pdf[c_pdf] = u
    return {
        "StandardEncoding": std,
        "MacRomanEncoding": mac,
        "WinAnsiEncoding": win,
        "PDFDocEncoding": pdf,
    }


def get_encoding(name: str, diff: list | None = None) -> dict[int, str]:
    """Base encoding table + /Differences overlay -> cid2unicode."""
    tables = _encoding_tables()
    cid2unicode = tables.get(name, tables["StandardEncoding"])
    if diff:
        from .objects import Name

        cid2unicode = dict(cid2unicode)
        cid = 0
        for x in diff:
            if isinstance(x, int) and not isinstance(x, bool):
                cid = x
            elif isinstance(x, Name):
                try:
                    cid2unicode[cid] = name2unicode(str(x))
                except KeyError:
                    pass
                cid += 1
    return cid2unicode
