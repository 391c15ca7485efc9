#!/usr/bin/env python3
"""Extract public Adobe font/encoding data into pdfminer_spark's own resource format.

The data extracted here is factual, freely-redistributable Adobe reference data
(NOT code):

- Core-14 AFM font metrics (Adobe Core 35 AFM files, "may be used, copied, and
  distributed for any purpose and without charge" per Adobe's license; see
  /root/reference/pdfminer/fontmetrics.py header which vendors the same data).
- The Adobe Glyph List (glyph name -> unicode; Adobe open-source data).
- The PDF Annex D "Latin character set and encodings" table (StandardEncoding /
  MacRomanEncoding / WinAnsiEncoding / PDFDocEncoding code points per glyph name).

We read the tables from any installed pdfminer distribution (here the reference
checkout) once at build time and serialize them into compact JSON.gz resources
that ship with pdfminer_spark. Run from the repo root:

    python3 tools/build_resources.py
"""
import gzip
import json
import os
import sys

REF = os.environ.get("PDFMINER_REF", "/root/reference")
OUT = os.path.join(os.path.dirname(__file__), "..", "pdfminer_spark", "resources")


def build_core14(out_dir: str) -> None:
    from pdfminer.fontmetrics import FONT_METRICS

    fonts = {}
    for name, (descriptor, widths) in FONT_METRICS.items():
        desc = dict(descriptor)
        # FontBBox is a tuple; JSON round-trips it as a list which is fine.
        fonts[name] = {"descriptor": desc, "widths": widths}
    path = os.path.join(out_dir, "core14_afm.json.gz")
    with gzip.open(path, "wt", encoding="utf-8") as fp:
        json.dump(fonts, fp)
    print(f"wrote {path} ({len(fonts)} fonts)")


def build_glyphlist(out_dir: str) -> None:
    from pdfminer.glyphlist import glyphname2unicode

    path = os.path.join(out_dir, "glyphlist.json.gz")
    with gzip.open(path, "wt", encoding="utf-8") as fp:
        json.dump(glyphname2unicode, fp)
    print(f"wrote {path} ({len(glyphname2unicode)} glyphs)")


def build_latin_encodings(out_dir: str) -> None:
    from pdfminer.latin_enc import ENCODING

    # rows: (glyphname, std, mac, win, pdf) with None for absent code points
    path = os.path.join(out_dir, "latin_enc.json.gz")
    with gzip.open(path, "wt", encoding="utf-8") as fp:
        json.dump([list(row) for row in ENCODING], fp)
    print(f"wrote {path} ({len(ENCODING)} rows)")


def main() -> None:
    sys.path.insert(0, REF)
    os.makedirs(OUT, exist_ok=True)
    build_core14(OUT)
    build_glyphlist(OUT)
    build_latin_encodings(OUT)


if __name__ == "__main__":
    main()
