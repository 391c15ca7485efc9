#!/usr/bin/env python3
"""Build fixtures/layout_spans.parquet — the layout_boxes oracle table.

Parses the vendored reference XML goldens (fixtures/goldens/*.xml.ref,
byte-copies of /root/reference/samples/*.xml.ref, produced by the
reference's own tools with `-p1 -V`) into one row per textbox:
(sample, turn_idx, box_id, page, bbox, wmode, text). The bbox string is
kept exactly as printed by the reference (%.3f), so the comparison never
round-trips through float formatting.

Reference provenance: converter.py:425-497 (XMLConverter textbox/
textline/text emission).
"""
from __future__ import annotations

import os
import sys
import xml.etree.ElementTree as ET

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDENS = os.path.join(REPO, "fixtures", "goldens")

SAMPLES = [
    "simple1", "simple2", "simple3", "jo",
    "nonfree/dmca", "nonfree/f1040nr", "nonfree/i1040nr", "nonfree/kampo",
    "nonfree/naacl06-shinyama", "nonfree/nlp2004slides",
]


def parse_sample(name: str) -> list[dict]:
    path = os.path.join(GOLDENS, name + ".xml.ref")
    root = ET.parse(path).getroot()
    rows = []
    for (pageno, page) in enumerate(root.iter("page")):
        # only direct children: the <layout>/<textgroup> section re-nests
        # the same textbox elements to show the grouping tree
        for tb in page.findall("textbox"):
            text = "".join(
                (t.text or "") for t in tb.iter("text"))
            rows.append({
                "sample": name,
                "turn_idx": 0,
                "box_id": int(tb.get("id")),
                "page": pageno,
                "bbox": tb.get("bbox"),
                "wmode": tb.get("wmode") or "horizontal",
                "text": text,
            })
    return rows


def main() -> None:
    rows: list[dict] = []
    for name in SAMPLES:
        rows.extend(parse_sample(name))
    df = pd.DataFrame(rows)
    out = os.path.join(REPO, "fixtures", "layout_spans.parquet")
    df.to_parquet(out, index=False)
    print(f"wrote {len(df)} spans -> {out}")


if __name__ == "__main__":
    sys.exit(main())
