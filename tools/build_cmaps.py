#!/usr/bin/env python3
"""Compile Adobe cid2code.txt tables into pdfminer_spark CMap resources.

Input: Adobe's public CMap data tables (cid2code_Adobe_*.txt — redistributable
Adobe reference data shipped with the reference checkout under cmaprsrc/).
Output: one ``<encoding>.json.gz`` per CMap encoding with a flat
``{hex(code): cid}`` map + WMode flag, and one ``to-unicode-<registry>.json.gz``
with CID2UNICHR_H/V dicts, loaded by pdfminer_spark.pdf.cmaps.

Column semantics follow Adobe's file format notes: '*' = absent, comma
separates multiple codes, a trailing 'v' marks the vertical-mode variant,
columns without an explicit -H suffix have both -H and -V CMaps. The
unicode pick rule (most frequent candidate, ties to the lowest codepoint)
matches the reference build recipe so goldens agree
(/root/reference/Makefile:36-56, cmapdb.py:420-545).

Run:  python3 tools/build_cmaps.py
"""
from __future__ import annotations

import codecs
import gzip
import json
import os
import sys

SRC = os.environ.get("CMAPRSRC", "/root/reference/cmaprsrc")
OUT = os.path.join(os.path.dirname(__file__), "..", "pdfminer_spark",
                   "resources", "cmap")

REGISTRIES = {
    "Adobe-CNS1": ("cid2code_Adobe_CNS1.txt",
                   {"B5": "cp950", "UniCNS-UTF8": "utf-8"}),
    "Adobe-GB1": ("cid2code_Adobe_GB1.txt",
                  {"GBK-EUC": "cp936", "UniGB-UTF8": "utf-8"}),
    "Adobe-Japan1": ("cid2code_Adobe_Japan1.txt",
                     {"RKSJ": "cp932", "EUC": "euc-jp",
                      "UniJIS-UTF8": "utf-8"}),
    "Adobe-Korea1": ("cid2code_Adobe_Korea1.txt",
                     {"KSC-EUC": "euc-kr", "KSC-Johab": "johab",
                      "KSCms-UHC": "cp949", "UniKS-UTF8": "utf-8"}),
}


def hv_names(enc: str) -> tuple[str, str | None]:
    if enc.endswith("-H"):
        return (enc, None)
    if enc == "H":
        return ("H", "V")
    return (enc + "-H", enc + "-V")


def compile_registry(regname: str, path: str, enc2codec: dict) -> None:
    code2cid: dict[str, dict[bytes, int]] = {}
    is_vertical: dict[str, bool] = {}
    cid2unichr_h: dict[int, str] = {}
    cid2unichr_v: dict[int, str] = {}

    def getmaps(enc: str):
        (henc, venc) = hv_names(enc)
        hmap = code2cid.setdefault(henc, {})
        vmap = None
        if venc:
            is_vertical[venc] = True
            vmap = code2cid.setdefault(venc, {})
        return (hmap, vmap)

    def put(dmap: dict, code: bytes, cid: int, force: bool = False) -> None:
        if force or code not in dmap or dmap[code] == cid:
            dmap[code] = cid

    def pick(candidates: dict[str, int]) -> str:
        ranked = sorted(candidates.items(),
                        key=lambda kv: (kv[1], -ord(kv[0])), reverse=True)
        return ranked[0][0]

    encs: list[str] | None = None
    with open(path, encoding="utf-8", errors="replace") as fp:
        for line in fp:
            line = line.strip().partition("#")[0]
            if not line:
                continue
            values = line.split("\t")
            if encs is None:
                assert values[0] == "CID", values[:3]
                encs = values
                continue
            cid = int(values[0])
            unimap_h: dict[str, int] = {}
            unimap_v: dict[str, int] = {}
            for (enc, value) in zip(encs, values):
                if enc == "CID" or value == "*":
                    continue
                codec = enc2codec.get(enc)
                hcodes: list[bytes] = []
                vcodes: list[bytes] = []
                for token in value.split(","):
                    vertical = token.endswith("v")
                    if vertical:
                        token = token[:-1]
                    try:
                        code = codecs.decode(token, "hex")
                    except Exception:
                        try:
                            code = bytes([int(token, 16)])
                        except ValueError:
                            continue
                    (vcodes if vertical else hcodes).append(code)
                    if codec:
                        try:
                            c = code.decode(codec, "strict")
                            if len(c) == 1:
                                target = unimap_v if vertical else unimap_h
                                target[c] = target.get(c, 0) + 1
                        except (UnicodeError, LookupError):
                            pass
                (hmap, vmap) = getmaps(enc)
                if vcodes:
                    for code in vcodes:
                        put(vmap, code, cid, True)
                    for code in hcodes:
                        put(hmap, code, cid, True)
                else:
                    for code in hcodes:
                        put(hmap, code, cid)
                        if vmap is not None:
                            put(vmap, code, cid)
            if unimap_h:
                cid2unichr_h[cid] = pick(unimap_h)
            if unimap_v or unimap_h:
                cid2unichr_v[cid] = pick(unimap_v or unimap_h)

    os.makedirs(OUT, exist_ok=True)
    for (enc, cmap) in code2cid.items():
        payload = {
            "IS_VERTICAL": bool(is_vertical.get(enc, False)),
            "CODE2CID": {code.hex(): cid for (code, cid) in cmap.items()},
        }
        with gzip.open(os.path.join(OUT, "%s.json.gz" % enc), "wt",
                       encoding="utf-8") as fp:
            json.dump(payload, fp)
    with gzip.open(os.path.join(OUT, "to-unicode-%s.json.gz" % regname), "wt",
                   encoding="utf-8") as fp:
        json.dump({"CID2UNICHR_H": cid2unichr_h,
                   "CID2UNICHR_V": cid2unichr_v}, fp)
    print("%s: %d encodings, %d/%d unicode H/V entries"
          % (regname, len(code2cid), len(cid2unichr_h), len(cid2unichr_v)))


def main() -> None:
    for (regname, (fname, enc2codec)) in REGISTRIES.items():
        compile_registry(regname, os.path.join(SRC, fname), enc2codec)


if __name__ == "__main__":
    sys.exit(main())
