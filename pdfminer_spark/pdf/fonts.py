"""Font machinery: metrics, encodings, code->CID->unicode decoding.

Per-font lookup tables built once per document (executor-local cache) from:
- core-14 AFM metrics (JSON resource; the reference's FontMetricsDB
  broadcast-style table, /root/reference/pdfminer/pdffont.py:81-86),
- /Widths arrays and CID /W,/W2 packed width lists
  (/root/reference/pdfminer/pdffont.py:33-76),
- base encodings + /Differences (encodings.py),
- ToUnicode CMaps / predefined CMaps (cmaps.py),
- embedded Type1 headers and TrueType 'cmap' tables.
"""
from __future__ import annotations

import gzip
import json
import os
import struct
from functools import lru_cache

from .cmaps import (CMap, CMapNotFound, CMapParser, IdentityCMap, UnicodeMap,
                    get_cmap, get_unicode_map)
from .encodings import get_encoding, name2unicode
from .objects import (Name, bytes_value, dict_value, int_value, list_value,
                      literal_name, num_value, resolve1, stream_value)
from .parser import ContentParser, ParserEOF, StackParser

_RES = os.path.join(os.path.dirname(__file__), "..", "resources")


class UnicodeNotDefined(Exception):
    pass


@lru_cache(maxsize=1)
def core14_metrics() -> dict:
    with gzip.open(os.path.join(_RES, "core14_afm.json.gz"), "rt", encoding="utf-8") as fp:
        return json.load(fp)


# CIDs are 16-bit by spec (Adobe CID-keyed font architecture): clamping
# /W,/W2 range expansion to [0, 0xFFFF] cannot change any legitimate
# font, but stops a hostile `/W [0 2000000000 500]` from looping two
# billion times inside a worker (the reference expands unbounded,
# pdffont.py:33-50, and hangs on such input).
_MAX_CID = 0xFFFF


def get_widths(seq: list) -> dict[int, float]:
    """Unpack a CID font /W array (reference pdffont.py:33-50)."""
    widths: dict[int, float] = {}
    r: list = []
    for v in seq:
        v = resolve1(v)
        if isinstance(v, list):
            if r:
                char1 = r[-1]
                for (i, w) in enumerate(v):
                    widths[char1 + i] = w
                r = []
        elif isinstance(v, (int, float)) and not isinstance(v, bool):
            r.append(v)
            if len(r) == 3:
                (char1, char2, w) = r
                for i in range(max(int(char1), 0),
                               min(int(char2), _MAX_CID) + 1):
                    widths[i] = w
                r = []
    return widths


def get_widths2(seq: list) -> dict[int, tuple]:
    """Unpack a vertical /W2 array -> cid: (w, (vx, vy))."""
    widths: dict[int, tuple] = {}
    r: list = []
    for v in seq:
        v = resolve1(v)
        if isinstance(v, list):
            if r:
                char1 = r[-1]
                for i in range(0, len(v) - 2, 3):
                    widths[char1 + i // 3] = (v[i], (v[i + 1], v[i + 2]))
                r = []
        elif isinstance(v, (int, float)) and not isinstance(v, bool):
            r.append(v)
            if len(r) == 5:
                (char1, char2, w, vx, vy) = r
                for i in range(max(int(char1), 0),
                               min(int(char2), _MAX_CID) + 1):
                    widths[i] = (w, (vx, vy))
                r = []
    return widths


class Type1HeaderParser(StackParser):
    """Extract ``dup <code> /<glyphname> put`` pairs from a Type1 PFA header
    (reference pdffont.py:90-125). Values accumulate on the stack (no
    flushing between top-level objects); unknown keywords are ignored."""

    def __init__(self, data: bytes):
        super().__init__(data)
        self.cid2unicode: dict[int, str] = {}

    def do_keyword(self, pos, kw) -> None:
        if bytes(kw) == b"put":
            vals = self.pop(2)
            if len(vals) == 2:
                ((_, key), (_, value)) = vals
                if isinstance(key, int) and isinstance(value, Name):
                    try:
                        self.cid2unicode[key] = name2unicode(str(value))
                    except KeyError:
                        pass

    def get_encoding(self) -> dict[int, str]:
        try:
            self.next_object()  # consumes the whole header
        except Exception:
            pass
        return self.cid2unicode


def truetype_unicode_map(data: bytes) -> UnicodeMap | None:
    """Parse a TrueType 'cmap' table into gid -> unicode
    (reference pdffont.py:375-451; formats 0, 2, 4).

    Total mapping-entry work is budgeted (``_TT_CMAP_BUDGET``): a legit
    font maps at most 65,536 charcodes per subtable, but a hostile
    format-4 table can declare 32,767 segments each spanning the full
    16-bit range with idRangeOffset=0 — no out-of-bounds reads, ~2e9
    iterations if expanded naively (the reference expands unbounded and
    hangs). Budget exhaustion raises and lands in the existing
    returns-None handler."""
    _TT_CMAP_BUDGET = 1 << 20  # >= 16 full 65,536-code subtables
    ops = 0
    try:
        if len(data) < 12:
            return None
        (ntables,) = struct.unpack(">H", data[4:6])
        tables = {}
        off = 12
        for _ in range(ntables):
            (name, _chk, t_off, t_len) = struct.unpack(">4sLLL", data[off : off + 16])
            tables[name] = (t_off, t_len)
            off += 16
        if b"cmap" not in tables:
            return None
        (base, _len) = tables[b"cmap"]
        (version, nsub) = struct.unpack(">HH", data[base : base + 4])
        subs = []
        p = base + 4
        for _ in range(nsub):
            subs.append(struct.unpack(">HHL", data[p : p + 8]))
            p += 8
        char2gid: dict[int, int] = {}
        for (_pid, _eid, st_off) in subs:
            q = base + st_off
            (fmt, fmtlen, _lang) = struct.unpack(">HHH", data[q : q + 6])
            q += 6
            if fmt == 0:
                vals = struct.unpack(">256B", data[q : q + 256])
                char2gid.update(enumerate(vals))
            elif fmt == 2:
                subkeys = struct.unpack(">256H", data[q : q + 512])
                q += 512
                firstbytes = [0] * 8192
                for (i, k) in enumerate(subkeys):
                    firstbytes[k // 8] = i
                nhdrs = max(subkeys) // 8 + 1
                hdrs = []
                for i in range(nhdrs):
                    (firstcode, entcount, delta, offset) = struct.unpack(
                        ">HHhH", data[q : q + 8]
                    )
                    hdrs.append((i, firstcode, entcount, delta, q + 6 + offset))
                    q += 8
                for (i, firstcode, entcount, delta, pos) in hdrs:
                    if not entcount:
                        continue
                    ops += entcount
                    if ops > _TT_CMAP_BUDGET:
                        raise ValueError("hostile cmap: format-2 bomb")
                    first = firstcode + (firstbytes[i] << 8)
                    for c in range(entcount):
                        (gid,) = struct.unpack(">H", data[pos + 2 * c : pos + 2 * c + 2])
                        if gid:
                            gid += delta
                        char2gid[first + c] = gid
            elif fmt == 4:
                (segcount2, _a, _b, _c) = struct.unpack(">HHHH", data[q : q + 8])
                segcount = segcount2 // 2
                q += 8
                ecs = struct.unpack(">%dH" % segcount, data[q : q + 2 * segcount])
                q += 2 * segcount + 2
                scs = struct.unpack(">%dH" % segcount, data[q : q + 2 * segcount])
                q += 2 * segcount
                idds = struct.unpack(">%dh" % segcount, data[q : q + 2 * segcount])
                q += 2 * segcount
                pos = q
                idrs = struct.unpack(">%dH" % segcount, data[q : q + 2 * segcount])
                for (k, (ec, sc, idd, idr)) in enumerate(zip(ecs, scs, idds, idrs)):
                    if sc <= ec:
                        ops += ec - sc + 1
                        if ops > _TT_CMAP_BUDGET:
                            raise ValueError("hostile cmap: format-4 bomb")
                    if idr:
                        rp = pos + 2 * k + idr
                        for c in range(sc, ec + 1):
                            (g,) = struct.unpack(
                                ">H", data[rp + 2 * (c - sc) : rp + 2 * (c - sc) + 2]
                            )
                            char2gid[c] = (g + idd) & 0xFFFF
                    else:
                        for c in range(sc, ec + 1):
                            char2gid[c] = (c + idd) & 0xFFFF
            else:
                continue
        umap = UnicodeMap()
        for (char, gid) in char2gid.items():
            umap.add_cid2unichr(gid, char)
        return umap
    except (struct.error, IndexError, ValueError):
        return None


class Font:
    """Base font: widths keyed by cid (or unicode char for core-14)."""

    def __init__(self, descriptor: dict, widths: dict, default_width=None):
        self.descriptor = descriptor
        self.widths = widths
        fontname = resolve1(descriptor.get("FontName", "unknown"))
        self.fontname = literal_name(fontname) if fontname is not None else "unknown"
        self.flags = int_value(descriptor.get("Flags", 0))
        self.ascent = num_value(descriptor.get("Ascent", 0))
        self.descent = num_value(descriptor.get("Descent", 0))
        self.default_width = default_width or num_value(descriptor.get("MissingWidth", 0))
        self.bbox = list_value(resolve1(descriptor.get("FontBBox", (0, 0, 0, 0))))
        if len(self.bbox) != 4:
            self.bbox = (0, 0, 0, 0)
        self.hscale = self.vscale = 0.001
        if not hasattr(self, "cid2unicode"):
            self.cid2unicode: dict[int, str] = {}
        if not hasattr(self, "unicode_map"):
            self.unicode_map = None

    def is_vertical(self) -> bool:
        return False

    def is_multibyte(self) -> bool:
        return False

    def decode(self, data: bytes):
        return list(data)

    def get_ascent(self) -> float:
        return self.ascent * self.vscale

    def get_descent(self) -> float:
        return self.descent * self.vscale

    def get_width(self) -> float:
        w = self.bbox[2] - self.bbox[0]
        if w == 0:
            w = -self.default_width
        return w * self.hscale

    def get_height(self) -> float:
        h = self.bbox[3] - self.bbox[1]
        if h == 0:
            h = self.ascent - self.descent
        return h * self.vscale

    def char_width(self, cid: int) -> float:
        try:
            return self.widths[cid] * self.hscale
        except KeyError:
            try:
                return self.widths[self.to_unichr(cid)] * self.hscale
            except (KeyError, UnicodeNotDefined):
                return self.default_width * self.hscale

    def char_disp(self, cid: int):
        return 0

    def to_unichr(self, cid: int) -> str:
        raise UnicodeNotDefined(cid)


class SimpleFont(Font):
    """Single-byte font with a base encoding (+Differences) and optional
    ToUnicode map (reference pdffont.py:533-566)."""

    def __init__(self, descriptor: dict, widths: dict, spec: dict):
        encoding = resolve1(spec.get("Encoding", Name("StandardEncoding")))
        if isinstance(encoding, dict):
            base = literal_name(resolve1(encoding.get("BaseEncoding",
                                                      Name("StandardEncoding"))))
            diff = list_value(resolve1(encoding.get("Differences")))
            cid2unicode = get_encoding(base, diff)
        else:
            cid2unicode = get_encoding(literal_name(encoding))
        super().__init__(descriptor, widths)
        self.cid2unicode = cid2unicode
        if "ToUnicode" in spec:
            strm = stream_value(resolve1(spec["ToUnicode"]))
            self.unicode_map = UnicodeMap()
            CMapParser(self.unicode_map, strm.get_data()).run()

    def to_unichr(self, cid: int) -> str:
        if self.unicode_map:
            try:
                return self.unicode_map.get_unichr(cid)
            except KeyError:
                pass
        try:
            return self.cid2unicode[cid]
        except KeyError:
            raise UnicodeNotDefined(cid) from None


class Type1Font(SimpleFont):
    def __init__(self, spec: dict):
        try:
            self.basefont = literal_name(resolve1(spec["BaseFont"]))
        except KeyError:
            self.basefont = "unknown"
        metrics = core14_metrics().get(self.basefont)
        if metrics is not None:
            descriptor = metrics["descriptor"]
            widths = metrics["widths"]  # keyed by unicode char
        else:
            descriptor = dict_value(resolve1(spec.get("FontDescriptor", {})))
            firstchar = int_value(resolve1(spec.get("FirstChar", 0)))
            wlist = list_value(resolve1(spec.get("Widths", [0] * 256)))
            widths = {i + firstchar: num_value(resolve1(w)) for (i, w) in enumerate(wlist)}
        super().__init__(descriptor, widths, spec)
        if "Encoding" not in spec and "FontFile" in descriptor:
            fontfile = stream_value(resolve1(descriptor["FontFile"]))
            length1 = int_value(resolve1(fontfile.get("Length1", 0)))
            data = fontfile.get_data()[:length1]
            self.cid2unicode = Type1HeaderParser(data).get_encoding()


class TrueTypeFont(Type1Font):
    pass


class Type3Font(SimpleFont):
    def __init__(self, spec: dict):
        firstchar = int_value(resolve1(spec.get("FirstChar", 0)))
        wlist = list_value(resolve1(spec.get("Widths", [0] * 256)))
        widths = {i + firstchar: num_value(resolve1(w)) for (i, w) in enumerate(wlist)}
        if "FontDescriptor" in spec:
            descriptor = dict_value(resolve1(spec["FontDescriptor"]))
        else:
            descriptor = {"Ascent": 0, "Descent": 0, "FontBBox": spec.get("FontBBox", (0, 0, 0, 0))}
        super().__init__(descriptor, widths, spec)
        self.matrix = tuple(list_value(resolve1(spec.get("FontMatrix", (1, 0, 0, 1, 0, 0)))))
        (_, self.descent, _, self.ascent) = self.bbox
        (a, b, c, d) = self.matrix[:4]
        self.hscale = a + c
        self.vscale = b + d


class CIDFont(Font):
    """Composite (Type0/CID) font (reference pdffont.py:632-725)."""

    def __init__(self, spec: dict):
        try:
            self.basefont = literal_name(resolve1(spec["BaseFont"]))
        except KeyError:
            self.basefont = "unknown"
        info = dict_value(resolve1(spec.get("CIDSystemInfo", {})))
        registry = bytes_value(resolve1(info.get("Registry", b"unknown")))
        ordering = bytes_value(resolve1(info.get("Ordering", b"unknown")))
        self.cidcoding = (registry + b"-" + ordering).decode("ascii", "ignore")
        enc = spec.get("Encoding")
        name = literal_name(resolve1(enc)) if enc is not None else "unknown"
        try:
            self.cmap = get_cmap(name)
        except CMapNotFound:
            self.cmap = CMap()
        descriptor = dict_value(resolve1(spec.get("FontDescriptor", {})))
        ttf_data = None
        if "FontFile2" in descriptor:
            ttf_data = stream_value(resolve1(descriptor["FontFile2"])).get_data()
        self.unicode_map = None
        if "ToUnicode" in spec:
            strm = stream_value(resolve1(spec["ToUnicode"]))
            self.unicode_map = UnicodeMap()
            CMapParser(self.unicode_map, strm.get_data()).run()
        elif self.cidcoding in ("Adobe-Identity", "Adobe-UCS"):
            if ttf_data:
                self.unicode_map = truetype_unicode_map(ttf_data)
        else:
            try:
                self.unicode_map = get_unicode_map(
                    self.cidcoding, self.cmap.is_vertical()
                )
            except CMapNotFound:
                pass
        self.vertical = self.cmap.is_vertical()
        if self.vertical:
            widths2 = get_widths2(list_value(resolve1(spec.get("W2", []))))
            self.disps = {cid: (vx, vy) for (cid, (_, (vx, vy))) in widths2.items()}
            dw2 = list_value(resolve1(spec.get("DW2", [880, -1000])))
            if len(dw2) != 2:
                dw2 = [880, -1000]
            (vy, w) = dw2
            self.default_disp = (None, vy)
            widths = {cid: w for (cid, (w, _)) in widths2.items()}
            default_width = w
        else:
            self.disps = {}
            self.default_disp = 0
            widths = get_widths(list_value(resolve1(spec.get("W", []))))
            default_width = resolve1(spec.get("DW", 1000))
        super().__init__(descriptor, widths, default_width=default_width)

    def is_vertical(self) -> bool:
        return self.vertical

    def is_multibyte(self) -> bool:
        return True

    def decode(self, data: bytes):
        return self.cmap.decode(data)

    def char_disp(self, cid: int):
        return self.disps.get(cid, self.default_disp)

    def to_unichr(self, cid: int) -> str:
        try:
            if not self.unicode_map:
                raise KeyError(cid)
            return self.unicode_map.get_unichr(cid)
        except KeyError:
            raise UnicodeNotDefined(cid) from None


def make_font(spec: dict, _depth: int = 0) -> Font:
    """Font factory (reference pdfinterp.py:168-211).

    ``_depth`` breaks Type0 descendant cycles: a hostile Type0 font
    whose /DescendantFonts entry is (or leads back to) itself recurses
    forever in the reference; past depth 8 the spec is treated as the
    same simple-font fallback the factory already uses for unknown
    subtypes."""
    spec = dict_value(spec)
    if _depth > 8:
        return Type1Font(spec)
    subtype = literal_name(resolve1(spec.get("Subtype", Name("Type1"))))
    if subtype in ("Type1", "MMType1"):
        return Type1Font(spec)
    if subtype == "TrueType":
        return TrueTypeFont(spec)
    if subtype == "Type3":
        return Type3Font(spec)
    if subtype in ("CIDFontType0", "CIDFontType2"):
        return CIDFont(spec)
    if subtype == "Type0":
        dfonts = list_value(resolve1(spec.get("DescendantFonts", [])))
        if dfonts:
            subspec = dict_value(resolve1(dfonts[0])).copy()
            for k in ("Encoding", "ToUnicode"):
                if k in spec:
                    subspec[k] = resolve1(spec[k])
            return make_font(subspec, _depth + 1)
    return Type1Font(spec)
