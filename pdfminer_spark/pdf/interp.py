"""Content-stream interpreter: operators -> positioned glyphs.

A table-driven dispatch machine over the decoded content token stream.
Sequential *within* one content stream (PDF semantics force it — SURVEY.md
§7 "hard parts" #3); embarrassingly parallel across pages/documents/turns,
which is where the Spark layer parallelizes.

Text-op advance arithmetic mirrors the reference exactly
(/root/reference/pdfminer/pdfdevice.py:64-121, pdfinterp.py:314-889) because
glyph positions feed float comparisons in layout analysis and the goldens
are byte-exact.
"""
from __future__ import annotations

import re

from .document import PdfPage
from .fonts import Font, UnicodeNotDefined, make_font
from .layout import (MATRIX_IDENTITY, Char, Figure, ImageItem, LAParams,
                     Page, Shape, apply_matrix_pt, mult_matrix,
                     translate_matrix)
from .objects import (Keyword, Name, ObjRef, Stream, dict_value, int_value,
                      list_value, literal_name, resolve1, stream_value)
from .parser import ContentParser, ParserEOF

_EI_END = re.compile(rb"EI[\x09\x0a\x0c\x0d\x20\x0b]")
_TRAIL_EOL = re.compile(rb"(\x0d\x0a|[\x0d\x0a])$")

# number of components for predefined color spaces (reference pdfcolor.py)
_CS_COMPONENTS = {
    "CalRGB": 3, "CalGray": 1, "Lab": 3, "DeviceRGB": 3, "DeviceCMYK": 4,
    "DeviceGray": 1, "Separation": 1, "Indexed": 1, "Pattern": 1,
}


class ContentStreamParser(ContentParser):
    """ContentParser + inline-image (BI/ID/EI) island extraction
    (reference pdfinterp.py:216-309)."""

    def do_keyword(self, pos, kw: Keyword) -> None:
        name = bytes(kw)
        if name == b"BI":
            self.start_type(pos, "inline")
            return
        if name == b"ID":
            try:
                (_, objs) = self.end_type("inline")
                if len(objs) % 2 != 0:
                    raise TypeError("odd inline image dict")
                d = {}
                for k in range(0, len(objs), 2):
                    d[literal_name(objs[k])] = objs[k + 1]
                start = pos + 3  # past 'ID '
                m = _EI_END.search(self.buf, start)
                if m is None:
                    data = self.buf[start:]
                    resume = len(self.buf)
                else:
                    data = self.buf[start : m.start()]
                    resume = m.end()
                data = _TRAIL_EOL.sub(b"", data)
                self.lexer.seek(resume)
                self.push((pos, Stream(d, data)))
                self.push((pos, Keyword(b"EI")))
            except TypeError:
                pass
            return
        super().do_keyword(pos, kw)


class TextState:
    __slots__ = ("font", "fontsize", "charspace", "wordspace", "scaling",
                 "leading", "render", "rise", "matrix", "linematrix")

    def __init__(self):
        self.font: Font | None = None
        self.fontsize = 0
        self.charspace = 0
        self.wordspace = 0
        self.scaling = 100
        self.leading = 0
        self.render = 0
        self.rise = 0
        self.reset()

    def reset(self):
        self.matrix = MATRIX_IDENTITY
        self.linematrix = (0, 0)

    def copy(self):
        t = TextState.__new__(TextState)
        for k in TextState.__slots__:
            setattr(t, k, getattr(self, k))
        return t


class GraphicState:
    """Graphics state. Beyond the reference's PDFGraphicState (which
    parses but discards G/g/RG/rg/K/k — pdfinterp.py:583-611 are no-op
    bodies), stroke/fill color VALUES are carried and stamped onto Shape
    records as metadata; no golden output prints them."""

    __slots__ = ("linewidth", "scolor", "ncolor")

    def __init__(self):
        self.linewidth = 0
        self.scolor = None  # stroking color components, tuple or None
        self.ncolor = None  # non-stroking (fill) color components

    def copy(self):
        g = GraphicState.__new__(GraphicState)
        g.linewidth = self.linewidth
        g.scolor = self.scolor
        g.ncolor = self.ncolor
        return g


class ResourceCache:
    """Per-document font cache keyed by font objid
    (reference PDFResourceManager, pdfinterp.py:133-211)."""

    def __init__(self, caching: bool = True):
        self._fonts: dict[int, Font] = {}
        self.caching = caching

    def get_font(self, objid, spec) -> Font:
        if objid is not None and objid in self._fonts:
            return self._fonts[objid]
        font = make_font(spec)
        if objid is not None and self.caching:
            self._fonts[objid] = font
        return font


class Interpreter:
    """Executes page content; emits layout items into a container."""

    def __init__(self, rsrc: ResourceCache, laparams: LAParams | None,
                 collect_shapes: bool = True):
        self.rsrc = rsrc
        self.laparams = laparams
        self.collect_shapes = collect_shapes
        self.cur_item = None
        self._fig_stack: list = []
        # shared across sub-interpreters (like _fig_stack): counts Form
        # XObject invocations dropped by the nesting cap in op_Do, so
        # deep-nesting truncation is observable (ADVICE r6) — surfaced
        # as status 'ok:truncated-forms' by the extraction pipeline
        self._trunc = {"forms": 0}
        self.pageno = 1

    # -- resources ------------------------------------------------------------
    def init_resources(self, resources) -> None:
        self.resources = resources
        self.fontmap: dict[str, Font] = {}
        self.xobjmap: dict[str, object] = {}
        self.csmap: dict[str, int] = dict(_CS_COMPONENTS)
        if not resources:
            self.scs_n = self.ncs_n = 3
            return
        for (k, v) in dict_value(resolve1(resources)).items():
            if k == "Font":
                for (fontid, spec) in dict_value(resolve1(v)).items():
                    objid = spec.objid if isinstance(spec, ObjRef) else None
                    self.fontmap[fontid] = self.rsrc.get_font(
                        objid, dict_value(resolve1(spec)))
            elif k == "ColorSpace":
                for (csid, spec) in dict_value(resolve1(v)).items():
                    self.csmap[csid] = self._colorspace_ncomponents(resolve1(spec))
            elif k == "XObject":
                for (xobjid, xobjstrm) in dict_value(resolve1(v)).items():
                    self.xobjmap[xobjid] = xobjstrm
        # initial color spaces: first entry in csmap (reference quirk,
        # pdfinterp.py:379-384) — components only matter for SC/SCN arity
        self.scs_n = self.ncs_n = next(iter(self.csmap.values()), 3)

    @staticmethod
    def _colorspace_ncomponents(spec) -> int:
        if isinstance(spec, list) and spec:
            name = literal_name(resolve1(spec[0]))
            if name == "ICCBased" and len(spec) >= 2:
                return int_value(stream_value(resolve1(spec[1])).get("N", 1))
            if name == "DeviceN" and len(spec) >= 2:
                return len(list_value(resolve1(spec[1])))
            return _CS_COMPONENTS.get(name, 1)
        return _CS_COMPONENTS.get(literal_name(spec), 1)

    def init_state(self, ctm) -> None:
        self.gstack: list = []
        self.ctm = ctm
        self.textstate = TextState()
        self.graphicstate = GraphicState()
        self.curpath: list = []
        self.argstack: list = []

    # -- page entry ------------------------------------------------------------
    def process_page(self, page: PdfPage) -> Page:
        (x0, y0, x1, y1) = [float(v) for v in page.mediabox]
        if page.rotate == 90:
            ctm = (0, -1, 1, 0, -y0, x1)
        elif page.rotate == 180:
            ctm = (-1, 0, 0, -1, x1, y1)
        elif page.rotate == 270:
            ctm = (0, 1, -1, 0, y1, -x0)
        else:
            ctm = (1, 0, 0, 1, -x0, -y0)
        (ax0, ay0) = apply_matrix_pt(ctm, (x0, y0))
        (ax1, ay1) = apply_matrix_pt(ctm, (x1, y1))
        mediabox = (0, 0, abs(ax0 - ax1), abs(ay0 - ay1))
        # rotation is applied through the CTM; the layout page itself
        # reports rotate=0 (reference quirk, converter.py:36-41 — the
        # XML golden prints this attribute)
        ltpage = Page(self.pageno, mediabox, 0)
        self.cur_item = ltpage
        trunc_before = self._trunc["forms"]
        self.render_contents(page.resources, page.contents, ctm)
        ltpage.truncated_forms = self._trunc["forms"] - trunc_before
        if self.laparams is not None:
            from .layout import analyze_container

            analyze_container(ltpage, self.laparams)
        self.pageno += 1
        return ltpage

    def render_contents(self, resources, streams, ctm) -> None:
        self.init_resources(resources)
        self.init_state(ctm)
        data = b"".join(
            stream_value(resolve1(s)).get_data() for s in list_value(streams)
        )
        self.execute(data)

    def execute(self, data: bytes) -> None:
        """Fused token loop: lexer -> array/dict composer -> operator
        dispatch in one pass (no intermediate parser relay). Token and
        composition semantics identical to ContentStreamParser; the
        golden corpus pins the equivalence."""
        from .lexer import Lexer, LexerEOF

        dispatch = getattr(self, "_dispatch", None) or _DISPATCH
        lexer = Lexer(data)
        next_token = lexer.next_token
        argstack = self.argstack
        ctx: list = []          # (kind, saved_list) nesting for [ ] << >> { }
        cur: list | None = None  # active composition buffer, None = top level
        kinds: list = []
        while True:
            try:
                (pos, obj) = next_token()
            except LexerEOF:
                break
            except Exception:
                break
            if obj.__class__ is Keyword:
                # Keyword is an interned bytes subclass: compare/dispatch on
                # the token itself, no per-keyword bytes() copy
                b = obj
                if b == b"[":
                    ctx.append(cur)
                    kinds.append("a")
                    cur = []
                    continue
                if b == b"]":
                    if kinds and kinds[-1] == "a":
                        done = cur
                        cur = ctx.pop()
                        kinds.pop()
                        (cur if cur is not None else argstack).append(done)
                    continue
                if b == b"<<":
                    ctx.append(cur)
                    kinds.append("d")
                    cur = []
                    continue
                if b == b">>":
                    if kinds and kinds[-1] == "d":
                        items = cur
                        cur = ctx.pop()
                        kinds.pop()
                        if len(items) % 2 == 0:
                            d = {}
                            for k in range(0, len(items), 2):
                                if items[k + 1] is not None:
                                    key = items[k]
                                    d[key if isinstance(key, str)
                                      else str(key)] = items[k + 1]
                            (cur if cur is not None else argstack).append(d)
                    continue
                if b == b"{":
                    ctx.append(cur)
                    kinds.append("p")
                    cur = []
                    continue
                if b == b"}":
                    if kinds and kinds[-1] == "p":
                        done = cur
                        cur = ctx.pop()
                        kinds.pop()
                        (cur if cur is not None else argstack).append(done)
                    continue
                if b == b"BI":
                    ctx.append(cur)
                    kinds.append("i")
                    cur = []
                    continue
                if b == b"ID" and kinds and kinds[-1] == "i":
                    items = cur
                    cur = ctx.pop()
                    kinds.pop()
                    if len(items) % 2 == 0:
                        d = {}
                        for k in range(0, len(items), 2):
                            key = items[k]
                            d[key if isinstance(key, str)
                              else str(key)] = items[k + 1]
                        start = pos + 3
                        m = _EI_END.search(data, start)
                        if m is None:
                            img = data[start:]
                            lexer.seek(len(data))
                        else:
                            img = data[start:m.start()]
                            lexer.seek(m.end())
                        self.op_EI(Stream(d, _TRAIL_EOL.sub(b"", img)))
                    continue
                if b == b"null":
                    (cur if cur is not None else argstack).append(None)
                    continue
                if b == b"R":
                    buf = cur if cur is not None else argstack
                    if len(buf) >= 2:
                        genno = buf.pop()
                        objid = buf.pop()
                        try:
                            buf.append(ObjRef(None, int(objid)))
                        except (TypeError, ValueError):
                            pass
                    continue
                if cur is not None:
                    cur.append(obj)  # keyword inside a composite: kept
                    continue
                entry = dispatch.get(b)
                if entry is None:
                    continue
                (nargs, fn) = entry
                if nargs:
                    args = argstack[-nargs:]
                    del argstack[-nargs:]
                    if len(args) == nargs:
                        fn(self, *args)
                else:
                    fn(self)
            else:
                (cur if cur is not None else argstack).append(obj)

    # -- graphics state ---------------------------------------------------------
    def op_q(self):
        self.gstack.append((self.ctm, self.textstate.copy(),
                            self.graphicstate.copy()))

    def op_Q(self):
        if self.gstack:
            (self.ctm, self.textstate, self.graphicstate) = self.gstack.pop()

    def op_cm(self, a, b, c, d, e, f):
        self.ctm = mult_matrix((a, b, c, d, e, f), self.ctm)

    def op_w(self, lw):
        self.graphicstate.linewidth = lw

    def op_noop(self, *args):
        pass

    # -- path construction --------------------------------------------------------
    def op_m(self, x, y):
        self.curpath.append(("m", x, y))

    def op_l(self, x, y):
        self.curpath.append(("l", x, y))

    def op_c(self, x1, y1, x2, y2, x3, y3):
        self.curpath.append(("c", x1, y1, x2, y2, x3, y3))

    def op_v(self, x2, y2, x3, y3):
        self.curpath.append(("v", x2, y2, x3, y3))

    def op_y(self, x1, y1, x3, y3):
        self.curpath.append(("y", x1, y1, x3, y3))

    def op_h(self):
        self.curpath.append(("h",))

    def op_re(self, x, y, w, h):
        self.curpath.append(("m", x, y))
        self.curpath.append(("l", x + w, y))
        self.curpath.append(("l", x + w, y + h))
        self.curpath.append(("l", x, y + h))
        self.curpath.append(("h",))

    # -- path painting -------------------------------------------------------------
    def _paint(self):
        if self.collect_shapes and self.curpath:
            self._emit_path(self.curpath)
        self.curpath = []

    def _emit_path(self, path):
        """Classify into line/rect/curve (reference converter.py:73-104)."""
        shape = "".join(p[0] for p in path)
        ctm = self.ctm
        gs = self.graphicstate
        if shape == "ml":
            (_, x0, y0) = path[0]
            (_, x1, y1) = path[1]
            (x0, y0) = apply_matrix_pt(ctm, (x0, y0))
            (x1, y1) = apply_matrix_pt(ctm, (x1, y1))
            if x0 == x1 or y0 == y1:
                self.cur_item.add(Shape("line", [(x0, y0), (x1, y1)],
                                        gs.linewidth, gs.scolor, gs.ncolor))
                return
        if shape == "mlllh":
            pts = [apply_matrix_pt(ctm, (p[1], p[2])) for p in path[:4]]
            ((x0, y0), (x1, y1), (x2, y2), (x3, y3)) = pts
            if ((x0 == x1 and y1 == y2 and x2 == x3 and y3 == y0)
                    or (y0 == y1 and x1 == x2 and y2 == y3 and x3 == x0)):
                self.cur_item.add(Shape(
                    "rect",
                    [(x0, y0), (x2, y0), (x2, y2), (x0, y2)],
                    gs.linewidth, gs.scolor, gs.ncolor))
                return
        pts = []
        for p in path:
            for i in range(1, len(p), 2):
                pts.append(apply_matrix_pt(ctm, (p[i], p[i + 1])))
        self.cur_item.add(Shape("curve", pts, gs.linewidth,
                                gs.scolor, gs.ncolor))

    def op_S(self):
        self._paint()

    def op_s(self):
        self.op_h()
        self._paint()

    def op_f(self):
        self._paint()

    def op_f_star(self):
        self._paint()

    def op_B(self):
        self._paint()

    def op_B_star(self):
        self._paint()

    def op_b(self):
        self.op_h()
        self._paint()

    def op_b_star(self):
        self.op_h()
        self._paint()

    def op_n(self):
        self.curpath = []

    # -- color ----------------------------------------------------------------------
    def op_CS(self, name):
        self.scs_n = self.csmap.get(literal_name(name), 1)

    def op_cs(self, name):
        self.ncs_n = self.csmap.get(literal_name(name), 1)

    def op_SCN(self):
        n = self.scs_n or 1
        self.graphicstate.scolor = tuple(self.argstack[-n:])
        del self.argstack[-n:]

    def op_scn(self):
        n = self.ncs_n or 1
        self.graphicstate.ncolor = tuple(self.argstack[-n:])
        del self.argstack[-n:]

    # device-colorspace shorthands (reference pdfinterp.py:583-611 parses
    # these for arity only; the values are captured here as metadata)
    def op_G(self, gray):
        self.graphicstate.scolor = (gray,)

    def op_g(self, gray):
        self.graphicstate.ncolor = (gray,)

    def op_RG(self, r, g, b):
        self.graphicstate.scolor = (r, g, b)

    def op_rg(self, r, g, b):
        self.graphicstate.ncolor = (r, g, b)

    def op_K(self, c, m, y, k):
        self.graphicstate.scolor = (c, m, y, k)

    def op_k(self, c, m, y, k):
        self.graphicstate.ncolor = (c, m, y, k)

    # -- text state -------------------------------------------------------------------
    def op_BT(self):
        self.textstate.reset()

    def op_Tc(self, space):
        self.textstate.charspace = space

    def op_Tw(self, space):
        self.textstate.wordspace = space

    def op_Tz(self, scale):
        self.textstate.scaling = scale

    def op_TL(self, leading):
        self.textstate.leading = -leading

    def op_Tf(self, fontid, fontsize):
        font = self.fontmap.get(literal_name(fontid))
        if font is None:
            font = self.rsrc.get_font(None, {})
        self.textstate.font = font
        self.textstate.fontsize = fontsize

    def op_Tr(self, render):
        self.textstate.render = render

    def op_Ts(self, rise):
        self.textstate.rise = rise

    # -- text positioning ----------------------------------------------------------------
    def op_Td(self, tx, ty):
        (a, b, c, d, e, f) = self.textstate.matrix
        self.textstate.matrix = (a, b, c, d, tx * a + ty * c + e, tx * b + ty * d + f)
        self.textstate.linematrix = (0, 0)

    def op_TD(self, tx, ty):
        (a, b, c, d, e, f) = self.textstate.matrix
        self.textstate.matrix = (a, b, c, d, tx * a + ty * c + e, tx * b + ty * d + f)
        self.textstate.leading = ty
        self.textstate.linematrix = (0, 0)

    def op_Tm(self, a, b, c, d, e, f):
        self.textstate.matrix = (a, b, c, d, e, f)
        self.textstate.linematrix = (0, 0)

    def op_T_star(self):
        (a, b, c, d, e, f) = self.textstate.matrix
        lead = self.textstate.leading
        self.textstate.matrix = (a, b, c, d, lead * c + e, lead * d + f)
        self.textstate.linematrix = (0, 0)

    # -- text showing --------------------------------------------------------------------
    def op_TJ(self, seq):
        if self.textstate.font is None:
            return
        if not isinstance(seq, list):
            return
        self.render_string(seq)

    def op_Tj(self, s):
        self.op_TJ([s])

    def op_quote(self, s):
        self.op_T_star()
        self.op_TJ([s])

    def op_dblquote(self, aw, ac, s):
        self.textstate.wordspace = aw
        self.textstate.charspace = ac
        self.op_TJ([s])

    def render_string(self, seq) -> None:
        ts = self.textstate
        matrix = mult_matrix(ts.matrix, self.ctm)
        font = ts.font
        fontsize = ts.fontsize
        scaling = ts.scaling * 0.01
        charspace = ts.charspace * scaling
        wordspace = ts.wordspace * scaling
        rise = ts.rise
        if font.is_multibyte():
            wordspace = 0
        dxscale = 0.001 * fontsize * scaling
        vertical = font.is_vertical()
        (x, y) = ts.linematrix
        needcharspace = False
        add = self.cur_item.add
        # per-font memo + geometry fetched ONCE per string op (r8):
        # _render_char used to re-read both font.__dict__ entries per
        # char on the hottest path
        memo = font.__dict__.get("_cid_memo")
        if memo is None:
            memo = font.__dict__["_cid_memo"] = {}
        geom = font.__dict__.get("_geom")
        if geom is None:
            geom = font.__dict__["_geom"] = (
                font.get_width(), font.get_height(), font.get_descent(),
                font.is_vertical())
        # translate_matrix inlined per char: only e/f depend on (x, y)
        (ma, mb, mc, md, me, mf) = matrix
        render_char = self._render_char
        for obj in seq:
            if isinstance(obj, (int, float)) and not isinstance(obj, bool):
                if vertical:
                    y -= obj * dxscale
                else:
                    x -= obj * dxscale
                needcharspace = True
            elif isinstance(obj, bytes):
                for cid in font.decode(obj):
                    if needcharspace:
                        if vertical:
                            y += charspace
                        else:
                            x += charspace
                    adv = render_char(
                        (ma, mb, mc, md, x * ma + y * mc + me,
                         x * mb + y * md + mf),
                        font, fontsize, scaling, rise, cid, memo, geom)
                    if vertical:
                        y += adv
                    else:
                        x += adv
                    if cid == 32 and wordspace:
                        if vertical:
                            y += wordspace
                        else:
                            x += wordspace
                    needcharspace = True
        ts.linematrix = (x, y)

    def _render_char(self, matrix, font, fontsize, scaling, rise, cid,
                     memo, geom) -> float:
        # per-font cid memo: (text, width, disp) are font-constant;
        # memo + geom are fetched once per string op by render_string
        hit = memo.get(cid)
        if hit is not None:
            (text, textwidth, textdisp) = hit
        else:
            try:
                text = font.to_unichr(cid)
            except UnicodeNotDefined:
                text = "(cid:%d)" % cid
            textwidth = font.char_width(cid)
            textdisp = font.char_disp(cid)
            memo[cid] = (text, textwidth, textdisp)
        adv = textwidth * fontsize * scaling
        (g_width, g_height, g_descent, vertical) = geom
        # glyph bbox (reference LTChar.__init__, layout.py:224-265)
        if vertical:
            width = g_width * fontsize
            (vx, vy) = textdisp
            if vx is None:
                vx = width * 0.5
            else:
                vx = vx * fontsize * 0.001
            vy = (1000 - vy) * fontsize * 0.001
            tx = -vx
            ty = vy + rise
            bll = (tx, ty + adv)
            bur = (tx + width, ty)
        else:
            height = g_height * fontsize
            descent = g_descent * fontsize
            ty = descent + rise
            bll = (0, ty)
            bur = (adv, ty + height)
        (a, b, c, d, e, f) = matrix
        upright = 0 < a * d * scaling and b * c <= 0
        # apply_matrix_pt inlined: two calls per char on the hottest path
        (px, py) = bll
        x0 = a * px + c * py + e
        y0 = b * px + d * py + f
        (px, py) = bur
        x1 = a * px + c * py + e
        y1 = b * px + d * py + f
        if x1 < x0:
            (x0, x1) = (x1, x0)
        if y1 < y0:
            (y0, y1) = (y1, y0)
        size = (x1 - x0) if vertical else (y1 - y0)
        self.cur_item.add(Char((x0, y0, x1, y1), text, size, upright, adv,
                               font.fontname, matrix))
        return adv

    # -- XObjects / figures / images ----------------------------------------------------------
    def op_Do(self, xobjid_lit):
        xobjid = literal_name(xobjid_lit)
        xobj = self.xobjmap.get(xobjid)
        if xobj is None:
            return
        xobj = stream_value(resolve1(xobj))
        subtype = resolve1(xobj.get("Subtype"))
        # explicit nesting cap: a self-/cyclically-referencing Form
        # XObject must terminate cleanly, not ride Python's recursion
        # limit down in a worker (the reference has no guard and
        # RecursionErrors on such input, tools/diff_fuzz.py hostile set).
        # 64 is deeper than any legitimate document's form nesting; a
        # capped invocation is COUNTED (shared _trunc, ADVICE r6) so the
        # truncation surfaces as status 'ok:truncated-forms' downstream.
        if literal_name(subtype) == "Form" and "BBox" in xobj:
            if len(self._fig_stack) >= 64:
                self._trunc["forms"] += 1
                return
            bbox = list_value(resolve1(xobj["BBox"]))
            matrix = list_value(resolve1(xobj.get("Matrix", MATRIX_IDENTITY)))
            resources = dict_value(resolve1(xobj.get("Resources"))) or \
                dict_value(resolve1(self.resources)).copy()
            fig = Figure(xobjid, bbox, mult_matrix(matrix, self.ctm))
            self._fig_stack.append(self.cur_item)
            self.cur_item = fig
            sub = Interpreter(self.rsrc, None, self.collect_shapes)
            sub.cur_item = fig
            sub._fig_stack = self._fig_stack
            sub._trunc = self._trunc
            sub.render_contents(resources, [xobj], mult_matrix(matrix, self.ctm))
            self.cur_item = self._fig_stack.pop()
            self.cur_item.add(fig)
        elif literal_name(subtype) == "Image" and "Width" in xobj and "Height" in xobj:
            # figure bbox = the unit square through the current CTM
            fig = Figure(xobjid, (0, 0, 1, 1), self.ctm)
            fig.add(ImageItem(
                xobjid, fig.bbox,
                (resolve1(xobj.get("Width")), resolve1(xobj.get("Height"))),
                int_value(resolve1(xobj.get("BitsPerComponent", 1))),
                stream=xobj))
            self.cur_item.add(fig)

    def op_EI(self, obj):
        if isinstance(obj, Stream) and "W" in obj and "H" in obj:
            # deterministic name (the reference uses id(obj), which is
            # nondeterministic across runs — nothing depends on it)
            self._inline_count = getattr(self, "_inline_count", 0) + 1
            name = "inline-%d" % self._inline_count
            fig = Figure(name, (0, 0, 1, 1), self.ctm)
            fig.add(ImageItem(name, fig.bbox,
                              (obj.get_any(("W", "Width")),
                               obj.get_any(("H", "Height"))),
                              int_value(obj.get_any(("BPC", "BitsPerComponent"), 1)),
                              stream=obj))
            self.cur_item.add(fig)

    # -- marked content / compatibility: no-ops ------------------------------------------------


def _build_dispatch() -> dict[bytes, tuple[int, object]]:
    I = Interpreter
    table: dict[bytes, tuple[int, object]] = {
        b"q": (0, I.op_q), b"Q": (0, I.op_Q), b"cm": (6, I.op_cm),
        b"w": (1, I.op_w), b"J": (1, I.op_noop), b"j": (1, I.op_noop),
        b"M": (1, I.op_noop), b"d": (2, I.op_noop), b"ri": (1, I.op_noop),
        b"i": (1, I.op_noop), b"gs": (1, I.op_noop),
        b"m": (2, I.op_m), b"l": (2, I.op_l), b"c": (6, I.op_c),
        b"v": (4, I.op_v), b"y": (4, I.op_y), b"h": (0, I.op_h),
        b"re": (4, I.op_re),
        b"S": (0, I.op_S), b"s": (0, I.op_s), b"f": (0, I.op_f),
        b"F": (0, I.op_f), b"f*": (0, I.op_f_star), b"B": (0, I.op_B),
        b"B*": (0, I.op_B_star), b"b": (0, I.op_b), b"b*": (0, I.op_b_star),
        b"n": (0, I.op_n), b"W": (0, I.op_noop), b"W*": (0, I.op_noop),
        b"CS": (1, I.op_CS), b"cs": (1, I.op_cs),
        b"SCN": (0, I.op_SCN), b"scn": (0, I.op_scn),
        b"SC": (0, I.op_SCN), b"sc": (0, I.op_scn),
        b"G": (1, I.op_G), b"g": (1, I.op_g),
        b"RG": (3, I.op_RG), b"rg": (3, I.op_rg),
        b"K": (4, I.op_K), b"k": (4, I.op_k),
        b"sh": (1, I.op_noop),
        b"BT": (0, I.op_BT), b"ET": (0, I.op_noop),
        b"BX": (0, I.op_noop), b"EX": (0, I.op_noop),
        b"MP": (1, I.op_noop), b"DP": (2, I.op_noop),
        b"BMC": (1, I.op_noop), b"BDC": (2, I.op_noop), b"EMC": (0, I.op_noop),
        b"Tc": (1, I.op_Tc), b"Tw": (1, I.op_Tw), b"Tz": (1, I.op_Tz),
        b"TL": (1, I.op_TL), b"Tf": (2, I.op_Tf), b"Tr": (1, I.op_Tr),
        b"Ts": (1, I.op_Ts),
        b"Td": (2, I.op_Td), b"TD": (2, I.op_TD), b"Tm": (6, I.op_Tm),
        b"T*": (0, I.op_T_star),
        b"TJ": (1, I.op_TJ), b"Tj": (1, I.op_Tj),
        b"'": (1, I.op_quote), b'"': (3, I.op_dblquote),
        b"Do": (1, I.op_Do), b"EI": (1, I.op_EI),
        b"BI": (0, I.op_noop), b"ID": (0, I.op_noop),
    }
    return table


_DISPATCH = _build_dispatch()
