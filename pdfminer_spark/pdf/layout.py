"""Layout analysis: positioned glyphs -> lines -> boxes -> reading order.

Implements pdfminer-compatible layout semantics (LAParams-driven grouping;
/root/reference/pdfminer/layout.py) over flat item records:

- chars -> lines: sequential clustering of the emission-ordered char stream
  with halign/valign predicates (reference layout.py:496-565),
- lines -> boxes: neighbor closure over a grid-hash spatial index
  (reference layout.py:568-596, Plane utils.py:254-333),
- boxes -> group tree: agglomerative min-distance merging that yields the
  reading order (reference layout.py:599-664).

Determinism notes: every sort is a stable sort keyed with the original
sequence index (the reference's ``csort``), and the grid index preserves
insertion order — both are observable in the golden outputs.
"""
from __future__ import annotations

INF = float("inf")


class LAParams:
    """Layout-analysis knobs (defaults = reference layout.py:33-54)."""

    __slots__ = ("line_overlap", "char_margin", "line_margin", "word_margin",
                 "boxes_flow", "detect_vertical", "all_texts")

    def __init__(self, line_overlap=0.5, char_margin=2.0, line_margin=0.5,
                 word_margin=0.1, boxes_flow=0.5, detect_vertical=False,
                 all_texts=False):
        self.line_overlap = line_overlap
        self.char_margin = char_margin
        self.line_margin = line_margin
        self.word_margin = word_margin
        self.boxes_flow = boxes_flow
        self.detect_vertical = detect_vertical
        self.all_texts = all_texts


def _csort_idx(objs, key):
    """Order-preserving sort: ties broken by original index (the
    reference's ``csort``, utils.py:107-110 — determinism-critical)."""
    idx = {id(o): i for (i, o) in enumerate(objs)}
    return sorted(objs, key=lambda o: (key(o), idx[id(o)]))


class Item:
    """Anything with a bbox."""

    __slots__ = ("x0", "y0", "x1", "y1")

    def __init__(self, x0=INF, y0=INF, x1=-INF, y1=-INF):
        self.x0 = x0
        self.y0 = y0
        self.x1 = x1
        self.y1 = y1

    @property
    def width(self):
        return self.x1 - self.x0

    @property
    def height(self):
        return self.y1 - self.y0

    @property
    def bbox(self):
        return (self.x0, self.y0, self.x1, self.y1)

    def is_empty(self):
        return self.x1 - self.x0 <= 0 or self.y1 - self.y0 <= 0

    # horizontal / vertical overlap predicates (reference layout.py:115-149)
    def is_hoverlap(self, other):
        return other.x0 <= self.x1 and self.x0 <= other.x1

    def hdistance(self, other):
        if self.is_hoverlap(other):
            return 0
        return min(abs(self.x0 - other.x1), abs(self.x1 - other.x0))

    def hoverlap(self, other):
        if self.is_hoverlap(other):
            return min(abs(self.x0 - other.x1), abs(self.x1 - other.x0))
        return 0

    def is_voverlap(self, other):
        return other.y0 <= self.y1 and self.y0 <= other.y1

    def vdistance(self, other):
        if self.is_voverlap(other):
            return 0
        return min(abs(self.y0 - other.y1), abs(self.y1 - other.y0))

    def voverlap(self, other):
        if self.is_voverlap(other):
            return min(abs(self.y0 - other.y1), abs(self.y1 - other.y0))
        return 0


class Char(Item):
    """One positioned glyph (reference LTChar, layout.py:222-278)."""

    __slots__ = ("text", "size", "upright", "adv", "fontname", "matrix")

    def __init__(self, bbox, text, size, upright, adv, fontname, matrix):
        (self.x0, self.y0, self.x1, self.y1) = bbox
        self.text = text
        self.size = size
        self.upright = upright
        self.adv = adv
        self.fontname = fontname
        self.matrix = matrix

    def get_text(self):
        return self.text


class Anno:
    """Virtual char (inserted space/newline); no bbox."""

    __slots__ = ("text",)

    def __init__(self, text):
        self.text = text

    def get_text(self):
        return self.text


class Container(Item):
    __slots__ = ("objs",)

    def __init__(self):
        super().__init__()
        self.objs = []

    def add(self, obj):
        self.objs.append(obj)
        if isinstance(obj, Item):
            if obj.x0 < self.x0:
                self.x0 = obj.x0
            if obj.y0 < self.y0:
                self.y0 = obj.y0
            if obj.x1 > self.x1:
                self.x1 = obj.x1
            if obj.y1 > self.y1:
                self.y1 = obj.y1

    def get_text(self):
        return "".join(o.get_text() for o in self.objs if hasattr(o, "get_text"))


class TextLine(Container):
    __slots__ = ("word_margin",)

    def __init__(self, word_margin):
        super().__init__()
        self.word_margin = word_margin

    def finish(self):
        self.objs.append(Anno("\n"))


class TextLineH(TextLine):
    """Horizontal line; inserts word-gap spaces (reference layout.py:362-385)."""

    __slots__ = ("_x1",)

    def __init__(self, word_margin):
        super().__init__(word_margin)
        self._x1 = INF

    def add_char(self, obj):
        if self.word_margin:
            margin = self.word_margin * max(obj.width, obj.height)
            if self._x1 < obj.x0 - margin:
                self.objs.append(Anno(" "))
        self._x1 = obj.x1
        self.add(obj)

    def find_neighbors(self, plane, ratio):
        d = ratio * self.height
        hits = plane.find((self.x0, self.y0 - d, self.x1, self.y1 + d))
        return [o for o in hits
                if (isinstance(o, TextLineH)
                    and abs(o.height - self.height) < d
                    and (abs(o.x0 - self.x0) < d or abs(o.x1 - self.x1) < d))]


class TextLineV(TextLine):
    """Vertical line (reference layout.py:388-411)."""

    __slots__ = ("_y0",)

    def __init__(self, word_margin):
        super().__init__(word_margin)
        self._y0 = -INF

    def add_char(self, obj):
        if self.word_margin:
            margin = self.word_margin * max(obj.width, obj.height)
            if obj.y1 + margin < self._y0:
                self.objs.append(Anno(" "))
        self._y0 = obj.y0
        self.add(obj)

    def find_neighbors(self, plane, ratio):
        d = ratio * self.width
        hits = plane.find((self.x0 - d, self.y0, self.x1 + d, self.y1))
        return [o for o in hits
                if (isinstance(o, TextLineV)
                    and abs(o.width - self.width) < d
                    and (abs(o.y0 - self.y0) < d or abs(o.y1 - self.y1) < d))]


class TextBox(Container):
    __slots__ = ("index",)

    def __init__(self):
        super().__init__()
        self.index = -1


class TextBoxH(TextBox):
    __slots__ = ()
    wmode = "lr-tb"

    def order_lines(self):
        self.objs = _csort_idx(self.objs, key=lambda o: -o.y1)


class TextBoxV(TextBox):
    __slots__ = ()
    wmode = "tb-rl"

    def order_lines(self):
        self.objs = _csort_idx(self.objs, key=lambda o: -o.x1)


class TextGroup(Container):
    __slots__ = ()

    def __init__(self, objs):
        super().__init__()
        for o in objs:
            self.add(o)


class TextGroupLRTB(TextGroup):
    __slots__ = ()

    def order(self, boxes_flow):
        self.objs = _csort_idx(
            self.objs,
            key=lambda o: (1 - boxes_flow) * o.x0 - (1 + boxes_flow) * (o.y0 + o.y1),
        )


class TextGroupTBRL(TextGroup):
    __slots__ = ()

    def order(self, boxes_flow):
        self.objs = _csort_idx(
            self.objs,
            key=lambda o: -(1 + boxes_flow) * (o.x0 + o.x1) - (1 - boxes_flow) * o.y1,
        )


class Shape(Item):
    """Stroked/filled path (LTLine/LTRect/LTCurve collapse to this record).

    ``scolor``/``ncolor`` carry the graphics-state stroke/fill color
    components at paint time (metadata only — no golden format emits
    them; the reference's interpreter discards the values entirely,
    pdfinterp.py:583-611)."""

    __slots__ = ("kind", "pts", "linewidth", "scolor", "ncolor")

    def __init__(self, kind, pts, linewidth, scolor=None, ncolor=None):
        x0 = y0 = INF
        x1 = y1 = -INF
        for (x, y) in pts:
            x0 = min(x0, x)
            y0 = min(y0, y)
            x1 = max(x1, x)
            y1 = max(y1, y)
        super().__init__(x0, y0, x1, y1)
        self.kind = kind
        self.pts = pts
        self.linewidth = linewidth
        self.scolor = scolor
        self.ncolor = ncolor


class ImageItem(Item):
    __slots__ = ("name", "srcsize", "bits", "stream")

    def __init__(self, name, bbox, srcsize, bits, stream=None):
        (self.x0, self.y0, self.x1, self.y1) = bbox
        self.name = name
        self.srcsize = srcsize
        self.bits = bits
        # the source Stream, kept for the -O image-export path (reference
        # LTImage.stream, layout.py:187-200); None for synthetic items
        self.stream = stream


class Figure(Container):
    """Form XObject container (reference LTFigure, layout.py:699-719)."""

    __slots__ = ("name", "matrix", "_bbox_fixed")

    def __init__(self, name, bbox, matrix):
        super().__init__()
        self.name = name
        self.matrix = matrix
        (x, y, w, h) = bbox
        pts = [apply_matrix_pt(matrix, p) for p in
               ((x, y), (x + w, y), (x, y + h), (x + w, y + h))]
        self.x0 = min(p[0] for p in pts)
        self.y0 = min(p[1] for p in pts)
        self.x1 = max(p[0] for p in pts)
        self.y1 = max(p[1] for p in pts)

    def add(self, obj):
        # figure bbox is fixed by its matrix, not expanded by children
        self.objs.append(obj)


class Page(Container):
    __slots__ = ("pageid", "rotate", "groups", "truncated_forms")

    def __init__(self, pageid, bbox, rotate=0):
        super().__init__()
        (self.x0, self.y0, self.x1, self.y1) = bbox
        self.pageid = pageid
        self.rotate = rotate
        self.groups = None
        # Form XObject invocations dropped on this page by the
        # interpreter's nesting cap (observability, ADVICE r6)
        self.truncated_forms = 0

    def add(self, obj):
        self.objs.append(obj)  # page bbox fixed by mediabox


# -- matrix helpers (2x3 affine CTM; reference utils.py:54-84) ---------------

MATRIX_IDENTITY = (1, 0, 0, 1, 0, 0)


def mult_matrix(m1, m0):
    (a1, b1, c1, d1, e1, f1) = m1
    (a0, b0, c0, d0, e0, f0) = m0
    return (a0 * a1 + c0 * b1, b0 * a1 + d0 * b1,
            a0 * c1 + c0 * d1, b0 * c1 + d0 * d1,
            a0 * e1 + c0 * f1 + e0, b0 * e1 + d0 * f1 + f0)


def translate_matrix(m, v):
    (a, b, c, d, e, f) = m
    (x, y) = v
    return (a, b, c, d, x * a + y * c + e, x * b + y * d + f)


def apply_matrix_pt(m, v):
    (a, b, c, d, e, f) = m
    (x, y) = v
    return (a * x + c * y + e, b * x + d * y + f)


# -- grid-hash spatial index (reference Plane, utils.py:254-333) --------------

class Plane:
    __slots__ = ("_seq", "_objs", "_grid", "gridsize", "x0", "y0", "x1", "y1")

    def __init__(self, bbox, gridsize=50):
        self._seq = []
        self._objs = set()
        self._grid: dict = {}
        self.gridsize = gridsize
        (self.x0, self.y0, self.x1, self.y1) = bbox

    def __iter__(self):
        return (o for o in self._seq if id(o) in self._objs)

    def __len__(self):
        return len(self._objs)

    def __contains__(self, obj):
        return id(obj) in self._objs

    def _cells(self, bbox):
        (x0, y0, x1, y1) = bbox
        if x1 <= self.x0 or self.x1 <= x0 or y1 <= self.y0 or self.y1 <= y0:
            return
        x0 = max(self.x0, x0)
        y0 = max(self.y0, y0)
        x1 = min(self.x1, x1)
        y1 = min(self.y1, y1)
        g = self.gridsize
        for gy in range(int(y0) // g, int(y1 + g) // g):
            for gx in range(int(x0) // g, int(x1 + g) // g):
                yield (gx, gy)

    def extend(self, objs):
        for o in objs:
            self.add(o)

    def add(self, obj):
        for k in self._cells(obj.bbox):
            self._grid.setdefault(k, []).append(obj)
        self._seq.append(obj)
        self._objs.add(id(obj))

    def remove(self, obj):
        for k in self._cells(obj.bbox):
            try:
                self._grid[k].remove(obj)
            except (KeyError, ValueError):
                pass
        self._objs.discard(id(obj))

    def find(self, bbox):
        (x0, y0, x1, y1) = bbox
        done = set()
        for k in self._cells(bbox):
            cell = self._grid.get(k)
            if not cell:
                continue
            for obj in cell:
                if id(obj) in done:
                    continue
                done.add(id(obj))
                if obj.x1 <= x0 or x1 <= obj.x0 or obj.y1 <= y0 or y1 <= obj.y0:
                    continue
                yield obj

    def any_between(self, x0, y0, x1, y1, o1, o2) -> bool:
        """Existence-only variant of find((x0,y0,x1,y1)) excluding o1/o2
        — the group_textboxes isany predicate. Same overlap semantics as
        find, but no dedup set and no generator: an existence scan can
        return on the first hit, and a duplicate cell visit cannot change
        the answer. This is the hottest call of layout analysis (one per
        candidate merge), worth the specialized loop."""
        if x1 <= self.x0 or self.x1 <= x0 or y1 <= self.y0 or self.y1 <= y0:
            return False
        cx0 = max(self.x0, x0)
        cy0 = max(self.y0, y0)
        cx1 = min(self.x1, x1)
        cy1 = min(self.y1, y1)
        g = self.gridsize
        grid = self._grid
        for gy in range(int(cy0) // g, int(cy1 + g) // g):
            for gx in range(int(cx0) // g, int(cx1 + g) // g):
                cell = grid.get((gx, gy))
                if not cell:
                    continue
                for obj in cell:
                    if obj is o1 or obj is o2:
                        continue
                    if obj.x1 <= x0 or x1 <= obj.x0 or \
                            obj.y1 <= y0 or y1 <= obj.y0:
                        continue
                    return True
        return False


# -- chars -> lines (reference group_objects, layout.py:496-565) --------------

def _pairwise_align(laparams: LAParams, chars: list):
    """Vectorized halign/valign predicates for consecutive char pairs
    (the inner predicates of reference group_objects, layout.py:501-538).

    Returns (halign, valign) boolean arrays of length len(chars)-1; the
    comparisons mirror the scalar formulas exactly (same FP operations),
    evaluated with numpy over shifted coordinate arrays — the per-page
    vectorization win called out in SURVEY.md §2.4.
    """
    import numpy as np

    n = len(chars)
    x0 = np.empty(n)
    y0 = np.empty(n)
    x1 = np.empty(n)
    y1 = np.empty(n)
    for (i, c) in enumerate(chars):
        x0[i] = c.x0
        y0[i] = c.y0
        x1[i] = c.x1
        y1[i] = c.y1
    (ax0, ay0, ax1, ay1) = (x0[:-1], y0[:-1], x1[:-1], y1[:-1])
    (bx0, by0, bx1, by1) = (x0[1:], y0[1:], x1[1:], y1[1:])
    aw = ax1 - ax0
    ah = ay1 - ay0
    bw = bx1 - bx0
    bh = by1 - by0
    lo = laparams.line_overlap
    cm = laparams.char_margin
    # is_voverlap / voverlap / hdistance (reference utils semantics)
    is_vov = (by0 <= ay1) & (ay0 <= by1)
    vov = np.where(is_vov,
                   np.minimum(np.abs(ay0 - by1), np.abs(ay1 - by0)), 0.0)
    hdist = np.where((bx0 <= ax1) & (ax0 <= bx1), 0.0,
                     np.minimum(np.abs(ax0 - bx1), np.abs(ax1 - bx0)))
    halign = (is_vov
              & (np.minimum(ah, bh) * lo < vov)
              & (hdist < np.maximum(aw, bw) * cm))
    if laparams.detect_vertical:
        is_hov = (bx0 <= ax1) & (ax0 <= bx1)
        hov = np.where(is_hov,
                       np.minimum(np.abs(ax0 - bx1), np.abs(ax1 - bx0)), 0.0)
        vdist = np.where(is_vov, 0.0,
                         np.minimum(np.abs(ay0 - by1), np.abs(ay1 - by0)))
        valign = (is_hov
                  & (np.minimum(aw, bw) * lo < hov)
                  & (vdist < np.maximum(ah, bh) * cm))
    else:
        valign = np.zeros(n - 1, dtype=bool)
    return (halign, valign)


def group_chars_to_lines(laparams: LAParams, chars: list) -> list:
    """Sequential clustering of the emission-ordered char stream."""
    lines = []
    obj0 = None
    line = None
    wm = laparams.word_margin
    (halign_arr, valign_arr) = _pairwise_align(laparams, chars) \
        if len(chars) > 1 else ([], [])
    for (idx, obj1) in enumerate(chars):
        if obj0 is not None:
            halign = halign_arr[idx - 1]
            valign = valign_arr[idx - 1]
            if (halign and isinstance(line, TextLineH)) or \
               (valign and isinstance(line, TextLineV)):
                line.add_char(obj1)
            elif line is not None:
                lines.append(line)
                line = None
            else:
                if valign and not halign:
                    line = TextLineV(wm)
                    line.add_char(obj0)
                    line.add_char(obj1)
                elif halign and not valign:
                    line = TextLineH(wm)
                    line.add_char(obj0)
                    line.add_char(obj1)
                else:
                    line = TextLineH(wm)
                    line.add_char(obj0)
                    lines.append(line)
                    line = None
        obj0 = obj1
    if line is None:
        line = TextLineH(laparams.word_margin)
        line.add_char(obj0)
    lines.append(line)
    return lines


# -- lines -> boxes (reference group_textlines, layout.py:568-596) ------------

def group_lines_to_boxes(laparams: LAParams, lines: list, page_bbox) -> list:
    plane = Plane(page_bbox)
    plane.extend(lines)
    membership: dict[int, TextBox] = {}
    for line in lines:
        neighbors = line.find_neighbors(plane, laparams.line_margin)
        if not any(o is line for o in neighbors):
            continue
        members = []
        for obj1 in neighbors:
            members.append(obj1)
            if id(obj1) in membership:
                prev_box = membership.pop(id(obj1))
                # pop every member of the dissolved box exactly once
                members.extend(prev_box.objs)
                for o in prev_box.objs:
                    membership.pop(id(o), None)
        if isinstance(line, TextLineH):
            box = TextBoxH()
        else:
            box = TextBoxV()
        seen = set()
        for obj in members:
            if id(obj) in seen:
                continue
            seen.add(id(obj))
            box.add(obj)
            membership[id(obj)] = box
        del box
    out = []
    done = set()
    for line in lines:
        box = membership.get(id(line))
        if box is None:
            continue
        if id(box) in done:
            continue
        done.add(id(box))
        if not box.is_empty():
            out.append(box)
    return out


# -- boxes -> reading order (reference group_textboxes, layout.py:599-664) ----

def _boxes_dist(o1, o2):
    # conditional expressions instead of min()/max() builtins: this and
    # isany are the two hottest scalar helpers of layout analysis, and
    # the four builtin calls per invocation were ~25% of its tottime
    (a0, b0, a1, b1) = (o1.x0, o1.y0, o1.x1, o1.y1)
    (c0, d0, c1, d1) = (o2.x0, o2.y0, o2.x1, o2.y1)
    x0 = a0 if a0 < c0 else c0
    y0 = b0 if b0 < d0 else d0
    x1 = a1 if a1 > c1 else c1
    y1 = b1 if b1 > d1 else d1
    return ((x1 - x0) * (y1 - y0)
            - (a1 - a0) * (b1 - b0)
            - (c1 - c0) * (d1 - d0))


def group_textboxes(boxes: list, page_bbox) -> list:
    """Agglomerative min-distance merging into a binary group tree.

    The reference keeps a list it re-sorts by (penalty-class, distance,
    list-position) after every merge and filters dead pairs eagerly
    (layout.py:634-662, its own "XXX O(n^2)" hotspot). A lazy-deletion
    heap keyed (c, d, insertion-seq) pops pairs in the IDENTICAL order —
    stable-sort position equals insertion sequence, appends get fresh
    sequence numbers, dead pairs are skipped at pop — while dropping the
    per-merge O(k log k) re-sort + O(k) rebuild to amortized O(log k).
    Golden XML layout sections pin the equivalence.
    """
    import heapq

    assert boxes
    plane = Plane(page_bbox)
    plane.extend(boxes)

    any_between = plane.any_between

    def isany(o1, o2):
        # any third object inside the union bbox? (existence-only scan)
        (a0, b0, a1, b1) = (o1.x0, o1.y0, o1.x1, o1.y1)
        (c0, d0, c1, d1) = (o2.x0, o2.y0, o2.x1, o2.y1)
        return any_between(
            a0 if a0 < c0 else c0, b0 if b0 < d0 else d0,
            a1 if a1 > c1 else c1, b1 if b1 > d1 else d1, o1, o2)

    # `heap` models the list portion sorted at the last merge (popped in
    # (c, d, seq) order — seq reproduces the stable-sort tiebreak);
    # `tail` models entries appended since then (demotions), consumed
    # FIFO only after the sorted portion drains, exactly like pop(0) on
    # the reference's partially-sorted list. A merge re-sorts everything
    # in the reference == flushing the tail into the heap here.
    # initial pair distances as one numpy broadcast (same left-to-right
    # float associativity as _boxes_dist -> bit-identical values)
    import numpy as np

    n = len(boxes)
    bx0 = np.array([o.x0 for o in boxes])
    by0 = np.array([o.y0 for o in boxes])
    bx1 = np.array([o.x1 for o in boxes])
    by1 = np.array([o.y1 for o in boxes])
    area = (bx1 - bx0) * (by1 - by0)
    D = ((np.maximum.outer(bx1, bx1) - np.minimum.outer(bx0, bx0))
         * (np.maximum.outer(by1, by1) - np.minimum.outer(by0, by0))
         - area[:, None] - area[None, :])
    heap: list = []
    tail: list = []
    seq = 0
    for i in range(n):
        o1 = boxes[i]
        Di = D[i].tolist()
        for j in range(i + 1, n):
            heap.append((0, Di[j], seq, o1, boxes[j]))
            seq += 1
    del D
    heapq.heapify(heap)
    tail_pos = 0
    # liveness via the plane's id-set directly: the pop loop tests ~n^2
    # dead pairs over a page, and the bound-method __contains__ call was
    # its hottest line (id() + attribute + call overhead per test)
    alive = plane._objs
    heappop = heapq.heappop
    while True:
        # next live entry: sorted portion first, then the FIFO tail
        entry = None
        while heap:
            cand = heappop(heap)
            if id(cand[3]) in alive and id(cand[4]) in alive:
                entry = cand
                break
        if entry is None:
            while tail_pos < len(tail):
                cand = tail[tail_pos]
                tail_pos += 1
                if id(cand[3]) in alive and id(cand[4]) in alive:
                    entry = cand
                    break
            if entry is None:
                break
        (c, d, _, o1, o2) = entry
        if c == 0 and isany(o1, o2):
            tail.append((1, d, seq, o1, o2))
            seq += 1
            continue
        if (isinstance(o1, (TextBoxV, TextGroupTBRL))
                or isinstance(o2, (TextBoxV, TextGroupTBRL))):
            group = TextGroupTBRL([o1, o2])
        else:
            group = TextGroupLRTB([o1, o2])
        plane.remove(o1)
        plane.remove(o2)
        # the reference re-sorts the whole worklist here: flush the tail
        # back into the sorted portion, then add the new group's pairs
        for t in tail[tail_pos:]:
            heapq.heappush(heap, t)
        tail = []
        tail_pos = 0
        for other in plane:
            heapq.heappush(heap, (0, _boxes_dist(group, other), seq,
                                  group, other))
            seq += 1
        plane.add(group)
    return list(plane)


def _assign_indices(obj, counter):
    """DFS reading-order index assignment (reference IndexAssigner,
    layout.py:15-28); handles a bare TextBox at the top level."""
    if isinstance(obj, TextBox):
        obj.index = counter[0]
        counter[0] += 1
    elif isinstance(obj, TextGroup):
        for o in obj.objs:
            _assign_indices(o, counter)


def _analyze_group(obj, boxes_flow):
    if not isinstance(obj, TextGroup):
        return
    for o in obj.objs:
        _analyze_group(o, boxes_flow)
    obj.order(boxes_flow)


# -- page analysis (reference LTLayoutContainer.analyze, layout.py:666-694) ---

def analyze_container(container, laparams: LAParams) -> None:
    """Analyze a Page or (when all_texts) Figure container in place.

    After this, ``container.objs`` = ordered textboxes + other items +
    empty lines, each textline terminated with a '\\n' Anno.
    """
    textobjs = []
    otherobjs = []
    for o in container.objs:
        (textobjs if isinstance(o, Char) else otherobjs).append(o)
    for o in otherobjs:
        if isinstance(o, Figure) and laparams.all_texts:
            analyze_container(o, laparams)
    if not textobjs:
        return
    textlines = group_chars_to_lines(laparams, textobjs)
    empties = [ln for ln in textlines if ln.is_empty()]
    textlines = [ln for ln in textlines if not ln.is_empty()]
    for ln in empties:
        ln.finish()
    textboxes = group_lines_to_boxes(laparams, textlines, container.bbox)
    if -1 <= laparams.boxes_flow <= +1 and textboxes:
        groups = group_textboxes(textboxes, container.bbox)
        # finishing lines + ordering them within each box happens only on
        # this path (reference: box.analyze is reached via group.analyze)
        for box in textboxes:
            for ln in box.objs:
                ln.finish()
            box.order_lines()
        counter = [0]
        for g in groups:
            _analyze_group(g, laparams.boxes_flow)
            _assign_indices(g, counter)
        container.groups = groups
        textboxes.sort(key=lambda b: b.index)
    else:
        def getkey(box):
            if isinstance(box, TextBoxV):
                return (0, -box.x1, box.y0)
            return (1, box.y0, box.x0)

        textboxes.sort(key=getkey)
    container.objs = textboxes + otherobjs + empties
