"""Graphics-state color capture (VERDICT r2 next #8): stroke/fill color
values are carried in the gstate and stamped on Shape records as
metadata. The reference parses these operators but discards the values
(pdfinterp.py:583-611 no-op bodies) and no golden format prints them,
so the byte-exact golden suite is unaffected by design."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from gen_testpdfs import basic  # noqa: E402

from pdfminer_spark.pdf.extract import extract_pages  # noqa: E402
from pdfminer_spark.pdf.layout import Shape  # noqa: E402


def _shapes(pdf_bytes):
    (page,) = extract_pages(pdf_bytes, laparams=None)
    return [o for o in page.objs if isinstance(o, Shape)]


def test_rgb_and_gray_colors_stamped_on_shapes():
    content = (b"1 0 0 RG 0 0.5 1 rg 2 w "
               b"100 100 50 40 re B "        # stroked+filled rect
               b"0.25 G 0.75 g "
               b"200 200 m 260 200 l S")     # gray-stroked line
    shapes = _shapes(basic(content))
    assert [s.kind for s in shapes] == ["rect", "line"]
    rect, line = shapes
    assert rect.scolor == (1, 0, 0)
    assert rect.ncolor == (0, 0.5, 1)
    assert line.scolor == (0.25,)
    assert line.ncolor == (0.75,)


def test_cmyk_scn_and_q_restore():
    content = (b"0 1 0 0 K 0.1 0.2 0.3 0.4 k "
               b"10 10 m 10 60 l S "                 # cmyk stroke
               b"q /DeviceRGB CS 0.9 0.1 0.1 SCN "
               b"20 10 m 20 60 l S Q "               # SCN inside q..Q
               b"30 10 m 30 60 l S")                 # restored cmyk
    shapes = _shapes(basic(content))
    assert [s.kind for s in shapes] == ["line", "line", "line"]
    (l1, l2, l3) = shapes
    assert l1.scolor == (0, 1, 0, 0)
    assert l1.ncolor == (0.1, 0.2, 0.3, 0.4)
    assert l2.scolor == (0.9, 0.1, 0.1)
    assert l3.scolor == (0, 1, 0, 0)  # Q restored the pre-q stroke color


def test_default_color_is_none():
    shapes = _shapes(basic(b"40 10 m 40 60 l S"))
    assert shapes[0].scolor is None and shapes[0].ncolor is None
