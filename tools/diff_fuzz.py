#!/usr/bin/env python3
"""Property-based differential fuzzer: random-but-valid content streams,
our engine vs the reference implementation, full text+XML comparison.

Requires the reference checkout (read-only) on PYTHONPATH; used in-session
for divergence hunting, not in CI.

    python3 tools/diff_fuzz.py [iterations] [seed]
"""
from __future__ import annotations

import io
import random
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/repo/tools")

from gen_testpdfs import FONT, basic  # noqa: E402

WORDS = [b"alpha", b"beta", b"gamma", b"delta", b"Hello", b"World",
         b"x", b"Y", b"(esc)", b"a b  c", b"mix3d t0kens", b"trailing "]


DIFF_FONT = (b"<< /Type /Font /Subtype /Type1 /BaseFont /Times-Roman "
             b"/Encoding << /Type /Encoding /BaseEncoding /MacRomanEncoding "
             b"/Differences [ 97 /exclam 98 /at /numbersign ] >> >>")


def rand_content(rng: random.Random) -> bytes:
    ops: list[bytes] = []
    n_blocks = rng.randint(1, 6)
    for _ in range(n_blocks):
        font = rng.choice([b"/F1", b"/F1", b"/F2"])
        ops.append(b"BT %s %d Tf" % (font, rng.randint(4, 36)))
        if rng.random() < 0.15:
            ops.append(b"% comment line\n")
        x = rng.randint(0, 600)
        y = rng.randint(0, 780)
        ops.append(b"%d %d Td" % (x, y))
        if rng.random() < 0.4:
            ops.append(b"%d Tz" % rng.choice([50, 80, 100, 120, 200]))
        if rng.random() < 0.3:
            ops.append(b"%.1f Tc" % (rng.random() * 4))
        if rng.random() < 0.3:
            ops.append(b"%.1f Tw" % (rng.random() * 6))
        if rng.random() < 0.3:
            ops.append(b"%.1f Ts" % (rng.random() * 8 - 4))
        if rng.random() < 0.3:
            ops.append(b"%d TL" % rng.randint(8, 30))
        n_shows = rng.randint(1, 8)
        for _ in range(n_shows):
            w = rng.choice(WORDS).replace(b"(", b"\\(").replace(b")", b"\\)")
            kind = rng.random()
            if kind < 0.35:
                ops.append(b"(%s) Tj" % w)
            elif kind < 0.45:
                ops.append(b"<%s> Tj" % rng.choice(WORDS).hex().encode())
            elif kind < 0.6:
                parts = b" ".join(
                    b"(%s) %d" % (w, rng.randint(-3000, 1000))
                    for _ in range(rng.randint(1, 4)))
                ops.append(b"[ %s ] TJ" % parts)
            elif kind < 0.75:
                ops.append(b"(%s) '" % w)
            elif kind < 0.85:
                ops.append(b"%.1f %.1f (%s) \"" % (rng.random() * 4,
                                                   rng.random() * 2, w))
            else:
                ops.append(b"T* (%s) Tj" % w)
            if rng.random() < 0.4:
                ops.append(b"%d %d Td" % (rng.randint(-50, 50),
                                          rng.randint(-40, 0)))
        ops.append(b"ET")
        if rng.random() < 0.3:
            ops.append(b"q %.2f 0 0 %.2f %d %d cm" %
                       (0.5 + rng.random(), 0.5 + rng.random(),
                        rng.randint(0, 100), rng.randint(0, 100)))
            ops.append(b"BT /F1 8 Tf 0 0 Td (nested) Tj ET Q")
        if rng.random() < 0.3:
            (a, b) = (rng.randint(0, 500), rng.randint(0, 700))
            ops.append(b"%d %d m %d %d l S" % (a, b, a + 50, b))
    return b" ".join(ops)


def rand_laparams(rng: random.Random) -> dict:
    """Random layout knobs, including the out-of-range boxes_flow branch
    and all_texts figure analysis."""
    kw = {}
    if rng.random() < 0.7:
        kw["detect_vertical"] = True
    if rng.random() < 0.4:
        kw["char_margin"] = rng.choice([0.5, 1.0, 2.0, 4.0, 8.0])
    if rng.random() < 0.4:
        kw["line_margin"] = rng.choice([0.1, 0.3, 0.5, 1.0, 2.0])
    if rng.random() < 0.4:
        kw["word_margin"] = rng.choice([0.0, 0.05, 0.1, 0.5, 1.0])
    if rng.random() < 0.4:
        kw["line_overlap"] = rng.choice([0.1, 0.5, 0.9])
    if rng.random() < 0.4:
        kw["boxes_flow"] = rng.choice([-1.0, -0.5, 0.0, 0.5, 1.0, 2.0, -3.0])
    if rng.random() < 0.3:
        kw["all_texts"] = True
    return kw


def ref_out(data: bytes, xml: bool, la_kwargs: dict | None = None,
            rotation: int = 0):
    from pdfminer.converter import TextConverter, XMLConverter
    from pdfminer.layout import LAParams
    from pdfminer.pdfinterp import PDFPageInterpreter, PDFResourceManager
    from pdfminer.pdfpage import PDFPage

    rsrc = PDFResourceManager()
    out = io.StringIO()
    cls = XMLConverter if xml else TextConverter
    if la_kwargs is None:
        la_kwargs = {"detect_vertical": True}
    device = cls(rsrc, out, laparams=LAParams(**la_kwargs))
    interp = PDFPageInterpreter(rsrc, device)
    for page in PDFPage.get_pages(io.BytesIO(data)):
        # the reference CLI's -R handling (tools/pdf2txt.py:110)
        page.rotate = (page.rotate + rotation) % 360
        interp.process_page(page)
    device.close()
    return out.getvalue()


def hostile() -> int:
    """--hostile: the adversarial construct set (VERDICT r5 #6) through
    the in-UDF extraction boundary under a wall cap — every payload must
    come back as an ok/error:* status, never a hang, RecursionError or
    crash. The fixture builders live with their pytest
    (tests/test_hostile_pdfs.py); this mode is the batch-report runner."""
    import time

    sys.path.insert(0, "/root/repo/tests")
    from test_hostile_pdfs import HOSTILE, WALL_CAP

    from pdfminer_spark.spark.pipeline import extract_one

    bad = 0
    for (name, fn) in sorted(HOSTILE.items()):
        t0 = time.time()
        try:
            (_text, n_pages, _nb, _by, status) = extract_one(
                "", "pdf", pdf_bytes=fn())
        except Exception as e:  # must be impossible: boundary swallows
            print(f"{name}: ESCAPED {type(e).__name__}: {e}")
            bad += 1
            continue
        wall = time.time() - t0
        ok = (wall < WALL_CAP
              and (status.startswith("ok") or status.startswith("error:"))
              and status != "error:RecursionError")
        if not ok:
            bad += 1
        print(f"{name}: {status} pages={n_pages} wall={wall:.2f}s"
              f"{'' if ok else '  <-- FAIL'}")
    print(f"{len(HOSTILE)} hostile constructs, {bad} failures")
    return 1 if bad else 0


def mutate(iters: int, seed: int) -> int:
    """--mutate N [seed]: mutational robustness fuzz. Generate a valid
    random PDF, corrupt 1-16 random bytes (or truncate / splice), and
    drive it through the in-UDF extraction boundary: every mutant must
    come back ok/error:* within the wall cap — no hang, no crash, no
    RecursionError. Complements --hostile (hand-built constructs) with
    breadth: random damage lands in the lexer, xref, filters, fonts."""
    import time

    from pdfminer_spark.spark.pipeline import extract_one

    from gen_testpdfs import basic

    rng = random.Random(seed)
    bad = 0
    worst = 0.0
    for i in range(iters):
        pdf = bytearray(basic(rand_content(rng),
                              rotate=rng.choice([0, 90, 180, 270])))
        kind = rng.random()
        if kind < 0.7:  # byte corruption
            for _ in range(rng.randint(1, 16)):
                pdf[rng.randrange(len(pdf))] = rng.randrange(256)
        elif kind < 0.85:  # truncation
            del pdf[rng.randrange(1, len(pdf)):]
        else:  # splice a random chunk over a random position
            src = rng.randrange(len(pdf))
            dst = rng.randrange(len(pdf))
            ln = rng.randint(4, 256)
            pdf[dst:dst + ln] = pdf[src:src + ln]
        t0 = time.time()
        try:
            (_t, _p, _b, _y, status) = extract_one(
                "", "pdf", pdf_bytes=bytes(pdf))
        except Exception as e:
            print(f"[{i}] ESCAPED {type(e).__name__}: {e}")
            bad += 1
            continue
        wall = time.time() - t0
        worst = max(worst, wall)
        if wall > 30.0 or status == "error:RecursionError":
            print(f"[{i}] {status} wall={wall:.1f}s <-- FAIL")
            with open(f"/tmp/mutfuzz_fail_{i}.pdf", "wb") as fp:
                fp.write(bytes(pdf))
            bad += 1
    print(f"{iters} mutants, {bad} failures, worst wall {worst:.2f}s")
    return 1 if bad else 0


def mutate_fonts(iters: int, seed: int) -> int:
    """--mutate-fonts N [seed]: font/CMap-surface mutation fuzz (r6
    verdict #6). Each iteration takes one of the hand-built font-attack
    fixtures (CID font + embedded TTF cmap / ToUnicode CMap / W arrays /
    CFF / Type1 programs) and corrupts 1-16 random bytes — damage lands
    concentrated in the font-parsing paths instead of uniformly over
    the file. Same contract as --mutate: ok/error:* within the wall cap,
    never a hang or RecursionError."""
    import time

    sys.path.insert(0, "/root/repo/tests")
    from test_hostile_pdfs import HOSTILE

    from pdfminer_spark.spark.pipeline import extract_one

    font_fixtures = [
        HOSTILE[n] for n in (
            "tounicode_giant_ranges", "usecmap_self", "tt_cmap_format4_bomb",
            "tt_cmap_format2_bomb", "type0_self_descendant",
            "w_array_2g_range", "cff_fontfile3_garbage",
            "type1_fontfile_garbage", "huge_w_array")
    ]
    rng = random.Random(seed)
    bad = 0
    worst = 0.0
    for i in range(iters):
        pdf = bytearray(rng.choice(font_fixtures)())
        for _ in range(rng.randint(1, 16)):
            pdf[rng.randrange(len(pdf))] = rng.randrange(256)
        t0 = time.time()
        try:
            (_t, _p, _b, _y, status) = extract_one(
                "", "pdf", pdf_bytes=bytes(pdf))
        except Exception as e:
            print(f"[{i}] ESCAPED {type(e).__name__}: {e}")
            bad += 1
            continue
        wall = time.time() - t0
        worst = max(worst, wall)
        if wall > 30.0 or status == "error:RecursionError":
            print(f"[{i}] {status} wall={wall:.1f}s <-- FAIL")
            with open(f"/tmp/fontfuzz_fail_{i}.pdf", "wb") as fp:
                fp.write(bytes(pdf))
            bad += 1
    print(f"{iters} font mutants, {bad} failures, worst wall {worst:.2f}s")
    return 1 if bad else 0


def main() -> int:
    if "--hostile" in sys.argv:
        return hostile()
    if "--mutate-fonts" in sys.argv:
        args = [a for a in sys.argv[1:] if not a.startswith("--")]
        return mutate_fonts(int(args[0]) if args else 2000,
                            int(args[1]) if len(args) > 1 else 42)
    if "--mutate" in sys.argv:
        args = [a for a in sys.argv[1:] if not a.startswith("--")]
        return mutate(int(args[0]) if args else 2000,
                      int(args[1]) if len(args) > 1 else 42)
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 42
    from pdfminer_spark.pdf.extract import extract_text
    from pdfminer_spark.pdf.layout import LAParams
    from pdfminer_spark.pdf.xmlout import extract_xml

    from gen_testpdfs import _classic_pdf, _stream_obj

    def build(content, rot):
        return _classic_pdf({
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                b"/Rotate %d /Resources << /Font << /F1 4 0 R /F2 6 0 R >> "
                b">> /Contents 5 0 R >>" % rot),
            4: FONT,
            5: _stream_obj(b"", content),
            6: DIFF_FONT,
        })

    rng = random.Random(seed)
    fails = 0
    for i in range(iters):
        rot = rng.choice([0, 0, 0, 90, 180, 270])
        # CLI -R adds on top of /Rotate — fuzz their composition too
        extra_rot = rng.choice([0, 0, 0, 90, 180, 270])
        pdf = build(rand_content(rng), rot)
        la_kwargs = rand_laparams(rng)
        la = LAParams(**la_kwargs)
        try:
            mt = extract_text(pdf, laparams=la, rotation=extra_rot)
            mx = extract_xml(pdf, laparams=la, rotation=extra_rot)
        except Exception as e:
            print(f"[{i}] OUR-ERROR {type(e).__name__}: {e} la={la_kwargs}")
            fails += 1
            continue
        rt = ref_out(pdf, False, la_kwargs, rotation=extra_rot)
        rx = ref_out(pdf, True, la_kwargs, rotation=extra_rot)
        if mt != rt or mx != rx:
            fails += 1
            print(f"[{i}] DIVERGENCE rot={rot}+R{extra_rot} la={la_kwargs}")
            for (a, b, tag) in ((mt, rt, "text"), (mx, rx, "xml")):
                if a != b:
                    for j in range(min(len(a), len(b))):
                        if a[j] != b[j]:
                            print(f"  {tag} @{j}:")
                            print("   got:", repr(a[max(0, j-50):j+50]))
                            print("   ref:", repr(b[max(0, j-50):j+50]))
                            break
                    else:
                        print(f"  {tag} length {len(a)} vs {len(b)}")
            with open(f"/tmp/fuzz_fail_{i}.pdf", "wb") as fp:
                fp.write(pdf)
            if fails >= 5:
                break
    print(f"{iters} iterations, {fails} divergences")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
