"""pdf2txt-compatible CLI (reference tools/pdf2txt.py flag surface).

    python -m pdfminer_spark.cli [-P password] [-o output] [-t text|xml|html|tag]
        [-O image_dir] [-c encoding] [-s scale] [-R rotation]
        [-Y normal|loose|exact] [-p pagenos] [-m maxpages]
        [-S] [-C] [-n] [-A] [-V] [-M char_margin] [-L line_margin]
        [-W word_margin] [-F boxes_flow] [-d] input.pdf ...

A user of the reference's ``pdf2txt.py`` can switch to this entry point with
the same flags and get byte-identical output (goldens in tests/).
"""
from __future__ import annotations

import getopt
import sys


def main(argv=None) -> int:
    argv = list(sys.argv if argv is None else argv)

    def usage() -> int:
        print(__doc__)
        return 100

    try:
        (opts, args) = getopt.getopt(argv[1:], "dP:o:t:O:c:s:R:Y:p:m:SCnAVM:W:L:F:")
    except getopt.GetoptError:
        return usage()
    if not args:
        return usage()

    from pdfminer_spark.pdf.layout import LAParams

    password = b""
    outfile = None
    outtype = None
    encoding = "utf-8"
    scale = 1
    layoutmode = "normal"
    pagenos: set[int] = set()
    maxpages = 0
    stripcontrol = False
    imagedir = None
    rotation = 0
    caching = True
    debug = 0
    laparams: LAParams | None = LAParams()
    for (k, v) in opts:
        if k == "-d":
            debug += 1
        elif k == "-P":
            password = v.encode("ascii")
        elif k == "-o":
            outfile = v
        elif k == "-O":
            imagedir = v
        elif k == "-R":
            rotation = int(v)
        elif k == "-C":
            caching = False
        elif k == "-t":
            outtype = v
        elif k == "-c":
            encoding = v
        elif k == "-s":
            scale = float(v)
        elif k == "-Y":
            layoutmode = v
        elif k == "-p":
            pagenos.update(int(x) - 1 for x in v.split(","))
        elif k == "-m":
            maxpages = int(v)
        elif k == "-S":
            stripcontrol = True
        elif k == "-n":
            laparams = None
        elif k == "-A" and laparams:
            laparams.all_texts = True
        elif k == "-V" and laparams:
            laparams.detect_vertical = True
        elif k == "-M" and laparams:
            laparams.char_margin = float(v)
        elif k == "-W" and laparams:
            laparams.word_margin = float(v)
        elif k == "-L" and laparams:
            laparams.line_margin = float(v)
        elif k == "-F" and laparams:
            laparams.boxes_flow = float(v)

    if not outtype:
        outtype = "text"
        if outfile:
            if outfile.endswith((".htm", ".html")):
                outtype = "html"
            elif outfile.endswith(".xml"):
                outtype = "xml"
            elif outfile.endswith(".tag"):
                outtype = "tag"

    page_numbers = sorted(pagenos) if pagenos else None
    pieces: list[str] = []
    for fname in args:
        with open(fname, "rb") as fp:
            data = fp.read()
        kwargs = dict(password=password, page_numbers=page_numbers,
                      maxpages=maxpages, laparams=laparams,
                      rotation=rotation, caching=caching)
        pages = None
        if imagedir is not None and outtype in ("text", "xml", "html"):
            # one interpretation feeds both the text sink and the image
            # sink (reference: ImageWriter exports during receive_layout)
            from pdfminer_spark.pdf.extract import extract_pages
            from pdfminer_spark.pdf.images import write_layout_images

            pages = extract_pages(data, **kwargs)
            written = write_layout_images(pages, imagedir)
            if debug:
                for w in written:
                    print("extracted image: %s/%s" % (imagedir, w),
                          file=sys.stderr)
        if debug:
            print("processing %s (%s)" % (fname, outtype), file=sys.stderr)
        if outtype == "text":
            from pdfminer_spark.pdf.extract import extract_text

            pieces.append(extract_text(data, pages=pages, **kwargs))
        elif outtype == "xml":
            from pdfminer_spark.pdf.xmlout import extract_xml

            pieces.append(extract_xml(data, stripcontrol=stripcontrol,
                                      pages=pages, **kwargs))
        elif outtype == "html":
            from pdfminer_spark.pdf.htmlout import extract_html

            pieces.append(extract_html(data, scale=scale,
                                       layoutmode=layoutmode,
                                       pages=pages, **kwargs))
        elif outtype == "tag":
            from pdfminer_spark.pdf.tags import extract_tags

            pieces.append(extract_tags(data, password=password,
                                       page_numbers=page_numbers,
                                       maxpages=maxpages))
        else:
            return usage()
    out = "".join(pieces)
    if outfile:
        with open(outfile, "w", encoding=encoding) as fp:
            fp.write(out)
    else:
        sys.stdout.write(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
