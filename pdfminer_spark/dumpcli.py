"""dumppdf-compatible CLI (reference tools/dumppdf.py flag surface).

    python -m pdfminer_spark.dumpcli [-P password] [-a] [-p pageid]
        [-i objid] [-o output] [-r|-b|-t] [-T] [-O output_dir]
        input.pdf ...

Byte-identical output to the reference tool for the trailer / -a / -i /
-p / -t modes (goldens in tests/test_dump.py). -T dumps outlines; the
reference's own -T crashes on documents that have any (see pdf/dump.py
docstring), ours does not.
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
        (opts, args) = getopt.getopt(argv[1:], "dP:ap:i:o:rbtTO:")
    except getopt.GetoptError:
        return usage()
    if not args:
        return usage()
    password = b""
    objids: list[int] = []
    pagenos: set[int] = set()
    mode = None
    dumpall = False
    outlines = False
    outfile = None
    extractdir = None
    for (k, v) in opts:
        if k == "-P":
            password = v.encode("ascii")
        elif k == "-a":
            dumpall = True
        elif k == "-p":
            pagenos.update(int(x) - 1 for x in v.split(","))
        elif k == "-i":
            objids.extend(int(x) for x in v.split(","))
        elif k == "-o":
            outfile = v
        elif k == "-r":
            mode = "raw"
        elif k == "-b":
            mode = "binary"
        elif k == "-t":
            mode = "text"
        elif k == "-T":
            outlines = True
        elif k == "-O":
            extractdir = v

    from pdfminer_spark.pdf.dump import (dump_pdf, dumpoutline,
                                         extract_embedded_to_dir)

    out_parts: list[str] = []
    for fname in args:
        with open(fname, "rb") as fp:
            data = fp.read()
        if extractdir is not None:
            for name in extract_embedded_to_dir(data, extractdir,
                                                password=password):
                print("extracting: %r" % (extractdir + "/" + name),
                      file=sys.stderr)
        elif outlines:
            import io

            buf = io.StringIO()
            dumpoutline(buf, data, password=password)
            out_parts.append(buf.getvalue())
        else:
            out_parts.append(dump_pdf(data, password=password, objids=objids,
                                      pagenos=pagenos, dumpall=dumpall,
                                      mode=mode))
    text = "".join(out_parts)
    if mode in ("raw", "binary"):
        # stream bytes travel latin-1-decoded inside the dump string; a
        # UTF-8 text handle would expand every byte >= 0x80 to two bytes
        payload = text.encode("latin-1")
        if outfile:
            with open(outfile, "wb") as fp:
                fp.write(payload)
        else:
            sys.stdout.buffer.write(payload)
        return 0
    if outfile:
        with open(outfile, "w") as fp:
            fp.write(text)
    else:
        sys.stdout.write(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
