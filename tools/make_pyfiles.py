#!/usr/bin/env python3
"""Package pdfminer_spark (code + compiled resources) into a --py-files zip.

    python3 tools/make_pyfiles.py        # -> dist/pdfminer_spark.zip
    spark-submit --py-files dist/pdfminer_spark.zip job.py
"""
import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "dist", "pdfminer_spark.zip")


def main() -> None:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pkg = os.path.join(REPO, "pdfminer_spark")
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as zf:
        for (root, _dirs, files) in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in files:
                path = os.path.join(root, fn)
                arc = os.path.relpath(path, REPO)
                zf.write(path, arc)
    size = os.path.getsize(OUT) / 1e6
    print(f"wrote {OUT} ({size:.1f} MB)")


if __name__ == "__main__":
    main()
