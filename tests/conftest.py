import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURES = os.path.join(REPO, "fixtures")
PAYLOADS = os.path.join(FIXTURES, "payloads")
GOLDENS = os.path.join(FIXTURES, "goldens")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def payload(name: str) -> bytes:
    with open(os.path.join(PAYLOADS, name + ".pdf"), "rb") as fp:
        return fp.read()


def golden_text(name: str) -> str:
    with open(os.path.join(GOLDENS, name + ".txt.ref"), "rb") as fp:
        return fp.read().decode("utf-8")


@pytest.fixture(scope="session")
def spark():
    from pdfminer_spark.spark.session import get_spark

    s = get_spark("pdfminer-spark-tests", cpus=4, shuffle_partitions=8)
    yield s
    s.stop()
