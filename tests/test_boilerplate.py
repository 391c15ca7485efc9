"""HTML boilerplate-strip goldens (north_rule; fixtures defined by us —
FIXTURES.md §4)."""
import random

from pdfminer_spark.html.boilerplate import extract_main_text
from pdfminer_spark.spark.fixtures import _html_payload


def test_fixture_payloads_roundtrip():
    for seed in range(10):
        rng = random.Random(seed)
        (html, expected) = _html_payload(rng, seed * 31)
        assert extract_main_text(html) == expected


def test_nav_footer_sidebar_stripped():
    html = """<html><body>
    <nav><a href="/">Home</a> <a href="/b">Blog</a> <a href="/c">Contact</a></nav>
    <div id="main-content"><p>The quick brown fox jumps over the lazy dog
    and keeps running through the long paragraph of real content.</p></div>
    <aside>Related: <a href="/1">one</a> <a href="/2">two</a></aside>
    <footer>copyright 2026 <a href="/tos">terms</a></footer>
    </body></html>"""
    out = extract_main_text(html)
    assert "quick brown fox" in out
    assert "Home" not in out
    assert "copyright" not in out
    assert "Related" not in out


def test_link_dense_block_dropped():
    html = ("<body><p><a href='/1'>one two three</a> <a href='/2'>four five"
            "</a> six</p><p>seven eight nine ten eleven twelve</p></body>")
    out = extract_main_text(html)
    assert "seven eight nine" in out
    assert "one two three" not in out


def test_chrome_class_hints():
    html = ("<body><div class='cookie-banner'>We use cookies to improve"
            " the experience okay</div><p>actual article body text here"
            " with enough words</p></body>")
    out = extract_main_text(html)
    assert "cookies" not in out
    assert "actual article body" in out


def test_malformed_html_degrades():
    out = extract_main_text("<p>hello <b>world")
    assert "hello" in out and "world" in out
