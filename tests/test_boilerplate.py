"""HTML boilerplate-strip goldens (north_rule; fixtures defined by us —
FIXTURES.md §4)."""
import random

import pytest

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


# -- round-6 realism fixtures (VERDICT r5 #8) --------------------------------
# Five hand-built realistic pages under fixtures/html/: an old-school
# nested-table news layout, a blog post with inline scripts/styles +
# cookie banner + share widgets, an article with an in-article TOC nav,
# a forum thread with breadcrumbs + a comment section, and a docs page
# with a sidebar menu + code + figcaption. Each golden was written by
# judging every block as main-content or chrome BEFORE pinning; content
# assertions below re-state the judgment so the goldens cannot silently
# drift into "whatever the extractor says".

import os

_HTML_FIX = os.path.join(os.path.dirname(__file__), "..", "fixtures", "html")

_REALISM = {
    "news_nested_tables": {
        "must_keep": ["transit expansion", "North rail extension",
                      "ridership numbers"],
        "must_drop": ["Daily Herald", "Subscribe", "Shop local deals",
                      "copyright", "Mayor unveils budget"],
    },
    "blog_scripts_widgets": {
        "must_keep": ["table driven state machine",
                      "state = TABLE[state][token.kind]",
                      "ninety lines"],
        "must_drop": ["cookies", "Tweet", "analytics", "rss",
                      "querySelectorAll"],
    },
    "article_with_toc_nav": {
        "must_keep": ["run and pause gait", "touch sensitive bills",
                      "longest nonstop flights"],
        "must_drop": ["Birdwatch", "Forum", "contact"],
    },
    "forum_comment_thread": {
        "must_keep": ["spill to disk", "rule of thumb"],
        "must_drop": ["SparkForum", "breadcrumbs", "Home >", "rdd_fan",
                      "adaptive query execution", "powered by forumware"],
    },
    "docs_sidebar_code": {
        "must_keep": ["configure({retries: 3, timeout_ms: 2500})",
                      "Option resolution order",
                      "typos surface at startup"],
        "must_drop": ["teardown", "edit this page", "api/configure"],
    },
    # -- round-7 second tranche (VERDICT r6 #7) ------------------------------
    # A true-1998 spacer-gif table layout with ZERO class/id/semantic
    # hints (bracket-separated link nav, plain copyright row), a modern
    # threaded comment DOM with vote/reply links plus a Disqus embed
    # div, and a GDPR consent overlay + newsletter popup over a recipe.
    # Each caught a real leak before the r7 extractor changes:
    # punctuation-diluted link density kept "[ Home ] [ Products ]",
    # the markup-less copyright row survived, and consent/modal/popup/
    # newsletter/disqus class tokens were not chrome hints.
    "legacy_spacer_tables": {
        "must_keep": ["VX-200 56K modem", "hardware compression chip",
                      "forty dollar rebate"],
        "must_drop": ["Guestbook", "Hot deal", "webring",
                      "All rights reserved", "webmaster", "800x600"],
    },
    "comment_thread_votes": {
        "must_keep": ["Perseid meteor shower", "ninety meteors per hour",
                      "eyes adapt for twenty minutes"],
        "must_drop": ["stargeezer", "upvote", "worth the drive",
                      "overcast here again", "Load 40 more",
                      "powered by Disqus", "Night Sky Daily"],
    },
    "consent_overlay_recipe": {
        "must_keep": ["two ingredient flatbread", "shaggy dough forms",
                      "under a towel"],
        "must_drop": ["143 partners", "geolocation", "Accept all",
                      "fifty thousand home cooks", "uses cookies",
                      "All rights reserved"],
    },
    # -- round-7 third tranche --------------------------------------------
    # An e-commerce product page (spec table must chain through the
    # continuation rule; buy box, related carousel, and user reviews are
    # chrome), a news article with JSON-LD + a MID-ARTICLE newsletter
    # CTA + a related-stories rail, and a feed page where other
    # articles' teasers (low link density!) sit in an aside and
    # pagination closes the page. Caught before the fix: the buy box
    # ("$49.99 In stock. Ships tomorrow." — 5 words, 0 links), review
    # rows, related-rail headings, and pagination carried no tag signal
    # and passed the density rules; commerce/engagement class tokens
    # (buy/cart/related/carousel/pagination/reviews...) are now chrome
    # hints, with reviews/ratings PLURAL-ONLY so a film-review article
    # classing its own body 'review' keeps its content.
    "product_page_specs": {
        "must_keep": ["gallium nitride converter", "Specifications",
                      "20000 mAh", "65 W shared", "340 grams",
                      "trickle mode"],
        "must_drop": ["Add to cart", "In stock", "Customers also viewed",
                      "chargerfan77", "Helpful", "breadcrumbs",
                      "All rights reserved"],
    },
    "amp_newsfeed_article": {
        "must_keep": ["ninety one percent of capacity",
                      "carryover storage targets",
                      "revised allocation numbers"],
        "must_drop": ["water desk newsletter", "Join free",
                      "More from the water desk", "Snowpack hits",
                      "Subscribe", "schema.org", "position:fixed"],
    },
    "feed_teasers_pagination": {
        "must_keep": ["neglected orchard", "heritage apples",
                      "young rootstock"],
        "must_drop": ["creek gauge diaries", "Read more",
                      "juncos and nuthatches", "Next", "Archive"],
    },
}


@pytest.mark.parametrize("name", sorted(_REALISM))
def test_realistic_page_golden(name):
    html = open(os.path.join(_HTML_FIX, name + ".html")).read()
    expected = open(os.path.join(_HTML_FIX, name + ".expected.txt")).read()
    out = extract_main_text(html)
    assert out == expected
    for frag in _REALISM[name]["must_keep"]:
        assert frag in out, f"{name}: main content lost: {frag!r}"
    for frag in _REALISM[name]["must_drop"]:
        assert frag not in out, f"{name}: chrome leaked: {frag!r}"


def test_plural_chrome_class_hints():
    """class="breadcrumbs"/"comments" (plural) are chrome — the r6
    realism set caught the singular-only hint regex."""
    html = ("<body><div class='breadcrumbs'><a href='/'>Home</a> &gt; "
            "<a href='/q'>Questions</a> &gt; tuning</div>"
            "<p>body text with plenty of words to keep here</p></body>")
    out = extract_main_text(html)
    assert "Home" not in out and "tuning" not in out
    assert "body text" in out


def test_review_hint_is_plural_only():
    """A film-review article legitimately classes its own body 'review'
    (singular) — only 'reviews'/'ratings' (the user-generated section)
    are chrome hints."""
    html = ('<body><div class="review"><h1>Review: The Long Orchard</h1>'
            '<p>The film earns its slow first hour because every quiet '
            'scene pays off in the final harvest sequence.</p></div>'
            '<section class="reviews"><p>user99 loved it five stars '
            '<a href="#v">vote</a></p></section></body>')
    out = extract_main_text(html)
    assert "final harvest sequence" in out
    assert "user99" not in out


def test_extractor_mutation_fuzz_never_raises():
    """Corrupted/truncated/shuffled HTML must always come back as a str
    within bounded time — the stripper and the metadata parser sit in
    the extraction hot path where one poison page cannot kill a task."""
    import time as _t

    import numpy as np

    from pdfminer_spark.html.metadata import extract_metadata

    base = open(os.path.join(_HTML_FIX, "product_page_specs.html")).read()
    rng = np.random.default_rng(61)
    t0 = _t.time()
    for _ in range(150):
        buf = list(base)
        for _ in range(rng.integers(1, 12)):
            i = int(rng.integers(0, len(buf)))
            buf[i] = chr(int(rng.integers(1, 128)))
        mutated = "".join(buf)[:int(rng.integers(50, len(base)))]
        assert isinstance(extract_main_text(mutated), str)
        assert isinstance(extract_metadata(mutated), dict)
    assert _t.time() - t0 < 20.0
