"""HTML main-content extraction via DOM text/link-density heuristics.

north_rule addition with no reference analog (SURVEY.md §7 phase 7): strip
navigation/header/footer/aside chrome from HTML payloads, keeping the main
content blocks. Boilerpipe-style block classification on two signals:

- link density: fraction of a block's text that sits inside <a> tags —
  navigation and footers are link-dense;
- text density: words per block — boilerplate blocks are short.

Pure stdlib (html.parser); deterministic; vectorized over turns by the
Spark layer (one call per payload inside an Arrow batch).
"""
from __future__ import annotations

import re
from html.parser import HTMLParser

# elements that start a new text block
_BLOCK_TAGS = {
    "p", "div", "section", "article", "main", "td", "th", "li", "dd", "dt",
    "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre", "figcaption",
    "tr", "table", "ul", "ol", "br", "hr", "form",
}
# subtrees dropped entirely
_DROP_TAGS = {"script", "style", "noscript", "svg", "template", "head",
              "iframe", "object", "embed"}
# subtrees that are boilerplate by construction
_CHROME_TAGS = {"nav", "header", "footer", "aside"}
_CHROME_HINT = re.compile(
    r"(?:^|[-_ ])(nav|menu|footer|header|sidebar|breadcrumb|banner|advert|"
    r"ads?|cookie|social|share|comment|consent|gdpr|cmp|modal|popup|overlay|"
    r"paywall|newsletter|signup|subscribe|promo|disqus|"
    # commerce / engagement chrome (r7 tranche 3): purchase UI, related-
    # content rails, and pagination carry no tag-level signal and pass
    # the density rules ("$49.99 In stock. Ships tomorrow." is 5 words,
    # 0 links). 'reviews'/'ratings' stay PLURAL-ONLY — a film-review
    # article legitimately classes its own body 'review' (singular).
    r"buy|cart|checkout|purchase|related|recommendation|recommended|"
    r"recommend|carousel|trending|pager|pagination|reviews|ratings"
    r")s?(?:$|[-_ ])", re.I)

_WS = re.compile(r"\s+")
_ALNUM = re.compile(r"[A-Za-z0-9]")
# terminating-boilerplate signal (boilerpipe-style): a SHORT block that
# reads like a copyright footer line is chrome even with no tag/class
# hint (legacy table layouts carry no semantic markup at all)
_COPYRIGHT = re.compile(
    r"©\s*(?:19|20)\d\d|\(c\)\s*(?:19|20)\d\d|"
    r"copyright\s+(?:©\s*)?(?:19|20)\d\d|all rights reserved", re.I)


class _Block:
    __slots__ = ("words", "link_words", "alnum_words", "link_alnum",
                 "in_chrome", "tags")

    def __init__(self, in_chrome: int):
        self.words: list[str] = []
        self.link_words = 0
        # word-ish (alnum-bearing) token counts: link density over ALL
        # tokens lets bracket/pipe separator punctuation dilute a pure
        # navigation row ("[ Home ] [ Products ]" is 2/3 punctuation)
        self.alnum_words = 0
        self.link_alnum = 0
        self.in_chrome = in_chrome
        self.tags = 0


class _BlockParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list[_Block] = []
        self._cur = _Block(0)
        self._drop_depth = 0
        self._chrome_depth = 0
        self._chrome_stack: list[str] = []  # tag names that opened chrome
        self._link_depth = 0
        self._title_done = False
        self.title: str | None = None
        self._in_title = False

    def _flush(self):
        if self._cur.words:
            self.blocks.append(self._cur)
        self._cur = _Block(self._chrome_depth)

    def handle_starttag(self, tag, attrs):
        if tag in _DROP_TAGS:
            self._drop_depth += 1
            return
        if tag == "title":
            self._in_title = True
            return
        is_chrome = tag in _CHROME_TAGS
        if not is_chrome:
            attr_text = " ".join(v or "" for (k, v) in attrs
                                 if k in ("class", "id", "role"))
            if attr_text and _CHROME_HINT.search(attr_text):
                is_chrome = True
        if is_chrome:
            self._flush()
            self._chrome_stack.append([tag, 0])
            self._chrome_depth = len(self._chrome_stack)
            self._cur.in_chrome = self._chrome_depth
            return
        # same-named tag nested inside an open chrome subtree: count it so
        # its end tag doesn't close the chrome entry early
        for entry in reversed(self._chrome_stack):
            if entry[0] == tag:
                entry[1] += 1
                break
        if tag == "a":
            self._link_depth += 1
        if tag in _BLOCK_TAGS:
            self._flush()
        self._cur.tags += 1

    def handle_endtag(self, tag):
        if tag in _DROP_TAGS:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if tag == "title":
            self._in_title = False
            return
        for i in range(len(self._chrome_stack) - 1, -1, -1):
            if self._chrome_stack[i][0] == tag:
                if self._chrome_stack[i][1] > 0:
                    self._chrome_stack[i][1] -= 1
                    break
                self._flush()
                del self._chrome_stack[i]
                self._chrome_depth = len(self._chrome_stack)
                self._cur.in_chrome = self._chrome_depth
                return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):
        if self._drop_depth:
            return
        if self._in_title and not self._title_done:
            t = _WS.sub(" ", data).strip()
            if t:
                self.title = t
                self._title_done = True
            return
        words = data.split()
        if not words:
            return
        self._cur.words.extend(words)
        n_alnum = sum(1 for w in words if _ALNUM.search(w))
        self._cur.alnum_words += n_alnum
        if self._link_depth:
            self._cur.link_words += len(words)
            self._cur.link_alnum += n_alnum

    def close(self):
        super().close()
        self._flush()


def extract_main_text(html: str, max_link_density: float = 0.5,
                      min_words: int = 3) -> str:
    """Main-content text: blocks that are not chrome, not link-dense, and
    not trivially short. Short low-link blocks adjacent to kept content
    are kept too (caption/heading continuation rule)."""
    parser = _BlockParser()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        # malformed HTML: degrade to tag-stripped text
        return _WS.sub(" ", re.sub(r"<[^>]*>", " ", html)).strip()
    blocks = parser.blocks
    n = len(blocks)
    keep = [False] * n
    for (i, b) in enumerate(blocks):
        if b.in_chrome:
            continue
        nw = b.alnum_words  # separator punctuation is not content
        if nw == 0:
            continue
        link_density = b.link_alnum / nw
        if link_density > max_link_density:
            continue
        if nw <= 30 and _COPYRIGHT.search(" ".join(b.words)):
            continue  # short copyright footer line, markup-less chrome
        if nw >= min_words:
            keep[i] = True
    # continuation rule: short clean blocks between kept neighbors survive
    for (i, b) in enumerate(blocks):
        if keep[i] or b.in_chrome or not b.alnum_words:
            continue
        if b.link_words:
            continue
        prev_kept = i > 0 and keep[i - 1]
        next_kept = i + 1 < n and keep[i + 1]
        if prev_kept or next_kept:
            keep[i] = True
    out = [" ".join(b.words) for (i, b) in enumerate(blocks) if keep[i]]
    if not out:
        # tiny/threshold-starved documents: all non-chrome, non-link-dense text
        out = [" ".join(b.words) for b in blocks
               if b.alnum_words and not b.in_chrome
               and b.link_alnum / b.alnum_words <= max_link_density]
    return "\n".join(out)
