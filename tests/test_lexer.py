"""Tokenizer conformance against the reference's published corpus.

TESTDATA/TOKENS/OBJS vendored from the reference's unit tests
(/root/reference/pdfminer/psparser.py:639-683) — they pin the exact token
values and byte offsets of the tokenizer contract.
"""
from pdfminer_spark.pdf.lexer import Lexer, LexerEOF
from pdfminer_spark.pdf.objects import KW, Name
from pdfminer_spark.pdf.parser import StackParser

TESTDATA = rb'''%!PS
begin end
 "  @ #
/a/BCD /Some_Name /foo#5f#xbaa
0 +1 -2 .5 1.234
(abc) () (abc ( def ) ghi)
(def\040\0\0404ghi) (bach\\slask) (foo\nbaa)
(this % is not a comment.)
(foo
baa)
(foo\
baa)
<> <20> < 40 4020 >
<abcd00
12345>
func/a/b{(c)do*}def
[ 1 (z) ! ]
<< /foo (bar) >>
'''

TOKENS = [
    (5, KW(b'begin')), (11, KW(b'end')), (16, KW(b'"')), (19, KW(b'@')),
    (21, KW(b'#')), (23, Name('a')), (25, Name('BCD')), (30, Name('Some_Name')),
    (41, Name('foo_xbaa')), (54, 0), (56, 1), (59, -2), (62, 0.5),
    (65, 1.234), (71, b'abc'), (77, b''), (80, b'abc ( def ) ghi'),
    (98, b'def \x00 4ghi'), (118, b'bach\\slask'), (132, b'foo\nbaa'),
    (143, b'this % is not a comment.'), (170, b'foo\nbaa'), (180, b'foobaa'),
    (191, b''), (194, b' '), (199, b'@@ '), (211, b'\xab\xcd\x00\x124\x05'),
    (226, KW(b'func')), (230, Name('a')), (232, Name('b')),
    (234, KW(b'{')), (235, b'c'), (238, KW(b'do*')), (241, KW(b'}')),
    (242, KW(b'def')), (246, KW(b'[')), (248, 1), (250, b'z'), (254, KW(b'!')),
    (256, KW(b']')), (258, KW(b'<<')), (261, Name('foo')), (266, b'bar'),
    (272, KW(b'>>')),
]

OBJS = [
    (23, Name('a')), (25, Name('BCD')), (30, Name('Some_Name')),
    (41, Name('foo_xbaa')), (54, 0), (56, 1), (59, -2), (62, 0.5),
    (65, 1.234), (71, b'abc'), (77, b''), (80, b'abc ( def ) ghi'),
    (98, b'def \x00 4ghi'), (118, b'bach\\slask'), (132, b'foo\nbaa'),
    (143, b'this % is not a comment.'), (170, b'foo\nbaa'), (180, b'foobaa'),
    (191, b''), (194, b' '), (199, b'@@ '), (211, b'\xab\xcd\x00\x124\x05'),
    (230, Name('a')), (232, Name('b')), (234, [b'c']), (246, [1, b'z']),
    (258, {'foo': b'bar'}),
]


def test_token_stream():
    lx = Lexer(TESTDATA)
    tokens = []
    while True:
        try:
            tokens.append(lx.next_token())
        except LexerEOF:
            break
    assert tokens == TOKENS


class _FlushingParser(StackParser):
    """Top-level values become results; bare keywords are dropped (the
    corpus was produced by a parser with those semantics)."""

    def flush(self):
        self.add_results(*self.popall())


def test_object_stream():
    parser = _FlushingParser(TESTDATA)
    objs = list(parser.iter_objects())
    assert objs == OBJS


def test_fast_path_equals_slow_path_on_random_streams():
    """The master-regex fast path must produce the exact token stream the
    slow scanners produce: monkeypatch the fast regex to never match and
    compare (position, token) sequences over adversarial random input."""
    import random
    import re

    from pdfminer_spark.pdf import lexer as LX

    def tokens(buf):
        lx = LX.Lexer(buf)
        out = []
        while True:
            try:
                out.append(lx.next_token())
            except LX.LexerEOF:
                break
            if len(out) > 10000:
                break
        return out

    rng = random.Random(1234)
    atoms = [b" ", b"\n", b"\t", b"/Name", b"/", b"/A#42B", b"12", b"-3",
             b"+4.5", b".", b".5", b"1.", b"12.34", b"+-2", b"1..2",
             b"true", b"false", b"null", b"Tj", b"T*", b"BT", b"ET",
             b"(str(nest)ed)", b"<< /K 1 >>", b"[1 2]", b"<AB CD>",
             b"% comment\n", b"{", b"}", b"'", b'"', b"ab#cd", b"A1z",
             b"\x00", b"\xff", b"e", b"-", b"+", b"#"]
    never = re.compile(rb"(?!x)x(?P<f>.)(?P<i>.)(?P<n>.)(?P<k>.)")
    for it in range(300):
        buf = b"".join(rng.choice(atoms)
                       for _ in range(rng.randrange(1, 40)))
        fast = tokens(buf)
        orig = LX._FAST
        LX._FAST = never
        try:
            slow = tokens(buf)
        finally:
            LX._FAST = orig
        assert fast == slow, (buf, fast, slow)
