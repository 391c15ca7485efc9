"""Unit tests for the transcript-format parsers (SRT / WebVTT / e-mail
reply stripping) behind the subtitle_cues / cues_to_turns /
email_quote_strip queries."""
import pytest

from pdfminer_spark.ops.transcripts import (TranscriptError, parse_srt,
                                            parse_vtt, strip_email_reply)

SRT = """1
00:00:01,000 --> 00:00:03,500
Hello <i>world</i>

2
00:01:00,250 --> 00:01:02,000
second cue
continued line
"""

VTT = """WEBVTT - title

NOTE a comment block
spanning two lines

00:01.000 --> 00:03.500 align:start position:10%
<v Alice>Hello <c.yellow>there</c>

cue-2
01:00:00.000 --> 01:00:01.250
plain text
"""


def test_srt_basic():
    cues = parse_srt(SRT)
    assert len(cues) == 2
    assert cues[0] == {"start_ms": 1000, "end_ms": 3500,
                       "speaker": "", "text": "Hello world"}
    assert cues[1]["start_ms"] == 60250
    assert cues[1]["text"] == "second cue continued line"


def test_srt_index_optional_and_bom():
    cues = parse_srt("﻿00:00:00,000 --> 00:00:01,000\nhi\n")
    assert cues == [{"start_ms": 0, "end_ms": 1000,
                     "speaker": "", "text": "hi"}]


def test_srt_malformed():
    with pytest.raises(TranscriptError):
        parse_srt("not a cue\nat all\n")
    with pytest.raises(TranscriptError):
        parse_srt("1\n00:00:bad --> 00:00:01,000\nx\n")
    with pytest.raises(TranscriptError):
        parse_srt("1\n")  # index but no time line


def test_srt_cue_cap():
    blocks = "\n\n".join(
        "%d\n00:00:00,000 --> 00:00:01,000\nx" % i for i in range(5))
    with pytest.raises(TranscriptError):
        parse_srt(blocks, max_cues=3)


def test_vtt_header_required():
    with pytest.raises(TranscriptError):
        parse_vtt("00:00:00.000 --> 00:00:01.000\nx\n")


def test_vtt_notes_ids_voice_and_short_timestamps():
    cues = parse_vtt(VTT)
    assert len(cues) == 2  # NOTE block skipped
    assert cues[0] == {"start_ms": 1000, "end_ms": 3500,
                       "speaker": "Alice", "text": "Hello there"}
    # cue identifier line skipped; hours field parsed
    assert cues[1]["start_ms"] == 3600000
    assert cues[1]["end_ms"] == 3601250
    assert cues[1]["speaker"] == ""


def test_vtt_settings_do_not_leak_into_end_ts():
    cues = parse_vtt("WEBVTT\n\n00:00.000 --> 00:02.000 line:0\nx\n")
    assert cues[0]["end_ms"] == 2000


EMAIL = """From: alice@example.org
Subject: Re: hi

Fresh reply text
spanning lines

On Mon, 5 Jan 2026, Bob wrote:
> old line
>> older line

-- \nAlice
"""


def test_email_strip():
    (main, nq) = strip_email_reply(EMAIL)
    assert main == "Fresh reply text spanning lines"
    assert nq == 2


def test_email_strip_no_header_block():
    (main, nq) = strip_email_reply("just a body\n> q\n")
    assert main == "just a body"
    assert nq == 1


def test_email_signature_only_exact_delimiter():
    # '--' without the trailing space is NOT the signature delimiter
    (main, nq) = strip_email_reply("a\n--\nb\n-- \nc\n")
    assert main == "a -- b"
    assert nq == 0


def test_parser_fuzz_bounded_failure_modes():
    """Mutation fuzz: random byte-level edits of valid SRT/VTT payloads
    must either parse or raise TranscriptError — never hang, never
    raise anything else (the hostile-input contract every ingestion
    parser in this repo carries)."""
    import random

    rng = random.Random(1234)
    bases = [SRT, VTT]
    ok = err = 0
    for trial in range(2000):
        s = list(rng.choice(bases))
        for _ in range(rng.randint(1, 6)):
            op = rng.randrange(3)
            pos = rng.randrange(len(s))
            ch = chr(rng.randrange(32, 127)) if rng.random() < 0.9 \
                else rng.choice("\n\r\x00>")
            if op == 0:
                s[pos] = ch
            elif op == 1:
                s.insert(pos, ch)
            else:
                del s[pos]
        payload = "".join(s)
        for parse in (parse_srt, parse_vtt):
            try:
                parse(payload, max_cues=64)
                ok += 1
            except TranscriptError:
                err += 1
    assert ok + err == 4000
    assert ok > 0 and err > 0  # both outcomes actually exercised
