"""Subtitle codec tests (round 12): SRT/VTT grammar traps — comma vs
period milliseconds (the classic srt→vtt byte-level bug), hourless
VTT timestamps, cue identifiers, cue settings, NOTE/STYLE blocks,
UTF-8 BOM, CRLF, multi-line payloads, hour rollover — plus typed
errors and roundtrip fuzz."""

import random

import pytest

from yark_spark.operators.subtitles import srt_build, srt_parse, vtt_build, vtt_parse

CUES = [
    (0, 1500, "hello world"),
    (1700, 3200, "two\nlines"),
    (3_604_900, 3_606_400, "after an hour"),
]


def test_roundtrip_both_formats():
    assert srt_parse(srt_build(CUES)) == CUES
    assert vtt_parse(vtt_build(CUES)) == CUES
    assert vtt_parse(vtt_build(CUES, with_ids=True)) == CUES


def test_wire_shapes():
    s = srt_build(CUES)
    assert "01:00:04,900 --> 01:00:06,400" in s  # comma + hour rollover
    v = vtt_build(CUES)
    assert v.startswith("WEBVTT\n")
    assert "01:00:04.900 --> 01:00:06.400" in v  # period


def test_separator_discipline():
    with pytest.raises(ValueError, match="timestamp"):
        vtt_parse("WEBVTT\n\n00:00:01,000 --> 00:00:02,000\nx")
    with pytest.raises(ValueError, match="timestamp"):
        srt_parse("1\n00:00:01.000 --> 00:00:02.000\nx")


def test_bom_and_crlf_tolerated():
    assert srt_parse("﻿" + srt_build(CUES).replace("\n", "\r\n")) == CUES
    assert vtt_parse("﻿" + vtt_build(CUES).replace("\n", "\r\n")) == CUES


def test_vtt_hourless_settings_and_notes():
    v = (
        "WEBVTT - metadata after magic\n\n"
        "NOTE a comment\nspanning lines\n\n"
        "STYLE\n::cue { color: red }\n\n"
        "ident-1\n00:05.000 --> 00:07.500 align:start position:0%\nshort form\n"
    )
    assert vtt_parse(v) == [(5000, 7500, "short form")]


def test_srt_nonsequential_indices_tolerated():
    s = "7\n00:00:01,000 --> 00:00:02,000\na\n\n99\n00:00:03,000 --> 00:00:04,000\nb\n"
    assert srt_parse(s) == [(1000, 2000, "a"), (3000, 4000, "b")]


def test_errors():
    with pytest.raises(ValueError, match="magic"):
        vtt_parse("1\n00:00:01.000 --> 00:00:02.000\nx")
    with pytest.raises(ValueError, match="index"):
        srt_parse("x\n00:00:01,000 --> 00:00:02,000\ny")
    with pytest.raises(ValueError, match="end not after"):
        srt_parse("1\n00:00:02,000 --> 00:00:02,000\nx")
    with pytest.raises(ValueError, match="timing"):
        srt_parse("1\njust text\nmore")
    with pytest.raises(ValueError, match="bomb"):
        srt_parse(srt_build([(i * 10, i * 10 + 5, "x") for i in range(10)]), max_cues=5)


def test_roundtrip_fuzz():
    rng = random.Random(51)
    for _ in range(40):
        cues, t = [], 0
        for _ in range(rng.randrange(1, 12)):
            t += rng.randrange(0, 2000)
            d = rng.randrange(1, 5000)
            words = " ".join(
                rng.choice(["a", "bb", "ccc", "héllo", "中文"]) for _ in range(3)
            )
            cues.append((t, t + d, words))
            t += d
        assert srt_parse(srt_build(cues)) == cues
        assert vtt_parse(vtt_build(cues, with_ids=rng.random() < 0.5)) == cues
