from lipreading_tpu.vtt import (
    Cue,
    align_cues_to_frames,
    format_timestamp,
    parse_timestamp,
    parse_vtt,
    write_vtt,
)

YOUTUBE_STYLE = """WEBVTT
Kind: captions
Language: en

NOTE some comment
that spans lines

00:00:01.500 --> 00:00:03.000 align:start position:0%
<c.colorE5E5E5>Hello</c> there

00:01:02.250 --> 00:01:04.000
GENERAL <v Speaker>Kenobi!</v>
"""


def test_parse_timestamp():
    assert parse_timestamp("00:00:01.500") == 1.5
    assert parse_timestamp("01:02:03.250") == 3723.25
    assert parse_timestamp("02:03.250") == 123.25
    assert format_timestamp(3723.25) == "01:02:03.250"


def test_parse_vtt_youtube_style():
    cues = parse_vtt(YOUTUBE_STYLE)
    assert len(cues) == 2
    assert cues[0].start == 1.5 and cues[0].end == 3.0
    assert cues[0].text == "Hello there"
    assert cues[1].text == "GENERAL Kenobi!"
    assert cues[1].normalized == "general kenobi"


def test_roundtrip():
    cues = [Cue(0.0, 1.0, "one"), Cue(1.5, 2.75, "two three")]
    assert parse_vtt(write_vtt(cues)) == cues


def test_align():
    cues = [Cue(0.0, 0.4, "ab"), Cue(10.0, 11.0, "off end"), Cue(0.5, 0.52, "x")]
    out = align_cues_to_frames(cues, fps=25.0, num_frames=100)
    assert out[0] == (0, 10, "ab")
    # second cue clipped out (past the video), third tiny cue kept (1 frame min)
    assert all(last <= 100 for _, last, _ in out)
