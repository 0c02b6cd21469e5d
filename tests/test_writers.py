"""Transcript writers (txt/srt/vtt/tsv/json — models/whisper/writers.py).

Pins the whisper-CLI output layouts: srt's 1-indexed comma-millisecond cues
with mandatory hours, vtt's WEBVTT header and dot marker with optional hours,
tsv's integer-millisecond columns, and the rounding rule shared by all three.
"""

import json

import pytest

from freud_tpu.models.whisper.writers import (
    OUTPUT_FORMATS,
    format_timestamp,
    get_writer,
    write_result,
)

RESULT = {
    "text": " hello world and more",
    "segments": [
        {"start": 0.0, "end": 2.5, "text": " hello world"},
        {"start": 2.5, "end": 3661.0075, "text": " and\tmore\n"},
    ],
}


def test_format_timestamp_layouts():
    assert format_timestamp(0.0) == "00:00.000"
    assert format_timestamp(2.5, True, ",") == "00:00:02,500"
    # hours appear automatically past 1h, and the .0075 rounds to 8 ms
    assert format_timestamp(3661.0075) == "01:01:01.008"
    with pytest.raises(ValueError):
        format_timestamp(-1.0)


def test_srt_layout():
    srt = get_writer("srt")(RESULT)
    blocks = srt.strip().split("\n\n")
    assert blocks[0].split("\n") == [
        "1", "00:00:00,000 --> 00:00:02,500", "hello world"]
    assert blocks[1].split("\n")[0] == "2"
    assert "01:01:01,008" in blocks[1]


def test_vtt_layout():
    vtt = get_writer("vtt")(RESULT)
    assert vtt.startswith("WEBVTT\n")
    assert "00:00.000 --> 00:02.500\nhello world" in vtt
    assert "01:01:01.008" in vtt  # hours appear when nonzero


def test_tsv_integer_milliseconds_and_flat_rows():
    tsv = get_writer("tsv")(RESULT)
    lines = tsv.strip().split("\n")
    assert lines[0] == "start\tend\ttext"
    assert lines[1] == "0\t2500\thello world"
    start, end, text = lines[2].split("\t")
    assert (start, end) == ("2500", "3661008")
    assert "\n" not in text and text == "and more"


def test_txt_and_json():
    assert get_writer("txt")(RESULT) == "hello world\nand\tmore\n"
    assert get_writer("txt")({"text": " plain "}) == "plain\n"
    assert json.loads(get_writer("json")(RESULT)) == RESULT


def test_segment_formats_reject_plain_text():
    for fmt in ("srt", "vtt", "tsv"):
        with pytest.raises(ValueError, match="segments"):
            get_writer(fmt)({"text": "no segments here"})
    with pytest.raises(ValueError, match="output_format"):
        get_writer("docx")


def test_write_result_paths(tmp_path):
    assert set(OUTPUT_FORMATS) == {"txt", "srt", "vtt", "tsv", "json"}
    p = write_result(RESULT, "/data/clip one.flac", tmp_path, "srt")
    assert p == tmp_path / "clip one.srt"
    assert p.read_text().startswith("1\n")


WORD_RESULT = {
    "text": " alpha beta gamma delta",
    "segments": [{
        "start": 0.0, "end": 4.0, "text": " alpha beta gamma delta",
        "words": [
            {"word": " alpha", "start": 0.0, "end": 1.0, "probability": 0.9},
            {"word": " beta", "start": 1.0, "end": 2.0, "probability": 0.9},
            {"word": " gamma", "start": 2.0, "end": 3.0, "probability": 0.9},
            {"word": " delta", "start": 3.0, "end": 4.0, "probability": 0.9},
        ],
    }],
}


def test_srt_max_line_width_splits_on_words():
    from freud_tpu.models.whisper.writers import write_srt

    srt = write_srt(WORD_RESULT, max_line_width=12, max_line_count=1)
    blocks = srt.strip().split("\n\n")
    # " alpha beta" is 11 chars -> first cue; each cue spans its words' times
    assert blocks[0].split("\n")[2] == "alpha beta"
    assert "00:00:00,000 --> 00:00:02,000" in blocks[0]
    assert blocks[1].split("\n")[2] == "gamma delta"
    assert "00:00:02,000 --> 00:00:04,000" in blocks[1]


def test_srt_max_line_count_groups_lines():
    from freud_tpu.models.whisper.writers import write_srt

    srt = write_srt(WORD_RESULT, max_line_width=12, max_line_count=2)
    blocks = srt.strip().split("\n\n")
    assert len(blocks) == 1  # both lines in one cue
    assert blocks[0].split("\n")[2:] == ["alpha beta", "gamma delta"]


def test_vtt_highlight_words_karaoke():
    from freud_tpu.models.whisper.writers import write_vtt

    vtt = write_vtt(WORD_RESULT, highlight_words=True)
    cues = vtt.strip().split("\n\n")[1:]  # drop WEBVTT header
    assert len(cues) == 4  # one cue per word
    assert "<u> beta</u>" in cues[1]
    assert "<u>" not in cues[1].replace("<u> beta</u>", "")
    # each word's cue starts at the word and ends at the next word's start
    assert cues[0].startswith("00:00.000 --> 00:01.000")


def test_subtitle_options_ignored_without_words():
    from freud_tpu.models.whisper.writers import write_srt

    plain = write_srt(RESULT)
    assert write_srt(RESULT, max_line_width=10) == plain


def test_format_timestamp_roundtrip_property():
    """Any non-negative time formats to a string that parses back to its
    exact millisecond rounding, in both srt and vtt layouts."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=200, deadline=None, derandomize=True)
    @given(st.floats(min_value=0.0, max_value=1e5, allow_nan=False))
    def check(seconds):
        for hours, marker in ((True, ","), (False, ".")):
            s = format_timestamp(seconds, hours, marker)
            *time_parts, msec = s.replace(marker, ":").split(":")
            total = 0
            for p in time_parts:
                total = total * 60 + int(p)
            assert total * 1000 + int(msec) == round(seconds * 1000)

    check()
