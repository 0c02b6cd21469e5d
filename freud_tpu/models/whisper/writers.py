"""Transcript output writers: txt / srt / vtt / tsv / json.

The reference surfaces transcripts only as raw strings in its GUI
(src/models/hooked_model.py:103-110 → whisper model.decode), but whisper
users consume ``whisper.utils.get_writer``'s subtitle formats downstream of
any transcription CLI, so ``transcribe_long``'s segment dicts
({"start", "end", "text"} seconds, models/whisper/long_audio.py:206) render
to the same formats here:

  txt   one segment text per line
  srt   1-indexed cues, ``HH:MM:SS,mmm --> HH:MM:SS,mmm`` (hours always)
  vtt   ``WEBVTT`` header, ``MM:SS.mmm`` cues (hours only when nonzero)
  tsv   ``start\\tend\\ttext`` header, integer-millisecond times
  json  the full result dict (segments, statistics, optional words)

Formatting matches whisper's published writer behavior (timestamp layout,
rounding, headers); the implementation is independent.
"""

from __future__ import annotations

import json
from pathlib import Path


def format_timestamp(seconds: float, always_include_hours: bool = False,
                     decimal_marker: str = ".") -> str:
    """``[HH:]MM:SS<marker>mmm`` with millisecond rounding (whisper's
    subtitle timestamp layout: srt passes hours+comma, vtt dot)."""
    if seconds < 0:
        raise ValueError("non-negative timestamp expected")
    ms = round(seconds * 1000.0)
    hours, ms = divmod(ms, 3_600_000)
    minutes, ms = divmod(ms, 60_000)
    secs, ms = divmod(ms, 1_000)
    hours_marker = f"{hours:02d}:" if always_include_hours or hours > 0 else ""
    return f"{hours_marker}{minutes:02d}:{secs:02d}{decimal_marker}{ms:03d}"


def _segments(result: dict) -> list[dict]:
    segs = result.get("segments")
    if segs is None:
        raise ValueError(
            "this output format needs timed segments — transcribe with the "
            "long-audio path (--long), which yields {'start','end','text'} "
            "segments per window"
        )
    return segs


def write_txt(result: dict) -> str:
    if result.get("segments") is None:
        return str(result.get("text", "")).strip() + "\n"
    return "".join(s["text"].strip() + "\n" for s in _segments(result))


def write_srt(result: dict) -> str:
    out = []
    for i, s in enumerate(_segments(result), start=1):
        start = format_timestamp(s["start"], True, ",")
        end = format_timestamp(s["end"], True, ",")
        out.append(f"{i}\n{start} --> {end}\n{s['text'].strip()}\n")
    return "\n".join(out)


def write_vtt(result: dict) -> str:
    out = ["WEBVTT\n"]
    for s in _segments(result):
        start = format_timestamp(s["start"])
        end = format_timestamp(s["end"])
        out.append(f"{start} --> {end}\n{s['text'].strip()}\n")
    return "\n".join(out)


def write_tsv(result: dict) -> str:
    """Integer-millisecond start/end columns (whisper's WriteTSV layout);
    tabs/newlines inside text are flattened so rows stay 3-column."""
    lines = ["start\tend\ttext"]
    for s in _segments(result):
        text = s["text"].strip().replace("\t", " ").replace("\n", " ")
        lines.append(f"{round(1000 * s['start'])}\t{round(1000 * s['end'])}\t{text}")
    return "\n".join(lines) + "\n"


def write_json(result: dict) -> str:
    return json.dumps(result, ensure_ascii=False, indent=1) + "\n"


_WRITERS = {
    "txt": write_txt,
    "srt": write_srt,
    "vtt": write_vtt,
    "tsv": write_tsv,
    "json": write_json,
}

OUTPUT_FORMATS = tuple(_WRITERS)


def get_writer(output_format: str):
    """→ ``fn(result_dict) -> str`` for one of ``OUTPUT_FORMATS``."""
    try:
        return _WRITERS[output_format]
    except KeyError:
        raise ValueError(
            f"output_format must be one of {sorted(_WRITERS)}, "
            f"got {output_format!r}"
        ) from None


def write_result(result: dict, audio_path: str, output_dir: str | Path,
                 output_format: str) -> Path:
    """Render ``result`` for ``audio_path`` into
    ``output_dir/<stem>.<format>`` and return the written path."""
    out_dir = Path(output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    target = out_dir / (Path(audio_path).stem + "." + output_format)
    target.write_text(get_writer(output_format)(result), encoding="utf-8")
    return target
