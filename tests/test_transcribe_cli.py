"""Batch transcription CLI over a folder of WAVs (random weights)."""

import json
import wave

import numpy as np


def _write_wavs(folder, n=3, seconds=1):
    folder.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        p = folder / f"clip{i}.wav"
        data = (rng.standard_normal(16000 * seconds) * 3000).astype(np.int16)
        with wave.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(data.tobytes())
        paths.append(str(p))
    return paths


def test_transcribe_folder_plain_and_fallback(tmp_path):
    from freud_tpu.scripts.transcribe import transcribe_folder

    paths = _write_wavs(tmp_path / "audio")
    out = transcribe_folder(
        str(tmp_path / "audio"), model="test:tiny", batch_size=2,
        language="en", max_new_tokens=4, verbose=False,
    )
    assert sorted(out) == sorted(paths)
    assert all(isinstance(v, str) for v in out.values())

    # fallback ladder (single rung → accepts everything) returns the same
    # files; a tail batch of 1 reuses the padded batch-2 program
    out_fb = transcribe_folder(
        str(tmp_path / "audio"), model="test:tiny", batch_size=2,
        language="en", max_new_tokens=4, fallback=False, beam_size=2,
        verbose=False,
    )
    assert sorted(out_fb) == sorted(paths)

    out_wt = transcribe_folder(
        str(tmp_path / "audio"), model="test:tiny", batch_size=2,
        language="en", max_new_tokens=4, word_timestamps=True, verbose=False,
    )
    assert sorted(out_wt) == sorted(paths)
    for v in out_wt.values():
        assert set(v) == {"text", "words"}
        for wd in v["words"]:
            # 1-second clips: trimmed alignment must stay in [0, ~1.1 s]
            assert 0.0 <= wd["start"] <= wd["end"] <= 1.2


def test_transcribe_cli_writes_json(tmp_path, monkeypatch, capsys):
    import sys
    from freud_tpu.scripts import transcribe as cli

    _write_wavs(tmp_path / "audio", n=2)
    out_json = tmp_path / "out.json"
    monkeypatch.setattr(sys, "argv", [
        "transcribe", "--data_path", str(tmp_path / "audio"),
        "--model", "test:tiny", "--batch_size", "2", "--language", "en",
        "--max_new_tokens", "3", "--out", str(out_json),
    ])
    cli.main()
    data = json.loads(out_json.read_text())
    assert len(data) == 2
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines() if l]
    assert {d["file"] for d in lines} == set(data)


def test_transcribe_cli_output_formats(tmp_path, monkeypatch):
    """--long --output_format srt renders per-file subtitle files from the
    seek loop's timed segments; srt/vtt/tsv without --long is an argparse
    error (no segments to time)."""
    import sys

    import pytest

    from freud_tpu.scripts import transcribe as cli

    _write_wavs(tmp_path / "audio", n=1)
    out_dir = tmp_path / "subs"
    monkeypatch.setattr(sys, "argv", [
        "transcribe", "--data_path", str(tmp_path / "audio"),
        "--model", "test:tiny", "--language", "en",
        "--max_new_tokens", "4", "--long",
        "--output_format", "srt", "--output_dir", str(out_dir),
    ])
    cli.main()
    srt = (out_dir / "clip0.srt").read_text()
    if srt:  # random weights may emit zero segments for noise
        assert srt.splitlines()[0] == "1"
        assert "-->" in srt

    monkeypatch.setattr(sys, "argv", [
        "transcribe", "--data_path", str(tmp_path / "audio"),
        "--model", "test:tiny", "--output_format", "vtt",
    ])
    with pytest.raises(SystemExit):
        cli.main()


def test_transcribe_cli_txt_output_batch_mode(tmp_path, monkeypatch):
    import sys

    from freud_tpu.scripts import transcribe as cli

    _write_wavs(tmp_path / "audio", n=2)
    out_dir = tmp_path / "txt"
    monkeypatch.setattr(sys, "argv", [
        "transcribe", "--data_path", str(tmp_path / "audio"),
        "--model", "test:tiny", "--batch_size", "2", "--language", "en",
        "--max_new_tokens", "3",
        "--output_format", "txt", "--output_dir", str(out_dir),
    ])
    cli.main()
    files = sorted(p.name for p in out_dir.glob("*.txt"))
    assert files == ["clip0.txt", "clip1.txt"]
    assert (out_dir / "clip0.txt").read_text().endswith("\n")


def test_single_file_data_path(tmp_path):
    """--data_path pointing at one audio FILE transcribes it (whisper-CLI
    ergonomics) instead of silently matching nothing."""
    from freud_tpu.data.audio_dataset import list_audio_files
    from freud_tpu.scripts.transcribe import transcribe_folder

    paths = _write_wavs(tmp_path / "audio", n=1)
    assert list_audio_files(paths[0]) == paths
    assert list_audio_files(str(tmp_path / "audio" / "nope.txt")) == []

    out = transcribe_folder(paths[0], model="test:tiny", batch_size=1,
                            language="en", max_new_tokens=3, verbose=False)
    assert list(out) == paths and isinstance(out[paths[0]], str)
