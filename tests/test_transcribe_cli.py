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
